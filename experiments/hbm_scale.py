"""HBM-resident engine scaling: throughput vs graph size beyond VMEM.

The reference reached this scale only by clustering (its salt master
drove per-epoch variable shipping across machines,
reference: salt/src/numbskull_master.py:133-233); here ONE chip holds
the chains and tallies in HBM and streams value slabs per row block.

Validates small-first (the tunnel-wedge rule: never run a new kernel
shape at scale before a small config of the same class has executed),
then sweeps lattice sizes. Rates are EPOCH-DIFFERENCED
(numbskull_tpu/benchutil.py): two runs at different in-kernel epoch
counts isolate the on-device per-epoch rate from the tunnel's per-call
constant.

Usage: python experiments/hbm_scale.py [out.tsv]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from numbskull_tpu.benchutil import epoch_rate
from numbskull_tpu.compile import compile_graph
from numbskull_tpu.models import ising_color_hint, ising_grid
from numbskull_tpu.ops.itemgrid_pallas import HbmItemGridEngine


def run(out_path="hbm_scale.tsv",
        grids=((160, 512), (1024, 2048), (4096, 4096), (4096, 8192))):
    rows = ["n_vars\tgrid\tsr_rows\tcompile_s\tepoch_ms\tupdates_per_s"]
    for (n, m) in grids:
        t0 = time.perf_counter()
        w, v, f, fm, dm, e = ising_grid(n, m, weight=0.3)
        cg = compile_graph(w, v, f, fm, domain_mask=dm,
                           color_hint=ising_color_hint(n, m))
        compile_s = time.perf_counter() - t0
        try:
            eng = HbmItemGridEngine(cg)
        except ValueError as err:
            print("%dx%d: rejected (%s)" % (n, m, err), flush=True)
            continue

        def runner(ep, r):
            vals, counts = eng.run(seed=1 + r, burn=0, epochs=ep)
            return counts

        # sanity: marginals of an unbiased lattice hover around 0.5
        cnt = np.asarray(runner(8, 8))
        assert 0.2 < cnt.mean() / 8 < 0.8, cnt.mean() / 8
        lo, hi = (4, 40) if n * m > 4e6 else (16, 1500)
        ups, per = epoch_rate(runner, n * m, lo=lo, hi=hi)
        rows.append("%d\t%dx%d\t%d\t%.2f\t%.3f\t%.3e" %
                    (n * m, n, m, eng.sr, compile_s, 1e3 * per, ups))
        print(rows[-1], flush=True)
    with open(out_path, "w") as fh:
        fh.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "hbm_scale.tsv"
    run(out)
