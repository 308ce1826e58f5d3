"""Degree-scaling experiment: throughput vs factor degree.

The reference's flagship scaling experiment
(reference: salt/src/experiment_intro_degree.py:9-88 — 1.26M variables,
degree 1..50, copies = n_vars/degree disjoint voting groups of one
proposition + degree voters under a single AND factor;
experiments/intro/generate.py), re-targeted at the TPU engines: each
degree runs through the auto engine dispatch (the fused Pallas itemgrid
kernel when the graph is in its envelope — degree+1 colors, arity
degree+1 — else the XLA work-item engine). Rates are EPOCH-DIFFERENCED
(numbskull_tpu/benchutil.py) and compiles go through the on-disk plan
cache (NSX_PLAN_CACHE; second run's compile_s is ~0).

Usage: python experiments/degree_sweep.py [out.tsv] [n_vars]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

from numbskull_tpu.benchutil import epoch_rate
from numbskull_tpu.compile import compile_graph
from numbskull_tpu.models import voting_grouped
from numbskull_tpu.ops import GibbsEngine


def run(out_path="degree_sweep.tsv", n_vars=1_260_000,
        degrees=(1, 2, 5, 10, 20, 35, 50)):
    cache = os.environ.get(
        "NSX_PLAN_CACHE",
        os.path.expanduser("~/.cache/numbskull_tpu"))  # 2nd run: ~0s
    rows = ["degree\tn_vars\tn_colors\tengine\tcompile_s\tepoch_ms\t"
            "updates_per_s"]
    for degree in degrees:
        args = voting_grouped(n_vars, degree, weight=0.3, seed=1)
        w, v, f, fm, dm, e = args
        V = len(v)
        t0 = time.perf_counter()
        cg = compile_graph(w, v, f, fm, domain_mask=dm,
                           cache=cache or None)
        compile_s = time.perf_counter() - t0

        engine = "xla"
        ups = per = None
        if jax.default_backend() == "tpu":
            try:
                from numbskull_tpu.ops.itemgrid_pallas import \
                    PallasItemGridEngine
                eng = PallasItemGridEngine(cg)

                def runner(ep, r):
                    return eng.run(seed=1 + r, burn=0, epochs=ep,
                                   host=False)

                ups, per = epoch_rate(runner, V, lo=16, hi=1500)
                engine = "itemgrid"
            except ValueError as err:
                print("degree %d: itemgrid fallback (%s)" % (degree, err),
                      flush=True)
        if ups is None:
            eng = GibbsEngine(cg)
            st = eng.init_state()

            def runner(ep, r):
                return eng.inference(st, jax.random.PRNGKey(1 + r),
                                     epochs=ep).count

            ups, per = epoch_rate(runner, V, lo=8, hi=200)
        rows.append(f"{degree}\t{V}\t{cg.n_colors}\t{engine}\t"
                    f"{compile_s:.2f}\t{1e3 * per:.2f}\t{ups:.0f}")
        print(rows[-1], flush=True)
    with open(out_path, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print("wrote", out_path)


if __name__ == "__main__":
    argv = sys.argv[1:]
    run(*argv[:1], *(int(a) for a in argv[1:2]))
