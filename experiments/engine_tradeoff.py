"""Engine-tradeoff experiment: which engine wins where.

Analog of the reference's tradeoff experiment family
(reference: experiments/tradeoff/generate.py — partitioning-scheme
tradeoffs), re-targeted at engine selection: for each graph family and
size, time the XLA work-item engine, the Pallas itemgrid engine, and
(for lattices) the stencil engines, and report updates/s. TSV output.

Usage: python experiments/engine_tradeoff.py [out.tsv]
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from numbskull_tpu.compile import compile_graph
from numbskull_tpu.models import (
    coin_model, ising_color_hint, ising_grid, lf_model, voting_grouped,
    voting_model,
)


def _time_xla(cg, epochs):
    from numbskull_tpu.ops import GibbsEngine
    eng = GibbsEngine(cg)
    st = eng.init_state()
    st = eng.inference(st, jax.random.PRNGKey(0), epochs=2)
    np.asarray(st.count)
    t0 = time.perf_counter()
    st = eng.inference(st, jax.random.PRNGKey(1), epochs=epochs)
    np.asarray(st.count)
    return cg.n_vars * epochs / (time.perf_counter() - t0)


def _time_itemgrid(cg, epochs):
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine
    try:
        eng = PallasItemGridEngine(cg)
    except ValueError as e:
        return None, str(e)
    eng.run(seed=0, burn=0, epochs=2)
    t0 = time.perf_counter()
    eng.run(seed=1, burn=0, epochs=epochs)
    return cg.n_vars * epochs / (time.perf_counter() - t0), ""


def run(out_path="engine_tradeoff.tsv"):
    cases = []
    for n in (128, 512):
        w, v, f, fm, dm, e = ising_grid(n, n, weight=0.3)
        cases.append((f"ising_{n}x{n}", (w, v, f, fm, dm),
                      ising_color_hint(n, n)))
    w, v, f, fm, dm, e = coin_model(5000, 0.3, -0.2, 0.4, evidence=False,
                                    weight_init=(0.3, -0.2, 0.4),
                                    fixed=True)
    cases.append(("coin_10k", (w, v, f, fm, dm), None))
    w, v, f, fm, dm, e = lf_model(0.3, [0.9, 0.5], copies=2000, seed=0)
    cases.append(("lf_categorical", (w, v, f, fm, dm), None))
    w, v, f, fm, dm, e = voting_model(16384, 8192, 10, weight=0.1, seed=1)
    cases.append(("voting_rand_deg10", (w, v, f, fm, dm), None))
    for deg in (10, 50):
        w, v, f, fm, dm, e = voting_grouped(200_000, deg, weight=0.3)
        cases.append(("voting_grouped_deg%d" % deg, (w, v, f, fm, dm),
                      None))

    rows = ["graph\tn_vars\tn_colors\txla_ups\titemgrid_ups\tnote"]
    for name, (w, v, f, fm, dm), hint in cases:
        cg = compile_graph(w, v, f, fm, domain_mask=dm, color_hint=hint)
        # enough epochs that per-call host transfer doesn't dominate
        epochs = max(100, min(1000, 50_000_000 // max(cg.n_vars, 1)))
        xla = _time_xla(cg, epochs)
        item, note = _time_itemgrid(cg, epochs)
        rows.append("%s\t%d\t%d\t%.3e\t%s\t%s" % (
            name, cg.n_vars, cg.n_colors, xla,
            "%.3e" % item if item else "fallback", note[:60]))
        print(rows[-1], flush=True)
    with open(out_path, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print("wrote", out_path)


if __name__ == "__main__":
    run(*(sys.argv[1:2] or ["engine_tradeoff.tsv"]))
