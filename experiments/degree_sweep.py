"""Degree-scaling experiment: throughput vs factor degree.

Analog of the reference's intro-degree experiment
(reference: salt/src/experiment_intro_degree.py:9-88 — 1.26M vars,
degree 1..50, partition schemes, TSV output), re-targeted at the TPU
engine: voting graphs of controlled degree through the general
work-item engine, TSV of wall time and updates/s.

Usage: python experiments/degree_sweep.py [out.tsv] [n_vars] [n_factors]
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from numbskull_tpu.compile import compile_graph
from numbskull_tpu.models import voting_model
from numbskull_tpu.ops import GibbsEngine


def run(out_path="degree_sweep.tsv", n_vars=8192, n_factors=2048,
        epochs=10, degrees=(1, 2, 5, 10, 20)):
    rows = ["degree\tn_colors\tcompile_s\tepoch_ms\tupdates_per_s"]
    for degree in degrees:
        args = voting_model(n_vars, n_factors, degree, weight=0.1, seed=1)
        w, v, f, fm, dm, e = args
        t0 = time.perf_counter()
        cg = compile_graph(w, v, f, fm, domain_mask=dm)
        compile_s = time.perf_counter() - t0
        eng = GibbsEngine(cg)
        st = eng.init_state()
        st = eng.inference(st, jax.random.PRNGKey(0), epochs=2)
        np.asarray(st.count)
        t0 = time.perf_counter()
        st = eng.inference(st, jax.random.PRNGKey(1), epochs=epochs)
        np.asarray(st.count)
        dt = time.perf_counter() - t0
        ups = n_vars * epochs / dt
        rows.append(f"{degree}\t{cg.n_colors}\t{compile_s:.2f}\t"
                    f"{1e3 * dt / epochs:.2f}\t{ups:.0f}")
        print(rows[-1], flush=True)
    with open(out_path, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print("wrote", out_path)


if __name__ == "__main__":
    argv = sys.argv[1:]
    run(*argv[:1], *(int(a) for a in argv[1:3]))
