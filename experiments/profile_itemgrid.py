"""Decompose the itemgrid kernel's per-epoch cost by stage ablation.

For each configuration, builds a FRESH engine with a set of kernel
stages ablated (ops/itemgrid_pallas.ABLATE, trace-time debug knob) and
times the epoch loop on hardware; the cost of a stage is the time delta
vs the run with that stage removed. Run on a real TPU:

    python experiments/profile_itemgrid.py [grid_n] [epochs]

Prints a TSV of (config, epoch_ms, updates/s) plus the inferred stage
breakdown for the affine path.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from numbskull_tpu.compile import compile_graph
from numbskull_tpu.models import ising_color_hint, ising_grid, voting_grouped
from numbskull_tpu.ops import itemgrid_pallas as ig


def time_engine(cg, ablate, epochs):
    ig.ABLATE = frozenset(ablate)
    try:
        eng = ig.PallasItemGridEngine(cg)
        eng.run(seed=0, burn=0, epochs=2)
        best = None
        for rep in range(3):
            t0 = time.perf_counter()
            eng.run(seed=1 + rep, burn=0, epochs=epochs)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best / epochs
    finally:
        ig.ABLATE = frozenset()


CONFIGS = [
    ("full", set()),
    ("-tally", {"tally"}),
    ("-prng", {"prng"}),
    ("-eval", {"eval"}),
    ("-eval-gather", {"eval", "gather"}),
    ("-dma", {"dma"}),
    ("-draw", {"draw"}),
    ("-uscr", {"uscr", "prng"}),
    ("-store", {"store"}),
    ("-all", {"tally", "prng", "eval", "gather", "dma"}),
    ("-ALL", {"tally", "prng", "eval", "gather", "dma", "draw",
              "uscr", "store"}),
]


def profile(name, args, n_vars, epochs):
    w, v, f, fm, dm, e = args
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    print(f"# {name}: {n_vars} vars")
    base = None
    for label, abl in CONFIGS:
        try:
            ep = time_engine(cg, abl, epochs)
        except ValueError as ex:
            print(f"{name}\t{label}\tunsupported: {ex}")
            continue
        if label == "full":
            base = ep
        ups = n_vars / ep
        delta = "" if base is None else f"\t{1e3 * (base - ep):+.3f}"
        print(f"{name}\t{label}\t{1e3 * ep:.3f}\t{ups:.3e}{delta}")
        sys.stdout.flush()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    profile(f"ising{n}", ising_grid(n, n, weight=0.3), n * n, epochs)
    profile("voting_deg10",
            voting_grouped(200_000, 10, weight=0.3), 200_000, epochs)
    profile("voting_deg50",
            voting_grouped(204_000, 50, weight=0.3), 204_000, epochs)


if __name__ == "__main__":
    main()
