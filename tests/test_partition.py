"""Partitioner: components, balance, cut quality, ownership semantics."""

import numpy as np

from numbskull_tpu.compile import compile_graph, conflict_edges
from numbskull_tpu.models import ising_grid
from numbskull_tpu.parallel.partition import (
    balanced_partition, choose_partition, connected_components, edge_cut,
    make_part_plans, partition_cost,
)


def test_choose_partition_prefers_zero_cut_components():
    """Disconnected graphs (e.g. the coin model's independent pairs)
    should pick the component packing (zero cut), like the reference's
    cc-partition scheme (numbskull_master.py:301-325)."""
    from numbskull_tpu.models import coin_model
    w, v, f, fm, dm, e = coin_model(50, evidence=True)
    edges = conflict_edges(v, f, fm)
    part, report = choose_partition(len(v), edges, 4)
    assert report["chosen"] == "cc"
    assert edge_cut(edges, part) == 0
    sizes = np.bincount(part, minlength=4)
    assert sizes.max() <= 2 * sizes.min() + 2


def test_choose_partition_connected_graph():
    w, v, f, fm, dm, e = ising_grid(16, 16)
    edges = conflict_edges(v, f, fm)
    part, report = choose_partition(256, edges, 4)
    assert int(part.max()) + 1 == 4
    best = min(x for k, x in report.items() if k != "chosen")
    assert partition_cost(256, edges, part, 4) == best


def test_connected_components():
    edges = np.array([[0, 1], [1, 2], [4, 5]])
    cc = connected_components(7, edges)
    assert cc[0] == cc[1] == cc[2]
    assert cc[4] == cc[5]
    assert len({cc[0], cc[3], cc[4], cc[6]}) == 4


def test_balanced_partition_grid():
    w, v, f, fm, dm, e = ising_grid(16, 16)
    edges = conflict_edges(v, f, fm)
    part = balanced_partition(256, edges, 4, seed=1)
    sizes = np.bincount(part, minlength=4)
    assert sizes.max() - sizes.min() <= 2
    # BFS growing should beat a random partition's cut substantially
    rng = np.random.default_rng(0)
    rand_cut = edge_cut(edges, rng.integers(0, 4, 256))
    assert edge_cut(edges, part) < 0.7 * rand_cut


def test_part_plans_ownership():
    w, v, f, fm, dm, e = ising_grid(8, 8)
    edges = conflict_edges(v, f, fm)
    part = balanced_partition(64, edges, 2, seed=0)
    plans = make_part_plans(v, f, fm, part, 2)
    # every variable owned exactly once
    owned = np.stack([p.owned_mask for p in plans])
    assert (owned.sum(axis=0) == 1).all()
    # every factor sampled by exactly one part
    skip_sets = [set(p.factors_to_skip.tolist()) for p in plans]
    for fid in range(len(f)):
        assert sum(fid not in s for s in skip_sets) == 1
    # part-local graphs compile (factors_to_skip path)
    for p in plans:
        cg = compile_graph(w, p.variables, f, fm,
                           factors_to_skip=p.factors_to_skip)
        assert cg.n_vars == 64
