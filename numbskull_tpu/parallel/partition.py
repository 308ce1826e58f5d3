"""Graph partitioning for multi-host / multi-shard execution.

Analog of the reference's partitioning stack (reference:
salt/src/messages.py:542-670 find_connected_components /
find_metis_parts, salt/src/numbskull_master.py:301-325 ddlog schemes):
assigns variables to parts, derives per-part factor ownership, and
produces the same execution-facing artifacts the reference uses —
`factors_to_skip` lists and not-owned (`isEvidence=4`) variable marking
(reference: salt/src/numbskull_master.py:343,
salt/src/numbskull_minion.py:185).

No Postgres, no SaltStack: partitioning is pure host-side numpy over the
same structured arrays, and each host/shard slices its own subgraph from
the binary files (the TPU-native replacement for per-minion SQL
filters).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def connected_components(n_vars: int, edges: np.ndarray) -> np.ndarray:
    """Connected components over conflict/adjacency edges.

    Returns (V,) component ids (0-based, dense). Vectorized min-label
    hooking (compile.cc_labels) — no per-edge Python. Reference analog:
    salt/src/messages.py:542-588 (which pushed components to Postgres).
    """
    from numbskull_tpu.compile import cc_labels
    e = np.asarray(edges, np.int64).reshape(-1, 2)
    roots = cc_labels(n_vars, e[:, 0], e[:, 1])
    _, dense = np.unique(roots, return_inverse=True)
    return dense


def balanced_partition(n_vars: int, edges: np.ndarray, n_parts: int,
                       seed: int = 0) -> np.ndarray:
    """Balanced edge-locality partition (METIS-lite), fully vectorized.

    Orders variables by the bandwidth-reducing (component, BFS level,
    degree) rank (compile.rcm_rank) and cuts the order into equal
    contiguous chunks: stripes on lattices, component packing on
    shattered graphs — the same edge-locality goal as the reference's
    metis path (salt/src/messages.py:591-670) without the dependency,
    and without per-vertex Python at multi-M-var scale. ``seed`` breaks
    ties in the BFS level order (distinct seeds give distinct stripe
    phases for choose_partition to score).
    """
    if n_parts <= 1 or n_vars == 0:
        return np.zeros(n_vars, np.int64)
    edges = np.asarray(edges, np.int64).reshape(-1, 2)
    if not len(edges):
        return (np.arange(n_vars, dtype=np.int64) * n_parts) // n_vars
    from numbskull_tpu.compile import rcm_rank
    rank = rcm_rank(n_vars, edges[:, 0], edges[:, 1])
    if seed:
        # rotate the cut phase: different seeds move the chunk
        # boundaries, giving choose_partition distinct candidates
        rank = (rank + (seed * n_vars) // (4 * n_parts)) % n_vars
    return (rank * n_parts) // n_vars


def label_prop_refine(n_vars: int, edges: np.ndarray, part: np.ndarray,
                      n_parts: int, rounds: int = 24,
                      imbalance: float = 0.05,
                      seed: int = 0) -> np.ndarray:
    """Cut-minimizing refinement: size-constrained label propagation.

    The real replacement for the reference's METIS path
    (salt/src/messages.py:591-670 find_metis_parts): starting from any
    balanced assignment, each round every variable counts its adjacency
    into each part and wants the part it is most connected to; moves
    with positive cut gain are applied best-gain-first under a per-part
    inflow quota (max part size <= (1+imbalance) * V/P), with a random
    half-subsample per round to damp two-vertex oscillation. Fully
    vectorized (no per-vertex Python); returns the best-cut assignment
    seen across rounds.
    """
    e = np.asarray(edges, np.int64).reshape(-1, 2)
    P = int(n_parts)
    if P <= 1 or not len(e) or n_vars == 0:
        return np.asarray(part, np.int64).copy()
    part = np.asarray(part, np.int64).copy()
    rng = np.random.default_rng(seed)
    u = np.concatenate([e[:, 0], e[:, 1]])
    v = np.concatenate([e[:, 1], e[:, 0]])
    cap = int(np.ceil((1.0 + imbalance) * n_vars / P))
    best_part, best_cut = part.copy(), edge_cut(e, part)
    # neighbor-label histogram in vertex chunks to bound the V*P buffer
    chunk = max(1, (64 << 20) // max(P, 1))
    order_u = np.argsort(u, kind="stable")
    us, vs = u[order_u], v[order_u]
    starts = np.searchsorted(us, np.arange(n_vars + 1))
    for rnd in range(rounds):
        tgt = part.copy()
        gain = np.zeros(n_vars, np.int64)
        for lo in range(0, n_vars, chunk):
            hi = min(lo + chunk, n_vars)
            sl = slice(starts[lo], starts[hi])
            key = (us[sl] - lo) * P + part[vs[sl]]
            cnt = np.bincount(key, minlength=(hi - lo) * P)
            cnt = cnt.reshape(hi - lo, P)
            ar = np.arange(hi - lo)
            cur = cnt[ar, part[lo:hi]]
            t = cnt.argmax(axis=1)
            tgt[lo:hi] = t
            gain[lo:hi] = cnt[ar, t] - cur
        movers = np.flatnonzero((gain > 0) & (tgt != part))
        if not len(movers):
            break
        # damp oscillation: random half-subsample of movers per round
        if len(movers) > 1:
            movers = movers[rng.random(len(movers)) < 0.5]
        if not len(movers):
            continue
        # best-gain-first under per-part inflow quotas
        sizes = np.bincount(part, minlength=P)
        quota = np.maximum(cap - sizes, 0)
        mo = movers[np.argsort(-gain[movers], kind="stable")]
        grp = np.argsort(tgt[mo], kind="stable")   # gain order kept
        tg = tgt[mo][grp]
        gstart = np.searchsorted(tg, np.arange(P + 1))
        rank = np.arange(len(mo)) - gstart[tg]
        take = mo[grp][rank < quota[tg]]
        part[take] = tgt[take]
        cut = edge_cut(e, part)
        if cut < best_cut:
            best_cut, best_part = cut, part.copy()
    return best_part


def edge_cut(edges: np.ndarray, part: np.ndarray) -> int:
    """Number of adjacency edges crossing partition boundaries."""
    if not len(edges):
        return 0
    e = np.asarray(edges, np.int64)
    return int((part[e[:, 0]] != part[e[:, 1]]).sum())


def partition_cost(n_vars: int, edges: np.ndarray, part: np.ndarray,
                   n_parts: int, bandwidth_weight: float = 4.0,
                   imbalance_weight: float = 1.0) -> float:
    """Cost model for a candidate partitioning: per-sync traffic (cut
    edges) plus load imbalance (max/mean part size − 1). Analog of the
    reference's cost-model-driven scheme selection
    (salt/src/numbskull_master.py:371-393 sql_to_cost over
    simple.costmodel.txt), with compute/traffic terms instead of SQL
    cardinalities."""
    sizes = np.bincount(part, minlength=n_parts).astype(np.float64)
    mean = max(sizes.mean(), 1.0)
    imbalance = sizes.max() / mean - 1.0
    cut = edge_cut(edges, part) / max(len(edges), 1)
    return bandwidth_weight * cut + imbalance_weight * imbalance


def choose_partition(n_vars: int, edges: np.ndarray, n_parts: int,
                     seeds=(0, 1, 2)) -> tuple[np.ndarray, dict]:
    """Pick the best partitioning among candidate schemes by cost.

    Candidates: connected-components packing (exact zero-cut when the
    graph shatters into >= n_parts components) and balanced BFS region
    growing from several seeds — the reference's scheme menu
    (cc-partition / semantic / metis, numbskull_master.py:301-325)
    re-expressed without Postgres. Returns (part, report)."""
    candidates = {}
    cc = connected_components(n_vars, edges)
    n_cc = int(cc.max()) + 1 if n_vars else 1
    if n_cc >= n_parts:
        # pack components into parts round-robin by size (greedy LPT)
        sizes = np.bincount(cc)
        order = np.argsort(sizes)[::-1]
        load = np.zeros(n_parts, np.int64)
        cc_part = np.zeros(n_cc, np.int64)
        for comp in order:
            tgt = int(np.argmin(load))
            cc_part[comp] = tgt
            load[tgt] += sizes[comp]
        candidates["cc"] = cc_part[cc]
    for s in seeds:
        candidates["bfs%d" % s] = balanced_partition(
            n_vars, edges, n_parts, seed=s)
    # cut-minimizing refinement of the primary chunking (and of the
    # component packing when it exists) — the METIS-quality entries
    if "bfs0" in candidates:
        candidates["lp"] = label_prop_refine(
            n_vars, edges, candidates["bfs0"], n_parts)
    if "cc" in candidates:
        candidates["cc+lp"] = label_prop_refine(
            n_vars, edges, candidates["cc"], n_parts)
    report = {}
    best_name, best_part, best_cost = None, None, np.inf
    for name, part in candidates.items():
        cost = partition_cost(n_vars, edges, part, n_parts)
        report[name] = cost
        if cost < best_cost:
            best_name, best_part, best_cost = name, part, cost
    report["chosen"] = best_name
    return best_part, report


@dataclasses.dataclass
class PartPlan:
    """Per-part execution artifacts (reference-semantics ownership)."""

    part_id: int
    variables: np.ndarray         # Variable records with isEvidence=4 for
    #                               vars not owned by this part
    factors_to_skip: np.ndarray   # sorted factor ids this part must not
    #                               sample over (owned elsewhere)
    owned_mask: np.ndarray        # (V,) bool


def make_part_plans(variables, factors, fmap, part: np.ndarray,
                    n_parts: int) -> list[PartPlan]:
    """Derive per-part views: a factor is owned by the part owning its
    FIRST variable (a deterministic stand-in for the reference's
    partition-key schemes); variables referenced but not owned are
    marked isEvidence=4 so the local sampler never touches them
    (reference numbskull/inference.py:21-23)."""
    first_vid = fmap["vid"][factors["ftv_offset"].astype(np.int64)]
    factor_part = part[first_vid.astype(np.int64)]
    plans = []
    for p in range(n_parts):
        owned = part == p
        v = variables.copy()
        v["isEvidence"] = np.where(owned, variables["isEvidence"],
                                   np.int8(4))
        skip = np.flatnonzero(factor_part != p).astype(np.int64)
        plans.append(PartPlan(part_id=p, variables=v,
                              factors_to_skip=skip, owned_mask=owned))
    return plans
