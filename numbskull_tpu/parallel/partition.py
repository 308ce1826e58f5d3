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
    """Union-find connected components over conflict/adjacency edges.

    Returns (V,) component ids (0-based, dense). Reference analog:
    salt/src/messages.py:542-588 (which pushed components to Postgres).
    """
    parent = np.arange(n_vars, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, w in np.asarray(edges, np.int64):
        ru, rw = find(u), find(w)
        if ru != rw:
            parent[max(ru, rw)] = min(ru, rw)
    roots = np.array([find(x) for x in range(n_vars)], np.int64)
    _, dense = np.unique(roots, return_inverse=True)
    return dense


def balanced_partition(n_vars: int, edges: np.ndarray, n_parts: int,
                       seed: int = 0) -> np.ndarray:
    """Balanced edge-locality partition (METIS-lite).

    Greedy BFS region growing from spread-out seeds with strict balance
    caps: grows each part along adjacency so most edges stay internal,
    like the reference's metis path (salt/src/messages.py:591-670) but
    dependency-free and vectorized enough for millions of variables.
    """
    if n_parts <= 1:
        return np.zeros(n_vars, np.int64)
    edges = np.asarray(edges, np.int64)
    # CSR adjacency
    deg = np.zeros(n_vars, np.int64)
    if len(edges):
        np.add.at(deg, edges[:, 0], 1)
        np.add.at(deg, edges[:, 1], 1)
    offs = np.concatenate(([0], np.cumsum(deg)))
    adj = np.zeros(offs[-1], np.int64)
    cur = offs[:-1].copy()
    for u, w in edges:
        adj[cur[u]] = w
        cur[u] += 1
        adj[cur[w]] = u
        cur[w] += 1

    cap = -(-n_vars // n_parts)
    part = np.full(n_vars, -1, np.int64)
    sizes = np.zeros(n_parts, np.int64)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n_vars)

    from collections import deque

    frontier = [deque() for _ in range(n_parts)]
    seed_iter = iter(order)

    def next_unassigned():
        for v in seed_iter:
            if part[v] < 0:
                return int(v)
        return -1

    p = 0
    while True:
        # refill empty frontiers with fresh seeds
        grew = False
        for p in range(n_parts):
            if sizes[p] >= cap:
                continue
            if not frontier[p]:
                s = next_unassigned()
                if s < 0:
                    break
                frontier[p].append(s)
            q = frontier[p]
            # grow one BFS layer-step for this part
            steps = 0
            while q and sizes[p] < cap and steps < 64:
                v = q.popleft()
                if part[v] >= 0:
                    continue
                part[v] = p
                sizes[p] += 1
                grew = True
                steps += 1
                for w in adj[offs[v]:offs[v + 1]]:
                    if part[w] < 0:
                        q.append(int(w))
        if not grew:
            rest = np.flatnonzero(part < 0)
            if len(rest) == 0:
                break
            # place leftovers in the emptiest parts
            for v in rest:
                p = int(np.argmin(sizes))
                part[v] = p
                sizes[p] += 1
            break
    return part


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
