"""Pallas TPU kernel: fused chromatic Gibbs for ARBITRARY boolean graphs.

The XLA work-item engine (ops/gibbs.py) expresses the sweep with gather /
segment_sum primitives; on TPU those lower to serialized scalar loops
(~1e7 elements/s), capping general graphs far below the hardware. This
kernel is the TPU-native design for the irregular case (SURVEY.md §7.3
"irregular gather/scatter on TPU"):

- variables renumbered COLOR-MAJOR so each color step's writes are one
  contiguous VMEM store (no scatter at all);
- items in a ROW-DENSE (row, slot) layout so potential accumulation is a
  sum over a static axis (no segment_sum);
- the only irregular access — reading factor-argument values — becomes a
  windowed two-step one-hot gather: a (W/128-wide) row-select matmul on
  the MXU followed by a lane-select reduction on the VPU. Windows exist
  because the compiler renumbers variables for locality, so a block of
  rows only references a bounded span of the value array;
- state (values + tallies) stays VMEM-resident across ALL epochs; item
  tables stream from HBM as ONE packed DMA per row block; sampling uses
  the hardware PRNG (pltpu.prng_random_bits).

Scope (v1): boolean variables (cardinality 2, dataType 0), boolean factor
functions (IMPLY_NATURAL/OR/EQUAL/AND/ISTRUE/LINEAR/RATIO/LOGICAL/
IMPLY_MLN), inference only (learning runs on the XLA engine). Graphs
outside the envelope report a reason and fall back. Semantics match
GibbsEngine: same potentials (reference numbskull/inference.py:55-71),
same chromatic schedule, stationary marginals agree.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from numbskull_tpu import types as T
from numbskull_tpu.compile import CompiledGraph

BOOL_FUNCS = (T.FUNC_NOOP, T.FUNC_IMPLY_NATURAL, T.FUNC_OR, T.FUNC_EQUAL,
              T.FUNC_AND, T.FUNC_ISTRUE, T.FUNC_LINEAR, T.FUNC_RATIO,
              T.FUNC_LOGICAL, T.FUNC_IMPLY_MLN)

RB = 2048            # rows per block (multiple of 128)
W_MAX = 16384        # max window span (multiple of 128)
D_MAX = 32           # max items per row
A_MAX = 8            # max factor arity
V_MAX = 4 << 20      # max padded variables (VMEM budget)
COLOR_MAX = 8


def _ceil(a, m):
    return -(-a // m) * m


@dataclasses.dataclass
class _ColorPack:
    packed: np.ndarray      # (num_rb, ROWS, RB) int32 — see _pack_rows
    wrow: np.ndarray        # (num_rb,) int32 window start / 128
    num_rb: int
    D: int
    A: int
    Wc: int                 # window span (multiple of 128)
    start: int              # first renumbered vid of this color
    present: tuple          # factor codes present


@dataclasses.dataclass
class ItemGridPlan:
    colors: list[_ColorPack]
    perm: np.ndarray        # (V,) original vid -> renumbered slot
    vp: int                 # padded renumbered size (multiple of 128)
    n_vars: int
    init_new: np.ndarray    # (vp,) int32 initial values (renumbered)
    tally_new: np.ndarray   # (vp,) int32 tally mask (renumbered)
    n_weights: int = 0


def _rcm_rank(n_vars: int, edges_u: np.ndarray,
              edges_v: np.ndarray) -> np.ndarray:
    """Reverse Cuthill–McKee rank over an undirected adjacency: a
    bandwidth-reducing order so itemgrid windows stay bounded on graphs
    whose natural variable ids are shuffled."""
    deg = np.zeros(n_vars, np.int64)
    np.add.at(deg, edges_u, 1)
    np.add.at(deg, edges_v, 1)
    offs = np.concatenate(([0], np.cumsum(deg)))
    adj = np.zeros(offs[-1], np.int64)
    cur = offs[:-1].copy()
    for u, v in zip(edges_u, edges_v):
        adj[cur[u]] = v
        cur[u] += 1
        adj[cur[v]] = u
        cur[v] += 1
    visited = np.zeros(n_vars, bool)
    order = np.empty(n_vars, np.int64)
    pos = 0
    by_deg = np.argsort(deg, kind="stable")
    for seed in by_deg:
        if visited[seed]:
            continue
        visited[seed] = True
        order[pos] = seed
        head = pos
        pos += 1
        while head < pos:
            u = order[head]
            head += 1
            nbrs = adj[offs[u]:offs[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if len(nbrs):
                nbrs = np.unique(nbrs)
                nbrs = nbrs[np.argsort(deg[nbrs], kind="stable")]
                visited[nbrs] = True
                order[pos:pos + len(nbrs)] = nbrs
                pos += len(nbrs)
    rank = np.empty(n_vars, np.int64)
    rank[order[::-1]] = np.arange(n_vars)
    return rank


def plan_item_grid(cg: CompiledGraph, sample_evidence: bool = True):
    """Compile a CompiledGraph into the kernel's layout.

    Returns (ItemGridPlan, None) or (None, reason) when the graph is
    outside the kernel envelope (caller falls back to the XLA engine).
    Tries the natural variable order first; if a window overflows, tries
    again with a reverse-Cuthill–McKee bandwidth-reducing order.
    """
    plan, reason = _plan_item_grid_ranked(cg, sample_evidence, None)
    if plan is not None or "window span" not in (reason or ""):
        return plan, reason
    # second chance: RCM reorder
    eu, ev = [], []
    for p in cg.plans:
        iv = p.it_valid
        own = p.cv_vid[p.it_row[iv]].astype(np.int64)
        av = p.it_args_vid[iv].astype(np.int64)
        mask = p.it_args_valid[iv] & ~p.it_subst[iv]
        eu.append(np.repeat(own, mask.sum(1)))
        ev.append(av[mask])
    eu = np.concatenate(eu) if eu else np.zeros(0, np.int64)
    ev = np.concatenate(ev) if ev else np.zeros(0, np.int64)
    rank = _rcm_rank(cg.n_vars, eu, ev)
    plan2, reason2 = _plan_item_grid_ranked(cg, sample_evidence, rank)
    return (plan2, None) if plan2 is not None else (None, reason)


def _plan_item_grid_ranked(cg: CompiledGraph, sample_evidence: bool,
                           rank):
    if not (np.asarray(cg.var_card) == 2).all():
        return None, "non-boolean cardinality"
    if not (np.asarray(cg.var_dtype) == 0).all():
        return None, "categorical dataType"
    if cg.n_colors > COLOR_MAX:
        return None, "too many colors (%d)" % cg.n_colors

    isev = np.asarray(cg.var_isev)
    upd_ok = (isev == 0) | (sample_evidence & (isev == 1))
    tally_ok = upd_ok.copy()

    # renumber: color-major (optionally rank-ordered within each color),
    # each color padded to RB
    starts, vp = [], 0
    for p in cg.plans:
        starts.append(vp)
        vp += _ceil(int(p.cv_valid.sum()), RB)
    if vp > V_MAX:
        return None, "graph too large for VMEM (%d padded vars)" % vp
    perm = np.full(cg.n_vars, -1, np.int64)
    row_orders = []
    for p, s in zip(cg.plans, starts):
        vids = p.cv_vid[p.cv_valid].astype(np.int64)
        if rank is not None:
            ro = np.argsort(rank[vids], kind="stable")
        else:
            ro = np.arange(len(vids))
        row_orders.append(ro)
        perm[vids[ro]] = s + np.arange(len(vids))
    assert (perm >= 0).all()

    init_new = np.zeros(vp, np.int32)
    tally_new = np.zeros(vp, np.int32)
    upd_new = np.zeros(vp, np.int32)
    init_new[perm] = np.asarray(cg.var_init)
    tally_new[perm] = tally_ok
    upd_new[perm] = upd_ok

    colors = []
    for p, start, ro in zip(cg.plans, starts, row_orders):
        n_rows = int(p.cv_valid.sum())
        R = _ceil(max(n_rows, 1), RB)
        num_rb = R // RB
        inv_ro = np.empty(n_rows, np.int64)
        inv_ro[ro] = np.arange(n_rows)

        it_valid = p.it_valid
        rows = p.it_row[it_valid].astype(np.int64)
        ftype = p.it_ftype[it_valid].astype(np.int64)
        arity = p.it_arity[it_valid].astype(np.int64)
        wid = p.it_wid[it_valid].astype(np.int64)
        avid = p.it_args_vid[it_valid].astype(np.int64)     # (I, Ap)
        avalid = p.it_args_valid[it_valid]

        pres = tuple(sorted(set(int(t) for t in np.unique(ftype))))
        if any(t not in BOOL_FUNCS for t in pres):
            return None, "unsupported factor function in color"
        if len(arity) and int(arity.max()) > A_MAX:
            return None, "arity > %d" % A_MAX

        # per-row slot index (items are sorted by row)
        counts = np.bincount(rows, minlength=n_rows) if len(rows) else \
            np.zeros(n_rows, np.int64)
        D = int(counts.max()) if len(counts) else 1
        D = max(D, 1)
        if D > D_MAX:
            return None, "max row degree %d > %d" % (D, D_MAX)
        A = int(avid.shape[1]) if len(rows) else 1
        A = max(min(A, A_MAX), 1)

        # dense (R, D) grids; subst slots and padding carry offset 0 and
        # an explicit subst/ignore mask (their gathered value is replaced
        # by the candidate / masked by arity)
        g_ftype = np.full((R, D), -1, np.int64)              # NOOP pad
        g_arity = np.ones((R, D), np.int64)
        g_wid = np.zeros((R, D), np.int64)
        g_off = np.zeros((R, D, A), np.int64)
        g_subst = np.zeros((R, D, A), bool)
        g_fetch = np.zeros((R, D, A), bool)
        if len(rows):
            slot = np.arange(len(rows)) - np.concatenate(
                ([0], np.cumsum(counts)[:-1]))[rows]
            nrows_i = inv_ro[rows]           # rows in the ranked order
            g_ftype[nrows_i, slot] = ftype
            g_arity[nrows_i, slot] = arity
            g_wid[nrows_i, slot] = wid
            subst = p.it_subst[it_valid][:, :A]
            fetch = avalid[:, :A] & ~subst
            g_off[nrows_i, slot, :] = np.where(fetch, perm[avid[:, :A]], 0)
            g_subst[nrows_i, slot, :] = subst
            g_fetch[nrows_i, slot, :] = fetch

        # per-block windows over genuinely fetched ids (subst slots are
        # replaced by the candidate; padding is arity-masked)
        blk = np.arange(R) // RB
        big = np.iinfo(np.int64).max
        lo = np.full(num_rb, big)
        hi = np.zeros(num_rb, np.int64)
        np.minimum.at(lo, blk,
                      np.where(g_fetch, g_off, big).min(axis=(1, 2)))
        np.maximum.at(hi, blk,
                      np.where(g_fetch, g_off, 0).max(axis=(1, 2)))
        lo = np.where(lo == big, 0, lo)
        base = (lo // 128) * 128
        span = np.maximum(hi + 1 - base, 1)
        Wc = int(_ceil(max(int(span.max()), 256), 128))
        if Wc > W_MAX:
            return None, "window span %d > %d (graph lacks locality)" % \
                (Wc, W_MAX)
        base = np.minimum(base, vp - Wc)                     # stay in range
        base = np.maximum(base, 0)
        if ((hi - base) >= Wc).any():
            return None, "window overflow after clamping"

        g_off = np.where(g_fetch, g_off - base[blk][:, None, None], 0)
        assert (g_off >= 0).all() and (g_off < Wc).all()

        # pack rows (layout helpers in _Layout):
        #   [0:DA)          arg offsets within the window
        #   [DA:DA+D)       ftype+1 | arity<<8
        #   [DA+D:DA+2D)    baked w[wid] bits (inference; per weight set)
        #   [DA+2D:DA+3D)   subst bitmask over args
        #   [DA+3D:DA+4D)   weight ids (learning)
        #   [DA+4D:DA+5D)   featureValue bits (learning)
        #   [DA+5D]         upd   — free-chain update mask
        #   [DA+5D+1]       upd_e — clamped-chain update mask (isev==0)
        #   [DA+5D+2]       lrn_e — evidence rows (gradient mask)
        DA = D * A
        ROWS = _ceil(DA + 5 * D + 3, 8)   # sublane-aligned for DMA slices
        packed = np.zeros((num_rb, ROWS, RB), np.int32)

        def put_rd(dst_row, grid):    # (R, D) -> packed rows
            packed[:, dst_row:dst_row + D] = \
                grid.reshape(num_rb, RB, D).transpose(0, 2, 1)

        off_rb = g_off.reshape(num_rb, RB, D, A).transpose(0, 2, 3, 1)
        packed[:, :DA] = off_rb.reshape(num_rb, DA, RB)
        put_rd(DA, (g_ftype + 1) | (g_arity << 8))
        sbits = (g_subst.astype(np.int64) <<
                 np.arange(A, dtype=np.int64)[None, None, :]).sum(-1)
        put_rd(DA + 2 * D, sbits)
        put_rd(DA + 3 * D, g_wid)
        g_fv = np.zeros((R, D), np.float32)
        if len(rows):
            g_fv[rows, slot] = p.it_fv[it_valid].astype(np.float32)
        put_rd(DA + 4 * D, g_fv.view(np.int32))
        isev_c = np.zeros(R, np.int64)
        valid_c = np.zeros(R, bool)
        isev_c[:n_rows] = isev[p.cv_vid[p.cv_valid].astype(np.int64)[ro]]
        valid_c[:n_rows] = True
        packed[:, DA + 5 * D] = \
            upd_new[start:start + R].reshape(num_rb, RB)
        packed[:, DA + 5 * D + 1] = \
            (valid_c & (isev_c == 0)).reshape(num_rb, RB)
        packed[:, DA + 5 * D + 2] = \
            (valid_c & (isev_c == 1)).reshape(num_rb, RB)

        colors.append(_ColorPack(
            packed=packed, wrow=(base // 128).astype(np.int32),
            num_rb=num_rb, D=D, A=A, Wc=Wc, start=start,
            present=pres, ))
        # stash for weight fill
        colors[-1]._g_wid = g_wid.reshape(num_rb, RB, D).transpose(0, 2, 1)

    return ItemGridPlan(colors=colors, perm=perm, vp=vp,
                        n_vars=cg.n_vars, init_new=init_new,
                        tally_new=tally_new, n_weights=cg.n_weights), None


def fill_weights(plan: ItemGridPlan, weight_value: np.ndarray):
    """Bake w[wid] into each color's packed block (weights change only
    between runs; potentials use w * eval, reference inference.py:66-70)."""
    wv = np.asarray(weight_value, np.float32)
    for c in plan.colors:
        DA = c.D * c.A
        wslab = wv[c._g_wid]                       # (num_rb, D, RB) f32
        c.packed[:, DA + c.D:DA + 2 * c.D] = wslab.view(np.int32)


def _eval_bool(present, ftype, arity, vals, A):
    """Vectorized boolean factor evaluation on (1, RB)-shaped slabs.

    Parity with golden.eval_factor's boolean branch (reference
    numbskull/inference.py:156-260); vals is a list of A (1, RB) int32.
    """
    f32 = jnp.float32
    avalid = [(jnp.int32(a) < arity) for a in range(A)]
    head_pos = arity - 1

    def red(fn, init, body_only=False):
        acc = init
        for a in range(A):
            m = avalid[a] if not body_only else (jnp.int32(a) < head_pos)
            acc = fn(acc, m, vals[a])
        return acc

    n_zero = red(lambda s, m, v: s + jnp.where(m & (v == 0), 1, 0), 0)
    n_one = red(lambda s, m, v: s + jnp.where(m & (v == 1), 1, 0), 0)
    head = 0
    for a in range(A):
        head = jnp.where(jnp.int32(a) == head_pos, vals[a], head)
    v0 = vals[0]
    n_diff0 = red(lambda s, m, v: s + jnp.where(m & (v != v0), 1, 0), 0)
    n_head_eq = red(lambda s, m, v: s + jnp.where(m & (v == head), 1, 0),
                    0, body_only=True)
    n_body_zero = red(lambda s, m, v: s + jnp.where(m & (v == 0), 1, 0),
                      0, body_only=True)

    one, neg, zero = f32(1), f32(-1), f32(0)
    headf = head.astype(f32)
    out = zero
    for t in present:
        if t == T.FUNC_NOOP:
            val = zero
        elif t == T.FUNC_IMPLY_NATURAL:
            val = jnp.where(n_zero > 0, zero,
                            jnp.where(head == 1, one, neg))
        elif t == T.FUNC_OR:
            val = jnp.where(n_one > 0, one, neg)
        elif t == T.FUNC_EQUAL:
            val = jnp.where(n_diff0 > 0, neg, one)
        elif t in (T.FUNC_AND, T.FUNC_ISTRUE):
            val = jnp.where(n_zero > 0, neg, one)
        elif t == T.FUNC_LINEAR:
            val = n_head_eq.astype(f32)
        elif t == T.FUNC_RATIO:
            val = jnp.log1p(n_head_eq.astype(f32))
        elif t == T.FUNC_LOGICAL:
            val = jnp.where(n_head_eq > 0, one, zero)
        elif t == T.FUNC_IMPLY_MLN:
            val = jnp.where(n_body_zero > 0, one, headf)
        else:  # pragma: no cover - guarded by plan_item_grid
            val = zero
        out = jnp.where(ftype == jnp.int32(t), val, out)
    return out


def _gather(win, off, sub_iota, lane_iota):
    """Two-step one-hot gather: win[(off>>7, off&127)] for each item.

    win: (Wr, 128) f32; off: (1, RB) int32; sub_iota: (Wr, RB);
    lane_iota: (128, RB). Returns (1, RB) f32. Row select is an MXU
    matmul; lane select is a VPU sublane reduction.
    """
    roh = (sub_iota == (off >> 7)).astype(jnp.float32)
    rows_sel = jax.lax.dot_general(
        win, roh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (128, RB)
    loh = lane_iota == (off & 127)
    return jnp.sum(jnp.where(loh, rows_sel, 0.0), axis=0, keepdims=True)


def _uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * \
        jnp.float32(1.0 / (1 << 24))


def _make_kernel(plan: ItemGridPlan):
    vp = plan.vp
    colors = plan.colors

    def kernel(seed_ref, burn_ref, epochs_ref, *refs):
        n_c = len(colors)
        wrow_refs = refs[:n_c]
        x_in = refs[n_c]
        tally_in = refs[n_c + 1]
        hbm_refs = refs[n_c + 2:n_c + 2 + n_c]
        x_out, count_out = refs[n_c + 2 + n_c:n_c + 2 + n_c + 2]
        scr = refs[n_c + 2 + n_c + 2:]
        pack_scr = scr[:n_c]
        sem = scr[n_c]

        pltpu.prng_seed(seed_ref[0])
        x_out[:] = x_in[:]
        count_out[:] = jnp.zeros((vp // 128, 128), jnp.int32)

        burn = burn_ref[0]
        total = burn + epochs_ref[0]

        def color_step(ci):
            c = colors[ci]
            D, A, Wc = c.D, c.A, c.Wc
            DA = D * A
            rbl = RB // 128

            def rb_body(rb, _):
                cp = pltpu.make_async_copy(
                    hbm_refs[ci].at[rb], pack_scr[ci], sem)
                cp.start()
                cp.wait()
                pk = pack_scr[ci]
                wrow = wrow_refs[ci][rb]
                win = x_out[pl.ds(wrow, Wc // 128), :].astype(
                    jnp.float32)                       # (Wc/128, 128)
                upd = pk[DA + 5 * D:DA + 5 * D + 1, :]       # (1, RB)

                pot = [jnp.zeros((1, RB), jnp.float32) for _ in range(2)]
                sub_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (Wc // 128, RB), 0)
                lane_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (128, RB), 0)
                for d in range(D):
                    fta = pk[DA + d:DA + d + 1, :]           # (1, RB)
                    ftype = (fta & 0xFF) - 1
                    arity = fta >> 8
                    w = pltpu.bitcast(
                        pk[DA + D + d:DA + D + d + 1, :], jnp.float32)
                    sbits = pk[DA + 2 * D + d:DA + 2 * D + d + 1, :]
                    gathered = []
                    substs = []
                    for a in range(A):
                        off = pk[d * A + a:d * A + a + 1, :]  # (1, RB)
                        g = _gather(win, off, sub_iota, lane_iota)
                        gathered.append(g.astype(jnp.int32))
                        substs.append((sbits & (1 << a)) != 0)
                    for k in range(2):
                        vals = [jnp.where(substs[a], jnp.int32(k),
                                          gathered[a]) for a in range(A)]
                        e = _eval_bool(c.present, ftype, arity, vals, A)
                        pot[k] = pot[k] + w * e

                p1 = jax.nn.sigmoid(pot[1] - pot[0])
                u = _uniform((1, RB))
                new = (u < p1).astype(jnp.int32)        # (1, RB)

                row0 = c.start // 128 + rb * rbl
                old = x_out[pl.ds(row0, rbl), :]
                new2 = new.reshape(rbl, 128)
                upd2 = upd.reshape(rbl, 128)
                x_out[pl.ds(row0, rbl), :] = \
                    jnp.where(upd2 == 1, new2, old)
                return 0

            jax.lax.fori_loop(0, c.num_rb, rb_body, 0)

        def epoch_body(i, _):
            for ci in range(n_c):
                color_step(ci)
            mult = (i >= burn).astype(jnp.int32)
            count_out[:] = count_out[:] + x_out[:] * tally_in[:] * mult
            return 0

        jax.lax.fori_loop(0, total, epoch_body, 0)

    return kernel


def _make_learn_kernel(plan: ItemGridPlan, lp, wrows: int):
    """Dual-chain SGD fully in-kernel (reference learning.py:46-125 with
    the batched per-color semantics of ops/gibbs._color_step_learn):
    clamped + free chains advance together; per color step the gradient
    (eval at free proposal − eval at clamped sample) × featureValue is
    accumulated by weight id via a one-hot MXU reduction and the weight
    vector (VMEM-resident) is updated with L1/L2 regularization."""
    vp = plan.vp
    colors = plan.colors

    def kernel(seed_ref, burn_ref, epochs_ref, step0_ref, decay_ref,
               *refs):
        n_c = len(colors)
        wrow_refs = refs[:n_c]
        x_in = refs[n_c]
        w_in = refs[n_c + 1]
        wfix = refs[n_c + 2]
        hbm_refs = refs[n_c + 3:n_c + 3 + n_c]
        x_out, xe_out, w_out = refs[n_c + 3 + n_c:n_c + 3 + n_c + 3]
        scr = refs[n_c + 3 + n_c + 3:]
        pack_scr = scr[:n_c]
        gw_scr, nw_scr = scr[n_c], scr[n_c + 1]
        sem = scr[n_c + 2]

        pltpu.prng_seed(seed_ref[0])
        x_out[:] = x_in[:]
        xe_out[:] = x_in[:]
        w_out[:] = w_in[:]

        w_iota_rb = jax.lax.broadcasted_iota(jnp.int32, (wrows, RB), 0)
        lane_iota_rb = jax.lax.broadcasted_iota(jnp.int32, (128, RB), 0)

        def sweep_chain(chain_ref):
            """One inference-style sweep of the free chain (burn-in;
            reference burn samples evidence, _run_learn burn_body)."""
            for ci in range(len(colors)):
                c = colors[ci]
                D, A, Wc = c.D, c.A, c.Wc
                DA = D * A
                rbl = RB // 128
                sub_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (Wc // 128, RB), 0)

                def rb_body(rb, _):
                    cp = pltpu.make_async_copy(
                        hbm_refs[ci].at[rb], pack_scr[ci], sem)
                    cp.start()
                    cp.wait()
                    pk = pack_scr[ci]
                    win = chain_ref[pl.ds(wrow_refs[ci][rb], Wc // 128),
                                    :].astype(jnp.float32)
                    upd = pk[DA + 5 * D:DA + 5 * D + 1, :]
                    pot = [jnp.zeros((1, RB), jnp.float32)
                           for _ in range(2)]
                    for d in range(D):
                        fta = pk[DA + d:DA + d + 1, :]
                        ftype = (fta & 0xFF) - 1
                        arity = fta >> 8
                        wid = pk[DA + 3 * D + d:DA + 3 * D + d + 1, :]
                        w = _gather(w_out[:], wid, w_iota_rb, lane_iota_rb)
                        sbits = pk[DA + 2 * D + d:DA + 2 * D + d + 1, :]
                        gat, sub = [], []
                        for a in range(A):
                            off = pk[d * A + a:d * A + a + 1, :]
                            gat.append(_gather(win, off, sub_iota,
                                               lane_iota_rb)
                                       .astype(jnp.int32))
                            sub.append((sbits & (1 << a)) != 0)
                        for k in range(2):
                            vals = [jnp.where(sub[a], jnp.int32(k),
                                              gat[a]) for a in range(A)]
                            e = _eval_bool(c.present, ftype, arity,
                                           vals, A)
                            pot[k] = pot[k] + w * e
                    p1 = jax.nn.sigmoid(pot[1] - pot[0])
                    new = (_uniform((1, RB)) < p1).astype(jnp.int32)
                    row0 = c.start // 128 + rb * rbl
                    old = chain_ref[pl.ds(row0, rbl), :]
                    chain_ref[pl.ds(row0, rbl), :] = jnp.where(
                        upd.reshape(rbl, 128) == 1,
                        new.reshape(rbl, 128), old)
                    return 0

                jax.lax.fori_loop(0, c.num_rb, rb_body, 0)

        def learn_color(ci, step):
            c = colors[ci]
            D, A, Wc = c.D, c.A, c.Wc
            DA = D * A
            rbl = RB // 128
            sub_iota = jax.lax.broadcasted_iota(
                jnp.int32, (Wc // 128, RB), 0)
            gw_scr[:] = jnp.zeros((wrows, 128), jnp.float32)
            nw_scr[:] = jnp.zeros((wrows, 128), jnp.float32)

            def rb_body(rb, _):
                cp = pltpu.make_async_copy(
                    hbm_refs[ci].at[rb], pack_scr[ci], sem)
                cp.start()
                cp.wait()
                pk = pack_scr[ci]
                wrow = wrow_refs[ci][rb]
                win_p = x_out[pl.ds(wrow, Wc // 128), :].astype(
                    jnp.float32)
                win_e = xe_out[pl.ds(wrow, Wc // 128), :].astype(
                    jnp.float32)
                upd = pk[DA + 5 * D:DA + 5 * D + 1, :]
                upd_e = pk[DA + 5 * D + 1:DA + 5 * D + 2, :]
                lrn_ev = pk[DA + 5 * D + 2:DA + 5 * D + 3, :]
                lrn = upd if lp.learn_non_evidence else lrn_ev

                # gather args on both chains; potentials per candidate
                pot_p = [jnp.zeros((1, RB), jnp.float32) for _ in range(2)]
                pot_e = [jnp.zeros((1, RB), jnp.float32) for _ in range(2)]
                per_d = []
                for d in range(D):
                    fta = pk[DA + d:DA + d + 1, :]
                    ftype = (fta & 0xFF) - 1
                    arity = fta >> 8
                    wid = pk[DA + 3 * D + d:DA + 3 * D + d + 1, :]
                    fv = pltpu.bitcast(
                        pk[DA + 4 * D + d:DA + 4 * D + d + 1, :],
                        jnp.float32)
                    w = _gather(w_out[:], wid, w_iota_rb, lane_iota_rb)
                    sbits = pk[DA + 2 * D + d:DA + 2 * D + d + 1, :]
                    gat_p, gat_e, sub = [], [], []
                    for a in range(A):
                        off = pk[d * A + a:d * A + a + 1, :]
                        gat_p.append(_gather(win_p, off, sub_iota,
                                             lane_iota_rb)
                                     .astype(jnp.int32))
                        gat_e.append(_gather(win_e, off, sub_iota,
                                             lane_iota_rb)
                                     .astype(jnp.int32))
                        sub.append((sbits & (1 << a)) != 0)
                    for k in range(2):
                        vp_ = [jnp.where(sub[a], jnp.int32(k), gat_p[a])
                               for a in range(A)]
                        ve_ = [jnp.where(sub[a], jnp.int32(k), gat_e[a])
                               for a in range(A)]
                        pot_p[k] = pot_p[k] + w * _eval_bool(
                            c.present, ftype, arity, vp_, A)
                        pot_e[k] = pot_e[k] + w * _eval_bool(
                            c.present, ftype, arity, ve_, A)
                    per_d.append((ftype, arity, wid, fv, sbits,
                                  gat_p, gat_e, sub))

                # draw both chains; clamped chain keeps evidence pinned
                e_samp = (_uniform((1, RB)) <
                          jax.nn.sigmoid(pot_e[1] - pot_e[0])).astype(
                              jnp.int32)
                p_samp = (_uniform((1, RB)) <
                          jax.nn.sigmoid(pot_p[1] - pot_p[0])).astype(
                              jnp.int32)
                row0 = c.start // 128 + rb * rbl
                x_rows = x_out[pl.ds(row0, rbl), :].reshape(1, RB)
                xe_rows = xe_out[pl.ds(row0, rbl), :].reshape(1, RB)
                p_val = jnp.where(upd == 1, p_samp, x_rows)
                e_val = jnp.where(upd_e == 1, e_samp, xe_rows)
                x_out[pl.ds(row0, rbl), :] = p_val.reshape(rbl, 128)
                xe_out[pl.ds(row0, rbl), :] = e_val.reshape(rbl, 128)

                # gradient = eval(free @ proposal) - eval(clamped @
                # evidence sample), times featureValue
                for (ftype, arity, wid, fv, sbits, gat_p, gat_e,
                     sub) in per_d:
                    vp_ = [jnp.where(sub[a], p_val, gat_p[a])
                           for a in range(A)]
                    ve_ = [jnp.where(sub[a], e_val, gat_e[a])
                           for a in range(A)]
                    ev_p = _eval_bool(c.present, ftype, arity, vp_, A)
                    ev_e = _eval_bool(c.present, ftype, arity, ve_, A)
                    inc = (lrn == 1) & (ftype != -1)
                    grad = jnp.where(inc, (ev_p - ev_e) * fv, 0.0)
                    roh = (w_iota_rb == (wid >> 7)).astype(jnp.float32)
                    loh = lane_iota_rb == (wid & 127)
                    gw_scr[:] = gw_scr[:] + jax.lax.dot_general(
                        roh, jnp.where(loh, grad, 0.0),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    nw_scr[:] = nw_scr[:] + jax.lax.dot_general(
                        roh, jnp.where(loh, inc.astype(jnp.float32), 0.0),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, c.num_rb, rb_body, 0)

            # apply the update (reference learning.py:111-125 semantics,
            # batched as in ops/gibbs._color_step_learn)
            gw, nw = gw_scr[:], nw_scr[:]
            if lp.grad_agg == "mean":
                gw = gw / jnp.maximum(nw, 1.0)
            w = w_out[:]
            touched = (nw > 0) & (wfix[:] == 0)
            if lp.regularization == 2:
                shrink = 1.0 / (1.0 + lp.reg_param * step)
                w_new = w * shrink - step * gw
            elif lp.regularization == 1:
                w_new = w - step * gw
                l1d = lp.reg_param * step * lp.truncation
                w_tr = jnp.where(w_new > 0, jnp.maximum(0.0, w_new - l1d),
                                 jnp.minimum(0.0, w_new + l1d))
                u = _uniform((wrows, 128))
                w_new = jnp.where(u < 1.0 / lp.truncation, w_tr, w_new)
            else:
                w_new = w - step * gw
            w_out[:] = jnp.where(touched, w_new, w)

        def burn_body(i, _):
            sweep_chain(x_out)
            return 0

        jax.lax.fori_loop(0, burn_ref[0], burn_body, 0)

        def epoch_body(i, _):
            step = step0_ref[0] * jnp.exp(
                i.astype(jnp.float32) * jnp.log(decay_ref[0]))
            for ci in range(len(colors)):
                learn_color(ci, step)
            return 0

        jax.lax.fori_loop(0, epochs_ref[0], epoch_body, 0)

    return kernel


class PallasItemGridEngine:
    """Fused general-graph Gibbs engine (boolean graphs).

    Usage: eng = PallasItemGridEngine(cg); marg = eng.run(...)
    Raises ValueError with the reason when the graph is unsupported —
    callers fall back to GibbsEngine.
    """

    def __init__(self, cg: CompiledGraph, sample_evidence: bool = True,
                 interpret: bool = False):
        plan, reason = plan_item_grid(cg, sample_evidence)
        if plan is None:
            raise ValueError("itemgrid kernel unsupported: " + reason)
        self.cg = cg
        self.plan = plan
        self.interpret = interpret
        self._weights_for = None
        self._call = None

    def _build_call(self):
        plan = self.plan
        kernel = _make_kernel(plan)
        n_c = len(plan.colors)
        vp = plan.vp

        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 +      # seed/b/e
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_c +    # wrow
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 +      # x, tally
            [pl.BlockSpec(memory_space=pltpu.ANY)] * n_c       # packed
        )
        out_specs = (pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch = [pltpu.VMEM(c.packed.shape[1:], jnp.int32)
                   for c in plan.colors]
        scratch.append(pltpu.SemaphoreType.DMA(()))

        @functools.partial(jax.jit, static_argnames=())
        def call(seed, burn, epochs, x0, tally, *packs):
            return pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct((vp // 128, 128), jnp.int32),
                    jax.ShapeDtypeStruct((vp // 128, 128), jnp.int32)),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    vmem_limit_bytes=110 * 1024 * 1024),
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(seed, burn, epochs,
              *[jnp.asarray(c.wrow) for c in plan.colors],
              x0, tally, *packs)

        return call

    def _build_learn_call(self, lp):
        plan = self.plan
        n_c = len(plan.colors)
        vp = plan.vp
        wrows = max(_ceil(-(-plan.n_weights // 128), 8), 8)
        if plan.n_weights > wrows * 128:
            raise ValueError("itemgrid learn: too many weights")
        kernel = _make_learn_kernel(plan, lp, wrows)

        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 5 +      # scalars
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_c +    # wrow
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3 +      # x0,w0,wfix
            [pl.BlockSpec(memory_space=pltpu.ANY)] * n_c       # packed
        )
        out_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in range(3))
        scratch = [pltpu.VMEM(c.packed.shape[1:], jnp.int32)
                   for c in plan.colors]
        scratch.append(pltpu.VMEM((wrows, 128), jnp.float32))   # gw
        scratch.append(pltpu.VMEM((wrows, 128), jnp.float32))   # nw
        scratch.append(pltpu.SemaphoreType.DMA(()))

        def call(seed, burn, epochs, step0, decay, x0, w0, wfix, *packs):
            return pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct((vp // 128, 128), jnp.int32),
                    jax.ShapeDtypeStruct((vp // 128, 128), jnp.int32),
                    jax.ShapeDtypeStruct((wrows, 128), jnp.float32)),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    vmem_limit_bytes=110 * 1024 * 1024),
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(seed, burn, epochs, step0, decay,
              *[jnp.asarray(c.wrow) for c in plan.colors],
              x0, w0, wfix, *packs)

        return jax.jit(call), wrows

    def learn(self, seed: int, burn: int, epochs: int, stepsize: float,
              decay: float = 1.0, lp=None, weight_value=None):
        """In-kernel dual-chain SGD; returns learned weights (W,) f32.

        Matches ops/gibbs.GibbsEngine.learn semantics for boolean
        graphs; the plan must have been built with sample_evidence=True
        (the constructor default) so the free chain updates every owned
        variable, as the reference's learning sweep does."""
        from numbskull_tpu.ops.gibbs import LearnParams
        lp = lp or LearnParams()
        plan = self.plan
        wv = np.asarray(self.cg.weight_init if weight_value is None
                        else weight_value, np.float32)
        # ensure packs exist (baked weight rows are ignored by this path)
        if self._weights_for is None:
            fill_weights(plan, wv)
            self._packs = [jnp.asarray(c.packed) for c in plan.colors]
            self._weights_for = wv.tobytes()
        key = (lp,)
        if getattr(self, "_learn_for", None) != key:
            self._learn_call, self._wrows = self._build_learn_call(lp)
            self._learn_for = key
        w0 = np.zeros((self._wrows, 128), np.float32)
        w0.reshape(-1)[:len(wv)] = wv
        wfix = np.zeros((self._wrows, 128), np.int32)
        wfix.reshape(-1)[:len(wv)] = np.asarray(self.cg.weight_fixed,
                                                np.int32)
        x2d = jnp.asarray(plan.init_new.reshape(plan.vp // 128, 128))
        x_out, xe_out, w_out = self._learn_call(
            jnp.asarray([seed], jnp.int32), jnp.asarray([burn], jnp.int32),
            jnp.asarray([epochs], jnp.int32),
            jnp.asarray([stepsize], jnp.float32),
            jnp.asarray([decay], jnp.float32),
            x2d, jnp.asarray(w0), jnp.asarray(wfix), *self._packs)
        return np.asarray(w_out).reshape(-1)[:plan.n_weights]

    def run(self, seed: int, burn: int, epochs: int,
            weight_value=None, x0=None):
        """Run burn + epochs sweeps; returns (values, counts) in ORIGINAL
        variable order ((V,) int32, (V,) int32)."""
        plan = self.plan
        wv = np.asarray(self.cg.weight_init if weight_value is None
                        else weight_value, np.float32)
        wkey = wv.tobytes()
        if self._weights_for != wkey:
            fill_weights(plan, wv)
            self._packs = [jnp.asarray(c.packed) for c in plan.colors]
            self._weights_for = wkey
        if self._call is None:
            self._call = self._build_call()

        init = plan.init_new.copy()
        if x0 is not None:
            init[plan.perm] = np.asarray(x0, np.int32)
        x2d = jnp.asarray(init.reshape(plan.vp // 128, 128))
        t2d = jnp.asarray(plan.tally_new.reshape(plan.vp // 128, 128))
        x_out, cnt = self._call(
            jnp.asarray([seed], jnp.int32), jnp.asarray([burn], jnp.int32),
            jnp.asarray([epochs], jnp.int32), x2d, t2d, *self._packs)
        x_flat = np.asarray(x_out).reshape(-1)[plan.perm]
        c_flat = np.asarray(cnt).reshape(-1)[plan.perm]
        return x_flat, c_flat

    def marginals(self, counts: np.ndarray, epochs: int) -> np.ndarray:
        return counts.astype(np.float64) / float(max(epochs, 1))
