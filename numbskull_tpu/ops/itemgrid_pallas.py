"""Pallas TPU kernel: fused chromatic Gibbs for ARBITRARY factor graphs.

The XLA work-item engine (ops/gibbs.py) expresses the sweep with gather /
segment_sum primitives; on TPU those lower to serialized scalar loops
(~1e7 elements/s), capping general graphs far below the hardware. This
kernel is the TPU-native design for the irregular case (SURVEY.md §7.3
"irregular gather/scatter on TPU"):

- variables renumbered COLOR-MAJOR (bandwidth-reduced by reverse
  Cuthill–McKee when needed) so each color step's writes are one
  contiguous VMEM store (no scatter at all);
- items in a ROW-DENSE (row, slot) layout so potential accumulation is a
  sum over a static axis (no segment_sum);
- the only irregular access — reading factor-argument values — becomes a
  windowed two-step one-hot gather: a row-select matmul on the MXU
  followed by a lane-select reduction on the VPU;
- state (both chains, weights, per-value tallies) stays VMEM-resident
  across ALL epochs; item tables stream from HBM as ONE packed DMA per
  row block; sampling uses the hardware PRNG.

Coverage: boolean AND categorical variables (cardinality <= K_MAX_SUP),
ALL 25 reference factor functions (boolean, categorical, the nine
data-programming generative factors, and FUNC_UFO), inference AND
dual-chain SGD learning; per-value tallies are int16 (cap ~30k tallied
epochs per run; chain runs compose across calls). Graphs outside the
envelope report a reason and the caller
falls back to ops/gibbs.GibbsEngine. Semantics match GibbsEngine: same
potentials (reference numbskull/inference.py:55-71), same vmap slot
logic for categorical adjacency (reference dataloading.py:16-81), same
chromatic schedule; stationary marginals agree.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from numbskull_tpu import types as T
from numbskull_tpu.compile import CompiledGraph

SUPPORTED_FUNCS = tuple(T.FACTORS.values())

RB = 1024            # rows per block (multiple of 128; smaller blocks
#                      shrink gather windows and the MXU work that scales
#                      with them, at the cost of more DMA issues)
W_MAX = 16384        # max window span (multiple of 128)
D_MAX = 32           # max items per row
A_MAX = 8            # max factor arity
K_MAX_SUP = 8        # max variable cardinality
V_MAX = 10 << 20     # max padded variables (VMEM: 4B values + 1B tally
#                      + 2B/value counts; chunked init/tally avoid
#                      register spills; 3072x3072 lattices = 9.4M vars
#                      verified on hardware)
COLOR_MAX = 8


def _ceil(a, m):
    return -(-a // m) * m


class _Layout:
    """Packed-block row layout (all int32; floats bitcast)."""

    def __init__(self, D: int, A: int):
        self.D, self.A = D, A
        DA = D * A
        self.off = 0              # DA rows: arg offsets within window
        self.eq = DA              # DA rows: dense_equal_to per arg
        self.acard = 2 * DA       # DA rows: cardinality per arg
        self.fta = 3 * DA         # D rows: (ftype+1) | arity<<8
        self.wbake = 3 * DA + D   # D rows: baked w[wid] bits (inference)
        self.sbits = 3 * DA + 2 * D   # D rows: subst bitmask over args
        self.wid = 3 * DA + 3 * D     # D rows: weight ids
        self.fv = 3 * DA + 4 * D      # D rows: featureValue bits
        self.dd = 3 * DA + 5 * D      # D rows: slot d1 | d2<<8
        self.upd = 3 * DA + 6 * D     # free-chain update mask
        self.upd_e = self.upd + 1     # clamped-chain update mask
        self.lrn = self.upd + 2       # evidence rows (gradient mask)
        self.rowmeta = self.upd + 3   # row card | dataType<<8
        self.wrow = self.upd + 4      # window bases/128 in lanes [0:DA)
        #                               (kept in the block: SMEM inputs
        #                               pad each element to a word and
        #                               blow the 1MB SMEM budget at scale)
        self.rows = _ceil(self.upd + 5, 8)


@dataclasses.dataclass
class _ColorPack:
    packed: np.ndarray      # (num_rb, layout.rows, RB) int32
    wrow: np.ndarray        # (num_rb, D*A) int32 window starts / 128
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
    kmax: int               # max cardinality (static K loop bound)
    init_new: np.ndarray    # (vp,) int32 initial values (renumbered)
    tally_new: np.ndarray   # (vp,) int32 tally mask (renumbered)
    n_weights: int = 0


def _rcm_rank(n_vars: int, edges_u: np.ndarray,
              edges_v: np.ndarray) -> np.ndarray:
    """Reverse Cuthill–McKee-style rank over an undirected adjacency: a
    bandwidth-reducing order so itemgrid windows stay bounded on graphs
    whose natural variable ids are shuffled (see compile.rcm_rank)."""
    from numbskull_tpu.compile import rcm_rank
    return rcm_rank(n_vars, edges_u, edges_v)


def plan_item_grid(cg: CompiledGraph, sample_evidence: bool = True):
    """Compile a CompiledGraph into the kernel's layout.

    Returns (ItemGridPlan, None) or (None, reason) when the graph is
    outside the kernel envelope (caller falls back to the XLA engine).
    Tries the natural variable order first; if a window overflows, tries
    again with a reverse-Cuthill–McKee bandwidth-reducing order.
    """
    plan, reason = _plan_ranked(cg, sample_evidence, None)
    if plan is not None or "window span" not in (reason or ""):
        return plan, reason
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
    plan2, _ = _plan_ranked(cg, sample_evidence, rank)
    return (plan2, None) if plan2 is not None else (None, reason)


def _plan_ranked(cg: CompiledGraph, sample_evidence: bool, rank):
    kmax = int(np.asarray(cg.var_card).max()) if cg.n_vars else 1
    if kmax > K_MAX_SUP:
        return None, "cardinality %d > %d" % (kmax, K_MAX_SUP)
    if cg.n_colors > COLOR_MAX:
        return None, "too many colors (%d)" % cg.n_colors

    isev = np.asarray(cg.var_isev)
    cards = np.asarray(cg.var_card).astype(np.int64)
    dtypes = np.asarray(cg.var_dtype).astype(np.int64)
    upd_ok = (isev == 0) | (sample_evidence & (isev == 1))
    tally_ok = upd_ok.copy()

    starts, vp = [], 0
    for p in cg.plans:
        starts.append(vp)
        vp += _ceil(int(p.cv_valid.sum()), RB)
    vp = _ceil(vp, 2048)   # int16 count slabs need 16-sublane alignment
    if vp > V_MAX:
        return None, "graph too large for VMEM (%d padded vars)" % vp
    perm = np.full(cg.n_vars, -1, np.int64)
    row_orders = []
    for p, s in zip(cg.plans, starts):
        vids = p.cv_vid[p.cv_valid].astype(np.int64)
        ro = (np.argsort(rank[vids], kind="stable") if rank is not None
              else np.arange(len(vids)))
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
        vids_ranked = p.cv_vid[p.cv_valid].astype(np.int64)[ro]

        it_valid = p.it_valid
        rows = p.it_row[it_valid].astype(np.int64)
        ftype = p.it_ftype[it_valid].astype(np.int64)
        arity = p.it_arity[it_valid].astype(np.int64)
        wid = p.it_wid[it_valid].astype(np.int64)
        avid = p.it_args_vid[it_valid].astype(np.int64)     # (I, Ap)
        avalid = p.it_args_valid[it_valid]

        pres = tuple(sorted(set(int(t) for t in np.unique(ftype))))
        if any(t not in SUPPORTED_FUNCS and t != T.FUNC_NOOP
               for t in pres):
            return None, "unsupported factor function in color"
        if len(arity) and int(arity.max()) > A_MAX:
            return None, "arity > %d" % A_MAX

        counts = np.bincount(rows, minlength=n_rows) if len(rows) else \
            np.zeros(n_rows, np.int64)
        D = max(int(counts.max()) if len(counts) else 1, 1)
        if D > D_MAX:
            return None, "max row degree %d > %d" % (D, D_MAX)
        A = max(min(int(avid.shape[1]) if len(rows) else 1, A_MAX), 1)

        # dense (R, D[, A]) grids; subst slots and padding carry offset 0
        # and an explicit subst mask (replaced by the candidate / masked
        # by arity)
        g_ftype = np.full((R, D), -1, np.int64)              # NOOP pad
        g_arity = np.ones((R, D), np.int64)
        g_wid = np.zeros((R, D), np.int64)
        g_fv = np.zeros((R, D), np.float32)
        g_dd = np.zeros((R, D), np.int64)
        g_off = np.zeros((R, D, A), np.int64)
        g_eq = np.zeros((R, D, A), np.int64)
        g_acard = np.ones((R, D, A), np.int64)
        g_subst = np.zeros((R, D, A), bool)
        g_fetch = np.zeros((R, D, A), bool)
        if len(rows):
            # order items within each row by their smallest fetched-arg
            # position, so slot d is COHERENT across a block's rows and
            # each (block, slot, arg) window covers one contiguous region
            subst_all = p.it_subst[it_valid][:, :A]
            fetch_all = avalid[:, :A] & ~subst_all
            pos_all = np.where(fetch_all, perm[avid[:, :A]], np.iinfo(
                np.int64).max)
            item_key = pos_all.min(axis=1)
            order = np.lexsort((item_key, inv_ro[rows]))
            rows = rows[order]
            ftype = ftype[order]
            arity = arity[order]
            wid = wid[order]
            avid = avid[order]
            avalid = avalid[order]
            it_idx = np.flatnonzero(it_valid)[order]
            nr = inv_ro[rows]
            slot = np.arange(len(rows)) - np.concatenate(
                ([0], np.cumsum(np.bincount(nr, minlength=n_rows))[:-1])
            )[nr]
            g_ftype[nr, slot] = ftype
            g_arity[nr, slot] = arity
            g_wid[nr, slot] = wid
            g_fv[nr, slot] = p.it_fv[it_idx].astype(np.float32)
            g_dd[nr, slot] = (p.it_d1[it_idx].astype(np.int64) |
                              (p.it_d2[it_idx].astype(np.int64) << 8))
            subst = subst_all[order]
            fetch = avalid[:, :A] & ~subst
            g_off[nr, slot, :] = np.where(fetch, perm[avid[:, :A]], 0)
            g_eq[nr, slot, :] = p.it_args_eq[it_idx][:, :A]
            g_acard[nr, slot, :] = p.it_args_card[it_idx][:, :A]
            g_subst[nr, slot, :] = subst
            g_fetch[nr, slot, :] = fetch

        # per-(block, item-slot, arg-slot) windows over genuinely fetched
        # ids: a block's neighbors may scatter across several color
        # regions, but each (d, a) slot's neighbors are coherent (items
        # are grouped per row in a stable factor order), so every slot
        # gets its own window base
        blk = np.arange(R) // RB
        big = np.iinfo(np.int64).max
        lo = np.full((num_rb, D, A), big)
        hi = np.zeros((num_rb, D, A), np.int64)
        np.minimum.at(lo, blk, np.where(g_fetch, g_off, big))
        np.maximum.at(hi, blk, np.where(g_fetch, g_off, 0))
        lo = np.where(lo == big, 0, lo)
        base = (lo // 128) * 128
        span = np.maximum(hi + 1 - base, 1)
        Wc = int(_ceil(max(int(span.max()), 256), 128))
        if Wc > W_MAX:
            return None, "window span %d > %d (graph lacks locality)" % \
                (Wc, W_MAX)
        base = np.minimum(np.maximum(base, 0), vp - Wc)
        if ((hi - base) >= Wc).any():
            return None, "window overflow after clamping"
        g_off = np.where(g_fetch, g_off - base[blk], 0)
        assert (g_off >= 0).all() and (g_off < Wc).all()

        L = _Layout(D, A)
        DA = D * A
        packed = np.zeros((num_rb, L.rows, RB), np.int32)

        def put_da(row0, grid):       # (R, D, A) -> packed rows
            g = grid.reshape(num_rb, RB, D, A).transpose(0, 2, 3, 1)
            packed[:, row0:row0 + DA] = g.reshape(num_rb, DA, RB)

        def put_d(row0, grid):        # (R, D) -> packed rows
            packed[:, row0:row0 + D] = \
                grid.reshape(num_rb, RB, D).transpose(0, 2, 1)

        def put_1(row0, vec):         # (R,) -> packed row
            packed[:, row0] = vec.reshape(num_rb, RB)

        put_da(L.off, g_off)
        put_da(L.eq, g_eq)
        put_da(L.acard, g_acard)
        put_d(L.fta, (g_ftype + 1) | (g_arity << 8))
        sb = (g_subst.astype(np.int64) <<
              np.arange(A, dtype=np.int64)[None, None, :]).sum(-1)
        put_d(L.sbits, sb)
        put_d(L.wid, g_wid)
        put_d(L.fv, g_fv.view(np.int32).astype(np.int64))
        put_d(L.dd, g_dd)
        isev_c = np.zeros(R, np.int64)
        valid_c = np.zeros(R, bool)
        meta_c = np.ones(R, np.int64)         # pad rows: card 1, dtype 0
        isev_c[:n_rows] = isev[vids_ranked]
        valid_c[:n_rows] = True
        meta_c[:n_rows] = cards[vids_ranked] | (dtypes[vids_ranked] << 8)
        put_1(L.upd, upd_new[start:start + R].astype(np.int64))
        put_1(L.upd_e, (valid_c & (isev_c == 0)).astype(np.int64))
        put_1(L.lrn, (valid_c & (isev_c == 1)).astype(np.int64))
        put_1(L.rowmeta, meta_c)
        packed[:, L.wrow, :DA] = \
            (base // 128).reshape(num_rb, DA).astype(np.int32)

        cp = _ColorPack(packed=packed,
                        wrow=(base // 128).astype(np.int32).reshape(
                            num_rb, DA),
                        num_rb=num_rb, D=D, A=A, Wc=Wc, start=start,
                        present=pres)
        cp._g_wid = g_wid.reshape(num_rb, RB, D).transpose(0, 2, 1)
        colors.append(cp)

    return ItemGridPlan(colors=colors, perm=perm, vp=vp,
                        n_vars=cg.n_vars, kmax=kmax, init_new=init_new,
                        tally_new=tally_new, n_weights=cg.n_weights), None


def fill_weights(plan: ItemGridPlan, weight_value: np.ndarray):
    """Bake w[wid] into each color's packed block (inference path only;
    potentials use w * eval, reference inference.py:66-70)."""
    wv = np.asarray(weight_value, np.float32)
    for c in plan.colors:
        L = _Layout(c.D, c.A)
        wslab = wv[c._g_wid]                       # (num_rb, D, RB) f32
        c.packed[:, L.wbake:L.wbake + c.D] = wslab.view(np.int32)


# --------------------------------------------------------------------------
# factor evaluation (full reference set; golden.eval_factor parity)

def _eval_all(present, ftype, arity, vals, eqs, cards, A):
    """Vectorized factor evaluation on (1, RB)-shaped slabs.

    Parity with golden.eval_factor (reference numbskull/inference.py:
    149-413) for every function except FUNC_UFO. vals/eqs/cards are
    lists of A (1, RB) int32 slabs (hypothetical already substituted)."""
    f32 = jnp.float32
    avalid = [(jnp.int32(a) < arity) for a in range(A)]
    head_pos = arity - 1

    def red(fn, init, body_only=False):
        acc = init
        for a in range(A):
            m = avalid[a] if not body_only else (jnp.int32(a) < head_pos)
            acc = fn(acc, m, a)
        return acc

    n_zero = red(lambda s, m, a: s + jnp.where(m & (vals[a] == 0), 1, 0),
                 0)
    n_one = red(lambda s, m, a: s + jnp.where(m & (vals[a] == 1), 1, 0),
                0)
    head = 0
    head_eq = 0
    for a in range(A):
        at_head = jnp.int32(a) == head_pos
        head = jnp.where(at_head, vals[a], head)
        head_eq = jnp.where(at_head, eqs[a], head_eq)
    v0 = vals[0]
    n_diff0 = red(lambda s, m, a: s + jnp.where(m & (vals[a] != v0), 1, 0),
                  0)
    n_head_eq = red(
        lambda s, m, a: s + jnp.where(m & (vals[a] == head), 1, 0),
        0, body_only=True)
    n_body_zero = red(
        lambda s, m, a: s + jnp.where(m & (vals[a] == 0), 1, 0),
        0, body_only=True)
    n_neq_eq = red(
        lambda s, m, a: s + jnp.where(m & (vals[a] != eqs[a]), 1, 0), 0)
    n_eq_eq = red(
        lambda s, m, a: s + jnp.where(m & (vals[a] == eqs[a]), 1, 0), 0)
    n_body_neq_eq = red(
        lambda s, m, a: s + jnp.where(m & (vals[a] != eqs[a]), 1, 0),
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
        elif t in (T.FUNC_AND_CAT, T.FUNC_EQUAL_CAT_CONST):
            val = jnp.where(n_neq_eq > 0, zero, one)
        elif t == T.FUNC_OR_CAT:
            val = jnp.where(n_eq_eq > 0, one, neg)
        elif t == T.FUNC_IMPLY_NATURAL_CAT:
            val = jnp.where(n_body_neq_eq > 0, zero,
                            jnp.where(head == head_eq, one, neg))
        elif t == T.FUNC_IMPLY_MLN_CAT:
            val = jnp.where(n_body_neq_eq > 0, one,
                            jnp.where(head == head_eq, one, zero))
        elif t == T.FUNC_DP_GEN_CLASS_PRIOR:
            val = jnp.where(vals[0] == 1, one, neg)
        elif t == T.FUNC_DP_GEN_LF_PRIOR:
            val = jnp.where(vals[0] == 2, neg,
                            jnp.where(vals[0] == 0, zero, one))
        elif t == T.FUNC_DP_GEN_LF_PROPENSITY:
            val = jnp.where(vals[0] == cards[0] - 1, zero, one)
        elif t == T.FUNC_DP_GEN_LF_ACCURACY:
            val = jnp.where(vals[1] == cards[1] - 1, zero,
                            jnp.where(vals[0] == vals[1], one, neg))
        elif t == T.FUNC_DP_GEN_LF_CLASS_PROPENSITY:
            val = jnp.where(vals[1] == cards[1] - 1, zero,
                            jnp.where(vals[0] == 1, one, neg))
        elif t == T.FUNC_DP_GEN_DEP_FIXING and A >= 3:
            y, l1, l2 = vals[0], vals[1], vals[2]
            ab = jnp.where(l1 == cards[1] - 1,
                           jnp.where(l2 != 1, neg, zero), zero)
            hit = ((l1 == 0) & (l2 == 1) & (y == 1)) | \
                  ((l1 == 1) & (l2 == 0) & (y == 0))
            val = jnp.where(l1 == cards[1] - 1, ab,
                            jnp.where(hit, one, zero))
        elif t == T.FUNC_DP_GEN_DEP_REINFORCING and A >= 3:
            y, l1, l2 = vals[0], vals[1], vals[2]
            ab = jnp.where(l1 == cards[1] - 1,
                           jnp.where(l2 != 1, neg, zero), zero)
            hit = ((l1 == 0) & (l2 == 0) & (y == 0)) | \
                  ((l1 == 1) & (l2 == 1) & (y == 1))
            val = jnp.where(l1 == cards[1] - 1, ab,
                            jnp.where(hit, one, zero))
        elif t == T.FUNC_DP_GEN_DEP_EXCLUSIVE:
            ab = cards[0] - 1
            val = jnp.where((vals[0] == ab) | (vals[1] == ab), zero, neg)
        elif t == T.FUNC_DP_GEN_DEP_SIMILAR:
            val = jnp.where(vals[0] == vals[1], one, zero)
        elif t == T.FUNC_UFO:
            # distributed-support factor: value of the arg at position
            # val(0)-1, or 0 when val(0)==0 (reference
            # inference.py:398-405)
            sel = zero
            for a in range(A):
                sel = jnp.where(vals[0] - 1 == jnp.int32(a),
                                vals[a].astype(f32), sel)
            val = jnp.where(vals[0] == 0, zero, sel)
        else:  # pragma: no cover - guarded by _plan_ranked
            val = zero
        out = jnp.where(ftype == jnp.int32(t), val, out)
    return out


def _eval_bool(present, ftype, arity, vals, A):
    """Back-compat shim (boolean graphs: eq=0, card=2)."""
    z = [jnp.zeros_like(vals[0]) for _ in range(A)]
    c = [jnp.full_like(vals[0], 2) for _ in range(A)]
    return _eval_all(present, ftype, arity, vals, z, c, A)


# --------------------------------------------------------------------------
# kernel helpers

def _gather(win, off, sub_iota, lane_iota):
    """Two-step one-hot gather: win[(off>>7, off&127)] per item.

    win: (Wr, 128) f32; off: (1, RB) int32. Row select is an MXU matmul;
    lane select is a VPU sublane reduction. Returns (1, RB) f32."""
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


def _draw(pots, card, kmax):
    """Masked inverse-CDF draw over k < card from unnormalized
    log-potentials (reference inference.py:36-52; ops/sample.py parity).
    pots: list of kmax (1, RB); card: (1, RB). Returns (1, RB) int32."""
    m = pots[0]
    for k in range(1, kmax):
        m = jnp.where((jnp.int32(k) < card) & (pots[k] > m), pots[k], m)
    zs = [jnp.where(jnp.int32(k) < card, jnp.exp(pots[k] - m), 0.0)
          for k in range(kmax)]
    total = zs[0]
    for k in range(1, kmax):
        total = total + zs[k]
    u = _uniform(zs[0].shape) * total
    csum = jnp.zeros_like(total)
    val = jnp.zeros_like(card)
    for k in range(kmax):
        csum = csum + zs[k]
        val = val + (csum < u).astype(jnp.int32)
    return jnp.minimum(val, card - 1)


def _block_terms(pk, L, win_fns, sub_iota, lane_iota, w_of=None):
    """Shared per-block item decode + gathers.

    Returns a list of per-d dicts with ftype/arity/dd/eq/cards/w/fv and
    per-chain gathered arg values + subst masks. ``win_fns`` is a list
    (one per chain) of callables da -> (Wr, 128) f32 window — every
    (item-slot, arg-slot) pair has its own window base. ``w_of(wid)``
    yields per-item weights from the live weight vector (learning); when
    None, the baked per-run weights are read from the block (inference)."""
    D, A = L.D, L.A
    out = []
    for d in range(D):
        fta = pk[L.fta + d:L.fta + d + 1, :]
        term = dict(
            ftype=(fta & 0xFF) - 1,
            arity=fta >> 8,
            sbits=pk[L.sbits + d:L.sbits + d + 1, :],
            wid=pk[L.wid + d:L.wid + d + 1, :],
            fv=pltpu.bitcast(pk[L.fv + d:L.fv + d + 1, :], jnp.float32),
            dd=pk[L.dd + d:L.dd + d + 1, :],
            eqs=[pk[L.eq + d * A + a:L.eq + d * A + a + 1, :]
                 for a in range(A)],
            cards=[pk[L.acard + d * A + a:L.acard + d * A + a + 1, :]
                   for a in range(A)],
        )
        if w_of is not None:
            term["w"] = w_of(term["wid"])
        else:
            term["w"] = pltpu.bitcast(
                pk[L.wbake + d:L.wbake + d + 1, :], jnp.float32)
        term["sub"] = [(term["sbits"] & (1 << a)) != 0 for a in range(A)]
        gats = []
        for win_fn in win_fns:
            gats.append([
                _gather(win_fn(d * A + a),
                        pk[L.off + d * A + a:L.off + d * A + a + 1, :],
                        sub_iota, lane_iota).astype(jnp.int32)
                for a in range(A)])
        term["gat"] = gats
        out.append(term)
    return out


def _potentials(terms, present, A, kmax, rowmeta, chain_idx):
    """Per-candidate potentials (list of kmax (1, RB)) honoring the vmap
    slot semantics: dense rows contribute to every k < card, categorical
    rows only at their d1/d2 slots (reference dataloading.py:34-46;
    ops/gibbs.color_potentials contrib_ok)."""
    card = rowmeta & 0xFF
    dense = (rowmeta >> 8) == 0
    pots = [jnp.zeros_like(terms[0]["w"]) for _ in range(kmax)]
    for t in terms:
        d1 = t["dd"] & 0xFF
        d2 = t["dd"] >> 8
        for k in range(kmax):
            vals = [jnp.where(t["sub"][a], jnp.int32(k),
                              t["gat"][chain_idx][a]) for a in range(A)]
            e = _eval_all(present, t["ftype"], t["arity"], vals,
                          t["eqs"], t["cards"], A)
            ok_dense = dense & (jnp.int32(k) < card)
            ok_cat = (~dense) & ((jnp.int32(k) == d1) |
                                 (jnp.int32(k) == d2))
            okf = (ok_dense | ok_cat).astype(jnp.float32)
            pots[k] = pots[k] + okf * t["w"] * e
    return pots


# --------------------------------------------------------------------------
# kernels

def _make_kernel(plan: ItemGridPlan):
    vp = plan.vp
    kmax = plan.kmax
    colors = plan.colors
    vpr = vp // 128

    def kernel(seed_ref, burn_ref, epochs_ref, *refs):
        n_c = len(colors)
        x_in = refs[0]
        tally_in = refs[1]
        hbm_refs = refs[2:2 + n_c]
        x_out, count_out = refs[2 + n_c:2 + n_c + 2]
        scr = refs[2 + n_c + 2:]
        pack_scr = scr[:n_c]
        sem = scr[n_c]

        pltpu.prng_seed(seed_ref[0])
        # chunked init + tally: full-(vp)-array ops stage through vector
        # registers and spill tens of MB at multi-million-variable sizes
        CH = 4096

        def _chunks(rows):
            return [(s, min(CH, rows - s)) for s in range(0, rows, CH)]

        for s, ln in _chunks(vpr):
            x_out[pl.ds(s, ln), :] = x_in[pl.ds(s, ln), :]
        for s, ln in _chunks(kmax * vpr):
            count_out[pl.ds(s, ln), :] = jnp.zeros((ln, 128), jnp.int16)
        burn = burn_ref[0]
        total = burn + epochs_ref[0]

        def color_step(ci):
            c = colors[ci]
            L = _Layout(c.D, c.A)
            rbl = RB // 128
            sub_iota = jax.lax.broadcasted_iota(
                jnp.int32, (c.Wc // 128, RB), 0)
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, RB), 0)

            def dma(rb, slot):
                return pltpu.make_async_copy(
                    hbm_refs[ci].at[rb], pack_scr[ci].at[slot],
                    sem.at[slot])

            dma(0, 0).start()           # warm up the double buffer

            def rb_body(rb, _):
                slot = rb % 2

                @pl.when(rb + 1 < c.num_rb)
                def _():
                    dma(rb + 1, (rb + 1) % 2).start()

                dma(rb, slot).wait()
                pk = pack_scr[ci].at[slot]

                def win_x(da):
                    return x_out[pl.ds(pk[L.wrow, da], c.Wc // 128),
                                 :].astype(jnp.float32)

                upd = pk[L.upd:L.upd + 1, :]
                rowmeta = pk[L.rowmeta:L.rowmeta + 1, :]
                terms = _block_terms(pk, L, [win_x], sub_iota, lane_iota)
                pots = _potentials(terms, c.present, c.A, kmax, rowmeta, 0)
                new = _draw(pots, rowmeta & 0xFF, kmax)
                row0 = c.start // 128 + rb * rbl
                old = x_out[pl.ds(row0, rbl), :]
                x_out[pl.ds(row0, rbl), :] = jnp.where(
                    upd.reshape(rbl, 128) == 1,
                    new.reshape(rbl, 128), old)
                return 0

            jax.lax.fori_loop(0, c.num_rb, rb_body, 0)

        def epoch_body(i, _):
            for ci in range(len(colors)):
                color_step(ci)
            mult = (i >= burn).astype(jnp.int32)
            for k in range(kmax):
                for s, ln in _chunks(vpr):
                    hit = ((x_out[pl.ds(s, ln), :] == k)
                           .astype(jnp.int32) *
                           tally_in[pl.ds(s, ln), :].astype(jnp.int32) *
                           mult)
                    count_out[pl.ds(k * vpr + s, ln), :] = \
                        count_out[pl.ds(k * vpr + s, ln), :] + \
                        hit.astype(jnp.int16)
            return 0

        jax.lax.fori_loop(0, total, epoch_body, 0)

    return kernel


def _make_learn_kernel(plan: ItemGridPlan, lp, wrows: int):
    """Dual-chain SGD fully in-kernel (reference learning.py:46-125 with
    the batched per-color semantics of ops/gibbs._color_step_learn)."""
    kmax = plan.kmax
    colors = plan.colors

    def kernel(seed_ref, burn_ref, epochs_ref, step0_ref, decay_ref,
               *refs):
        n_c = len(colors)
        x_in = refs[0]
        w_in = refs[1]
        wfix = refs[2]
        hbm_refs = refs[3:3 + n_c]
        x_out, xe_out, w_out = refs[3 + n_c:3 + n_c + 3]
        scr = refs[3 + n_c + 3:]
        pack_scr = scr[:n_c]
        gw_scr, nw_scr = scr[n_c], scr[n_c + 1]
        sem = scr[n_c + 2]

        pltpu.prng_seed(seed_ref[0])
        # chunked init (full-array copies spill registers at scale)
        CH = 4096
        vpr_l = plan.vp // 128
        for s in range(0, vpr_l, CH):
            ln = min(CH, vpr_l - s)
            x_out[pl.ds(s, ln), :] = x_in[pl.ds(s, ln), :]
            xe_out[pl.ds(s, ln), :] = x_in[pl.ds(s, ln), :]
        w_out[:] = w_in[:]

        w_iota = jax.lax.broadcasted_iota(jnp.int32, (wrows, RB), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, RB), 0)

        def w_of(wid):
            return _gather(w_out[:], wid, w_iota, lane_iota)

        def sweep_free():
            """One inference-style sweep of the free chain (burn-in)."""
            for ci in range(len(colors)):
                c = colors[ci]
                L = _Layout(c.D, c.A)
                rbl = RB // 128
                sub_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (c.Wc // 128, RB), 0)

                def dma(rb, slot):
                    return pltpu.make_async_copy(
                        hbm_refs[ci].at[rb], pack_scr[ci].at[slot],
                        sem.at[slot])

                dma(0, 0).start()

                def rb_body(rb, _):
                    slot = rb % 2

                    @pl.when(rb + 1 < c.num_rb)
                    def _():
                        dma(rb + 1, (rb + 1) % 2).start()

                    dma(rb, slot).wait()
                    pk = pack_scr[ci].at[slot]

                    def win_x(da):
                        return x_out[pl.ds(pk[L.wrow, da], c.Wc // 128),
                                     :].astype(jnp.float32)

                    upd = pk[L.upd:L.upd + 1, :]
                    rowmeta = pk[L.rowmeta:L.rowmeta + 1, :]
                    terms = _block_terms(pk, L, [win_x], sub_iota,
                                         lane_iota, w_of)
                    pots = _potentials(terms, c.present, c.A, kmax,
                                       rowmeta, 0)
                    new = _draw(pots, rowmeta & 0xFF, kmax)
                    row0 = c.start // 128 + rb * rbl
                    old = x_out[pl.ds(row0, rbl), :]
                    x_out[pl.ds(row0, rbl), :] = jnp.where(
                        upd.reshape(rbl, 128) == 1,
                        new.reshape(rbl, 128), old)
                    return 0

                jax.lax.fori_loop(0, c.num_rb, rb_body, 0)

        def learn_color(ci, step):
            c = colors[ci]
            L = _Layout(c.D, c.A)
            rbl = RB // 128
            sub_iota = jax.lax.broadcasted_iota(
                jnp.int32, (c.Wc // 128, RB), 0)
            gw_scr[:] = jnp.zeros((wrows, 128), jnp.float32)
            nw_scr[:] = jnp.zeros((wrows, 128), jnp.float32)

            def dma(rb, slot):
                return pltpu.make_async_copy(
                    hbm_refs[ci].at[rb], pack_scr[ci].at[slot],
                    sem.at[slot])

            dma(0, 0).start()

            def rb_body(rb, _):
                slot = rb % 2

                @pl.when(rb + 1 < c.num_rb)
                def _():
                    dma(rb + 1, (rb + 1) % 2).start()

                dma(rb, slot).wait()
                pk = pack_scr[ci].at[slot]

                def win_p(da):
                    return x_out[pl.ds(pk[L.wrow, da], c.Wc // 128),
                                 :].astype(jnp.float32)

                def win_e(da):
                    return xe_out[pl.ds(pk[L.wrow, da], c.Wc // 128),
                                  :].astype(jnp.float32)

                upd = pk[L.upd:L.upd + 1, :]
                upd_e = pk[L.upd_e:L.upd_e + 1, :]
                lrn_ev = pk[L.lrn:L.lrn + 1, :]
                rowmeta = pk[L.rowmeta:L.rowmeta + 1, :]
                lrn = upd if lp.learn_non_evidence else lrn_ev

                terms = _block_terms(pk, L, [win_p, win_e], sub_iota,
                                     lane_iota, w_of)
                pots_p = _potentials(terms, c.present, c.A, kmax,
                                     rowmeta, 0)
                pots_e = _potentials(terms, c.present, c.A, kmax,
                                     rowmeta, 1)
                card = rowmeta & 0xFF
                e_samp = _draw(pots_e, card, kmax)
                p_samp = _draw(pots_p, card, kmax)

                row0 = c.start // 128 + rb * rbl
                x_rows = x_out[pl.ds(row0, rbl), :].reshape(1, RB)
                xe_rows = xe_out[pl.ds(row0, rbl), :].reshape(1, RB)
                p_val = jnp.where(upd == 1, p_samp, x_rows)
                e_val = jnp.where(upd_e == 1, e_samp, xe_rows)
                x_out[pl.ds(row0, rbl), :] = p_val.reshape(rbl, 128)
                xe_out[pl.ds(row0, rbl), :] = e_val.reshape(rbl, 128)

                # gradient = eval(free @ proposal) - eval(clamped @
                # evidence sample), x featureValue; categorical items
                # contribute only when a sampled value hits their slot
                # (reference ops/gibbs._color_step_learn slot_hit)
                dense = (rowmeta >> 8) == 0
                for t in terms:
                    vp_ = [jnp.where(t["sub"][a], p_val, t["gat"][0][a])
                           for a in range(c.A)]
                    ve_ = [jnp.where(t["sub"][a], e_val, t["gat"][1][a])
                           for a in range(c.A)]
                    ev_p = _eval_all(c.present, t["ftype"], t["arity"],
                                     vp_, t["eqs"], t["cards"], c.A)
                    ev_e = _eval_all(c.present, t["ftype"], t["arity"],
                                     ve_, t["eqs"], t["cards"], c.A)
                    d1 = t["dd"] & 0xFF
                    d2 = t["dd"] >> 8
                    hit = (d1 == e_val) | (d1 == p_val) | \
                          (d2 == e_val) | (d2 == p_val)
                    inc = (lrn == 1) & (t["ftype"] != -1) & (dense | hit)
                    grad = jnp.where(inc, (ev_p - ev_e) * t["fv"], 0.0)
                    roh = (w_iota == (t["wid"] >> 7)).astype(jnp.float32)
                    loh = lane_iota == (t["wid"] & 127)
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
            sweep_free()
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


# --------------------------------------------------------------------------

class PallasItemGridEngine:
    """Fused general-graph Gibbs engine (inference + learning).

    Usage: eng = PallasItemGridEngine(cg); vals, counts = eng.run(...)
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
        vp, kmax = plan.vp, plan.kmax

        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 +      # seed/b/e
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 +      # x, tally
            [pl.BlockSpec(memory_space=pltpu.ANY)] * n_c       # packed
        )
        out_specs = (pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch = [pltpu.VMEM((2,) + c.packed.shape[1:], jnp.int32)
                   for c in plan.colors]                  # double buffers
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

        @jax.jit
        def call(seed, burn, epochs, x0, tally, *packs):
            return pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct((vp // 128, 128), jnp.int32),
                    jax.ShapeDtypeStruct((kmax * vp // 128, 128),
                                         jnp.int16)),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    vmem_limit_bytes=127 * 1024 * 1024),
                input_output_aliases={3: 0},   # x0 buffer IS x_out
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(seed, burn, epochs, x0, tally, *packs)

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
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3 +      # x0,w0,wfix
            [pl.BlockSpec(memory_space=pltpu.ANY)] * n_c       # packed
        )
        out_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in range(3))
        scratch = [pltpu.VMEM((2,) + c.packed.shape[1:], jnp.int32)
                   for c in plan.colors]                  # double buffers
        scratch.append(pltpu.VMEM((wrows, 128), jnp.float32))   # gw
        scratch.append(pltpu.VMEM((wrows, 128), jnp.float32))   # nw
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

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
                    vmem_limit_bytes=127 * 1024 * 1024),
                input_output_aliases={5: 0},   # x0 buffer IS x_out
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(seed, burn, epochs, step0, decay, x0, w0, wfix, *packs)

        return jax.jit(call), wrows

    def _ensure_packs(self, wv: np.ndarray):
        wkey = wv.tobytes()
        if self._weights_for != wkey:
            fill_weights(self.plan, wv)
            self._packs = [jnp.asarray(c.packed) for c in self.plan.colors]
            self._weights_for = wkey

    def learn(self, seed: int, burn: int, epochs: int, stepsize: float,
              decay: float = 1.0, lp=None, weight_value=None):
        """In-kernel dual-chain SGD; returns learned weights (W,) f32.

        Matches ops/gibbs.GibbsEngine.learn semantics; the plan must be
        built with sample_evidence=True (constructor default) so the
        free chain updates every owned variable, like the reference's
        learning sweep."""
        from numbskull_tpu.ops.gibbs import LearnParams
        lp = lp or LearnParams()
        plan = self.plan
        wv = np.asarray(self.cg.weight_init if weight_value is None
                        else weight_value, np.float32)
        self._ensure_packs(wv)
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
        """Run burn + epochs sweeps; returns (values (V,), counts (V, K))
        in ORIGINAL variable order."""
        assert epochs <= 30000, \
            "int16 in-kernel tallies cap one run at 30000 epochs; " \
            "chain multiple runs (x0=previous values) for more"
        plan = self.plan
        wv = np.asarray(self.cg.weight_init if weight_value is None
                        else weight_value, np.float32)
        self._ensure_packs(wv)
        if self._call is None:
            self._call = self._build_call()

        init = plan.init_new.copy()
        if x0 is not None:
            init[plan.perm] = np.asarray(x0, np.int32)
        x2d = jnp.asarray(init.reshape(plan.vp // 128, 128))
        t2d = jnp.asarray(plan.tally_new.reshape(plan.vp // 128, 128)
                          .astype(np.int8))
        x_out, cnt = self._call(
            jnp.asarray([seed], jnp.int32), jnp.asarray([burn], jnp.int32),
            jnp.asarray([epochs], jnp.int32), x2d, t2d, *self._packs)
        x_flat = np.asarray(x_out).reshape(-1)[plan.perm]
        cnt = np.asarray(cnt).astype(np.int32).reshape(plan.kmax, plan.vp)
        counts = cnt[:, plan.perm].T.copy()            # (V, K)
        return x_flat, counts

    def marginals(self, counts: np.ndarray, epochs: int) -> np.ndarray:
        return counts.astype(np.float64) / float(max(epochs, 1))
