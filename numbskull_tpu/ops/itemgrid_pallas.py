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

Coverage: boolean AND categorical variables (cardinality <= K_MAX_SUP
= 32; variable capacity scales down with cardinality to keep count
slabs in budget),
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
from numbskull_tpu.ops.factor_semantics import ArgStats, finalize

SUPPORTED_FUNCS = tuple(T.FACTORS.values())

RB = 1024            # rows per block (multiple of 128; smaller blocks
#                      shrink gather windows and the MXU work that scales
#                      with them, at the cost of more DMA issues)
TRW = 128            # window tile rows (tile = TRW*128 = 16384 values —
#                      a full-depth MXU contraction per gather tile)
NT_MAX = 16          # max window tiles per color (windows up to 256K
#                      values; every graph with vp <= NT_MAX*16384 fits
#                      regardless of locality — expanders included)
D_MAX = 64           # max items per row (slot loop is data-driven, so
#                      code size does not grow with D)
A_MAX = 64           # max factor arity (arity > 8 evaluates via stats
#                      loops — code size O(1) in arity)
DA_MAX = 1024        # max D*A per row (bounds the staged-gather and
#                      packed-block scratch)
K_MAX_SUP = 128      # max variable cardinality. kmax <= 8 runs the
#                      historical unrolled candidate tuples; beyond
#                      that the vec-k path (candidates on sublanes,
#                      (kmax, RB) slabs, log-step inverse-CDF — code
#                      size O(1) in kmax) keeps Mosaic compile seconds
#                      at any cardinality. Bit-exact vs the parity
#                      replay at 64 and 128; the cap bounds the
#                      (kmax, RB) working slabs (128 -> 512 KB f32 per
#                      live slab) and the count-slab vcap scaling in
#                      _plan_ranked. The LEARN and HBM kernels still
#                      unroll and gate at 32.
V_MAX = 10 << 20     # max padded variables AT kmax=2 (VMEM: 4B values +
#                      1B tally + 2B/value counts = ~9B/var; chunked
#                      init/tally avoid register spills; 3072x3072
#                      lattices = 9.4M vars verified on hardware).
#                      Higher-card graphs scale this down by bytes/var
#                      (see _plan_ranked).
COLOR_MAX = 256      # the color sweep is a data-driven loop over an
#                      SMEM schedule — more colors cost sweep steps,
#                      not code size or scratch (cmeta is (C, 8) i32
#                      SMEM = 8 KB at 256). Overlapping high-degree
#                      cliques (random voting at degree 50+) need 70+
#                      colors; at 64 they fell to the XLA path.
#                      COLOR_MAX + 1 is also the (epoch, color) salt
#                      stride for the software-PRNG streams: >= the
#                      color count (no cross-epoch collisions) and ODD
#                      (the int32 salt wraps with period 65536 epochs
#                      instead of 256; hardware PRNG is stateful and
#                      unaffected)

# ---- affine fast-path envelope (see _affine_color_info) -------------
SB = 8               # blocks per superblock: affine gathers run as ONE
#                      (SB*8, 128) lane-roll per (slot, arg) — measured
#                      58 Gvals/s vs 2.4 for the f32 one-hot matmul.
#                      (SB=32 measured SLOWER on the 1024^2 Ising:
#                      1.64 vs 1.33 ms/epoch — iteration count is not
#                      the bottleneck)
AFF_D_MAX = 8        # slots per row on the affine path (packed_a
#                      scratch is (SB, (6*D+3)*8, 128) doubled)
AFF_DA_MAX = 64      # slot*arg limit (amet schedule row width)
AFF_NONE = np.int32(2 ** 31 - 1)   # amet sentinel: no fetched arg
AFF_GUARD = (SB * 8 + 2) * 128  # value-array tail guard so clamped
#                      superblock rolls stay in bounds ((SB*8+1)-row
#                      reads)
# factor functions whose value is derivable from boolean counting
# stats (n_zero over all/body args) + head/v0/v1/v2 — everything
# except FUNC_UFO's positional select (factor_semantics.finalize)
AFF_FUNCS = frozenset(T.FACTORS.values()) - {T.FUNC_UFO}


# Debug-only ablation knobs (experiments/profile_itemgrid.py): a set of
# stage names removed from the traced kernel so stage costs can be
# measured by difference on hardware. Consulted at TRACE time — set it,
# then build a FRESH engine. Production paths never set this.
#   "prng"   constant 0.5 uniforms instead of PRNG draws
#   "gather" skip value gathers (eval reads stale scratch)
#   "eval"   replace potential evaluation with a cheap scratch read
#   "dma"    skip item-table DMA waits (compute reads stale scratch)
#   "tally"  skip the per-epoch count accumulation
ABLATE: frozenset = frozenset()


def _ceil(a, m):
    return -(-a // m) * m


def _split_mask32(sb):
    """int64 arg bitmask -> (lo, hi) int64 words holding bits 0..31 /
    32..63 as two's-complement int32-range values (A_MAX = 64 exceeds
    one int32 word; bit 31 must land in the sign bit, not overflow)."""
    wrap = np.int64(1) << 32
    half = np.int64(1) << 31
    lo = sb & (wrap - 1)
    hi = (sb >> 32) & (wrap - 1)
    return lo - (lo >= half) * wrap, hi - (hi >= half) * wrap


def _sbit_mask(a: int) -> np.int32:
    """Static int32 single-bit mask for arg position ``a % 32`` (bit 31
    is the sign bit)."""
    a = a % 32
    return np.int32(-(1 << 31)) if a == 31 else np.int32(1 << a)


def _read_sub2(lo, hi):
    """Traced-index substitution-bit reader over the two sbits words.
    Shift amounts are clamped into [0, 31] before use; the out-of-range
    lane is discarded by the select."""
    def read(a):
        s1 = (lo >> jnp.minimum(a, 31)) & 1
        s2 = (hi >> jnp.clip(a - 32, 0, 31)) & 1
        return jnp.where(a < 32, s1, s2) != 0
    return read


def _ceil_np(a, m):
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
        self.sbits = 3 * DA + 2 * D   # D rows: subst bitmask args 0..31
        self.sbits2 = 3 * DA + 3 * D  # D rows: subst bitmask args 32..63
        #                               (A_MAX = 64 > one int32 word; a
        #                               single word silently dropped the
        #                               own-var mask at positions >= 31)
        self.wid = 3 * DA + 4 * D     # D rows: weight ids
        self.fv = 3 * DA + 5 * D      # D rows: featureValue bits
        self.dd = 3 * DA + 6 * D      # D rows: slot d1 | d2<<8
        self.upd = 3 * DA + 7 * D     # free-chain update mask
        self.upd_e = self.upd + 1     # clamped-chain update mask
        self.lrn = self.upd + 2       # evidence rows (gradient mask)
        self.rowmeta = self.upd + 3   # row card | dataType<<8
        self.wrow = self.upd + 4      # window bases/128 in lanes [0:DA)
        #                               (kept in the block: SMEM inputs
        #                               pad each element to a word and
        #                               blow the 1MB SMEM budget at scale)
        self.rows = _ceil(self.upd + 5, 8)


@dataclasses.dataclass
class ItemGridPlan:
    """Kernel-ready plan: ONE packed item array covering every color,
    plus a per-color SMEM schedule. The kernel is a data-driven loop
    over the schedule — one code body regardless of color count, row
    degree, or window span."""

    packed: np.ndarray      # (total_rb, layout.rows, RB) int32
    wbase: np.ndarray       # (total_rb, 8, W) int32 block metadata:
    #                         flat entry j=(d*A+a) at [j//W, j%W] is the
    #                         slot's window start row; entries DA/DA+1
    #                         are the HBM value-slab base row and count.
    #                         3-D because HBM slices must be (8, 128k)-
    #                         tile aligned
    cmeta: np.ndarray       # (C, 8) int32 per-color schedule:
    #                         [rb_off, num_rb, row0r, n_tiles, D_c, 0..]
    D: int                  # layout slots per row (max over colors)
    A: int                  # layout args per slot (max over colors)
    perm: np.ndarray        # (V,) original vid -> renumbered slot
    vp: int                 # padded renumbered size (multiple of 128)
    n_vars: int
    kmax: int               # max cardinality (static K loop bound)
    present: tuple          # factor codes present (union over colors)
    init_new: np.ndarray    # (vp,) int32 initial values (renumbered)
    tally_new: np.ndarray   # (vp,) int32 tally mask (renumbered)
    g_wid: np.ndarray = None   # (total_rb, D, RB) weight ids (for baking)
    n_weights: int = 0
    trw: int = TRW          # gather tile rows (vp//128 for small graphs)
    # ---- affine fast path (None/empty when no color qualifies) ----
    packed_a: np.ndarray = None   # (total_rb_a, (5*Da+3)*8, 128) int32
    #                               compact per-block slabs for affine
    #                               colors; logical row l = sublanes
    #                               [8l, 8l+8): per slot d: fta, wbake,
    #                               sbits, wid, fv; then upd, upd_e, lrn
    amet: np.ndarray = None       # (C, AFF_DA_MAX) int32 per-color
    #                               affine offsets: flat j = d*A + a ->
    #                               pos(arg) - local_row; AFF_NONE when
    #                               the arg is never fetched
    g_wid_a: np.ndarray = None    # (total_rb_a, Da, RB) wids (baking)
    aff_D: int = 0                # slot width of the affine layout
    sb: int = SB                  # blocks per affine superblock for
    #                               THIS graph: colors pad to sb-block
    #                               units, so many-color graphs with
    #                               few blocks per color (e.g. the
    #                               voting degree family: ~4 blocks
    #                               per color at degree 50) pick a
    #                               smaller unit instead of computing
    #                               up to 50% NOOP pad lanes


def _rcm_rank(n_vars: int, edges_u: np.ndarray,
              edges_v: np.ndarray) -> np.ndarray:
    """Reverse Cuthill–McKee-style rank over an undirected adjacency: a
    bandwidth-reducing order so itemgrid windows stay bounded on graphs
    whose natural variable ids are shuffled (see compile.rcm_rank)."""
    from numbskull_tpu.compile import rcm_rank
    return rcm_rank(n_vars, edges_u, edges_v)


def plan_item_grid(cg: CompiledGraph, sample_evidence: bool = True,
                   n_shards: int = 1, vmax: int | None = None):
    """Compile a CompiledGraph into the kernel's layout.

    Returns (ItemGridPlan, None) or (None, reason) when the graph is
    outside the kernel envelope (caller falls back to the XLA engine).
    Tries the natural variable order first; if a window overflows, tries
    again with a reverse-Cuthill–McKee bandwidth-reducing order.

    ``n_shards``: pad every color to a multiple of n_shards row blocks
    so the multi-chip engine can split each color evenly (every device
    owns the same number of blocks per color).

    When the compile came through the disk plan cache (cg.cache_key
    set) the itemgrid plan is disk-cached too, keyed on the compile
    identity plus every planning knob — RCM ranking a 33M-variable
    graph costs minutes of host time on a small VM.
    """
    from numbskull_tpu import plancache

    cdir = plancache.default_dir()
    ckey = None
    if cg.cache_key and cdir:
        ckey = plancache.graph_key(cg.cache_key, "itemgrid-v2",
                                   sample_evidence, n_shards, vmax,
                                   RB, SB, TRW)
        hit = plancache.load(cdir, ckey)
        if hit is not None:
            return hit

    def _done(result):
        if ckey is not None:
            plancache.store(cdir, ckey, result)
        return result

    plan, reason = _plan_ranked(cg, sample_evidence, None,
                                n_shards=n_shards, vmax=vmax,
                                probe_reject=True)
    if plan is not None and int(plan.cmeta[:, 3].max()) <= 1:
        return _done((plan, None))   # natural order already single-tile
    if plan is None and "window span" not in (reason or ""):
        return _done((plan, reason))  # rejected: non-locality reason
    # windows span multiple gather tiles (or overflowed): try a reverse-
    # Cuthill-McKee bandwidth-reducing order and keep whichever plan
    # pays fewer tiles per sweep
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
    plan2, _ = _plan_ranked(cg, sample_evidence, rank,
                            n_shards=n_shards, vmax=vmax)
    if plan2 is None:
        return _done((plan, None) if plan is not None
                     else (None, reason))
    if plan is None:
        return _done((plan2, None))

    def cost(p):     # tiles swept per epoch, weighted by color size
        return int((p.cmeta[:, 1] * p.cmeta[:, 3] *
                    np.maximum(p.cmeta[:, 4], 1)).sum())

    return _done((plan2, None) if cost(plan2) < cost(plan)
                 else (plan, None))


_BIG64 = np.int64(1) << 60


def _slot_assignment(rows_l: np.ndarray, delta: np.ndarray,
                     has_fetch: np.ndarray, n_rows: int):
    """Item -> (order, slot, D_c) for one color.

    Default: items sorted per row by their min fetched position, slot =
    rank within the row (window-coherent slots). When the color's items
    cluster on FEW distinct (position - row) deltas, slots are keyed by
    DELTA VALUE instead: every item with delta u goes to the slot for u,
    rows missing a delta leave that slot as NOOP padding. Then a slot's
    fetched min-positions are exactly row + delta — the affine fast
    path's precondition — and rows with missing items (lattice
    boundaries) no longer shift their remaining items across slots.

    ``rows_l``: (I,) local row index; ``delta``: (I,) min fetched
    position minus local row (_BIG64 when the item fetches nothing).
    """
    order = np.lexsort((delta, rows_l))
    r_sorted = rows_l[order]
    counts = np.bincount(rows_l, minlength=n_rows) if len(rows_l) else \
        np.zeros(n_rows, np.int64)
    row_base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    rank_slot = np.arange(len(order)) - row_base[r_sorted]
    D_rank = max(int(counts.max()) if len(counts) else 1, 1)

    d_sorted = delta[order]
    fet = has_fetch[order]
    uniq = np.unique(d_sorted[fet])
    if len(uniq) == 0:
        return order, rank_slot, D_rank
    # no-fetch items keep rank order in slots after the delta classes
    nf_counts = np.bincount(r_sorted[~fet], minlength=n_rows) \
        if (~fet).any() else np.zeros(n_rows, np.int64)
    D_clu = len(uniq) + int(nf_counts.max())
    if D_clu > min(D_MAX, max(2 * D_rank, D_rank + 4), AFF_D_MAX):
        return order, rank_slot, D_rank
    slot = np.empty(len(order), np.int64)
    slot[fet] = np.searchsorted(uniq, d_sorted[fet])
    if (~fet).any():
        nf_base = np.concatenate(([0], np.cumsum(nf_counts)[:-1]))
        nf_pos = np.arange((~fet).sum()) - nf_base[r_sorted[~fet]]
        slot[~fet] = len(uniq) + nf_pos
    # two same-row items with equal delta would collide in one slot
    key = r_sorted * np.int64(D_clu + 1) + slot
    if len(np.unique(key)) != len(key):
        return order, rank_slot, D_rank
    return order, slot, D_clu


def _affine_color_info(g_ftype, g_arity, g_off, g_fetch, g_subst,
                       g_eq, g_acard, rowmeta_card, rowmeta_dtype,
                       n_rows, Ag):
    """Affine fast-path qualification for one color.

    Returns (ok, c_abs (D, A) int64 with AFF_NONE for never-fetched
    slots). Qualifies when every fetched (slot, arg) offset is exactly
    ``local_row + const`` and the color is purely boolean-dense (cards
    2, eq 0, dtype 0) over factor functions derivable from counting
    stats (AFF_FUNCS) — the kernel then swaps the one-hot gather
    matmuls for lane rolls and evaluates all candidates from one shared
    stats pass."""
    R, D, A = g_off.shape
    valid = g_ftype >= 0
    if not valid.any():
        return False, None
    if D > AFF_D_MAX or D * Ag > AFF_DA_MAX:
        return False, None
    pres = np.unique(g_ftype[valid])
    if any(int(t) not in AFF_FUNCS for t in pres):
        return False, None
    if (rowmeta_card[:n_rows] != 2).any() or \
            (rowmeta_dtype[:n_rows] != 0).any():
        return False, None
    amask = g_fetch | g_subst
    if (g_eq[amask] != 0).any() or (g_acard[amask] != 2).any():
        return False, None
    ri = np.arange(R)[:, None, None]
    delta = g_off - ri
    dmin = np.where(g_fetch, delta, _BIG64).min(axis=0)
    dmax = np.where(g_fetch, delta, -_BIG64).max(axis=0)
    nofetch = dmin == _BIG64
    if not (nofetch | (dmin == dmax)).all():
        return False, None
    c_abs = np.where(nofetch, np.int64(AFF_NONE), dmin)
    return True, c_abs


def _plan_ranked(cg: CompiledGraph, sample_evidence: bool, rank,
                 n_shards: int = 1, vmax: int | None = None,
                 probe_reject: bool = False):
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
        vp += _ceil(int(p.cv_valid.sum()), RB * n_shards)
    vp = _ceil(vp, 2048)   # int16 count slabs need 16-sublane alignment
    # caps are tuned at kmax=2 (~9 bytes/var: 4B values + 1B tally +
    # 2B/candidate counts); higher cardinality multiplies the count
    # slabs, so the variable capacity scales down by bytes-per-var
    vcap = V_MAX if vmax is None else vmax
    if kmax > 2:
        vcap = (vcap * 9) // (5 + 2 * kmax)
    if vp > vcap:
        return None, "graph too large (%d padded vars > %d)" % (vp, vcap)
    perm = np.full(cg.n_vars, -1, np.int64)
    row_orders = []
    for p, s in zip(cg.plans, starts):
        vids = p.cv_vid[p.cv_valid].astype(np.int64)
        ro = (np.argsort(rank[vids], kind="stable") if rank is not None
              else np.arange(len(vids)))
        row_orders.append(ro)
        perm[vids[ro]] = s + np.arange(len(vids))
    assert (perm >= 0).all()

    # ---- gather tile size: adapt to the graph's locality. The MXU
    # work per gather is one contraction over the tile, so a lattice
    # whose windows span ~2K values must not pay a 16K tile. A cheap
    # per-(color, block) span scan (upper bound of the per-slot spans)
    # picks the smallest tile that keeps windows single-tile, capped at
    # TRW; spans beyond TRW*128 pay extra tiles instead of rejection.
    worst_span = 256
    for p, start, ro in zip(cg.plans, starts, row_orders):
        n_rows = int(p.cv_valid.sum())
        iv = p.it_valid
        if not iv.any():
            continue
        inv_ro = np.empty(n_rows, np.int64)
        inv_ro[ro] = np.arange(n_rows)
        rows = inv_ro[p.it_row[iv].astype(np.int64)]
        blk = rows // RB
        fetch = p.it_args_valid[iv] & ~p.it_subst[iv]
        pos = perm[p.it_args_vid[iv].astype(np.int64)]
        nb = int(blk.max()) + 1
        A_ = fetch.shape[1]
        # span per (block, ARG position): each arg position's neighbors
        # are coherent (different positions land in different color
        # regions), so a block-level union would wildly overestimate and
        # force 16K gather tiles on graphs whose true windows are ~1K
        big = np.iinfo(np.int64).max
        key = (blk[:, None] * A_ +
               np.arange(A_)[None, :]).ravel()
        posf = pos.ravel()
        fm_ = fetch.ravel()
        blo = np.full(nb * A_, big)
        bhi = np.zeros(nb * A_, np.int64)
        np.minimum.at(blo, key[fm_], posf[fm_])
        np.maximum.at(bhi, key[fm_], posf[fm_])
        ok = blo != big
        if ok.any():
            worst_span = max(worst_span,
                             int((bhi[ok] - (blo[ok] // 128) * 128).max())
                             + 1)
    # early probe (first attempt only): when the per-(block, arg) spans
    # already exceed the maximum gather reach AND the whole-array
    # fallback window cannot apply, this ordering is (almost surely)
    # headed for a per-slot "window span" rejection AFTER paying the
    # full grid-building cost — bail out now so plan_item_grid goes
    # straight to the RCM ordering. Slight overreach is possible (the
    # probe unions arg spans across slots) but only costs trying RCM.
    if probe_reject and worst_span > NT_MAX * TRW * 128 and \
            vp > NT_MAX * TRW * 128:
        return None, ("window span %d > %d tiles (probe)" %
                      (worst_span, NT_MAX))
    need_rows = _ceil(-(-worst_span // 128), 8)
    if vp // 128 <= need_rows or vp <= 2048:
        trw = vp // 128             # one tile covers the whole array
    else:
        trw = min(TRW, need_rows)
        vp = _ceil(vp, trw * 128)
        if vp > vcap:
            return None, "graph too large (%d padded vars > %d)" % (vp,
                                                                    vcap)

    init_new = np.zeros(vp, np.int32)
    tally_new = np.zeros(vp, np.int32)
    upd_new = np.zeros(vp, np.int32)
    init_new[perm] = np.asarray(cg.var_init)
    tally_new[perm] = tally_ok
    upd_new[perm] = upd_ok

    # ---- global layout extents (one code body serves every color) ----
    Dg, Ag, present_all = 1, 1, set()
    color_items = []
    for p, start, ro in zip(cg.plans, starts, row_orders):
        n_rows = int(p.cv_valid.sum())
        it_valid = p.it_valid
        rows = p.it_row[it_valid].astype(np.int64)
        ftype = p.it_ftype[it_valid].astype(np.int64)
        arity = p.it_arity[it_valid].astype(np.int64)

        pres = set(int(t) for t in np.unique(ftype))
        if any(t not in SUPPORTED_FUNCS and t != T.FUNC_NOOP
               for t in pres):
            return None, "unsupported factor function in color"
        if len(arity) and int(arity.max()) > A_MAX:
            return None, "arity > %d" % A_MAX
        present_all |= pres

        # item -> slot map (delta clustering when cheap; see
        # _slot_assignment)
        inv_ro = np.empty(n_rows, np.int64)
        inv_ro[ro] = np.arange(n_rows)
        rows_l = inv_ro[rows]
        fetch = p.it_args_valid[it_valid] & ~p.it_subst[it_valid]
        pos = np.where(fetch, perm[p.it_args_vid[it_valid].astype(
            np.int64)], _BIG64)
        item_key = pos.min(axis=1) if len(rows) else \
            np.zeros(0, np.int64)
        has_fetch = item_key != _BIG64
        delta = np.where(has_fetch, item_key - rows_l, _BIG64)
        order, slot, D_c = _slot_assignment(rows_l, delta, has_fetch,
                                            n_rows)
        D_c = max(D_c, 1)
        if D_c > D_MAX:
            return None, "max row degree %d > %d" % (D_c, D_MAX)
        amax_c = max(int(arity.max()) if len(arity) else 1, 1)
        A_c = max(min(int(p.it_args_vid.shape[1]) if len(rows) else 1,
                      A_MAX), 1)
        Dg = max(Dg, D_c)
        Ag = max(Ag, A_c)
        color_items.append((p, start, ro, n_rows, D_c, order, slot,
                            amax_c))

    present_all.discard(T.FUNC_NOOP)
    present = tuple(sorted(present_all))
    if Dg * Ag > DA_MAX:
        return None, "row degree x arity %d > %d" % (Dg * Ag, DA_MAX)
    L = _Layout(Dg, Ag)
    DA = Dg * Ag

    total_rb = sum(_ceil(max(nr, 1), RB * n_shards) // RB
                   for (_, _, _, nr, _, _, _, _) in color_items)
    Wb = _ceil(-(-(DA + 2) // 8), 128)   # (8, Wb) tile-aligned blocks
    packed_all = np.zeros((max(total_rb, 1), L.rows, RB), np.int32)
    wbase_all = np.zeros((max(total_rb, 1), 8, Wb), np.int32)
    wbase_flat = wbase_all.reshape(max(total_rb, 1), -1)
    gwid_all = np.zeros((max(total_rb, 1), Dg, RB), np.int32)
    cmeta = np.zeros((max(len(color_items), 1), 8), np.int32)

    aff_colors = {}          # ci -> (c_abs (D, A), packed_a blocks,
    #                               g_wid blocks)
    rb_cursor = 0
    for ci, (p, start, ro, n_rows, D_c, order, slot_map,
             amax_c) in enumerate(color_items):
        R = _ceil(max(n_rows, 1), RB * n_shards)
        num_rb = R // RB
        inv_ro = np.empty(n_rows, np.int64)
        inv_ro[ro] = np.arange(n_rows)
        vids_ranked = p.cv_vid[p.cv_valid].astype(np.int64)[ro]

        it_valid = p.it_valid
        rows = p.it_row[it_valid].astype(np.int64)
        ftype = p.it_ftype[it_valid].astype(np.int64)
        arity = p.it_arity[it_valid].astype(np.int64)
        wid = p.it_wid[it_valid].astype(np.int64)
        D, A = D_c, Ag

        def pad_args(arr, fill):
            """(I, Ap) -> (I, Ag) column padding (color plans may store
            fewer arg columns than the global layout)."""
            arr = np.asarray(arr)
            if arr.shape[1] >= A:
                return arr[:, :A]
            out = np.full((arr.shape[0], A), fill, arr.dtype)
            out[:, :arr.shape[1]] = arr
            return out

        avid = pad_args(p.it_args_vid[it_valid].astype(np.int64), 0)
        avalid = pad_args(p.it_args_valid[it_valid], False)

        # dense (R, D[, A]) grids; subst slots and padding carry offset 0
        # and an explicit subst mask (replaced by the candidate / masked
        # by arity)
        # int32 grids: every value fits (offsets < vp <= 2^31); int64
        # doubles the memory traffic of the hottest planner phase on a
        # bandwidth-bound host
        g_ftype = np.full((R, D), -1, np.int32)              # NOOP pad
        g_arity = np.ones((R, D), np.int32)
        g_wid = np.zeros((R, D), np.int32)
        g_fv = np.zeros((R, D), np.float32)
        g_dd = np.zeros((R, D), np.int32)
        g_off = np.zeros((R, D, A), np.int32)
        g_eq = np.zeros((R, D, A), np.int32)
        g_acard = np.ones((R, D, A), np.int32)
        g_subst = np.zeros((R, D, A), bool)
        g_fetch = np.zeros((R, D, A), bool)
        if len(rows):
            # items land in the slots assigned in the first pass (delta
            # clustering when cheap, else per-row rank by smallest
            # fetched position) — either way slot d is COHERENT across
            # a block's rows and each (block, slot, arg) window covers
            # one contiguous region
            rows = rows[order]
            ftype = ftype[order]
            arity = arity[order]
            wid = wid[order]
            avid = avid[order]
            avalid = avalid[order]
            it_idx = np.flatnonzero(it_valid)[order]
            nr = inv_ro[rows]
            slot = slot_map
            subst_all = pad_args(p.it_subst[it_valid], False)[order]
            g_ftype[nr, slot] = ftype
            g_arity[nr, slot] = arity
            g_wid[nr, slot] = wid
            g_fv[nr, slot] = p.it_fv[it_idx].astype(np.float32)
            g_dd[nr, slot] = (p.it_d1[it_idx].astype(np.int64) |
                              (p.it_d2[it_idx].astype(np.int64) << 8))
            subst = subst_all
            fetch = avalid & ~subst
            g_off[nr, slot, :] = np.where(fetch, perm[avid], 0)
            g_eq[nr, slot, :] = pad_args(p.it_args_eq[it_idx], 0)
            g_acard[nr, slot, :] = pad_args(p.it_args_card[it_idx], 1)
            g_subst[nr, slot, :] = subst
            g_fetch[nr, slot, :] = fetch

        # affine fast-path qualification (uses ABSOLUTE offsets; must
        # run before g_off becomes window-relative)
        rowcard_c = np.ones(R, np.int64)
        rowdt_c = np.zeros(R, np.int64)
        rowcard_c[:n_rows] = cards[vids_ranked]
        rowdt_c[:n_rows] = dtypes[vids_ranked]
        aff_ok, aff_c = _affine_color_info(
            g_ftype, g_arity, g_off, g_fetch, g_subst, g_eq, g_acard,
            rowcard_c, rowdt_c, n_rows, A)

        # per-(block, item-slot, arg-slot) windows over genuinely fetched
        # ids: a block's neighbors may scatter across several color
        # regions, but each (d, a) slot's neighbors are coherent (items
        # are grouped per row in a stable factor order), so every slot
        # gets its own window base. Window size is a whole number of
        # gather tiles; a color whose spans exceed NT_MAX tiles falls
        # back to base-0 full windows when the whole array fits.
        blk = np.arange(R) // RB
        big = np.iinfo(np.int64).max
        lo = np.full((num_rb, D, A), big)
        hi = np.zeros((num_rb, D, A), np.int64)
        # g_off is int32; promote BEFORE np.where or the int64-max
        # sentinel silently wraps to -1 and poisons every block's lo
        np.minimum.at(lo, blk,
                      np.where(g_fetch, g_off.astype(np.int64), big))
        np.maximum.at(hi, blk, np.where(g_fetch, g_off, 0))
        has = lo != big          # slots with any fetched arg
        lo = np.where(has, lo, 0)
        base = (lo // 128) * 128
        span = np.maximum(hi + 1 - base, 1)
        tile_v = trw * 128
        nt = -(-max(int(span.max()), 1) // tile_v)
        if nt > NT_MAX:
            if vp <= NT_MAX * tile_v:
                base[:] = 0
                nt = -(-vp // tile_v)
            else:
                return None, ("window span %d > %d tiles "
                              "(graph lacks locality)" %
                              (int(span.max()), NT_MAX))
        win = nt * tile_v
        base = np.minimum(np.maximum(base, 0), vp - win).astype(np.int32)
        if ((hi - base) >= win).any():
            return None, "window overflow after clamping"
        g_off = np.where(g_fetch, g_off - base[blk], 0)
        assert (g_off >= 0).all() and (g_off < win).all()

        sl = slice(rb_cursor, rb_cursor + num_rb)
        packed = packed_all[sl]

        def put_da(row0, grid, packed=packed, num_rb=num_rb, D=D, A=A):
            g = grid.reshape(num_rb, RB, D, A).transpose(0, 2, 3, 1)
            # D*A rows of THIS color land in the global D*A stride:
            # slot d occupies rows [row0 + d*Ag, row0 + d*Ag + A)
            g = g.reshape(num_rb, D, A, RB)
            for d in range(D):
                packed[:, row0 + d * Ag:row0 + d * Ag + A] = g[:, d]

        def put_d(row0, grid, packed=packed, num_rb=num_rb, D=D):
            packed[:, row0:row0 + D] = \
                grid.reshape(num_rb, RB, D).transpose(0, 2, 1)

        def put_1(row0, vec, packed=packed, num_rb=num_rb):
            packed[:, row0] = vec.reshape(num_rb, RB)

        put_da(L.off, g_off)
        put_da(L.eq, g_eq)
        put_da(L.acard, g_acard)
        put_d(L.fta, (g_ftype + 1) | (g_arity << 8))
        sb = (g_subst.astype(np.int64) <<
              np.arange(A, dtype=np.int64)[None, None, :]).sum(-1)
        sb_lo, sb_hi = _split_mask32(sb)
        put_d(L.sbits, sb_lo)
        put_d(L.sbits2, sb_hi)
        put_d(L.wid, g_wid)
        put_d(L.fv, g_fv.view(np.int32))
        put_d(L.dd, g_dd)
        isev_c = np.zeros(R, np.int64)
        valid_c = np.zeros(R, bool)
        meta_c = np.ones(R, np.int64)         # pad rows: card 1, dtype 0
        isev_c[:n_rows] = isev[vids_ranked]
        valid_c[:n_rows] = True
        meta_c[:n_rows] = rowcard_c[:n_rows] | (rowdt_c[:n_rows] << 8)
        put_1(L.upd, upd_new[start:start + R].astype(np.int64))
        put_1(L.upd_e, (valid_c & (isev_c == 0)).astype(np.int64))
        put_1(L.lrn, (valid_c & (isev_c == 1)).astype(np.int64))
        put_1(L.rowmeta, meta_c)

        br = (base // 128).reshape(num_rb, D, A).astype(np.int32)
        for d in range(D):
            wbase_flat[sl, d * Ag:d * Ag + A] = br[:, d]
        # per-block value slab (HBM-resident mode): the smallest row
        # range covering every FETCHED slot's full window (unfetched
        # slots carry base 0 for the VMEM kernel and must not drag the
        # slab to the array start)
        win_r = win // 128
        br2 = br.reshape(num_rb, -1)
        has2 = has.reshape(num_rb, -1)
        big32 = np.int32(2 ** 30)
        slab_lo = np.where(has2, br2, big32).min(axis=1)
        slab_lo = np.where(slab_lo == big32, 0, slab_lo)
        slab_lo = (slab_lo // 8) * 8
        slab_hi = np.where(has2, br2, 0).max(axis=1) + win_r
        empty_b = ~has2.any(axis=1)
        if empty_b.any():
            # all-pad blocks (color padding to n_shards multiples):
            # inherit the preceding real block's slab base with a
            # minimal span, so the HBM kernel's per-GROUP slabs are
            # not dragged to row 0 (their compute is masked anyway)
            src = np.maximum(np.maximum.accumulate(
                np.where(~empty_b, np.arange(num_rb), -1)), 0)
            slab_lo = np.where(empty_b, slab_lo[src], slab_lo)
            slab_hi = np.where(empty_b, slab_lo + 8, slab_hi)
        wbase_flat[sl, DA] = slab_lo
        # +16 rows of slack for the affine path's (9-row) roll reads
        # past a tight window end (harmless for the one-hot path)
        wbase_flat[sl, DA + 1] = _ceil_np(np.maximum(
            slab_hi - slab_lo, 8) + (16 if aff_ok else 0), 8)
        gwid_all[sl, :D] = \
            g_wid.reshape(num_rb, RB, D).transpose(0, 2, 1)

        cmeta[ci] = (rb_cursor, num_rb, start // 128, nt, D_c, 0, 0,
                     amax_c)
        if aff_ok:
            aff_colors[ci] = dict(
                c_abs=aff_c, num_rb=num_rb, D_c=D_c,
                ftype=g_ftype, arity=g_arity, subst=g_subst,
                wid=g_wid, fv=g_fv,
                upd=upd_new[start:start + R].astype(np.int64),
                upd_e=(valid_c & (isev_c == 0)).astype(np.int64),
                lrn=(valid_c & (isev_c == 1)).astype(np.int64))
        rb_cursor += num_rb

    # ---- affine fast-path assembly: compact (8, 128)-slab blocks ----
    packed_a = amet_all = gwid_a = None
    aff_D = 0
    if aff_colors:
        aff_D = max(d["D_c"] for d in aff_colors.values())
        M = 6 * aff_D + 3
        total_rb_a = sum(d["num_rb"] for d in aff_colors.values())
        packed_a = np.zeros((total_rb_a, M * 8, 128), np.int32)
        gwid_a = np.zeros((total_rb_a, aff_D, RB), np.int32)
        amet_all = np.full((max(len(color_items), 1), AFF_DA_MAX),
                           AFF_NONE, np.int32)
        cur = 0
        for ci in sorted(aff_colors):
            d = aff_colors[ci]
            num_rb, D_c = d["num_rb"], d["D_c"]
            blk = packed_a[cur:cur + num_rb]

            def aput(lrow, grid, blk=blk, num_rb=num_rb):
                blk[:, 8 * lrow:8 * lrow + 8, :] = \
                    np.asarray(grid, np.int32).reshape(num_rb, 8, 128)

            for dd in range(D_c):
                aput(6 * dd, (d["ftype"][:, dd] + 1) |
                     (d["arity"][:, dd] << 8))
                # 6*dd+1 (wbake) stays zero until fill_weights
                sbits_d = (d["subst"][:, dd, :].astype(np.int64) <<
                           np.arange(Ag, dtype=np.int64)).sum(-1)
                sb_lo_d, sb_hi_d = _split_mask32(sbits_d)
                aput(6 * dd + 2, sb_lo_d)
                aput(6 * dd + 3, sb_hi_d)
                aput(6 * dd + 4, d["wid"][:, dd])
                aput(6 * dd + 5, np.ascontiguousarray(
                    d["fv"][:, dd].astype(np.float32)).view(np.int32))
                gwid_a[cur:cur + num_rb, dd] = \
                    d["wid"][:, dd].reshape(num_rb, RB)
                amet_all[ci, dd * Ag:dd * Ag + Ag] = \
                    np.clip(d["c_abs"][dd], -(2 ** 31) + 1, AFF_NONE)
            aput(6 * aff_D, d["upd"])
            aput(6 * aff_D + 1, d["upd_e"])
            aput(6 * aff_D + 2, d["lrn"])
            cmeta[ci, 5] = 1
            cmeta[ci, 6] = cur
            cur += num_rb
        # tail guard so clamped superblock rolls stay in bounds
        vp_g = _ceil(vp + AFF_GUARD, 2048)
        init_new = np.concatenate([init_new,
                                   np.zeros(vp_g - vp, np.int32)])
        tally_new = np.concatenate([tally_new,
                                    np.zeros(vp_g - vp, np.int32)])
        vp = vp_g

    # superblock size for THIS graph: the largest unit (fewest loop
    # iterations) among those minimizing total pad blocks across the
    # affine colors — a color sweeps ceil(nb/sb)*sb blocks of VPU work,
    # so at 4 blocks/color (voting degree 50) sb=4 halves the epoch
    sb = SB
    if packed_a is not None and cmeta.size:
        nb = cmeta[cmeta[:, 5] == 1, 1] // max(n_shards, 1)
        if nb.size:
            # cost of a sweep in block-equivalents: computed blocks
            # (incl. NOOP pad) + ~2 blocks of fixed per-unit overhead
            # (loop step, DMA round-trip, gather setup)
            cost = {s: int((-(-nb // s) * (s + 2)).sum()) for s in
                    (8, 4, 2, 1)}
            best = min(cost.values())
            sb = max(s for s, c in cost.items() if c == best)
    plan = ItemGridPlan(packed=packed_all, wbase=wbase_all, cmeta=cmeta,
                        D=Dg, A=Ag, perm=perm, vp=vp,
                        n_vars=cg.n_vars, kmax=kmax, present=present,
                        init_new=init_new, tally_new=tally_new,
                        g_wid=gwid_all, n_weights=cg.n_weights, trw=trw,
                        packed_a=packed_a, amet=amet_all,
                        g_wid_a=gwid_a, aff_D=aff_D, sb=sb)
    return plan, None


def fill_weights(plan: ItemGridPlan, weight_value: np.ndarray):
    """Bake w[wid] into the packed blocks (inference path only;
    potentials use w * eval, reference inference.py:66-70)."""
    wv = np.asarray(weight_value, np.float32)
    L = _Layout(plan.D, plan.A)
    wslab = wv[plan.g_wid]                      # (total_rb, D, RB) f32
    plan.packed[:, L.wbake:L.wbake + plan.D] = wslab.view(np.int32)
    if plan.packed_a is not None:
        ws = wv[plan.g_wid_a]                   # (rb_a, aff_D, RB) f32
        for dd in range(plan.aff_D):
            lrow = 6 * dd + 1
            plan.packed_a[:, 8 * lrow:8 * lrow + 8, :] = \
                ws[:, dd].view(np.int32).reshape(-1, 8, 128)


# --------------------------------------------------------------------------
# factor evaluation (full reference set; golden.eval_factor parity)

_STAT_USERS = {
    # finalize's static stat -> consumer-type map: a stat is computed
    # only when one of its consumers is PRESENT in the graph, so e.g. a
    # pure-EQUAL Potts color generates ONE reduction instead of eight
    # (measured 3.1e8 -> see bench categorical_card64_ups)
    "n_zero": {T.FUNC_IMPLY_NATURAL, T.FUNC_AND, T.FUNC_ISTRUE},
    "n_one": {T.FUNC_OR},
    "n_diff0": {T.FUNC_EQUAL},
    "n_head_eq": {T.FUNC_LINEAR, T.FUNC_RATIO, T.FUNC_LOGICAL},
    "n_body_zero": {T.FUNC_IMPLY_MLN},
    "n_neq_eq": {T.FUNC_AND_CAT, T.FUNC_EQUAL_CAT_CONST},
    "n_eq_eq": {T.FUNC_OR_CAT},
    "n_body_neq_eq": {T.FUNC_IMPLY_NATURAL_CAT, T.FUNC_IMPLY_MLN_CAT},
    # head is read both by the imply family's finalize branches AND by
    # the n_head_eq reduction itself (vals[a] == head), so the
    # n_head_eq consumers are head consumers too
    "head": {T.FUNC_IMPLY_NATURAL, T.FUNC_IMPLY_MLN,
             T.FUNC_IMPLY_NATURAL_CAT, T.FUNC_IMPLY_MLN_CAT,
             T.FUNC_LINEAR, T.FUNC_RATIO, T.FUNC_LOGICAL},
    "ufo": {T.FUNC_UFO},
}
_DPGEN = {T.FUNC_DP_GEN_CLASS_PRIOR, T.FUNC_DP_GEN_LF_PRIOR,
          T.FUNC_DP_GEN_LF_PROPENSITY, T.FUNC_DP_GEN_LF_ACCURACY,
          T.FUNC_DP_GEN_LF_CLASS_PROPENSITY, T.FUNC_DP_GEN_DEP_FIXING,
          T.FUNC_DP_GEN_DEP_REINFORCING, T.FUNC_DP_GEN_DEP_EXCLUSIVE,
          T.FUNC_DP_GEN_DEP_SIMILAR}


def _eval_all(present, ftype, arity, vals, eqs, cards, A):
    """Factor evaluation on (1, RB)-shaped slabs via the shared
    semantics table (ops/factor_semantics.finalize; parity with
    golden.eval_factor, reference numbskull/inference.py:149-413).
    vals/eqs/cards are lists of A (1, RB) int32 slabs (hypothetical
    already substituted); the vec-k path passes (kmax, RB) substituted
    slabs, which broadcast through every stat. Stats are pruned
    STATICALLY by the present type set (_STAT_USERS) — finalize
    generates no code for absent types, so unused stats are passed as
    scalar zeros."""
    pres = set(present)

    def need(stat):
        return bool(pres & _STAT_USERS[stat])

    avalid = [(jnp.int32(a) < arity) for a in range(A)]
    head_pos = arity - 1

    def red(fn, init, body_only=False):
        acc = init
        for a in range(A):
            m = avalid[a] if not body_only else (jnp.int32(a) < head_pos)
            acc = fn(acc, m, a)
        return acc

    head = 0
    head_eq = 0
    ufo_sel = jnp.float32(0)
    for a in range(A):
        at_head = jnp.int32(a) == head_pos
        if need("head"):
            head = jnp.where(at_head, vals[a], head)
            head_eq = jnp.where(at_head, eqs[a], head_eq)
        # validity mask matches _loop_stats: a malformed UFO head value
        # beyond the arity must not read a padding slot (ADVICE r2)
        if need("ufo"):
            ufo_sel = jnp.where(
                (vals[0] - 1 == jnp.int32(a)) & avalid[a],
                vals[a].astype(jnp.float32), ufo_sel)
    v0 = vals[0]

    def sred(stat, fn, body_only=False):
        if not need(stat):
            return 0
        return red(fn, 0, body_only=body_only)

    st = ArgStats(
        n_zero=sred("n_zero", lambda s, m, a: s +
                    jnp.where(m & (vals[a] == 0), 1, 0)),
        n_one=sred("n_one", lambda s, m, a: s +
                   jnp.where(m & (vals[a] == 1), 1, 0)),
        n_diff0=sred("n_diff0", lambda s, m, a: s +
                     jnp.where(m & (vals[a] != v0), 1, 0)),
        n_head_eq=sred("n_head_eq", lambda s, m, a: s +
                       jnp.where(m & (vals[a] == head), 1, 0),
                       body_only=True),
        n_body_zero=sred("n_body_zero", lambda s, m, a: s +
                         jnp.where(m & (vals[a] == 0), 1, 0),
                         body_only=True),
        n_neq_eq=sred("n_neq_eq", lambda s, m, a: s +
                      jnp.where(m & (vals[a] != eqs[a]), 1, 0)),
        n_eq_eq=sred("n_eq_eq", lambda s, m, a: s +
                     jnp.where(m & (vals[a] == eqs[a]), 1, 0)),
        n_body_neq_eq=sred("n_body_neq_eq", lambda s, m, a: s +
                           jnp.where(m & (vals[a] != eqs[a]), 1, 0),
                           body_only=True),
        head=head, head_eq=head_eq,
        v0=v0 if (pres & _DPGEN) or need("ufo") else 0,
        v1=(vals[1] if A > 1 else v0 * 0) if pres & _DPGEN else 0,
        v2=(vals[2] if A > 2 else v0 * 0) if pres & _DPGEN else 0,
        card0=cards[0] if pres & _DPGEN else 0,
        card1=(cards[1] if A > 1 else cards[0]) if pres & _DPGEN else 0,
        ufo_sel=ufo_sel)
    return finalize(present, ftype, st)


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


def _gather_tiled(xref, base_r, off, nt, trw, sub_iota, lane_iota):
    """Tiled two-step one-hot gather from the value array.

    Reads xref at absolute positions base_r*128 + off, where off is the
    (1, RB) window-relative offset. The window is ``nt`` (dynamic) tiles
    of ``trw`` rows; each tile is one full-depth MXU contraction, and
    the per-tile (128, RB) row-select collapses to (1, RB) by lane
    select before accumulation, so the loop carry stays small. Windowed
    colors run nt=1; expander colors pay extra tiles instead of falling
    off the fast path."""
    row = off >> 7
    loh = lane_iota == (off & 127)
    # defensive clamp: a planner bug must yield a wrong gather, never an
    # out-of-bounds slice (OOB VMEM access wedges the device)
    hi = xref.shape[0] - trw

    def tile(t, acc):
        start = jnp.clip(base_r + t * trw, 0, hi)
        win = xref[pl.ds(start, trw), :].astype(jnp.float32)
        roh = (sub_iota == (row + (base_r - start))).astype(jnp.float32)
        rs = jax.lax.dot_general(
            win, roh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (128, RB)
        sel = jnp.sum(jnp.where(loh, rs, 0.0), axis=0, keepdims=True)
        return sel if acc is None else acc + sel

    if nt is None:                  # static single-tile specialization
        return tile(0, None)
    return jax.lax.fori_loop(
        0, nt, lambda t, acc: tile(t, acc),
        jnp.zeros((1, RB), jnp.float32))


def _uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * \
        jnp.float32(1.0 / (1 << 24))


def _uniform_sw(seed, salt, shape):
    """Software counter-hash uniforms (splitmix-style avalanche).

    The Pallas TPU interpreter's prng_random_bits returns zeros, which
    collapses every draw to value 0; interpret-mode runs (CPU tests,
    incl. the multi-chip exchange tests) use this stateless hash of
    (seed, per-draw salt, position) instead. Hardware runs keep the
    TPU PRNG."""
    i0 = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    i1 = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (i0 * jnp.uint32(0x9E3779B9) ^ i1 * jnp.uint32(0x85EBCA6B) ^
         (seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)) ^
         (salt.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)))
    x = (x ^ (x >> 15)) * jnp.uint32(0x2C1B3C6D)
    x = (x ^ (x >> 12)) * jnp.uint32(0x297A2D39)
    x = x ^ (x >> 15)
    return (x >> 8).astype(jnp.int32).astype(jnp.float32) * \
        jnp.float32(1.0 / (1 << 24))


def _make_uniform(sw_prng: bool, seed):
    """uniform(salt, shape) drawing from the hardware PRNG (salt
    ignored — the stream is stateful) or the software hash."""
    if sw_prng:
        return lambda salt, shape: _uniform_sw(seed, salt, shape)
    return lambda salt, shape: _uniform(shape)


def _draw(pots, card, kmax, u01):
    """Masked inverse-CDF draw over k < card from unnormalized
    log-potentials (reference inference.py:36-52; ops/sample.py parity).
    pots: list of kmax (1, RB); card: (1, RB); u01: (1, RB) uniforms.
    Returns (1, RB) int32."""
    m = pots[0]
    for k in range(1, kmax):
        m = jnp.where((jnp.int32(k) < card) & (pots[k] > m), pots[k], m)
    zs = [jnp.where(jnp.int32(k) < card, jnp.exp(pots[k] - m), 0.0)
          for k in range(kmax)]
    total = zs[0]
    for k in range(1, kmax):
        total = total + zs[k]
    u = u01 * total
    csum = jnp.zeros_like(total)
    val = jnp.zeros_like(card)
    for k in range(kmax):
        csum = csum + zs[k]
        val = val + (csum < u).astype(jnp.int32)
    return jnp.minimum(val, card - 1)


def _draw_vec(pots, card, kmax, u01):
    """Masked inverse-CDF draw from a (kmax, RB) potential slab —
    candidates live on the SUBLANE axis, so the max / normalize /
    cumulative-pick pipeline is O(1) ops in kmax instead of _draw's
    unrolled per-candidate chains (which explode Mosaic compile time
    beyond ~kmax 32; the 64-way unroll measured minutes of compile and
    could stall the device). Used by the kernel's vec-k path (kmax >
    VEC_K_MIN) and mirrored EXACTLY by ops/parity.kernel_parity_run, so
    bit-parity holds with the same lowering. card/u01: (1, RB)."""
    K = pots.shape[0]
    kio = jax.lax.broadcasted_iota(jnp.int32, pots.shape, 0)
    valid = kio < card
    m = jnp.max(jnp.where(valid, pots, jnp.float32(-jnp.inf)), axis=0,
                keepdims=True)
    zs = jnp.where(valid, jnp.exp(pots - m), 0.0)
    # inclusive prefix sum along sublanes via log-step shifted adds
    # (Hillis-Steele): Mosaic has no cumsum lowering, and this fixed
    # add order is reproduced identically by the parity replay (the
    # shifts are static concats, valid both in-kernel and as plain XLA)
    csum = zs
    s = 1
    while s < K:
        csum = csum + jnp.concatenate(
            [jnp.zeros((s,) + csum.shape[1:], csum.dtype), csum[:-s]],
            axis=0)
        s *= 2
    total = csum[K - 1:K]
    u = u01 * total
    val = jnp.sum((csum < u).astype(jnp.int32), axis=0, keepdims=True)
    return jnp.minimum(val, card - 1)


VEC_K_MIN = 9       # kmax >= this uses the candidate-vectorized path:
#                     (kmax, RB) slabs with candidates on sublanes, one
#                     broadcast eval per slot instead of kmax unrolled
#                     evals (code size O(1) in kmax). kmax <= 8 keeps
#                     the historical unrolled tuples (marginally faster
#                     at tiny kmax, and the layout the affine path and
#                     existing parity fixtures assume).


def _loop_stats(Ag, arity, read_val, read_eq, read_card, read_sub,
                subvals):
    """ArgStats for EVERY substituted candidate in ``subvals`` via two
    fori loops over the argument index — code size O(1) in arity, so
    factors of arity up to A_MAX evaluate without unrolling, and all
    candidates share the per-argument reads. ``read_*(a)`` return
    (1, RB) slabs for a TRACED index a; subvals entries are scalar k,
    (1, RB), or (kmax, RB) — a 2-D multi-row subval (the vec-k path's
    sublane candidate iota) broadcasts every value-derived stat to its
    shape, so ONE call evaluates all candidates. Returns a list of
    ArgStats, one per candidate."""
    zi = jnp.zeros_like(arity)
    K = len(subvals)

    def _zk(k, dtype=None):
        """Zero init matching candidate k's broadcast shape (loop
        carries must be shape-stable, so value-derived stats start at
        the subval's shape, not (1, RB))."""
        sv = subvals[k]
        if hasattr(sv, "ndim") and sv.ndim == 2 and sv.shape != zi.shape:
            return jnp.zeros(sv.shape, dtype or zi.dtype)
        return zi.astype(dtype) if dtype else zi

    def body1(a, c):
        g = read_val(a)
        sub = read_sub(a)
        eqa = read_eq(a)
        carda = read_card(a)
        m = a < arity
        mb = a < arity - 1
        out = []
        for k in range(K):
            (n_zero, n_one, n_diff0, n_body_zero, n_neq_eq, n_eq_eq,
             n_body_neq_eq, head, head_eq, v0, v1, v2, c0, c1,
             ufo) = c[k]
            v = jnp.where(sub, subvals[k], g)
            v0 = jnp.where(a == 0, v, v0)
            v1 = jnp.where(a == 1, v, v1)
            v2 = jnp.where(a == 2, v, v2)
            c0 = jnp.where(a == 0, carda, c0)
            c1 = jnp.where(a == 1, carda, c1)
            head = jnp.where(a == arity - 1, v, head)
            head_eq = jnp.where(a == arity - 1, eqa, head_eq)
            ufo = jnp.where((v0 - 1 == a) & m, v.astype(jnp.float32),
                            ufo)
            n_zero = n_zero + jnp.where(m & (v == 0), 1, 0)
            n_one = n_one + jnp.where(m & (v == 1), 1, 0)
            n_diff0 = n_diff0 + jnp.where(m & (v != v0), 1, 0)
            n_body_zero = n_body_zero + jnp.where(mb & (v == 0), 1, 0)
            n_neq_eq = n_neq_eq + jnp.where(m & (v != eqa), 1, 0)
            n_eq_eq = n_eq_eq + jnp.where(m & (v == eqa), 1, 0)
            n_body_neq_eq = n_body_neq_eq + \
                jnp.where(mb & (v != eqa), 1, 0)
            out.append((n_zero, n_one, n_diff0, n_body_zero, n_neq_eq,
                        n_eq_eq, n_body_neq_eq, head, head_eq, v0, v1,
                        v2, c0, c1, ufo))
        return tuple(out)

    ones = jnp.ones_like(arity)
    init = tuple((_zk(k),) * 8 + (zi, _zk(k), _zk(k), _zk(k),
                                  ones, ones, _zk(k, jnp.float32))
                 for k in range(K))
    c = jax.lax.fori_loop(0, Ag, body1, init)
    heads = [c[k][7] for k in range(K)]

    def body2(a, nhe):              # head known only after pass 1
        g = read_val(a)
        sub = read_sub(a)
        mb = a < arity - 1
        return tuple(
            nhe[k] + jnp.where(
                mb & (jnp.where(sub, subvals[k], g) == heads[k]), 1, 0)
            for k in range(K))

    n_head_eq = jax.lax.fori_loop(0, Ag, body2, tuple(_zk(k) for k in
                                                      range(K)))
    res = []
    for k in range(K):
        (n_zero, n_one, n_diff0, n_body_zero, n_neq_eq, n_eq_eq,
         n_body_neq_eq, head, head_eq, v0, v1, v2, c0, c1, ufo) = c[k]
        res.append(ArgStats(
            n_zero=n_zero, n_one=n_one, n_diff0=n_diff0,
            n_head_eq=n_head_eq[k], n_body_zero=n_body_zero,
            n_neq_eq=n_neq_eq, n_eq_eq=n_eq_eq,
            n_body_neq_eq=n_body_neq_eq, head=head, head_eq=head_eq,
            v0=v0, v1=v1, v2=v2, card0=c0, card1=c1, ufo_sel=ufo))
    return res


def _wb_view(wb_scr, pre, W):
    """1-D view over an (..., 8, W) SMEM window-base block: entry j
    lives at [*pre, j // W, j % W] (``pre`` selects the buffer slot,
    plus the block within a stream group for the HBM kernel)."""
    if not isinstance(pre, tuple):
        pre = (pre,)

    class _V:
        def __getitem__(self, j):
            return wb_scr[pre + (j // W, j % W)]
    return _V()


def _slot_gather_stage(pk, wb, L, Ag, d, gat, av_scr, row_base):
    """Gather all Ag args of slot d into av_scr rows [row_base + a)."""
    def a_body(a, _):
        off = pk[pl.ds(L.off + d * Ag + a, 1), :]
        av_scr[pl.ds(row_base + a, 1), :] = \
            gat(wb[d * Ag + a], off).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, Ag, a_body, 0)


def _slot_eval_loop(pk, L, Ag, d, av_scr, row_base, present, ftype,
                    arity, subvals):
    """Evaluate slot d at every candidate in ``subvals`` from staged
    gathers via the shared stats loops + the shared semantics table.
    Returns a list of (1, RB) float32, one per candidate."""
    sb_lo = pk[pl.ds(L.sbits + d, 1), :]
    sb_hi = pk[pl.ds(L.sbits2 + d, 1), :]
    sts = _loop_stats(
        Ag, arity,
        read_val=lambda a: av_scr[pl.ds(row_base + a, 1), :],
        read_eq=lambda a: pk[pl.ds(L.eq + d * Ag + a, 1), :],
        read_card=lambda a: pk[pl.ds(L.acard + d * Ag + a, 1), :],
        read_sub=_read_sub2(sb_lo, sb_hi),
        subvals=subvals)
    return [finalize(present, ftype, st) for st in sts]


def _slot_decode(pk, wb, L, Ag, d, gather_chains, w_of=None):
    """Decode item-slot ``d`` (a TRACED index — the slot loop is data-
    driven, so code size does not grow with row degree) of the current
    block, gathering its argument values once per chain.

    ``gather_chains``: list of callables (base_r, off) -> (1, RB) f32.
    ``w_of(wid)`` yields per-item weights from the live weight vector
    (learning); when None, the baked per-run weights are read from the
    block (inference)."""
    fta = pk[pl.ds(L.fta + d, 1), :]
    term = dict(
        ftype=(fta & 0xFF) - 1,
        arity=fta >> 8,
        wid=pk[pl.ds(L.wid + d, 1), :],
        fv=pltpu.bitcast(pk[pl.ds(L.fv + d, 1), :], jnp.float32),
        dd=pk[pl.ds(L.dd + d, 1), :],
        eqs=[pk[pl.ds(L.eq + d * Ag + a, 1), :] for a in range(Ag)],
        cards=[pk[pl.ds(L.acard + d * Ag + a, 1), :] for a in range(Ag)],
    )
    sb_lo = pk[pl.ds(L.sbits + d, 1), :]
    sb_hi = pk[pl.ds(L.sbits2 + d, 1), :] if Ag > 32 else None
    term["sub"] = [((sb_lo if a < 32 else sb_hi) & _sbit_mask(a)) != 0
                   for a in range(Ag)]
    if w_of is not None:
        term["w"] = w_of(term["wid"])
    else:
        term["w"] = pltpu.bitcast(pk[pl.ds(L.wbake + d, 1), :],
                                  jnp.float32)
    gats = []
    for gfn in gather_chains:
        gats.append([
            gfn(wb[d * Ag + a],
                pk[pl.ds(L.off + d * Ag + a, 1), :]).astype(jnp.int32)
            for a in range(Ag)])
    term["gat"] = gats
    return term


def _term_pots(term, present, Ag, kmax, card, dense, chain, pots):
    """Accumulate one slot's contribution into per-candidate potentials,
    honoring the vmap slot semantics: dense rows contribute to every
    k < card, categorical rows only at their d1/d2 slots (reference
    dataloading.py:34-46; ops/gibbs.color_potentials contrib_ok)."""
    d1 = term["dd"] & 0xFF
    d2 = term["dd"] >> 8
    out = []
    for k in range(kmax):
        vals = [jnp.where(term["sub"][a], jnp.int32(k),
                          term["gat"][chain][a]) for a in range(Ag)]
        e = _eval_all(present, term["ftype"], term["arity"], vals,
                      term["eqs"], term["cards"], Ag)
        ok_dense = dense & (jnp.int32(k) < card)
        ok_cat = (~dense) & ((jnp.int32(k) == d1) | (jnp.int32(k) == d2))
        okf = (ok_dense | ok_cat).astype(jnp.float32)
        out.append(pots[k] + okf * term["w"] * e)
    return tuple(out)


# --------------------------------------------------------------------------
# affine fast-path kernel helpers (shared by the VMEM and HBM kernels)

def _aff_gather(av_a, x_ref, nj, amet_at, s_of, n8, l_iota):
    """Stage all fetched (slot, arg) values for ``n8`` blocks: one
    (n8*8, 128) lane-roll per flat slot j (measured 58 Gvals/s vs 2.4
    for the production f32 one-hot matmul on this chip).

    ``amet_at(j)`` -> affine constant c (AFF_NONE = skip); ``s_of(c)``
    -> value-row start relative to ``x_ref``. A clamped base is
    corrected by a sublane roll: the wrapped rows land only on rows
    whose true position is out of bounds, i.e. rows that do not fetch
    this slot."""
    rows = n8 * 8
    hi = x_ref.shape[0] - rows - 1

    def g_one(j, _):
        c = amet_at(j)

        @pl.when(c != AFF_NONE)
        def _():
            s = s_of(c)
            raw = s >> 7          # arithmetic shift: floor for s < 0
            l0 = s & 127
            # out[q][l] = x[s + 128q + l]: same-slab lanes (l < 128-l0)
            # come from row raw+q, carried lanes from row raw+q+1. Each
            # slab is clamped into range separately and sublane-rolled
            # by its own clamp delta; wrapped rows land only on lanes
            # whose true position is out of bounds (non-fetching rows).
            ba = jnp.clip(raw, 0, hi)
            bb = jnp.clip(raw + 1, 0, hi)
            a1 = pltpu.roll(x_ref[pl.ds(ba, rows), :], ba - raw, 0)
            a2 = pltpu.roll(x_ref[pl.ds(bb, rows), :], bb - raw - 1, 0)
            av_a[pl.ds(j * rows, rows), :] = \
                jnp.where(l_iota < 128 - l0,
                          pltpu.roll(a1, -l0, 1),
                          pltpu.roll(a2, -l0, 1))
        return 0

    jax.lax.fori_loop(0, nj, g_one, 0)


def _draw2(p0, p1, u01):
    """Boolean draw with ONE transcendental: new = [u < sigma(p1-p0)]
    (u*(1+exp(p0-p1)) < 1). Same distribution as _draw with kmax=2;
    the general _draw pays two exps plus the masked cumsum machinery,
    measured ~0.3 ms/epoch at 1M variables."""
    z = jnp.exp(p0 - p1)
    return (u01 * (1.0 + z) < 1.0).astype(jnp.int32)


def _aff_need(present):
    """Static stat requirements per factor type (finalize's truth
    table): (need_head, need_body, need_v0, need_v12)."""
    pres = set(present)
    need_head = bool(pres & {
        T.FUNC_IMPLY_NATURAL, T.FUNC_IMPLY_MLN, T.FUNC_LINEAR,
        T.FUNC_RATIO, T.FUNC_LOGICAL, T.FUNC_IMPLY_NATURAL_CAT,
        T.FUNC_IMPLY_MLN_CAT})
    need_v0 = bool(pres & ({T.FUNC_EQUAL} | _DPGEN))
    need_v12 = bool(pres & {
        T.FUNC_DP_GEN_LF_ACCURACY, T.FUNC_DP_GEN_LF_CLASS_PROPENSITY,
        T.FUNC_DP_GEN_DEP_FIXING, T.FUNC_DP_GEN_DEP_REINFORCING,
        T.FUNC_DP_GEN_DEP_EXCLUSIVE, T.FUNC_DP_GEN_DEP_SIMILAR})
    return need_head, need_head, need_v0, need_v12


def _aff_slot_stats(read_pk, read_av, d, amax_c, Ag, present, rows):
    """ONE slot's counting stats over the staged affine gathers: the
    shared stats pass every candidate (and, in learning, every sampled
    value) is evaluated from. Returns the 12-tuple the a_body loop
    accumulates plus the slot's decoded (ftype, arity)."""
    need_head, need_body, need_v0, need_v12 = _aff_need(present)
    zero8 = jnp.zeros((rows, 128), jnp.int32)
    fta = read_pk(6 * d)
    ftype = (fta & 0xFF) - 1
    arity = fta >> 8
    read_sub = _read_sub2(read_pk(6 * d + 2), read_pk(6 * d + 3))

    def a_body(a, c):
        (nz, nbz, ns, nbs, hf, hs, v0f, v0s, v1f, v1s,
         v2f, v2s) = c
        v = read_av(d * Ag + a)
        sub = read_sub(a)
        m = a < arity
        fet = m & ~sub
        nz = nz + jnp.where(fet & (v == 0), 1, 0)
        ns = ns + jnp.where(m & sub, 1, 0)
        subi = sub.astype(jnp.int32)
        if need_body:
            mb = a < arity - 1
            nbz = nbz + jnp.where(mb & ~sub & (v == 0), 1, 0)
            nbs = nbs + jnp.where(mb & sub, 1, 0)
        if need_head:
            at_h = (a == arity - 1)
            hf = jnp.where(at_h & ~sub, v, hf)
            hs = jnp.where(at_h, subi, hs)
        if need_v0:
            v0f = jnp.where((a == 0) & ~sub, v, v0f)
            v0s = jnp.where(a == 0, subi, v0s)
        if need_v12:
            v1f = jnp.where((a == 1) & ~sub, v, v1f)
            v1s = jnp.where(a == 1, subi, v1s)
            v2f = jnp.where((a == 2) & ~sub, v, v2f)
            v2s = jnp.where(a == 2, subi, v2s)
        return (nz, nbz, ns, nbs, hf, hs, v0f, v0s, v1f, v1s,
                v2f, v2s)

    stats = jax.lax.fori_loop(0, amax_c, a_body,
                              tuple(zero8 for _ in range(12)))
    return stats, ftype, arity


def _aff_eval_at(stats, V, ftype, arity, present, rows):
    """Factor value of one slot at substituted value ``V`` — a python
    int candidate (0/1: the inference k-loop) or a (rows, 128) slab
    (learning: the freshly-sampled values) — from the shared stats.
    Static-int candidates reproduce the historical expressions exactly
    (bit-compatibility of the inference path)."""
    need_head, need_body, need_v0, need_v12 = _aff_need(present)
    zero8 = jnp.zeros((rows, 128), jnp.int32)
    full2 = jnp.full((rows, 128), 2, jnp.int32)
    (nz, nbz, ns, nbs, hf, hs, v0f, v0s, v1f, v1s, v2f, v2s) = stats
    if isinstance(V, int):
        n_zero = nz + ns if V == 0 else nz
        n_bz = nbz + nbs if V == 0 else nbz
        vv = jnp.int32(V)
    else:
        n_zero = nz + jnp.where(V == 0, ns, 0)
        n_bz = nbz + jnp.where(V == 0, nbs, 0)
        vv = V
    head = jnp.where(hs == 1, vv, hf)
    v0 = jnp.where(v0s == 1, vv, v0f)
    st = ArgStats(
        n_zero=n_zero,
        n_one=arity - n_zero,
        n_diff0=jnp.where(v0 == 0, arity - n_zero, n_zero)
        if need_v0 else zero8,
        n_head_eq=jnp.where(head == 0, n_bz,
                            arity - 1 - n_bz)
        if need_head else zero8,
        n_body_zero=n_bz,
        n_neq_eq=arity - n_zero,
        n_eq_eq=n_zero,
        n_body_neq_eq=arity - 1 - n_bz,
        head=head, head_eq=zero8,
        v0=v0,
        v1=jnp.where(v1s == 1, vv, v1f),
        v2=jnp.where(v2s == 1, vv, v2f),
        card0=full2, card1=full2,
        ufo_sel=jnp.float32(0))
    return finalize(present, ftype, st)


def _aff_block_pots(read_pk, read_av, d_c, amax_c, Ag, aff_D, present,
                    w_of=None, rows=8):
    """Potentials for both boolean candidates of one (rows, 128) unit on
    the affine path: ONE shared stats pass over the fetched arguments
    (candidate substitution touches only subst slots, whose boolean
    contribution is an O(1) count fixup), then the shared semantics
    table. Parity: _term_pots/_loop_stats on the same data.
    ``w_of``: live-weight lookup (learning); None reads baked weights.
    ``rows``: 8 for one block (HBM kernel) or SB*8 when the VMEM kernel
    evaluates a whole superblock as one unit.

    Accumulators are pruned STATICALLY by the factor types present
    (_aff_need): e.g. a pure EQUAL/AND/ISTRUE color (Ising, voting)
    tracks only n_zero — the stats loop body is the dominant VPU
    cost."""
    def d_body(d, pots2):
        if w_of is None:
            w = pltpu.bitcast(read_pk(6 * d + 1), jnp.float32)
        else:
            w = w_of(read_pk(6 * d + 4))
        stats, ftype, arity = _aff_slot_stats(read_pk, read_av, d,
                                              amax_c, Ag, present, rows)
        out = []
        for k in range(2):
            e = _aff_eval_at(stats, k, ftype, arity, present, rows)
            out.append(pots2[k] + w * e)
        return tuple(out)

    zf = jnp.zeros((rows, 128), jnp.float32)
    return jax.lax.fori_loop(0, d_c, d_body, (zf, zf))


def flatten_packed_a(packed_a: np.ndarray, cmeta: np.ndarray,
                     aff_D: int, sb: int = SB):
    """Block-form packed_a -> the VMEM kernel's superblock-flat upload
    layout: each logical row l of superblock s holds the (sb*8, 128)
    slab covering all sb blocks, so a whole superblock evaluates as ONE
    (sb*8, 128) unit (no per-block loop). Colors pad to sb-multiples
    with zero blocks (NOOP slots, upd = 0 — computed, masked at store).
    Returns (flat (rows, 128) int32, per-color superblock offsets)."""
    M = 6 * aff_D + 3
    M8 = M * 8
    C = cmeta.shape[0]
    chunks, cur = [], 0
    sb_off = np.zeros(C, np.int32)
    for ci in range(C):
        if cmeta[ci, 5] != 1:
            continue
        nb = int(cmeta[ci, 1])
        off = int(cmeta[ci, 6])
        n_sb = -(-nb // sb)
        arr = np.zeros((n_sb * sb, M8, 128), np.int32)
        arr[:nb] = packed_a[off:off + nb]
        arr = arr.reshape(n_sb, sb, M, 8, 128).transpose(0, 2, 1, 3, 4)
        chunks.append(arr.reshape(-1, 128))
        sb_off[ci] = cur
        cur += n_sb
    flat = np.concatenate(chunks) if chunks else np.zeros((8, 128),
                                                          np.int32)
    return flat, sb_off


# --------------------------------------------------------------------------
# kernels

def _exchange_color(x_out, cmeta_ref, gmeta_ref, ci, my, n_g, rbl,
                    ssem, rsems):
    """Per-color halo exchange: broadcast this device's updated row
    blocks to every peer over the interconnect, then wait for every
    peer's blocks. Receiving a peer's color-c rows doubles as the
    barrier: a peer only sends after its color-c window reads and
    updates are done, so no device can race ahead into color c+1 while
    another still reads color c state. (Reference analog: the per-epoch
    boundary-variable shipping of salt/src/messages.py:1253-1319 — here
    it is per-color, on-chip, and exact rather than one epoch stale.)"""
    nb = cmeta_ref[ci, 1]
    row0 = cmeta_ref[ci, 2]

    def peer_body(s, _):
        peer = jax.lax.rem(my + 1 + s, n_g)

        def blk(b, _):
            src = x_out.at[pl.ds(row0 + b * rbl, rbl)]
            pltpu.make_async_remote_copy(
                src_ref=src, dst_ref=src, send_sem=ssem,
                recv_sem=rsems.at[my], device_id=peer,
                device_id_type=pltpu.DeviceIdType.LOGICAL).start()
            return 0

        jax.lax.fori_loop(0, nb, blk, 0)
        return 0

    jax.lax.fori_loop(0, n_g - 1, peer_body, 0)

    def swait(i, _):
        ref = x_out.at[pl.ds(row0, rbl)]
        pltpu.make_async_copy(ref, ref, ssem).wait()
        return 0

    jax.lax.fori_loop(0, nb * (n_g - 1), swait, 0)

    def rwait(s, _):
        peer = jax.lax.rem(my + 1 + s, n_g)
        prow0 = gmeta_ref[ci, peer, 0]
        pnb = gmeta_ref[ci, peer, 1]

        def blk(b, _):
            dst = x_out.at[pl.ds(prow0 + b * rbl, rbl)]
            pltpu.make_async_copy(dst, dst, rsems.at[peer]).wait()
            return 0

        jax.lax.fori_loop(0, pnb, blk, 0)
        return 0

    jax.lax.fori_loop(0, n_g - 1, rwait, 0)


def _make_kernel(plan: ItemGridPlan, sw_prng: bool = False,
                 n_shards: int = 1, has_ext: bool = False,
                 allow_aff: bool = True, one_color: bool = False,
                 mc_layout: bool | None = None):
    """``one_color``: build the sequential-emulation variant — ONE color
    step for ONE device per call (scalars: epoch index, color index,
    device id), no epoch loop, no tallies, no in-kernel exchange. Used
    by MultiChipItemGridEngine.run_emulated as a debugging oracle for
    the concurrent kernel (chromatic independence makes the sequential
    interleaving exactly equal to the concurrent execution — verified
    bit-equal on 2 interpret devices in tests/test_itemgrid_mc.py;
    salt streams are the MC kernel's).

    ``mc_layout``: force the multi-chip argument layout (device-id
    scalar + gmeta + exchange semaphores) even at n_shards == 1, where
    the exchange loops run over zero peers — used by
    MultiChipItemGridEngine so a 1-device mesh executes the same
    signature its >1-device meshes do. Default (None) keeps the
    historical rule n_shards > 1."""
    vp = plan.vp
    kmax = plan.kmax
    vpr = vp // 128
    trw = plan.trw
    L = _Layout(plan.D, plan.A)
    Ag = plan.A
    DA = plan.D * plan.A
    C = plan.cmeta.shape[0]
    present = plan.present
    rbl = RB // 128
    # static specializations: single-tile windows skip the tile loop;
    # small slot counts unroll (pad slots evaluate to zero, so the
    # unrolled body is correct for colors with fewer items per row)
    single_tile = int(plan.cmeta[:, 3].max()) <= 1 if plan.cmeta.size \
        else True
    unroll_d = plan.D <= 8
    unroll_a = plan.A <= 8          # high arity -> stats loops
    Wb = _ceil(-(-(DA + 2) // 8), 128)
    has_aff = allow_aff and plan.packed_a is not None and \
        plan.cmeta.size and bool((plan.cmeta[:, 5] == 1).any())
    has_old = (not has_aff) or bool((plan.cmeta[:, 5] == 0).any())
    aff_D = plan.aff_D
    M8 = (6 * aff_D + 3) * 8
    sbp = plan.sb               # blocks per affine superblock

    mc = (n_shards > 1) if mc_layout is None else mc_layout
    vec_k = kmax >= VEC_K_MIN   # candidates on sublanes (see _draw_vec)
    # pure-affine single-chip: flatten (color x superblock) into ONE
    # unit loop driven by an SMEM table, so pack_a prefetch crosses
    # color boundaries and per-color loop setup vanishes — many-color
    # graphs (voting degree 50: 51 colors x 1 unit) spend a third of
    # the epoch on those seams otherwise
    flat = has_aff and not has_old and not mc and not one_color
    U = int((-(-plan.cmeta[plan.cmeta[:, 5] == 1, 1] // sbp)).sum()) \
        if flat else 0

    def kernel(*refs):
        refs = list(refs)
        if one_color:
            gmeta_ref = burn_ref = epochs_ref = None
            if mc:
                (seed_ref, ep_ref, ci_ref, myid_ref,
                 cmeta_ref) = refs[:5]
                refs = refs[5:]
                my = myid_ref[0]
            else:
                seed_ref, ep_ref, ci_ref, cmeta_ref = refs[:4]
                refs = refs[4:]
                my = 0
        elif mc:
            (seed_ref, burn_ref, epochs_ref, myid_ref, cmeta_ref,
             gmeta_ref) = refs[:6]
            refs = refs[6:]
            my = myid_ref[0]
        else:
            seed_ref, burn_ref, epochs_ref, cmeta_ref = refs[:4]
            refs = refs[4:]
            my = 0
        amet_ref = refs.pop(0) if has_aff else None
        umeta_ref = refs.pop(0) if flat else None
        x_in = refs.pop(0)
        tally_in = None if one_color else refs.pop(0)
        ext_in = None
        if has_ext:
            ext_in = refs.pop(0)   # (kmax*vpr, 128) f32 potentials
        pack_hbm, wb_hbm = refs[:2]
        refs = refs[2:]
        pack_a_hbm = refs.pop(0) if has_aff else None
        x_out = refs.pop(0)
        count_out = None if one_color else refs.pop(0)
        (pack_scr, wb_scr, av_scr) = refs[:3]
        refs = refs[3:]
        pots_scr = refs.pop(0) if vec_k else None
        (sem, wsem) = refs[:2]
        refs = refs[2:]
        if mc and not one_color:
            ssem, rsems = refs[:2]
            refs = refs[2:]
        if has_aff:
            pack_a_scr, av_a, u_scr, asem = refs[:4]
        pltpu.prng_seed(seed_ref[0] + my)
        uniform = _make_uniform(sw_prng, seed_ref[0] * 977 + my)
        abl = ABLATE
        if "prng" in abl:
            def uniform(salt, shape):
                return jnp.full(shape, 0.5, jnp.float32)
        # chunked init + tally: full-(vp)-array ops stage through vector
        # registers and spill tens of MB at multi-million-variable sizes
        CH = 4096

        def _chunks(rows):
            return [(s, min(CH, rows - s)) for s in range(0, rows, CH)]

        for s, ln in _chunks(vpr):
            x_out[pl.ds(s, ln), :] = x_in[pl.ds(s, ln), :]
        if not one_color:
            for s, ln in _chunks(kmax * vpr):
                count_out[pl.ds(s, ln), :] = jnp.zeros((ln, 128),
                                                       jnp.int16)
            burn = burn_ref[0]
            total = burn + epochs_ref[0]

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (trw, RB), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, RB), 0)

        def start_dma(grb, slot):
            if "dma" in ABLATE:
                return
            pltpu.make_async_copy(pack_hbm.at[grb], pack_scr.at[slot],
                                  sem.at[slot]).start()
            pltpu.make_async_copy(wb_hbm.at[grb], wb_scr.at[slot],
                                  wsem.at[slot]).start()

        def wait_dma(grb, slot):
            if "dma" in ABLATE:
                return
            pltpu.make_async_copy(pack_hbm.at[grb], pack_scr.at[slot],
                                  sem.at[slot]).wait()
            pltpu.make_async_copy(wb_hbm.at[grb], wb_scr.at[slot],
                                  wsem.at[slot]).wait()

        def old_color_body(ci, epoch_i):
            # the per-color schedule is DATA (an SMEM table), so this
            # single body serves any number of colors
            rb_off = cmeta_ref[ci, 0]
            num_rb = cmeta_ref[ci, 1]
            row0c = cmeta_ref[ci, 2]
            nt = cmeta_ref[ci, 3]
            d_c = cmeta_ref[ci, 4]
            start_dma(rb_off, 0)        # warm up the double buffer

            def rb_body(rb, salt_base):
                slot = rb % 2

                @pl.when(rb + 1 < num_rb)
                def _():
                    start_dma(rb_off + rb + 1, (rb + 1) % 2)

                wait_dma(rb_off + rb, slot)
                pk = pack_scr.at[slot]
                wb = _wb_view(wb_scr, slot, Wb)

                def gat(base_r, off):
                    return _gather_tiled(x_out, base_r, off,
                                         None if single_tile else nt,
                                         trw, sub_iota, lane_iota)

                upd = pk[L.upd:L.upd + 1, :]
                rowmeta = pk[L.rowmeta:L.rowmeta + 1, :]
                card = rowmeta & 0xFF
                dense = (rowmeta >> 8) == 0

                def d_body(d, pots):
                    if unroll_a:
                        term = _slot_decode(pk, wb, L, Ag, d, [gat])
                        return _term_pots(term, present, Ag, kmax, card,
                                          dense, 0, pots)
                    fta = pk[pl.ds(L.fta + d, 1), :]
                    ftype = (fta & 0xFF) - 1
                    ar = fta >> 8
                    w = pltpu.bitcast(pk[pl.ds(L.wbake + d, 1), :],
                                      jnp.float32)
                    dd = pk[pl.ds(L.dd + d, 1), :]
                    d1, d2 = dd & 0xFF, dd >> 8
                    _slot_gather_stage(pk, wb, L, Ag, d, gat, av_scr, 0)
                    es = _slot_eval_loop(
                        pk, L, Ag, d, av_scr, 0, present, ftype, ar,
                        [jnp.int32(k) for k in range(kmax)])
                    out = []
                    for k in range(kmax):
                        ok = ((dense & (jnp.int32(k) < card)) |
                              ((~dense) & ((jnp.int32(k) == d1) |
                                           (jnp.int32(k) == d2))))
                        out.append(pots[k] +
                                   ok.astype(jnp.float32) * w * es[k])
                    return tuple(out)

                def d_body_vec(d, _):
                    """Candidate-vectorized slot: ONE broadcast eval
                    covers every candidate — the substituted argument
                    is a (kmax, RB) sublane iota, every other slab
                    broadcasts from (1, RB). Accumulates into the
                    pots_scr VMEM slab (code size O(1) in kmax)."""
                    kio = jax.lax.broadcasted_iota(
                        jnp.int32, (kmax, RB), 0)
                    if unroll_a:
                        term = _slot_decode(pk, wb, L, Ag, d, [gat])
                        ftype, ar = term["ftype"], term["arity"]
                        w, dd = term["w"], term["dd"]
                        vals = [jnp.where(term["sub"][a], kio,
                                          term["gat"][0][a])
                                for a in range(Ag)]
                        e = _eval_all(present, ftype, ar, vals,
                                      term["eqs"], term["cards"], Ag)
                    else:
                        fta = pk[pl.ds(L.fta + d, 1), :]
                        ftype = (fta & 0xFF) - 1
                        ar = fta >> 8
                        w = pltpu.bitcast(
                            pk[pl.ds(L.wbake + d, 1), :], jnp.float32)
                        dd = pk[pl.ds(L.dd + d, 1), :]
                        _slot_gather_stage(pk, wb, L, Ag, d, gat,
                                           av_scr, 0)
                        e = _slot_eval_loop(
                            pk, L, Ag, d, av_scr, 0, present,
                            ftype, ar, [kio])[0]
                    d1, d2 = dd & 0xFF, dd >> 8
                    ok = ((dense & (kio < card)) |
                          ((~dense) & ((kio == d1) | (kio == d2))))
                    pots_scr[:] = pots_scr[:] + \
                        ok.astype(jnp.float32) * w * e
                    return 0

                row0 = row0c + rb * rbl
                if vec_k:
                    pots_scr[:] = jnp.zeros((kmax, RB), jnp.float32)
                    if "eval" in ABLATE:
                        pots_scr[0:1, :] = \
                            pk[0:1, :].astype(jnp.float32) * 1e-6
                    elif unroll_d:
                        for d in range(plan.D):
                            d_body_vec(d, 0)
                    else:
                        jax.lax.fori_loop(0, d_c, d_body_vec, 0)
                    if has_ext:
                        for k in range(kmax):
                            pots_scr[pl.ds(k, 1), :] = \
                                pots_scr[pl.ds(k, 1), :] + \
                                ext_in[pl.ds(k * vpr + row0, rbl),
                                       :].reshape(1, RB)
                    new = _draw_vec(pots_scr[:], card, kmax,
                                    uniform(salt_base * 65536 + rb,
                                            (1, RB)))
                else:
                    pots = tuple(jnp.zeros((1, RB), jnp.float32)
                                 for _ in range(kmax))
                    if "eval" in ABLATE:
                        pots = tuple(
                            p + pk[di:di + 1, :].astype(jnp.float32)
                            * 1e-6
                            for di, p in enumerate(pots))
                    elif unroll_d:
                        for d in range(plan.D):
                            pots = d_body(d, pots)
                    else:
                        pots = jax.lax.fori_loop(0, d_c, d_body, pots)
                    if has_ext:
                        # external per-(row, value) potentials: incoming
                        # boundary messages in partitioned execution
                        pots = tuple(
                            pots[k] + ext_in[pl.ds(k * vpr + row0, rbl),
                                             :].reshape(1, RB)
                            for k in range(kmax))
                    new = _draw(list(pots), card, kmax,
                                uniform(salt_base * 65536 + rb,
                                        (1, RB)))
                old = x_out[pl.ds(row0, rbl), :]
                x_out[pl.ds(row0, rbl), :] = jnp.where(
                    upd.reshape(rbl, 128) == 1,
                    new.reshape(rbl, 128), old)
                return salt_base

            jax.lax.fori_loop(0, num_rb, rb_body,
                              (epoch_i * (COLOR_MAX + 1) + ci) * n_shards + my)
            return epoch_i

        # ---- affine fast path: lane-roll gathers + shared boolean
        # counting stats (see _affine_color_info for the envelope);
        # whole superblocks (SB blocks) evaluate as ONE (SB*8, 128)
        # unit — packed_a is uploaded superblock-flat (flatten_packed_a)
        if has_aff:
            lane_sb = jax.lax.broadcasted_iota(jnp.int32,
                                               (sbp * 8, 128), 1)
            SR = sbp * rbl          # sublane rows per superblock

            def a_dma(gsb, slot, what):
                if "dma" in abl:
                    return
                cp = pltpu.make_async_copy(
                    pack_a_hbm.at[pl.ds(gsb * (M8 * sbp), M8 * sbp)],
                    pack_a_scr.at[slot], asem.at[slot])
                cp.start() if what == "start" else cp.wait()

            def aff_unit(ci, s, num_rb, row0, salt0, slot):
                """Evaluate + draw + store ONE superblock unit (sbp
                blocks) of color ``ci``; its pack_a DMA into ``slot``
                must already be awaited."""
                if "gather" not in abl:
                    _aff_gather(av_a, x_out, cmeta_ref[ci, 4] * Ag,
                                lambda j: amet_ref[ci, j],
                                lambda c: c + s * (sbp * RB), sbp,
                                lane_sb)
                pka = pack_a_scr.at[slot]
                if "eval" in abl:
                    p = av_a[pl.ds(0, sbp * 8), :].astype(
                        jnp.float32) * 1e-6
                    pots = (p, -p)
                else:
                    pots = _aff_block_pots(
                        lambda lr: pka[pl.ds(SR * lr, SR), :],
                        lambda j: av_a[pl.ds(j * sbp * 8,
                                             sbp * 8), :],
                        cmeta_ref[ci, 4], cmeta_ref[ci, 7], Ag,
                        aff_D, present, rows=sbp * 8)
                if has_ext:
                    pots = tuple(
                        pots[k] + ext_in[pl.ds(k * vpr + row0,
                                               SR), :]
                        for k in range(2))
                # per-BLOCK uniforms (same stream as the HBM
                # kernel's per-block path: bit-identity holds)
                if "uscr" not in abl:
                    for b in range(sbp):
                        u_scr[pl.ds(b * rbl, rbl), :] = uniform(
                            salt0 * 65536 + s * sbp + b, (8, 128))
                if "draw" in abl:
                    new = (pots[0] < pots[1]).astype(jnp.int32)
                else:
                    new = _draw2(pots[0], pots[1], u_scr[...])
                upd = pka[pl.ds(SR * (6 * aff_D), SR), :]
                old = x_out[pl.ds(row0, SR), :]
                new_v = jnp.where(upd == 1, new, old)
                if "store" in abl:
                    u_scr[...] = new_v.astype(jnp.float32)
                elif mc:
                    # the last superblock may round past this
                    # device's share of the color (pad blocks carry
                    # upd=0, i.e. the store would rewrite the OLD
                    # values it read) — those rows belong to a peer
                    # and race with its incoming halo broadcast, so
                    # store only owned blocks
                    for b in range(sbp):
                        @pl.when(s * sbp + b < num_rb)
                        def _(b=b):
                            x_out[pl.ds(row0 + b * rbl, rbl), :] = \
                                new_v[b * rbl:(b + 1) * rbl, :]
                else:
                    x_out[pl.ds(row0, SR), :] = new_v

            def aff_color_body(ci, epoch_i):
                sb_off = cmeta_ref[ci, 6]      # superblock offset
                num_rb = cmeta_ref[ci, 1]
                row0c = cmeta_ref[ci, 2]
                n_sb = (num_rb + sbp - 1) // sbp
                salt0 = (epoch_i * (COLOR_MAX + 1) + ci) * n_shards + my
                a_dma(sb_off, 0, "start")

                def sb_body(s, _):
                    slot = s % 2

                    @pl.when(s + 1 < n_sb)
                    def _():
                        a_dma(sb_off + s + 1, (s + 1) % 2, "start")

                    a_dma(sb_off + s, slot, "wait")
                    aff_unit(ci, s, num_rb, row0c + s * SR, salt0, slot)
                    return 0

                jax.lax.fori_loop(0, n_sb, sb_body, 0)
                return epoch_i

        def color_body(ci, epoch_i):
            if has_aff and has_old:
                @pl.when(cmeta_ref[ci, 5] == 1)
                def _():
                    aff_color_body(ci, epoch_i)

                @pl.when(cmeta_ref[ci, 5] == 0)
                def _():
                    old_color_body(ci, epoch_i)
            elif has_aff:
                aff_color_body(ci, epoch_i)
            else:
                old_color_body(ci, epoch_i)
            if mc and not one_color:
                _exchange_color(x_out, cmeta_ref, gmeta_ref, ci, my,
                                n_shards, rbl, ssem, rsems)
            return epoch_i

        if one_color:
            color_body(ci_ref[0], ep_ref[0])
            return

        def flat_units(i):
            # colors stay sequential (units are ordered by color; the
            # kernel executes in order), but the NEXT unit's pack_a
            # stream is always in flight — including across colors
            a_dma(umeta_ref[0, 2], 0, "start")

            def unit_body(u, _):
                slot = u % 2

                @pl.when(u + 1 < U)
                def _():
                    a_dma(umeta_ref[u + 1, 2], (u + 1) % 2, "start")

                a_dma(umeta_ref[u, 2], slot, "wait")
                ci = umeta_ref[u, 0]
                aff_unit(ci, umeta_ref[u, 1], cmeta_ref[ci, 1],
                         umeta_ref[u, 3],
                         i * (COLOR_MAX + 1) + ci, slot)
                return 0

            jax.lax.fori_loop(0, U, unit_body, 0)

        def epoch_body(i, _):
            if flat:
                flat_units(i)
            else:
                jax.lax.fori_loop(0, C, color_body, i)
            if "tally" in abl:
                return 0
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


def _make_learn_kernel(plan: ItemGridPlan, lp, wrows: int,
                       sw_prng: bool = False, has_ext: bool = False,
                       n_shards: int = 0):
    """Dual-chain SGD fully in-kernel (reference learning.py:46-125 with
    the batched per-color semantics of ops/gibbs._color_step_learn).

    Same data-driven structure as the inference kernel. The slot loop
    runs twice per block — potentials+draw, then gradients — with the
    gathered argument values staged through a VMEM scratch so the
    expensive gathers happen once.

    ``n_shards > 1``: graph-sharded distributed learning — after each
    color both chains' updated row blocks broadcast to every peer
    (see _exchange_color) and the per-color (gradient, count) pair
    all-reduces in FIXED device order, so every device applies a
    bit-identical weight update (the reference's per-epoch dw summation
    at the master, numbskull_master.py:174-233, made per-color, exact,
    and on-interconnect)."""
    kmax = plan.kmax
    if kmax > 32:
        # the learn kernel's dual-chain candidate loops are still
        # unrolled in kmax; beyond 32 the code-size blowup makes the
        # Mosaic compile pathological (measured minutes / device stall
        # at 64). The inference kernel's vec-k path fixes this; porting
        # it to the dual-chain+gradient structure is ROADMAP work. The
        # XLA learn engine covers card > 32 graphs meanwhile.
        raise ValueError("itemgrid learn caps cardinality at 32 "
                         "(got %d); use the XLA engine" % kmax)
    vp = plan.vp
    vpr = vp // 128
    trw = plan.trw
    L = _Layout(plan.D, plan.A)
    Ag = plan.A
    DA = plan.D * plan.A
    C = plan.cmeta.shape[0]
    present = plan.present
    rbl = RB // 128
    single_tile = int(plan.cmeta[:, 3].max()) <= 1 if plan.cmeta.size \
        else True
    unroll_d = plan.D <= 8
    unroll_a = plan.A <= 8          # high arity -> stats loops
    Wb = _ceil(-(-(DA + 2) // 8), 128)
    # n_shards = 0: single-chip ref layout; >= 1: multi-chip layout
    # (n_shards == 1 exchanges with zero peers — bit-equal semantics,
    # used to validate the MC path against the single-chip kernel)
    mc = n_shards >= 1
    W2 = 2 * wrows
    # affine learn path: dual-chain lane-roll gathers + shared stats
    # (single-chip, no external potentials — those colors run the
    # general path, which remains correct for affine-flagged colors
    # because the old-stack blocks are always written)
    has_aff = (not mc and not has_ext and plan.packed_a is not None
               and plan.cmeta.size
               and bool((plan.cmeta[:, 5] == 1).any()))
    aff_D = plan.aff_D
    sbp = plan.sb
    M8 = (6 * aff_D + 3) * 8

    def kernel(*refs):
        refs = list(refs)
        (seed_ref, burn_ref, epochs_ref, step0_ref, decay_ref) = refs[:5]
        refs = refs[5:]
        if mc:
            myid_ref, cmeta_ref, gmeta_ref = refs[:3]
            refs = refs[3:]
            my = myid_ref[0]
        else:
            cmeta_ref = refs.pop(0)
            my = 0
        amet_ref = refs.pop(0) if has_aff else None
        (x_in, xe_in, w_in, wfix) = refs[:4]
        refs = refs[4:]
        ext_p_in = ext_e_in = None
        if has_ext:
            ext_p_in = refs.pop(0)
            ext_e_in = refs.pop(0)
        (pack_hbm, wb_hbm) = refs[:2]
        refs = refs[2:]
        pack_a_hbm = refs.pop(0) if has_aff else None
        (x_out, xe_out, w_out,
         pack_scr, wb_scr, gv_scr, gw_scr, nw_scr, sem, wsem) = refs[:10]
        refs = refs[10:]
        if mc:
            ssem, rsems, gwr, gssem, grsems = refs[:5]
            refs = refs[5:]
        if has_aff:
            (pack_a_scr, av_ap, av_ae, ua_scr, g_scr, i_scr, st_scr,
             asem) = refs[:8]
        pltpu.prng_seed(seed_ref[0] + my)
        uniform = _make_uniform(sw_prng, seed_ref[0] + my)
        # weight-update randomness (L1 truncation) must be IDENTICAL on
        # every device; the software stream shares the base seed (the
        # hardware PRNG cannot — the engine rejects L1 + n_shards > 1)
        uniform_w = _make_uniform(sw_prng, seed_ref[0]) if mc else \
            uniform
        # chunked init (full-array copies spill registers at scale)
        CH = 4096
        for s in range(0, vpr, CH):
            ln = min(CH, vpr - s)
            x_out[pl.ds(s, ln), :] = x_in[pl.ds(s, ln), :]
            xe_out[pl.ds(s, ln), :] = xe_in[pl.ds(s, ln), :]
        w_out[:] = w_in[:]

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (trw, RB), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, RB), 0)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (wrows, RB), 0)

        def w_of(wid):
            return _gather(w_out[:], wid, w_iota, lane_iota)

        def start_dma(grb, slot):
            if "dma" in ABLATE:
                return
            pltpu.make_async_copy(pack_hbm.at[grb], pack_scr.at[slot],
                                  sem.at[slot]).start()
            pltpu.make_async_copy(wb_hbm.at[grb], wb_scr.at[slot],
                                  wsem.at[slot]).start()

        def wait_dma(grb, slot):
            if "dma" in ABLATE:
                return
            pltpu.make_async_copy(pack_hbm.at[grb], pack_scr.at[slot],
                                  sem.at[slot]).wait()
            pltpu.make_async_copy(wb_hbm.at[grb], wb_scr.at[slot],
                                  wsem.at[slot]).wait()

        def free_color(ci, epoch_i):
            """Inference-style color step of the free chain (burn-in),
            with live weights."""
            rb_off = cmeta_ref[ci, 0]
            num_rb = cmeta_ref[ci, 1]
            row0c = cmeta_ref[ci, 2]
            nt = cmeta_ref[ci, 3]
            d_c = cmeta_ref[ci, 4]
            start_dma(rb_off, 0)

            def rb_body(rb, salt_base):
                slot = rb % 2

                @pl.when(rb + 1 < num_rb)
                def _():
                    start_dma(rb_off + rb + 1, (rb + 1) % 2)

                wait_dma(rb_off + rb, slot)
                pk = pack_scr.at[slot]
                wb = _wb_view(wb_scr, slot, Wb)

                def gat(base_r, off):
                    return _gather_tiled(x_out, base_r, off,
                                         None if single_tile else nt,
                                         trw, sub_iota, lane_iota)

                upd = pk[L.upd:L.upd + 1, :]
                rowmeta = pk[L.rowmeta:L.rowmeta + 1, :]
                card = rowmeta & 0xFF
                dense = (rowmeta >> 8) == 0

                def d_body(d, pots):
                    if unroll_a:
                        term = _slot_decode(pk, wb, L, Ag, d, [gat],
                                            w_of)
                        return _term_pots(term, present, Ag, kmax, card,
                                          dense, 0, pots)
                    fta = pk[pl.ds(L.fta + d, 1), :]
                    ftype = (fta & 0xFF) - 1
                    ar = fta >> 8
                    w = w_of(pk[pl.ds(L.wid + d, 1), :])
                    dd = pk[pl.ds(L.dd + d, 1), :]
                    d1, d2 = dd & 0xFF, dd >> 8
                    _slot_gather_stage(pk, wb, L, Ag, d, gat, gv_scr, 0)
                    es = _slot_eval_loop(
                        pk, L, Ag, d, gv_scr, 0, present, ftype, ar,
                        [jnp.int32(k) for k in range(kmax)])
                    out = []
                    for k in range(kmax):
                        ok = ((dense & (jnp.int32(k) < card)) |
                              ((~dense) & ((jnp.int32(k) == d1) |
                                           (jnp.int32(k) == d2))))
                        out.append(pots[k] +
                                   ok.astype(jnp.float32) * w * es[k])
                    return tuple(out)

                pots = tuple(jnp.zeros((1, RB), jnp.float32)
                             for _ in range(kmax))
                if "eval" in ABLATE:
                    pots = tuple(
                        p + pk[di:di + 1, :].astype(jnp.float32) * 1e-6
                        for di, p in enumerate(pots))
                elif unroll_d:
                    for d in range(plan.D):
                        pots = d_body(d, pots)
                else:
                    pots = jax.lax.fori_loop(0, d_c, d_body, pots)
                row0 = row0c + rb * rbl
                if has_ext:
                    pots = tuple(
                        pots[k] + ext_p_in[pl.ds(k * vpr + row0, rbl),
                                           :].reshape(1, RB)
                        for k in range(kmax))
                new = _draw(list(pots), card, kmax,
                            uniform((salt_base * 65536 + rb) ^
                                    0x40000000, (1, RB)))
                old = x_out[pl.ds(row0, rbl), :]
                x_out[pl.ds(row0, rbl), :] = jnp.where(
                    upd.reshape(rbl, 128) == 1,
                    new.reshape(rbl, 128), old)
                return salt_base

            jax.lax.fori_loop(0, num_rb, rb_body, epoch_i * (COLOR_MAX + 1) + ci)
            if mc:
                _exchange_color(x_out, cmeta_ref, gmeta_ref, ci, my,
                                n_shards, rbl, ssem, rsems)
            return epoch_i

        def learn_color(ci, carry):
            step, epoch_i = carry
            rb_off = cmeta_ref[ci, 0]
            num_rb = cmeta_ref[ci, 1]
            row0c = cmeta_ref[ci, 2]
            nt = cmeta_ref[ci, 3]
            d_c = cmeta_ref[ci, 4]
            gw_scr[:] = jnp.zeros((wrows, 128), jnp.float32)
            nw_scr[:] = jnp.zeros((wrows, 128), jnp.float32)
            start_dma(rb_off, 0)

            def rb_body(rb, salt_base):
                slot = rb % 2

                @pl.when(rb + 1 < num_rb)
                def _():
                    start_dma(rb_off + rb + 1, (rb + 1) % 2)

                wait_dma(rb_off + rb, slot)
                pk = pack_scr.at[slot]
                wb = _wb_view(wb_scr, slot, Wb)

                def gat_p(base_r, off):
                    return _gather_tiled(x_out, base_r, off,
                                         None if single_tile else nt,
                                         trw, sub_iota, lane_iota)

                def gat_e(base_r, off):
                    return _gather_tiled(xe_out, base_r, off,
                                         None if single_tile else nt,
                                         trw, sub_iota, lane_iota)

                upd = pk[L.upd:L.upd + 1, :]
                upd_e = pk[L.upd_e:L.upd_e + 1, :]
                lrn_ev = pk[L.lrn:L.lrn + 1, :]
                rowmeta = pk[L.rowmeta:L.rowmeta + 1, :]
                card = rowmeta & 0xFF
                dense = (rowmeta >> 8) == 0
                lrn = upd if lp.learn_non_evidence else lrn_ev

                # pass 1: gather (staged to scratch) + potentials
                def d_pots(d, pots2):
                    pots_p, pots_e = pots2
                    if unroll_a:
                        term = _slot_decode(pk, wb, L, Ag, d,
                                            [gat_p, gat_e], w_of)
                        for a in range(Ag):
                            gv_scr[pl.ds(d * Ag + a, 1), :] = \
                                term["gat"][0][a]
                            gv_scr[pl.ds(DA + d * Ag + a, 1), :] = \
                                term["gat"][1][a]
                        pots_p = _term_pots(term, present, Ag, kmax,
                                            card, dense, 0, pots_p)
                        pots_e = _term_pots(term, present, Ag, kmax,
                                            card, dense, 1, pots_e)
                        return (pots_p, pots_e)
                    fta = pk[pl.ds(L.fta + d, 1), :]
                    ftype = (fta & 0xFF) - 1
                    ar = fta >> 8
                    w = w_of(pk[pl.ds(L.wid + d, 1), :])
                    dd = pk[pl.ds(L.dd + d, 1), :]
                    d1, d2 = dd & 0xFF, dd >> 8
                    _slot_gather_stage(pk, wb, L, Ag, d, gat_p, gv_scr,
                                       d * Ag)
                    _slot_gather_stage(pk, wb, L, Ag, d, gat_e, gv_scr,
                                       DA + d * Ag)
                    ks = [jnp.int32(k) for k in range(kmax)]
                    eps = _slot_eval_loop(pk, L, Ag, d, gv_scr, d * Ag,
                                          present, ftype, ar, ks)
                    ees = _slot_eval_loop(pk, L, Ag, d, gv_scr,
                                          DA + d * Ag, present, ftype,
                                          ar, ks)
                    np_, ne_ = [], []
                    for k in range(kmax):
                        ok = ((dense & (jnp.int32(k) < card)) |
                              ((~dense) & ((jnp.int32(k) == d1) |
                                           (jnp.int32(k) == d2)))
                              ).astype(jnp.float32)
                        np_.append(pots_p[k] + ok * w * eps[k])
                        ne_.append(pots_e[k] + ok * w * ees[k])
                    return (tuple(np_), tuple(ne_))

                zero = tuple(jnp.zeros((1, RB), jnp.float32)
                             for _ in range(kmax))
                if unroll_d:
                    pots2 = (zero, zero)
                    for d in range(plan.D):
                        pots2 = d_pots(d, pots2)
                    pots_p, pots_e = pots2
                else:
                    pots_p, pots_e = jax.lax.fori_loop(
                        0, d_c, d_pots, (zero, zero))
                if has_ext:
                    r0x = row0c + rb * rbl
                    pots_p = tuple(
                        pots_p[k] + ext_p_in[pl.ds(k * vpr + r0x, rbl),
                                             :].reshape(1, RB)
                        for k in range(kmax))
                    pots_e = tuple(
                        pots_e[k] + ext_e_in[pl.ds(k * vpr + r0x, rbl),
                                             :].reshape(1, RB)
                        for k in range(kmax))
                e_samp = _draw(list(pots_e), card, kmax,
                               uniform((salt_base * 65536 + rb) ^
                                       0x55555555, (1, RB)))
                p_samp = _draw(list(pots_p), card, kmax,
                               uniform(salt_base * 65536 + rb, (1, RB)))

                row0 = row0c + rb * rbl
                x_rows = x_out[pl.ds(row0, rbl), :].reshape(1, RB)
                xe_rows = xe_out[pl.ds(row0, rbl), :].reshape(1, RB)
                p_val = jnp.where(upd == 1, p_samp, x_rows)
                e_val = jnp.where(upd_e == 1, e_samp, xe_rows)
                x_out[pl.ds(row0, rbl), :] = p_val.reshape(rbl, 128)
                xe_out[pl.ds(row0, rbl), :] = e_val.reshape(rbl, 128)

                # pass 2: gradient = eval(free @ proposal) - eval(clamped
                # @ evidence sample), x featureValue; categorical items
                # contribute only when a sampled value hits their slot
                # (reference ops/gibbs._color_step_learn slot_hit)
                def d_grad(d, _):
                    term = _slot_decode(pk, wb, L, Ag, d, [], w_of)
                    if unroll_a:
                        gp = [gv_scr[pl.ds(d * Ag + a, 1), :]
                              for a in range(Ag)]
                        ge = [gv_scr[pl.ds(DA + d * Ag + a, 1), :]
                              for a in range(Ag)]
                        vp_ = [jnp.where(term["sub"][a], p_val, gp[a])
                               for a in range(Ag)]
                        ve_ = [jnp.where(term["sub"][a], e_val, ge[a])
                               for a in range(Ag)]
                        ev_p = _eval_all(present, term["ftype"],
                                         term["arity"], vp_,
                                         term["eqs"], term["cards"], Ag)
                        ev_e = _eval_all(present, term["ftype"],
                                         term["arity"], ve_,
                                         term["eqs"], term["cards"], Ag)
                    else:
                        ev_p = _slot_eval_loop(
                            pk, L, Ag, d, gv_scr, d * Ag, present,
                            term["ftype"], term["arity"], [p_val])[0]
                        ev_e = _slot_eval_loop(
                            pk, L, Ag, d, gv_scr, DA + d * Ag, present,
                            term["ftype"], term["arity"], [e_val])[0]
                    d1 = term["dd"] & 0xFF
                    d2 = term["dd"] >> 8
                    hit = (d1 == e_val) | (d1 == p_val) | \
                          (d2 == e_val) | (d2 == p_val)
                    inc = (lrn == 1) & (term["ftype"] != -1) & \
                        (dense | hit)
                    grad = jnp.where(inc, (ev_p - ev_e) * term["fv"],
                                     0.0)
                    if "gradmm" in ABLATE:    # profiling: keep evals,
                        gw_scr[0:1, :] = gw_scr[0:1, :] + \
                            grad.reshape(RB // 128, 128)[0:1, :]
                        return 0              # drop the matmuls
                    roh = (w_iota == (term["wid"] >> 7)).astype(
                        jnp.float32)
                    loh = lane_iota == (term["wid"] & 127)
                    # one MXU contraction for BOTH per-weight reductions
                    # (gradient sum + contribution count): the rhs
                    # stacks them on the sublane axis, and each output
                    # element is the same single-axis contraction as
                    # two separate dots — bit-identical results, half
                    # the MXU issues
                    both = jnp.concatenate(
                        [jnp.where(loh, grad, 0.0),
                         jnp.where(loh, inc.astype(jnp.float32), 0.0)],
                        axis=0)                           # (256, RB)
                    gn = jax.lax.dot_general(
                        roh, both,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    gw_scr[:] = gw_scr[:] + gn[:, 0:128]
                    nw_scr[:] = nw_scr[:] + gn[:, 128:256]
                    return 0

                if "grad" in ABLATE:          # profiling: sampling only
                    pass
                elif unroll_d:
                    for d in range(plan.D):
                        d_grad(d, 0)
                else:
                    jax.lax.fori_loop(0, d_c, d_grad, 0)
                return salt_base

            jax.lax.fori_loop(0, num_rb, rb_body, epoch_i * (COLOR_MAX + 1) + ci)

            if mc:
                # both chains' rows ship to every peer; then the
                # per-color (gradient, count) pair all-reduces in FIXED
                # device order so the update is bit-identical everywhere
                _exchange_color(x_out, cmeta_ref, gmeta_ref, ci, my,
                                n_shards, rbl, ssem, rsems)
                _exchange_color(xe_out, cmeta_ref, gmeta_ref, ci, my,
                                n_shards, rbl, ssem, rsems)
                gwr[pl.ds(my * W2, wrows), :] = gw_scr[:]
                gwr[pl.ds(my * W2 + wrows, wrows), :] = nw_scr[:]

                def g_send(s, _):
                    peer = jax.lax.rem(my + 1 + s, n_shards)
                    src = gwr.at[pl.ds(my * W2, W2)]
                    pltpu.make_async_remote_copy(
                        src_ref=src, dst_ref=src, send_sem=gssem,
                        recv_sem=grsems.at[my], device_id=peer,
                        device_id_type=pltpu.DeviceIdType.LOGICAL
                    ).start()
                    return 0

                jax.lax.fori_loop(0, n_shards - 1, g_send, 0)

                def g_swait(i, _):
                    ref = gwr.at[pl.ds(my * W2, W2)]
                    pltpu.make_async_copy(ref, ref, gssem).wait()
                    return 0

                jax.lax.fori_loop(0, n_shards - 1, g_swait, 0)

                def g_rwait(s, _):
                    peer = jax.lax.rem(my + 1 + s, n_shards)
                    dst = gwr.at[pl.ds(peer * W2, W2)]
                    pltpu.make_async_copy(dst, dst,
                                          grsems.at[peer]).wait()
                    return 0

                jax.lax.fori_loop(0, n_shards - 1, g_rwait, 0)

                def g_acc(d, c):
                    return (c[0] + gwr[pl.ds(d * W2, wrows), :],
                            c[1] + gwr[pl.ds(d * W2 + wrows, wrows), :])

                gw, nw = jax.lax.fori_loop(
                    0, n_shards, g_acc,
                    (jnp.zeros((wrows, 128), jnp.float32),
                     jnp.zeros((wrows, 128), jnp.float32)))
            else:
                # apply the update (reference learning.py:111-125
                # semantics, batched as in ops/gibbs._color_step_learn)
                gw, nw = gw_scr[:], nw_scr[:]
            apply_update(gw, nw, step, epoch_i, ci)

        def apply_update(gw, nw, step, epoch_i, ci):
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
                u = uniform_w((epoch_i * (COLOR_MAX + 1) + ci) ^ 0x33333333,
                              (wrows, 128))
                w_new = jnp.where(u < 1.0 / lp.truncation, w_tr, w_new)
            else:
                w_new = w - step * gw
            w_out[:] = jnp.where(touched, w_new, w)

        if has_aff:
            lane_sb = jax.lax.broadcasted_iota(jnp.int32,
                                               (sbp * 8, 128), 1)
            SRr = sbp * rbl         # sublane rows per superblock
            # statically-needed stat slots (by _aff_need) staged from
            # pass A for pass B's sampled-value evals — the stats do
            # not depend on the candidate, so recomputing them for the
            # gradient measured ~50% of the learn epoch
            nh, nb, nv0, nv12 = _aff_need(present)
            st_active = [0, 2] + ([1, 3] if nb else []) + \
                ([4, 5] if nh else []) + ([6, 7] if nv0 else []) + \
                ([8, 9, 10, 11] if nv12 else [])
            n_st = len(st_active)

            def st_put(chain, d, st):
                for si, ti in enumerate(st_active):
                    st_scr[pl.ds(((chain * AFF_D_MAX + d) * n_st + si)
                                 * SRr, SRr), :] = st[ti]

            def st_get(chain, d):
                zero8 = jnp.zeros((SRr, 128), jnp.int32)
                out = [zero8] * 12
                for si, ti in enumerate(st_active):
                    out[ti] = st_scr[
                        pl.ds(((chain * AFF_D_MAX + d) * n_st + si)
                              * SRr, SRr), :]
                return tuple(out)

            def a_dma(gsb, slot, what):
                cp = pltpu.make_async_copy(
                    pack_a_hbm.at[pl.ds(gsb * (M8 * sbp), M8 * sbp)],
                    pack_a_scr.at[slot], asem.at[slot])
                cp.start() if what == "start" else cp.wait()

            w_iota_u = jax.lax.broadcasted_iota(
                jnp.int32, (wrows, sbp * RB), 0)
            lane_iota_u = jax.lax.broadcasted_iota(
                jnp.int32, (128, sbp * RB), 0)

            def aff_w_of(wid):
                """Live-weight lookup for a (SRr, 128) wid slab: the
                general path's two-step one-hot gather, ONE unit-wide
                MXU contraction instead of per-block dots (each output
                element is the same wrows-deep contraction — values
                bit-identical; weight VALUES carry no accumulation
                order, unlike the gradient dots)."""
                wid_f = wid.reshape(1, sbp * RB)
                roh = (w_iota_u == (wid_f >> 7)).astype(jnp.float32)
                rs = jax.lax.dot_general(
                    w_out[:], roh,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                loh = lane_iota_u == (wid_f & 127)
                sel = jnp.sum(jnp.where(loh, rs, 0.0), axis=0,
                              keepdims=True)
                return sel.reshape(SRr, 128)

            def aff_learn_color(ci, carry):
                """Affine learning color: dual-chain lane-roll gathers,
                ONE shared stats pass per (chain, slot) for potentials
                (pass A) and one more at the sampled values for the
                gradient (pass B) — the general path's per-arg one-hot
                gather matmuls and per-candidate eval unrolls vanish.

                BIT-IDENTICAL to the general learn path by
                construction: same per-block (1, RB) uniform streams
                and _draw arithmetic, potentials/evals from exact int
                stats (same f32 values in the same per-slot add
                order), and gradient dot-accumulation replayed in the
                general path's (block, slot) order via the staged
                grad/inc slabs — verified by the aff-vs-forced-general
                bit test (tests/test_itemgrid_affine.py)."""
                step, epoch_i = carry
                sb_off = cmeta_ref[ci, 6]
                num_rb = cmeta_ref[ci, 1]
                row0c = cmeta_ref[ci, 2]
                d_c = cmeta_ref[ci, 4]
                amax_c = cmeta_ref[ci, 7]
                n_sb = (num_rb + sbp - 1) // sbp
                gw_scr[:] = jnp.zeros((wrows, 128), jnp.float32)
                nw_scr[:] = jnp.zeros((wrows, 128), jnp.float32)
                salt0 = epoch_i * (COLOR_MAX + 1) + ci
                a_dma(sb_off, 0, "start")

                def sb_body(s, _):
                    slot = s % 2

                    @pl.when(s + 1 < n_sb)
                    def _():
                        a_dma(sb_off + s + 1, (s + 1) % 2, "start")

                    a_dma(sb_off + s, slot, "wait")
                    pka = pack_a_scr.at[slot]

                    def read_pk(lr):
                        return pka[pl.ds(SRr * lr, SRr), :]

                    row0 = row0c + s * SRr
                    if "gather" not in ABLATE:
                        _aff_gather(av_ap, x_out, d_c * Ag,
                                    lambda j: amet_ref[ci, j],
                                    lambda c: c + s * (sbp * RB), sbp,
                                    lane_sb)
                        _aff_gather(av_ae, xe_out, d_c * Ag,
                                    lambda j: amet_ref[ci, j],
                                    lambda c: c + s * (sbp * RB), sbp,
                                    lane_sb)

                    def rd_p(j):
                        return av_ap[pl.ds(j * SRr, SRr), :]

                    def rd_e(j):
                        return av_ae[pl.ds(j * SRr, SRr), :]

                    # pass A: potentials for both chains — ONE stats
                    # pass per (chain, slot), live weights gathered
                    # once per slot and shared by the chains
                    def d_pots(d, pots4):
                        w = aff_w_of(read_pk(6 * d + 4))
                        st_p, ftype, ar = _aff_slot_stats(
                            read_pk, rd_p, d, amax_c, Ag, present, SRr)
                        st_e, _, _ = _aff_slot_stats(
                            read_pk, rd_e, d, amax_c, Ag, present, SRr)
                        st_put(0, d, st_p)
                        st_put(1, d, st_e)
                        out = []
                        for k in range(2):
                            out.append(pots4[k] + w * _aff_eval_at(
                                st_p, k, ftype, ar, present, SRr))
                        for k in range(2):
                            out.append(pots4[2 + k] + w * _aff_eval_at(
                                st_e, k, ftype, ar, present, SRr))
                        return tuple(out)

                    zf = jnp.zeros((SRr, 128), jnp.float32)
                    if "eval" in ABLATE:
                        t = av_ap[pl.ds(0, SRr), :].astype(
                            jnp.float32) * 1e-6
                        p0, p1, e0, e1 = t, -t, t, -t
                    else:
                        p0, p1, e0, e1 = jax.lax.fori_loop(
                            0, d_c, d_pots, (zf, zf, zf, zf))
                    # per-block uniform STREAMS ((1, RB) shapes, same
                    # salts, e-before-p — the general path's streams),
                    # then ONE vectorized draw per chain per unit:
                    # elementwise ops are reshape-invariant, so this is
                    # bit-identical to the general path's per-block
                    # _draw at card 2
                    if "uscr" not in ABLATE:
                        for b in range(sbp):
                            ua_scr[0, pl.ds(b * rbl, rbl), :] = uniform(
                                (salt0 * 65536 + s * sbp + b) ^
                                0x55555555, (1, RB)).reshape(rbl, 128)
                            ua_scr[1, pl.ds(b * rbl, rbl), :] = uniform(
                                salt0 * 65536 + s * sbp + b,
                                (1, RB)).reshape(rbl, 128)

                    def draw2_bit(q0, q1, u):
                        # _draw's kmax=2 arithmetic, vectorized
                        m = jnp.where(q1 > q0, q1, q0)
                        z0 = jnp.exp(q0 - m)
                        z1 = jnp.exp(q1 - m)
                        uu = u * (z0 + z1)
                        val = (z0 < uu).astype(jnp.int32) + \
                            ((z0 + z1) < uu).astype(jnp.int32)
                        return jnp.minimum(val, 1)

                    e_samp = draw2_bit(e0, e1, ua_scr[0])
                    p_samp = draw2_bit(p0, p1, ua_scr[1])
                    upd = read_pk(6 * aff_D)
                    upd_e = read_pk(6 * aff_D + 1)
                    lrn = upd if lp.learn_non_evidence else \
                        read_pk(6 * aff_D + 2)
                    x_rows = x_out[pl.ds(row0, SRr), :]
                    xe_rows = xe_out[pl.ds(row0, SRr), :]
                    p_val = jnp.where(upd == 1, p_samp, x_rows)
                    e_val = jnp.where(upd_e == 1, e_samp, xe_rows)
                    # pad rows carry upd = 0 and rewrite what they read
                    x_out[pl.ds(row0, SRr), :] = p_val
                    xe_out[pl.ds(row0, SRr), :] = e_val

                    # pass B: gradient at the sampled values, STAGED so
                    # the gw/nw accumulation replays the general path's
                    # (block, slot) add order
                    def d_grad(d, _):
                        fta = read_pk(6 * d)
                        ftype = (fta & 0xFF) - 1
                        ar = fta >> 8
                        st_p = st_get(0, d)   # staged by pass A: the
                        st_e = st_get(1, d)   # stats are candidate-free
                        ev_p = _aff_eval_at(st_p, p_val, ftype, ar,
                                            present, SRr)
                        ev_e = _aff_eval_at(st_e, e_val, ftype, ar,
                                            present, SRr)
                        fv = pltpu.bitcast(read_pk(6 * d + 5),
                                           jnp.float32)
                        inc = (lrn == 1) & (ftype != -1)
                        grad = jnp.where(inc, (ev_p - ev_e) * fv, 0.0)
                        g_scr[pl.ds(d * SRr, SRr), :] = grad
                        i_scr[pl.ds(d * SRr, SRr), :] = \
                            inc.astype(jnp.float32)
                        return 0

                    if "grad" in ABLATE:
                        return 0
                    jax.lax.fori_loop(0, d_c, d_grad, 0)
                    if "gradmm" in ABLATE:
                        return 0

                    for b in range(sbp):
                        def bd_acc(d, _, b=b):
                            g_b = g_scr[pl.ds(d * SRr + b * rbl, rbl),
                                        :].reshape(1, RB)
                            i_b = i_scr[pl.ds(d * SRr + b * rbl, rbl),
                                        :].reshape(1, RB)
                            wid_b = read_pk(6 * d + 4)[
                                b * rbl:(b + 1) * rbl, :].reshape(1, RB)
                            roh = (w_iota == (wid_b >> 7)).astype(
                                jnp.float32)
                            loh = lane_iota == (wid_b & 127)
                            both = jnp.concatenate(
                                [jnp.where(loh, g_b, 0.0),
                                 jnp.where(loh, i_b, 0.0)], axis=0)
                            gn = jax.lax.dot_general(
                                roh, both,
                                dimension_numbers=(((1,), (1,)),
                                                   ((), ())),
                                preferred_element_type=jnp.float32)
                            gw_scr[:] = gw_scr[:] + gn[:, 0:128]
                            nw_scr[:] = nw_scr[:] + gn[:, 128:256]
                            return 0

                        jax.lax.fori_loop(0, d_c, bd_acc, 0)
                    return 0

                jax.lax.fori_loop(0, n_sb, sb_body, 0)
                apply_update(gw_scr[:], nw_scr[:], step, epoch_i, ci)

        def burn_body(i, _):
            jax.lax.fori_loop(0, C, free_color, i)
            return 0

        jax.lax.fori_loop(0, burn_ref[0], burn_body, 0)

        def epoch_body(i, _):
            step = step0_ref[0] * jnp.exp(
                i.astype(jnp.float32) * jnp.log(decay_ref[0]))

            def cstep(ci, carry):
                if has_aff:
                    @pl.when(cmeta_ref[ci, 5] == 1)
                    def _():
                        aff_learn_color(ci, carry)

                    @pl.when(cmeta_ref[ci, 5] != 1)
                    def _():
                        learn_color(ci, carry)
                else:
                    learn_color(ci, carry)
                return carry

            jax.lax.fori_loop(0, C, cstep, (step, i + (1 << 16)))
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
        self._call_ext = None

    def _build_call(self, has_ext: bool = False):
        plan = self.plan
        kernel = _make_kernel(plan, sw_prng=bool(self.interpret),
                              has_ext=has_ext)
        vp, kmax = plan.vp, plan.kmax
        L = _Layout(plan.D, plan.A)
        DA = plan.D * plan.A
        has_aff = plan.packed_a is not None and plan.cmeta.size and \
            bool((plan.cmeta[:, 5] == 1).any())
        # pure-affine: the kernel runs the flat unit schedule and takes
        # the umeta SMEM table (see _make_kernel)
        flat_sched = has_aff and not bool((plan.cmeta[:, 5] == 0).any())
        M8 = (6 * plan.aff_D + 3) * 8

        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] *
            (4 + has_aff + flat_sched) +  # seed/b/e/cmeta[, amet, umeta]
            [pl.BlockSpec(memory_space=pltpu.VMEM)] *
            (3 if has_ext else 2) +                        # x, tally[, ext]
            [pl.BlockSpec(memory_space=pl.ANY)] *
            (3 if has_aff else 2)              # packed, wbase[, packed_a]
        )
        out_specs = (pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch = [pltpu.VMEM((2, L.rows, RB), jnp.int32),  # block buf x2
                   pltpu.SMEM((2, 8, _ceil(-(-(DA + 2) // 8), 128)),
                              jnp.int32),              # win bases
                   pltpu.VMEM((max(plan.A, 1), RB), jnp.int32),  # staged
                   *([pltpu.VMEM((kmax, RB), jnp.float32)]   # vec-k pots
                     if kmax >= VEC_K_MIN else []),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
        if has_aff:
            sbp = plan.sb
            scratch += [pltpu.VMEM((2, sbp * M8, 128), jnp.int32),
                        pltpu.VMEM((AFF_DA_MAX * sbp * 8, 128),
                                   jnp.int32),
                        pltpu.VMEM((sbp * 8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))]
        x_idx = 4 + has_aff + flat_sched

        @jax.jit
        def call(seed, burn, epochs, cmeta, x0, tally, packed, wbase,
                 ext=None, amet=None, packed_a=None, umeta=None):
            args = [seed, burn, epochs, cmeta]
            if has_aff:
                args.append(amet)
            if flat_sched:
                args.append(umeta)
            args += [x0, tally]
            if has_ext:
                args.append(ext)
            args += [packed, wbase]
            if has_aff:
                args.append(packed_a)
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
                input_output_aliases={x_idx: 0},   # x0 buffer IS x_out
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(*args)

        return call

    def _build_learn_call(self, lp, has_ext: bool = False):
        plan = self.plan
        vp = plan.vp
        kmax = plan.kmax
        L = _Layout(plan.D, plan.A)
        DA = plan.D * plan.A
        wrows = max(_ceil(-(-plan.n_weights // 128), 8), 8)
        if plan.n_weights > wrows * 128:
            raise ValueError("itemgrid learn: too many weights")
        kernel = _make_learn_kernel(plan, lp, wrows,
                                    sw_prng=bool(self.interpret),
                                    has_ext=has_ext)
        # mirror the kernel's own affine-learn eligibility rule
        has_aff = (not has_ext and plan.packed_a is not None
                   and plan.cmeta.size
                   and bool((plan.cmeta[:, 5] == 1).any()))
        M8 = (6 * plan.aff_D + 3) * 8
        sbp = plan.sb

        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] *
            (7 if has_aff else 6) +        # scalars+meta[, amet]
            [pl.BlockSpec(memory_space=pltpu.VMEM)] *
            (6 if has_ext else 4) +              # x0,xe0,w0,wfix[,extp,exte]
            [pl.BlockSpec(memory_space=pl.ANY)] *
            (3 if has_aff else 2)     # packed, wbase[, packed_a]
        )
        out_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in range(3))
        scratch = [pltpu.VMEM((2, L.rows, RB), jnp.int32),  # block buf x2
                   pltpu.SMEM((2, 8, _ceil(-(-(DA + 2) // 8), 128)),
                              jnp.int32),              # win bases
                   pltpu.VMEM((2 * DA, RB), jnp.int32),     # staged gathers
                   pltpu.VMEM((wrows, 128), jnp.float32),   # gw
                   pltpu.VMEM((wrows, 128), jnp.float32),   # nw
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
        if has_aff:
            scratch += [
                pltpu.VMEM((2, sbp * M8, 128), jnp.int32),  # pack_a x2
                pltpu.VMEM((AFF_DA_MAX * sbp * 8, 128),
                           jnp.int32),                  # p-chain gathers
                pltpu.VMEM((AFF_DA_MAX * sbp * 8, 128),
                           jnp.int32),                  # e-chain gathers
                pltpu.VMEM((2, sbp * 8, 128), jnp.float32),  # samples
                pltpu.VMEM((AFF_D_MAX * sbp * 8, 128),
                           jnp.float32),                # staged grads
                pltpu.VMEM((AFF_D_MAX * sbp * 8, 128),
                           jnp.float32),                # staged incs
                pltpu.VMEM((2 * AFF_D_MAX * 12 * sbp * 8, 128),
                           jnp.int32),                  # staged stats
                pltpu.SemaphoreType.DMA((2,))]

        def call(seed, burn, epochs, step0, decay, cmeta, x0, xe0, w0,
                 wfix, packed, wbase, ext_p=None, ext_e=None,
                 amet=None, packed_a=None):
            args = [seed, burn, epochs, step0, decay, cmeta]
            if has_aff:
                args.append(amet)
            args += [x0, xe0, w0, wfix]
            if has_ext:
                args += [ext_p, ext_e]
            args += [packed, wbase]
            if has_aff:
                args.append(packed_a)
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
                input_output_aliases={6 + has_aff: 0,
                                      7 + has_aff: 1},  # chains alias
                #                                         the outputs
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(*args)

        return jax.jit(call), wrows

    def _ensure_packs(self, wv: np.ndarray):
        wkey = wv.tobytes()
        if self._weights_for != wkey:
            fill_weights(self.plan, wv)
            self._packs = (jnp.asarray(self.plan.packed),
                           jnp.asarray(self.plan.wbase))
            cm = self.plan.cmeta
            if self.plan.packed_a is not None:
                # superblock-flat upload; col 6 becomes the SUPERBLOCK
                # offset (this kernel's only use of it)
                flat, sb_off = flatten_packed_a(self.plan.packed_a, cm,
                                                self.plan.aff_D,
                                                self.plan.sb)
                cm = cm.copy()
                aff = cm[:, 5] == 1
                cm[aff, 6] = sb_off[aff]
                self._amet = jnp.asarray(self.plan.amet)
                self._packed_a = jnp.asarray(flat)
                if aff.all():
                    # pure affine: the kernel's flat unit schedule
                    # [ci, s, superblock id, row0] per unit
                    sbp, rbl = self.plan.sb, RB // 128
                    um = [(ci, s_, int(cm[ci, 6]) + s_,
                           int(cm[ci, 2]) + s_ * sbp * rbl)
                          for ci in range(cm.shape[0])
                          for s_ in range(-(-int(cm[ci, 1]) // sbp))]
                    self._umeta = jnp.asarray(np.asarray(um, np.int32))
                else:
                    self._umeta = None
            else:
                self._amet = self._packed_a = self._umeta = None
            self._cmeta = jnp.asarray(cm)
            self._weights_for = wkey

    def learn(self, seed: int, burn: int, epochs: int, stepsize: float,
              decay: float = 1.0, lp=None, weight_value=None,
              x0=None, xe0=None, ext_pot=None, ext_pot_evid=None,
              return_state: bool = False):
        """In-kernel dual-chain SGD; returns learned weights (W,) f32,
        or (weights, x, xe) when ``return_state`` (both chains in
        ORIGINAL variable order — chunked/partitioned runs pass them
        back via x0/xe0 to continue the chains).

        ``ext_pot``/``ext_pot_evid``: optional (V, K) external per-value
        potentials for the free/clamped chain (incoming boundary
        messages in partitioned execution).

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
        has_ext = ext_pot is not None
        key = (lp, has_ext)
        if getattr(self, "_learn_for", None) != key:
            self._learn_call, self._wrows = self._build_learn_call(
                lp, has_ext)
            self._learn_for = key
        w0 = np.zeros((self._wrows, 128), np.float32)
        w0.reshape(-1)[:len(wv)] = wv
        wfix = np.zeros((self._wrows, 128), np.int32)
        wfix.reshape(-1)[:len(wv)] = np.asarray(self.cg.weight_fixed,
                                                np.int32)

        def chain2d(vals):
            init = plan.init_new.copy()
            if vals is not None:
                init[plan.perm] = np.asarray(vals, np.int32)
            return jnp.asarray(init.reshape(plan.vp // 128, 128))

        args = [jnp.asarray([seed], jnp.int32),
                jnp.asarray([burn], jnp.int32),
                jnp.asarray([epochs], jnp.int32),
                jnp.asarray([stepsize], jnp.float32),
                jnp.asarray([decay], jnp.float32),
                self._cmeta, chain2d(x0), chain2d(xe0),
                jnp.asarray(w0), jnp.asarray(wfix), *self._packs]
        if has_ext:
            def ext2d(ep):
                ext = np.zeros((plan.kmax, plan.vp), np.float32)
                if ep is not None:
                    ep = np.asarray(ep, np.float32)
                    K = min(plan.kmax, ep.shape[1])
                    ext[:K, plan.perm] = ep[:, :K].T
                return jnp.asarray(
                    ext.reshape(plan.kmax * plan.vp // 128, 128))
            args += [ext2d(ext_pot), ext2d(ext_pot_evid)]
        kw = {}
        if not has_ext and self._packed_a is not None:
            kw = dict(amet=self._amet, packed_a=self._packed_a)
        x_out, xe_out, w_out = self._learn_call(*args, **kw)
        w = np.asarray(w_out).reshape(-1)[:plan.n_weights]
        if not return_state:
            return w
        x = np.asarray(x_out).reshape(-1)[plan.perm]
        xe = np.asarray(xe_out).reshape(-1)[plan.perm]
        return w, x, xe

    def run(self, seed: int, burn: int, epochs: int,
            weight_value=None, x0=None, ext_pot=None, host=True):
        """Run burn + epochs sweeps; returns (values (V,), counts (V, K))
        in ORIGINAL variable order. ``host=False`` returns the raw
        device arrays in kernel (permuted) layout without transferring —
        for timing/benchmarks over a slow transport.

        ``ext_pot``: optional (V, K) external per-value potentials added
        to every variable's conditional — the receiver side of boundary
        potential messages in partitioned execution."""
        assert epochs <= 30000, \
            "int16 in-kernel tallies cap one run at 30000 epochs; " \
            "chain multiple runs (x0=previous values) for more"
        plan = self.plan
        wv = np.asarray(self.cg.weight_init if weight_value is None
                        else weight_value, np.float32)
        self._ensure_packs(wv)
        has_ext = ext_pot is not None
        if self._call is None or self._call_ext != has_ext:
            self._call = self._build_call(has_ext)
            self._call_ext = has_ext

        init = plan.init_new.copy()
        if x0 is not None:
            init[plan.perm] = np.asarray(x0, np.int32)
        x2d = jnp.asarray(init.reshape(plan.vp // 128, 128))
        t2d = jnp.asarray(plan.tally_new.reshape(plan.vp // 128, 128)
                          .astype(np.int8))
        kw = {}
        if has_ext:
            ext = np.zeros((plan.kmax, plan.vp), np.float32)
            ep = np.asarray(ext_pot, np.float32)
            K = min(plan.kmax, ep.shape[1])
            ext[:K, plan.perm] = ep[:, :K].T
            kw["ext"] = jnp.asarray(
                ext.reshape(plan.kmax * plan.vp // 128, 128))
        if self._packed_a is not None:
            kw["amet"] = self._amet
            kw["packed_a"] = self._packed_a
            if self._umeta is not None:
                kw["umeta"] = self._umeta
        x_out, cnt = self._call(
            jnp.asarray([seed], jnp.int32), jnp.asarray([burn], jnp.int32),
            jnp.asarray([epochs], jnp.int32), self._cmeta, x2d, t2d,
            *self._packs, **kw)
        if not host:
            return x_out, cnt      # device arrays, permuted layout
        x_flat = np.asarray(x_out).reshape(-1)[plan.perm]
        cnt = np.asarray(cnt).astype(np.int32).reshape(plan.kmax, plan.vp)
        counts = cnt[:, plan.perm].T.copy()            # (V, K)
        return x_flat, counts

    def marginals(self, counts: np.ndarray, epochs: int) -> np.ndarray:
        return counts.astype(np.float64) / float(max(epochs, 1))


def shard_schedule(plan: ItemGridPlan, n_g: int):
    """Split a plan into per-device packed stacks + schedules.

    Each color's row blocks divide evenly over the devices (the planner
    padded colors to n_shards*RB rows), so every device owns the same
    number of blocks per color: cmeta_mc[d] indexes the device's own
    packed stack; gmeta lists every device's (row base, block count)
    per color for the receive waits of the halo exchange. Affine
    colors additionally get per-device packed_a slices and amet rows
    shifted by the device's local-row offset (the affine constant is
    relative to the color's OWN row 0; a device's row i is color row
    dev_offset + i)."""
    C = plan.cmeta.shape[0]
    rbl = RB // 128
    cmeta_mc = np.zeros((n_g, C, 8), np.int32)
    gmeta = np.zeros((C, n_g, 2), np.int32)
    sel = [[] for _ in range(n_g)]
    sel_a = [[] for _ in range(n_g)]
    has_aff = plan.packed_a is not None
    amet_mc = (np.repeat(plan.amet[None], n_g, axis=0).copy()
               if has_aff else None)
    for ci in range(C):
        rb_off, num_rb, row0r, nt, d_c, aff, rb_off_a, amax_c = (
            int(x) for x in plan.cmeta[ci, :8])
        assert num_rb % n_g == 0, (num_rb, n_g)
        nb = num_rb // n_g
        for d in range(n_g):
            local_off = len(sel[d])
            sel[d].extend(range(rb_off + d * nb, rb_off + (d + 1) * nb))
            local_off_a = len(sel_a[d])
            if aff:
                sel_a[d].extend(range(rb_off_a + d * nb,
                                      rb_off_a + (d + 1) * nb))
                keep = plan.amet[ci] != AFF_NONE
                amet_mc[d, ci, keep] = plan.amet[ci, keep] + \
                    np.int32(d * nb * RB)
            cmeta_mc[d, ci] = (local_off, nb, row0r + d * nb * rbl, nt,
                               d_c, aff, local_off_a, amax_c)
            gmeta[ci, d] = (row0r + d * nb * rbl, nb)
    packed_mc = np.stack([plan.packed[s] for s in sel])
    wbase_mc = np.stack([plan.wbase[s] for s in sel])
    packed_a_mc = (np.stack([plan.packed_a[s] for s in sel_a])
                   if has_aff else None)
    return packed_mc, wbase_mc, cmeta_mc, gmeta, packed_a_mc, amet_mc


class MultiChipItemGridEngine:
    """Graph-sharded itemgrid inference over a 1-D device mesh.

    Each device owns an equal share of every color's row blocks; after
    updating its blocks for a color it broadcasts them to every peer
    over the interconnect and waits for theirs (see _exchange_color) —
    exact synchronous chromatic Gibbs at any device count, with the
    fused kernel's epoch loop (and the exchange) entirely on-device.
    Scales compute and item-table HBM over devices; the value array is
    replicated in each device's VMEM (capacity scaling beyond VMEM is
    the HBM-resident engine's job).

    Reference analog: the salt master/minion per-epoch variable shipping
    (salt/src/messages.py:1253-1319), made per-color, on-chip, and
    exact. Raises ValueError when the graph is outside the kernel
    envelope.
    """

    def __init__(self, cg: CompiledGraph, devices=None,
                 sample_evidence: bool = True, interpret: bool = False):
        devices = list(devices if devices is not None else jax.devices())
        self.n_g = len(devices)
        plan, reason = plan_item_grid(cg, sample_evidence,
                                      n_shards=self.n_g)
        if plan is None:
            raise ValueError("itemgrid kernel unsupported: " + reason)
        self.cg = cg
        self.plan = plan
        self.interpret = interpret
        self.mesh = jax.sharding.Mesh(np.asarray(devices), ("graph",))
        self._weights_for = None
        self._call = None

    def _build_call(self):
        plan = self.plan
        n_g = self.n_g
        kernel = _make_kernel(plan, sw_prng=bool(self.interpret),
                              n_shards=n_g, mc_layout=True)
        L = _Layout(plan.D, plan.A)
        DA = plan.D * plan.A
        vp, kmax = plan.vp, plan.kmax
        has_aff = plan.packed_a is not None and plan.cmeta.size and \
            bool((plan.cmeta[:, 5] == 1).any())
        M8 = (6 * plan.aff_D + 3) * 8

        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] *
            (7 if has_aff else 6) +        # scalars+meta[, amet]
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 +  # x, tally
            [pl.BlockSpec(memory_space=pl.ANY)] *
            (3 if has_aff else 2)          # packed, wbase[, packed_a]
        )
        out_specs = (pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch = [pltpu.VMEM((2, L.rows, RB), jnp.int32),
                   pltpu.SMEM((2, 8, _ceil(-(-(DA + 2) // 8), 128)),
                              jnp.int32),
                   pltpu.VMEM((max(plan.A, 1), RB), jnp.int32),
                   *([pltpu.VMEM((kmax, RB), jnp.float32)]   # vec-k
                     if kmax >= VEC_K_MIN else []),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA(()),       # send sem
                   pltpu.SemaphoreType.DMA((n_g,))]   # per-peer recv
        if has_aff:
            sbp = plan.sb
            scratch += [pltpu.VMEM((2, sbp * M8, 128), jnp.int32),
                        pltpu.VMEM((AFF_DA_MAX * sbp * 8, 128),
                                   jnp.int32),
                        pltpu.VMEM((sbp * 8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))]
        x_idx = 7 if has_aff else 6

        def dev_fn(seed, burn, epochs, cmeta_d, gmeta, x0, tally,
                   packed_d, wbase_d, amet_d=None, packed_a_d=None):
            myid = jax.lax.axis_index("graph").astype(jnp.int32).reshape(
                (1,))
            args = [seed, burn, epochs, myid, cmeta_d[0], gmeta]
            if has_aff:
                args.append(amet_d[0])
            args += [x0, tally, packed_d[0], wbase_d[0]]
            if has_aff:
                args.append(packed_a_d[0])
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
                    has_side_effects=True, collective_id=13,
                    vmem_limit_bytes=127 * 1024 * 1024),
                input_output_aliases={x_idx: 0},   # x0 buffer IS x_out
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(*args)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        G = "graph"
        in_sp = [P(), P(), P(), P(G), P(), P(), P(), P(G), P(G)]
        if has_aff:
            in_sp += [P(G), P(G)]
        sm = shard_map(
            dev_fn, mesh=self.mesh,
            in_specs=tuple(in_sp),
            out_specs=(P(), P()), check_vma=False)
        return jax.jit(sm)

    def _ensure_packs(self, wv: np.ndarray):
        wkey = wv.tobytes()
        if self._weights_for != wkey:
            fill_weights(self.plan, wv)
            (packed_mc, wbase_mc, cmeta_mc, gmeta, packed_a_mc,
             amet_mc) = shard_schedule(self.plan, self.n_g)
            self._packs = (jnp.asarray(packed_mc), jnp.asarray(wbase_mc))
            self._gmeta = jnp.asarray(gmeta)
            if packed_a_mc is not None:
                flats = []
                for d in range(self.n_g):
                    flat, sb_off = flatten_packed_a(
                        packed_a_mc[d], cmeta_mc[d], self.plan.aff_D,
                        self.plan.sb)
                    aff = cmeta_mc[d, :, 5] == 1
                    cmeta_mc[d, aff, 6] = sb_off[aff]
                    flats.append(flat)
                self._packed_a_mc = jnp.asarray(np.stack(flats))
                self._amet_mc = jnp.asarray(amet_mc)
            else:
                self._packed_a_mc = self._amet_mc = None
            self._cmeta_mc = jnp.asarray(cmeta_mc)
            self._weights_for = wkey

    def _build_learn_call(self, lp):
        plan = self.plan
        n_g = self.n_g
        wrows = max(_ceil(-(-plan.n_weights // 128), 8), 8)
        kernel = _make_learn_kernel(plan, lp, wrows,
                                    sw_prng=bool(self.interpret),
                                    n_shards=n_g)
        L = _Layout(plan.D, plan.A)
        DA = plan.D * plan.A
        vp, kmax = plan.vp, plan.kmax

        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 8 +
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 +
            [pl.BlockSpec(memory_space=pl.ANY)] * 2
        )
        out_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in range(3))
        scratch = [pltpu.VMEM((2, L.rows, RB), jnp.int32),
                   pltpu.SMEM((2, 8, _ceil(-(-(DA + 2) // 8), 128)),
                              jnp.int32),
                   pltpu.VMEM((2 * DA, RB), jnp.int32),
                   pltpu.VMEM((wrows, 128), jnp.float32),
                   pltpu.VMEM((wrows, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA(()),        # chain send
                   pltpu.SemaphoreType.DMA((n_g,)),    # chain recv
                   pltpu.VMEM((n_g * 2 * wrows, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA(()),        # grad send
                   pltpu.SemaphoreType.DMA((n_g,))]    # grad recv

        def dev_fn(seed, burn, epochs, step0, decay, cmeta_d, gmeta,
                   x0, xe0, w0, wfix, packed_d, wbase_d):
            myid = jax.lax.axis_index("graph").astype(
                jnp.int32).reshape((1,))
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
                    has_side_effects=True, collective_id=13,
                    vmem_limit_bytes=127 * 1024 * 1024),
                input_output_aliases={8: 0, 9: 1},
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(seed, burn, epochs, step0, decay, myid, cmeta_d[0],
              gmeta, x0, xe0, w0, wfix, packed_d[0], wbase_d[0])

        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        G = "graph"
        sm = shard_map(
            dev_fn, mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P(), P(G), P(), P(), P(),
                      P(), P(), P(G), P(G)),
            out_specs=(P(), P(), P()), check_vma=False)
        return jax.jit(sm), wrows

    def learn(self, seed: int, burn: int, epochs: int, stepsize: float,
              decay: float = 1.0, lp=None, weight_value=None,
              x0=None, xe0=None, return_state: bool = False):
        """Graph-sharded dual-chain SGD with the fused kernel: per-color
        halo exchange of BOTH chains plus a fixed-order in-kernel
        gradient all-reduce, so every device applies bit-identical
        weight updates (reference: per-epoch minion dw summed at the
        master, numbskull_master.py:174-233 — here per-color, exact,
        on-interconnect). Returns weights (or (w, x, xe) with
        ``return_state``), like PallasItemGridEngine.learn."""
        from numbskull_tpu.ops.gibbs import LearnParams
        lp = lp or LearnParams()
        if lp.regularization == 1 and self.n_g > 1 and \
                not self.interpret:
            raise ValueError(
                "L1 truncation draws cannot be shared across hardware "
                "PRNGs; use L2/none or single-shard learning")
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

        def chain2d(vals):
            init = plan.init_new.copy()
            if vals is not None:
                init[plan.perm] = np.asarray(vals, np.int32)
            return jnp.asarray(init.reshape(plan.vp // 128, 128))

        x_out, xe_out, w_out = self._learn_call(
            jnp.asarray([seed], jnp.int32),
            jnp.asarray([burn], jnp.int32),
            jnp.asarray([epochs], jnp.int32),
            jnp.asarray([stepsize], jnp.float32),
            jnp.asarray([decay], jnp.float32),
            self._cmeta_mc, self._gmeta, chain2d(x0), chain2d(xe0),
            jnp.asarray(w0), jnp.asarray(wfix), *self._packs)
        w = np.asarray(w_out).reshape(-1)[:plan.n_weights]
        if not return_state:
            return w
        x = np.asarray(x_out).reshape(-1)[plan.perm]
        xe = np.asarray(xe_out).reshape(-1)[plan.perm]
        return w, x, xe

    def _build_color_call(self):
        """Single-device one-color kernel for the sequential emulation
        (see run_emulated)."""
        plan = self.plan
        n_g = self.n_g
        kernel = _make_kernel(plan, sw_prng=True, n_shards=n_g,
                              one_color=True)
        L = _Layout(plan.D, plan.A)
        DA = plan.D * plan.A
        vp = plan.vp
        has_aff = plan.packed_a is not None and plan.cmeta.size and \
            bool((plan.cmeta[:, 5] == 1).any())
        M8 = (6 * plan.aff_D + 3) * 8

        n_scal = (5 if n_g > 1 else 4) + (1 if has_aff else 0)
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] *
            n_scal +                  # seed/ep/ci[/myid]/cmeta[, amet]
            [pl.BlockSpec(memory_space=pltpu.VMEM)] +          # x
            [pl.BlockSpec(memory_space=pl.ANY)] *
            (3 if has_aff else 2)     # packed, wbase[, packed_a]
        )
        scratch = [pltpu.VMEM((2, L.rows, RB), jnp.int32),
                   pltpu.SMEM((2, 8, _ceil(-(-(DA + 2) // 8), 128)),
                              jnp.int32),
                   pltpu.VMEM((max(plan.A, 1), RB), jnp.int32),
                   *([pltpu.VMEM((plan.kmax, RB), jnp.float32)]  # vec-k
                     if plan.kmax >= VEC_K_MIN else []),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
        if has_aff:
            sbp = plan.sb
            scratch += [pltpu.VMEM((2, sbp * M8, 128), jnp.int32),
                        pltpu.VMEM((AFF_DA_MAX * sbp * 8, 128),
                                   jnp.int32),
                        pltpu.VMEM((sbp * 8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))]
        x_idx = n_scal

        @jax.jit
        def call(seed, ep, ci, myid, cmeta_d, x0, packed_d, wbase_d,
                 amet_d=None, packed_a_d=None):
            # n_g == 1 builds the non-MC signature (no device id)
            args = [seed, ep, ci, myid, cmeta_d] if n_g > 1 else \
                [seed, ep, ci, cmeta_d]
            if has_aff:
                args.append(amet_d)
            args += [x0, packed_d, wbase_d]
            if has_aff:
                args.append(packed_a_d)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((vp // 128, 128),
                                               jnp.int32),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    vmem_limit_bytes=127 * 1024 * 1024),
                input_output_aliases={x_idx: 0},
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(*args)

        return call, has_aff

    def run_emulated(self, seed: int, burn: int, epochs: int,
                     weight_value=None, x0=None):
        """Execute the multi-chip schedule END-TO-END, sequentially: one
        single-device pallas call per (epoch, color, device), each
        running exactly the MC kernel's per-device color step (same
        packed shards, same cmeta, same per-device software-PRNG salt
        streams) on a shared value array that plays the role of the
        halo exchange. Within a color no factor touches a same-color
        variable (the coloring invariant, globally across devices), so
        this sequential interleaving computes bit-exactly what the
        concurrent kernel + per-color exchange computes with the same
        draws. Tallies are accumulated host-side per epoch.

        Verified BIT-EQUAL to the concurrent kernel's run() on 2
        simulated interpret devices (tests/test_itemgrid_mc.py::
        test_mc_concurrent_bit_equal_to_emulated); kept as a debugging
        oracle for pod runs. NOTE: concurrent interpret runs need
        synchronous CPU dispatch (jax_cpu_enable_async_dispatch=False)
        — with async dispatch the interpreter's io_callbacks can block
        materializing operands whose producing computation is queued
        behind them. Returns (values (V,), counts (V, K)) like run()."""
        plan = self.plan
        wv = np.asarray(self.cg.weight_init if weight_value is None
                        else weight_value, np.float32)
        self._ensure_packs(wv)
        if getattr(self, "_color_call", None) is None:
            self._color_call, self._cc_has_aff = self._build_color_call()
        init = plan.init_new.copy()
        if x0 is not None:
            init[plan.perm] = np.asarray(x0, np.int32)
        x2d = jnp.asarray(init.reshape(plan.vp // 128, 128))
        tally = plan.tally_new.astype(np.int64)
        counts = np.zeros((plan.kmax, plan.vp), np.int64)
        C = plan.cmeta.shape[0]
        s1 = jnp.asarray([seed], jnp.int32)
        for ep in range(burn + epochs):
            epj = jnp.asarray([ep], jnp.int32)
            for ci in range(C):
                cij = jnp.asarray([ci], jnp.int32)
                for d in range(self.n_g):
                    extra = ()
                    if self._cc_has_aff:
                        extra = (self._amet_mc[d], self._packed_a_mc[d])
                    x2d = self._color_call(
                        s1, epj, cij, jnp.asarray([d], jnp.int32),
                        self._cmeta_mc[d], x2d, self._packs[0][d],
                        self._packs[1][d], *extra)
            if ep >= burn:
                xf = np.asarray(x2d).reshape(-1)
                for k in range(plan.kmax):
                    counts[k] += (xf == k) * tally
        x_flat = np.asarray(x2d).reshape(-1)[plan.perm]
        return x_flat, counts[:, plan.perm].T.copy()

    def run(self, seed: int, burn: int, epochs: int,
            weight_value=None, x0=None):
        """Run burn + epochs sharded sweeps; returns (values (V,),
        counts (V, K)) in ORIGINAL variable order."""
        assert epochs <= 30000
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
        extra = []
        if self._packed_a_mc is not None:
            extra = [self._amet_mc, self._packed_a_mc]
        x_out, cnt = self._call(
            jnp.asarray([seed], jnp.int32), jnp.asarray([burn], jnp.int32),
            jnp.asarray([epochs], jnp.int32), self._cmeta_mc, self._gmeta,
            x2d, t2d, *self._packs, *extra)
        x_flat = np.asarray(x_out).reshape(-1)[plan.perm]
        cnt = np.asarray(cnt).astype(np.int32).reshape(plan.kmax, plan.vp)
        return x_flat, cnt[:, plan.perm].T.copy()

    def marginals(self, counts: np.ndarray, epochs: int) -> np.ndarray:
        return counts.astype(np.float64) / float(max(epochs, 1))


V_HBM_MAX = 256 << 20    # HBM-resident mode variable cap (values 4B +
#                          int16 tallies live in HBM; VMEM holds only
#                          per-block slabs)
SR_MAX = 1024            # max value-slab rows per block (128K values)
SBASE_TBL_MAX = 32768    # max row blocks for the SMEM slab-base table
HG = 8                   # blocks per HBM stream group: the general
#                          path fetches item tables, window bases, the
#                          value slab, and own rows for HG consecutive
#                          blocks in ONE DMA set each (the per-block
#                          version issued ~5 DMA round trips per 1024
#                          vars and ran issue-latency-bound at ~1e8
#                          updates/s on the 33.5M-var lattice)


def _make_kernel_hbm(plan: ItemGridPlan, sr: int, sr2: int,
                     sw_prng: bool = False, allow_aff: bool = True):
    """HBM-resident inference kernel: the value array and tallies live
    in HBM; the general path streams item tables, window bases, a value
    slab (``sr2`` rows, planner-computed per GROUP), and own rows for
    HG consecutive blocks per DMA set, double-buffered, computes the
    group, and stores its rows back in one burst (the engine plans with
    n_shards=HG so every color is a whole number of groups).
    Chromatic independence makes the store-back race-free within a
    color (windows never contain same-color rows); store completions
    are awaited at each color end so the next color's slab reads see
    them. Tallies stream chunk-wise at each epoch end.

    This removes the VMEM residency cap: 33M+ variables on one chip
    (BASELINE config 5's scale), bounded by HBM instead.
    """
    vp = plan.vp
    kmax = plan.kmax
    vpr = vp // 128
    trw = plan.trw
    L = _Layout(plan.D, plan.A)
    Ag = plan.A
    DA = plan.D * plan.A
    C = plan.cmeta.shape[0]
    present = plan.present
    rbl = RB // 128
    single_tile = int(plan.cmeta[:, 3].max()) <= 1 if plan.cmeta.size \
        else True
    unroll_d = plan.D <= 8
    unroll_a = plan.A <= 8
    Wb = _ceil(-(-(DA + 2) // 8), 128)
    TCH = 512               # tally stream chunk rows
    # per-block slab bases ride an SMEM table when it fits the scalar
    # memory budget (<= 32768 blocks = 33.5M vars = 128 KB); beyond
    # that the base is read from the streamed window-base block (one
    # extra DMA round trip per block, as before round 3)
    use_tbl = plan.wbase.shape[0] <= SBASE_TBL_MAX
    has_aff = allow_aff and plan.packed_a is not None and \
        plan.cmeta.size and bool((plan.cmeta[:, 5] == 1).any())
    has_old = (not has_aff) or bool((plan.cmeta[:, 5] == 0).any())
    aff_D = plan.aff_D
    M8 = (6 * aff_D + 3) * 8

    n_full = vpr // TCH
    tail = vpr % TCH          # static; vpr is a multiple of 16
    zn_full = (kmax * vpr) // TCH
    ztail = (kmax * vpr) % TCH

    def kernel(*refs):
        refs = list(refs)
        (seed_ref, burn_ref, epochs_ref, cmeta_ref, sbase_ref,
         gbase_ref) = refs[:6]
        refs = refs[6:]
        amet_ref = refs.pop(0) if has_aff else None
        (tally_hbm, pack_hbm, wb_hbm) = refs[:3]
        refs = refs[3:]
        pack_a_hbm = refs.pop(0) if has_aff else None
        (x_in_hbm, x_hbm, count_hbm,
         pack_scr, wb_scr, av_scr, slab_scr, row_scr, cnt_scr,
         tly_scr, xch_scr, sem, wsem, ssem, stsem, rdsem,
         csem) = refs[:17]
        refs = refs[17:]
        if has_aff:
            pack_a_scr, av_a, asem = refs[:3]
        # x_in_hbm is ALIASED to x_hbm (same buffer); all access goes
        # through the output ref
        del x_in_hbm
        pltpu.prng_seed(seed_ref[0])
        uniform = _make_uniform(sw_prng, seed_ref[0] * 977)

        # zero the HBM tallies chunk by chunk through a VMEM buffer
        cnt_scr[...] = jnp.zeros((TCH, 128), jnp.int16)

        def zput(r0, n):
            pltpu.make_async_copy(
                cnt_scr.at[pl.ds(0, n)],
                count_hbm.at[pl.ds(r0, n)], csem).start()
            pltpu.make_async_copy(
                cnt_scr.at[pl.ds(0, n)],
                count_hbm.at[pl.ds(r0, n)], csem).wait()

        def zbody(s, _):
            zput(s * TCH, TCH)
            return 0

        jax.lax.fori_loop(0, zn_full, zbody, 0)
        if ztail:
            zput(zn_full * TCH, ztail)

        burn = burn_ref[0]
        total = burn + epochs_ref[0]
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (trw, RB), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, RB), 0)

        def grp_dma(g0, slot, what):
            # item tables + window bases for HG consecutive blocks
            if "dma" in ABLATE:
                return
            for cp in (pltpu.make_async_copy(pack_hbm.at[pl.ds(g0, HG)],
                                             pack_scr.at[slot],
                                             sem.at[slot]),
                       pltpu.make_async_copy(wb_hbm.at[pl.ds(g0, HG)],
                                             wb_scr.at[slot],
                                             wsem.at[slot])):
                cp.start() if what == "start" else cp.wait()

        def grp_slab(gid, slot, what):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(gbase_ref[gid], sr2)],
                slab_scr.at[slot], ssem.at[slot])
            cp.start() if what == "start" else cp.wait()

        # With use_tbl, slab bases come from the host-computed SMEM
        # table (already clamped to vpr - sr), so slab DMAs start
        # without waiting for the block's window-base metadata — every
        # inbound stream of block rb+1 is in flight while block rb
        # computes. Beyond the table budget the base is read from the
        # window-base block after its DMA (slab_base_of).
        def _sbase(raw):
            return jnp.minimum(raw, vpr - sr)

        def slab_base_of(slot, grb):
            if use_tbl:
                return sbase_ref[grb]
            return _sbase(_wb_view(wb_scr, (slot, 0), Wb)[DA])

        def start_slab(slot, grb):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(slab_base_of(slot, grb), sr)],
                slab_scr.at[slot, pl.ds(0, sr)],
                ssem.at[slot]).start()

        def wait_slab(slot, grb):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(slab_base_of(slot, grb), sr)],
                slab_scr.at[slot, pl.ds(0, sr)],
                ssem.at[slot]).wait()

        def row_read(row0, slot, n=rbl):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(row0, n)],
                row_scr.at[slot, pl.ds(0, n)], rdsem.at[slot])

        def row_store(row0, slot, n=rbl):
            return pltpu.make_async_copy(
                row_scr.at[slot, pl.ds(0, n)],
                x_hbm.at[pl.ds(row0, n)], stsem.at[slot])

        def old_color_body(ci, epoch_i):
            rb_off = cmeta_ref[ci, 0]
            num_rb = cmeta_ref[ci, 1]
            row0c = cmeta_ref[ci, 2]
            nt = cmeta_ref[ci, 3]
            d_c = cmeta_ref[ci, 4]
            # whole groups per color (the engine plans with
            # n_shards=HG); every DMA set covers HG blocks
            n_gr = num_rb // HG
            g_off = rb_off // HG     # rb_off is a multiple of HG
            grl = HG * rbl           # own-row rows per group

            def start_grp(g, slot):
                grp_dma(rb_off + g * HG, slot, "start")
                grp_slab(g_off + g, slot, "start")
                row_read(row0c + g * grl, slot, grl).start()

            start_grp(0, 0)

            def g_body(g, salt_base):
                slot = g % 2

                @pl.when(g + 1 < n_gr)
                def _():
                    nslot = (g + 1) % 2

                    # row_scr[nslot] still streams out group g-1's
                    # rows; finish that store before reusing the buffer
                    @pl.when(g >= 1)
                    def _():
                        row_store(row0c + (g - 1) * grl, nslot,
                                  grl).wait()

                    start_grp(g + 1, nslot)

                grp_dma(rb_off + g * HG, slot, "wait")
                grp_slab(g_off + g, slot, "wait")
                row_read(row0c + g * grl, slot, grl).wait()
                slab = slab_scr.at[slot]
                sbase = gbase_ref[g_off + g]

                def gat(base_r, off):
                    # clamp: all-pad blocks carry per-slot window base
                    # 0, below the GROUP slab base (their rows are
                    # masked; any in-slab read is fine — but a negative
                    # offset is an OOB read on hardware)
                    return _gather_tiled(slab,
                                         jnp.maximum(base_r - sbase, 0),
                                         off,
                                         None if single_tile else nt,
                                         trw, sub_iota, lane_iota)

                def b_body(b, _):
                    pk = pack_scr.at[slot, b]
                    wb = _wb_view(wb_scr, (slot, b), Wb)
                    upd = pk[L.upd:L.upd + 1, :]
                    rowmeta = pk[L.rowmeta:L.rowmeta + 1, :]
                    card = rowmeta & 0xFF
                    dense = (rowmeta >> 8) == 0

                    def d_body(d, pots):
                        if unroll_a:
                            term = _slot_decode(pk, wb, L, Ag, d, [gat])
                            return _term_pots(term, present, Ag, kmax,
                                              card, dense, 0, pots)
                        fta = pk[pl.ds(L.fta + d, 1), :]
                        ftype = (fta & 0xFF) - 1
                        ar = fta >> 8
                        w = pltpu.bitcast(pk[pl.ds(L.wbake + d, 1), :],
                                          jnp.float32)
                        dd = pk[pl.ds(L.dd + d, 1), :]
                        d1, d2 = dd & 0xFF, dd >> 8
                        _slot_gather_stage(pk, wb, L, Ag, d, gat,
                                           av_scr, 0)
                        es = _slot_eval_loop(
                            pk, L, Ag, d, av_scr, 0, present, ftype, ar,
                            [jnp.int32(k) for k in range(kmax)])
                        out = []
                        for k in range(kmax):
                            ok = ((dense & (jnp.int32(k) < card)) |
                                  ((~dense) & ((jnp.int32(k) == d1) |
                                               (jnp.int32(k) == d2))))
                            out.append(pots[k] +
                                       ok.astype(jnp.float32) * w *
                                       es[k])
                        return tuple(out)

                    pots = tuple(jnp.zeros((1, RB), jnp.float32)
                                 for _ in range(kmax))
                    if "eval" in ABLATE:
                        pots = tuple(
                            p + pk[di:di + 1, :].astype(jnp.float32) *
                            1e-6 for di, p in enumerate(pots))
                    elif unroll_d:
                        for d in range(plan.D):
                            pots = d_body(d, pots)
                    else:
                        pots = jax.lax.fori_loop(0, d_c, d_body, pots)
                    new = _draw(list(pots), card, kmax,
                                uniform(salt_base * 65536 + g * HG + b,
                                        (1, RB)))
                    old = row_scr[slot, pl.ds(b * rbl, rbl)]
                    row_scr[slot, pl.ds(b * rbl, rbl)] = jnp.where(
                        upd.reshape(rbl, 128) == 1,
                        new.reshape(rbl, 128), old)
                    return 0

                jax.lax.fori_loop(0, HG, b_body, 0)
                # async store-back of the whole group; completion is
                # awaited when the buffer is next reused, or at the
                # color-end drain
                row_store(row0c + g * grl, slot, grl).start()
                return salt_base

            jax.lax.fori_loop(0, n_gr, g_body,
                              epoch_i * (COLOR_MAX + 1) + ci)
            # drain outbound stores so the next color's slab reads (and
            # the epoch-end tally stream) see every updated row
            row_store(row0c + (n_gr - 1) * grl,
                      (n_gr - 1) % 2, grl).wait()

            @pl.when(n_gr >= 2)
            def _():
                row_store(row0c + (n_gr - 2) * grl,
                          (n_gr - 2) % 2, grl).wait()
            return epoch_i

        # affine fast path, per block: lane-roll gathers from the value
        # slab + shared boolean stats; bit-identical to the VMEM
        # kernel's affine path (same salts, shapes, and sum order)
        if has_aff:
            lane_b = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

            def a_dma(grb, slot, what):
                cp = pltpu.make_async_copy(
                    pack_a_hbm.at[pl.ds(grb * M8, M8)],
                    pack_a_scr.at[slot], asem.at[slot])
                cp.start() if what == "start" else cp.wait()

            def wb_cp(grb, slot, what):
                cp = pltpu.make_async_copy(wb_hbm.at[grb],
                                           wb_scr.at[slot, 0],
                                           wsem.at[slot])
                cp.start() if what == "start" else cp.wait()

            def aff_color_body(ci, epoch_i):
                rb_off = cmeta_ref[ci, 0]        # wb-stack block index
                rb_off_a = cmeta_ref[ci, 6]
                num_rb = cmeta_ref[ci, 1]
                row0c = cmeta_ref[ci, 2]
                # with the SMEM slab-base table the affine path needs
                # no window-base block at all; beyond the table budget
                # the wb block is streamed just for its slab base
                a_dma(rb_off_a, 0, "start")
                if not use_tbl:
                    wb_cp(rb_off, 0, "start")
                    wb_cp(rb_off, 0, "wait")
                start_slab(0, rb_off)
                row_read(row0c, 0).start()

                def rb_body(rb, salt_base):
                    slot = rb % 2

                    @pl.when(rb + 1 < num_rb)
                    def _():
                        nslot = (rb + 1) % 2

                        @pl.when(rb >= 1)
                        def _():
                            row_store(row0c + (rb - 1) * rbl,
                                      nslot).wait()

                        a_dma(rb_off_a + rb + 1, nslot, "start")
                        if not use_tbl:
                            wb_cp(rb_off + rb + 1, nslot, "start")
                            wb_cp(rb_off + rb + 1, nslot, "wait")
                        start_slab(nslot, rb_off + rb + 1)
                        row_read(row0c + (rb + 1) * rbl, nslot).start()

                    wait_slab(slot, rb_off + rb)
                    a_dma(rb_off_a + rb, slot, "wait")
                    slab = slab_scr.at[slot]
                    sbase = slab_base_of(slot, rb_off + rb)
                    base_i = rb * RB
                    _aff_gather(av_a, slab, cmeta_ref[ci, 4] * Ag,
                                lambda j: amet_ref[ci, j],
                                lambda c: c + base_i - sbase * 128,
                                1, lane_b)
                    pka = pack_a_scr.at[slot]
                    pots = _aff_block_pots(
                        lambda lr: pka[pl.ds(8 * lr, 8), :],
                        lambda j: av_a[pl.ds(j * 8, 8), :],
                        cmeta_ref[ci, 4], cmeta_ref[ci, 7], Ag, aff_D,
                        present)
                    new = _draw2(pots[0], pots[1],
                                 uniform(salt_base * 65536 + rb,
                                         (8, 128)))
                    upd = pka[pl.ds(8 * (6 * aff_D), 8), :]
                    row0 = row0c + rb * rbl
                    row_read(row0, slot).wait()
                    old = row_scr[slot, pl.ds(0, rbl)]
                    row_scr[slot, pl.ds(0, rbl)] = \
                        jnp.where(upd == 1, new, old)
                    row_store(row0, slot).start()
                    return salt_base

                jax.lax.fori_loop(0, num_rb, rb_body, epoch_i * (COLOR_MAX + 1) + ci)
                row_store(row0c + (num_rb - 1) * rbl,
                          (num_rb - 1) % 2).wait()

                @pl.when(num_rb >= 2)
                def _():
                    row_store(row0c + (num_rb - 2) * rbl,
                              (num_rb - 2) % 2).wait()
                return epoch_i

        def color_body(ci, epoch_i):
            if has_aff and has_old:
                @pl.when(cmeta_ref[ci, 5] == 1)
                def _():
                    aff_color_body(ci, epoch_i)

                @pl.when(cmeta_ref[ci, 5] == 0)
                def _():
                    old_color_body(ci, epoch_i)
            elif has_aff:
                aff_color_body(ci, epoch_i)
            else:
                old_color_body(ci, epoch_i)
            return epoch_i

        def epoch_body(i, _):
            jax.lax.fori_loop(0, C, color_body, i)
            mult = (i >= burn).astype(jnp.int32)

            # stream tallies: x chunk + tally-mask chunk -> counts RMW
            def tchunk(r0, n):
                pltpu.make_async_copy(x_hbm.at[pl.ds(r0, n)],
                                      xch_scr.at[pl.ds(0, n)],
                                      ssem.at[0]).start()
                pltpu.make_async_copy(x_hbm.at[pl.ds(r0, n)],
                                      xch_scr.at[pl.ds(0, n)],
                                      ssem.at[0]).wait()
                pltpu.make_async_copy(tally_hbm.at[pl.ds(r0, n)],
                                      tly_scr.at[pl.ds(0, n)],
                                      stsem.at[0]).start()
                pltpu.make_async_copy(tally_hbm.at[pl.ds(r0, n)],
                                      tly_scr.at[pl.ds(0, n)],
                                      stsem.at[0]).wait()
                xs = xch_scr[pl.ds(0, n)]
                tm = tly_scr[pl.ds(0, n), :].astype(jnp.int32) * mult
                for k in range(kmax):
                    pltpu.make_async_copy(
                        count_hbm.at[pl.ds(k * vpr + r0, n)],
                        cnt_scr.at[pl.ds(0, n)], csem).start()
                    pltpu.make_async_copy(
                        count_hbm.at[pl.ds(k * vpr + r0, n)],
                        cnt_scr.at[pl.ds(0, n)], csem).wait()
                    hit = (xs == k).astype(jnp.int32) * tm
                    cnt_scr[pl.ds(0, n), :] = \
                        cnt_scr[pl.ds(0, n), :] + hit.astype(jnp.int16)
                    pltpu.make_async_copy(
                        cnt_scr.at[pl.ds(0, n)],
                        count_hbm.at[pl.ds(k * vpr + r0, n)],
                        csem).start()
                    pltpu.make_async_copy(
                        cnt_scr.at[pl.ds(0, n)],
                        count_hbm.at[pl.ds(k * vpr + r0, n)],
                        csem).wait()

            def tbody(s, _):
                tchunk(s * TCH, TCH)
                return 0

            jax.lax.fori_loop(0, n_full, tbody, 0)
            if tail:
                tchunk(n_full * TCH, tail)
            return 0

        jax.lax.fori_loop(0, total, epoch_body, 0)

    return kernel


def _make_learn_kernel_hbm(plan: ItemGridPlan, lp, wrows: int, sr: int,
                           sw_prng: bool = False):
    """HBM-resident dual-chain SGD: `_make_learn_kernel`'s exact logic
    (same PRNG streams and salts — bit-identical weights in interpret
    mode) with both chains resident in HBM and per-block value slabs
    DMA'd in like `_make_kernel_hbm`. Weights stay in VMEM (wrows, 128).

    Removes the VMEM cap on LEARNING runs: the reference's cluster
    learned at this scale (numbskull_master.py:174-233); here one chip
    learns 33M+ variables in-kernel. No affine path (its Mosaic compile
    hangs on hardware — see HbmItemGridEngine) and no ext potentials
    (partitioned learning at HBM scale composes via the BSP engines).
    """
    kmax = plan.kmax
    vp = plan.vp
    vpr = vp // 128
    trw = plan.trw
    L = _Layout(plan.D, plan.A)
    Ag = plan.A
    DA = plan.D * plan.A
    C = plan.cmeta.shape[0]
    present = plan.present
    rbl = RB // 128
    single_tile = int(plan.cmeta[:, 3].max()) <= 1 if plan.cmeta.size \
        else True
    unroll_d = plan.D <= 8
    unroll_a = plan.A <= 8
    Wb = _ceil(-(-(DA + 2) // 8), 128)
    use_tbl = plan.wbase.shape[0] <= SBASE_TBL_MAX

    def kernel(*refs):
        (seed_ref, burn_ref, epochs_ref, step0_ref, decay_ref,
         cmeta_ref, sbase_ref, w_in, wfix, pack_hbm, wb_hbm, x_in,
         xe_in, x_hbm, xe_hbm, w_out,
         pack_scr, wb_scr, gv_scr, gw_scr, nw_scr,
         slab_p_scr, slab_e_scr, row_p_scr, row_e_scr,
         sem, wsem, spsem, sesem, stpsem, stesem, rdpsem,
         rdesem) = refs
        # chains are ALIASED input->output; all access via output refs
        del x_in, xe_in
        pltpu.prng_seed(seed_ref[0])
        uniform = _make_uniform(sw_prng, seed_ref[0])
        w_out[:] = w_in[:]

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (trw, RB), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, RB), 0)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (wrows, RB), 0)

        def w_of(wid):
            return _gather(w_out[:], wid, w_iota, lane_iota)

        def start_dma(grb, slot):
            if "dma" in ABLATE:
                return
            pltpu.make_async_copy(pack_hbm.at[grb], pack_scr.at[slot],
                                  sem.at[slot]).start()
            pltpu.make_async_copy(wb_hbm.at[grb], wb_scr.at[slot],
                                  wsem.at[slot]).start()

        def wait_dma(grb, slot):
            if "dma" in ABLATE:
                return
            pltpu.make_async_copy(pack_hbm.at[grb], pack_scr.at[slot],
                                  sem.at[slot]).wait()
            pltpu.make_async_copy(wb_hbm.at[grb], wb_scr.at[slot],
                                  wsem.at[slot]).wait()

        # with use_tbl, slab bases come from the host-computed SMEM
        # table (clamped) and no window-base wait gates any inbound
        # stream; beyond the table budget they are read from the
        # streamed wb block
        def _sbase(raw):
            return jnp.minimum(raw, vpr - sr)

        def slab_base_of(slot, grb):
            if use_tbl:
                return sbase_ref[grb]
            return _sbase(_wb_view(wb_scr, slot, Wb)[DA])

        def slab_cp(hbm, scr, sems, slot, grb, what):
            cp = pltpu.make_async_copy(
                hbm.at[pl.ds(slab_base_of(slot, grb), sr)],
                scr.at[slot], sems.at[slot])
            cp.start() if what == "start" else cp.wait()

        def row_in(hbm, scr, sems, slot, row0):
            return pltpu.make_async_copy(hbm.at[pl.ds(row0, rbl)],
                                         scr.at[slot], sems.at[slot])

        def row_out(hbm, scr, sems, slot, row0):
            return pltpu.make_async_copy(scr.at[slot],
                                         hbm.at[pl.ds(row0, rbl)],
                                         sems.at[slot])

        def row_rmw(hbm, scr, insems, outsems, slot, row0, new, upd):
            """Blend updated lanes into the prefetched own rows and
            start the async store-back (awaited at buffer reuse or the
            color-end drain)."""
            row_in(hbm, scr, insems, slot, row0).wait()
            val = jnp.where(upd.reshape(rbl, 128) == 1,
                            new.reshape(rbl, 128), scr[slot])
            scr[slot] = val
            row_out(hbm, scr, outsems, slot, row0).start()
            return val.reshape(1, RB)

        def free_color(ci, epoch_i):
            """Burn-in color step of the free chain with live weights."""
            rb_off = cmeta_ref[ci, 0]
            num_rb = cmeta_ref[ci, 1]
            row0c = cmeta_ref[ci, 2]
            nt = cmeta_ref[ci, 3]
            d_c = cmeta_ref[ci, 4]
            start_dma(rb_off, 0)
            if not use_tbl:
                wait_dma(rb_off, 0)
            slab_cp(x_hbm, slab_p_scr, spsem, 0, rb_off, "start")
            row_in(x_hbm, row_p_scr, rdpsem, 0, row0c).start()

            def rb_body(rb, salt_base):
                slot = rb % 2

                @pl.when(rb + 1 < num_rb)
                def _():
                    nslot = (rb + 1) % 2

                    @pl.when(rb >= 1)
                    def _():
                        row_out(x_hbm, row_p_scr, stpsem, nslot,
                                row0c + (rb - 1) * rbl).wait()

                    start_dma(rb_off + rb + 1, nslot)
                    if not use_tbl:
                        wait_dma(rb_off + rb + 1, nslot)
                    slab_cp(x_hbm, slab_p_scr, spsem, nslot,
                            rb_off + rb + 1, "start")
                    row_in(x_hbm, row_p_scr, rdpsem, nslot,
                           row0c + (rb + 1) * rbl).start()

                if use_tbl:
                    wait_dma(rb_off + rb, slot)
                slab_cp(x_hbm, slab_p_scr, spsem, slot, rb_off + rb,
                        "wait")
                pk = pack_scr.at[slot]
                wb = _wb_view(wb_scr, slot, Wb)
                slab = slab_p_scr.at[slot]
                sbase = slab_base_of(slot, rb_off + rb)

                def gat(base_r, off):
                    return _gather_tiled(slab, base_r - sbase, off,
                                         None if single_tile else nt,
                                         trw, sub_iota, lane_iota)

                upd = pk[L.upd:L.upd + 1, :]
                rowmeta = pk[L.rowmeta:L.rowmeta + 1, :]
                card = rowmeta & 0xFF
                dense = (rowmeta >> 8) == 0

                def d_body(d, pots):
                    if unroll_a:
                        term = _slot_decode(pk, wb, L, Ag, d, [gat],
                                            w_of)
                        return _term_pots(term, present, Ag, kmax, card,
                                          dense, 0, pots)
                    fta = pk[pl.ds(L.fta + d, 1), :]
                    ftype = (fta & 0xFF) - 1
                    ar = fta >> 8
                    w = w_of(pk[pl.ds(L.wid + d, 1), :])
                    dd = pk[pl.ds(L.dd + d, 1), :]
                    d1, d2 = dd & 0xFF, dd >> 8
                    _slot_gather_stage(pk, wb, L, Ag, d, gat, gv_scr, 0)
                    es = _slot_eval_loop(
                        pk, L, Ag, d, gv_scr, 0, present, ftype, ar,
                        [jnp.int32(k) for k in range(kmax)])
                    out = []
                    for k in range(kmax):
                        ok = ((dense & (jnp.int32(k) < card)) |
                              ((~dense) & ((jnp.int32(k) == d1) |
                                           (jnp.int32(k) == d2))))
                        out.append(pots[k] +
                                   ok.astype(jnp.float32) * w * es[k])
                    return tuple(out)

                pots = tuple(jnp.zeros((1, RB), jnp.float32)
                             for _ in range(kmax))
                if "eval" in ABLATE:
                    pots = tuple(
                        p + pk[di:di + 1, :].astype(jnp.float32) * 1e-6
                        for di, p in enumerate(pots))
                elif unroll_d:
                    for d in range(plan.D):
                        pots = d_body(d, pots)
                else:
                    pots = jax.lax.fori_loop(0, d_c, d_body, pots)
                new = _draw(list(pots), card, kmax,
                            uniform((salt_base * 65536 + rb) ^
                                    0x40000000, (1, RB)))
                row_rmw(x_hbm, row_p_scr, rdpsem, stpsem, slot,
                        row0c + rb * rbl, new, upd)
                return salt_base

            jax.lax.fori_loop(0, num_rb, rb_body, epoch_i * (COLOR_MAX + 1) + ci)
            row_out(x_hbm, row_p_scr, stpsem, (num_rb - 1) % 2,
                    row0c + (num_rb - 1) * rbl).wait()

            @pl.when(num_rb >= 2)
            def _():
                row_out(x_hbm, row_p_scr, stpsem, (num_rb - 2) % 2,
                        row0c + (num_rb - 2) * rbl).wait()
            return epoch_i

        def learn_color(ci, carry):
            step, epoch_i = carry
            rb_off = cmeta_ref[ci, 0]
            num_rb = cmeta_ref[ci, 1]
            row0c = cmeta_ref[ci, 2]
            nt = cmeta_ref[ci, 3]
            d_c = cmeta_ref[ci, 4]
            gw_scr[:] = jnp.zeros((wrows, 128), jnp.float32)
            nw_scr[:] = jnp.zeros((wrows, 128), jnp.float32)
            start_dma(rb_off, 0)
            if not use_tbl:
                wait_dma(rb_off, 0)
            slab_cp(x_hbm, slab_p_scr, spsem, 0, rb_off, "start")
            slab_cp(xe_hbm, slab_e_scr, sesem, 0, rb_off, "start")
            row_in(x_hbm, row_p_scr, rdpsem, 0, row0c).start()
            row_in(xe_hbm, row_e_scr, rdesem, 0, row0c).start()

            def rb_body(rb, salt_base):
                slot = rb % 2

                @pl.when(rb + 1 < num_rb)
                def _():
                    nslot = (rb + 1) % 2

                    @pl.when(rb >= 1)
                    def _():
                        prow0 = row0c + (rb - 1) * rbl
                        row_out(x_hbm, row_p_scr, stpsem, nslot,
                                prow0).wait()
                        row_out(xe_hbm, row_e_scr, stesem, nslot,
                                prow0).wait()

                    start_dma(rb_off + rb + 1, nslot)
                    if not use_tbl:
                        wait_dma(rb_off + rb + 1, nslot)
                    slab_cp(x_hbm, slab_p_scr, spsem, nslot,
                            rb_off + rb + 1, "start")
                    slab_cp(xe_hbm, slab_e_scr, sesem, nslot,
                            rb_off + rb + 1, "start")
                    nrow0 = row0c + (rb + 1) * rbl
                    row_in(x_hbm, row_p_scr, rdpsem, nslot,
                           nrow0).start()
                    row_in(xe_hbm, row_e_scr, rdesem, nslot,
                           nrow0).start()

                if use_tbl:
                    wait_dma(rb_off + rb, slot)
                slab_cp(x_hbm, slab_p_scr, spsem, slot, rb_off + rb,
                        "wait")
                slab_cp(xe_hbm, slab_e_scr, sesem, slot, rb_off + rb,
                        "wait")
                pk = pack_scr.at[slot]
                wb = _wb_view(wb_scr, slot, Wb)
                sbase = slab_base_of(slot, rb_off + rb)
                slab_p = slab_p_scr.at[slot]
                slab_e = slab_e_scr.at[slot]

                def gat_p(base_r, off):
                    return _gather_tiled(slab_p, base_r - sbase, off,
                                         None if single_tile else nt,
                                         trw, sub_iota, lane_iota)

                def gat_e(base_r, off):
                    return _gather_tiled(slab_e, base_r - sbase, off,
                                         None if single_tile else nt,
                                         trw, sub_iota, lane_iota)

                upd = pk[L.upd:L.upd + 1, :]
                upd_e = pk[L.upd_e:L.upd_e + 1, :]
                lrn_ev = pk[L.lrn:L.lrn + 1, :]
                rowmeta = pk[L.rowmeta:L.rowmeta + 1, :]
                card = rowmeta & 0xFF
                dense = (rowmeta >> 8) == 0
                lrn = upd if lp.learn_non_evidence else lrn_ev

                # pass 1: gather (staged to scratch) + potentials
                def d_pots(d, pots2):
                    pots_p, pots_e = pots2
                    if unroll_a:
                        term = _slot_decode(pk, wb, L, Ag, d,
                                            [gat_p, gat_e], w_of)
                        for a in range(Ag):
                            gv_scr[pl.ds(d * Ag + a, 1), :] = \
                                term["gat"][0][a]
                            gv_scr[pl.ds(DA + d * Ag + a, 1), :] = \
                                term["gat"][1][a]
                        pots_p = _term_pots(term, present, Ag, kmax,
                                            card, dense, 0, pots_p)
                        pots_e = _term_pots(term, present, Ag, kmax,
                                            card, dense, 1, pots_e)
                        return (pots_p, pots_e)
                    fta = pk[pl.ds(L.fta + d, 1), :]
                    ftype = (fta & 0xFF) - 1
                    ar = fta >> 8
                    w = w_of(pk[pl.ds(L.wid + d, 1), :])
                    dd = pk[pl.ds(L.dd + d, 1), :]
                    d1, d2 = dd & 0xFF, dd >> 8
                    _slot_gather_stage(pk, wb, L, Ag, d, gat_p, gv_scr,
                                       d * Ag)
                    _slot_gather_stage(pk, wb, L, Ag, d, gat_e, gv_scr,
                                       DA + d * Ag)
                    ks = [jnp.int32(k) for k in range(kmax)]
                    eps = _slot_eval_loop(pk, L, Ag, d, gv_scr, d * Ag,
                                          present, ftype, ar, ks)
                    ees = _slot_eval_loop(pk, L, Ag, d, gv_scr,
                                          DA + d * Ag, present, ftype,
                                          ar, ks)
                    np_, ne_ = [], []
                    for k in range(kmax):
                        ok = ((dense & (jnp.int32(k) < card)) |
                              ((~dense) & ((jnp.int32(k) == d1) |
                                           (jnp.int32(k) == d2)))
                              ).astype(jnp.float32)
                        np_.append(pots_p[k] + ok * w * eps[k])
                        ne_.append(pots_e[k] + ok * w * ees[k])
                    return (tuple(np_), tuple(ne_))

                zero = tuple(jnp.zeros((1, RB), jnp.float32)
                             for _ in range(kmax))
                if unroll_d:
                    pots2 = (zero, zero)
                    for d in range(plan.D):
                        pots2 = d_pots(d, pots2)
                    pots_p, pots_e = pots2
                else:
                    pots_p, pots_e = jax.lax.fori_loop(
                        0, d_c, d_pots, (zero, zero))
                e_samp = _draw(list(pots_e), card, kmax,
                               uniform((salt_base * 65536 + rb) ^
                                       0x55555555, (1, RB)))
                p_samp = _draw(list(pots_p), card, kmax,
                               uniform(salt_base * 65536 + rb, (1, RB)))

                row0 = row0c + rb * rbl
                p_val = row_rmw(x_hbm, row_p_scr, rdpsem, stpsem, slot,
                                row0, p_samp, upd)
                e_val = row_rmw(xe_hbm, row_e_scr, rdesem, stesem, slot,
                                row0, e_samp, upd_e)

                # pass 2: gradients from the staged gathers
                def d_grad(d, _):
                    term = _slot_decode(pk, wb, L, Ag, d, [], w_of)
                    if unroll_a:
                        gp = [gv_scr[pl.ds(d * Ag + a, 1), :]
                              for a in range(Ag)]
                        ge = [gv_scr[pl.ds(DA + d * Ag + a, 1), :]
                              for a in range(Ag)]
                        vp_ = [jnp.where(term["sub"][a], p_val, gp[a])
                               for a in range(Ag)]
                        ve_ = [jnp.where(term["sub"][a], e_val, ge[a])
                               for a in range(Ag)]
                        ev_p = _eval_all(present, term["ftype"],
                                         term["arity"], vp_,
                                         term["eqs"], term["cards"], Ag)
                        ev_e = _eval_all(present, term["ftype"],
                                         term["arity"], ve_,
                                         term["eqs"], term["cards"], Ag)
                    else:
                        ev_p = _slot_eval_loop(
                            pk, L, Ag, d, gv_scr, d * Ag, present,
                            term["ftype"], term["arity"], [p_val])[0]
                        ev_e = _slot_eval_loop(
                            pk, L, Ag, d, gv_scr, DA + d * Ag, present,
                            term["ftype"], term["arity"], [e_val])[0]
                    d1 = term["dd"] & 0xFF
                    d2 = term["dd"] >> 8
                    hit = (d1 == e_val) | (d1 == p_val) | \
                          (d2 == e_val) | (d2 == p_val)
                    inc = (lrn == 1) & (term["ftype"] != -1) & \
                        (dense | hit)
                    grad = jnp.where(inc, (ev_p - ev_e) * term["fv"],
                                     0.0)
                    if "gradmm" in ABLATE:    # profiling: keep evals,
                        gw_scr[0:1, :] = gw_scr[0:1, :] + \
                            grad.reshape(RB // 128, 128)[0:1, :]
                        return 0              # drop the matmuls
                    roh = (w_iota == (term["wid"] >> 7)).astype(
                        jnp.float32)
                    loh = lane_iota == (term["wid"] & 127)
                    # one MXU contraction for BOTH per-weight reductions
                    # (gradient sum + contribution count): the rhs
                    # stacks them on the sublane axis, and each output
                    # element is the same single-axis contraction as
                    # two separate dots — bit-identical results, half
                    # the MXU issues
                    both = jnp.concatenate(
                        [jnp.where(loh, grad, 0.0),
                         jnp.where(loh, inc.astype(jnp.float32), 0.0)],
                        axis=0)                           # (256, RB)
                    gn = jax.lax.dot_general(
                        roh, both,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    gw_scr[:] = gw_scr[:] + gn[:, 0:128]
                    nw_scr[:] = nw_scr[:] + gn[:, 128:256]
                    return 0

                if "grad" in ABLATE:          # profiling: sampling only
                    pass
                elif unroll_d:
                    for d in range(plan.D):
                        d_grad(d, 0)
                else:
                    jax.lax.fori_loop(0, d_c, d_grad, 0)
                return salt_base

            jax.lax.fori_loop(0, num_rb, rb_body, epoch_i * (COLOR_MAX + 1) + ci)
            lrow0 = row0c + (num_rb - 1) * rbl
            lslot = (num_rb - 1) % 2
            row_out(x_hbm, row_p_scr, stpsem, lslot, lrow0).wait()
            row_out(xe_hbm, row_e_scr, stesem, lslot, lrow0).wait()

            @pl.when(num_rb >= 2)
            def _():
                prow0 = row0c + (num_rb - 2) * rbl
                pslot = (num_rb - 2) % 2
                row_out(x_hbm, row_p_scr, stpsem, pslot, prow0).wait()
                row_out(xe_hbm, row_e_scr, stesem, pslot, prow0).wait()

            # apply the update (identical to _make_learn_kernel)
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
                u = uniform((epoch_i * (COLOR_MAX + 1) + ci) ^ 0x33333333,
                            (wrows, 128))
                w_new = jnp.where(u < 1.0 / lp.truncation, w_tr, w_new)
            else:
                w_new = w - step * gw
            w_out[:] = jnp.where(touched, w_new, w)

        def burn_body(i, _):
            jax.lax.fori_loop(0, C, free_color, i)
            return 0

        jax.lax.fori_loop(0, burn_ref[0], burn_body, 0)

        def epoch_body(i, _):
            step = step0_ref[0] * jnp.exp(
                i.astype(jnp.float32) * jnp.log(decay_ref[0]))

            def cstep(ci, carry):
                learn_color(ci, carry)
                return carry

            jax.lax.fori_loop(0, C, cstep, (step, i + (1 << 16)))
            return 0

        jax.lax.fori_loop(0, epochs_ref[0], epoch_body, 0)

    return kernel


class HbmItemGridEngine:
    """HBM-resident fused engine (inference + learning): the itemgrid
    kernel with the value array / chains and tallies in HBM, covering
    graphs beyond the VMEM cap (33M+ variables on one chip; BASELINE
    config 5's scale before sharding — the reference learned at this
    scale only by clustering, numbskull_master.py:174-233). Raises
    ValueError when the graph is outside the envelope (locality is
    REQUIRED: every block's windows must fit a bounded value slab — RCM
    provides this for mesh-like graphs)."""

    def __init__(self, cg: CompiledGraph, sample_evidence: bool = True,
                 interpret: bool = False, allow_aff: bool | None = None):
        # n_shards=HG pads every color to whole HG-block stream groups
        plan, reason = plan_item_grid(cg, sample_evidence,
                                      n_shards=HG, vmax=V_HBM_MAX)
        if plan is None:
            raise ValueError("itemgrid kernel unsupported: " + reason)
        if plan.kmax > 32:
            # the HBM kernel's candidate loops are still unrolled in
            # kmax (the VMEM kernel's vec-k path is not ported here);
            # beyond 32 the Mosaic compile is pathological
            raise ValueError("HBM itemgrid caps cardinality at 32 "
                             "(got %d)" % plan.kmax)
        DA = plan.D * plan.A
        wbf = plan.wbase.reshape(plan.wbase.shape[0], -1)
        sr = int(wbf[:, DA + 1].max()) if plan.wbase.size else 8
        sr = max(_ceil(sr, 8), 8)
        # (the tally stream has its own chunk buffer; the slab stays as
        # small as the widest block window — r4: sr was forced to 512
        # by tally/slab buffer sharing, 4x the needed slab traffic on
        # the 33.5M lattice)
        if sr > SR_MAX:
            raise ValueError(
                "itemgrid kernel unsupported: value slab %d rows > %d "
                "(graph lacks locality for HBM-resident mode)" %
                (sr, SR_MAX))
        if plan.vp // 128 < max(sr, 512):
            raise ValueError(
                "itemgrid kernel unsupported: graph fits VMEM "
                "(%d vars) — use PallasItemGridEngine" % plan.vp)
        self.cg = cg
        self.plan = plan
        self.sr = sr
        # host-side slab-base table: per-block value-slab start rows,
        # clamped so the static slab height stays inside the array;
        # rides SMEM only within the scalar-memory budget (the kernels
        # fall back to reading the streamed wb block beyond it)
        if plan.wbase.shape[0] <= SBASE_TBL_MAX:
            DA_ = plan.D * plan.A
            self._sbase_tbl = np.minimum(
                wbf[:, DA_], plan.vp // 128 - sr).astype(np.int32)
        else:
            self._sbase_tbl = np.zeros(1, np.int32)   # never read
        # per-GROUP slab table for the general path: one slab covers
        # all HG blocks' windows (consecutive RCM blocks overlap, so
        # the union is barely wider than one block's slab)
        total_rb = plan.wbase.shape[0]
        assert total_rb % HG == 0 and \
            (plan.cmeta.size == 0 or
             (plan.cmeta[:, 1] % HG == 0).all()), "colors not grouped"
        base_b = wbf[:, DA].astype(np.int64)
        end_b = base_b + wbf[:, DA + 1]
        gb = base_b.reshape(-1, HG).min(1)
        ge = end_b.reshape(-1, HG).max(1)
        sr2 = max(_ceil(int((ge - gb).max()) if total_rb else 8, 8), 8)
        if sr2 > SR_MAX + (HG - 1) * 8:
            raise ValueError(
                "itemgrid kernel unsupported: group value slab %d rows "
                "> %d (graph lacks locality for HBM-resident mode)" %
                (sr2, SR_MAX + (HG - 1) * 8))
        self.sr2 = sr2
        self._gbase_tbl = np.minimum(
            gb, plan.vp // 128 - sr2).astype(np.int32)
        self.interpret = interpret
        # the affine fast path in the HBM kernel hangs the Mosaic
        # remote compile on real hardware (the VMEM variant compiles
        # fine; the slab-relative rolls appear to blow up the compile,
        # root cause not yet isolated — and a hung compile wedges the
        # tunneled device for hours). Interpret mode (CPU testing,
        # bit-identity vs the VMEM engine) keeps it on.
        self.allow_aff = bool(interpret) if allow_aff is None \
            else bool(allow_aff)
        self._weights_for = None
        self._call = None

    def _build_call(self):
        plan = self.plan
        kernel = _make_kernel_hbm(plan, self.sr, self.sr2,
                                  sw_prng=bool(self.interpret),
                                  allow_aff=self.allow_aff)
        vp, kmax = plan.vp, plan.kmax
        L = _Layout(plan.D, plan.A)
        DA = plan.D * plan.A
        TCH = 512
        has_aff = self.allow_aff and plan.packed_a is not None and \
            plan.cmeta.size and bool((plan.cmeta[:, 5] == 1).any())
        M8 = (6 * plan.aff_D + 3) * 8

        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] *
            (7 if has_aff else 6) +  # seed/b/e/cmeta/sbase/gbase[,amet]
            [pl.BlockSpec(memory_space=pl.ANY)] *
            (5 if has_aff else 4)       # tally/pk/wb[, pk_a]/x
        )
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
        scratch = [pltpu.VMEM((2, HG, L.rows, RB), jnp.int32),
                   pltpu.SMEM((2, HG, 8, _ceil(-(-(DA + 2) // 8), 128)),
                              jnp.int32),
                   pltpu.VMEM((max(plan.A, 1), RB), jnp.int32),
                   pltpu.VMEM((2, self.sr2, 128), jnp.int32),  # slabs
                   pltpu.VMEM((2, HG * (RB // 128), 128),
                              jnp.int32),                     # own rows
                   pltpu.VMEM((TCH, 128), jnp.int16),          # counts
                   pltpu.VMEM((TCH, 128), jnp.int8),           # tally
                   pltpu.VMEM((TCH, 128), jnp.int32),          # x chunk
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),   # row-read sem
                   pltpu.SemaphoreType.DMA(())]
        if has_aff:
            scratch += [pltpu.VMEM((2, M8, 128), jnp.int32),
                        pltpu.VMEM((AFF_DA_MAX * 8, 128),
                                   jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))]
        x_idx = 11 if has_aff else 9

        sbase_tbl = jnp.asarray(self._sbase_tbl)
        gbase_tbl = jnp.asarray(self._gbase_tbl)

        @jax.jit
        def call(seed, burn, epochs, cmeta, tally, packed, wbase, x0,
                 amet=None, packed_a=None):
            args = [seed, burn, epochs, cmeta, sbase_tbl, gbase_tbl]
            if has_aff:
                args.append(amet)
            args += [tally, packed, wbase]
            if has_aff:
                args.append(packed_a)
            args.append(x0)
            x_out, counts = pl.pallas_call(
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
                input_output_aliases={x_idx: 0},   # x0 buffer IS x_hbm
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(*args)
            return x_out, counts

        return call

    def _build_learn_call(self, lp):
        plan = self.plan
        vp = plan.vp
        L = _Layout(plan.D, plan.A)
        DA = plan.D * plan.A
        rbl = RB // 128
        wrows = max(_ceil(-(-plan.n_weights // 128), 8), 8)
        kernel = _make_learn_kernel_hbm(plan, lp, wrows, self.sr,
                                        sw_prng=bool(self.interpret))
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 7 +
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 +  # w0, wfix
            [pl.BlockSpec(memory_space=pl.ANY)] * 4     # pk/wb/x/xe
        )
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch = [pltpu.VMEM((2, L.rows, RB), jnp.int32),
                   pltpu.SMEM((2, 8, _ceil(-(-(DA + 2) // 8), 128)),
                              jnp.int32),
                   pltpu.VMEM((2 * DA, RB), jnp.int32),   # staged gathers
                   pltpu.VMEM((wrows, 128), jnp.float32),  # gw
                   pltpu.VMEM((wrows, 128), jnp.float32),  # nw
                   pltpu.VMEM((2, self.sr, 128), jnp.int32),  # x slabs
                   pltpu.VMEM((2, self.sr, 128), jnp.int32),  # xe slabs
                   pltpu.VMEM((2, rbl, 128), jnp.int32),   # own rows x
                   pltpu.VMEM((2, rbl, 128), jnp.int32),   # own rows xe
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),   # row-read x
                   pltpu.SemaphoreType.DMA((2,))]   # row-read xe

        sbase_tbl = jnp.asarray(self._sbase_tbl)

        @jax.jit
        def call(seed, burn, epochs, step0, decay, cmeta, w0, wfix,
                 packed, wbase, x0, xe0):
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
                input_output_aliases={11: 0, 12: 1},
                interpret=(pltpu.InterpretParams()
                           if self.interpret else False),
            )(seed, burn, epochs, step0, decay, cmeta, sbase_tbl, w0,
              wfix, packed, wbase, x0, xe0)

        return call, wrows

    def learn(self, seed: int, burn: int, epochs: int, stepsize: float,
              decay: float = 1.0, lp=None, weight_value=None,
              x0=None, xe0=None, return_state: bool = False):
        """In-kernel dual-chain SGD with HBM-resident chains; same
        semantics (and, in interpret mode, bit-identical weights) as
        PallasItemGridEngine.learn. No ext potentials at this scale."""
        from numbskull_tpu.ops.gibbs import LearnParams
        lp = lp or LearnParams()
        plan = self.plan
        wv = np.asarray(self.cg.weight_init if weight_value is None
                        else weight_value, np.float32)
        self._ensure_packs(wv)
        if getattr(self, "_learn_for", None) != lp:
            self._learn_call, self._wrows = self._build_learn_call(lp)
            self._learn_for = lp
        w0 = np.zeros((self._wrows, 128), np.float32)
        w0.reshape(-1)[:len(wv)] = wv
        wfix = np.zeros((self._wrows, 128), np.int32)
        wfix.reshape(-1)[:len(wv)] = np.asarray(self.cg.weight_fixed,
                                                np.int32)

        def chain2d(vals):
            init = plan.init_new.copy()
            if vals is not None:
                init[plan.perm] = np.asarray(vals, np.int32)
            return jnp.asarray(init.reshape(plan.vp // 128, 128))

        x_out, xe_out, w_out = self._learn_call(
            jnp.asarray([seed], jnp.int32),
            jnp.asarray([burn], jnp.int32),
            jnp.asarray([epochs], jnp.int32),
            jnp.asarray([stepsize], jnp.float32),
            jnp.asarray([decay], jnp.float32),
            self._cmeta, jnp.asarray(w0), jnp.asarray(wfix),
            *self._packs, chain2d(x0), chain2d(xe0))
        w = np.asarray(w_out).reshape(-1)[:plan.n_weights]
        if not return_state:
            return w
        x = np.asarray(x_out).reshape(-1)[plan.perm]
        xe = np.asarray(xe_out).reshape(-1)[plan.perm]
        return w, x, xe

    def _ensure_packs(self, wv: np.ndarray):
        wkey = wv.tobytes()
        if self._weights_for != wkey:
            fill_weights(self.plan, wv)
            self._packs = (jnp.asarray(self.plan.packed),
                           jnp.asarray(self.plan.wbase))
            self._cmeta = jnp.asarray(self.plan.cmeta)
            if self.allow_aff and self.plan.packed_a is not None:
                self._amet = jnp.asarray(self.plan.amet)
                self._packed_a = jnp.asarray(
                    self.plan.packed_a.reshape(-1, 128))
            else:
                self._amet = self._packed_a = None
            self._weights_for = wkey

    def run(self, seed: int, burn: int, epochs: int,
            weight_value=None, x0=None, host=True):
        """Run burn + epochs sweeps; returns (values (V,), counts (V, K))
        in ORIGINAL variable order. The value buffer is donated through
        the call, so the final values come back with the counts.
        ``host=False``: raw device arrays, kernel layout (for timing)."""
        assert epochs <= 30000
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
        kw = {}
        if self._packed_a is not None:
            kw = dict(amet=self._amet, packed_a=self._packed_a)
        x_out, cnt = self._call(
            jnp.asarray([seed], jnp.int32), jnp.asarray([burn], jnp.int32),
            jnp.asarray([epochs], jnp.int32), self._cmeta, t2d,
            *self._packs, x2d, **kw)
        if not host:
            return x_out, cnt
        cnt = np.asarray(cnt).astype(np.int32).reshape(plan.kmax, plan.vp)
        counts = cnt[:, plan.perm].T.copy()
        x_flat = np.asarray(x_out).reshape(-1)[plan.perm]
        return x_flat, counts

    def marginals(self, counts: np.ndarray, epochs: int) -> np.ndarray:
        return counts.astype(np.float64) / float(max(epochs, 1))
