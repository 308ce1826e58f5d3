"""Cross-engine PRNG parity: XLA-engine replay of the itemgrid kernel.

``kernel_parity_run`` executes the EXACT schedule of the fused itemgrid
kernel — same color order, same per-(epoch, color, block) software-PRNG
salt streams (_uniform_sw), same draw formulas (_draw / _draw2), same
update masks and tallies — but computes every potential through the XLA
work-item engine (ops/gibbs.color_potentials). When potential sums are
exactly representable (e.g. dyadic weights: every term and partial sum
is a float32 integer multiple of a power of two, so ANY summation order
yields the same bits), the kernel and this replay must agree BIT FOR
BIT: the strongest possible cross-validation of the kernel against the
independent engine (the reference could never do this — its hogwild
threads are non-deterministic by design, inference.py:16-18).

With non-dyadic weights the two implementations may differ in the last
ulp of a potential sum (different summation orders), which can flip a
draw whose uniform lands within that ulp of the decision boundary —
parity then degrades to the statistical agreement the other tests
check. Use dyadic weights for bit-level checks.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from numbskull_tpu.compile import CompiledGraph
from numbskull_tpu.ops.gibbs import GibbsEngine, color_potentials
from numbskull_tpu.ops.itemgrid_pallas import (
    COLOR_MAX, VEC_K_MIN, _draw, _draw2, _draw_vec, _uniform_sw,
    plan_item_grid,
)
from numbskull_tpu.types import EV_EVIDENCE, EV_QUERY


def _block_uniforms(seed977, salt_base, rb0, n_blocks, aff=False):
    """The kernel's per-block uniform stream, flattened for
    ``n_blocks`` consecutive blocks of 1024 positions.

    The AFFINE path draws (8, 128)-shaped blocks — position p hashes
    iotas (p//128, p%128) — while the general/vec path draws
    (1, RB)-shaped blocks — position p hashes iotas (0, p). The maps
    agree only for p < 128, which hid the distinction while every
    parity fixture had <= 128 variables per color (round-5 fix: a
    512-var card-64 Potts exposed it)."""
    N = n_blocks * 1024
    pos = np.arange(N)
    salt = (np.int32(salt_base) * np.int32(65536) +
            np.int32(rb0) + (pos // 1024).astype(np.int32))
    if aff:
        i0 = ((pos % 1024) // 128).astype(np.uint32)
        i1 = (pos % 128).astype(np.uint32)
    else:
        i0 = np.zeros(N, np.uint32)
        i1 = (pos % 1024).astype(np.uint32)
    # inline _uniform_sw with explicit iotas (its shape-derived iotas
    # are exactly these within each (8, 128) block)
    x = (jnp.uint32(i0) * jnp.uint32(0x9E3779B9) ^
         jnp.uint32(i1) * jnp.uint32(0x85EBCA6B) ^
         (jnp.int32(seed977).astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)) ^
         (jnp.asarray(salt).astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)))
    x = (x ^ (x >> 15)) * jnp.uint32(0x2C1B3C6D)
    x = (x ^ (x >> 12)) * jnp.uint32(0x297A2D39)
    x = x ^ (x >> 15)
    return np.asarray((x >> 8).astype(jnp.int32).astype(jnp.float32) *
                      jnp.float32(1.0 / (1 << 24)))


def kernel_parity_run(cg: CompiledGraph, seed: int, burn: int,
                      epochs: int, sample_evidence: bool = True):
    """Replay the itemgrid kernel's schedule through the XLA engine.

    Returns (values (V,), counts (V, K)) in original variable order,
    bit-comparable to ``PallasItemGridEngine(cg, interpret=True).run``.
    """
    plan, reason = plan_item_grid(cg, sample_evidence)
    assert plan is not None, reason
    eng = GibbsEngine(cg, padded=False)
    V, kmax = cg.n_vars, plan.kmax
    perm = plan.perm                       # vid -> kernel position
    x_k = plan.init_new.astype(np.int64).copy()      # kernel layout
    counts_k = np.zeros((plan.vp, kmax), np.int64)
    tally = plan.tally_new.astype(np.int64)

    isev = cg.var_isev
    upd_v = (isev == EV_QUERY) | (sample_evidence & (isev == EV_EVIDENCE))
    card_k = np.ones(plan.vp, np.int64)
    card_k[perm] = cg.var_card

    # kernel color ci -> (variables in kernel order, compile plan index)
    colors = []
    pos_of = perm
    order_by_pos = np.argsort(pos_of)
    all_pos = pos_of[order_by_pos]
    for ci in range(plan.cmeta.shape[0]):
        rb_off, num_rb, row0 = (int(x) for x in plan.cmeta[ci, :3])
        lo_p, hi_p = row0 * 128, (row0 + num_rb * 8) * 128
        sel = order_by_pos[np.searchsorted(all_pos, lo_p):
                           np.searchsorted(all_pos, hi_p)]
        cc = np.unique(cg.color_of[sel])
        assert len(cc) == 1, "kernel color straddles compile colors"
        colors.append((sel, int(cc[0]), row0, num_rb,
                       bool(plan.cmeta[ci, 5] == 1)))

    wv = jnp.asarray(cg.weight_init.astype(np.float32))
    seed977 = np.int32(np.int64(seed) * 977 & 0xFFFFFFFF)

    for i in range(burn + epochs):
        for ci, (vids, c_star, row0, num_rb, is_aff) in enumerate(colors):
            pd = eng.plans[c_star]
            kx = eng.plan_kmax[c_star]
            xv = np.zeros(V, np.int64)
            xv[:] = 0
            xv = x_k[perm]                 # current values, orig order
            pot = np.asarray(color_potentials(
                pd, kx, eng.present[c_star], jnp.asarray(
                    xv.astype(np.int32)), wv))          # (R, kx)
            # potentials per variable id
            cvv = np.asarray(pd["cv_vid"])
            cvok = np.asarray(pd["cv_valid"])
            pot_of = np.zeros((V, kmax), np.float32)
            pot_of[cvv[cvok], :kx] = pot[cvok]
            # uniforms in kernel position order for this color's blocks
            salt_base = np.int32(i * (COLOR_MAX + 1) + ci)
            u_blocks = _block_uniforms(seed977, salt_base, 0, num_rb,
                                       aff=is_aff)
            pos = perm[vids]
            u = u_blocks[pos - row0 * 128]
            p = pot_of[vids]                             # (N, kmax)
            if is_aff:
                new = np.asarray(_draw2(
                    jnp.asarray(p[:, 0][None]), jnp.asarray(p[:, 1][None]),
                    jnp.asarray(u[None])))[0]
            elif kmax >= VEC_K_MIN:
                # the kernel's vec-k path: same (kmax, N) slab, same
                # max/exp/cumsum lowering — bit-comparable draws
                new = np.asarray(_draw_vec(
                    jnp.asarray(p.T.copy()),
                    jnp.asarray(card_k[pos][None].astype(np.int32)),
                    kmax, jnp.asarray(u[None])))[0]
            else:
                pots = [jnp.asarray(p[:, k][None]) for k in range(kmax)]
                new = np.asarray(_draw(
                    pots, jnp.asarray(card_k[pos][None].astype(np.int32)),
                    kmax, jnp.asarray(u[None])))[0]
            ok = upd_v[vids]
            x_k[pos[ok]] = new[ok]
        if i >= burn:
            for k in range(kmax):
                counts_k[:, k] += (x_k == k) * tally
    x = x_k[perm].astype(np.int32)
    return x, counts_k[perm].astype(np.int32)
