"""Affine fast-path tests: the lane-roll gather + shared-stats kernel
path must be EXACTLY equivalent to the one-hot/_loop_stats path.

Method: a lattice whose conditionals are fully saturated (huge coupling
weight plus an ISTRUE prior whose weight breaks every count tie) makes
the Gibbs trajectory PRNG-independent, so the affine path and the
forced-old path must produce bit-identical values and tallies — a
sample-exact check of the gathers (including negative affine constants
at clamped slab edges) and of the candidate-count algebra.

Reference semantics under test: numbskull/inference.py:55-71 potentials
over the eval_factor truth table (inference.py:149-413).
"""

import numpy as np
import pytest

from numbskull_tpu import types as T
from numbskull_tpu.compile import compile_graph
from numbskull_tpu.models import ising_grid, voting_grouped
from numbskull_tpu.ops.itemgrid_pallas import (
    AFF_NONE, RB, PallasItemGridEngine, plan_item_grid, shard_schedule)


def lattice_det(n, m, seed=0):
    """EQUAL-coupled lattice + per-var ISTRUE prior; weights saturate
    every conditional and the prior/coupling ratio is irrational-ish so
    no count combination ever ties."""
    rng = np.random.default_rng(seed)
    V = n * m
    n_pair = (n - 1) * m + n * (m - 1)
    weights = T.new_weights(2)
    weights["isFixed"] = True
    weights["initialValue"] = [60.0, 28.3]
    variables = T.new_variables(V)
    variables["isEvidence"] = 0
    variables["initialValue"] = rng.integers(0, 2, V)
    variables["dataType"] = 0
    variables["cardinality"] = 2
    factors = T.new_factors(n_pair + V)
    fmap = T.new_fmap(2 * n_pair + V)
    fi = mi = 0

    def vid(i, j):
        return i * m + j

    for i in range(n):
        for j in range(m):
            for (i2, j2) in ((i + 1, j), (i, j + 1)):
                if i2 < n and j2 < m:
                    factors[fi] = (T.FUNC_EQUAL, 0, 1.0, 2, mi)
                    fmap[mi] = (vid(i, j), 0)
                    fmap[mi + 1] = (vid(i2, j2), 0)
                    fi += 1
                    mi += 2
    for vv in range(V):
        factors[fi] = (T.FUNC_ISTRUE, 1, 1.0, 1, mi)
        fmap[mi] = (vv, 0)
        fi += 1
        mi += 1
    return weights, variables, factors, fmap, None


def _run_both(cg, epochs=2):
    eng = PallasItemGridEngine(cg, interpret=True)
    assert (eng.plan.cmeta[:, 5] == 1).all(), "expected fully affine"
    va, ca = eng.run(seed=3, burn=0, epochs=epochs)
    eng_o = PallasItemGridEngine(cg, interpret=True)
    eng_o.plan.cmeta[:, 5] = 0          # force the one-hot path
    eng_o.plan.packed_a = None
    vo, co = eng_o.run(seed=99, burn=0, epochs=epochs)
    return va[:cg.n_vars], ca[:cg.n_vars], vo[:cg.n_vars], co[:cg.n_vars]


def test_affine_lattice_exact_vs_old_path():
    w, v, f, fm, dm = lattice_det(24, 24)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    va, ca, vo, co = _run_both(cg)
    assert (va == vo).all()
    assert (ca == co).all()


@pytest.mark.slow
def test_affine_superblock_exact_vs_old_path():
    # 130x128: 9 row blocks per color -> one full superblock + tail
    w, v, f, fm, dm = lattice_det(130, 128)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    plan, reason = plan_item_grid(cg)
    assert plan is not None and int(plan.cmeta[:, 1].max()) >= 9
    va, ca, vo, co = _run_both(cg)
    assert (va == vo).all()
    assert (ca == co).all()


@pytest.mark.slow
def test_affine_voting_detection_and_marginals():
    args = voting_grouped(40, 3, weight=0.4, seed=1)
    w, v, f, fm, dm, e = args
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    plan, reason = plan_item_grid(cg)
    assert plan is not None, reason
    assert (plan.cmeta[:, 5] == 1).all()
    # every fetched (slot, arg) has one affine constant per color
    assert (plan.amet != AFF_NONE).any()
    eng = PallasItemGridEngine(cg, interpret=True)
    _, counts = eng.run(seed=3, burn=50, epochs=800)
    from numbskull_tpu.ops import GibbsEngine
    import jax
    ge = GibbsEngine(cg)
    st = ge.init_state()
    st = ge.inference(st, jax.random.PRNGKey(0), epochs=800, burn=50)
    m2 = np.asarray(st.count)[:, 1] / 800.0
    assert np.abs(counts[:, 1] / 800.0 - m2).max() < 0.12


@pytest.mark.slow
def test_affine_high_arity_exact_vs_old_path():
    """Arity 41 (> one int32 subst word): the substitution bit for arg
    positions >= 32 must come from the second sbits word on BOTH eval
    paths. Round-3 regression: a single-word mask silently dropped the
    own-var bit at positions >= 31, so high-degree voting rows sampled
    from the wrong conditional.

    Construction: OR groups (weight 60) + negative ISTRUE priors
    (-28.3) saturate every conditional, so the trajectory is exactly
    deterministic yet OSCILLATES — an all-zero group flips up (the
    candidate's own substitution decides OR), then the priors pull vars
    back down. Any lost subst bit changes the trajectory."""
    w, v, f, fm, dm, e = voting_grouped(400, 40, weight=60.0,
                                        func=T.FUNC_OR, seed=2)
    V = len(v)
    v = v.copy()
    v["initialValue"] = 0
    w2 = T.new_weights(2)
    w2["isFixed"] = True
    w2["initialValue"] = [60.0, -28.3]
    f2 = T.new_factors(len(f) + V)
    f2[:len(f)] = f
    fm2 = T.new_fmap(len(fm) + V)
    fm2[:len(fm)] = fm
    for i in range(V):
        f2[len(f) + i] = (T.FUNC_ISTRUE, 1, 1.0, 1, len(fm) + i)
        fm2["vid"][len(fm) + i] = i
    cg = compile_graph(w2, v, f2, fm2, domain_mask=dm)
    plan, reason = plan_item_grid(cg)
    assert plan is not None, reason
    assert int(np.asarray(f2["arity"]).max()) == 41

    eng = PallasItemGridEngine(cg, interpret=True)
    va, ca = eng.run(seed=3, burn=0, epochs=3)
    eng_o = PallasItemGridEngine(cg, interpret=True)
    eng_o.plan.cmeta[:, 5] = 0          # force the one-hot path
    eng_o.plan.packed_a = None
    vo, co = eng_o.run(seed=99, burn=0, epochs=3)
    assert (va[:V] == vo[:V]).all()
    assert (ca[:V] == co[:V]).all()
    # the counts must actually oscillate (sensitivity guard: a
    # trajectory stuck at all-0/all-1 would not exercise the gathers)
    assert 0 < int(ca[:V, 1].sum()) < 3 * V


def test_affine_rejects_categorical_and_ufo():
    # categorical cardinality 3 -> not boolean -> no affine colors
    V = 8
    weights = T.new_weights(1)
    weights["isFixed"] = True
    weights["initialValue"] = 0.5
    variables = T.new_variables(V)
    variables["isEvidence"] = 0
    variables["initialValue"] = 0
    variables["dataType"] = 1
    variables["cardinality"] = 3
    factors = T.new_factors(V - 1)
    fmap = T.new_fmap(2 * (V - 1))
    for i in range(V - 1):
        factors[i] = (T.FUNC_AND_CAT, 0, 1.0, 2, 2 * i)
        fmap[2 * i] = (i, 1)
        fmap[2 * i + 1] = (i + 1, 1)
    dm = np.zeros(0, np.int64)
    cg = compile_graph(weights, variables, factors, fmap,
                       domain_mask=None)
    plan, reason = plan_item_grid(cg)
    assert plan is not None, reason
    assert (plan.cmeta[:, 5] == 0).all()
    assert plan.packed_a is None


def test_shard_schedule_shifts_affine_offsets():
    w, v, f, fm, dm = lattice_det(24, 24)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    n_g = 2
    plan, reason = plan_item_grid(cg, n_shards=n_g)
    assert plan is not None, reason
    if plan.packed_a is None:
        pytest.skip("plan not affine under n_shards padding")
    (packed_mc, wbase_mc, cmeta_mc, gmeta, packed_a_mc,
     amet_mc) = shard_schedule(plan, n_g)
    for ci in range(plan.cmeta.shape[0]):
        if plan.cmeta[ci, 5] != 1:
            continue
        nb = int(plan.cmeta[ci, 1]) // n_g
        keep = plan.amet[ci] != AFF_NONE
        for d in range(n_g):
            assert (amet_mc[d, ci, keep] ==
                    plan.amet[ci, keep] + d * nb * RB).all()
            assert (amet_mc[d, ci, ~keep] == AFF_NONE).all()
        # per-device packed_a blocks slice the color contiguously
        assert packed_a_mc.shape[0] == n_g


def test_aff_learn_bit_equal_to_general_path():
    """The round-5 AFFINE LEARNING color (dual-chain lane-roll gathers,
    shared stats passes, vectorized unit draw) is BIT-IDENTICAL to the
    general learn path by construction: same per-block (1, RB) uniform
    streams and _draw arithmetic (elementwise, reshape-invariant),
    exact-int stats -> identical f32 potentials/evals in the same add
    order, and gradient dots accumulated in the general path's (block,
    slot) order. Forcing the general path (cmeta[:, 5] = 0) on the
    same graph must reproduce the weights and both chains bit-for-bit."""
    from numbskull_tpu.models import coin_model
    from numbskull_tpu.ops.gibbs import LearnParams
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    w, v, f, fm, dm, e = coin_model(90, 0.8, -0.5, 0.4, evidence=True,
                                    weight_init=(0.0, 0.0, 0.0),
                                    fixed=False, seed=3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    lp = LearnParams(regularization=2, reg_param=1e-4)
    kw = dict(seed=7, burn=2, epochs=10, stepsize=0.05, decay=0.98,
              lp=lp, return_state=True)
    aff = PallasItemGridEngine(cg, interpret=True)
    assert bool((aff.plan.cmeta[:, 5] == 1).any())
    w1, x1, xe1 = aff.learn(**kw)
    gen = PallasItemGridEngine(cg, interpret=True)
    gen.plan.cmeta[:, 5] = 0          # force the general learn path
    w2, x2, xe2 = gen.learn(**kw)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(xe1, xe2)
