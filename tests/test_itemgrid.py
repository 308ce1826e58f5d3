"""Itemgrid Pallas kernel: compile-pass exactness + eval parity (CPU).

The kernel itself needs TPU hardware (hardware PRNG + Mosaic); these
tests validate everything AROUND it on CPU by replaying the kernel's
exact data path — packed blocks, windowed offsets, subst bitmasks,
_eval_bool — in numpy/jnp and comparing potentials against the golden
oracle. The on-TPU statistical parity run lives in bench.py's sanity
check and test_itemgrid_tpu (skipped off-TPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from numbskull_tpu import golden
from numbskull_tpu import types as T
from numbskull_tpu.compile import compile_graph
from numbskull_tpu.models import ising_grid, ising_color_hint
from numbskull_tpu.ops.itemgrid_pallas import (
    RB, _eval_bool, fill_weights, plan_item_grid,
)

BOOL_FUNCS = [T.FUNC_IMPLY_NATURAL, T.FUNC_OR, T.FUNC_EQUAL, T.FUNC_AND,
              T.FUNC_ISTRUE, T.FUNC_LINEAR, T.FUNC_RATIO, T.FUNC_LOGICAL,
              T.FUNC_IMPLY_MLN]


def _random_bool_graph(seed, n_vars=24, n_factors=40, amax=4):
    rng = np.random.default_rng(seed)
    v = T.new_variables(n_vars)
    v["dataType"] = 0
    v["cardinality"] = 2
    v["initialValue"] = rng.integers(0, 2, n_vars)
    v["isEvidence"] = rng.integers(0, 2, n_vars)
    w = T.new_weights(5)
    w["isFixed"] = True
    w["initialValue"] = rng.normal(size=5) * 0.5
    arities = rng.integers(1, amax + 1, n_factors)
    f = T.new_factors(n_factors)
    f["factorFunction"] = rng.choice(BOOL_FUNCS, n_factors)
    f["weightId"] = rng.integers(0, 5, n_factors)
    f["featureValue"] = 1.0
    f["arity"] = arities
    f["ftv_offset"] = np.concatenate(([0], np.cumsum(arities)[:-1]))
    E = int(arities.sum())
    fm = T.new_fmap(E)
    fm["vid"] = rng.integers(0, n_vars, E)
    return w, v, f, fm


def _replay_potentials(plan, weight_value, x_orig):
    """Replay the kernel's data path in numpy+jnp: unpack blocks, gather
    through tiled windows, evaluate with _eval_all, apply the vmap slot
    semantics. Returns {vid: [pot_k for k in range(kmax)]}."""
    from numbskull_tpu.ops.itemgrid_pallas import _Layout, _eval_all

    K = plan.kmax
    A = plan.A
    L = _Layout(plan.D, plan.A)
    x_new = np.zeros(plan.vp, np.int64)
    x_new[plan.perm] = x_orig
    inv = np.full(plan.vp, -1, np.int64)
    inv[plan.perm] = np.arange(plan.n_vars)
    out = {}
    for ci in range(plan.cmeta.shape[0]):
        rb_off, num_rb, row0r, nt, d_c = (int(x) for x in
                                          plan.cmeta[ci, :5])
        win_len = nt * plan.trw * 128
        for rbi in range(num_rb):
            grb = rb_off + rbi
            pk = plan.packed[grb]
            rowmeta = pk[L.rowmeta].astype(np.int64)
            card = rowmeta & 0xFF
            dense = (rowmeta >> 8) == 0
            pots = [np.zeros(RB) for _ in range(K)]
            for d in range(d_c):
                fta = pk[L.fta + d].astype(np.int64)
                ftype = jnp.asarray((fta & 0xFF) - 1,
                                    jnp.int32).reshape(1, RB)
                arity = jnp.asarray(fta >> 8, jnp.int32).reshape(1, RB)
                wgt = pk[L.wbake + d].view(np.float32)
                sbits = (pk[L.sbits + d].astype(np.int64) & 0xFFFFFFFF) \
                    | ((pk[L.sbits2 + d].astype(np.int64) & 0xFFFFFFFF)
                       << 32)
                dd = pk[L.dd + d].astype(np.int64)
                d1, d2 = dd & 0xFF, dd >> 8
                offs = [pk[L.off + d * A + a] for a in range(A)]
                eqs = [jnp.asarray(pk[L.eq + d * A + a],
                                   jnp.int32).reshape(1, RB)
                       for a in range(A)]
                crds = [jnp.asarray(pk[L.acard + d * A + a],
                                    jnp.int32).reshape(1, RB)
                        for a in range(A)]
                for k in range(K):
                    vals = []
                    for a in range(A):
                        wbf = plan.wbase.reshape(
                            plan.wbase.shape[0], -1)
                        base = int(wbf[grb, d * A + a]) * 128
                        win = x_new[base:base + win_len]
                        g = win[offs[a]]
                        sub = ((sbits >> a) & 1) != 0
                        vals.append(jnp.asarray(
                            np.where(sub, k, g), jnp.int32).reshape(1, RB))
                    e = np.asarray(_eval_all(plan.present, ftype, arity,
                                             vals, eqs, crds,
                                             A)).reshape(RB)
                    ok = np.where(dense, k < card, (k == d1) | (k == d2))
                    pots[k] = pots[k] + np.where(ok, wgt * e, 0.0)
            for lane in range(RB):
                vid = inv[row0r * 128 + rbi * RB + lane]
                if vid >= 0:
                    out[int(vid)] = [pots[k][lane] for k in range(K)]
    return out


@pytest.mark.parametrize("seed", [0, 7])
def test_itemgrid_potentials_match_golden(seed):
    w, v, f, fm = _random_bool_graph(seed)
    cg = compile_graph(w, v, f, fm)
    plan, reason = plan_item_grid(cg)
    assert plan is not None, reason
    fill_weights(plan, w["initialValue"])
    rng = np.random.default_rng(seed + 1)
    x = rng.integers(0, 2, cg.n_vars)
    got = _replay_potentials(plan, w["initialValue"], x)
    for vid in range(cg.n_vars):
        for k in (0, 1):
            want = golden.potential(v, f, fm, w["initialValue"], vid, k, x)
            assert got[vid][k] == pytest.approx(want, abs=1e-4), (vid, k)


def test_itemgrid_ising_potentials_match_golden():
    n = 12
    w, v, f, fm, dm, e = ising_grid(n, n, weight=0.37)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, n))
    plan, reason = plan_item_grid(cg)
    assert plan is not None, reason
    fill_weights(plan, w["initialValue"])
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2, cg.n_vars)
    got = _replay_potentials(plan, w["initialValue"], x)
    for vid in range(cg.n_vars):
        for k in (0, 1):
            want = golden.potential(v, f, fm, w["initialValue"], vid, k, x)
            assert got[vid][k] == pytest.approx(want, abs=1e-4), (vid, k)


def test_eval_bool_matches_golden_all_types():
    """_eval_bool vs golden.eval_factor over every boolean type and every
    arg assignment up to arity 3."""
    for ftype in BOOL_FUNCS:
        for arity in (1, 2, 3):
            A = 4
            n_cases = 2 ** arity
            for case in range(n_cases):
                vals_np = [(case >> a) & 1 for a in range(arity)]
                # golden scalar setup
                v = T.new_variables(arity)
                v["dataType"] = 0
                v["cardinality"] = 2
                f = T.new_factors(1)
                f["factorFunction"] = ftype
                f["arity"] = arity
                f["ftv_offset"] = 0
                fm = T.new_fmap(arity)
                fm["vid"] = np.arange(arity)
                want = golden.eval_factor(0, -1, 0, v, f, fm,
                                          np.array(vals_np))
                vals = [jnp.full((1, 8), vals_np[a] if a < arity else 0,
                                 jnp.int32) for a in range(A)]
                got = np.asarray(_eval_bool(
                    (ftype,), jnp.full((1, 8), ftype, jnp.int32),
                    jnp.full((1, 8), arity, jnp.int32), vals, A))[0, 0]
                assert got == pytest.approx(want), (ftype, arity, case)


def _random_mixed_graph(seed, n_vars=20, n_factors=30, max_card=3):
    """Boolean + categorical vars (cardinality up to ``max_card``),
    categorical + DP factor functions."""
    rng = np.random.default_rng(seed)
    v = T.new_variables(n_vars)
    is_cat = rng.random(n_vars) < 0.4
    v["dataType"] = is_cat.astype(np.int16)
    cat_card = rng.integers(3, max_card + 1, n_vars)
    v["cardinality"] = np.where(is_cat, cat_card, 2)
    v["initialValue"] = 0
    v["isEvidence"] = rng.integers(0, 2, n_vars)
    w = T.new_weights(4)
    w["isFixed"] = True
    w["initialValue"] = rng.normal(size=4) * 0.5
    funcs = [T.FUNC_OR, T.FUNC_AND, T.FUNC_EQUAL, T.FUNC_ISTRUE,
             T.FUNC_AND_CAT, T.FUNC_OR_CAT, T.FUNC_EQUAL_CAT_CONST,
             T.FUNC_IMPLY_NATURAL_CAT, T.FUNC_IMPLY_MLN_CAT,
             T.FUNC_DP_GEN_CLASS_PRIOR, T.FUNC_DP_GEN_LF_PROPENSITY,
             T.FUNC_DP_GEN_LF_ACCURACY, T.FUNC_DP_GEN_DEP_SIMILAR,
             T.FUNC_DP_GEN_DEP_EXCLUSIVE]
    arities = rng.integers(1, 4, n_factors)
    f = T.new_factors(n_factors)
    f["factorFunction"] = rng.choice(funcs, n_factors)
    f["factorFunction"][arities < 2] = T.FUNC_ISTRUE
    # DP accuracy/similar/exclusive need >= 2 args
    two_arg = np.isin(f["factorFunction"],
                      [T.FUNC_DP_GEN_LF_ACCURACY, T.FUNC_DP_GEN_DEP_SIMILAR,
                       T.FUNC_DP_GEN_DEP_EXCLUSIVE])
    arities[two_arg] = 2
    f["weightId"] = rng.integers(0, 4, n_factors)
    f["featureValue"] = 1.0
    f["arity"] = arities
    f["ftv_offset"] = np.concatenate(([0], np.cumsum(arities)[:-1]))
    E = int(arities.sum())
    fm = T.new_fmap(E)
    fm["vid"] = rng.integers(0, n_vars, E)
    for j in range(E):
        fm["dense_equal_to"][j] = rng.integers(
            0, v["cardinality"][fm["vid"][j]])
    return w, v, f, fm


@pytest.mark.parametrize("seed", [2, 9])
def test_itemgrid_categorical_potentials_match_golden(seed):
    w, v, f, fm = _random_mixed_graph(seed)
    cg = compile_graph(w, v, f, fm)
    plan, reason = plan_item_grid(cg)
    assert plan is not None, reason
    fill_weights(plan, w["initialValue"])
    rng = np.random.default_rng(seed + 1)
    x = np.array([rng.integers(0, c) for c in v["cardinality"]])
    got = _replay_potentials(plan, w["initialValue"], x)
    for vid in range(cg.n_vars):
        for k in range(int(v["cardinality"][vid])):
            want = golden.potential(v, f, fm, w["initialValue"], vid, k, x)
            assert got[vid][k] == pytest.approx(want, abs=1e-4), (vid, k)


@pytest.mark.parametrize("seed", [4, 11])
def test_itemgrid_card32_potentials_match_golden(seed):
    """Cardinality up to K_MAX_SUP=32 (raised from 8 in round 3): the
    kernel's kmax-unrolled candidate loop and count layout must stay
    exact against the scalar oracle at high cardinality."""
    w, v, f, fm = _random_mixed_graph(seed, max_card=32)
    assert int(v["cardinality"].max()) > 8      # beyond the old cap
    cg = compile_graph(w, v, f, fm)
    plan, reason = plan_item_grid(cg)
    assert plan is not None, reason
    assert plan.kmax > 8
    fill_weights(plan, w["initialValue"])
    rng = np.random.default_rng(seed + 1)
    x = np.array([rng.integers(0, c) for c in v["cardinality"]])
    got = _replay_potentials(plan, w["initialValue"], x)
    for vid in range(cg.n_vars):
        for k in range(int(v["cardinality"][vid])):
            want = golden.potential(v, f, fm, w["initialValue"], vid, k, x)
            assert got[vid][k] == pytest.approx(want, abs=1e-4), (vid, k)


@pytest.mark.parametrize("degree", [
    33, pytest.param(45, marks=pytest.mark.slow),
    pytest.param(63, marks=pytest.mark.slow)])
def test_itemgrid_high_arity_potentials_match_golden(degree):
    """Arity beyond one int32 substitution word (33..64): potentials
    must match the scalar oracle for every variable — in particular for
    rows whose own-var arg position is >= 32 (round-3 regression: a
    single-word sbits mask dropped those bits)."""
    from numbskull_tpu.models import voting_grouped

    # disjoint groups: an arity-A factor is an A-clique, so overlapping
    # high-arity factors would exceed COLOR_MAX
    w, v, f, fm, dm, e = voting_grouped((degree + 1) * 4, degree,
                                        func=T.FUNC_OR, weight=0.8,
                                        seed=degree)
    cg = compile_graph(w, v, f, fm)
    plan, reason = plan_item_grid(cg)
    assert plan is not None, reason
    fill_weights(plan, w["initialValue"])
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2, cg.n_vars)
    got = _replay_potentials(plan, w["initialValue"], x)
    for vid in range(cg.n_vars):
        for k in (0, 1):
            want = golden.potential(v, f, fm, w["initialValue"], vid, k,
                                    x)
            assert got[vid][k] == pytest.approx(want, abs=1e-4), (vid, k)


@pytest.mark.slow
def test_itemgrid_beyond_64_colors_potentials_match_golden():
    """Chromatic schedules past the old COLOR_MAX=64 (raised to 256 in
    round 3): overlapping random voting cliques need 71 colors here;
    such graphs previously fell back to the serial-gather XLA engine.
    Exact potential parity against the scalar oracle."""
    from numbskull_tpu.models import voting_model

    w, v, f, fm, dm, e = voting_model(2500, 1000, 25, func=T.FUNC_OR,
                                      weight=0.3, seed=1)
    cg = compile_graph(w, v, f, fm)
    assert cg.n_colors > 64
    plan, reason = plan_item_grid(cg)
    assert plan is not None, reason
    fill_weights(plan, w["initialValue"])
    rng = np.random.default_rng(2)
    x = rng.integers(0, 2, cg.n_vars)
    got = _replay_potentials(plan, w["initialValue"], x)
    # stride 31: ~160 oracle spot-checks across all colors — the golden
    # scalar oracle dominates runtime (the replay itself is seconds)
    for vid in range(0, cg.n_vars, 31):
        for k in (0, 1):
            want = golden.potential(v, f, fm, w["initialValue"], vid, k,
                                    x)
            assert got[vid][k] == pytest.approx(want, abs=1e-4), (vid, k)


@pytest.mark.slow
def test_itemgrid_interpret_card32_exact_marginals():
    """End-to-end interpret run at cardinality 32: independent 32-ary
    variables with one unary EQUAL_CAT_CONST factor each (weight w on
    value c_i) have closed-form marginals e^w/(e^w + 31)."""
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    K, N, wgt = 32, 96, 1.1
    rng = np.random.default_rng(5)
    v = T.new_variables(N)
    v["dataType"] = 1
    v["cardinality"] = K
    v["initialValue"] = 0
    w = T.new_weights(1)
    w["isFixed"] = True
    w["initialValue"] = wgt
    f = T.new_factors(N)
    f["factorFunction"] = T.FUNC_EQUAL_CAT_CONST
    f["weightId"] = 0
    f["featureValue"] = 1.0
    f["arity"] = 1
    f["ftv_offset"] = np.arange(N)
    fm = T.new_fmap(N)
    fm["vid"] = np.arange(N)
    c_i = rng.integers(0, K, N)
    fm["dense_equal_to"] = c_i
    cg = compile_graph(w, v, f, fm)
    eng = PallasItemGridEngine(cg, interpret=True)
    assert eng.plan.kmax == K
    epochs = 600
    x, cnt = eng.run(seed=0, burn=20, epochs=epochs)
    m = cnt / epochs
    p_hit = m[np.arange(N), c_i]
    p_exact = np.exp(wgt) / (np.exp(wgt) + K - 1)
    assert p_hit.mean() == pytest.approx(p_exact, abs=0.02)
    # off-target values uniform at (1 - p) / (K - 1)
    off = (1.0 - p_hit.mean()) / (K - 1)
    mask = np.ones((N, K), bool)
    mask[np.arange(N), c_i] = False
    assert m[mask].mean() == pytest.approx(off, abs=0.01)


@pytest.mark.slow
def test_rcm_reorder_rescues_shuffled_ising():
    """A relabeled (shuffled-vid) lattice has no natural locality; the
    RCM fallback must recover single-tile windows with exact potentials.
    192x192 = 36864 vars > one 16K gather tile, so locality is real."""
    n = 192
    w, v, f, fm, dm, e = ising_grid(n, n, weight=0.3)
    rng = np.random.default_rng(0)
    pi = rng.permutation(n * n)
    fm2 = fm.copy()
    fm2["vid"] = pi[fm["vid"]]
    cg = compile_graph(w, v, f, fm2, domain_mask=dm)
    plan, reason = plan_item_grid(cg)
    assert plan is not None, reason
    assert (plan.cmeta[:, 3] == 1).all()   # RCM -> one tile per window
    fill_weights(plan, w["initialValue"])
    x = rng.integers(0, 2, cg.n_vars)
    got = _replay_potentials(plan, w["initialValue"], x)
    for vid in range(0, cg.n_vars, 311):
        for k in (0, 1):
            want = golden.potential(v, f, fm2, w["initialValue"], vid, k,
                                    x)
            assert got[vid][k] == pytest.approx(want, abs=1e-4)


def test_eval_ufo_matches_golden():
    """FUNC_UFO (distributed-support factor): value of the arg at
    position val(0)-1."""
    from numbskull_tpu.ops.itemgrid_pallas import _eval_all

    A = 4
    for arity in (2, 3, 4):
        for case in range(3 ** arity):
            vals_np = [(case // 3 ** a) % 3 for a in range(arity)]
            v = T.new_variables(arity)
            v["dataType"] = 1
            v["cardinality"] = 3
            f = T.new_factors(1)
            f["factorFunction"] = T.FACTORS["UFO"]
            f["arity"] = arity
            fm = T.new_fmap(arity)
            fm["vid"] = np.arange(arity)
            want = golden.eval_factor(0, -1, 0, v, f, fm,
                                      np.array(vals_np))
            vals = [jnp.full((1, 8), vals_np[a] if a < arity else 0,
                             jnp.int32) for a in range(A)]
            eqs = [jnp.zeros((1, 8), jnp.int32) for _ in range(A)]
            crd = [jnp.full((1, 8), 3, jnp.int32) for _ in range(A)]
            got = np.asarray(_eval_all(
                (T.FACTORS["UFO"],),
                jnp.full((1, 8), T.FACTORS["UFO"], jnp.int32),
                jnp.full((1, 8), arity, jnp.int32), vals, eqs, crd,
                A))[0, 0]
            assert got == pytest.approx(want), (arity, vals_np)


def test_planner_edge_cases():
    """Degenerate graphs must plan (or cleanly report a reason), never
    crash: isolated vars, no factors, self-pair factors, all-evidence,
    single-variable graphs."""
    def mk(n_vars, specs, all_ev=False):
        v = T.new_variables(n_vars)
        v["dataType"] = 0
        v["cardinality"] = 2
        if all_ev:
            v["isEvidence"] = 1
        w = T.new_weights(1)
        w["initialValue"] = 0.5
        w["isFixed"] = True
        f = T.new_factors(len(specs))
        tot = sum(len(s[1]) for s in specs)
        fm = T.new_fmap(tot)
        off = 0
        for i, (ff, vids) in enumerate(specs):
            f["factorFunction"][i] = ff
            f["arity"][i] = len(vids)
            f["ftv_offset"][i] = off
            f["featureValue"][i] = 1.0
            for j, vid in enumerate(vids):
                fm["vid"][off + j] = vid
            off += len(vids)
        return w, v, f, fm

    cases = [
        mk(5, [(T.FUNC_ISTRUE, [0])]),                 # isolated vars
        mk(4, []),                                     # no factors
        mk(3, [(T.FUNC_EQUAL, [1, 1])]),               # self-pair
        mk(4, [(T.FUNC_EQUAL, [0, 1])], all_ev=True),  # all evidence
        mk(1, [(T.FUNC_ISTRUE, [0])]),                 # single var
    ]
    for w, v, f, fm in cases:
        cg = compile_graph(w, v, f, fm)
        plan, reason = plan_item_grid(cg)
        assert plan is not None, reason
        fill_weights(plan, w["initialValue"])


def test_unsupported_graphs_report_reason():
    # cardinality beyond the kernel envelope (K_MAX_SUP = 128 since
    # round 5's vec-k path; 100 used to be out of envelope)
    w, v, f, fm = _random_bool_graph(1)
    v2 = v.copy()
    v2["dataType"][0] = 1
    v2["cardinality"][0] = 200
    cg = compile_graph(w, v2, f, fm)
    plan, reason = plan_item_grid(cg)
    assert plan is None and "cardinality" in reason


@pytest.mark.skipif("tpu" not in str(jax.devices()[0]).lower()
                    and "axon" not in jax.default_backend().lower(),
                    reason="itemgrid kernel needs TPU hardware PRNG")
def test_itemgrid_tpu_deterministic_by_seed():
    """Same seed -> bit-identical values and tallies; different seed
    differs (hardware PRNG seeded per run)."""
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    n = 64
    w, v, f, fm, dm, e = ising_grid(n, n, weight=0.3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, n))
    eng = PallasItemGridEngine(cg)
    x1, c1 = eng.run(seed=42, burn=10, epochs=100)
    x2, c2 = eng.run(seed=42, burn=10, epochs=100)
    x3, c3 = eng.run(seed=43, burn=10, epochs=100)
    assert (x1 == x2).all() and (c1 == c2).all()
    assert not (c1 == c3).all()


@pytest.mark.skipif("tpu" not in str(jax.devices()[0]).lower()
                    and "axon" not in jax.default_backend().lower(),
                    reason="itemgrid kernel needs TPU hardware PRNG")
def test_itemgrid_tpu_fuzz_vs_xla_per_variable():
    """Random mixed/boolean multi-color graphs: kernel vs XLA engine
    per-variable marginals within Monte-Carlo tolerance."""
    from numbskull_tpu.ops import GibbsEngine
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    for seed, mk in [(3, _random_mixed_graph), (4, _random_bool_graph)]:
        w, v, f, fm = mk(seed, n_vars=60, n_factors=120)
        cg = compile_graph(w, v, f, fm)
        eng = PallasItemGridEngine(cg)
        epochs = 2000
        x, cnt = eng.run(seed=0, burn=100, epochs=epochs)
        marg = eng.marginals(cnt, epochs)
        ge = GibbsEngine(cg)
        st = ge.init_state()
        st = ge.inference(st, jax.random.PRNGKey(0), epochs=epochs,
                          burn=100)
        gm = ge.marginals(st, epochs)
        K = min(marg.shape[1], gm.shape[1])
        gap = np.abs(marg[:, :K] - gm[:, :K]).max()
        assert gap < 0.06, (seed, gap)


@pytest.mark.skipif("tpu" not in str(jax.devices()[0]).lower()
                    and "axon" not in jax.default_backend().lower(),
                    reason="itemgrid kernel needs TPU hardware PRNG")
def test_itemgrid_tpu_coin_exact_marginals():
    """Kernel marginals vs the closed-form coin joint (the reference's
    own ground-truth scheme, ising/ising.cpp:202-318)."""
    from numbskull_tpu.models import coin_exact_marginal, coin_model
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    a, b, c = 0.3, -0.2, 0.4
    w, v, f, fm, dm, e = coin_model(200, a, b, c, evidence=False,
                                    weight_init=(a, b, c), fixed=True)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg)
    epochs = 3000
    x, cnt = eng.run(seed=0, burn=100, epochs=epochs)
    marg = eng.marginals(cnt, epochs)
    ex = coin_exact_marginal(a, b, c)
    p_x1 = marg[0::2, 1].mean()            # pooled over 200 copies
    p_x2 = marg[1::2, 1].mean()
    assert p_x1 == pytest.approx(ex[2] + ex[3], abs=0.01)
    assert p_x2 == pytest.approx(ex[1] + ex[3], abs=0.01)


@pytest.mark.skipif("tpu" not in str(jax.devices()[0]).lower()
                    and "axon" not in jax.default_backend().lower(),
                    reason="itemgrid kernel needs TPU hardware PRNG")
def test_itemgrid_tpu_categorical_lf_marginals_match_xla():
    from numbskull_tpu.models import lf_model
    from numbskull_tpu.ops import GibbsEngine
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    w, v, f, fm, dm, e = lf_model(0.3, [0.9, 0.5], copies=300, seed=0)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg)
    x, cnt = eng.run(seed=0, burn=50, epochs=1000)
    marg = eng.marginals(cnt, 1000)
    ge = GibbsEngine(cg)
    st = ge.init_state()
    st = ge.inference(st, jax.random.PRNGKey(0), epochs=1000, burn=50)
    gm = ge.marginals(st, 1000)
    K = min(marg.shape[1], gm.shape[1])
    gap = np.abs(np.sort(marg[:, :K], 0) - np.sort(gm[:, :K], 0)).mean()
    assert gap < 0.03, gap


@pytest.mark.skipif("tpu" not in str(jax.devices()[0]).lower()
                    and "axon" not in jax.default_backend().lower(),
                    reason="itemgrid kernel needs TPU hardware PRNG")
def test_itemgrid_tpu_learning_recovers_coin_weights():
    from numbskull_tpu.models import coin_model
    from numbskull_tpu.ops.gibbs import LearnParams
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    a, b, c = 0.8, -0.5, 0.4
    w, v, f, fm, dm, e = coin_model(4000, a, b, c, evidence=True,
                                    weight_init=(0.0, 0.0, 0.0),
                                    fixed=False, seed=3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg)
    lp = LearnParams(regularization=2, reg_param=1e-4)
    got = eng.learn(seed=0, burn=10, epochs=150, stepsize=0.1,
                    decay=0.99, lp=lp)
    assert got[0] == pytest.approx(a, abs=0.15)
    assert got[1] == pytest.approx(b, abs=0.15)
    assert got[2] == pytest.approx(c, abs=0.15)


@pytest.mark.skipif("tpu" not in str(jax.devices()[0]).lower()
                    and "axon" not in jax.default_backend().lower(),
                    reason="itemgrid kernel needs TPU hardware PRNG")
def test_itemgrid_tpu_l1_lf_learning_and_sum_agg():
    """In-kernel L1 truncated-gradient learning on the labeling-function
    model (accuracy magnitude + ordering, analog of reference
    test_lf_learning.py) and the grad_agg='sum' branch on the coin."""
    from numbskull_tpu.models import coin_model, lf_model
    from numbskull_tpu.ops.gibbs import LearnParams
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    prior, acc = 0.0, [1.0, 0.4]
    w, v, f, fm, dm, e = lf_model(prior, acc, copies=2000, seed=11)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg)
    lp = LearnParams(regularization=1, reg_param=0.01, truncation=10,
                     learn_non_evidence=True)
    epochs = 200
    got = eng.learn(seed=0, burn=20, epochs=epochs, stepsize=0.05,
                    decay=0.01 ** (1.0 / epochs), lp=lp)
    assert abs(got[0] - prior) < 0.25
    assert got[1] == pytest.approx(acc[0], abs=0.3)
    assert got[2] == pytest.approx(acc[1], abs=0.3)
    assert got[1] > got[2]

    lp2 = LearnParams(regularization=2, reg_param=1e-4, grad_agg="sum")
    w, v, f, fm, dm, e = coin_model(1000, 0.8, -0.5, 0.4, evidence=True,
                                    weight_init=(0.0, 0.0, 0.0),
                                    fixed=False, seed=3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg)
    got2 = eng.learn(seed=0, burn=5, epochs=60, stepsize=0.002,
                     decay=0.995, lp=lp2)
    assert got2[0] > 0.3 and got2[1] < -0.1 and got2[2] > 0.1


@pytest.mark.skipif("tpu" not in str(jax.devices()[0]).lower()
                    and "axon" not in jax.default_backend().lower(),
                    reason="itemgrid kernel needs TPU hardware PRNG")
def test_itemgrid_tpu_marginals_match_xla_engine():
    from numbskull_tpu.ops import GibbsEngine
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    n = 32
    w, v, f, fm, dm, e = ising_grid(n, n, weight=0.3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, n))
    eng = PallasItemGridEngine(cg)
    x, cnt = eng.run(seed=0, burn=50, epochs=800)
    marg = eng.marginals(cnt, 800)[:, 1]
    ge = GibbsEngine(cg)
    st = ge.init_state()
    st = ge.inference(st, jax.random.PRNGKey(0), epochs=800, burn=50)
    gm = ge.marginals(st, 800)[:, 1]
    assert abs(marg.mean() - gm.mean()) < 0.02
    assert np.abs(np.sort(marg) - np.sort(gm)).mean() < 0.02


def test_loop_stats_eval_matches_unrolled():
    """The data-driven stats-loop evaluator (high-arity path) must equal
    the unrolled _eval_all producer for random mixed inputs across all
    factor types and arities up to 12."""
    import jax

    from numbskull_tpu.ops.itemgrid_pallas import _eval_all, _loop_stats
    from numbskull_tpu.ops.factor_semantics import finalize

    rng = np.random.default_rng(5)
    funcs = [T.FUNC_IMPLY_NATURAL, T.FUNC_OR, T.FUNC_EQUAL, T.FUNC_AND,
             T.FUNC_LINEAR, T.FUNC_RATIO, T.FUNC_LOGICAL,
             T.FUNC_IMPLY_MLN, T.FUNC_AND_CAT, T.FUNC_OR_CAT,
             T.FUNC_EQUAL_CAT_CONST, T.FUNC_IMPLY_NATURAL_CAT,
             T.FUNC_IMPLY_MLN_CAT, T.FUNC_DP_GEN_CLASS_PRIOR,
             T.FUNC_DP_GEN_LF_PROPENSITY, T.FUNC_DP_GEN_LF_ACCURACY,
             T.FUNC_DP_GEN_DEP_SIMILAR, T.FUNC_DP_GEN_DEP_EXCLUSIVE,
             T.FACTORS["UFO"]]
    A = 12
    N = 64
    present = tuple(sorted(funcs))
    ftype = jnp.asarray(rng.choice(funcs, (1, N)), jnp.int32)
    arity = jnp.asarray(rng.integers(1, A + 1, (1, N)), jnp.int32)
    gvals = rng.integers(0, 3, (A, 1, N)).astype(np.int32)
    eqs = rng.integers(0, 3, (A, 1, N)).astype(np.int32)
    cards = rng.integers(2, 4, (A, 1, N)).astype(np.int32)
    subm = rng.random((A, 1, N)) < 0.2
    k = jnp.int32(1)
    vals_sub = [jnp.asarray(np.where(subm[a], 1, gvals[a]), jnp.int32)
                for a in range(A)]
    want = np.asarray(_eval_all(
        present, ftype, arity, vals_sub,
        [jnp.asarray(eqs[a]) for a in range(A)],
        [jnp.asarray(cards[a]) for a in range(A)], A))

    sts = _loop_stats(
        A, arity,
        read_val=lambda a: jnp.asarray(gvals)[a],
        read_eq=lambda a: jnp.asarray(eqs)[a],
        read_card=lambda a: jnp.asarray(cards)[a],
        read_sub=lambda a: jnp.asarray(subm)[a],
        subvals=[k])
    got = np.asarray(finalize(present, ftype, sts[0]))
    assert np.allclose(got, want, atol=1e-5), \
        np.argwhere(~np.isclose(got, want, atol=1e-5))


@pytest.mark.slow
def test_itemgrid_interpret_coin_exact_marginals():
    """Full kernel in interpret mode (software counter-hash PRNG) on
    CPU: marginals match the closed-form coin joint. This is the
    non-hardware-gated end-to-end kernel test."""
    from numbskull_tpu.models import coin_exact_marginal, coin_model
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    a, b, c = 0.3, -0.2, 0.4
    w, v, f, fm, dm, e = coin_model(50, a, b, c, evidence=False,
                                    weight_init=(a, b, c), fixed=True)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg, interpret=True)
    x, cnt = eng.run(seed=0, burn=50, epochs=1500)
    m = cnt / 1500
    ex = coin_exact_marginal(a, b, c)
    assert m[0::2, 1].mean() == pytest.approx(ex[2] + ex[3], abs=0.03)
    assert m[1::2, 1].mean() == pytest.approx(ex[1] + ex[3], abs=0.03)


def test_itemgrid_interpret_learning_recovers_direction():
    from numbskull_tpu.models import coin_model
    from numbskull_tpu.ops.gibbs import LearnParams
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    w, v, f, fm, dm, e = coin_model(300, 0.8, -0.5, 0.4, evidence=True,
                                    weight_init=(0, 0, 0), fixed=False,
                                    seed=3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg, interpret=True)
    wv = eng.learn(seed=0, burn=5, epochs=60, stepsize=0.1, decay=0.99,
                   lp=LearnParams(regularization=2, reg_param=1e-4))
    assert wv[0] > 0.3 and wv[1] < -0.15 and wv[2] > 0.1


def test_hbm_engine_bit_identical_to_vmem_interpret():
    """The HBM-resident engine (values + tallies in HBM, per-block value
    slabs DMA'd in, rows stored straight back, streamed tallies) is
    BIT-IDENTICAL to the VMEM engine on the same software PRNG stream —
    the memory plumbing changes, the sampling does not."""
    from numbskull_tpu.ops.itemgrid_pallas import (
        HbmItemGridEngine, PallasItemGridEngine,
    )

    n, m = 160, 512        # 81920 vars: above the HBM engine's floor
    w, v, f, fm, dm, e = ising_grid(n, m, weight=0.35)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, m))
    hbm = HbmItemGridEngine(cg, interpret=True)
    x1, c1 = hbm.run(seed=3, burn=2, epochs=8)
    vm = PallasItemGridEngine(cg, interpret=True)
    x2, c2 = vm.run(seed=3, burn=2, epochs=8)
    assert (c1 == c2).all()
    assert (x1 == x2).all()


@pytest.mark.slow
def test_hbm_engine_noaff_bit_identical_to_vmem_old_path():
    """The HBM engine's HARDWARE default disables the affine fast path
    (its Mosaic compile hangs the tunneled device; the old path ran 33M
    vars in round 2). That configuration must stay bit-identical to the
    VMEM engine forced onto the old path (cmeta[:,5]=0 — the old-stack
    blocks are always written, even for affine-qualified colors)."""
    from numbskull_tpu.ops.itemgrid_pallas import (
        HbmItemGridEngine, PallasItemGridEngine,
    )

    n, m = 160, 512
    w, v, f, fm, dm, e = ising_grid(n, m, weight=0.35)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, m))
    hbm = HbmItemGridEngine(cg, interpret=True, allow_aff=False)
    x1, c1 = hbm.run(seed=3, burn=2, epochs=8)
    vm = PallasItemGridEngine(cg, interpret=True)
    vm.plan.cmeta[:, 5] = 0          # force the old stack
    x2, c2 = vm.run(seed=3, burn=2, epochs=8)
    assert (c1 == c2).all()
    assert (x1 == x2).all()


@pytest.mark.slow
def test_hbm_learn_bit_identical_to_vmem_interpret():
    """HBM-resident LEARNING (round-3: chains in HBM, slab gathers, SGD
    weight updates in-kernel) is bit-identical to the VMEM learn kernel
    on the same software PRNG stream — weights AND both chains."""
    from numbskull_tpu.ops.itemgrid_pallas import (
        HbmItemGridEngine, PallasItemGridEngine,
    )

    n, m = 160, 512
    w, v, f, fm, dm, e = ising_grid(n, m, weight=0.2, fixed=False)
    rng = np.random.default_rng(0)
    v["isEvidence"] = (rng.random(n * m) < 0.3).astype(np.int8)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, m))
    hbm = HbmItemGridEngine(cg, interpret=True)
    w1, x1, xe1 = hbm.learn(seed=2, burn=1, epochs=3, stepsize=0.05,
                            return_state=True)
    vm = PallasItemGridEngine(cg, interpret=True)
    w2, x2, xe2 = vm.learn(seed=2, burn=1, epochs=3, stepsize=0.05,
                           return_state=True)
    assert (x1 == x2).all()
    assert (xe1 == xe2).all()
    assert (w1 == w2).all()
    assert w1[0] != pytest.approx(0.2)      # the weight actually moved


@pytest.mark.slow
def test_hbm_no_sbase_table_bit_identical(monkeypatch):
    """Beyond the SMEM slab-base-table budget the HBM kernels read slab
    bases from the streamed window-base block (the pre-round-3 data
    dependency); force that path by shrinking the budget and assert it
    is still bit-identical to the VMEM engine for inference AND
    learning."""
    import numbskull_tpu.ops.itemgrid_pallas as ig

    monkeypatch.setattr(ig, "SBASE_TBL_MAX", 1)
    n, m = 160, 512
    w, v, f, fm, dm, e = ising_grid(n, m, weight=0.2, fixed=False)
    rng = np.random.default_rng(0)
    v["isEvidence"] = (rng.random(n * m) < 0.3).astype(np.int8)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, m))
    hbm = ig.HbmItemGridEngine(cg, interpret=True)
    assert len(hbm._sbase_tbl) == 1          # dummy, never read
    x1, c1 = hbm.run(seed=3, burn=1, epochs=2)
    vm = ig.PallasItemGridEngine(cg, interpret=True)
    x2, c2 = vm.run(seed=3, burn=1, epochs=2)
    assert (np.asarray(x1) == np.asarray(x2)).all()
    assert (np.asarray(c1)[:, :2] == np.asarray(c2)[:, :2]).all()
    w1, xx1, xe1 = hbm.learn(seed=4, burn=1, epochs=2, stepsize=0.05,
                             return_state=True)
    w2, xx2, xe2 = vm.learn(seed=4, burn=1, epochs=2, stepsize=0.05,
                            return_state=True)
    assert (w1 == w2).all() and (xx1 == xx2).all() and (xe1 == xe2).all()


def test_itemgrid_learn_many_weights():
    """4096 DISTINCT weights in one in-kernel learning run (wrows=32
    weight rows; round-2 treated >1024 weights as an XLA-fallback case).
    Each variable carries its own unary ISTRUE weight and an evidence
    label; the learned weight's sign must match the label."""
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    N = 4096
    rng = np.random.default_rng(9)
    labels = rng.integers(0, 2, N)
    v = T.new_variables(N)
    v["isEvidence"] = 1
    v["initialValue"] = labels
    v["dataType"] = 0
    v["cardinality"] = 2
    w = T.new_weights(N)
    w["isFixed"] = False
    w["initialValue"] = 0.0
    f = T.new_factors(N)
    f["factorFunction"] = T.FUNC_ISTRUE
    f["weightId"] = np.arange(N)
    f["featureValue"] = 1.0
    f["arity"] = 1
    f["ftv_offset"] = np.arange(N)
    fm = T.new_fmap(N)
    fm["vid"] = np.arange(N)
    cg = compile_graph(w, v, f, fm)
    eng = PallasItemGridEngine(cg, interpret=True)
    wv = eng.learn(seed=1, burn=2, epochs=40, stepsize=0.4, decay=0.98)
    assert wv.shape == (N,)
    # every weight moved toward its own label (free-chain expectation
    # 0.5 at w=0 vs clamped 0/1) — distinct ids across all 32 rows
    assert (wv[labels == 1] > 0.2).mean() > 0.95
    assert (wv[labels == 0] < -0.2).mean() > 0.95


def test_hbm_engine_rejects_small_and_nonlocal():
    from numbskull_tpu.ops.itemgrid_pallas import HbmItemGridEngine
    from numbskull_tpu.models import coin_model

    w, v, f, fm, dm, e = coin_model(30, 0.3, -0.2, 0.4)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    with pytest.raises(ValueError, match="fits VMEM"):
        HbmItemGridEngine(cg, interpret=True)


@pytest.mark.skipif("tpu" not in str(jax.devices()[0]).lower()
                    and "axon" not in jax.default_backend().lower(),
                    reason="itemgrid kernel needs TPU hardware PRNG")
def test_itemgrid_tpu_grouped_voting_matches_xla():
    """The reference's degree-experiment graph family (grouped voting,
    51 colors at degree 50) through the fused kernel on hardware:
    marginals match the XLA engine."""
    from numbskull_tpu.models import voting_grouped
    from numbskull_tpu.ops import GibbsEngine
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    w, v, f, fm, dm, e = voting_grouped(3000, 10, weight=0.4)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    assert cg.n_colors == 11
    eng = PallasItemGridEngine(cg)
    x, cnt = eng.run(seed=0, burn=100, epochs=2000)
    ge = GibbsEngine(cg)
    st = ge.init_state()
    st = ge.inference(st, jax.random.PRNGKey(0), epochs=2000, burn=100)
    gm = ge.marginals(st, 2000)[:, 1]
    km = cnt[:, 1] / 2000
    assert abs(km.mean() - gm.mean()) < 0.02
    assert np.abs(np.sort(km) - np.sort(gm)).mean() < 0.02


@pytest.mark.skipif("tpu" not in str(jax.devices()[0]).lower()
                    and "axon" not in jax.default_backend().lower(),
                    reason="itemgrid kernel needs TPU hardware PRNG")
def test_hbm_engine_tpu_matches_vmem():
    """HBM-resident engine vs VMEM engine on hardware (independent
    hardware-PRNG streams; statistical agreement)."""
    from numbskull_tpu.ops.itemgrid_pallas import (
        HbmItemGridEngine, PallasItemGridEngine,
    )

    n, m = 160, 512
    w, v, f, fm, dm, e = ising_grid(n, m, weight=0.35)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, m))
    hbm = HbmItemGridEngine(cg)
    x1, c1 = hbm.run(seed=4, burn=50, epochs=500)
    vm = PallasItemGridEngine(cg)
    x2, c2 = vm.run(seed=3, burn=50, epochs=500)
    m1, m2 = c1[:, 1] / 500, c2[:, 1] / 500
    assert abs(m1.mean() - m2.mean()) < 0.01
    assert np.abs(np.sort(m1) - np.sort(m2)).mean() < 0.01
