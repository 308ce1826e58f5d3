"""Cross-engine PRNG parity: the itemgrid kernel vs the XLA engine.

kernel_parity_run replays the kernel's exact schedule (salt streams,
draw formulas, update masks, tallies) with potentials computed by the
INDEPENDENT XLA work-item engine. With dyadic weights every potential
sum is exact in float32 regardless of summation order, so the two
implementations must agree BIT FOR BIT — converting what used to be
statistical kernel-vs-engine comparisons into exact ones (VERDICT r3
item 7 / ROADMAP item 4).
"""

import numpy as np
import pytest

import jax

from numbskull_tpu.compile import compile_graph
from numbskull_tpu.models import coin_model, ising_grid, lf_model
from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine
from numbskull_tpu.ops.parity import kernel_parity_run


def _assert_bit_equal(cg, seed=3, burn=4, epochs=30,
                      sample_evidence=True):
    eng = PallasItemGridEngine(cg, sample_evidence=sample_evidence,
                               interpret=True)
    x1, c1 = eng.run(seed=seed, burn=burn, epochs=epochs)
    x2, c2 = kernel_parity_run(cg, seed=seed, burn=burn, epochs=epochs,
                               sample_evidence=sample_evidence)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(c1, c2)
    return eng


def test_parity_coin_affine_bit_equal():
    """Affine kernel path (pairwise boolean factors), dyadic weights."""
    w, v, f, fm, dm, e = coin_model(8, 0.5, -0.25, 0.5, evidence=False,
                                    weight_init=(0.5, -0.25, 0.5),
                                    fixed=True)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = _assert_bit_equal(cg)
    assert bool((eng.plan.cmeta[:, 5] == 1).any())   # affine exercised


@pytest.mark.slow
def test_parity_ising_grid_bit_equal():
    """2-color lattice, longer run, evidence mixture."""
    w, v, f, fm, dm, e = ising_grid(6, 6, weight=0.5)
    v["isEvidence"][::7] = 1
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    _assert_bit_equal(cg, seed=11, burn=10, epochs=60)


def test_parity_ising_no_sample_evidence():
    """Evidence clamped (sample_evidence=False): update masks must
    replay identically too."""
    w, v, f, fm, dm, e = ising_grid(5, 5, weight=0.25)
    v["isEvidence"][:5] = 1
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    _assert_bit_equal(cg, seed=2, burn=3, epochs=40,
                      sample_evidence=False)


def test_parity_categorical_general_path_bit_equal():
    """Cardinality-3 LF graph: the general (non-affine) kernel path and
    the kmax>2 masked inverse-CDF draw."""
    w, v, f, fm, dm, e = lf_model(0.5, [0.5], copies=3, seed=1)
    w["initialValue"] = [0.5, 0.25]     # dyadic
    w["isFixed"] = True
    v["isEvidence"] = 0
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = _assert_bit_equal(cg, seed=5, burn=5, epochs=40)
    assert bool((eng.plan.cmeta[:, 5] == 0).any())   # general path hit


def test_parity_voting_sb4_bit_equal():
    """Plan-adaptive superblock (sb=4 here: 4 row blocks per color):
    the compact flat layout, pad-block masking, and per-block salt
    streams must replay bit-identically at sb < 8."""
    from numbskull_tpu.models import voting_grouped

    w, v, f, fm, dm, e = voting_grouped(10000, 3, weight=0.5)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = _assert_bit_equal(cg, seed=7, burn=2, epochs=8)
    assert eng.plan.sb == 4, eng.plan.sb
    assert bool((eng.plan.cmeta[:, 5] == 1).any())   # affine exercised


@pytest.mark.slow
@pytest.mark.parametrize("card", [64, 128])
def test_parity_potts_highcard_bit_equal(card):
    """High-cardinality Potts lattice (K_MAX_SUP raised 32 -> 128 in
    round 5): the vec-k path's candidate-on-sublanes eval and log-step
    inverse-CDF draw replay bit-identically through the XLA engine —
    the high-card fused path is exact, not just statistically close.
    Dyadic weight (0.25) keeps potential sums order-independent
    (module docstring)."""
    from numbskull_tpu.models import ising_color_hint, potts_grid

    w, v, f, fm, dm, e = potts_grid(8, 16, card=card, weight=0.25)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(8, 16))
    eng = _assert_bit_equal(cg, seed=3, burn=2, epochs=12)
    assert eng.plan.kmax == card


@pytest.mark.slow
def test_parity_general_path_block_beyond_128_positions():
    """The general/vec path draws (1, RB)-shaped uniform blocks (iotas
    (0, p)) while the affine path draws (8, 128) blocks (iotas
    (p//128, p%128)); the maps agree only below position 128, so every
    small fixture masked the distinction. This 512-var card-64 Potts
    (256 vars per color) exercises positions >= 128 through the
    general vec-k path — round-5 regression for the replay's
    per-path uniform map."""
    from numbskull_tpu.models import ising_color_hint, potts_grid

    w, v, f, fm, dm, e = potts_grid(16, 32, card=64, weight=0.25)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(16, 32))
    eng = _assert_bit_equal(cg, seed=3, burn=1, epochs=4)
    assert eng.plan.kmax == 64
    assert bool((eng.plan.cmeta[:, 5] == 0).any())
