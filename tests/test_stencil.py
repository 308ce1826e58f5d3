"""Stencil (lattice) engines vs exact enumeration and the general engine.

The Pallas kernel runs in interpreter mode on CPU (conftest forces the
CPU backend); on real TPU hardware bench.py exercises the compiled path.
"""

import numpy as np
import pytest

import jax

from numbskull_tpu import golden
from numbskull_tpu.compile import compile_graph
from numbskull_tpu.models import ising_color_hint, ising_grid
from numbskull_tpu.ops import GibbsEngine
from numbskull_tpu.ops.stencil import GridGibbsEngine
from numbskull_tpu.ops.stencil_pallas import PallasGridGibbsEngine


def _exact(n, m, w):
    wt, v, f, fm, dm, e = ising_grid(n, m, weight=w)
    return golden.exact_marginals(v, f, fm, wt["initialValue"])


def test_xla_stencil_matches_exact():
    eng = GridGibbsEngine(3, 3, 0.4)
    st = eng.init_state()
    st = eng.inference(st, jax.random.PRNGKey(0), epochs=8000, burn=300)
    marg = eng.marginals(st, 8000)
    exact = _exact(3, 3, 0.4)
    assert np.abs(marg.ravel() - exact[:, 1]).max() < 0.04


def test_pallas_stencil_mechanics_interpret():
    """CPU interpreter: pltpu.prng_random_bits is NOT emulated (returns
    zeros), so only kernel mechanics are checked here; the statistical
    test below runs on real TPU hardware (and bench.py always exercises
    the compiled kernel)."""
    eng = PallasGridGibbsEngine(8, 8, 0.4, interpret=True)
    x, cnt = eng.run(seed=0, burn=10, epochs=50)
    x, cnt = np.asarray(x), np.asarray(cnt)
    assert x.shape == (8, 8) and cnt.shape == (8, 8)
    assert ((x == 0) | (x == 1)).all()
    assert (cnt >= 0).all() and (cnt <= 50).all()
    x2, cnt2 = eng.run(seed=0, burn=10, epochs=50)
    assert (np.asarray(cnt2) == cnt).all()  # deterministic


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Pallas kernel needs TPU")
def test_pallas_stencil_matches_exact_tpu():
    eng = PallasGridGibbsEngine(3, 3, 0.4)
    x, cnt = eng.run(seed=0, burn=300, epochs=6000)
    marg = np.asarray(cnt, np.float64) / 6000
    exact = _exact(3, 3, 0.4)
    assert np.abs(marg.ravel() - exact[:, 1]).max() < 0.05


def test_stencil_matches_general_engine():
    """Same model through the general work-item engine and the stencil
    engine: same stationary marginals."""
    n = 4
    w, v, f, fm, dm, e = ising_grid(n, n, weight=0.5)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, n))
    eng_g = GibbsEngine(cg)
    st = eng_g.init_state()
    st = eng_g.inference(st, jax.random.PRNGKey(3), 6000, burn=300)
    marg_g = np.asarray(st.count, np.float64)[:, 1] / 6000

    eng_s = GridGibbsEngine(n, n, 0.5)
    gs = eng_s.init_state()
    gs = eng_s.inference(gs, jax.random.PRNGKey(4), 6000, burn=300)
    marg_s = eng_s.marginals(gs, 6000).ravel()

    assert np.abs(marg_g - marg_s).max() < 0.05


def test_stencil_bias_weight():
    """ISTRUE per-site bias pushes marginals off 0.5 as sigmoid(2b)."""
    eng = GridGibbsEngine(4, 4, 0.0, bias_weight=0.7)
    st = eng.init_state()
    st = eng.inference(st, jax.random.PRNGKey(0), epochs=8000, burn=100)
    marg = eng.marginals(st, 8000)
    want = 1.0 / (1.0 + np.exp(-1.4))
    assert marg.mean() == pytest.approx(want, abs=0.03)
