"""Multi-chip itemgrid engine: schedule invariants + real kernel runs.

The exchange protocol's correctness rests on static properties of the
per-device schedule (shard_schedule): each color's row blocks partition
exactly across devices, every device owns the same block count per
color (a device's broadcast doubles as its done-token, so the receive
counts must be static), and the packed stacks reindex the same blocks.
These are verified here on CPU for several device counts.

CONCURRENT execution of the genuine MC kernel on >= 2 simulated
devices (test_mc_concurrent_*): the former ">= 2 interpret devices
deadlock" was root-caused to ASYNC CPU DISPATCH — the interpreter runs
each simulated device's kernel as a chain of io_callbacks, and a
callback materializing an operand (np.array(val) in _allocate_buffer)
can block on a value whose producing computation is queued behind the
very computation the callback belongs to. With
jax_cpu_enable_async_dispatch=False (the autouse fixture below) every
operand is ready before its callback runs and the full engine-scale
kernel executes concurrently and deterministically; its results are
BIT-EQUAL to the sequential emulation (run_emulated), closing the loop
on the chromatic-independence argument.

Full multi-device HARDWARE runs still need a pod slice:
test_itemgrid_mc_tpu below.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from numbskull_tpu.compile import compile_graph
from numbskull_tpu.models import coin_model, ising_grid, ising_color_hint
from numbskull_tpu.ops.itemgrid_pallas import (
    RB, plan_item_grid, shard_schedule,
)


@pytest.fixture(autouse=True, scope="module")
def _sync_cpu_dispatch():
    """Disable async CPU dispatch for this module (see module docstring:
    async dispatch deadlocks multi-device Pallas interpret runs on
    small hosts). Restored afterwards."""
    prev = jax.config._read("jax_cpu_enable_async_dispatch")
    jax.config.update("jax_cpu_enable_async_dispatch", False)
    yield
    jax.config.update("jax_cpu_enable_async_dispatch", prev)


@pytest.mark.parametrize("n_g", [2, 4])
def test_shard_schedule_partitions_colors(n_g):
    w, v, f, fm, dm, e = ising_grid(20, 20, weight=0.3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(20, 20))
    plan, reason = plan_item_grid(cg, n_shards=n_g)
    assert plan is not None, reason
    (packed_mc, wbase_mc, cmeta_mc, gmeta, packed_a_mc,
     amet_mc) = shard_schedule(plan, n_g)
    rbl = RB // 128
    C = plan.cmeta.shape[0]
    for ci in range(C):
        rb_off, num_rb, row0r = (int(x) for x in plan.cmeta[ci, :3])
        # equal block counts per device; ranges tile the color exactly
        assert (gmeta[ci, :, 1] == num_rb // n_g).all()
        rows = []
        for d in range(n_g):
            r0, nb = int(gmeta[ci, d, 0]), int(gmeta[ci, d, 1])
            rows.extend(range(r0, r0 + nb * rbl))
            # device schedule mirrors the global one
            assert cmeta_mc[d, ci, 1] == nb
            assert cmeta_mc[d, ci, 2] == r0
            assert cmeta_mc[d, ci, 3] == plan.cmeta[ci, 3]
            assert cmeta_mc[d, ci, 4] == plan.cmeta[ci, 4]
        assert rows == list(range(row0r, row0r + num_rb * rbl))
        # per-device packed stacks hold exactly the claimed blocks
        for d in range(n_g):
            lo = int(cmeta_mc[d, ci, 0])
            nb = int(cmeta_mc[d, ci, 1])
            want = plan.packed[rb_off + d * nb:rb_off + (d + 1) * nb]
            assert (packed_mc[d, lo:lo + nb] == want).all()
            wwant = plan.wbase[rb_off + d * nb:rb_off + (d + 1) * nb]
            assert (wbase_mc[d, lo:lo + nb] == wwant).all()


def test_exchange_color_real_interpret():
    """The REAL _exchange_color (the MC kernel's per-color halo
    exchange) executed on 2 simulated devices: each device owns one
    8-row block of a 16-row value array and broadcasts it; both must
    end with the full array. This calls the exact function the fused
    kernel calls, with the kernel's cmeta/gmeta descriptor layout."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from numbskull_tpu.ops.itemgrid_pallas import _exchange_color

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    N, rbl = 2, 8

    def kern(cmeta_ref, gmeta_ref, x_ref, o_ref, ssem, rsems):
        my = jax.lax.axis_index("g").astype(jnp.int32)
        o_ref[...] = x_ref[...]
        _exchange_color(o_ref, cmeta_ref, gmeta_ref, 0, my, N, rbl,
                        ssem, rsems)

    mesh = Mesh(np.array(jax.devices()[:N]), ("g",))

    def dev_fn(cmeta_d, gmeta, x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N * rbl, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA((N,))],
            interpret=pltpu.InterpretParams(),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=7),
        )(cmeta_d[0], gmeta, x)

    f = jax.jit(shard_map(dev_fn, mesh=mesh, in_specs=(P("g"), P(), P()),
                          out_specs=P(), check_vma=False))
    # kernel descriptor layout: cmeta[ci,1]=n_blocks, cmeta[ci,2]=row0
    # (per device); gmeta[ci,peer]=(row0,n_blocks)
    cmeta = np.zeros((N, 1, 8), np.int32)
    for d in range(N):
        cmeta[d, 0, 1], cmeta[d, 0, 2] = 1, d * rbl
    gmeta = np.zeros((1, N, 2), np.int32)
    for d in range(N):
        gmeta[0, d] = (d * rbl, 1)
    # device d's input has ONLY its own slab filled; after the exchange
    # both devices must hold both slabs
    x = np.zeros((N * rbl, 128), np.float32)
    x[:rbl] = 5.0
    x[rbl:] = 9.0
    y = np.asarray(f(jnp.asarray(cmeta), jnp.asarray(gmeta),
                     jnp.asarray(x)))
    assert (y[:rbl] == 5.0).all() and (y[rbl:] == 9.0).all()


@pytest.mark.parametrize("n_g", [2, 4])
def test_mc_concurrent_bit_equal_to_emulated(n_g):
    """THE multi-chip validation: the genuine fused MC kernel (epoch
    loop, per-color remote-DMA exchange, tallies — the exact code a pod
    runs) executed CONCURRENTLY on simulated interpret devices is
    BIT-EQUAL to the sequential emulation, confirming the
    chromatic-independence equivalence with an actual concurrent
    execution rather than an argument. n_g=4 exercises multi-peer ring
    exchange (every device broadcasts to 3 peers).

    NOTE: the mesh must span FEWER devices than the CPU client owns —
    the client's callback thread pool sizes with its device count, and
    an interpret mesh over ALL devices can block every pool thread in
    a remote-DMA wait (4 shards on a 4-device client deadlocks; on the
    suite's 8-device client it runs in seconds)."""
    from numbskull_tpu.ops.itemgrid_pallas import MultiChipItemGridEngine

    if len(jax.devices()) <= n_g:
        pytest.skip("needs > %d devices" % n_g)
    w, v, f, fm, dm, e = coin_model(8, 0.3, -0.2, 0.4, evidence=False,
                                    weight_init=(0.3, -0.2, 0.4),
                                    fixed=True)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    mc = MultiChipItemGridEngine(cg, devices=jax.devices()[:n_g],
                                 interpret=True)
    assert mc.n_g == n_g
    x1, c1 = mc.run(seed=1, burn=2, epochs=10)
    x2, c2 = mc.run_emulated(seed=1, burn=2, epochs=10)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_mc_concurrent_learn_two_dev():
    """The MC LEARN kernel (dual-chain exchange of both chains + the
    fixed-order in-kernel gradient all-reduce) executed concurrently on
    2 simulated devices: weights move and are finite. (Gradient algebra
    is bit-validated against the single-chip kernel at n_g=1 below;
    this run proves the concurrent exchange/all-reduce code path
    executes.)"""
    from numbskull_tpu.ops.gibbs import LearnParams
    from numbskull_tpu.ops.itemgrid_pallas import MultiChipItemGridEngine

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    w, v, f, fm, dm, e = coin_model(40, 0.8, -0.5, 0.4, evidence=True,
                                    weight_init=(0.0, 0.0, 0.0),
                                    fixed=False, seed=3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    mc = MultiChipItemGridEngine(cg, devices=jax.devices()[:2],
                                 interpret=True)
    assert mc.n_g == 2
    wv = mc.learn(seed=7, burn=2, epochs=10, stepsize=0.05, decay=0.98,
                  lp=LearnParams(regularization=2, reg_param=1e-4))
    wv = np.asarray(wv)
    assert np.isfinite(wv).all()
    assert np.abs(wv).max() > 0.01      # gradients actually landed


@pytest.mark.skipif(
    "tpu" not in str(jax.devices()[0]).lower()
    and "axon" not in jax.default_backend().lower(),
    reason="needs TPU")
@pytest.mark.skipif(len(jax.devices()) < 2,
                    reason="needs >= 2 TPU devices (pod slice)")
def test_itemgrid_mc_tpu_matches_single_chip():
    """On a real multi-chip slice: sharded kernel marginals match the
    single-chip kernel statistically."""
    from numbskull_tpu.ops.itemgrid_pallas import (
        MultiChipItemGridEngine, PallasItemGridEngine,
    )

    w, v, f, fm, dm, e = coin_model(200, 0.3, -0.2, 0.4, evidence=False,
                                    weight_init=(0.3, -0.2, 0.4),
                                    fixed=True)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    mc = MultiChipItemGridEngine(cg, devices=jax.devices()[:2])
    x1, c1 = mc.run(seed=0, burn=100, epochs=2000)
    sc = PallasItemGridEngine(cg)
    x2, c2 = sc.run(seed=0, burn=100, epochs=2000)
    gap = np.abs(c1 / 2000 - c2 / 2000)
    assert np.sort(gap.ravel())[-10] < 0.05


@pytest.mark.slow
def test_mc_learn_single_shard_bit_equal_to_single_chip():
    """MultiChipItemGridEngine.learn at n_g=1: the multi-chip learn
    kernel (per-color exchange of both chains with zero peers + the
    fixed-order gradient all-reduce over one device) must be BIT-EQUAL
    to PallasItemGridEngine.learn — validating the distributed learning
    algebra that real pods exercise with n_g > 1 (reference analog:
    per-epoch minion dw summed at the master,
    salt/src/numbskull_master.py:174-233)."""
    from numbskull_tpu.models import coin_model
    from numbskull_tpu.ops.gibbs import LearnParams
    from numbskull_tpu.ops.itemgrid_pallas import (
        MultiChipItemGridEngine, PallasItemGridEngine)

    w, v, f, fm, dm, e = coin_model(40, 0.8, -0.5, 0.4, evidence=True,
                                    weight_init=(0.0, 0.0, 0.0),
                                    fixed=False, seed=3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    lp = LearnParams(regularization=2, reg_param=1e-4)
    single = PallasItemGridEngine(cg, interpret=True)
    w1, x1, xe1 = single.learn(seed=7, burn=3, epochs=15, stepsize=0.05,
                               decay=0.98, lp=lp, return_state=True)
    mc = MultiChipItemGridEngine(cg, devices=jax.devices()[:1],
                                 interpret=True)
    w2, x2, xe2 = mc.learn(seed=7, burn=3, epochs=15, stepsize=0.05,
                           decay=0.98, lp=lp, return_state=True)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(xe1, xe2)


def test_itemgrid_learn_beyond_1024_weights():
    """In-kernel learning with weight counts far beyond 1024 (the r2
    ROADMAP listed >1024 as an XLA fallback; the data-driven weight
    rows removed the cap): per-factor weights on 600 coin pairs = 1800
    weights learn in-kernel and move in the generating directions."""
    from numbskull_tpu import types as T
    from numbskull_tpu.models import coin_model
    from numbskull_tpu.ops.gibbs import LearnParams
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    w, v, f, fm, dm, e = coin_model(600, 0.8, -0.5, 0.4, evidence=True,
                                    weight_init=(0.0, 0.0, 0.0),
                                    fixed=False, seed=3)
    W = len(f)
    w2 = T.new_weights(W)
    w2["isFixed"] = False
    w2["initialValue"] = 0.0
    f2 = f.copy()
    f2["weightId"] = np.arange(W)
    cg = compile_graph(w2, v, f2, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg, interpret=True)
    assert cg.n_weights == 1800
    wv = eng.learn(seed=0, burn=3, epochs=25, stepsize=0.1,
                   lp=LearnParams(grad_agg="sum"))
    assert wv.shape == (1800,)
    assert np.abs(wv).max() > 0.05       # gradients actually landed


def test_mc_run_single_shard_bit_equal_to_single_chip():
    """The CONCURRENT MC kernel at n_g=1 (MC argument layout, device-id
    scalar, zero-peer exchange loops) must be bit-equal to the
    single-chip fused kernel — at n_shards=1 the salt stream formula
    (epoch*(COLOR_MAX+1)+ci)*n_shards+my collapses to the single-chip
    one. Regression for the round-5 mc_layout fix: _make_kernel used to
    build the single-chip signature at n_shards==1 while the MC engine
    passed MC-layout args, shifting every ref by two."""
    from numbskull_tpu.ops.itemgrid_pallas import (
        MultiChipItemGridEngine, PallasItemGridEngine)

    w, v, f, fm, dm, e = coin_model(8, 0.3, -0.2, 0.4, evidence=False,
                                    weight_init=(0.3, -0.2, 0.4),
                                    fixed=True)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    single = PallasItemGridEngine(cg, interpret=True)
    x1, c1 = single.run(seed=5, burn=2, epochs=8)
    mc = MultiChipItemGridEngine(cg, devices=jax.devices()[:1],
                                 interpret=True)
    x2, c2 = mc.run(seed=5, burn=2, epochs=8)
    np.testing.assert_array_equal(np.asarray(x1), x2)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


@pytest.mark.slow
def test_run_emulated_single_shard_bit_equal_to_single_chip():
    """run_emulated at n_g=1 executes the one-color kernel variant per
    (epoch, color) with host-side tallies; it must be BIT-EQUAL to the
    single-chip engine's fused epoch loop (same software-PRNG salt
    streams), validating that the emulation path computes exactly the
    kernel's schedule."""
    from numbskull_tpu.ops.itemgrid_pallas import (
        MultiChipItemGridEngine, PallasItemGridEngine)

    w, v, f, fm, dm, e = coin_model(12, 0.3, -0.2, 0.4, evidence=False,
                                    weight_init=(0.3, -0.2, 0.4),
                                    fixed=True)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    single = PallasItemGridEngine(cg, interpret=True)
    x1, c1 = single.run(seed=5, burn=4, epochs=40)
    mc = MultiChipItemGridEngine(cg, devices=jax.devices()[:1],
                                 interpret=True)
    x2, c2 = mc.run_emulated(seed=5, burn=4, epochs=40)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


@pytest.mark.slow
def test_run_emulated_two_shards_end_to_end_marginals():
    """END-TO-END 2-device execution of the multi-chip itemgrid
    schedule (sequential emulation — bit-equal to the concurrent kernel
    per test_mc_concurrent_bit_equal_to_emulated): marginals must match
    the exact closed-form coin marginal."""
    from numbskull_tpu.models import coin_exact_marginal
    from numbskull_tpu.ops.itemgrid_pallas import MultiChipItemGridEngine

    w, v, f, fm, dm, e = coin_model(8, 0.3, -0.2, 0.4, evidence=False,
                                    weight_init=(0.3, -0.2, 0.4),
                                    fixed=True)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    mc = MultiChipItemGridEngine(cg, devices=jax.devices()[:2],
                                 interpret=True)
    assert mc.n_g == 2
    epochs = 250
    x, c = mc.run_emulated(seed=1, burn=20, epochs=epochs)
    marg = c.astype(np.float64) / epochs
    ex = coin_exact_marginal(0.3, -0.2, 0.4)
    # vars alternate (x1, x2) per copy; joint is [p00, p01, p10, p11]
    # over (x1, x2): P(x1=1) = p10 + p11, P(x2=1) = p01 + p11
    p1 = float(ex[2] + ex[3])
    p2 = float(ex[1] + ex[3])
    got1 = marg[0::2, 1].mean()         # averaged over 8 copies
    got2 = marg[1::2, 1].mean()
    assert abs(got1 - p1) < 0.06, (got1, p1)
    assert abs(got2 - p2) < 0.06, (got2, p2)
