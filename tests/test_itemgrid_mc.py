"""Multi-chip itemgrid engine: schedule invariants + gated kernel runs.

The exchange protocol's correctness rests on static properties of the
per-device schedule (shard_schedule): each color's row blocks partition
exactly across devices, every device owns the same block count per
color (a device's broadcast doubles as its done-token, so the receive
counts must be static), and the packed stacks reindex the same blocks.
These are verified here on CPU for several device counts.

Full multi-device kernel runs:
- on TPU pods (>= 2 real devices): test_itemgrid_mc_tpu below.
- the Pallas TPU *interpreter* executes this kernel correctly on ONE
  simulated device but stalls with >= 2 (its shared-memory simulation
  slows superlinearly with kernel op count x device threads — isolated
  to upstream: the unmodified single-chip kernel replicated over a
  2-device shard_map already stalls, while small kernels with the same
  remote-DMA/alias/SMEM features pass). The interpret-mode exchange
  PATTERN itself is validated in miniature in
  test_exchange_pattern_interpret.
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


def test_exchange_pattern_interpret():
    """The per-color exchange protocol (remote block broadcasts +
    descriptor-based send/recv waits) in miniature: 2 simulated devices
    swap their slabs; each ends with both."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    N = 2

    def kern(x_ref, o_ref, ssem, rsems):
        my = jax.lax.axis_index("g").astype(jnp.int32)
        o_ref[...] = x_ref[...]

        def send(s, _):
            peer = jax.lax.rem(my + 1 + s, N)
            src = o_ref.at[pl.ds(my * 8, 8)]
            pltpu.make_async_remote_copy(
                src_ref=src, dst_ref=src, send_sem=ssem,
                recv_sem=rsems.at[my], device_id=peer,
                device_id_type=pltpu.DeviceIdType.LOGICAL).start()
            return 0

        jax.lax.fori_loop(0, N - 1, send, 0)

        def swait(i, _):
            ref = o_ref.at[pl.ds(my * 8, 8)]
            pltpu.make_async_copy(ref, ref, ssem).wait()
            return 0

        jax.lax.fori_loop(0, N - 1, swait, 0)

        def rwait(s, _):
            peer = jax.lax.rem(my + 1 + s, N)
            dst = o_ref.at[pl.ds(peer * 8, 8)]
            pltpu.make_async_copy(dst, dst, rsems.at[peer]).wait()
            return 0

        jax.lax.fori_loop(0, N - 1, rwait, 0)

    mesh = Mesh(np.array(jax.devices()[:2]), ("g",))

    def dev_fn(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA((N,))],
            interpret=pltpu.InterpretParams(),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=7),
        )(x)

    f = jax.jit(shard_map(dev_fn, mesh=mesh, in_specs=P(),
                          out_specs=P(), check_vma=False))
    x = np.zeros((16, 128), np.float32)
    x[:8] = 5.0
    x[8:] = 9.0
    # device d's slab is rows [d*8, d*8+8); both should end with 5|9
    y = np.asarray(f(jnp.asarray(x)))
    assert (y[:8] == 5.0).all() and (y[8:] == 9.0).all()


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


def test_run_emulated_two_shards_end_to_end_marginals():
    """END-TO-END 2-device execution of the multi-chip itemgrid
    schedule (sequential emulation of the concurrent kernel — exactly
    equal by chromatic independence, same per-device salt streams):
    marginals must match the exact closed-form coin marginal."""
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
