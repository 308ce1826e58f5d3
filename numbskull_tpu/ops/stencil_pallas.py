"""Pallas TPU kernel: fully-fused checkerboard Gibbs for lattice models.

The XLA stencil engine (ops/stencil.py) streams the grid through HBM once
per half-step and burns most of its time in counter-based RNG. This
kernel keeps the spin grid AND the tally counts resident in VMEM across
ALL epochs, uses the TPU's hardware PRNG (pltpu.prng_random_bits), and
fuses neighbor shifts + sigmoid + sampling + tally into one VPU loop —
zero HBM traffic between epochs.

Semantics identical to GridGibbsEngine / the general engine on the same
graph (EQUAL couplings + ISTRUE bias, P(x=1) = sigmoid(pot1 - pot0)).

Grid sizes are limited by VMEM (~16 MB/core): x (int32) + count (int32)
+ live temporaries must fit, i.e. up to ~1024x1024 cells. Larger grids
fall back to the XLA engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gibbs_kernel(seed_ref, x_in, burn_ref, epochs_ref, x_out, count_out,
                  *, n, m, weight, bias):
    pltpu.prng_seed(seed_ref[0])

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    parity = (rows + cols) % 2
    deg = (4.0
           - (rows == 0) - (rows == n - 1)
           - (cols == 0) - (cols == m - 1)).astype(jnp.float32)

    two_w = jnp.float32(2.0 * weight)
    two_b = jnp.float32(2.0 * bias)

    def nbr_sum(x):
        xf = x.astype(jnp.float32)
        # pltpu.roll requires non-negative shifts: -1 == size-1
        up = jnp.where(rows == 0, 0.0, pltpu.roll(xf, 1, 0))
        dn = jnp.where(rows == n - 1, 0.0, pltpu.roll(xf, n - 1, 0))
        lf = jnp.where(cols == 0, 0.0, pltpu.roll(xf, 1, 1))
        rt = jnp.where(cols == m - 1, 0.0, pltpu.roll(xf, m - 1, 1))
        return up + dn + lf + rt

    def half(x, pv):
        s = nbr_sum(x)
        dpot = two_w * (2.0 * s - deg) + two_b
        p1 = jax.nn.sigmoid(dpot)
        bits = pltpu.bitcast(pltpu.prng_random_bits((n, m)), jnp.uint32)
        # uint32 -> f32 isn't lowerable on TPU; go through int32 (>> 8
        # keeps the value in int32's positive range)
        u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * \
            jnp.float32(1.0 / (1 << 24))
        new = (u < p1).astype(jnp.int32)
        return jnp.where(parity == pv, new, x)

    def sweep(x):
        return half(half(x, 0), 1)

    x = x_in[:]
    burn = burn_ref[0]
    epochs = epochs_ref[0]
    x = jax.lax.fori_loop(0, burn, lambda i, x: sweep(x), x)

    count_out[:] = jnp.zeros((n, m), jnp.int32)

    def epoch_body(i, carry):
        x, cnt = carry
        x = sweep(x)
        return x, cnt + x

    x, cnt = jax.lax.fori_loop(0, epochs, epoch_body,
                               (x, count_out[:]))
    x_out[:] = x
    count_out[:] = cnt


@functools.partial(jax.jit,
                   static_argnames=("n", "m", "weight", "bias",
                                    "interpret"))
def grid_gibbs_pallas(x, seed, burn, epochs, *, n, m, weight, bias,
                      interpret=False):
    """Run burn + epochs checkerboard sweeps fully inside one kernel.

    Returns (x_final, count) where count tallies value==1 per cell over
    the tallied epochs. ``interpret=True`` runs the Pallas interpreter
    (CPU testing).
    """
    kernel = functools.partial(_gibbs_kernel, n=n, m=m, weight=weight,
                               bias=bias)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, m), jnp.int32),
                   jax.ShapeDtypeStruct((n, m), jnp.int32)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.SMEM),   # burn
            pl.BlockSpec(memory_space=pltpu.SMEM),   # epochs
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        # TPU-semantics interpreter (plain interpret=True cannot emulate
        # pltpu.prng_* on CPU)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.asarray([seed], jnp.int32), x,
      jnp.asarray([burn], jnp.int32), jnp.asarray([epochs], jnp.int32))


class PallasGridGibbsEngine:
    """Drop-in fast path for GridGibbsEngine on VMEM-sized grids."""

    MAX_CELLS = 1024 * 1024

    def __init__(self, n: int, m: int, weight: float,
                 bias_weight: float = 0.0, interpret: bool = False):
        assert n * m <= self.MAX_CELLS, \
            f"{n}x{m} exceeds VMEM budget; use GridGibbsEngine"
        self.n, self.m = n, m
        self.weight = float(weight)
        self.bias_weight = float(bias_weight)
        self.interpret = interpret

    def run(self, seed: int, burn: int, epochs: int,
            x0: np.ndarray | None = None):
        if x0 is None:
            key = jax.random.PRNGKey(seed)
            x0 = jax.random.bernoulli(key, 0.5, (self.n, self.m)).astype(
                jnp.int32)
        return grid_gibbs_pallas(x0, seed, burn, epochs, n=self.n,
                                 m=self.m, weight=self.weight,
                                 bias=self.bias_weight,
                                 interpret=self.interpret)
