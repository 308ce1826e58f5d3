"""Microbenchmark: itemgrid gather primitive variants on real TPU.

Measures, inside a Pallas kernel that loops `iters` times over `ng`
gathers of RB=1024 values from a (trw, 128) window:

  a) f32 row-select-first (current production _gather_tiled shape)
  b) bf16 row-select-first
  c) bf16 lane-select-first (contraction over 128 lanes, sublane select
     on the VPU over trw rows)
  d) dynamic lane-roll affine path (two rolled slices + lane select)

Correctness is asserted against numpy for every variant at small iters
before timing. Run small shapes only — see memory notes re device
wedges from unvalidated large kernels.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 1024


def bench(fn, *args, iters_outer=20):
    out = np.asarray(fn(*args))    # compile + materialize
    t0 = time.perf_counter()
    for _ in range(iters_outer):
        out = fn(*args)
    out = np.asarray(out)
    dt = (time.perf_counter() - t0) / iters_outer
    return out, dt


def make_kernel(mode, trw, iters, ng):
    def kernel(x_ref, off_ref, shift_ref, o_ref):
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (trw, RB), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, RB), 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def one(g, acc):
            off = off_ref[pl.ds(g, 1), :]
            m = mode[:-4] if mode.endswith("_unr") else mode
            win = x_ref[pl.ds(0, trw), :]
            if m == "f32_row":
                roh = (sub_iota == (off >> 7)).astype(jnp.float32)
                rs = jax.lax.dot_general(
                    win, roh, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                loh = lane_iota == (off & 127)
                sel = jnp.sum(jnp.where(loh, rs, 0.0), axis=0,
                              keepdims=True)
            elif m == "bf16_row":
                roh = (sub_iota == (off >> 7)).astype(jnp.bfloat16)
                rs = jax.lax.dot_general(
                    win.astype(jnp.bfloat16), roh,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                loh = lane_iota == (off & 127)
                sel = jnp.sum(jnp.where(loh, rs, 0.0), axis=0,
                              keepdims=True)
            elif m == "bf16_lane":
                # lane select on MXU (contraction over 128 lanes), then
                # sublane select on the VPU over trw rows
                loh = (lane_iota == (off & 127)).astype(jnp.bfloat16)
                ls = jax.lax.dot_general(
                    win.astype(jnp.bfloat16), loh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (trw, RB)
                sel = jnp.sum(
                    jnp.where(sub_iota == (off >> 7), ls, 0.0),
                    axis=0, keepdims=True)
            elif m == "roll":
                # affine gather: out[r] = x[c + r]; c = shift_ref[g]
                c = shift_ref[g]
                b0, l0 = c // 128, c % 128
                a = x_ref[pl.ds(b0, 8), :]
                b = x_ref[pl.ds(b0 + 1, 8), :]
                ra = pltpu.roll(a, -l0, 1)
                rb = pltpu.roll(b, -l0, 1)
                sel = jnp.where(lane8 < 128 - l0, ra, rb).reshape(1, RB)
            return acc + sel

        def batched(acc):
            # ALL ng gathers in one MXU dot: loh (128, ng*RB) bf16
            off = off_ref[pl.ds(0, ng), :].reshape(1, ng * RB)
            win = x_ref[pl.ds(0, trw), :]
            li = jax.lax.broadcasted_iota(jnp.int32, (128, ng * RB), 0)
            si = jax.lax.broadcasted_iota(jnp.int32, (trw, ng * RB), 0)
            loh = (li == (off & 127)).astype(jnp.bfloat16)
            ls = jax.lax.dot_general(
                win.astype(jnp.bfloat16), loh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (trw, ng*RB)
            sel = jnp.sum(jnp.where(si == (off >> 7), ls, 0.0),
                          axis=0, keepdims=True)      # (1, ng*RB)
            return acc + sel.reshape(ng, RB).sum(0, keepdims=True)

        def it(i, acc):
            if mode == "bf16_batch":
                return batched(acc)
            if mode.endswith("_unr"):
                for g in range(ng):
                    acc = one(g, acc)
                return acc
            acc = jax.lax.fori_loop(0, ng, one, acc)
            return acc

        o_ref[...] = jax.lax.fori_loop(0, iters, it,
                                       jnp.zeros((1, RB), jnp.float32))

    return kernel


def run(mode, trw, iters, ng, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 2, size=(trw + 8, 128)).astype(np.float32)
    off = rng.integers(0, trw * 128, size=(ng, RB)).astype(np.int32)
    shift = rng.integers(0, max((trw - 8), 1) * 128,
                         size=(max(ng, 8),)).astype(np.int32)
    kernel = make_kernel(mode, trw, iters, ng)

    @jax.jit
    def call(x, off, shift):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, RB), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, off, shift)

    # correctness vs numpy (iters multiplies the same sum)
    out, dt = bench(call, x, off, shift)
    if mode == "roll":
        want = np.zeros(RB)
        for g in range(ng):
            c = int(shift[g])
            want += x.reshape(-1)[c:c + RB]
    else:
        want = x[:trw].reshape(-1)[off].sum(0)
    want = want * iters
    ok = np.allclose(out[0], want)
    nvals = RB * ng * iters
    print(f"{mode:10s} trw={trw:4d} ng={ng:3d} iters={iters:5d} "
          f"ok={ok} {dt*1e3:8.3f} ms  {nvals/dt/1e9:8.2f} Gvals/s")
    return ok


if __name__ == "__main__":
    import sys
    modes = ("f32_row", "bf16_lane", "bf16_lane_unr", "roll", "roll_unr",
             "bf16_batch")
    # tiny validation first (wedge safety), then timing shapes
    for mode in modes:
        run(mode, trw=16, iters=2, ng=4)
    for mode in modes:
        run(mode, trw=16, iters=2000, ng=16)
        run(mode, trw=16, iters=1000, ng=52)
    for mode in ("bf16_lane_unr", "bf16_batch"):
        run(mode, trw=8, iters=2000, ng=16)
        run(mode, trw=128, iters=200, ng=16)
