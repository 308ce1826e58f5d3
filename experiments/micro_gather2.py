"""Microbenchmark round 2: beating the one-hot-construction VPU cap.

Variants (all gather N values from a (trw, 128) f32 window):
  roll64     — affine path on (64, 128) slabs: one shift serves 8192
               values (per-op overhead amortized 8x vs (8,128))
  fact       — factorized one-hot: onehot16(l>>3) (x) onehot8(l&7);
               MXU contracts over 16, VPU combines over 8
  take       — jnp.take_along_axis on the lane axis inside the kernel
               (does Mosaic lower a native dynamic gather?)
  takes      — jnp.take along sublanes after lane matmul
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 1024


def bench(fn, *args, iters_outer=20):
    out = np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters_outer):
        out = fn(*args)
    out = np.asarray(out)
    dt = (time.perf_counter() - t0) / iters_outer
    return out, dt


def make_kernel(mode, trw, iters, ng):
    def kernel(x_ref, off_ref, shift_ref, o_ref):
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (trw, RB), 0)
        i16 = jax.lax.broadcasted_iota(jnp.int32, (16, RB), 0)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)

        def one(g, acc):
            off = off_ref[pl.ds(g, 1), :]
            win = x_ref[pl.ds(0, trw), :]
            if mode == "fact":
                l = off & 127
                # win (trw,16,8) -> contract 16 via MXU, combine 8 on VPU
                w2 = win.reshape(trw * 8, 16)   # row t, sub s8: [t*8+s8, s16]?
                # careful: lane l = s16*8 + s8 with reshape (16,8) order
                oh16 = (i16 == (l & 15)).astype(jnp.bfloat16)  # (16, RB)
                t1 = jax.lax.dot_general(
                    w2.astype(jnp.bfloat16), oh16,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (trw*8, RB)
                t1 = t1.reshape(trw, 8, RB)
                s8 = (l >> 4)
                r = (off >> 7)
                acc2 = jnp.zeros((1, RB), jnp.float32)
                for b in range(8):
                    sel = jnp.sum(
                        jnp.where(sub_iota == r, t1[:, b, :], 0.0),
                        axis=0, keepdims=True)
                    acc2 = acc2 + jnp.where(s8 == b, sel, 0.0)
                sel = acc2
            elif mode == "take":
                l = (off & 127).reshape(RB)
                r = (off >> 7)
                # lane-axis dynamic gather, then sublane select
                g1 = jnp.take_along_axis(
                    win, jnp.broadcast_to(l[None, :], (trw, RB)).astype(
                        jnp.int32) % 128, axis=1)
                sel = jnp.sum(jnp.where(sub_iota[:, :RB] == r, g1, 0.0),
                              axis=0, keepdims=True)
            return acc + sel

        def roll64(g, acc):
            c = shift_ref[g]
            b0, l0 = c // 128, c % 128
            a = x_ref[pl.ds(b0, 64), :]
            b = x_ref[pl.ds(b0 + 1, 64), :]
            ra = pltpu.roll(a, -l0, 1)
            rb = pltpu.roll(b, -l0, 1)
            sel = jnp.where(lane128 < 128 - l0, ra, rb)
            return acc + sel.reshape(8, RB).sum(0, keepdims=True)

        def it(i, acc):
            for g in range(ng):
                acc = roll64(g, acc) if mode == "roll64" else one(g, acc)
            return acc

        o_ref[...] = jax.lax.fori_loop(0, iters, it,
                                       jnp.zeros((1, RB), jnp.float32))

    return kernel


def run(mode, trw, iters, ng, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 2, size=(trw + 64, 128)).astype(np.float32)
    off = rng.integers(0, trw * 128, size=(ng, RB)).astype(np.int32)
    shift = rng.integers(0, max((trw - 64), 1) * 128,
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

    out, dt = bench(call, x, off, shift)
    per = 8 if mode == "roll64" else 1
    if mode == "roll64":
        want = np.zeros(RB * 8)
        for g in range(ng):
            c = int(shift[g])
            want += x.reshape(-1)[c:c + RB * 8]
        want = want.reshape(8, RB).sum(0)
    else:
        # reshape caveat: fact uses lane = s16*8+s8 consistent with
        # (16,8) C-order reshape of the lane dim — verify numerically
        want = x[:trw].reshape(-1)[off].sum(0)
    want = want * iters
    ok = np.allclose(out[0], want)
    nvals = RB * ng * iters * per
    print(f"{mode:8s} trw={trw:4d} ng={ng:3d} iters={iters:5d} "
          f"ok={ok} {dt*1e3:8.3f} ms  {nvals/dt/1e9:8.2f} Gvals/s",
          flush=True)
    return ok


if __name__ == "__main__":
    for mode in ("roll64", "fact", "take"):
        try:
            run(mode, trw=16, iters=2, ng=4)
        except Exception as e:
            print(mode, "FAILED:", str(e)[:300], flush=True)
    for mode in ("roll64", "fact", "take"):
        try:
            run(mode, trw=16, iters=2000, ng=16)
        except Exception as e:
            print(mode, "FAILED:", str(e)[:160], flush=True)
