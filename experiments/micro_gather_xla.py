"""Microbenchmark: pure-XLA (non-Pallas) gather strategies on TPU.

The general work-item engine (ops/gibbs.py) is the universal
correctness path; its hot op is a scalar gather x[idx] with STATIC
indices (the color plan is fixed), measured at ~2.3e7 elem/s on v5e —
below the reference's numba CPU kernel. Candidates measured here:

  plain    x[idx]                       (N,) scalar gather, the r3 path
  row128   x2[(idx>>7)] * onehot(idx&127) summed over lanes
           (row gather of 128-lane rows + VPU lane select)
  rowtake  x2[(idx>>7)] then take_along_axis on the lane axis
  mm128    lane select via bf16 MXU matmul against a (128,128) identity
           slice — row gather + matmul select
  seg      x[idx] expressed as segment_sum of x over a static inverse
           map (scatter-as-gather; exercises XLA's scatter path)

Run: python experiments/micro_gather_xla.py [V] [N] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, reps=3):
    out = np.asarray(fn())          # compile + materialize
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return out, best


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, V, size=N).astype(np.int32))
    x0 = jnp.asarray(rng.standard_normal(V).astype(np.float32))

    def loop(body):
        def run():
            def it(i, acc):
                x = x0 + i.astype(jnp.float32)   # defeat CSE
                return acc + body(x)
            return jax.lax.fori_loop(0, iters, it,
                                     jnp.zeros(N, jnp.float32))
        return jax.jit(run)

    variants = {}
    variants["plain"] = loop(lambda x: x[idx])

    r_idx = idx >> 7
    l_idx = idx & 127
    loh = (l_idx[:, None] == jnp.arange(128)[None, :])

    def row128(x):
        rows = x.reshape(V // 128, 128)[r_idx]          # (N, 128)
        return jnp.sum(jnp.where(loh, rows, 0.0), axis=1)

    variants["row128"] = loop(row128)

    def rowtake(x):
        rows = x.reshape(V // 128, 128)[r_idx]
        return jnp.take_along_axis(rows, l_idx[:, None], axis=1)[:, 0]

    variants["rowtake"] = loop(rowtake)

    lohb = loh.astype(jnp.bfloat16)

    def mm128(x):
        rows = x.reshape(V // 128, 128)[r_idx]
        return jnp.sum(rows * lohb.astype(jnp.float32), axis=1)

    variants["mm128"] = loop(mm128)

    # row gather of 8-sublane rows: (V//8, 8)
    r8 = idx >> 3
    l8 = idx & 7
    loh8 = (l8[:, None] == jnp.arange(8)[None, :])

    def row8(x):
        rows = x.reshape(V // 8, 8)[r8]
        return jnp.sum(jnp.where(loh8, rows, 0.0), axis=1)

    variants["row8"] = loop(row8)

    print(f"V={V} N={N} iters={iters}  (elem/s = N*iters/dt)")
    want = None
    for name, fn in variants.items():
        out, dt = bench(fn)
        if want is None:
            want = out
        ok = bool(np.allclose(out, want, atol=1e-3))
        print(f"{name:8s} {N * iters / dt:.3e} elem/s   dt={dt:.3f}s "
              f"ok={ok}", flush=True)


if __name__ == "__main__":
    main()
