"""Epoch-differenced rate measurement, shared by bench.py and the
experiment drivers.

The tunneled TPU backend adds a large PER-CALL constant (dispatch +
result transfer, measured 0.13-0.7 s, growing with the fetched array
size). Plain wall-clock folds that constant into the kernel time and
under-reports fused-kernel rates by up to 8x. Differencing two runs at
different in-kernel epoch counts isolates the on-device per-epoch rate
— the quantity a deployment amortizing epochs actually gets, and what
the reference's own per-epoch timers measure
(reference: numbskull/factorgraph.py:156-168).
"""

from __future__ import annotations

import time

import numpy as np

# Per-call tunnel constants observed by epoch_rate (seconds); exposed so
# callers can report a representative overhead once.
CALL_CONST: list[float] = []


def force(out):
    """Force completion of a device computation while transferring only
    ONE scalar (bulk result transfer over the tunnel costs 0.1-0.7 s
    with high variance — it must stay out of the timed region)."""
    a = out[0] if isinstance(out, (tuple, list)) else out
    if a is None or isinstance(a, np.ndarray):  # materialized by the run
        return
    np.asarray(a[(0,) * a.ndim])


def epoch_rate(run, units_per_epoch, lo=16, hi=1500, reps=3,
               min_delta=1.2, max_epochs=30000):
    """On-device rate via epoch differencing (see module docstring).

    ``run(epochs, rep)`` returns a device array (or tuple) that depends
    on the whole run; it is forced with a scalar fetch so bulk result
    transfer stays out of the timed region. The hi point is raised
    until the lo->hi wall-time delta reaches ``min_delta`` seconds
    (per-call tunnel jitter is ~±0.1 s, so a >=1.2 s delta bounds the
    rate error at ~10%), capped at ``max_epochs`` (the in-kernel tally
    limit). Returns (units_per_s, s_per_epoch)."""
    force(run(2, 0))              # compile + warm
    def best(ep):
        b = None
        for r in range(reps):
            t0 = time.perf_counter()
            force(run(ep, r))
            dt = time.perf_counter() - t0
            b = dt if b is None else min(b, dt)
        return b

    tlo = best(lo)
    for _ in range(4):
        thi = best(hi)
        per = max((thi - tlo) / (hi - lo), 1e-8)
        if thi - tlo >= min_delta or hi >= max_epochs:
            break
        hi = min(int(lo + 1.5 * min_delta / per), max_epochs)
    CALL_CONST.append(tlo - lo * per)
    return units_per_epoch / per, per
