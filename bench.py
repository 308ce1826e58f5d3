"""Benchmark: Gibbs variable-updates/s/chip on the flagship Ising model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: the fused Pallas checkerboard kernel (VMEM-resident state,
hardware PRNG, epoch loop inside the kernel) on a 1024x1024 Ising grid.
Extras report the general itemgrid kernel, the voting experiment family,
learning, chain replication, and the universal XLA path.

Baseline: the reference (HazyResearch/numbskull) publishes no numbers
(BASELINE.md); its engine is numba-JIT sequential Gibbs over a CSR index
(reference numbskull/inference.py:10-33), which sustains ~1e7 variable
updates/s/core on low-degree boolean graphs. BASELINE.json targets
>=100x that per chip. vs_baseline = ours / 1e7.

MEASUREMENT (round-4 fix): every rate is computed by EPOCH-COUNT
DIFFERENCING — time runs at two in-kernel epoch counts and divide the
delta. The tunneled backend adds a large PER-CALL constant (dispatch +
result transfer, measured 0.13-0.7 s growing with the count-array
size); plain wall-clock folded that constant into the kernel time and
UNDER-reported fused-kernel rates up to 8x in rounds 1-3 (e.g. the
general itemgrid kernel at 1024^2 is 3.5e9 updates/s, reported 4.1e8).
Differencing isolates the on-device rate — the quantity a deployment
amortizing epochs actually gets, and what the reference's own per-epoch
timers measure (factorgraph.py:156-168). The constant is reported once
as "call_overhead_s" for transparency.
"""

from __future__ import annotations

import json
import os
import sys

import jax
import numpy as np

from numbskull_tpu.benchutil import CALL_CONST as _CALL_CONST
from numbskull_tpu.benchutil import epoch_rate

NUMBA_CPU_BASELINE = 1.0e7  # updates/s, single-core numba CSR Gibbs


def _bench_pallas_grid(n: int):
    from numbskull_tpu.ops.stencil_pallas import PallasGridGibbsEngine

    eng = PallasGridGibbsEngine(n, n, 0.3)

    def run(ep, r):
        x, cnt = eng.run(seed=1 + r, burn=0, epochs=ep)
        return cnt

    ups, per = epoch_rate(run, n * n)
    cnt = np.asarray(run(200, 9))
    return ups, per, float(cnt.mean()) / 200


def _bench_xla_grid(n: int):
    from numbskull_tpu.ops.stencil import GridGibbsEngine

    eng = GridGibbsEngine(n, n, 0.3)
    st = eng.init_state()

    def run(ep, r):
        return eng.inference(st, jax.random.PRNGKey(1 + r),
                             epochs=ep).count

    ups, _ = epoch_rate(run, n * n, 50, 300)
    return ups


def _bench_general(n: int):
    """The universal XLA work-item engine (the padded row-major fast
    path; arbitrary graphs, any cardinality — the correctness-oracle /
    fallback path when a graph is outside the Pallas kernel envelope)."""
    from numbskull_tpu.compile import compile_graph
    from numbskull_tpu.models import ising_color_hint, ising_grid
    from numbskull_tpu.ops import GibbsEngine

    w, v, f, fm, dm, e = ising_grid(n, n, weight=0.3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, n))
    eng = GibbsEngine(cg)
    st = eng.init_state()

    def run(ep, r):
        return eng.inference(st, jax.random.PRNGKey(1 + r),
                             epochs=ep).count

    ups, _ = epoch_rate(run, n * n, 300, 1200)
    return ups


def _bench_potts_card64(n: int):
    """Cardinality-64 categorical (Potts) grid through the fused
    itemgrid kernel (K_MAX_SUP raised to 64 in round 5; the 64-way
    candidate loop + masked inverse-CDF draw are bit-validated against
    the XLA engine by the parity replay, tests/test_parity.py).
    Reference comparison: the numba kernel's draw loops over all 64
    candidate values per variable (inference.py:36-52), so its
    boolean-graph ~1e7 updates/s shrinks ~32x on this family. Falls
    back to the XLA engine outside the envelope."""
    from numbskull_tpu.compile import compile_graph
    from numbskull_tpu.models import ising_color_hint, potts_grid
    from numbskull_tpu.ops import GibbsEngine

    w, v, f, fm, dm, e = potts_grid(n, n, card=64, weight=0.2)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, n))
    try:
        from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine
        eng = PallasItemGridEngine(cg)

        def run(ep, r):
            return eng.run(seed=1 + r, burn=0, epochs=ep, host=False)

        ups, _ = epoch_rate(run, n * n, 50, 400)
        return ups, True
    except ValueError:
        eng = GibbsEngine(cg)
        st = eng.init_state()

        def run(ep, r):
            return eng.inference(st, jax.random.PRNGKey(1 + r),
                                 epochs=ep).count

        ups, _ = epoch_rate(run, n * n, 200, 800)
        return ups, False


def _bench_auto(n: int):
    """What a USER gets for a general (un-hinted) graph through the
    public API's auto engine dispatch — the itemgrid kernel when the
    graph is in its envelope, XLA otherwise."""
    from numbskull_tpu.compile import compile_graph
    from numbskull_tpu.models import ising_grid
    from numbskull_tpu.numbskull import FactorGraph

    w, v, f, fm, dm, e = ising_grid(n, n, weight=0.3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)   # no hint: general
    fg = FactorGraph(cg, 0)

    def run(ep, r):
        fg.inference(0, ep, sample_evidence=True)
        return None

    ups, _ = epoch_rate(run, n * n, 500, 3000)
    used_itemgrid = fg._itemgrid.get(True) is not None
    return ups, used_itemgrid


def _bench_itemgrid(n: int):
    """General-graph Pallas kernel (arbitrary boolean graphs): the fair
    apples-to-apples comparison with the reference's numba CSR engine —
    same graph representation generality, not a lattice-specialized
    kernel."""
    from numbskull_tpu.compile import compile_graph
    from numbskull_tpu.models import ising_color_hint, ising_grid
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    w, v, f, fm, dm, e = ising_grid(n, n, weight=0.3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, n))
    eng = PallasItemGridEngine(cg)

    def run(ep, r):
        return eng.run(seed=1 + r, burn=0, epochs=ep, host=False)

    ups, _ = epoch_rate(run, n * n, 300, 1500)
    x, cnt = eng.run(seed=9, burn=0, epochs=200)
    return ups, float(cnt[:, 1].mean()) / 200


def _bench_hbm_isolated():
    """The 33.5M-var HBM bench in a SUBPROCESS: the run needs most of
    the chip's HBM and has crashed the TPU worker on some worker
    lifetimes (allocator-state dependent, see hbm_scale.tsv's variance
    note) — isolation keeps one crash from voiding every other metric.
    The parent touches the device only after the child exits, so the
    clients never contend. Falls back to 16.7M once (after a pause for
    the worker to come back), then reports 0."""
    import subprocess
    import time as _time

    def attempt(n, m, timeout):
        r = subprocess.run(
            [sys.executable, "-c",
             "from bench import _bench_hbm; "
             "print('HBM_RESULT', _bench_hbm(%d, %d))" % (n, m)],
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in r.stdout.splitlines():
            if line.startswith("HBM_RESULT"):
                return float(line.split()[1])
        return None

    try:
        got = attempt(4096, 8192, 1200)
        if got is not None:
            return got, "33.5M"
    except Exception:
        pass
    _time.sleep(180)              # let a crashed worker restart
    try:
        got = attempt(4096, 4096, 900)
        if got is not None:
            return got, "16.7M (33.5M crashed the worker this run)"
    except Exception:
        pass
    _time.sleep(180)
    return 0.0, "failed (worker crash; see hbm_scale.tsv for recorded rates)"


def _bench_hbm(n: int, m: int):
    """HBM-resident engine at 33.5M variables — a scale the reference
    needed a 10-node salt cluster for (salt/src/numbskull_master.py:133-233).
    Chains and tallies live in HBM; value slabs stream to VMEM per row
    block (HG blocks per DMA set). Host graph compile goes through the
    plan cache so repeated bench runs skip the ~minutes-long compile."""
    import os

    from numbskull_tpu.compile import compile_graph
    from numbskull_tpu.models import ising_color_hint, ising_grid
    from numbskull_tpu.ops.itemgrid_pallas import HbmItemGridEngine

    cache = os.environ.get(
        "NSX_PLAN_CACHE", os.path.expanduser("~/.cache/numbskull_tpu"))
    w, v, f, fm, dm, e = ising_grid(n, m, weight=0.3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm,
                       color_hint=ising_color_hint(n, m),
                       cache=cache or None)
    eng = HbmItemGridEngine(cg)

    def run(ep, r):
        vals, counts = eng.run(seed=1 + r, burn=0, epochs=ep)
        return counts

    ups, _ = epoch_rate(run, n * m, lo=4, hi=40)
    return ups


def _bench_voting(n_vars: int, degree: int):
    """The reference's flagship degree experiment family (grouped
    voting: n_vars//degree disjoint AND factors of arity degree+1;
    salt/src/experiment_intro_degree.py) through the fused kernel —
    the graphs the reference needed a multi-machine cluster for."""
    from numbskull_tpu.compile import compile_graph
    from numbskull_tpu.models import voting_grouped
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    w, v, f, fm, dm, e = voting_grouped(n_vars, degree, weight=0.3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg)

    def run(ep, r):
        return eng.run(seed=1 + r, burn=0, epochs=ep, host=False)

    ups, _ = epoch_rate(run, len(v), 500, 3500)
    return ups


def _bench_learning(copies: int):
    """Weight-learn epochs/s on the coin model: in-kernel dual-chain SGD
    (Pallas itemgrid learn; reference analog: learnthread,
    learning.py:12-31). Round 5: affine learning colors run the
    lane-roll/shared-stats path, bit-identical to the general learn
    path by construction (tests/test_itemgrid_affine.py)."""
    from numbskull_tpu.compile import compile_graph
    from numbskull_tpu.models import coin_model
    from numbskull_tpu.ops.gibbs import LearnParams
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    w, v, f, fm, dm, e = coin_model(copies, 0.8, -0.5, 0.4, evidence=True,
                                    weight_init=(0.0, 0.0, 0.0),
                                    fixed=False, seed=3)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg)
    lp = LearnParams(regularization=2, reg_param=1e-4)
    state = {}

    def run(ep, r):
        state["wv"] = eng.learn(seed=1 + r, burn=0, epochs=ep,
                                stepsize=0.05, decay=0.999, lp=lp)
        return None

    sps, _ = epoch_rate(run, 1, 400, 2000)
    wv = state["wv"]
    # learned weights should move toward (0.8, -0.5, 0.4)
    ok = wv[0] > 0.2 and wv[1] < -0.1 and wv[2] > 0.1
    return sps, 2 * copies * sps, bool(ok)


def _bench_learning_voting(n_vars: int, degree: int):
    """In-kernel dual-chain SGD on the grouped-voting family — the
    graphs the reference actually LEARNED on across its cluster
    (salt/src/experiment_intro_degree.py:29-88 drives learning epochs;
    numbskull_master.py:174-233 sums the per-minion gradients). 30%
    evidence voters, learnable AND weight. Var-updates/s counts each
    variable once per epoch (the free chain; the clamped chain and the
    gradient pass are part of the epoch cost)."""
    from numbskull_tpu.compile import compile_graph
    from numbskull_tpu.models import voting_grouped
    from numbskull_tpu.ops.gibbs import LearnParams
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    w, v, f, fm, dm, e = voting_grouped(n_vars, degree, weight=0.0,
                                        fixed=False, evidence_frac=0.3,
                                        seed=2)
    cg = compile_graph(w, v, f, fm, domain_mask=dm)
    eng = PallasItemGridEngine(cg)
    lp = LearnParams(regularization=2, reg_param=1e-4)

    def run(ep, r):
        eng.learn(seed=1 + r, burn=0, epochs=ep, stepsize=0.01,
                  decay=0.999, lp=lp)
        return None

    sps, _ = epoch_rate(run, 1, 30, 300)
    return len(v) * sps


def _bench_chain_replication():
    """Replica-chain throughput recovery on one chip: C disjoint graph
    copies in one kernel vs one copy (reference's var_copies axis,
    factorgraph.py:48-53, made real).

    Measured regime map (round 5, epoch-differenced sweeps at 32^2 and
    64^2 x copies in {1,2,4,8,16,32}): a 32^2 copy is LAUNCH-BOUND —
    one copy and four copies both take the kernel's ~2.5 us epoch
    floor, so x4 replication is free (ratio ~4.0 = ~100%). A 64^2 copy
    already runs at ~45% of the kernel's saturated rate (~1.9e9 of
    ~4.4e9 updates/s), so its x4 ratio is capped at ~2.3 BY SATURATION:
    the marginal cost of each added copy equals the saturated
    throughput (measured 0.93 us per 4096-var copy = 4.4e9/s), and the
    ratio asymptote is R_sat/R_1 ~ 2.3. Round 4's in-code claim of
    '3.9x at 64^2' was this 32^2 measurement mislabeled; BENCH_r04's
    2.07 was the honest 64^2 number.

    Reported: ratio at x4 in the launch-bound regime (32^2 — the regime
    the reference's var_copies axis exists for: small per-chain state,
    idle compute to recover), plus the x32 aggregate rate at 64^2 whose
    fraction of the general kernel's 1024^2 rate shows replication
    driving the chip to saturation (~95%)."""
    from numbskull_tpu.compile import compile_graph
    from numbskull_tpu.models import ising_grid, replicate_graph
    from numbskull_tpu.ops.itemgrid_pallas import PallasItemGridEngine

    def ups(n, n_chains):
        args = replicate_graph(ising_grid(n, n, weight=0.3), n_chains)
        w, v, f, fm, dm, e = args
        cg = compile_graph(w, v, f, fm, domain_mask=dm)
        eng = PallasItemGridEngine(cg)

        def run(ep, r):
            return eng.run(seed=1 + r, burn=0, epochs=ep, host=False)

        rate, _ = epoch_rate(run, len(v), 16, 3000)
        return rate

    ratio_x4 = ups(32, 4) / ups(32, 1)
    sat_rate = ups(64, 32)
    return ratio_x4, sat_rate


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    # HBM first: the 33.5M-var engine needs most of the chip's HBM
    # (values + tallies + item tables); run it before the other
    # benches' buffers and cached executables accumulate (measured: a
    # worker OOM-crash when it ran last)
    hbm_ups, hbm_cfg = _bench_hbm_isolated()
    jax.clear_caches()
    ups, epoch_s, mean = _bench_pallas_grid(n)
    item_ups, item_mean = _bench_itemgrid(1024)
    learn_sps, learn_vups, learn_ok = _bench_learning(20000)
    learn_sps4, learn_vups_400k, _ = _bench_learning(200000)
    learn_voting_vups = _bench_learning_voting(200_000, 10)
    chain_ratio, chain_sat = _bench_chain_replication()
    xla_ups = _bench_xla_grid(2048)
    gen_ups = _bench_general(256)
    potts_ups, potts_kernel = _bench_potts_card64(128)
    auto_ups, auto_itemgrid = _bench_auto(256)
    voting_ups = _bench_voting(200_000, 10)
    voting50_ups = _bench_voting(204_000, 50)

    healthy = (0.2 < mean < 0.8) and (0.2 < item_mean < 0.8)
    result = {
        "metric": "gibbs_variable_updates_per_s_per_chip",
        "value": round(ups, 1),
        "unit": "updates/s",
        "vs_baseline": round(ups / NUMBA_CPU_BASELINE, 2),
        "config": f"ising {n}x{n}, fused pallas checkerboard kernel, "
                  "epoch-differenced",
        "device": str(jax.devices()[0]),
        "epoch_ms": round(1e3 * epoch_s, 4),
        "itemgrid_general_ups_1024": round(item_ups, 1),
        "itemgrid_vs_baseline": round(item_ups / NUMBA_CPU_BASELINE, 2),
        "xla_stencil_ups_2048": round(xla_ups, 1),
        "general_engine_ups_256": round(auto_ups, 1),
        "general_engine_used_itemgrid": auto_itemgrid,
        "xla_oracle_ups_256": round(gen_ups, 1),
        "categorical_card64_ups": round(potts_ups, 1),
        "categorical_card64_kernel_engaged": potts_kernel,
        "itemgrid_voting_deg10_ups": round(voting_ups, 1),
        "itemgrid_voting_deg50_ups": round(voting50_ups, 1),
        "hbm_ups_33M": round(hbm_ups, 1),
        "hbm_config": hbm_cfg,
        "learn_steps_per_s_40k_vars": round(learn_sps, 2),
        "learn_var_updates_per_s": round(learn_vups, 1),
        "learn_recovers_weights": learn_ok,
        "learn_var_updates_per_s_400k": round(learn_vups_400k, 1),
        "learn_voting_deg10_var_updates_per_s":
            round(learn_voting_vups, 1),
        "chain_replication_throughput_ratio_x4": round(chain_ratio, 3),
        "chain_replication_saturated_frac":
            round(chain_sat / item_ups, 3),
        "call_overhead_s": round(float(np.median(_CALL_CONST)), 3),
        "sampler_healthy": healthy,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
