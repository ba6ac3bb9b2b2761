"""Headline benchmark: vectorized env-step throughput.

Reference baseline (BASELINE.md): ~1.4-2.4 env-steps/s on CPU for a
100-keyword, 60-day episode (timing notebook cells 5-7); midpoint 1.9
env-steps/s used as the comparison point. North star: >= 1M env-steps/s
per chip at 4096 vectorized envs.

Prints ONE JSON line. Headline fields:
  {"metric": "env_steps_per_sec_per_chip", "value": N,
   "unit": "env-steps/s/chip", "vs_baseline": N, ...}
plus (unless BENCH_QUICK=1):
  "scaling"  — env-batch scaling points (reference timing had none),
  "regimes"  — the reference's sparse timing config (cells 5-6),
  "roofline" — threefry words/env-day, measured words/s, and the
               PRNG-bound throughput ceiling this config can ever reach
               (PLAN.md "Roofline"; VERDICT r1 item 1/6).

Runs on whatever backend JAX selects (the driver runs it on one real TPU
chip). Headline config matches the reference's densest timing run: 100
implicit quantile keywords, mean_volume=128, cvr=0.8, 1000 budget —
with the reduced-draw sampling modes (conv counts, aggregate revenue,
16-bit lane uniforms, inversion binomials; each validated in
tests/test_step.py, deviations documented in PARITY.md).
"""

import json
import os
import time

# persistent compilation cache: the tunneled axon backend compiles this
# program remotely (minutes); cache hits make reruns start in seconds.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import jax
import jax.numpy as jnp

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
NUM_KEYWORDS = int(os.environ.get("BENCH_NUM_KEYWORDS", 100))
STEPS = int(os.environ.get("BENCH_STEPS", 12))
QUICK = os.environ.get("BENCH_QUICK", "0") == "1"
BASELINE_ENV_STEPS_PER_SEC = 1.9  # BASELINE.md derived midpoint


def bench_cfg(max_volume: int = 576, kind: str = "implicit"):
    from adcraft_tpu.config import EnvConfig, KeywordKind

    return EnvConfig(
        num_keywords=NUM_KEYWORDS,
        kind=KeywordKind(kind),
        max_volume=max_volume,
        max_days=60,
        day_kernel=os.environ.get("BENCH_KERNEL", "xla"),
        prng_impl=os.environ.get("BENCH_PRNG", "threefry2x32"),
        # reduced-draw sampling modes (the step is random-bits-bound;
        # see the roofline output + PLAN.md). Each is distribution-
        # validated; "lanes"/"exact"/32 are the injected-parity paths.
        conv_sampling=os.environ.get("BENCH_CONV", "counts"),
        rev_sampling=os.environ.get("BENCH_REV", "sum"),
        cost_sampling=os.environ.get("BENCH_COST", "agg"),
        lane_bits=int(os.environ.get("BENCH_LANE_BITS", "16")),
        binomial_sampler=os.environ.get("BENCH_BINOM", "inversion"),
        # chunked lazy-agg gate (scan of gate_chunk_t-sub-timestep
        # groups) + straggler compaction — the measured sweet spot
        # (PLAN.md "Measured perf (round 4/5)")
        gate_scope=os.environ.get("BENCH_GATE_SCOPE", "chunk"),
        agg_lite_lanes=int(os.environ.get("BENCH_LITE", "1")),
        gate_chunk_t=int(os.environ.get("BENCH_CHUNK_T", "4")),
        gate_compact=os.environ.get("BENCH_COMPACT", "auto"),
        gate_compact_phase_a=int(os.environ.get("BENCH_PHASE_A", "0")),
        gate_compact_cap=int(os.environ.get("BENCH_COMPACT_CAP", "0")),
        gate_scan_unroll=int(os.environ.get("BENCH_UNROLL", "1")),
        agg_draw_bits=int(os.environ.get("BENCH_AGG_BITS", "32")),
    )


def measure(cfg, num_envs: int, table, steps: int = STEPS,
            dispatch: str = None) -> float:
    """env-steps/s for one config; synchronizes by fetching a scalar
    (on the tunneled axon backend block_until_ready returns early,
    silently inflating throughput ~400x).

    ``dispatch`` picks how days are driven:
      "percall"  (default) a Python loop of day steps, one dispatch per
                 day — the interactive/gym-adapter shape and the r1-r4
                 measurement protocol. Measured FASTER than scan through
                 the async tunnel (13.3 vs 13.9 ms/step in-process):
                 dispatch pipelines for free, and the scan pays a small
                 per-day output-stacking cost.
      "scan"     the whole timing window is ONE device program
                 (VectorBiddingEnv.rollout, lax.scan over days) — the
                 shape RL rollouts use (agents/ppo.py); reported as an
                 extra.
    """
    from adcraft_tpu.env import VectorBiddingEnv

    dispatch = dispatch or os.environ.get("BENCH_DISPATCH", "percall")
    venv = VectorBiddingEnv(cfg, num_envs, table=table)
    key = jax.random.PRNGKey(0)
    state, _ = venv.reset(key)
    bids = jnp.full((num_envs, cfg.num_keywords), 1.0, jnp.float32)
    if dispatch == "scan":
        state, tss = venv.rollout(state, bids, steps)  # compile + warm
        float(tss.reward.sum())
        t0 = time.perf_counter()
        state, tss = venv.rollout(state, bids, steps)
        float(tss.reward.sum())
        dt = time.perf_counter() - t0
        return num_envs * steps / dt
    state, ts = venv.step(state, bids)  # compile + warm
    float(ts.reward.sum())
    t0 = time.perf_counter()
    for _ in range(steps):
        state, ts = venv.step(state, bids)
    float(ts.reward.sum())
    dt = time.perf_counter() - t0
    return num_envs * steps / dt


def main() -> None:
    from adcraft_tpu.profiling import (
        measure_threefry_words_per_sec,
        prng_words_per_env_day,
    )
    from adcraft_tpu.quantiles import simple_experiment_table

    import sys

    def note(msg):
        # progress to stderr as each number lands: the tunneled remote
        # compiler can drop mid-run, and the final JSON otherwise loses
        # everything measured before the crash
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    n_chips = jax.device_count()
    dense = simple_experiment_table(128, 0.8)
    cfg = bench_cfg()

    headline = measure(cfg, NUM_ENVS, dense) / n_chips
    note(f"headline {NUM_ENVS} envs: {headline:.1f} env-steps/s/chip")
    out = {
        "dispatch": os.environ.get("BENCH_DISPATCH", "percall"),
        "metric": "env_steps_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(headline / BASELINE_ENV_STEPS_PER_SEC, 1),
        "config": {
            "num_envs": NUM_ENVS,
            "num_keywords": NUM_KEYWORDS,
            "regime": "dense (mean_volume=128, cvr=0.8)",
            "max_volume": cfg.max_volume,
            "conv_sampling": cfg.conv_sampling,
            "rev_sampling": cfg.rev_sampling,
            "cost_sampling": cfg.cost_sampling,
            "lane_bits": cfg.lane_bits,
            "binomial_sampler": cfg.binomial_sampler,
            "gate_scope": cfg.gate_scope,
            "gate_chunk_t": cfg.gate_chunk_t,
            "agg_lite_lanes": cfg.agg_lite_lanes,
            "gate_compact": cfg.gate_compact,
            "gate_compact_cap": cfg.gate_compact_cap,
        },
    }

    if not QUICK:
        # Each extra section is best-effort: a dropped remote-compile
        # connection (observed) must not cost the already-measured
        # headline. Failures are noted in the JSON.
        try:
            # the in-program rollout shape (one lax.scan program per
            # timing window — how RL consumes the env); the delta vs the
            # headline bounds per-day dispatch cost (VERDICT r4 item 6:
            # measured ~zero through the async tunnel)
            scan_v = measure(cfg, NUM_ENVS, dense, dispatch="scan") / n_chips
            out["scan_rollout"] = round(scan_v, 1)
            note(f"scan-rollout dispatch variant: {scan_v:.1f}")
        except Exception as exc:  # pragma: no cover - tunnel flakiness
            out["scan_rollout_error"] = repr(exc)[:200]
            note(f"scan variant failed: {exc!r}")

        try:
            # env-batch scaling (VERDICT r1 item 6)
            scaling = {str(NUM_ENVS): round(headline, 1)}
            points = os.environ.get("BENCH_SCALING", "1024,8192")
            for e in (int(x) for x in points.split(",") if x):
                if e != NUM_ENVS:
                    scaling[str(e)] = round(measure(cfg, e, dense) / n_chips, 1)
                    note(f"scaling {e} envs: {scaling[str(e)]}")
            out["scaling"] = scaling
        except Exception as exc:  # pragma: no cover - tunnel flakiness
            out["scaling_error"] = repr(exc)[:200]
            note(f"scaling failed: {exc!r}")

        out["regimes"] = {}
        try:
            # the reference's sparse timing regime (cells 5-6: vol=16, cvr=0.1)
            sparse = simple_experiment_table(16, 0.1)
            sparse_cfg = bench_cfg(max_volume=128)  # covers round(N(16, 1+8))
            out["regimes"]["very_sparse_16_0.1"] = round(
                measure(sparse_cfg, NUM_ENVS, sparse) / n_chips, 1
            )
            note(f"sparse regime: {out['regimes']['very_sparse_16_0.1']}")
        except Exception as exc:  # pragma: no cover - tunnel flakiness
            out["regimes_error"] = repr(exc)[:200]
            note(f"regimes failed: {exc!r}")

        try:
            # dense EXPLICIT keywords on the same agg/gate knobs (round-4
            # explicit aggregate-cost support; VERDICT r3 item 4)
            expl_cfg = bench_cfg(kind="explicit")
            out["regimes"]["dense_explicit"] = round(
                measure(expl_cfg, NUM_ENVS, dense) / n_chips, 1
            )
            note(f"dense explicit regime: {out['regimes']['dense_explicit']}")
        except Exception as exc:  # pragma: no cover - tunnel flakiness
            out["regimes_explicit_error"] = repr(exc)[:200]
            note(f"explicit regime failed: {exc!r}")

        try:
            # the reference's DEFAULT ImplicitKeyword — binomial-pool
            # competitors — on the agg fast path (round-5 pool moments;
            # VERDICT r4 Weak #4)
            from adcraft_tpu.config import CompetitorModel

            pool_cfg = bench_cfg().replace(
                competitor_model=CompetitorModel.BINOMIAL_POOL
            )
            out["regimes"]["dense_pool"] = round(
                measure(pool_cfg, NUM_ENVS, dense) / n_chips, 1
            )
            note(f"dense pool regime: {out['regimes']['dense_pool']}")
        except Exception as exc:  # pragma: no cover - tunnel flakiness
            out["regimes_pool_error"] = repr(exc)[:200]
            note(f"pool regime failed: {exc!r}")

        try:
            # PRNG roofline: words/day and the measured threefry rate bound
            # what a sampling-dominated config can reach. The rate is the
            # median of 3 runs (single tunnel runs swing ~20x between
            # healthy and degraded service, PLAN.md "Perf model");
            # utilization > 1 means the step is NOT PRNG-bound at this
            # word count and is flagged rather than trusted.
            words = prng_words_per_env_day(cfg)
            rate = measure_threefry_words_per_sec()
            if words:
                ceiling = rate["median"] / words
                util = headline * n_chips / ceiling
                out["roofline"] = {
                    "prng_words_per_env_day": round(words),
                    "threefry_words_per_sec": round(rate["median"]),
                    "threefry_rate_spread": round(rate["spread"], 2),
                    "prng_bound_env_steps_per_sec": round(ceiling, 1),
                    "prng_utilization": round(util, 3),
                }
                # separate keys: both notes can apply at once, and the
                # spread warning matters most exactly when utilization
                # looks wrong
                if rate["spread"] > 3.0:
                    out["roofline"]["spread_note"] = (
                        "rate spread > 3x: some samples hit a degraded "
                        "tunnel; the median leans on healthy runs "
                        "(PLAN.md 'Perf model')"
                    )
                if util > 1.0:
                    out["roofline"]["util_note"] = (
                        "utilization > 1: step not PRNG-bound at this word "
                        "count (or the rate sample is degraded; spread above)"
                    )
                note(f"roofline: {out['roofline']}")
        except Exception as exc:  # pragma: no cover - tunnel flakiness
            out["roofline_error"] = repr(exc)[:200]
            note(f"roofline failed: {exc!r}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
