"""Headline benchmark: vectorized env-step throughput.

Reference baseline (BASELINE.md): ~1.4-2.4 env-steps/s on CPU for a
100-keyword, 60-day episode (timing notebook cells 5-7); midpoint 1.9
env-steps/s used as the comparison point. North star: >= 1M env-steps/s
per chip at 4096 vectorized envs.

Prints ONE JSON line:
  {"metric": "env_steps_per_sec_per_chip", "value": N,
   "unit": "env-steps/s/chip", "vs_baseline": N}

Runs on whatever backend JAX selects (the driver runs it on one real TPU
chip). Config matches the reference's densest timing run: 100 implicit
quantile keywords, mean_volume=128, cvr=0.8, 1000 budget.
"""

import json
import os
import sys
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
BASELINE_ENV_STEPS_PER_SEC = 1.9  # BASELINE.md derived midpoint


def main() -> None:
    from adcraft_tpu.config import EnvConfig, KeywordKind
    from adcraft_tpu.env import VectorBiddingEnv
    from adcraft_tpu.quantiles import simple_experiment_table

    cfg = EnvConfig(
        num_keywords=NUM_KEYWORDS,
        kind=KeywordKind.IMPLICIT,
        max_volume=576,  # covers round(N(128, 1+64)) draws
        max_days=60,
        day_kernel=os.environ.get("BENCH_KERNEL", "xla"),
        prng_impl=os.environ.get("BENCH_PRNG", "threefry2x32"),
        # Binomial(accepted, sctr) conversion counts instead of per-lane
        # flag tables: distribution-identical, removes a third of the
        # step's random draws (adcraft_tpu.config.EnvConfig.conv_sampling)
        conv_sampling=os.environ.get("BENCH_CONV", "counts"),
        # one whole-day lazy gate beats 24 per-sub-timestep gates here
        # (lazy sweeps are O(T*K + M), so the global scope's long-chain
        # hazard that sank the Jacobi gate does not apply): 8,834 -> 9,116
        gate_scope=os.environ.get("BENCH_GATE_SCOPE", "global"),
    )
    table = simple_experiment_table(128, 0.8)
    venv = VectorBiddingEnv(cfg, NUM_ENVS, table=table)

    key = jax.random.PRNGKey(0)
    state, _ = venv.reset(key)
    bids = jnp.full((NUM_ENVS, NUM_KEYWORDS), 1.0, jnp.float32)

    # compile + warm up. NB: fetch a scalar to synchronize — on the
    # tunneled axon backend block_until_ready returns before execution
    # finishes, which silently inflates throughput ~400x.
    state, ts = venv.step(state, bids)
    float(ts.reward.sum())

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, ts = venv.step(state, bids)
    float(ts.reward.sum())
    dt = time.perf_counter() - t0

    env_steps_per_sec = NUM_ENVS * STEPS / dt
    n_chips = jax.device_count()
    per_chip = env_steps_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(per_chip / BASELINE_ENV_STEPS_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
