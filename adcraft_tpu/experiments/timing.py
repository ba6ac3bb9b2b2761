"""Timing experiment: reproduces the reference's timing notebook measurements.

Reference: baseline_experiment_and_figs_notebooks/
timing_and_other_one_off_experiments.ipynb cells 5-7 — wall time of one
full 100-keyword x 60-day episode including the NaiveZeroMargin agent and
per-step oracle ideal-profit computation (BASELINE.md: 25-43 s/episode on
CPU). Here the same workload runs for a whole batch of envs in one jitted
rollout; reported per-episode time is batch time / batch size.
"""

from __future__ import annotations

import json
import time
from typing import Dict

import jax
import numpy as np

from adcraft_tpu.config import EnvConfig, KeywordKind
from adcraft_tpu.experiments.harness import run_episode_batch
from adcraft_tpu.quantiles import simple_experiment_table


def time_episode(
    mean_volume: float,
    cvr: float,
    num_envs: int = 64,
    num_keywords: int = 100,
    max_days: int = 60,
    non_stationary: bool = False,
) -> Dict[str, float]:
    cfg = EnvConfig(
        num_keywords=num_keywords,
        max_days=max_days,
        kind=KeywordKind.IMPLICIT,
        max_volume=int(max(32, 4 * mean_volume + 64)),
    )
    table = simple_experiment_table(mean_volume, cvr)
    mask = [True] * num_keywords if non_stationary else None
    env_seeds = list(range(num_envs // 4))
    agent_seeds = list(range(4))
    # warm-up/compile
    run_episode_batch(
        cfg, table, env_seeds[:1], agent_seeds[:1], num_days=1,
        updater_mask=mask,
    )
    t0 = time.perf_counter()
    out = run_episode_batch(
        cfg, table, env_seeds, agent_seeds, updater_mask=mask
    )
    dt = time.perf_counter() - t0
    episodes = out["kw_profits"].shape[0]
    return {
        "mean_volume": mean_volume,
        "cvr": cvr,
        "non_stationary": non_stationary,
        "episodes": episodes,
        "total_s": dt,
        "s_per_episode": dt / episodes,
        "episodes_per_s": episodes / dt,
    }


def main() -> None:
    # the three reference timing configs:
    # cell 5 non-stationary vol=16 cvr=0.1 (25.1 s/episode),
    # cell 6 stationary    vol=16 cvr=0.1 (27.9 s/episode),
    # cell 7 stationary    vol=128 cvr=0.8 (42.5 s/episode) — BASELINE.md
    for vol, cvr, ns in ((16, 0.1, True), (16, 0.1, False), (128, 0.8, False)):
        print(json.dumps(time_episode(vol, cvr, non_stationary=ns)))


if __name__ == "__main__":
    main()
