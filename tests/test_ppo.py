"""PPO training smoke tests (replaces the reference's RL notebook checks)."""

import jax
import numpy as np
import pytest

from adcraft_tpu.agents.ppo import PPOConfig, PPOTrainer
from adcraft_tpu.config import EnvConfig, KeywordKind
from adcraft_tpu.quantiles import simple_experiment_table


@pytest.mark.unit
def test_ppo_train_step_runs_and_updates(key):
    cfg = EnvConfig(
        num_keywords=3, kind=KeywordKind.IMPLICIT, max_volume=32, max_days=8
    )
    trainer = PPOTrainer(
        cfg,
        num_envs=4,
        ppo_cfg=PPOConfig(rollout_days=4, num_minibatches=2, num_epochs=2),
        table=simple_experiment_table(16, 0.5),
    )
    state = trainer.init(key)
    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = trainer.train(state, 2)
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["mean_reward"])
    assert int(state.step) == 2
    # parameters actually moved
    changed = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.params, p0
        )
    )
    assert max(changed) > 0


@pytest.mark.unit
def test_ppo_rollout_shapes(key):
    cfg = EnvConfig(
        num_keywords=2, kind=KeywordKind.IMPLICIT, max_volume=32, max_days=3
    )
    trainer = PPOTrainer(
        cfg,
        num_envs=3,
        ppo_cfg=PPOConfig(rollout_days=5, num_minibatches=1, num_epochs=1),
        table=simple_experiment_table(16, 0.5),
    )
    state = trainer.init(key)
    env_state, last_obs, _key, traj = trainer.rollout(state)
    assert traj.reward.shape == (5, 3)
    assert traj.obs.shape == (5, 3, trainer.obs_dim)
    # with max_days=3 every env must auto-reset during a 5-day rollout
    assert bool(np.asarray(traj.done).any())
    assert last_obs.shape == (3, trainer.obs_dim)
