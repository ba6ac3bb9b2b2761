"""A2C / TD3 smoke tests (reference agent families, agent_configs.py)."""

import jax
import numpy as np
import pytest

from adcraft_tpu.agents.a2c import A2CConfig, A2CTrainer
from adcraft_tpu.agents.td3 import TD3Config, TD3Trainer
from adcraft_tpu.config import EnvConfig, KeywordKind
from adcraft_tpu.quantiles import simple_experiment_table


CFG = EnvConfig(num_keywords=3, kind=KeywordKind.IMPLICIT, max_volume=48, max_days=6)


@pytest.mark.unit
def test_a2c_train_step(key):
    trainer = A2CTrainer(
        CFG,
        num_envs=4,
        a2c_cfg=A2CConfig(rollout_days=3, hidden=(16, 16)),
        table=simple_experiment_table(16, 0.5),
    )
    state = trainer.init(key)
    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = trainer.train(state, 2)
    assert np.isfinite(metrics["loss"])
    changed = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.params, p0)
    )
    assert max(changed) > 0


@pytest.mark.unit
def test_td3_train_step(key):
    trainer = TD3Trainer(
        CFG,
        num_envs=4,
        cfg=TD3Config(
            buffer_size=256, batch_size=32, warmup_steps=8, hidden=(16, 16)
        ),
        table=simple_experiment_table(16, 0.5),
    )
    state = trainer.init(key)
    c0 = jax.tree.map(np.asarray, state.critic1)
    state, metrics = trainer.train(state, 3)
    assert np.isfinite(metrics["critic_loss"])
    assert metrics["buffer_size"] == 12.0
    changed = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.critic1, c0
        )
    )
    assert max(changed) > 0
    # targets move slowly (polyak)
    tdiff = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            state.target_critic1,
            state.critic1,
        )
    )
    assert max(tdiff) > 0
