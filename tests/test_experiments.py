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
