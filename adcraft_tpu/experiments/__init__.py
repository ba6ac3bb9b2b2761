"""Experiment configs and harnesses (replace the reference notebooks)."""

from adcraft_tpu.experiments.configs import (
    NUM_KEYWORDS,
    MAX_DAYS,
    dense_env_config,
    semi_dense_env_config,
    sparse_env_config,
    very_sparse_env_config,
    non_stationary_dense_env_config,
    non_stationary_sparse_env_config,
    ENV_CONFIGS,
    build_experiment_env,
)

__all__ = [
    "NUM_KEYWORDS",
    "MAX_DAYS",
    "dense_env_config",
    "semi_dense_env_config",
    "sparse_env_config",
    "very_sparse_env_config",
    "non_stationary_dense_env_config",
    "non_stationary_sparse_env_config",
    "ENV_CONFIGS",
    "build_experiment_env",
]
