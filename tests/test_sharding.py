"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The stand-in for multi-host validation (SURVEY.md §4): results must be
bit-identical between 1 device and 8, and state must actually be
distributed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adcraft_tpu.config import EnvConfig, KeywordKind
from adcraft_tpu.env import VectorBiddingEnv
from adcraft_tpu.parallel import make_env_mesh, sharded_vector_env
from adcraft_tpu.quantiles import simple_experiment_table


CFG = EnvConfig(num_keywords=5, kind=KeywordKind.IMPLICIT, max_volume=96, max_days=10)


@pytest.mark.unit
def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.unit
def test_sharded_env_matches_single_device(key):
    table = simple_experiment_table(32, 0.5)
    n_envs = 16
    plain = VectorBiddingEnv(CFG, n_envs, table=table)
    mesh = make_env_mesh()
    sharded = sharded_vector_env(CFG, n_envs, mesh=mesh, table=table)

    s0, o0 = plain.reset(key)
    s1, o1 = sharded.reset(key)
    bids = jnp.full((n_envs, CFG.num_keywords), 1.0)
    for _ in range(3):
        s0, t0 = plain.step(s0, bids)
        s1, t1 = sharded.step(s1, bids)
    np.testing.assert_array_equal(np.asarray(t0.reward), np.asarray(t1.reward))
    for k in t0.obs:
        np.testing.assert_array_equal(
            np.asarray(t0.obs[k]), np.asarray(t1.obs[k]), err_msg=k
        )


@pytest.mark.unit
def test_state_is_actually_sharded(key):
    table = simple_experiment_table(32, 0.5)
    mesh = make_env_mesh()
    sharded = sharded_vector_env(CFG, 16, mesh=mesh, table=table)
    state, _ = sharded.reset(key)
    sh = state.kw.vol_mean.sharding
    assert len(sh.device_set) == 8
    # each device holds 2 of the 16 envs
    shard_shapes = {s.data.shape for s in state.kw.vol_mean.addressable_shards}
    assert shard_shapes == {(2, CFG.num_keywords)}


@pytest.mark.unit
def test_uneven_envs_rejected():
    with pytest.raises(ValueError):
        sharded_vector_env(CFG, 9, mesh=make_env_mesh(),
                           table=simple_experiment_table(32, 0.5))
