"""Pallas day-kernel tests.

The CPU interpreter stubs the hardware PRNG (prng_random_bits returns
zeros), so CPU tests validate structure and the deterministic
control-flow consequences of zero randomness; statistical validation vs
the XLA path runs on real TPU (scripts/validate_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adcraft_tpu.config import CompetitorModel, EnvConfig, KeywordKind
from adcraft_tpu.keywords import make_keyword_state
from adcraft_tpu.pallas_kernels import pallas_simulate_day
from jax.experimental.pallas import tpu as pltpu

INTERP = pltpu.InterpretParams()

CFG = EnvConfig(
    num_keywords=4,
    kind=KeywordKind.IMPLICIT,
    competitor_model=CompetitorModel.SINGLE_ABS_CENTS,
    max_volume=96,
    timesteps_per_day=6,
)


def kwstate():
    return make_keyword_state(
        4,
        vol_mean=[40.0, 20.0, 60.0, 10.0],
        vol_std=2.0,
        bctr=0.5,
        sctr=0.5,
        rev_mean=1.0,
        rev_std=0.2,
        bid_loc=[0.4, 0.3, 0.6, 0.2],
        bid_scale=0.15,
        max_bidders=1,
        participation_rate=1.0,
    )


@pytest.mark.unit
def test_pallas_kernel_interpret_runs():
    E, K = 8, 4
    volumes = jnp.tile(jnp.asarray([[48, 24, 60, 12]], jnp.int32), (E, 1))
    day, conv = pallas_simulate_day(
        CFG,
        seed=jnp.asarray(7, jnp.int32),
        kw=kwstate(),
        bids=jnp.asarray([0.8, 0.5, 1.0, 0.3]),
        budget=jnp.full((E,), 100.0),
        volumes=volumes,
        e_block=8,
        interpret=INTERP,
    )
    assert day.impressions.shape == (E, K)
    assert conv.shape == (E,) and bool(np.all(np.asarray(conv)))
    # interpreter PRNG = all-zero bits -> u clipped to 1e-7: every
    # competitor bid |icdf(1e-7)| is large positive -> C > bid -> no wins
    np.testing.assert_array_equal(np.asarray(day.impressions), 0)
    np.testing.assert_array_equal(np.asarray(day.buyside_clicks), 0)
    np.testing.assert_allclose(np.asarray(day.cost), 0.0)
    # volumes pass through
    np.testing.assert_array_equal(np.asarray(day.volume), np.asarray(volumes))


@pytest.mark.unit
def test_pallas_kernel_rejects_unsupported_models():
    cfg = CFG.replace(kind=KeywordKind.EXPLICIT)
    with pytest.raises(NotImplementedError):
        pallas_simulate_day(
            cfg,
            seed=jnp.asarray(0, jnp.int32),
            kw=kwstate(),
            bids=jnp.ones(4),
            budget=jnp.ones(8),
            volumes=jnp.ones((8, 4), jnp.int32),
            interpret=INTERP,
        )


@pytest.mark.unit
def test_pallas_vector_env_step_interpret():
    """Batched env step through the pallas path: per-env keyword params,
    state bookkeeping (day/cumulative/drift) must match env semantics."""
    from adcraft_tpu.env import VectorBiddingEnv, vector_env_step_pallas
    from adcraft_tpu.quantiles import simple_experiment_table

    E = 8
    cfg = CFG.replace(day_kernel="pallas")
    table = simple_experiment_table(16, 0.5)
    venv = VectorBiddingEnv(cfg, E, table=table)
    state, obs = venv.reset(jax.random.PRNGKey(0))
    assert obs["impressions"].shape == (E, cfg.num_keywords)
    bids = jnp.full((E, cfg.num_keywords), 1.0)
    new_state, ts = vector_env_step_pallas(
        cfg, state, bids, None, interpret=INTERP
    )
    assert ts.reward.shape == (E,)
    assert np.all(np.asarray(new_state.day) == 1)
    assert np.all(np.asarray(ts.obs["days_passed"]) == 1)
    np.testing.assert_allclose(
        np.asarray(new_state.cumulative_profit), np.asarray(ts.reward)
    )
    imp = np.asarray(ts.outcomes.impressions)
    clicks = np.asarray(ts.outcomes.buyside_clicks)
    convs = np.asarray(ts.outcomes.sellside_conversions)
    assert np.all(clicks <= imp)
    assert np.all(convs <= clicks)
    assert np.all(imp <= np.asarray(ts.outcomes.volume))
    # shared budget respected per env
    assert np.all(np.asarray(ts.outcomes.cost).sum(axis=1) <= cfg.budget + 1e-6)
    # per-env params actually differ (each env sampled its own keywords)
    assert len(np.unique(np.asarray(state.kw.bid_loc))) > cfg.num_keywords
