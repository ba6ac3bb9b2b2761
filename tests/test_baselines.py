"""Baseline-agent tests: cache semantics and end-to-end profitability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adcraft_tpu.baselines import (
    NaiveInterpolationStrategy,
    NaiveZeroMarginStrategy,
    expected_rev_per_buyside_click,
    init_rpc_cache,
    update_rpc_cache,
)
from adcraft_tpu.config import EnvConfig, KeywordKind
from adcraft_tpu.env import VectorBiddingEnv
from adcraft_tpu.quantiles import simple_experiment_table


@pytest.mark.unit
def test_rpc_cache_updates():
    cache = init_rpc_cache(2)
    obs = {
        "buyside_clicks": np.asarray([4, 0]),
        "sellside_conversions": np.asarray([2, 0]),
        "revenue": np.asarray([3.0, 0.0]),
    }
    cache = update_rpc_cache(cache, obs)
    # kw0: rpc = 3.0/2; sctr = (2 + 0.4*0)/4 = 0.5; one rpc obs
    assert float(cache.ave_rpc[0]) == pytest.approx(1.5)
    assert int(cache.num_rpc_obs[0]) == 1
    assert float(cache.ave_sctr[0]) == pytest.approx(0.5)
    assert float(cache.num_sctr_obs[0]) == 1.0
    # kw1: untouched (no clicks), prior sctr kept
    assert float(cache.ave_sctr[1]) == pytest.approx(0.4)
    assert int(cache.num_rpc_obs[1]) == 0


@pytest.mark.unit
def test_expected_rev_fallbacks():
    cache = init_rpc_cache(1)
    # no observations: hard-coded 0.3 prior (interpolated_expectations.py:168-175)
    assert float(expected_rev_per_buyside_click(cache)[0]) == pytest.approx(0.3)
    cache = cache._replace(num_sctr_obs=jnp.asarray([2.0]), ave_sctr=jnp.asarray([0.5]))
    assert float(expected_rev_per_buyside_click(cache)[0]) == pytest.approx(0.35)
    cache = cache._replace(num_rpc_obs=jnp.asarray([1]), ave_rpc=jnp.asarray([2.0]))
    assert float(expected_rev_per_buyside_click(cache)[0]) == pytest.approx(1.0)


@pytest.mark.unit
def test_zero_margin_ramps_then_bids_rpc(key):
    agent = NaiveZeroMarginStrategy(3)
    state = agent.init()
    # before any observations: ramp from 0.01 by 0.03
    state, action = agent.act(state, key)
    np.testing.assert_allclose(np.asarray(action["keyword_bids"]), 0.04, atol=1e-6)
    assert float(action["budget"]) == pytest.approx(300.0)
    # after revenue observed: bid = rpc * sctr
    obs = {
        "buyside_clicks": np.asarray([10, 10, 10]),
        "sellside_conversions": np.asarray([5, 5, 5]),
        "revenue": np.asarray([10.0, 10.0, 10.0]),
    }
    state = agent.update(state, action["keyword_bids"], obs)
    state, action = agent.act(state, jax.random.fold_in(key, 1))
    sctr = (5 + 0.4 * 0) / 10
    np.testing.assert_allclose(
        np.asarray(action["keyword_bids"]), 2.0 * sctr, atol=1e-5
    )
    assert float(action["budget"]) == pytest.approx(900.0)


@pytest.mark.unit
def test_zero_margin_profits_on_dense_env(key):
    """End-to-end: the baseline should make profit on the dense config
    (as in the reference paper's dense-regime results)."""
    cfg = EnvConfig(
        num_keywords=10, kind=KeywordKind.IMPLICIT, max_volume=576, max_days=40
    )
    venv = VectorBiddingEnv(cfg, 8, table=simple_experiment_table(128, 0.8))
    agent = NaiveZeroMarginStrategy(10)
    astate = jax.vmap(lambda _: agent.init())(jnp.arange(8))
    state, _ = venv.reset(key)
    total = np.zeros(8)
    k = key
    for day in range(40):
        k, k_act = jax.random.split(k)
        astate, action = jax.vmap(agent.act)(astate, jax.random.split(k_act, 8))
        state, ts = venv.step(
            state, action["keyword_bids"], action["budget"]
        )
        astate = jax.vmap(agent.update)(astate, action["keyword_bids"], ts.obs)
        total += np.asarray(ts.reward)
    assert total.mean() > 0, f"dense-config baseline lost money: {total}"


@pytest.mark.unit
def test_interpolation_agent_acts_and_learns(key):
    agent = NaiveInterpolationStrategy(4)
    state = agent.init()
    state, action = agent.act(state, key)
    bids = np.asarray(action["keyword_bids"])
    assert bids.shape == (4,)
    assert np.all(bids >= 0.01) and np.all(bids <= 3.0)
    assert float(action["budget"]) >= 1000.0
    obs = {
        "buyside_clicks": np.asarray([3, 0, 1, 2]),
        "sellside_conversions": np.asarray([1, 0, 1, 0]),
        "revenue": np.asarray([2.0, 0.0, 1.0, 0.0]),
        "cost": np.asarray([0.9, 0.0, 0.2, 0.5]),
    }
    state = agent.update(state, action["keyword_bids"], obs)
    # caches recorded the bid bin
    assert int(np.asarray(state.n_clicks).sum()) == 4
    assert int(np.asarray(state.n_cpc).sum()) == 3  # only kws with clicks
    margins, costs = agent.expected_margins(state)
    assert np.all(np.isfinite(np.asarray(margins)))
    state, action2 = agent.act(state, jax.random.fold_in(key, 2))
    assert np.asarray(action2["keyword_bids"]).shape == (4,)
