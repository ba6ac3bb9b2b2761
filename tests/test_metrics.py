"""Metric tests: AKNCP/NCP semantics and oracle bid curves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adcraft_tpu import metrics as M
from adcraft_tpu.keywords import make_keyword_state


@pytest.mark.unit
def test_akncp_perfect_agent_is_one():
    # "if ideal_profits is same as keyword_profits, then that should be 1"
    # (experiment_metrics.py:74)
    profits = np.abs(np.random.default_rng(0).normal(1.0, 0.3, (60, 10)))
    assert float(M.compute_AKNCP(profits, profits)) == pytest.approx(1.0)
    assert float(M.compute_NCP(profits, profits)) == pytest.approx(1.0)


@pytest.mark.unit
def test_akncp_nonpositive_ideal_replaced_by_one():
    profits = np.full((5, 3), 2.0)
    ideal = np.zeros((5, 3))  # all <= 0 -> denominator 1
    assert float(M.compute_AKNCP(profits, ideal)) == pytest.approx(2.0)
    assert float(M.compute_NCP(profits, ideal)) == pytest.approx(30.0)


@pytest.mark.unit
def test_ncp_ratio():
    profits = np.full((4, 2), 1.0)
    ideal = np.full((4, 2), 2.0)
    assert float(M.compute_NCP(profits, ideal)) == pytest.approx(0.5)
    assert float(M.compute_AKNCP(profits, ideal)) == pytest.approx(0.5)


@pytest.mark.unit
def test_implicit_bid_curves_monotone_and_calibrated(key):
    kw = make_keyword_state(
        3,
        vol_mean=100.0,
        vol_std=5.0,
        bctr=0.5,
        sctr=0.5,
        rev_mean=1.0,
        rev_std=0.1,
        bid_loc=jnp.asarray([0.3, 0.5, 0.8]),
        bid_scale=0.15,
    )
    bids = jnp.arange(0.01, 3.01, 0.01)
    win, cpc = M.implicit_kw_bid_curves(kw, bids, key, n_samples=4096)
    win = np.asarray(win)
    cpc = np.asarray(cpc)
    assert win.shape == (3, 300)
    # win rate nondecreasing in bid, and ~1 at bid >> loc
    assert np.all(np.diff(win, axis=1) >= -1e-9)
    assert np.all(win[:, -1] > 0.99)
    # a kw with higher bid_loc needs higher bids for the same win rate
    assert win[0, 50] > win[2, 50]
    # expected cpc below the bid in the winning region and nondecreasing
    assert np.all(np.diff(cpc, axis=1) >= -1e-9)
    # conditional second price at high bid approx E[|Laplace(loc, scale)|]
    assert cpc[0, -1] == pytest.approx(0.3 + 0.0, abs=0.1)


@pytest.mark.unit
def test_max_expected_bid_profits_shapes(key):
    kw = make_keyword_state(
        2, vol_mean=64.0, vol_std=2.0, bctr=0.5, sctr=0.5,
        rev_mean=1.5, rev_std=0.1, bid_loc=0.4, bid_scale=0.1,
    )
    bids = jnp.arange(0.01, 3.01, 0.01)
    win, cpc = M.implicit_kw_bid_curves(kw, bids, key)
    best, share, idx = M.max_expected_bid_profits(
        kw.vol_mean, kw.bctr, kw.sctr, kw.rev_mean, cpc, win
    )
    assert best.shape == (2,) and share.shape == (2,) and idx.shape == (2,)
    # profitable setup: sctr*rev = 0.75 >> typical cpc 0.4
    assert np.all(np.asarray(best) > 0)
    assert np.all((np.asarray(share) > 0) & (np.asarray(share) <= 1))


@pytest.mark.unit
def test_explicit_bid_curves(key):
    kw = make_keyword_state(
        2, vol_mean=64.0, vol_std=2.0, bctr=0.5, sctr=0.5,
        rev_mean=1.5, rev_std=0.1,
        imp_thresh=0.05, imp_intercept=jnp.asarray([0.5, 1.0]), imp_slope=5.0,
    )
    bids = jnp.arange(0.01, 3.01, 0.01)
    rate, med_cost = M.explicit_kw_bid_curves(kw, bids, key)
    rate = np.asarray(rate)
    assert rate.shape == (2, 300)
    assert np.all(np.diff(rate, axis=1) >= -1e-9)
    # 50% impression rate near the intercept
    assert rate[0, 49] == pytest.approx(0.5, abs=0.1)
    # rust-quirk cost model median ~ sqrt(bid)/4 + 2.2
    assert np.asarray(med_cost)[0, 99] == pytest.approx(2.45, abs=0.05)
