"""SEM experiment metrics: oracle bid curves, AKNCP, NCP.

Reference: adcraft/experiment_utils/experiment_metrics.py. The oracle
curves here are computed in closed form / vectorized jnp instead of
sampling Python loops, and operate directly on ``KeywordState`` arrays —
one call covers all keywords (and vmaps over envs).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adcraft_tpu import distributions as dist
from adcraft_tpu.keywords import KeywordState

Array = jax.Array


def explicit_kw_bid_curves(
    kw: KeywordState, bid_array: Array, key: Array, n_samples: int = 2048
) -> Tuple[Array, Array]:
    """(impression_rate, median cost) per (keyword, bid).

    Reference ``get_explicit_kw_bid_cpc_impressions``
    (experiment_metrics.py:10-17): the impression rate is the threshold
    sigmoid; the cost summary is the median of cost-model samples per bid.
    Returns two (K, B) arrays.
    """
    bids = jnp.asarray(bid_array)[None, :]  # (1, B)
    rate = dist.threshold_sigmoid(
        bids, kw.imp_thresh[:, None], kw.imp_intercept[:, None], kw.imp_slope[:, None]
    )
    draws = dist.cost_create(
        key, bids[..., None], bids.shape[:1] + bids.shape[1:] + (n_samples,)
    )
    med = jnp.median(draws, axis=-1)
    med = jnp.broadcast_to(med, rate.shape)
    return rate, med


def implicit_kw_bid_curves(
    kw: KeywordState, bid_array: Array, key: Array, n_samples: int = 2048
) -> Tuple[Array, Array]:
    """(win rate, expected conditional second price) per (keyword, bid).

    Reference ``get_implicit_kw_bid_cpc_impressions``
    (experiment_metrics.py:20-37): sort n competitor-bid samples; a bid's
    win rate is the right-insertion quantile; its expected cost is the
    running mean of all samples at or below it. Reproduced sample-for-
    sample (same estimator, key-driven draws) so downstream AKNCP/NCP
    denominators have the same statistical behaviour. Returns (K, B).
    """
    K = kw.num_keywords
    samples = dist.abs_laplace_cents(
        key, kw.bid_loc[:, None], kw.bid_scale[:, None], (K, n_samples)
    )
    samples = jnp.sort(samples, axis=1)
    bids = jnp.asarray(bid_array)
    # right searchsorted per keyword row
    idx = jax.vmap(lambda row: jnp.searchsorted(row, bids, side="right"))(samples)
    win_rate = idx / n_samples
    idx_c = jnp.minimum(idx, n_samples - 1)
    running_mean = jnp.cumsum(samples, axis=1) / jnp.arange(1, n_samples + 1)
    expected_cpc = jnp.take_along_axis(running_mean, idx_c, axis=1)
    return win_rate, expected_cpc


def max_expected_bid_profits(
    vol_mean: Array,
    bctr: Array,
    sctr: Array,
    rev_mean: Array,
    expected_cpc_per_bid: Array,
    expected_impression_rate_per_bid: Array,
) -> Tuple[Array, Array, Array]:
    """Max expected profit over bids, positive-EV bid share, argmax bid index.

    Reference ``get_max_expected_bid_profits`` (experiment_metrics.py:40-61):
    ``expected_profit(b) = vol_mean * imp_rate(b) * bctr *
    (sctr * rev_mean - cpc(b))`` floored at 0; returns the documented
    2-tuple plus the argmax index the reference also returns (its 3-tuple
    quirk). Accepts (K,) params with (K, B) curves, or scalars with (B,).
    """
    params_shaped = jnp.asarray(vol_mean)[..., None]
    expected = jnp.maximum(
        params_shaped
        * expected_impression_rate_per_bid
        * jnp.asarray(bctr)[..., None]
        * (
            jnp.asarray(sctr)[..., None] * jnp.asarray(rev_mean)[..., None]
            - expected_cpc_per_bid
        ),
        0.0,
    )
    best = jnp.maximum(0.0, jnp.max(expected, axis=-1))
    pos_share = jnp.sum(expected > 0, axis=-1) / expected.shape[-1]
    best_idx = jnp.argmax(expected, axis=-1)
    return best, pos_share, best_idx


def compute_AKNCP(kw_profits: Array, ideal_profits: Array) -> Array:
    """Median over keywords of mean profit / mean ideal profit.

    Reference ``compute_AKNCP`` (experiment_metrics.py:64-75): ideal
    profits <= 0 are replaced by 1 before averaging over time (axis 0).
    Inputs are (T, K) arrays.
    """
    ideal = jnp.asarray(ideal_profits)
    denom = jnp.where(ideal <= 0, 1.0, ideal).mean(axis=0)
    return jnp.median(jnp.asarray(kw_profits).mean(axis=0) / denom)


def compute_NCP(kw_profits: Array, ideal_profits: Array) -> Array:
    """Total profit / total ideal profit (floored at 1).

    Reference ``compute_NCP`` (experiment_metrics.py:78-83).
    """
    denom = jnp.sum(jnp.asarray(ideal_profits))
    denom = jnp.where(denom <= 0.0, 1.0, denom)
    return jnp.sum(jnp.asarray(kw_profits)) / denom
