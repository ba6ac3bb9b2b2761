"""Keyword state (struct-of-arrays pytree) and keyword generators.

The reference models each keyword as a Python object holding closure
samplers (``Keyword`` / ``ExplicitKeyword`` / ``ImplicitKeyword``,
adcraft/synthetic_kw_classes.py:120-688). Here a whole campaign of K
keywords is one pytree of (K,)-shaped arrays, vmappable to (E, K) for E
parallel envs and shardable over a device mesh.

Two generator families:

* ``sample_*`` — key-driven jnp versions, usable inside jit / on device.
* ``sample_*_numpy`` — seeded ``np.random.Generator`` versions whose draw
  order matches the reference exactly (for parity tests and the Gymnasium
  adapter, which mirrors reference reset semantics,
  gymnasium_kw_env.py:301-316).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adcraft_tpu import distributions as dist
from adcraft_tpu.quantiles import (
    IMPLICIT_PARAMS,
    QuantileTable,
    sample_from_quantiles,
    sample_from_quantiles_np,
)

Array = jax.Array

# Reference default CTR/CVR prior means (synthetic_kw_classes.py:410,434).
DEFAULT_BUYSIDE_CTR_AVG = 0.045086
DEFAULT_SELLSIDE_CTR_AVG = 0.367151
# Reference default bidder pool (synthetic_kw_classes.py:659-662).
DEFAULT_MAX_BIDDERS = 30
DEFAULT_PARTICIPATION_RATE = 3 / 5
# Reference default bid distribution (synthetic_kw_classes.py:681-683).
DEFAULT_BID_LOC = 0.0
DEFAULT_BID_SCALE = 0.1
# Explicit-keyword generator's fixed impression threshold
# (gymnasium_kw_utils.py:81).
EXPLICIT_GEN_IMP_THRESH = 0.05


class KeywordState(NamedTuple):
    """Per-keyword simulation parameters, shape (K,) (or (E, K) batched).

    Replaces ``Keyword`` object attributes + generating-params tuples
    (synthetic_kw_classes.py:158-171, gymnasium_kw_utils.py:20-28).
    """

    # volume distribution: round(max(N(vol_mean, vol_std), 0))
    vol_mean: Array  # f32
    vol_std: Array  # f32
    # reference quirk: non-stationary volume drift steps are scaled by the
    # *initial vol_std* — `init_volumes = [p[0][1] ...]` picks the tuple's
    # std slot (gymnasium_kw_env.py:136-137) despite the docstring saying
    # initial volume. Captured at reset, never drifts.
    vol_drift_ref: Array  # f32
    bctr: Array  # f32, buyside click-through rate
    sctr: Array  # f32, sellside paid conversion rate
    rev_mean: Array  # f32, per-conversion revenue mean
    rev_std: Array  # f32, per-conversion revenue std
    # explicit-keyword impression model (threshold_sigmoid params)
    imp_thresh: Array  # f32
    imp_intercept: Array  # f32
    imp_slope: Array  # f32
    # implicit-keyword competitor model
    bid_loc: Array  # f32
    bid_scale: Array  # f32
    max_bidders: Array  # f32 (binomial n)
    participation_rate: Array  # f32
    # non-stationarity: which keywords drift (updater_mask,
    # gymnasium_kw_env.py:100-112); None mask == all False
    updater_mask: Array  # bool

    @property
    def num_keywords(self) -> int:
        return self.vol_mean.shape[-1]


def _full(n: int, value, dtype=jnp.float32) -> Array:
    return jnp.full((n,), value, dtype=dtype)


def make_keyword_state(
    num_keywords: int,
    vol_mean,
    vol_std,
    bctr,
    sctr,
    rev_mean,
    rev_std,
    imp_thresh=0.0,
    imp_intercept=0.1,
    imp_slope=3.0,
    bid_loc=DEFAULT_BID_LOC,
    bid_scale=DEFAULT_BID_SCALE,
    max_bidders=DEFAULT_MAX_BIDDERS,
    participation_rate=DEFAULT_PARTICIPATION_RATE,
    updater_mask=None,
) -> KeywordState:
    """Build a KeywordState from scalars or (K,) arrays.

    Scalars broadcast across keywords. Constant daily volume (the base
    ``Keyword`` default of 1000, synthetic_kw_classes.py:386-389) is
    ``vol_mean=v, vol_std=0``. Defaults for the sigmoid params mirror the
    (intended) Rust defaults (src/lib.rs:95-98).
    """

    def arr(x, dtype=jnp.float32):
        x = jnp.asarray(x, dtype)
        return jnp.broadcast_to(x, (num_keywords,)).astype(dtype)

    vol_std_arr = arr(vol_std)
    if updater_mask is None:
        mask = jnp.zeros((num_keywords,), bool)
    else:
        mask = arr(updater_mask, bool)
    return KeywordState(
        vol_mean=arr(vol_mean),
        vol_std=vol_std_arr,
        vol_drift_ref=vol_std_arr,
        bctr=arr(bctr),
        sctr=arr(sctr),
        rev_mean=arr(rev_mean),
        rev_std=arr(rev_std),
        imp_thresh=arr(imp_thresh),
        imp_intercept=arr(imp_intercept),
        imp_slope=arr(imp_slope),
        bid_loc=arr(bid_loc),
        bid_scale=arr(bid_scale),
        max_bidders=arr(max_bidders),
        participation_rate=arr(participation_rate),
        updater_mask=mask,
    )


def default_keyword_state(
    key: Array,
    num_keywords: int,
    rev_mean,
    rev_std,
    volume: float = 1000.0,
    vol_std: float = 0.0,
    buyside_ctr=None,
    buyside_ctr_avg: float = DEFAULT_BUYSIDE_CTR_AVG,
    sellside_paid_ctr=None,
    sellside_paid_ctr_avg: float = DEFAULT_SELLSIDE_CTR_AVG,
    **overrides,
) -> KeywordState:
    """Keyword construction with the reference's default cascade.

    Mirrors the base ``Keyword`` initializers
    (synthetic_kw_classes.py:377-454): constant volume 1000 by default;
    buyside/sellside CTRs either given explicitly or sampled from
    Beta(1, (1-avg)/avg) around the (overridable) observed means; the
    revenue distribution must be specified (the reference raises without a
    reward sampler). Other params pass through to
    :func:`make_keyword_state`.
    """
    k_b, k_s = jax.random.split(key)
    if buyside_ctr is None:
        buyside_ctr = dist.beta_mean_alpha1(
            k_b, jnp.full((num_keywords,), buyside_ctr_avg)
        )
    if sellside_paid_ctr is None:
        sellside_paid_ctr = dist.beta_mean_alpha1(
            k_s, jnp.full((num_keywords,), sellside_paid_ctr_avg)
        )
    return make_keyword_state(
        num_keywords,
        vol_mean=volume,
        vol_std=vol_std,
        bctr=dist.probify(jnp.asarray(buyside_ctr, jnp.float32)),
        sctr=dist.probify(jnp.asarray(sellside_paid_ctr, jnp.float32)),
        rev_mean=rev_mean,
        rev_std=rev_std,
        **overrides,
    )


# ---------------------------------------------------------------------------
# random explicit keywords (reference sample_random_keywords,
# gymnasium_kw_utils.py:113-156)
# ---------------------------------------------------------------------------


def sample_explicit_keywords(
    key: Array, num_keywords: int, updater_mask=None
) -> KeywordState:
    """Key-driven version of ``sample_random_keywords``.

    Distributions (gymnasium_kw_utils.py:129-140):
    vol_mean = int(2^Beta(2,5) * 15 - 1); vol_std = U*0.5*(vol_mean+1);
    sctr = Beta(5,2); imp_intercept = U*1.5; rev_mean = Beta(2,5)*1.5;
    rev_std = Beta(2,5)*rev_mean; bctr = Beta(2,5); imp_slope = Beta(5,5)*25;
    imp_thresh fixed 0.05.
    """
    n = num_keywords
    ks = jax.random.split(key, 8)
    # NB binds as (2**beta)*15 - 1 (range 14..29), matching the reference's
    # actual precedence (gymnasium_kw_utils.py:129) — its "bounded above by
    # 16k" comment describes 2**(beta*15) which is NOT what it computes.
    v_mean = jnp.floor(2.0 ** jax.random.beta(ks[0], 2.0, 5.0, (n,)) * 15.0 - 1.0)
    v_std = jax.random.uniform(ks[1], (n,)) * 0.5 * (v_mean + 1.0)
    sctr = jax.random.beta(ks[2], 5.0, 2.0, (n,))
    imp_intercept = jax.random.uniform(ks[3], (n,)) * 1.5
    rev_mean = jax.random.beta(ks[4], 2.0, 5.0, (n,)) * 1.5
    rev_std = jax.random.beta(ks[5], 2.0, 5.0, (n,)) * rev_mean
    bctr = jax.random.beta(ks[6], 2.0, 5.0, (n,))
    imp_slope = jax.random.beta(ks[7], 5.0, 5.0, (n,)) * 25.0
    return make_keyword_state(
        n,
        vol_mean=v_mean,
        vol_std=v_std,
        bctr=bctr,
        sctr=sctr,
        rev_mean=rev_mean,
        rev_std=rev_std,
        imp_thresh=EXPLICIT_GEN_IMP_THRESH,
        imp_intercept=imp_intercept,
        imp_slope=imp_slope,
        updater_mask=updater_mask,
    )


def sample_explicit_keywords_numpy(
    rng: np.random.Generator, num_keywords: int, updater_mask=None
) -> KeywordState:
    """Reference-draw-order version of ``sample_random_keywords``.

    Matches gymnasium_kw_utils.py:129-140 exactly under the same
    ``np.random.Generator`` stream.
    """
    n = num_keywords
    v_mean = (2 ** rng.beta(2, 5, size=n) * 15 - 1).astype(int)
    # NB the reference computes 2**beta * 15 - 1 (binds as (2**b)*15-1,
    # gymnasium_kw_utils.py:129), not 2**(b*15)-1 as its comment implies.
    v_std = rng.random(size=n) * 0.5 * (v_mean + 1)
    sctr = rng.beta(5, 2, size=n)
    imp_intercept = rng.random(size=n) * 1.5
    rev_mean = rng.beta(2, 5, size=n) * 1.5
    rev_std = rng.beta(2, 5, size=n) * rev_mean
    bctr = rng.beta(2, 5, size=n)
    imp_slope = rng.beta(5, 5, size=n) * 25
    return make_keyword_state(
        n,
        vol_mean=v_mean.astype(np.float32),
        vol_std=v_std.astype(np.float32),
        bctr=bctr,
        sctr=sctr,
        rev_mean=rev_mean,
        rev_std=rev_std,
        imp_thresh=EXPLICIT_GEN_IMP_THRESH,
        imp_intercept=imp_intercept,
        imp_slope=imp_slope,
        updater_mask=updater_mask,
    )


# ---------------------------------------------------------------------------
# implicit keywords from quantile tables (reference
# sample_implicit_keywords_from_quantile_dfs, gymnasium_kw_utils.py:260-349)
# ---------------------------------------------------------------------------


def _implicit_state_from_params(
    n: int, vol_mean, vol_std, ave_cpc, std_cpc, bctr, sctr, rpsc, std_rpsc, updater_mask
) -> KeywordState:
    """Assemble the state the reference builds in
    ``generate_implicit_keyword_from_params`` (gymnasium_kw_utils.py:169-195):
    single competitor, bid ~ round(|Laplace(ave_cpc, std_cpc)|, 2),
    revenue ~ round(max(N(rpsc, std_rpsc), .01), 2)."""
    return make_keyword_state(
        n,
        vol_mean=vol_mean,
        vol_std=vol_std,
        bctr=bctr,
        sctr=sctr,
        rev_mean=rpsc,
        rev_std=std_rpsc,
        bid_loc=ave_cpc,
        bid_scale=std_cpc,
        max_bidders=1,
        participation_rate=1.0,
        updater_mask=updater_mask,
    )


def sample_implicit_keywords_numpy(
    rng: np.random.Generator,
    num_keywords: int,
    table: QuantileTable,
    no_vol_prob: float = 0.0,
    updater_mask=None,
) -> KeywordState:
    """Reference-draw-order implicit keyword sampling from a quantile table.

    Matches gymnasium_kw_utils.py:295-349 exactly: volume triple sampled
    first, then a per-keyword (condition-draw, branch-draw) pair deciding
    zero-volume keywords, then each of the six params in order, with std
    params un-normalized as ``max(0.01, std_mult * mean)``.
    """
    n = num_keywords
    raw_vol = sample_from_quantiles_np(n, table.param_triples("vol"), rng)
    vol_mean = np.empty(n)
    vol_std = np.empty(n)
    for i, v in enumerate(raw_vol):
        keep = rng.random() > no_vol_prob and not np.isnan(v)
        if keep:
            vol_mean[i] = int(v)
            vol_std[i] = int(1 + rng.random() * 0.5 * v)
        else:
            vol_mean[i] = 0
            vol_std[i] = rng.random() * 0.5
    cols = {}
    prev = None
    for p in IMPLICIT_PARAMS:
        vals = np.asarray(sample_from_quantiles_np(n, table.param_triples(p), rng))
        if p.startswith("std_"):
            vals = np.maximum(0.01, vals * cols[prev])
        cols[p] = vals
        prev = p
    return _implicit_state_from_params(
        n,
        vol_mean,
        vol_std,
        cols["ave_cpc"],
        cols["std_cpc"],
        cols["bctr"],
        cols["sctr"],
        cols["rpsc"],
        cols["std_rpsc"],
        updater_mask,
    )


def sample_implicit_keywords(
    key: Array,
    num_keywords: int,
    table: QuantileTable,
    no_vol_prob: float = 0.0,
    updater_mask=None,
) -> KeywordState:
    """Key-driven implicit keyword sampling (same distribution, jit-safe)."""
    n = num_keywords
    ks = jax.random.split(key, 10)
    raw_vol = sample_from_quantiles(ks[0], n, table.param_triples("vol"))
    keep = jax.random.uniform(ks[1], (n,)) > no_vol_prob
    u_branch = jax.random.uniform(ks[2], (n,))
    vol_mean = jnp.where(keep, jnp.floor(raw_vol), 0.0)
    vol_std = jnp.where(
        keep, jnp.floor(1.0 + u_branch * 0.5 * raw_vol), u_branch * 0.5
    )
    cols = {}
    prev = None
    for i, p in enumerate(IMPLICIT_PARAMS):
        vals = sample_from_quantiles(ks[3 + i], n, table.param_triples(p))
        if p.startswith("std_"):
            vals = jnp.maximum(0.01, vals * cols[prev])
        cols[p] = vals
        prev = p
    return _implicit_state_from_params(
        n,
        vol_mean,
        vol_std,
        cols["ave_cpc"],
        cols["std_cpc"],
        cols["bctr"],
        cols["sctr"],
        cols["rpsc"],
        cols["std_rpsc"],
        updater_mask,
    )


# ---------------------------------------------------------------------------
# param repr (reference gymnasium_kw_utils.py:352-380)
# ---------------------------------------------------------------------------

_PARAM_NAMES = (
    "volume",
    "imp_intercept",
    "imp_slope",
    "bctr",
    "sctr",
    "mean revenue",
    "std revenue",
)


def keyword_param_tuples(kw: KeywordState, implicit: bool) -> list:
    """Reference-style generating-params tuples for repr/metrics.

    Explicit: ((vol_mean, vol_std), imp_intercept, imp_slope, bctr, sctr,
    rev_mean, rev_std). Implicit: ((vol_mean, vol_std), bid_loc,
    1/bid_scale, bctr, sctr, rev_mean, rev_std) — the reference reports the
    *reciprocal* of the scale in slot 2 (gymnasium_kw_utils.py:195).
    """
    out = []
    for i in range(kw.num_keywords):
        vol = (float(kw.vol_mean[i]), float(kw.vol_std[i]))
        if implicit:
            second = float(kw.bid_loc[i])
            third = 1.0 / float(kw.bid_scale[i])
        else:
            second = float(kw.imp_intercept[i])
            third = float(kw.imp_slope[i])
        out.append(
            (
                vol,
                second,
                third,
                float(kw.bctr[i]),
                float(kw.sctr[i]),
                float(kw.rev_mean[i]),
                float(kw.rev_std[i]),
            )
        )
    return out


def repr_params(params) -> str:
    """Reference ``repr_params`` (gymnasium_kw_utils.py:352-370)."""
    return ",   ".join(
        name + f": {value}" for name, value in zip(_PARAM_NAMES, params)
    )


def repr_all_params(params_list) -> str:
    """Reference ``repr_all_params`` (gymnasium_kw_utils.py:373-380)."""
    return "\n".join(
        f"kw{n} params:\n {repr_params(params)}"
        for n, params in enumerate(params_list)
    )
