"""Fused-kernel vs numpy-oracle logic parity, and day-step invariants.

The injected-draw tests pin every piece of deterministic control flow
(budget gating, break-at-overspend, break-both-loops, conversion/revenue
accounting, impression-share bookkeeping) bit-for-bit against a loop-level
numpy implementation of the reference semantics (SURVEY.md §7 step 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adcraft_tpu.config import CompetitorModel, EnvConfig, KeywordKind
from adcraft_tpu.keywords import make_keyword_state
from adcraft_tpu.oracle import simulate_day_numpy
from adcraft_tpu.step import sample_day_draws, simulate_day, split_volume

IMPLICIT_CFG = EnvConfig(
    num_keywords=7,
    kind=KeywordKind.IMPLICIT,
    competitor_model=CompetitorModel.SINGLE_ABS_CENTS,
    max_volume=96,
    timesteps_per_day=24,
)

EXPLICIT_CFG = EnvConfig(
    num_keywords=5,
    kind=KeywordKind.EXPLICIT,
    max_volume=64,
    timesteps_per_day=24,
)

POOL_CFG = EnvConfig(
    num_keywords=4,
    kind=KeywordKind.IMPLICIT,
    competitor_model=CompetitorModel.BINOMIAL_POOL,
    max_volume=48,
    timesteps_per_day=12,
)


def implicit_kw(n, seed=0):
    rng = np.random.default_rng(seed)
    return make_keyword_state(
        n,
        vol_mean=rng.integers(10, 90, n).astype(float),
        vol_std=rng.uniform(1, 10, n),
        bctr=rng.uniform(0.2, 0.8, n),
        sctr=rng.uniform(0.2, 0.8, n),
        rev_mean=rng.uniform(0.5, 1.5, n),
        rev_std=rng.uniform(0.05, 0.3, n),
        bid_loc=rng.uniform(0.3, 1.0, n),
        bid_scale=rng.uniform(0.05, 0.3, n),
        max_bidders=1,
        participation_rate=1.0,
    )


def explicit_kw(n, seed=0):
    rng = np.random.default_rng(seed)
    return make_keyword_state(
        n,
        vol_mean=rng.integers(0, 40, n).astype(float),
        vol_std=rng.uniform(1, 8, n),
        bctr=rng.uniform(0.2, 0.8, n),
        sctr=rng.uniform(0.2, 0.8, n),
        rev_mean=rng.uniform(0.5, 1.5, n),
        rev_std=rng.uniform(0.05, 0.3, n),
        imp_thresh=0.05,
        imp_intercept=rng.uniform(0.1, 1.0, n),
        imp_slope=rng.uniform(2.0, 20.0, n),
    )


def pool_kw(n, seed=0):
    rng = np.random.default_rng(seed)
    return make_keyword_state(
        n,
        vol_mean=rng.integers(5, 40, n).astype(float),
        vol_std=rng.uniform(1, 5, n),
        bctr=rng.uniform(0.3, 0.8, n),
        sctr=rng.uniform(0.3, 0.8, n),
        rev_mean=rng.uniform(0.5, 1.5, n),
        rev_std=rng.uniform(0.05, 0.3, n),
        bid_loc=0.0,
        bid_scale=0.1,
        max_bidders=30,
        participation_rate=0.6,
    )


_JIT_CACHE = {}


def _jit_day(cfg):
    """One compiled simulate_day per cfg, shared across all param cases
    (budget/keywords/bids passed as arguments to avoid recompiles)."""
    if cfg not in _JIT_CACHE:
        _JIT_CACHE[cfg] = jax.jit(
            lambda k, kw, b, bud: simulate_day(cfg, k, kw, b, bud)
        )
    return _JIT_CACHE[cfg]


def _assert_day_matches_oracle(cfg, kw, bids, budget, seed, oracle=None):
    """Bit-level parity vs the loop oracle, in x64 (PLAN.md parity contract:
    f32 only disagrees with the f64 oracle at exact budget-boundary ties).
    ``oracle`` swaps in the C++ gate (simulate_day_native) for
    production-scale shapes."""
    if oracle is None:
        oracle = simulate_day_numpy
    with jax.enable_x64(True):
        cfg = cfg.replace(use_x64=True)
        key = jax.random.PRNGKey(seed)
        bids_r = (
            jnp.round(jnp.maximum(jnp.asarray(bids, jnp.float64), 0.01) * 100) / 100
        )
        day = _jit_day(cfg)(key, kw, bids_r, jnp.asarray(budget, jnp.float64))
        draws = sample_day_draws(cfg, key, kw, bids_r)
        day = jax.tree.map(np.asarray, day)
    ref = oracle(
        np.asarray(bids_r),
        budget,
        draws,
        timesteps=cfg.timesteps_per_day,
        cents=cfg.cents_costs,
    )
    np.testing.assert_array_equal(np.asarray(day.impressions), ref["impressions"])
    np.testing.assert_array_equal(
        np.asarray(day.buyside_clicks), ref["buyside_clicks"]
    )
    np.testing.assert_array_equal(
        np.asarray(day.sellside_conversions), ref["sellside_conversions"]
    )
    np.testing.assert_array_equal(np.asarray(day.volume), ref["volume"])
    np.testing.assert_array_equal(
        np.asarray(day.eligible_volume), ref["eligible_volume"]
    )
    np.testing.assert_allclose(np.asarray(day.cost), ref["cost"], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(day.revenue), ref["revenue"], rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(day.profit), ref["profit"], rtol=1e-5, atol=2e-4
    )
    return day, ref


@pytest.mark.unit
@pytest.mark.parametrize("seed", range(5))
def test_implicit_day_matches_oracle_unconstrained(seed):
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, seed)
    bids = np.random.default_rng(seed).uniform(0.1, 2.0, IMPLICIT_CFG.num_keywords)
    _assert_day_matches_oracle(IMPLICIT_CFG, kw, bids, 1e6, seed)


@pytest.mark.unit
@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("budget", [40.0, 12.0, 3.0, 0.5])
def test_implicit_day_matches_oracle_budget_bound(seed, budget):
    # small budgets force gating, mid-keyword breaks, and full-day breaks
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, seed + 100)
    bids = np.random.default_rng(seed).uniform(0.5, 2.5, IMPLICIT_CFG.num_keywords)
    day, ref = _assert_day_matches_oracle(IMPLICIT_CFG, kw, bids, budget, seed)
    assert float(np.sum(ref["cost"])) <= budget + 1e-5


@pytest.mark.unit
@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("budget", [1e6, 25.0, 2.0])
def test_explicit_day_matches_oracle(seed, budget):
    kw = explicit_kw(EXPLICIT_CFG.num_keywords, seed)
    bids = np.random.default_rng(seed).uniform(0.1, 2.0, EXPLICIT_CFG.num_keywords)
    _assert_day_matches_oracle(EXPLICIT_CFG, kw, bids, budget, seed)


@pytest.mark.unit
@pytest.mark.parametrize("seed", range(3))
def test_pool_day_matches_oracle(seed):
    kw = pool_kw(POOL_CFG.num_keywords, seed)
    bids = np.random.default_rng(seed).uniform(0.1, 1.0, POOL_CFG.num_keywords)
    _assert_day_matches_oracle(POOL_CFG, kw, bids, 50.0, seed)


@pytest.mark.unit
def test_split_volume_matches_reference_splitter():
    cfg = EnvConfig(num_keywords=4, max_volume=1024)
    vols = jnp.asarray([0, 1, 23, 24, 25, 100, 1023], jnp.int32)
    cfg = cfg.replace(num_keywords=len(vols))
    out = np.asarray(split_volume(cfg, vols))
    # reference: first gets vol - 23*(vol//24), rest get vol//24
    for i, v in enumerate(np.asarray(vols)):
        per = v // 24
        assert out[0, i] == v - 23 * per
        assert np.all(out[1:, i] == per)
        assert out[:, i].sum() == v


@pytest.mark.unit
@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("budget", [1e6, 40.0, 12.0, 3.0, 0.5, 0.0])
def test_jacobi_gate_matches_scan_gate(seed, budget):
    """The parallel fixed-point gate must be bit-identical to the
    sequential scan gate, including break and zero-budget cases."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, seed + 7)
    bids = jnp.asarray(
        np.random.default_rng(seed).uniform(0.3, 2.5, IMPLICIT_CFG.num_keywords)
    )
    key = jax.random.PRNGKey(seed)
    outs = {}
    for mode in ("scan", "jacobi", "lazy"):
        cfg = IMPLICIT_CFG.replace(gate_mode=mode)
        outs[mode] = jax.tree.map(
            np.asarray,
            _jit_day(cfg)(key, kw, bids, jnp.asarray(budget, jnp.float32)),
        )
    for other in ("jacobi", "lazy"):
        for field, a in outs["scan"]._asdict().items():
            np.testing.assert_array_equal(
                a, getattr(outs[other], field), err_msg=f"{other}:{field}"
            )


@pytest.mark.unit
@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("budget", [1e6, 40.0, 12.0, 3.0, 0.5, 0.0])
def test_global_gate_matches_per_t_gate(seed, budget):
    """Whole-day gating must be bit-identical to per-sub-timestep gating
    (both lexicographic forward substitution on the shared budget)."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, seed + 3)
    bids = jnp.asarray(
        np.random.default_rng(seed + 50).uniform(
            0.3, 2.5, IMPLICIT_CFG.num_keywords
        )
    )
    key = jax.random.PRNGKey(1000 + seed)
    outs = {}
    for scope in ("per_t", "global"):
        cfg = IMPLICIT_CFG.replace(gate_scope=scope)
        outs[scope] = jax.tree.map(
            np.asarray,
            _jit_day(cfg)(key, kw, bids, jnp.asarray(budget, jnp.float32)),
        )
    for field, a in outs["per_t"]._asdict().items():
        np.testing.assert_array_equal(
            a, getattr(outs["global"], field), err_msg=field
        )


@pytest.mark.unit
def test_conv_counts_mode_matches_lanes_distribution():
    """conv_sampling="counts" must match "lanes" in distribution:
    identical non-conversion outcomes per key (same draws up to the gate)
    and statistically equal conversion/revenue means."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 5)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    keys = jax.random.split(jax.random.PRNGKey(17), 256)
    outs = {}
    for mode in ("lanes", "counts"):
        cfg = IMPLICIT_CFG.replace(conv_sampling=mode)
        fn = jax.jit(
            jax.vmap(
                lambda k: simulate_day(cfg, k, kw, bids, jnp.asarray(1000.0))
            )
        )
        outs[mode] = jax.tree.map(np.asarray, fn(keys))
    # everything upstream of conversions is bit-identical (same key tree)
    for field in ("impressions", "buyside_clicks", "cost", "volume"):
        np.testing.assert_array_equal(
            getattr(outs["lanes"], field), getattr(outs["counts"], field),
            err_msg=field,
        )
    # conversions/revenue agree in distribution (256 episodes per mode)
    a = outs["lanes"].sellside_conversions.mean(axis=0)
    b = outs["counts"].sellside_conversions.mean(axis=0)
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.05)
    ra = outs["lanes"].revenue.mean(axis=0)
    rb = outs["counts"].revenue.mean(axis=0)
    np.testing.assert_allclose(ra.mean(), rb.mean(), rtol=0.05)


@pytest.mark.unit
def test_rev_sum_mode_matches_lanes_distribution():
    """rev_sampling="sum" must match "lanes" in distribution: identical
    non-revenue outcomes per key (same draws up to conversions) and
    statistically equal revenue mean/std (the aggregate draw carries the
    exact censored-normal per-draw moments)."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 6)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    keys = jax.random.split(jax.random.PRNGKey(23), 256)
    outs = {}
    for mode in ("lanes", "sum"):
        cfg = IMPLICIT_CFG.replace(rev_sampling=mode)
        fn = jax.jit(
            jax.vmap(
                lambda k: simulate_day(cfg, k, kw, bids, jnp.asarray(1000.0))
            )
        )
        outs[mode] = jax.tree.map(np.asarray, fn(keys))
    for field in (
        "impressions",
        "buyside_clicks",
        "cost",
        "volume",
        "sellside_conversions",
    ):
        np.testing.assert_array_equal(
            getattr(outs["lanes"], field), getattr(outs["sum"], field),
            err_msg=field,
        )
    ra = outs["lanes"].revenue
    rb = outs["sum"].revenue
    np.testing.assert_allclose(ra.mean(), rb.mean(), rtol=0.05)
    np.testing.assert_allclose(ra.std(), rb.std(), rtol=0.15)


@pytest.mark.unit
def test_rev_sum_exact_for_zero_std():
    """With rev_std == 0 the aggregate mode is exact: revenue ==
    conversions * round_cents(max(rev_mean, 0.01))."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 9)._replace(
        rev_std=jnp.zeros((IMPLICIT_CFG.num_keywords,), jnp.float32)
    )
    cfg = IMPLICIT_CFG.replace(rev_sampling="sum")
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    day = jax.jit(
        lambda k: simulate_day(cfg, k, kw, bids, jnp.asarray(1000.0))
    )(jax.random.PRNGKey(3))
    per_cents = np.round(np.maximum(np.asarray(kw.rev_mean), 0.01) * 100.0)
    np.testing.assert_allclose(
        np.asarray(day.revenue),
        np.asarray(day.sellside_conversions) * per_cents / 100.0,
        rtol=1e-6,
        atol=1e-6,
    )


@pytest.mark.unit
@pytest.mark.parametrize("seed", range(3))
def test_lane_bits16_injected_parity(seed):
    """lane_bits=16 stays bit-parity-testable: sample_day_draws mirrors the
    16-bit cost stream, so the oracle must still match exactly."""
    cfg = IMPLICIT_CFG.replace(lane_bits=16)
    kw = implicit_kw(cfg.num_keywords, seed + 40)
    bids = np.random.default_rng(seed).uniform(0.3, 2.0, cfg.num_keywords)
    _assert_day_matches_oracle(cfg, kw, bids, 20.0, seed)


@pytest.mark.unit
def test_lane_bits16_cost_distribution():
    """16-bit cost lanes must match the 32-bit distribution (the inverse
    CDF input is quantized to 2^-16 — invisible at cent granularity)."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 11)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    keys = jax.random.split(jax.random.PRNGKey(29), 256)
    outs = {}
    for bits in (32, 16):
        cfg = IMPLICIT_CFG.replace(lane_bits=bits)
        fn = jax.jit(
            jax.vmap(
                lambda k: simulate_day(cfg, k, kw, bids, jnp.asarray(1000.0))
            )
        )
        outs[bits] = jax.tree.map(np.asarray, fn(keys))
    # impressions/volume identical (cost lanes don't affect them)
    np.testing.assert_array_equal(outs[32].impressions, outs[16].impressions)
    np.testing.assert_allclose(
        outs[32].cost.mean(), outs[16].cost.mean(), rtol=0.03
    )


@pytest.mark.unit
def test_cost_agg_moments_exact():
    """single_cost_cent_moments must equal the f64 brute-force pmf of
    round(|truncated Laplace|, 2) in cents (the implicit-single per-click
    cost, synthetic_kw_helpers.py:104-113 conditioned on the win)."""
    from adcraft_tpu import distributions as dist

    def brute(bid, loc, scale, grid=304):
        y0 = max(bid - 0.005, 0.0)

        def F(x):
            z = (x - loc) / scale
            return 0.5 * np.exp(z) if z < 0 else 1.0 - 0.5 * np.exp(-z)

        def G(e):
            e = min(max(e, 0.0), y0)
            return F(e) - F(-e)

        z_norm = max(G(y0), 1e-300)
        pm = np.array(
            [
                max(G((i + 0.5) / 100) - G(max((i - 0.5) / 100, 0.0)), 0.0)
                for i in range(grid)
            ]
        ) / z_norm
        i = np.arange(grid)
        mu = (i * pm).sum()
        return mu, np.sqrt(((i - mu) ** 2 * pm).sum())

    cases = [
        (1.0, 0.5, 0.3),
        (0.31, 0.2, 0.1),
        (3.0, 1.0, 0.8),
        (0.05, 0.5, 0.3),
        (0.01, 0.5, 0.3),  # win only vs a 0-cent competitor: cost is 0
        (2.0, -0.4, 0.2),  # negative loc
    ]
    for bid, loc, scale in cases:
        mu_j, sd_j, cmax = dist.single_cost_cent_moments(
            jnp.asarray([bid]), jnp.asarray([loc]), jnp.asarray([scale]), 304
        )
        mu_n, sd_n = brute(bid, loc, scale)
        np.testing.assert_allclose(float(mu_j[0]), mu_n, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(sd_j[0]), sd_n, rtol=1e-4, atol=1e-4)
        assert float(cmax[0]) == max(round(bid * 100) - 1, 0)


@pytest.mark.unit
def test_cost_agg_mode_matches_lanes_distribution():
    """cost_sampling="agg" must match "lanes" in distribution: identical
    impressions/clicks/volume per key (same key slots up to costs) and
    statistically equal cost mean/std (the aggregate draw carries the
    exact discrete per-click cent moments)."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 13)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    keys = jax.random.split(jax.random.PRNGKey(31), 256)
    outs = {}
    for mode in ("lanes", "agg"):
        cfg = IMPLICIT_CFG.replace(cost_sampling=mode)
        fn = jax.jit(
            jax.vmap(
                lambda k: simulate_day(cfg, k, kw, bids, jnp.asarray(1000.0))
            )
        )
        outs[mode] = jax.tree.map(np.asarray, fn(keys))
    # everything upstream of costs is bit-identical (same key slots)
    for field in ("impressions", "buyside_clicks", "volume"):
        np.testing.assert_array_equal(
            getattr(outs["lanes"], field), getattr(outs["agg"], field),
            err_msg=field,
        )
    # per-keyword cost mean and std agree (256 episodes per mode)
    np.testing.assert_allclose(
        outs["lanes"].cost.mean(axis=0), outs["agg"].cost.mean(axis=0),
        rtol=0.05, atol=0.02,
    )
    np.testing.assert_allclose(
        outs["lanes"].cost.std(), outs["agg"].cost.std(), rtol=0.15
    )


@pytest.mark.unit
def test_cost_agg_lazy_gate_matches_scan_gate():
    """The lazy-agg gate must be bit-identical to the sequential scan
    evaluation of the same per-cell rule (full-by-aggregate /
    lane-resolve otherwise), across binding budgets, every scope
    (incl. the bench-default "chunk" with a gate_chunk_t that does NOT
    divide T-1)."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 14)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    base = IMPLICIT_CFG.replace(cost_sampling="agg")
    keys = jax.random.split(jax.random.PRNGKey(37), 16)
    # (gate_scope, gate_chunk_t) variants; T-1 = 23 is prime, so ct in
    # {3, 4} both exercise the zero-cell padding path
    variants = [
        ("global", 4),
        ("per_t", 4),
        ("chunk", 4),
        ("chunk", 3),
    ]
    def make(cfg):
        # budget as a traced argument: ONE compile per config, not per budget
        return jax.jit(
            jax.vmap(
                lambda k, bud, _c=cfg: simulate_day(_c, k, kw, bids, bud),
                in_axes=(0, None),
            )
        )

    for scope, ct in variants:
        fl = make(base.replace(
            gate_mode="lazy", gate_scope=scope, gate_chunk_t=ct,
        ))
        fs = make(base.replace(
            gate_mode="scan",
            gate_scope="per_t" if scope == "chunk" else scope,
            gate_chunk_t=ct,
        ))
        for budget in (0.5, 2.0, 8.0, 50.0):
            bud = jnp.asarray(budget, jnp.float32)
            a = jax.tree.map(np.asarray, fl(keys, bud))
            b = jax.tree.map(np.asarray, fs(keys, bud))
            for f, x, y in zip(a._fields, a, b):
                np.testing.assert_array_equal(
                    x, y, err_msg=f"{scope} ct={ct} budget={budget} field={f}"
                )
            # budget respected exactly (integer-cent gating)
            total = a.cost.sum(axis=1)
            assert np.all(total <= budget + 1e-6), (scope, budget, total.max())


@pytest.mark.unit
def test_cost_agg_spend_matches_lanes_under_binding_budget():
    """With a budget that binds most days, total day spend under agg must
    track the lanes path distributionally (the budget-partial cell is
    lane-resolved, so the break point has the right granularity)."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 15)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    keys = jax.random.split(jax.random.PRNGKey(41), 256)
    tot = {}
    for mode in ("lanes", "agg"):
        cfg = IMPLICIT_CFG.replace(cost_sampling=mode)
        fn = jax.jit(
            jax.vmap(
                lambda k: simulate_day(cfg, k, kw, bids, jnp.asarray(3.0))
            )
        )
        out = jax.tree.map(np.asarray, fn(keys))
        tot[mode] = out.cost.sum(axis=1)
        assert np.all(tot[mode] <= 3.0 + 1e-6)
    np.testing.assert_allclose(
        tot["lanes"].mean(), tot["agg"].mean(), rtol=0.03
    )


@pytest.mark.unit
def test_cost_agg_config_validation():
    """Config validation: every keyword/competitor model accepts agg as
    of round 5 (explicit since r4, the binomial pool via per-cell
    conditional quadrature moments since r5); injected-draw parity
    still requires the lanes modes."""
    EnvConfig(kind=KeywordKind.EXPLICIT, cost_sampling="agg")  # allowed (r4)
    EnvConfig(  # allowed (r5): pool rides the agg fast path
        kind=KeywordKind.IMPLICIT,
        competitor_model=CompetitorModel.BINOMIAL_POOL,
        cost_sampling="agg",
    )
    with pytest.raises(ValueError):
        sample_day_draws(
            IMPLICIT_CFG.replace(cost_sampling="agg"),
            jax.random.PRNGKey(0),
            implicit_kw(IMPLICIT_CFG.num_keywords),
            jnp.full((IMPLICIT_CFG.num_keywords,), 1.0),
        )


@pytest.mark.unit
@pytest.mark.parametrize("seed", range(3))
def test_binomial_inversion_injected_parity(seed):
    """binomial_sampler="inversion" stays bit-parity-testable:
    sample_day_draws mirrors the same inverse-CDF draws, so the injected
    oracle must still match exactly (the gate semantics are untouched)."""
    cfg = IMPLICIT_CFG.replace(binomial_sampler="inversion", lane_bits=16)
    kw = implicit_kw(cfg.num_keywords, seed + 60)
    bids = np.random.default_rng(seed).uniform(0.3, 2.0, cfg.num_keywords)
    _assert_day_matches_oracle(cfg, kw, bids, 20.0, seed)


@pytest.mark.unit
def test_binomial_inversion_matches_exact_distribution():
    """The inversion sampler must match jax.random.binomial in
    distribution through the full day step (impressions, clicks,
    conversions means over 256 episodes)."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 13)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    keys = jax.random.split(jax.random.PRNGKey(31), 256)
    outs = {}
    for mode in ("exact", "inversion"):
        cfg = IMPLICIT_CFG.replace(binomial_sampler=mode)
        fn = jax.jit(
            jax.vmap(
                lambda k: simulate_day(cfg, k, kw, bids, jnp.asarray(1000.0))
            )
        )
        outs[mode] = jax.tree.map(np.asarray, fn(keys))
    for field in ("impressions", "buyside_clicks", "sellside_conversions"):
        a = getattr(outs["exact"], field).mean()
        b = getattr(outs["inversion"], field).mean()
        np.testing.assert_allclose(a, b, rtol=0.05, err_msg=field)
    # volume is upstream of any binomial — bit-identical
    np.testing.assert_array_equal(outs["exact"].volume, outs["inversion"].volume)


@pytest.mark.unit
def test_lazy_gate_fuzz_vs_scan_gate():
    """Randomized adversarial gate inputs (zero costs, zero budgets,
    break-at-every-position): lazy must equal the sequential scan gate
    bit-for-bit."""
    from functools import partial

    from adcraft_tpu.step import _gate_keywords, _gate_keywords_lazy

    K, m = 16, 4
    scan_j = jax.jit(_gate_keywords)
    lazy_j = jax.jit(partial(_gate_keywords_lazy, max_iter=K + 2))
    rng = np.random.default_rng(7)
    for trial in range(200):
        n = rng.integers(0, m + 1, K)
        costs = rng.integers(0, 5, (m, K))
        prefix = np.concatenate(
            [np.zeros((1, K), np.int64), np.cumsum(costs, 0)], 0
        )
        args = (
            jnp.asarray(int(rng.integers(-1, 40)), jnp.int32),
            jnp.asarray(bool(rng.integers(0, 2))),
            jnp.asarray(prefix, jnp.int32),
            jnp.asarray(n, jnp.int32),
        )
        a = jax.tree.map(np.asarray, scan_j(*args))
        b = jax.tree.map(np.asarray, lazy_j(*args))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(x, y, err_msg=f"trial {trial}")


@pytest.mark.unit
def test_day_invariants(key):
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 0)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    day = simulate_day(IMPLICIT_CFG, key, kw, bids, jnp.asarray(1000.0))
    imp = np.asarray(day.impressions)
    clicks = np.asarray(day.buyside_clicks)
    convs = np.asarray(day.sellside_conversions)
    assert np.all(clicks <= imp)
    assert np.all(convs <= clicks)
    assert np.all(np.asarray(day.cost) >= 0)
    assert np.all(np.asarray(day.revenue) >= 0)
    assert np.all(imp <= np.asarray(day.volume))
    share = np.asarray(day.impression_share)
    assert np.all((share >= 0) & (share <= 1.0 + 1e-6))


# ---------------------------------------------------------------------------
# production-scale parity via the C++ oracle (VERDICT r1 item 4)
# ---------------------------------------------------------------------------

BENCH_SHAPE_CFG = EnvConfig(
    num_keywords=100,
    kind=KeywordKind.IMPLICIT,
    competitor_model=CompetitorModel.SINGLE_ABS_CENTS,
    max_volume=576,
    timesteps_per_day=24,
)


def bench_shape_kw(n, seed=0):
    """Keywords at the bench regime's scale (mean_volume ~128 dense table)."""
    rng = np.random.default_rng(seed)
    return make_keyword_state(
        n,
        vol_mean=rng.uniform(90.0, 200.0, n),
        vol_std=rng.uniform(2.0, 12.0, n),
        bctr=rng.uniform(0.2, 0.9, n),
        sctr=rng.uniform(0.2, 0.9, n),
        rev_mean=rng.uniform(0.5, 2.0, n),
        rev_std=rng.uniform(0.05, 0.4, n),
        bid_loc=rng.uniform(0.3, 1.0, n),
        bid_scale=rng.uniform(0.05, 0.3, n),
        max_bidders=1,
        participation_rate=1.0,
    )


@pytest.mark.slow
@pytest.mark.parametrize("budget", [1e6, 400.0])
def test_bench_shape_day_matches_native_oracle(budget):
    """Injected-draw bit parity at the BENCH shape (K=100, max_volume=576,
    T=24) against the C++ gate oracle (oracle/numpy_env.py:176-206) —
    the toy-scale tests above leave the production shapes uncovered
    otherwise. 400.0 binds the budget mid-day at this scale."""
    from adcraft_tpu.oracle.numpy_env import simulate_day_native

    kw = bench_shape_kw(BENCH_SHAPE_CFG.num_keywords, 11)
    bids = np.random.default_rng(11).uniform(
        0.3, 2.0, BENCH_SHAPE_CFG.num_keywords
    )
    day, ref = _assert_day_matches_oracle(
        BENCH_SHAPE_CFG, kw, bids, budget, 11, oracle=simulate_day_native
    )
    if budget < 1e5:
        assert float(np.sum(ref["cost"])) <= budget + 1e-5
    # the regime actually exercises volume: every keyword saw auctions
    assert int(np.asarray(day.volume).min()) > 0


@pytest.mark.unit
def test_lazy_agg_gate_fuzz_vs_scan_agg_gate():
    """Randomized adversarial agg-gate inputs (zero costs, zero budgets,
    n=0 cells, alternating partial cells): the lazy-agg gate must equal
    the sequential scan-agg gate bit-for-bit, across lite-lane widths
    and multi-resolution widths. resolve_fn reads a fixed table whose first
    L lanes equal the lite table, mirroring the production
    key-consistency contract."""
    from functools import partial

    from adcraft_tpu.step import (
        _gate_keywords_lazy_agg,
        _gate_keywords_scan_agg,
    )

    N, m = 24, 4
    rng = np.random.default_rng(11)

    def _resolve(table, j, B, nk, hit):
        # one-hot column read, mirroring the production resolver's
        # gather-free contract (hit may be all-false: garbage out,
        # discarded by the gate through the same mask)
        col = jnp.sum(jnp.where(hit[:, None], table, 0), axis=0)
        prefix = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(col)]
        )
        ok = (prefix[1:] <= B) & (jnp.arange(m) < nk)
        pj = jnp.sum(ok.astype(jnp.int32)).astype(jnp.int32)
        return pj, prefix[pj]

    # jit once per variant (table as an argument, not a closure) so the
    # 100 trials reuse compiled programs
    @jax.jit
    def run_scan(budget0, broken0, s_full, n, table):
        return _gate_keywords_scan_agg(
            budget0, broken0, s_full, n, partial(_resolve, table)
        )

    @jax.jit
    def run_lazy(budget0, broken0, s_full, lite_costs, n, table):
        return _gate_keywords_lazy_agg(
            budget0, broken0, s_full, lite_costs, n,
            partial(_resolve, table), max_iter=N + 2,
        )

    for trial in range(100):
        n = jnp.asarray(rng.integers(0, m + 1, N), jnp.int32)
        table = jnp.asarray(rng.integers(0, 5, (N, m)), jnp.int32)
        s_full = jnp.asarray(rng.integers(0, 12, N), jnp.int32)
        budget0 = jnp.asarray(int(rng.integers(-1, 30)), jnp.int32)
        broken0 = jnp.asarray(bool(rng.integers(0, 2)))

        b = jax.tree.map(np.asarray, run_scan(budget0, broken0, s_full, n, table))
        for lite in (1, 2, 4):
            lite_costs = table[:, :lite].T  # (L, N)
            a = jax.tree.map(
                np.asarray,
                run_lazy(budget0, broken0, s_full, lite_costs, n, table),
            )
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                np.testing.assert_array_equal(
                    x, y, err_msg=f"trial {trial} lite={lite}",
                )


@pytest.mark.unit
@pytest.mark.parametrize("cost_model", ["python", "rust_quirk"])
def test_explicit_cost_agg_matches_lanes_distribution(cost_model):
    """cost_sampling="agg" for EXPLICIT keywords (VERDICT r3 item 4):
    everything upstream of costs is bit-identical to the lanes path
    (same key slots), and per-keyword day-spend moments match."""
    from adcraft_tpu.config import CostModel

    kw = explicit_kw(EXPLICIT_CFG.num_keywords, 21)
    bids = jnp.full((EXPLICIT_CFG.num_keywords,), 1.0)
    keys = jax.random.split(jax.random.PRNGKey(23), 256)
    outs = {}
    for mode in ("lanes", "agg"):
        cfg = EXPLICIT_CFG.replace(
            cost_sampling=mode, cost_model=CostModel(cost_model)
        )
        fn = jax.jit(
            jax.vmap(
                lambda k: simulate_day(cfg, k, kw, bids, jnp.asarray(1000.0))
            )
        )
        outs[mode] = jax.tree.map(np.asarray, fn(keys))
    for field in ("impressions", "buyside_clicks", "volume"):
        np.testing.assert_array_equal(
            getattr(outs["lanes"], field), getattr(outs["agg"], field),
            err_msg=field,
        )
    np.testing.assert_allclose(
        outs["lanes"].cost.mean(axis=0), outs["agg"].cost.mean(axis=0),
        rtol=0.05, atol=0.02,
    )
    np.testing.assert_allclose(
        outs["lanes"].cost.std(), outs["agg"].cost.std(), rtol=0.15, atol=0.02
    )


@pytest.mark.unit
@pytest.mark.parametrize("cost_model", ["python", "rust_quirk"])
def test_explicit_cost_agg_lazy_gate_matches_scan_gate(cost_model):
    """Explicit-agg lazy gate vs sequential scan-agg: bit-identical
    (the agg gate runs in exact integers for BOTH explicit cost models —
    cents for python, decicents for the continuous rust quirk)."""
    from adcraft_tpu.config import CostModel

    kw = explicit_kw(EXPLICIT_CFG.num_keywords, 22)
    bids = jnp.full((EXPLICIT_CFG.num_keywords,), 1.2)
    base = EXPLICIT_CFG.replace(
        cost_sampling="agg", cost_model=CostModel(cost_model)
    )
    keys = jax.random.split(jax.random.PRNGKey(29), 16)
    def make(cfg):
        return jax.jit(
            jax.vmap(
                lambda k, bud, _c=cfg: simulate_day(_c, k, kw, bids, bud),
                in_axes=(0, None),
            )
        )

    for scope in ("global", "chunk", "per_t"):
        fl = make(base.replace(gate_mode="lazy", gate_scope=scope))
        fs = make(base.replace(
            gate_mode="scan",
            gate_scope="per_t" if scope == "chunk" else scope,
        ))
        for budget in (0.5, 3.0, 20.0, 200.0):
            bud = jnp.asarray(budget, jnp.float32)
            a = jax.tree.map(np.asarray, fl(keys, bud))
            b = jax.tree.map(np.asarray, fs(keys, bud))
            for f, x, y in zip(a._fields, a, b):
                np.testing.assert_array_equal(
                    x, y, err_msg=f"{cost_model} {scope} budget={budget} {f}"
                )
            total = a.cost.sum(axis=1)
            assert np.all(total <= budget + 1e-5), (scope, budget, total.max())


@pytest.mark.unit
def test_explicit_agg_phantom_click_quirk_preserved():
    """Zero-impression explicit cells still convert (phantom candidate)
    and never spend, in agg mode as in lanes mode."""
    # zero-volume-free keywords but a bid far below the sigmoid
    # intercept: impressions ~ 0 while volume > 0
    kw = explicit_kw(EXPLICIT_CFG.num_keywords, 25)
    kw = kw._replace(
        vol_mean=jnp.full_like(kw.vol_mean, 30.0),
        imp_intercept=jnp.full_like(kw.imp_intercept, 5.0),
        imp_slope=jnp.full_like(kw.imp_slope, 30.0),
        sctr=jnp.full_like(kw.sctr, 0.9),
    )
    bids = jnp.full((EXPLICIT_CFG.num_keywords,), 0.5)
    cfg = EXPLICIT_CFG.replace(cost_sampling="agg")
    keys = jax.random.split(jax.random.PRNGKey(31), 64)
    out = jax.tree.map(
        np.asarray,
        jax.jit(
            jax.vmap(lambda k: simulate_day(cfg, k, kw, bids, jnp.asarray(100.0)))
        )(keys),
    )
    assert out.impressions.sum() == 0
    assert out.buyside_clicks.sum() > 0  # phantom candidates clicked
    assert out.sellside_conversions.sum() > 0
    np.testing.assert_array_equal(out.cost, 0.0)  # phantoms never spend
    assert out.revenue.sum() > 0


@pytest.mark.unit
def test_gate_straggler_compaction_bit_identity():
    """The straggler-compacted batched gate (gate_compact="auto", a
    custom_vmap rule: warm init -> optional phase-A full-batch
    iterations -> gather-resume-scatter of unconverged envs) must be
    bit-identical to the round-4 lockstep batched gate ("off") for
    every knob setting, including a cap small enough to force the
    runtime fallback and a nonzero phase A. Batch of 96 envs (>= the
    rule's min_batch of 64) so the custom_vmap path actually engages."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 14)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    base = IMPLICIT_CFG.replace(
        cost_sampling="agg", gate_mode="lazy", gate_scope="chunk"
    )
    keys = jax.random.split(jax.random.PRNGKey(41), 96)

    def make(cfg):
        return jax.jit(
            jax.vmap(
                lambda k, bud, _c=cfg: simulate_day(_c, k, kw, bids, bud),
                in_axes=(0, None),
            )
        )

    ref_fn = make(base.replace(gate_compact="off"))
    variants = [
        {"gate_compact": "auto"},
        {"gate_compact": "auto", "gate_compact_cap": 8},  # forces fallback
        {"gate_compact": "auto", "gate_compact_phase_a": 3},
    ]
    for v in variants:
        fn = make(base.replace(**v))
        for budget in (0.5, 2.0, 8.0, 50.0):
            bud = jnp.asarray(budget, jnp.float32)
            a = jax.tree.map(np.asarray, ref_fn(keys, bud))
            b = jax.tree.map(np.asarray, fn(keys, bud))
            for f, x, y in zip(a._fields, a, b):
                np.testing.assert_array_equal(
                    x, y, err_msg=f"{v} budget={budget} field={f}"
                )


@pytest.mark.unit
def test_rev_day_matches_sum_distribution():
    """rev_sampling="day" (one aggregate revenue draw per keyword per
    day) must agree with "sum" (one per cell) distributionally: all
    non-revenue fields bit-identical (same upstream streams), and the
    day-revenue mean/std matching to CLT/rounding tolerance."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 14)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    keys = jax.random.split(jax.random.PRNGKey(7), 512)
    outs = {}
    for mode in ("sum", "day"):
        cfg = IMPLICIT_CFG.replace(
            cost_sampling="agg", conv_sampling="counts", rev_sampling=mode,
            gate_scope="chunk",
        )
        f = jax.jit(
            jax.vmap(
                lambda k, _c=cfg: simulate_day(
                    _c, k, kw, bids, jnp.asarray(50.0, jnp.float32)
                )
            )
        )
        outs[mode] = jax.tree.map(np.asarray, f(keys))
    a, b = outs["sum"], outs["day"]
    for f, x, y in zip(a._fields, a, b):
        if f in ("revenue", "profit"):
            continue
        np.testing.assert_array_equal(x, y, err_msg=f)
    # revenue: same conversions (checked above), so means should agree
    # to a fraction of the per-conversion std + rounding noise
    n = np.maximum(a.sellside_conversions.sum(), 1)
    se = np.asarray(kw.rev_std).mean() * np.sqrt(
        a.sellside_conversions.sum()
    ) / n * 5 + 0.02
    np.testing.assert_allclose(
        a.revenue.mean(), b.revenue.mean(), atol=float(se) * 10,
        err_msg="day-mode revenue mean",
    )
    ra = a.revenue.sum(axis=1)
    rb = b.revenue.sum(axis=1)
    assert abs(ra.mean() - rb.mean()) < 5 * (
        ra.std() + rb.std()
    ) / np.sqrt(len(keys)) + 0.05
    assert abs(ra.std() - rb.std()) / max(ra.std(), 1e-6) < 0.2


@pytest.mark.unit
def test_pool_cost_agg_matches_scan_and_lanes():
    """cost_sampling="agg" for the BINOMIAL_POOL competitor model
    (VERDICT r4 Weak #4): the reference's *default* ImplicitKeyword now
    rides the fast gate. Checks: (a) lazy-agg vs sequential scan-agg
    bit-identity across budgets/scopes (signed-cost first-violation
    masks included); (b) vs the lanes path — impressions and clicks
    bit-identical (same k_bidders/k_imp key structure), per-keyword day
    cost mean/std matching to CLT tolerance under an unbinding budget;
    (c) spend <= budget when binding and compaction invariance."""
    kw = implicit_kw(8, 3)
    kw = kw._replace(
        max_bidders=jnp.full((8,), 30.0),
        participation_rate=jnp.full((8,), 0.6),
    )
    bids = jnp.full((8,), 1.0)
    base = IMPLICIT_CFG.replace(
        num_keywords=8,
        competitor_model=CompetitorModel.BINOMIAL_POOL,
        conv_sampling="counts", rev_sampling="sum",
        binomial_sampler="inversion", lane_bits=32,
    )
    keys = jax.random.split(jax.random.PRNGKey(11), 256)

    def make(cfg, budget):
        return jax.jit(
            jax.vmap(
                lambda k, _c=cfg: simulate_day(
                    _c, k, kw, bids, jnp.asarray(budget, jnp.float32)
                )
            )
        )

    for scope in ("chunk", "per_t"):
        for budget in (0.5, 3.0, 20.0):
            cl = base.replace(
                cost_sampling="agg", gate_mode="lazy", gate_scope=scope
            )
            cs = base.replace(
                cost_sampling="agg", gate_mode="scan",
                gate_scope="per_t" if scope == "chunk" else scope,
            )
            a = jax.tree.map(np.asarray, make(cl, budget)(keys[:64]))
            b = jax.tree.map(np.asarray, make(cs, budget)(keys[:64]))
            for f, x, y in zip(a._fields, a, b):
                np.testing.assert_array_equal(
                    x, y, err_msg=f"pool {scope} {budget} {f}"
                )

    cfg_lanes = base.replace(cost_sampling="lanes")
    cfg_agg = base.replace(cost_sampling="agg", gate_scope="chunk")
    A = jax.tree.map(np.asarray, make(cfg_lanes, 1000.0)(keys))
    B = jax.tree.map(np.asarray, make(cfg_agg, 1000.0)(keys))
    np.testing.assert_array_equal(A.impressions, B.impressions)
    np.testing.assert_array_equal(A.buyside_clicks, B.buyside_clicks)
    np.testing.assert_allclose(
        A.cost.mean(axis=0), B.cost.mean(axis=0), rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(
        A.cost.std(axis=0), B.cost.std(axis=0), rtol=0.25, atol=0.1
    )

    for budget in (0.5, 2.0):
        g1 = make(cfg_agg, budget)(keys[:96])
        g2 = make(cfg_agg.replace(gate_compact="off"), budget)(keys[:96])
        for x, y in zip(g1, g2):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        tot = np.asarray(g1.cost.sum(axis=1))
        assert (tot <= budget + 1e-5).all(), tot.max()


@pytest.mark.unit
def test_agg_draw_bits16_distribution():
    """agg_draw_bits=16 (ndtri of half-word uniforms behind the
    aggregate spend draws) must leave upstream streams bit-identical and
    match the 32-bit spend distribution to CLT/quantization tolerance."""
    kw = implicit_kw(IMPLICIT_CFG.num_keywords, 14)
    bids = jnp.full((IMPLICIT_CFG.num_keywords,), 1.0)
    keys = jax.random.split(jax.random.PRNGKey(5), 512)
    outs = {}
    for bits in (32, 16):
        cfg = IMPLICIT_CFG.replace(
            cost_sampling="agg", conv_sampling="counts",
            rev_sampling="sum", gate_scope="chunk", agg_draw_bits=bits,
        )
        f = jax.jit(
            jax.vmap(
                lambda k, _c=cfg: simulate_day(
                    _c, k, kw, bids, jnp.asarray(1000.0, jnp.float32)
                )
            )
        )
        outs[bits] = jax.tree.map(np.asarray, f(keys))
    a, b = outs[32], outs[16]
    np.testing.assert_array_equal(a.impressions, b.impressions)
    np.testing.assert_array_equal(a.buyside_clicks, b.buyside_clicks)
    np.testing.assert_allclose(
        a.cost.mean(axis=0), b.cost.mean(axis=0), rtol=0.03, atol=0.03
    )
    np.testing.assert_allclose(
        a.cost.std(axis=0), b.cost.std(axis=0), rtol=0.2, atol=0.05
    )
