"""Distribution kernel tests.

Mirrors the reference's helper-math exactness tests
(adcraft/tests/test_synthetic_kw_helpers.py) and its native-vs-python
statistical-equivalence tests (adcraft/tests/rust/test_helpers.py), adapted
to key-driven sampling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adcraft_tpu import distributions as dist


@pytest.mark.unit
@pytest.mark.parametrize(
    "x,expected",
    [(-1.0, 0.0), (0.0, 0.0), (0.5, 0.5), (1.0, 1.0), (2.0, 1.0)],
)
def test_probify(x, expected):
    assert float(dist.probify(jnp.asarray(x))) == expected


@pytest.mark.unit
def test_probify_array():
    out = dist.probify(jnp.asarray([-0.5, 0.25, 1.5]))
    np.testing.assert_allclose(out, [0.0, 0.25, 1.0])


@pytest.mark.unit
@pytest.mark.parametrize("x,expected", [(-3.0, 0.0), (0.0, 0.0), (2.5, 2.5)])
def test_nonnegify(x, expected):
    assert float(dist.nonnegify(jnp.asarray(x))) == expected


@pytest.mark.unit
def test_beta_param():
    # reference test_synthetic_kw_helpers.py: beta_param(m) = (1-m)/m
    assert float(dist.beta_param(jnp.asarray(0.5))) == pytest.approx(1.0)
    assert float(dist.beta_param(jnp.asarray(0.25))) == pytest.approx(3.0)


@pytest.mark.unit
@pytest.mark.parametrize(
    "x,s,t,expected",
    [
        (0.0, 1.0, 0.0, 0.5),
        (1.0, 1.0, 0.0, 0.7311),
        (0.0, 2.0, 1.0, 0.1192),
        (-1.0, 1.0, 0.0, 0.2689),
    ],
)
def test_sigmoid_values(x, s, t, expected):
    # 4-decimal expected values, as in tests/test_synthetic_kw_helpers.py:90
    got = float(dist.sigmoid(jnp.asarray(x), jnp.asarray(s), jnp.asarray(t)))
    assert got == pytest.approx(expected, abs=1e-4)


@pytest.mark.unit
def test_round_cents_matches_numpy():
    # exact half-cent boundaries are excluded: they are measure-zero for
    # continuous draws and f32/f64 disagree on which side of .5 they land
    vals = np.asarray([0.004, 0.0521, 1.2345, 2.6789, -0.004, 3.999], np.float32)
    got = np.asarray(dist.round_cents(jnp.asarray(vals)))
    np.testing.assert_allclose(got, np.around(vals.astype(np.float64), 2), atol=1e-6)


@pytest.mark.unit
def test_nonneg_int_normal_moments(key):
    draws = dist.nonneg_int_normal(
        key, jnp.full((100_000,), 100.0), jnp.full((100_000,), 10.0)
    )
    assert draws.dtype == jnp.int32
    assert float(draws.min()) >= 0
    assert float(draws.mean()) == pytest.approx(100.0, abs=0.5)
    assert float(jnp.std(draws.astype(jnp.float32))) == pytest.approx(10.0, rel=0.05)


@pytest.mark.unit
def test_nonneg_int_normal_clips_at_zero(key):
    draws = dist.nonneg_int_normal(
        key, jnp.full((50_000,), 0.5), jnp.full((50_000,), 2.0)
    )
    assert float(draws.min()) == 0
    # compare against the reference formula round(max(N, 0)) via numpy
    rng = np.random.default_rng(0)
    ref = np.round(np.maximum(rng.normal(0.5, 2.0, 200_000), 0.0))
    assert float(draws.mean()) == pytest.approx(ref.mean(), rel=0.05)


@pytest.mark.unit
def test_binomial_moments(key):
    n, p = 50.0, 0.3
    draws = dist.binomial(key, jnp.full((100_000,), n), jnp.full((100_000,), p))
    assert float(draws.mean()) == pytest.approx(n * p, rel=0.02)
    assert float(jnp.var(draws.astype(jnp.float32))) == pytest.approx(
        n * p * (1 - p), rel=0.05
    )


@pytest.mark.unit
def test_binomial_degenerate(key):
    zeros = dist.binomial(key, jnp.zeros((10,)), jnp.full((10,), 0.5))
    np.testing.assert_array_equal(np.asarray(zeros), 0)
    all_win = dist.binomial(key, jnp.full((10,), 7.0), jnp.ones((10,)))
    np.testing.assert_array_equal(np.asarray(all_win), 7)


@pytest.mark.unit
@pytest.mark.parametrize("n,p", [(10, 0.3), (47, 0.94), (5, 0.5), (24, 0.05)])
def test_binomial_inv_matches_exact_pmf(key, n, p):
    """Inverse-CDF binomial must reproduce the exact Binomial pmf."""
    draws = np.asarray(
        dist.binomial_inv(key, jnp.full((200_000,), float(n)), jnp.full((200_000,), p), nmax=48)
    )
    assert draws.min() >= 0 and draws.max() <= n
    # exact pmf in float64
    pmf = np.zeros(n + 1)
    pmf[0] = (1 - p) ** n
    for j in range(1, n + 1):
        pmf[j] = pmf[j - 1] * (n - j + 1) / j * (p / (1 - p))
    emp = np.bincount(draws, minlength=n + 1) / draws.size
    # 5-sigma tolerance per bucket
    tol = 5.0 * np.sqrt(np.maximum(pmf * (1 - pmf), 1e-12) / draws.size)
    assert np.all(np.abs(emp - pmf) <= tol + 1e-4)


@pytest.mark.unit
def test_binomial_inv_is_the_quantile_function(key):
    """bits=16 makes the consumed uniform reconstructable: the output must
    be the Binomial quantile function min{k : CDF(k) >= u} of that uniform
    (up to f32-vs-f64 CDF rounding at bucket boundaries)."""
    n, p = 20, 0.37
    shape = (4096,)
    out = np.asarray(
        dist.binomial_inv(
            key, jnp.full(shape, float(n)), jnp.full(shape, p), nmax=32, bits=16
        )
    )
    bits = np.asarray(jax.random.bits(key, shape, dtype=jnp.uint16))
    u = (bits.astype(np.float64) + 0.5) / 65536.0
    pmf = np.zeros(n + 1)
    pmf[0] = (1 - p) ** n
    for j in range(1, n + 1):
        pmf[j] = pmf[j - 1] * (n - j + 1) / j * (p / (1 - p))
    cdf = np.cumsum(pmf)
    expected = np.searchsorted(cdf, u, side="left")
    mismatch = out != expected
    assert np.abs(out - expected).max(initial=0) <= 1  # boundary rounding only
    assert mismatch.mean() < 0.005


@pytest.mark.unit
def test_binomial_inv_degenerate_and_heterogeneous(key):
    ns = jnp.asarray([0.0, 7.0, 7.0, 3.0, 48.0])
    ps = jnp.asarray([0.5, 0.0, 1.0, 0.4, 0.99])
    out = np.asarray(dist.binomial_inv(key, ns, ps, nmax=48))
    assert out[0] == 0  # n = 0
    assert out[1] == 0  # p = 0
    assert out[2] == 7  # p = 1
    assert 0 <= out[3] <= 3
    assert 0 <= out[4] <= 48


@pytest.mark.unit
def test_rev_normal_cents(key):
    draws = dist.rev_normal_cents(key, 1.0, 0.25, (100_000,))
    # floored at 0.01 and on the cents grid
    assert float(draws.min()) >= 0.01 - 1e-6
    cents = np.asarray(draws) * 100
    np.testing.assert_allclose(cents, np.round(cents), atol=1e-3)
    assert float(draws.mean()) == pytest.approx(1.0, abs=0.01)


@pytest.mark.unit
def test_abs_laplace_cents_matches_reference_distribution(key):
    # statistical equivalence vs the numpy implementation
    # (synthetic_kw_helpers.py:104-113), in the spirit of
    # tests/rust/test_helpers.py
    loc, scale = 0.55, 0.15
    draws = np.asarray(dist.abs_laplace_cents(key, loc, scale, (200_000,)))
    rng = np.random.default_rng(3)
    ref = np.around(np.abs(rng.laplace(loc, scale, 200_000)), 2)
    assert draws.mean() == pytest.approx(ref.mean(), rel=0.02)
    assert draws.std() == pytest.approx(ref.std(), rel=0.02)


@pytest.mark.unit
def test_abs_normal_cents_matches_reference_distribution(key):
    # statistical equivalence vs bid_abs_normal
    # (synthetic_kw_helpers.py:92-101), incl. the pre-rounding floor
    loc, scale, lowest = 0.4, 0.3, 0.25
    draws = np.asarray(
        dist.abs_normal_cents(key, loc, scale, (200_000,), lowest_bid=lowest)
    )
    rng = np.random.default_rng(3)
    ref = np.around(np.maximum(np.abs(rng.normal(loc, scale, 200_000)), lowest), 2)
    assert draws.min() >= lowest - 0.005
    assert draws.mean() == pytest.approx(ref.mean(), rel=0.02)
    assert draws.std() == pytest.approx(ref.std(), rel=0.02)


@pytest.mark.unit
def test_threshold_sigmoid_matches_rust_semantics():
    # src/lib.rs:93-105 with thresh=0.05, intercept=0.5, slope=5
    bid = jnp.linspace(0.0, 3.0, 31)
    thresh, intercept, slope = 0.05, 0.5, 5.0
    got = np.asarray(dist.threshold_sigmoid(bid, thresh, intercept, slope))
    halver = 2.0 + 1e-10
    t = np.clip(halver * thresh, 0.0, 1.0) / halver
    r = 1.0 / (1.0 + np.exp(-slope * (np.asarray(bid) - intercept)))
    want = np.clip((1 + 2 * t) * r - t, 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # thresholding snaps the upper tail ((1+2t)*r - t > 1 for r ~ 1)
    assert got[-1] == 1.0
    # and snaps the lower tail once the sigmoid drops below t/(1+2t)
    low = np.asarray(
        dist.threshold_sigmoid(jnp.asarray(-2.0), thresh, intercept, slope)
    )
    assert low == 0.0


@pytest.mark.unit
def test_cost_create_matches_rust_semantics(key):
    # src/lib.rs:54-67: clamp(sqrt(x)/4 + 2.2 + N(0, 1e-10+sqrt(x)/6), 0, 4.4)
    bid = 1.44
    draws = np.asarray(dist.cost_create(key, bid, (200_000,)))
    assert draws.min() >= 0.0
    assert draws.max() <= 4.4
    want_mean = np.sqrt(bid) / 4 + 2.2
    assert draws.mean() == pytest.approx(want_mean, rel=0.01)
    assert draws.std() == pytest.approx(np.sqrt(bid) / 6, rel=0.02)


@pytest.mark.unit
def test_generic_cost_matches_python_semantics(key):
    # synthetic_kw_helpers.py:56-63 under a fixed numpy seed (statistical)
    bid = 2.25
    draws = np.asarray(dist.generic_cost(key, bid, (200_000,)))
    rng = np.random.default_rng(7)
    noise = rng.normal(0, 1e-10 + np.sqrt(bid) / 6, 200_000)
    ref = np.around(np.clip(np.sqrt(bid) / 4 + bid / 2 + noise, 0.0, bid), 2)
    assert draws.min() >= 0.0
    assert draws.max() <= bid
    assert draws.mean() == pytest.approx(ref.mean(), abs=0.01)
    assert draws.std() == pytest.approx(ref.std(), rel=0.05)


@pytest.mark.unit
def test_laplace_cdf_icdf_roundtrip():
    u = jnp.linspace(0.01, 0.99, 99)
    x = dist.laplace_icdf(u, 0.3, 0.2)
    u2 = dist.laplace_cdf(x, 0.3, 0.2)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-5)


@pytest.mark.unit
def test_truncated_laplace_bounds_and_distribution(key):
    lo, hi = -0.4, 0.7
    draws = np.asarray(
        dist.truncated_laplace(key, 0.1, 0.3, lo, hi, (200_000,))
    )
    assert draws.min() >= lo and draws.max() <= hi
    # KS-style check against rejection sampling
    rng = np.random.default_rng(11)
    ref = rng.laplace(0.1, 0.3, 2_000_000)
    ref = ref[(ref >= lo) & (ref <= hi)]
    qs = np.linspace(0.05, 0.95, 19)
    np.testing.assert_allclose(
        np.quantile(draws, qs), np.quantile(ref, qs), atol=0.01
    )


@pytest.mark.unit
def test_beta_mean_alpha1(key):
    m = 0.045086
    draws = dist.beta_mean_alpha1(key, jnp.full((200_000,), m))
    assert float(draws.mean()) == pytest.approx(m, rel=0.05)


@pytest.mark.unit
def test_censored_normal_moments_match_monte_carlo():
    rng = np.random.default_rng(0)
    cases = [
        (1.0, 0.3, 0.01),
        (0.2, 0.5, 0.01),
        (0.05, 0.1, 0.01),
        (1.5, 0.0, 0.01),
        (-0.5, 0.2, 0.01),
    ]
    for mean, std, low in cases:
        m, s = dist.censored_normal_moments(
            jnp.asarray(mean), jnp.asarray(std), low
        )
        draws = np.maximum(rng.normal(mean, std, 400_000), low)
        np.testing.assert_allclose(float(m), draws.mean(), rtol=2e-2, atol=2e-3)
        np.testing.assert_allclose(float(s), draws.std(), rtol=3e-2, atol=2e-3)


@pytest.mark.unit
def test_uniform16_moments_and_packing(key):
    u = dist.uniform16(key, (200_000,))
    u = np.asarray(u)
    assert np.all((u > 0) & (u < 1))
    np.testing.assert_allclose(u.mean(), 0.5, atol=5e-3)
    np.testing.assert_allclose(u.std(), 1.0 / np.sqrt(12.0), atol=5e-3)
    # quantized to the 2^-16 midpoint grid
    g = u * 65536.0 - 0.5
    np.testing.assert_allclose(g, np.round(g), atol=1e-3)


@pytest.mark.unit
def test_rev_sum_cents_moments(key):
    """Aggregate revenue draw matches the per-draw sum's moments."""
    n = 7
    mean, std = 1.1, 0.4
    keys = jax.random.split(key, 100_000)
    nconv = jnp.full((1,), n, jnp.int32)
    draws = jax.vmap(
        lambda k: dist.rev_sum_cents(
            k, nconv, jnp.asarray([mean]), jnp.asarray([std]), jnp.int32
        )[0]
    )(keys)
    draws = np.asarray(draws) / 100.0
    rng = np.random.default_rng(1)
    ref = np.round(
        np.maximum(rng.normal(mean, std, (100_000, n)), 0.01) * 100
    ).sum(axis=1) / 100.0
    np.testing.assert_allclose(draws.mean(), ref.mean(), rtol=1e-2)
    np.testing.assert_allclose(draws.std(), ref.std(), rtol=3e-2)


@pytest.mark.unit
def test_clipped_normal_moments_match_monte_carlo():
    rng = np.random.default_rng(3)
    cases = [
        (2.45, 0.17, 0.0, 4.4),   # cost_create at bid=1.0
        (2.2, 0.6, 0.0, 4.4),
        (4.3, 0.5, 0.0, 4.4),     # heavy upper censoring
        (0.1, 0.4, 0.0, 4.4),     # heavy lower censoring
        (1.0, 0.0, 0.0, 4.4),     # degenerate std
        (5.0, 0.3, 0.0, 4.4),     # mean above the ceiling
    ]
    for mean, std, lo, hi in cases:
        m, s = dist.clipped_normal_moments(
            jnp.asarray(mean), jnp.asarray(std), lo, hi
        )
        draws = np.clip(rng.normal(mean, std, 400_000), lo, hi)
        np.testing.assert_allclose(float(m), draws.mean(), rtol=2e-2, atol=2e-3)
        np.testing.assert_allclose(float(s), draws.std(), rtol=3e-2, atol=2e-3)


@pytest.mark.unit
def test_generic_cost_cent_moments_match_sampler():
    """Exact discrete cent moments vs a large generic_cost sample."""
    rng = np.random.default_rng(4)
    for bid in (0.25, 1.0, 2.4):
        mu, sig, cmax = dist.generic_cost_cent_moments(jnp.asarray(bid), 304)
        s = np.sqrt(bid)
        raw = s / 4.0 + bid / 2.0 + (1e-10 + s / 6.0) * rng.normal(
            size=400_000
        )
        draws = np.round(np.clip(raw, 0.0, bid) * 100.0)  # cents
        assert float(cmax) == round(bid * 100)
        assert draws.max() <= float(cmax)
        np.testing.assert_allclose(float(mu), draws.mean(), rtol=5e-3, atol=0.2)
        np.testing.assert_allclose(float(sig), draws.std(), rtol=2e-2, atol=0.2)


@pytest.mark.unit
def test_cost_create_deci_moments_match_sampler():
    """Decicent moments vs a large cost_create sample (quantization
    variance 1/12 included, negligible at this scale)."""
    rng = np.random.default_rng(5)
    for bid in (0.25, 1.0, 2.4):
        mu, sig, cmax = dist.cost_create_deci_moments(jnp.asarray(bid))
        s = np.sqrt(bid)
        raw = s / 4.0 + 2.2 + (1e-10 + s / 6.0) * rng.normal(size=400_000)
        draws = np.round(np.clip(raw, 0.0, 4.4) * 1000.0)  # decicents
        assert float(cmax) == 4400.0
        np.testing.assert_allclose(float(mu), draws.mean(), rtol=5e-3, atol=2.0)
        np.testing.assert_allclose(float(sig), draws.std(), rtol=2e-2, atol=2.0)


@pytest.mark.unit
def test_single_cost_cent_moments_closed_matches_grid():
    """The closed-form geometric-series moments must reproduce the
    exact grid sums across the (bid, loc, scale) envelope, including
    loc above/below the win threshold and negative loc (|Laplace|
    symmetry)."""
    rng = np.random.default_rng(7)
    bids, locs, scales = [], [], []
    for _ in range(200):
        bids.append(round(float(rng.uniform(0.02, 3.0)), 2))
        locs.append(float(rng.uniform(-0.5, 2.8)))
        scales.append(float(rng.uniform(0.02, 0.8)))
    bids = jnp.asarray(bids, jnp.float32)
    locs = jnp.asarray(locs, jnp.float32)
    scales = jnp.asarray(scales, jnp.float32)
    mg, sg, cg = dist.single_cost_cent_moments(bids, locs, scales, 304)
    mc, sc, cc = dist.single_cost_cent_moments_closed(bids, locs, scales)
    np.testing.assert_array_equal(np.asarray(cg), np.asarray(cc))
    np.testing.assert_allclose(np.asarray(mc), np.asarray(mg), rtol=5e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(sg), rtol=1e-2, atol=5e-2)


@pytest.mark.unit
def test_binomial_inv_agrees_with_hoisted_ladder(key):
    """The fused unrolled walk (binomial_inv) and the materialized
    ladder path (binomial_cdf + binomial_inv_from_cdf) consume the same
    uniform and walk the same recurrence; counts must agree everywhere
    except a vanishing fraction of exact f32 CDF ties (documented
    O(n*eps) tolerance)."""
    rng = np.random.default_rng(13)
    n = jnp.asarray(rng.integers(0, 25, 50_000), jnp.float32)
    p = jnp.asarray(rng.uniform(0.01, 0.99, 50_000), jnp.float32)
    for bits in (16, 32):
        a = np.asarray(dist.binomial_inv(key, n, p, nmax=24, bits=bits))
        ladder = dist.binomial_cdf(n, p, 24)
        b = np.asarray(dist.binomial_inv_from_cdf(key, ladder, bits=bits))
        mismatch = np.mean(a != b)
        assert mismatch < 1e-3, (bits, mismatch)
        # and any mismatch is a +-1 tie flip, never structural
        assert np.max(np.abs(a - b)) <= 1, bits


@pytest.mark.unit
def test_pool_cost_deci_moments_vs_brute_force():
    """Quadrature moments of the pool model's conditional per-click cost
    (max of k truncated Laplaces; distributions.pool_cost_deci_moments)
    must match seeded Monte Carlo through the same inverse-CDF law,
    including the k==0 and k<3 quirks."""
    import numpy as onp

    rng = onp.random.default_rng(0)
    bid, loc, scale = 1.0, 0.4, 0.35

    def F(x):
        z = (x - loc) / scale
        return onp.where(z < 0, 0.5 * onp.exp(z), 1 - 0.5 * onp.exp(-z))

    def Finv(u):
        return loc + scale * onp.where(
            u < 0.5, onp.log(2 * u), -onp.log(2 * (1 - u))
        )

    fb = F(onp.asarray(bid))
    for k in (0, 1, 2, 3, 5, 10, 30):
        mu_d, sig_d, cmax = dist.pool_cost_deci_moments(
            bid, loc, scale, float(k)
        )
        if k == 0:
            assert float(mu_d) == 0.0 and float(sig_d) == 0.0
            continue
        u = rng.random(400_000)
        m = Finv(onp.clip(fb * u ** (1.0 / k), 1e-38, 1 - 1e-12))
        if k < 3:
            m = onp.maximum(m, 0.0)
        bm = m.mean() * 1000
        bs = onp.sqrt(m.var() * 1e6 + 1.0 / 12.0)
        assert abs(float(mu_d) - bm) < max(3.0, 0.01 * abs(bm)), (k, mu_d, bm)
        assert abs(float(sig_d) - bs) < max(3.0, 0.02 * bs), (k, sig_d, bs)
        assert float(cmax) == round(1000 * bid)


@pytest.mark.unit
def test_binomial_bernoulli_sum_exact_distribution():
    """The Bernoulli-sum binomial (the pool bidder-count sampler under
    inversion mode) must match Binomial(n, p) pmf and respect the n
    mask, at both bit widths."""
    import scipy.stats as st

    key = jax.random.PRNGKey(3)
    for bits in (32, 16):
        for n, p in ((30, 0.6), (7, 0.15), (0, 0.5)):
            draws = np.asarray(
                dist.binomial_bernoulli_sum(
                    key, float(n), p, nmax=32, bits=bits, shape=(200_000,)
                )
            )
            assert draws.min() >= 0 and draws.max() <= n
            if n == 0:
                assert (draws == 0).all()
                continue
            mean, var = draws.mean(), draws.var()
            assert abs(mean - n * p) < 0.05 * max(n * p, 1.0), (bits, n, p)
            assert abs(var - n * p * (1 - p)) < 0.08 * max(
                n * p * (1 - p), 1.0
            ), (bits, n, p)
            # chi-square against the exact pmf over the bulk support
            ks = np.arange(n + 1)
            pmf = st.binom.pmf(ks, n, p)
            keep = pmf * len(draws) > 10
            obs = np.bincount(draws, minlength=n + 1)[keep]
            exp = pmf[keep] * len(draws)
            chi2 = float(((obs - exp) ** 2 / exp).sum())
            dof = int(keep.sum()) - 1
            # generous: reject only catastrophic mismatch
            assert chi2 < dof * 3 + 30, (bits, n, p, chi2, dof)
