"""Native C++ host-kernel tests: must agree bit-for-bit with the numpy
oracle (the analogue of the reference's Rust-vs-Python equivalence tests,
adcraft/tests/rust/test_helpers.py)."""

import numpy as np
import pytest

native = pytest.importorskip("adcraft_tpu._native")

from adcraft_tpu.oracle.numpy_env import (  # noqa: E402
    nth_price_auction_numpy,
    simulate_day_native,
    simulate_day_numpy,
)


def random_draws(rng, T, K, M, cents=True):
    n_clicks = rng.integers(0, M + 1, (T, K))
    imps = n_clicks + rng.integers(0, 3, (T, K))
    costs = np.round(rng.uniform(0.0, 1.2, (T, K, M)), 2)
    if not cents:
        costs = rng.uniform(0.0, 1.2, (T, K, M))
    return {
        "volume": rng.integers(0, 24 * 4, (K,)).astype(np.int64),
        "impressions": imps.astype(np.int64),
        "n_clicks": n_clicks.astype(np.int64),
        "costs": costs,
        "conv_flags": (rng.random((T, K, M)) < 0.4),
        "revs": np.round(rng.uniform(0.01, 2.0, (T, K, M)), 2),
    }


@pytest.mark.unit
@pytest.mark.parametrize("cents", [True, False])
@pytest.mark.parametrize("budget", [1e9, 37.5, 2.0, 0.0])
@pytest.mark.parametrize("seed", range(3))
def test_gate_day_matches_python_oracle(cents, budget, seed):
    rng = np.random.default_rng(seed)
    draws = random_draws(rng, T=6, K=5, M=7, cents=cents)
    a = simulate_day_numpy(None, budget, draws, timesteps=6, cents=cents)
    b = simulate_day_native(None, budget, draws, timesteps=6, cents=cents)
    for k in ("impressions", "buyside_clicks", "sellside_conversions",
              "eligible_volume", "volume"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    np.testing.assert_allclose(a["cost"], b["cost"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(a["revenue"], b["revenue"], rtol=0, atol=1e-12)


@pytest.mark.unit
@pytest.mark.parametrize("n_bidders", [1, 2, 3, 10])
@pytest.mark.parametrize("seed", range(3))
def test_native_auction_matches_python(n_bidders, seed):
    rng = np.random.default_rng(seed)
    other = rng.laplace(0.2, 0.3, (50, n_bidders))
    for bid in (0.01, 0.3, 0.9, 2.0):
        pi, pp, pc = nth_price_auction_numpy(bid, other, 2, 1)
        ni, np_, nc = native.nth_price_auction(bid, np.ascontiguousarray(other), 2, 1)
        assert pi == ni
        np.testing.assert_array_equal(pp, np_)
        np.testing.assert_allclose(pc, nc, atol=1e-12)


@pytest.mark.unit
def test_repr_outcomes_format():
    s = native.repr_outcomes(
        np.asarray([1.0, 0.5]),
        np.asarray([10, 0], np.int64),
        np.asarray([0.5, 0.0]),
        np.asarray([3, 0], np.int64),
        np.asarray([1.25, 0.0]),
        np.asarray([1, 0], np.int64),
        np.asarray([2.5, 0.0]),
        np.asarray([1.25, 0.0]),
    )
    assert s.startswith("[{'bid': 1.0, 'impressions': 10")
    assert "'profit': 1.25}" in s
    assert s.endswith("}]")
