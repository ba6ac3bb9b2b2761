"""Reference-semantics NaiveInterpolationStrategy in seeded numpy.

A torch-free, loop-level transliteration of the reference agent
(/root/reference/adcraft/baselines/interpolated_expectations.py:298-439)
used as the head-to-head oracle for ``adcraft_tpu.baselines.
NaiveInterpolationStrategy`` (tests/test_baselines.py). Semantics are
kept quirk-for-quirk:

* per-bid caches keyed by ``round(bid, 2)`` strings, scanned over the
  ``np.arange(0.01, 3.01, 0.01)`` cent grid (:155-165);
* ``smoothed``: Bartlett window of length ``min(5, max(1, n-1))`` over the
  COMPACT observed-points sequence — which means NO smoothing until 5
  observed points (``np.bartlett`` of length <= 2 has zero mass and
  length 3 is the identity hat), a right-shifted 2-tap average at
  exactly 5, and the {0, .25, .5, .25, 0} hat from 6 on (:203-211);
* cpc interpolation fills (left=0.01, right=max raw average) and clicks
  fills (first/last raw averages) (:254-270);
* the no-data prior cpc = 0.9*bid, clicks = 1 (:271-275);
* acquisition threshold shrinking with observations, the
  ``int(100*(max_observed_bid + bid_step) - 1)`` truncation cutoff, and
  the 1.5x/10000/1000 budget heuristic (:370-439).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def bidstr(bid: float) -> str:
    return str(round(float(bid), 2))


def empty_cache() -> Dict:
    return {
        "ave_rpc": 0.0,
        "num_rpc_obs": 0,
        "ave_sctr": 0.4,
        "num_sctr_obs": 0.0,
        "ave_cpc": {},
        "ave_clicks": {},
    }


def smoothed(values: np.ndarray) -> np.ndarray:
    window = np.bartlett(min([5, max([1, len(values) - 1])]))
    mass = np.sum(window)
    if mass > 0:
        window = window / mass
    else:
        window = [1]
    return np.convolve(values, window, mode="same")


def update_cache(cache: Dict, bid: float, obs_row: Dict, kw: int) -> None:
    """full_cache_update for one keyword's single-day observation
    (interpolated_expectations.py:214-235 with the length-1 window the
    reference always feeds it)."""
    clicks = float(obs_row["buyside_clicks"][kw])
    convs = float(obs_row["sellside_conversions"][kw])
    revenue = float(obs_row["revenue"][kw])
    cost = float(obs_row["cost"][kw])

    # ---- rpc / sctr running averages (:67-152) ----
    if clicks > 0 and convs > 0:
        rpc_sample = revenue / convs
        n_old = cache["num_rpc_obs"]
        cache["ave_rpc"] = (rpc_sample + cache["ave_rpc"] * n_old) / max(
            1, 1 + n_old
        )
        cache["num_rpc_obs"] = 1 + n_old
    if clicks > 0:
        all_obs = clicks + cache["num_sctr_obs"]
        all_convs = convs + cache["ave_sctr"] * cache["num_sctr_obs"]
        cache["ave_sctr"] = all_convs / max(1.0, all_obs)
        cache["num_sctr_obs"] = cache["num_sctr_obs"] + 1

    # ---- per-bid cpc / clicks caches (:22-64) ----
    cpc = cost / clicks if clicks > 0 else float("nan")
    key = bidstr(bid)
    if cache["ave_cpc"].get(key) is None:
        if clicks > 0:
            cache["ave_cpc"][key] = [cpc, 1]
    elif not np.isnan(cpc):
        ave, n = cache["ave_cpc"][key]
        cache["ave_cpc"][key] = [(cpc + ave * n) / (1 + n), 1 + n]
    if cache["ave_clicks"].get(key) is None:
        cache["ave_clicks"][key] = [clicks, 1]
    else:
        ave, n = cache["ave_clicks"][key]
        cache["ave_clicks"][key] = [(clicks + ave * n) / (1 + n), 1 + n]


def expected_rev_per_click(cache: Dict) -> float:
    if cache["num_rpc_obs"] < 1 and cache["num_sctr_obs"] < 1:
        return 0.3
    if cache["num_rpc_obs"] < 1:
        return 0.7 * float(cache["ave_sctr"])
    return float(cache["ave_rpc"]) * float(cache["ave_sctr"])


def interpolation_points(bid_cache: Dict) -> Tuple[List, List]:
    bids, values = [], []
    for bid in np.arange(0.01, 3.01, 0.01):
        if bid_cache.get(bidstr(bid), False):
            bids.append(bid)
            values.append(bid_cache[bidstr(bid)][0])
    return bids, values


def expected_profit_per_bid(
    cache: Dict, allowed_bids: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    rev_pc = expected_rev_per_click(cache)
    bids_cpc, ave_cpcs = interpolation_points(cache["ave_cpc"])
    bids_clk, ave_clicks = interpolation_points(cache["ave_clicks"])
    if np.any(bids_cpc):
        cpc_per_bid = np.interp(
            allowed_bids,
            bids_cpc,
            smoothed(ave_cpcs),
            left=0.01,
            right=np.max(ave_cpcs),
        )
        clicks_per_bid = np.interp(
            allowed_bids,
            bids_clk,
            smoothed(ave_clicks),
            left=ave_clicks[0],
            right=ave_clicks[-1],
        )
    else:
        cpc_per_bid = 0.9 * allowed_bids
        clicks_per_bid = 1.0
    margins = (-cpc_per_bid + rev_pc) * (0.01 + clicks_per_bid)
    costs = cpc_per_bid * (0.01 + clicks_per_bid)
    return margins, costs


class OracleInterpolationStrategy:
    """Seeded, torch-free reference NaiveInterpolationStrategy."""

    def __init__(
        self,
        num_keywords: int,
        profit_acquisition_threshold: float = -0.2,
        seed: Optional[int] = None,
        bid_step: float = 0.03,
    ):
        self.caches = [empty_cache() for _ in range(num_keywords)]
        self.threshold = profit_acquisition_threshold
        self.allowed_bids = np.linspace(0.01, 3.00, 300)
        self.bid_step = bid_step
        self.rng = np.random.default_rng(seed)

    def update_all_caches(self, prev_action: Dict, prev_obs: Dict) -> None:
        for i, bid in enumerate(prev_action["keyword_bids"]):
            update_cache(self.caches[i], float(bid), prev_obs, i)

    def acquisition(self, kw: int) -> Optional[np.ndarray]:
        """Normalized acquisition distribution (or None = bid 0.01)."""
        margins, _ = expected_profit_per_bid(self.caches[kw], self.allowed_bids)
        cache = self.caches[kw]
        threshold = -(
            1 / (1 + cache["num_rpc_obs"] + cache["num_sctr_obs"] / 5)
        ) * np.abs(self.threshold)
        acq = np.maximum(margins, threshold) - threshold
        observed = [float(b) for b in cache["ave_clicks"].keys()]
        observed.append(0.03)
        mob_index = int(100 * (max(observed) + self.bid_step) - 1)
        end = min([len(acq), mob_index])
        acq[end:] = 0.0
        mass = np.sum(acq[:end])
        if mass > 0:
            return acq / mass
        return None

    def sample_action(self) -> Dict:
        bids = []
        expected_cost = 0.0
        expected_profit = 0.0
        self.last_indices = []  # chosen grid index per keyword (-1 = no mass)
        for i, cache in enumerate(self.caches):
            margins, costs = expected_profit_per_bid(cache, self.allowed_bids)
            acq = self.acquisition(i)
            if acq is None:
                bids.append(0.01)
                self.last_indices.append(-1)
            else:
                idx = self.rng.choice(len(self.allowed_bids), p=acq)
                self.last_indices.append(int(idx))
                bids.append(self.allowed_bids[idx])
                if cache["num_sctr_obs"] > 0:
                    expected_cost += costs[idx]
                else:
                    expected_cost += self.allowed_bids[idx]
                if cache["num_rpc_obs"] > 0:
                    expected_profit += margins[idx]
        if expected_profit > 0:
            budget = 1.5 * max([min([expected_cost, 10000]), 1000])
        elif expected_profit > len(self.caches) * self.threshold:
            budget = max([min([expected_cost, 10000]), 1000])
        else:
            budget = 1000
        return {"budget": budget, "keyword_bids": np.array(bids)}
