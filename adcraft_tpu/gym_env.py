"""Gymnasium single-environment adapter.

API-compatible with the reference ``BiddingSimulation``
(adcraft/gymnasium_kw_env.py:22-363): same constructor signature, spaces,
step/reset/render contract, info keys, and render text. Internally it holds
an ``EnvState`` pytree and calls the fused jitted step — one device call
per day instead of thousands of Python/FFI operations.

Keyword generation on reset uses the numpy-parity samplers driven by
``self.np_random`` so that seeded keyword sets match the reference
draw-for-draw (gymnasium_kw_env.py:301-316).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import gymnasium as gym
import jax
import numpy as np

from adcraft_tpu.config import (
    CompetitorModel,
    EnvConfig,
    KeywordKind,
    UpdaterConfig,
)
from adcraft_tpu.env import EnvState, env_reset, env_step, zero_observation
from adcraft_tpu.keywords import (
    KeywordState,
    keyword_param_tuples,
    repr_all_params,
    sample_explicit_keywords_numpy,
    sample_implicit_keywords_numpy,
)
from adcraft_tpu.quantiles import (
    QuantileTable,
    load_experiment_quantiles,
    make_experiment_quantiles,
    table_from_csv,
)
from adcraft_tpu.spaces import get_action_space, get_observation_space


def _updater_config(updater_params: List[List]) -> UpdaterConfig:
    """[["vol", s], ["ctr", s], ["cvr", s]] -> UpdaterConfig."""
    scales = {name: float(v) for name, v in updater_params}
    return UpdaterConfig(
        vol_scale=scales.get("vol", 0.03),
        ctr_scale=scales.get("ctr", 0.03),
        cvr_scale=scales.get("cvr", 0.03),
    )


def _resolve_table(keyword_config: Dict) -> QuantileTable:
    """Resolve a quantile table via the reference's make/load hook protocol.

    gymnasium_kw_utils.py:281-289: use ``load_quant_func`` if a
    ``quantiles_folder`` is set; otherwise call ``make_quant_func`` then
    load. Hooks may return a QuantileTable or a pandas DataFrame in the
    reference's column layout.
    """
    load = keyword_config.get("load_quant_func", None)
    make = keyword_config.get("make_quant_func", None)
    if load is None and make is None:
        # default experiment hooks (experiment_quantiles.py:68-84)
        make = make_experiment_quantiles
        load = load_experiment_quantiles
    if keyword_config.get("quantiles_folder", False):
        data = load(keyword_config)
    else:
        if make is not None:
            make(keyword_config)
        data = load(keyword_config)
    assert data is not None, (
        "Invalid quantile parameters specified in keyword_config for data"
    )
    if isinstance(data, QuantileTable):
        return data
    # assume a pandas DataFrame in the reference layout
    import pandas as pd

    if isinstance(data, pd.DataFrame):
        import tempfile, os

        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            path = f.name
        try:
            data.to_csv(path)
            return table_from_csv(path)
        finally:
            os.unlink(path)
    raise TypeError(f"unsupported quantile data type: {type(data)}")


class BiddingSimulation(gym.Env):
    """Gymnasium environment for keyword auction bidding.

    Drop-in equivalent of the reference ``BiddingSimulation``
    (gymnasium_kw_env.py:22-363). ``keyword_config`` selects implicit
    quantile-sampled keywords; without it, random explicit keywords are
    sampled on reset.
    """

    metadata = {"render_modes": ["ansi"]}

    def __init__(
        self,
        keyword_config: Optional[Dict] = None,
        num_keywords: int = 10,
        budget: float = 1000.0,
        render_mode: Optional[str] = None,
        loss_threshold: float = 10000.0,
        max_days: int = 60,
        updater_params: List[List] = [["vol", 0.03], ["ctr", 0.03], ["cvr", 0.03]],
        updater_mask: Optional[List[bool]] = None,
        max_volume: Optional[int] = None,
        **kwargs,
    ) -> None:
        super().__init__()
        self.keyword_config = keyword_config
        self.num_keywords = num_keywords
        self.budget = float(budget)
        self.max_days = max_days
        self.loss_threshold = loss_threshold
        self.action_space = get_action_space(num_keywords)
        self.observation_space = get_observation_space(num_keywords, self.budget)

        assert render_mode is None or render_mode in self.metadata["render_modes"], (
            f"Specified render_mode of ({render_mode}) is not in the allowed "
            f'options of ({", ".join(self.metadata["render_modes"])})'
        )
        self.render_mode = render_mode

        self.updater_params = updater_params
        self.updater_mask = updater_mask
        if updater_mask is not None:
            assert len(updater_mask) == num_keywords
            self.num_updates = int(np.sum(updater_mask))

        implicit = keyword_config is not None
        self._table: Optional[QuantileTable] = (
            _resolve_table(keyword_config) if implicit else None
        )
        if max_volume is None:
            if implicit:
                vmax = float(np.max(self._table.param_triples("vol")[:, 2]))
                # volume ~ round(N(mean, 1 + 0.5*mean)); 4x mean + slack
                # covers > 6 sigma of the clipped draw
                max_volume = int(max(32, 4 * vmax + 64))
            else:
                # explicit random keywords: vol_mean <= 29, vol_std <= 15
                max_volume = 128
        self.cfg = EnvConfig(
            num_keywords=num_keywords,
            max_days=max_days,
            budget=self.budget,
            loss_threshold=loss_threshold,
            kind=KeywordKind.IMPLICIT if implicit else KeywordKind.EXPLICIT,
            competitor_model=CompetitorModel.SINGLE_ABS_CENTS,
            max_volume=max_volume,
            updater=_updater_config(updater_params),
        )
        self._no_vol_prob = (
            float(keyword_config.get("no_vol_prob", 0.0)) if implicit else 0.0
        )

        self._have_keywords = False
        self._current_text = "New start\n"
        self._state: Optional[EnvState] = None
        self.keyword_params: Optional[List] = None

        cfg = self.cfg
        self._jit_step = jax.jit(
            lambda state, bids, budget: env_step(cfg, state, bids, budget)
        )

    # ------------------------------------------------------------------

    def set_updater_mask(self, new_updater_mask: List[bool]) -> None:
        """Replace the updater mask (reference gymnasium_kw_env.py:105-112).

        The reference stores the mask on the env object and consults it on
        every ``update_keywords`` call; here it lives inside
        ``KeywordState.updater_mask``, so a live episode's state is
        rewritten too — the new mask takes effect from the next step.
        """
        assert len(new_updater_mask) == self.num_keywords, (
            f"Updater mask length ({len(new_updater_mask)})\n"
            + f"must match number of keywords ({self.num_keywords}) "
            + "to be applied."
        )
        self.updater_mask = new_updater_mask
        self.num_updates = int(np.sum(new_updater_mask))
        if self._state is not None:
            import jax.numpy as jnp

            kw = self._state.kw._replace(
                updater_mask=jnp.asarray(new_updater_mask, bool)
            )
            self._state = self._state._replace(kw=kw)

    def _sample_keywords(self) -> KeywordState:
        mask = self.updater_mask
        if self.keyword_config is not None:
            return sample_implicit_keywords_numpy(
                self.np_random,
                self.num_keywords,
                self._table,
                self._no_vol_prob,
                updater_mask=mask,
            )
        return sample_explicit_keywords_numpy(
            self.np_random, self.num_keywords, updater_mask=mask
        )

    def reset(
        self, *, seed: Optional[int] = None, options: Optional[dict] = None
    ) -> Tuple[dict, dict]:
        """Reset state; resample keywords if a seed is given or none exist.

        Mirrors gymnasium_kw_env.py:271-346 including the options fields
        (max_days / render_mode / loss_threshold).
        """
        super().reset(seed=seed)
        if seed is not None or not self._have_keywords:
            self._kw = self._sample_keywords()
            self.keyword_params = [
                list(p)
                for p in keyword_param_tuples(
                    self._kw, implicit=self.keyword_config is not None
                )
            ]
            self._have_keywords = True
        if options:
            self.max_days = options.get("max_days", self.max_days)
            rm = options.get("render_mode", self.render_mode)
            if rm is None or rm in self.metadata["render_modes"]:
                self.render_mode = rm
            self.loss_threshold = options.get("loss_threshold", self.loss_threshold)

        key = jax.random.PRNGKey(int(self.np_random.integers(0, 2**31 - 1)))
        state, _ = env_reset(self.cfg, key, kw=self._kw)
        import jax.numpy as jnp

        state = state._replace(
            max_days=jnp.asarray(self.max_days, jnp.int32),
            loss_threshold=jnp.asarray(self.loss_threshold, self.cfg.money_dtype),
            budget=jnp.asarray(self.budget, self.cfg.money_dtype),
        )
        self._state = state
        self.current_day = 0
        self.cumulative_profit = 0.0
        self._current_text = "Reset environment\n\nNew start\n"

        observations = self._to_numpy_obs(
            jax.tree.map(np.asarray, zero_observation(self.cfg))
        )
        info = {"keyword_params": repr_all_params(self.keyword_params)}
        return observations, info

    def step(self, action: dict) -> Tuple[dict, float, bool, bool, dict]:
        """One day of bidding (gymnasium_kw_env.py:160-269)."""
        assert self._have_keywords, (
            "reset required, need to generate keywords to bid on"
        )
        budget = np.asarray(action.get("budget", self.budget), dtype=np.float64)
        budget = float(np.round(budget, 2).reshape(-1)[0])
        self.budget = budget
        bids = np.asarray(action["keyword_bids"], dtype=np.float64).reshape(-1)

        self._state, ts = self._jit_step(self._state, bids, budget)

        reward = float(ts.reward)
        self.cumulative_profit = float(ts.obs["cumulative_profit"][0])
        self.current_day = int(ts.obs["days_passed"][0])
        terminated = bool(ts.terminated)
        truncated = bool(ts.truncated)

        observations = self._to_numpy_obs(jax.tree.map(np.asarray, ts.obs))
        out = jax.tree.map(np.asarray, ts.outcomes)
        clean_bids = [round(max(float(b), 0.01), 2) for b in bids]
        info = {
            "bids": clean_bids,
            "bidding_outcomes": _repr_outcomes(clean_bids, out),
            "keyword_params": repr_all_params(self.keyword_params),
        }

        if self.render_mode == "ansi":
            self._current_text = (
                f"Time step: {self.current_day}/{self.max_days},   "
                f"Average profit per kw in step: {reward / self.num_keywords:.2f},   "
                f"Budget: {self.budget}   "
                f"Total profit in step: {reward:.2f},   "
                f"Cumulative profit: {self.cumulative_profit:.2f}\n"
            )
        if truncated:
            self._current_text += (
                "Bidding simulation truncated early, we spent too much.\n"
                f"Our allowed spend was ({self.loss_threshold:.2f}),\n"
                f"but our cumulative loss was ({self.cumulative_profit:.2f})"
            )
        return observations, reward, terminated, truncated, info

    def _to_numpy_obs(self, obs: dict) -> dict:
        """Cast to the observation space's dtypes."""
        return {
            "impressions": np.asarray(obs["impressions"], dtype=np.int64),
            "buyside_clicks": np.asarray(obs["buyside_clicks"], dtype=np.int64),
            "cost": np.asarray(obs["cost"], dtype=np.float32),
            "sellside_conversions": np.asarray(
                obs["sellside_conversions"], dtype=np.int64
            ),
            "revenue": np.asarray(obs["revenue"], dtype=np.float32),
            "cumulative_profit": np.asarray(
                obs["cumulative_profit"], dtype=np.float32
            ),
            "days_passed": np.asarray(obs["days_passed"], dtype=np.float32),
        }

    def render(self) -> Optional[str]:
        """ansi text summary (gymnasium_kw_env.py:348-354)."""
        if self.render_mode == "ansi":
            return self._current_text

    def close(self):
        pass

    # convenience accessors -------------------------------------------------

    @property
    def state(self) -> EnvState:
        return self._state

    @property
    def keyword_state(self) -> KeywordState:
        return self._kw


def _repr_outcomes(bids, out) -> str:
    """Day-outcome summary string for info["bidding_outcomes"].

    The reference's ``rust.repr_outcomes_py`` (src/lib.rs:251-275) includes
    every individual click cost/revenue; the fused kernel keeps only sums,
    so this repr reports the aggregate fields with the same key names.
    Uses the native C++ formatter when built (adcraft_tpu._native).
    """
    try:
        from adcraft_tpu import _native

        share = np.where(
            out.eligible_volume > 0,
            out.impressions / np.maximum(out.eligible_volume, 1),
            0.0,
        )
        return _native.repr_outcomes(
            np.asarray(bids, np.float64),
            np.asarray(out.impressions, np.int64),
            np.asarray(share, np.float64),
            np.asarray(out.buyside_clicks, np.int64),
            np.asarray(out.cost, np.float64),
            np.asarray(out.sellside_conversions, np.int64),
            np.asarray(out.revenue, np.float64),
            np.asarray(out.profit, np.float64),
        )
    except ImportError:
        pass
    parts = []
    for i, bid in enumerate(bids):
        parts.append(
            "{'bid': %s, 'impressions': %d, 'impression_share': %s, "
            "'buyside_clicks': %d, 'costs_total': %s, "
            "'sellside_conversions': %d, 'revenues_total': %s, 'profit': %s}"
            % (
                bid,
                int(out.impressions[i]),
                float(out.impression_share[i]),
                int(out.buyside_clicks[i]),
                float(out.cost[i]),
                int(out.sellside_conversions[i]),
                float(out.revenue[i]),
                float(out.profit[i]),
            )
        )
    return "[" + ", ".join(parts) + "]"


def bidding_sim_creator(env_config: Dict) -> BiddingSimulation:
    """Unwrap a config dict into env parameters (gymnasium_kw_env.py:361-363)."""
    return BiddingSimulation(**env_config)
