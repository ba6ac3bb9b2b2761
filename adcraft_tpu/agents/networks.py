"""Policy / value networks.

Flax MLPs mirroring the reference's RLlib model configs: PPO uses
[32, 32] relu (agent_configs.py:64-67), A2C [256, 256] (:79-82), TD3
[400, 300] (:97-100). Observations are the flattened dict (sorted keys,
5K+2 floats — gymnasium_kw_utils.py:383-390).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = getattr(nn, self.activation)
        for h in self.hidden:
            x = act(nn.Dense(h)(x))
        return nn.Dense(self.out)(x)


class GaussianPolicy(nn.Module):
    """Diagonal-Gaussian policy over the flat action vector.

    Outputs are squashed to the env's valid box: per-keyword bids in
    [min_bid, max_bid] and a budget in [min_budget, max_budget] via
    sigmoid scaling. (The reference trains RLlib policies directly on the
    unbounded Box and relies on env-side clamping; squashing keeps PPO's
    log-probs well-defined.)
    """

    num_keywords: int
    hidden: Sequence[int] = (32, 32)
    min_bid: float = 0.01
    max_bid: float = 3.0
    min_budget: float = 100.0
    max_budget: float = 10000.0

    @nn.compact
    def __call__(self, obs: Array) -> Tuple[Array, Array]:
        dim = self.num_keywords + 1
        mean = MLP(self.hidden, dim)(obs)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (dim,)
        )
        return mean, jnp.broadcast_to(log_std, mean.shape)

    def squash(self, raw: Array) -> Tuple[Array, Array]:
        """Map a raw Gaussian sample to (bids (…,K), budget (…,))."""
        u = jax.nn.sigmoid(raw)
        bids = self.min_bid + (self.max_bid - self.min_bid) * u[..., :-1]
        budget = self.min_budget + (self.max_budget - self.min_budget) * u[..., -1]
        return bids, budget


class ValueNet(nn.Module):
    hidden: Sequence[int] = (32, 32)

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        return MLP(self.hidden, 1)(obs)[..., 0]


def flatten_obs(obs: dict) -> Array:
    """Flatten an obs dict (sorted keys) along the last axis — the batched
    jnp analogue of ``flatten_dict_array`` (gymnasium_kw_utils.py:383-390)."""
    parts = [jnp.asarray(obs[k], jnp.float32) for k in sorted(obs.keys())]
    return jnp.concatenate(parts, axis=-1)
