"""Multi-agent composition and round-robin training.

Reference: adcraft/multi_agent/env.py (RLlib ``make_multi_agent`` over
FlatArrayWrapper copies) and adcraft/multi_agent/train.py (per-policy
round-robin ``.train()``). The reference's "multi-agent" environment is N
*independent* env copies keyed by agent id — there is no interaction
between agents — so the TPU-native version is a dict-keyed façade over
independent envs (host-side, RLlib-compatible semantics) plus a
round-robin trainer over independent PPO learners.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from adcraft_tpu.gym_env import BiddingSimulation
from adcraft_tpu.wrappers import FlatArrayWrapper


class MultiFlatEnv:
    """N independent flattened BiddingSimulations keyed by agent id.

    Mirrors the observable behaviour of ``make_multi_flat(n)``
    (multi_agent/env.py:8-35): dict obs/rewards/dones keyed 0..n-1, plus
    the "__all__" done flag RLlib expects.
    """

    def __init__(self, num_agents: int, env_config: Optional[Dict] = None):
        env_config = env_config or {}
        self.num_agents = num_agents
        self.envs = [
            FlatArrayWrapper(BiddingSimulation(**env_config))
            for _ in range(num_agents)
        ]
        self.observation_space = self.envs[0].observation_space
        self.action_space = self.envs[0].action_space

    def reset(self, *, seed: Optional[int] = None, options=None):
        obs, infos = {}, {}
        for i, env in enumerate(self.envs):
            s = None if seed is None else seed + i
            obs[i], infos[i] = env.reset(seed=s, options=options)
        return obs, infos

    def step(self, action_dict: Dict[int, np.ndarray]):
        obs, rewards, terms, truncs, infos = {}, {}, {}, {}, {}
        for i, action in action_dict.items():
            obs[i], rewards[i], terms[i], truncs[i], infos[i] = self.envs[i].step(
                action
            )
        terms["__all__"] = all(terms.get(i, False) for i in action_dict)
        truncs["__all__"] = all(truncs.get(i, False) for i in action_dict)
        return obs, rewards, terms, truncs, infos


def make_multi_flat(num_agents: int, env_config: Optional[Dict] = None) -> MultiFlatEnv:
    """Reference-named constructor (multi_agent/env.py:8)."""
    return MultiFlatEnv(num_agents, env_config)


def basic_policy_mapping_fn(agent_id, *args, **kwargs) -> str:
    """agent_id -> policy name (multi_agent/train.py:11-13)."""
    return str(agent_id)


def make_multi_trainers(
    env_cfg,
    num_policies: int,
    num_envs: int = 8,
    ppo_cfgs: Optional[List] = None,
    table=None,
    seed: int = 0,
) -> Tuple[List, List]:
    """Build N independent PPO learners over copies of one env config.

    The TPU-native analogue of the reference's per-policy algo builds
    over the shared multi-agent env (multi_agent/train.py:79-86): its
    "multi-agent" env is N non-interacting copies, so N vectorized
    learners with distinct seeds/hyper-params reproduce the setting with
    the env batch living on device. ``ppo_cfgs`` optionally gives each
    policy its own PPOConfig (the reference trains heterogeneous
    PPO/SAC configs side by side).
    """
    import jax

    from adcraft_tpu.agents.ppo import PPOConfig, PPOTrainer

    if ppo_cfgs is None:
        ppo_cfgs = [PPOConfig() for _ in range(num_policies)]
    if len(ppo_cfgs) != num_policies:
        raise ValueError("need one ppo config per policy")
    trainers = [
        PPOTrainer(env_cfg, num_envs, ppo_cfg=c, table=table) for c in ppo_cfgs
    ]
    states = [
        t.init(jax.random.fold_in(jax.random.PRNGKey(seed), i))
        for i, t in enumerate(trainers)
    ]
    return trainers, states


def multi_train(trainers: List, states: List, epochs: int = 1) -> Dict:
    """Round-robin training over independent learners.

    ``trainers`` are PPOTrainer-likes with ``train(state, 1)`` (build
    them with :func:`make_multi_trainers`); mirrors
    multi_agent/train.py:88-92's per-policy round-robin. Returns the
    advanced states plus per-policy metrics, including the reference's
    ``result["sampler_results"]["policy_reward_mean"]`` surface
    (multi_agent/train.py:20-23).
    """
    if len(trainers) != len(states):
        raise ValueError("need one state per trainer")
    results = {}
    for _ in range(epochs):
        for i, trainer in enumerate(trainers):
            states[i], metrics = trainer.train(states[i], 1)
            results[basic_policy_mapping_fn(i)] = metrics
    reward_mean = {
        name: m.get("mean_reward") for name, m in results.items()
    }
    return {
        "states": states,
        "policy_metrics": results,
        "sampler_results": {"policy_reward_mean": reward_mean},
    }
