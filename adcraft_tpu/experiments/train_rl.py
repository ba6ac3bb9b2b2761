"""PPO training CLI with periodic AKNCP/NCP evaluation.

Replaces the reference's RL training notebook (adcraft/RL/train_agent.ipynb:
RLlib PPO/A2C/TD3 on FlatArrayAuction with periodic AKNCP/NCP eval and
checkpoint save/restore).

Usage:
    python -m adcraft_tpu.experiments.train_rl --config dense --steps 50 \
        --num-envs 256 --checkpoint /tmp/ppo_ckpt
"""

from __future__ import annotations

import argparse
import json
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from adcraft_tpu import metrics as M
from adcraft_tpu.agents.ppo import PPOConfig, PPOTrainer
from adcraft_tpu.config import EnvConfig, KeywordKind
from adcraft_tpu.env import env_reset, env_step
from adcraft_tpu.experiments.configs import ENV_CONFIGS, experiment_table
from adcraft_tpu.experiments.harness import BID_GRID
from adcraft_tpu.keywords import sample_implicit_keywords


def evaluate(trainer: PPOTrainer, params, key, num_envs: int = 16) -> Dict:
    """Greedy-policy rollout + AKNCP/NCP against the oracle curves.

    Mirrors the notebook's run_agent_for_max_days + compute_AKNCP/NCP
    eval loop (train_agent.ipynb cell 8).
    """
    cfg = trainer.env_cfg

    def rollout(k):
        kw = sample_implicit_keywords(k, cfg.num_keywords, trainer.table)
        state, obs0 = env_reset(cfg, jax.random.fold_in(k, 1), kw=kw)
        win, cpc = M.implicit_kw_bid_curves(
            kw, jnp.asarray(BID_GRID), jax.random.fold_in(k, 2)
        )
        ideal, _, _ = M.max_expected_bid_profits(
            kw.vol_mean, kw.bctr, kw.sctr, kw.rev_mean, cpc, win
        )
        from adcraft_tpu.agents.networks import flatten_obs

        def day(carry, _):
            state, obs_flat = carry
            mean, _ = trainer.policy.apply(params["policy"], obs_flat)
            bids, budget = trainer.policy.squash(mean)  # greedy (no noise)
            state, ts = env_step(cfg, state, bids, budget)
            return (state, flatten_obs(ts.obs)), (ts.outcomes.profit, ts.reward)

        (_, _), (profits, rewards) = jax.lax.scan(
            day, (state, flatten_obs(obs0)), None, length=cfg.max_days
        )
        ideal_t = jnp.broadcast_to(ideal, profits.shape)
        return (
            M.compute_AKNCP(profits, ideal_t),
            M.compute_NCP(profits, ideal_t),
            rewards.sum(),
        )

    keys = jax.random.split(key, num_envs)
    akncp, ncp, ret = jax.jit(jax.vmap(rollout))(keys)
    return {
        "AKNCP": float(jnp.mean(akncp)),
        "NCP": float(jnp.mean(ncp)),
        "episode_return": float(jnp.mean(ret)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="dense", choices=sorted(ENV_CONFIGS))
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--num-envs", type=int, default=128)
    ap.add_argument("--num-keywords", type=int, default=None)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--restore",
        default=None,
        help="checkpoint path to resume training from (the notebook's "
        "Algorithm.from_checkpoint path, train_agent.ipynb cells 12/14); "
        "restores the FULL TrainState (params, optimizer, env batch, key)",
    )
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    env_config = ENV_CONFIGS[args.config]
    kc = env_config["keyword_config"]
    k = args.num_keywords or env_config["num_keywords"]
    cfg = EnvConfig(
        num_keywords=k,
        max_days=env_config["max_days"],
        kind=KeywordKind.IMPLICIT,
        max_volume=int(max(32, 4 * kc["mean_volume"] + 64)),
    )
    trainer = PPOTrainer(
        cfg, args.num_envs, PPOConfig(), table=experiment_table(env_config)
    )
    state = trainer.init(jax.random.PRNGKey(args.seed))
    if args.restore:
        from adcraft_tpu.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.restore, state)
        print(json.dumps({"restored": args.restore}), flush=True)
    for step in range(args.steps):
        state, metrics = trainer.train(state, 1)
        line = {"step": step, **{m: float(v) for m, v in metrics.items()}}
        if (step + 1) % args.eval_every == 0:
            line.update(
                evaluate(
                    trainer, state.params, jax.random.PRNGKey(1000 + step)
                )
            )
        print(json.dumps(line), flush=True)

    if args.checkpoint:
        from adcraft_tpu.checkpoint import save_checkpoint

        # the full TrainState (params, optimizer state, env batch, PRNG
        # key) so --restore continues training exactly where it stopped
        save_checkpoint(args.checkpoint, state)
        print(json.dumps({"checkpoint": args.checkpoint}))


if __name__ == "__main__":
    main()
