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


def evaluate(
    trainer: PPOTrainer, params, key, num_envs: int = 16,
    eval_days: int = None,
) -> Dict:
    """Greedy-policy rollout + AKNCP/NCP against the oracle curves.

    Mirrors the notebook's run_agent_for_max_days + compute_AKNCP/NCP
    eval loop (train_agent.ipynb cell 8). ``eval_days`` overrides the
    episode length (used when training runs on never-resetting episodes
    — the stationary-training mode — but evaluation should score the
    reference's standard 60-day episodes).
    """
    cfg = trainer.env_cfg
    if eval_days is not None:
        cfg = cfg.replace(max_days=eval_days)

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
    ap.add_argument("--lr", type=float, default=PPOConfig.lr)
    ap.add_argument("--rollout-days", type=int, default=PPOConfig.rollout_days)
    ap.add_argument(
        "--out",
        default=None,
        help="write the full training curve + a NaiveZeroMargin baseline "
        "comparison to this JSON file (the committed artifact of "
        "train_agent.ipynb cells 8/12/14's saved outputs)",
    )
    ap.add_argument(
        "--stationary-train",
        action="store_true",
        help="train on never-resetting episodes (each env's keyword set "
        "is a fixed learning target — removes the keyword-resample "
        "non-stationarity of short auto-reset episodes); evaluation "
        "still scores standard max_days episodes",
    )
    ap.add_argument(
        "--exact-env",
        action="store_true",
        help="use the injected-parity sampling modes (lanes/exact) instead "
        "of the default distribution-identical fast modes "
        "(agg costs, count conversions, aggregate revenue)",
    )
    args = ap.parse_args()

    env_config = ENV_CONFIGS[args.config]
    kc = env_config["keyword_config"]
    k = args.num_keywords or env_config["num_keywords"]
    fast = (
        {}
        if args.exact_env
        else dict(
            cost_sampling="agg",
            conv_sampling="counts",
            rev_sampling="day",
            lane_bits=16,
            binomial_sampler="inversion",
            gate_scope="chunk",
        )
    )
    eval_days = env_config["max_days"]
    cfg = EnvConfig(
        num_keywords=k,
        max_days=1_000_000 if args.stationary_train else eval_days,
        kind=KeywordKind.IMPLICIT,
        max_volume=int(max(32, 4 * kc["mean_volume"] + 64)),
        **fast,
    )
    trainer = PPOTrainer(
        cfg,
        args.num_envs,
        PPOConfig(lr=args.lr, rollout_days=args.rollout_days),
        table=experiment_table(env_config),
    )
    state = trainer.init(jax.random.PRNGKey(args.seed))
    untrained_eval = None
    if args.out:
        # the init-policy score: the floor against which the trained
        # policy's eval numbers are read
        untrained_eval = evaluate(
            trainer, state.params, jax.random.PRNGKey(999), num_envs=32,
            eval_days=eval_days,
        )
        print(json.dumps({"untrained": untrained_eval}), flush=True)
    if args.restore:
        from adcraft_tpu.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.restore, state)
        print(json.dumps({"restored": args.restore}), flush=True)
    curve = []
    for step in range(args.steps):
        state, metrics = trainer.train(state, 1)
        line = {"step": step, **{m: float(v) for m, v in metrics.items()}}
        if (step + 1) % args.eval_every == 0:
            line.update(
                evaluate(
                    trainer, state.params, jax.random.PRNGKey(1000 + step),
                    eval_days=eval_days,
                )
            )
        curve.append(line)
        print(json.dumps(line), flush=True)

    if args.out:
        # the trained policy vs the NaiveZeroMargin baseline on the SAME
        # metric protocol — the repo analogue of train_agent.ipynb's
        # saved cell outputs (trained-agent AKNCP/NCP vs the heatmap
        # baseline agent)
        from adcraft_tpu.experiments.harness import run_episode_batch

        final_eval = evaluate(
            trainer, state.params, jax.random.PRNGKey(999), num_envs=32,
            eval_days=eval_days,
        )
        zm = run_episode_batch(
            cfg.replace(max_days=eval_days), trainer.table,
            env_seeds=(5, 6, 7, 8), agent_seeds=(0, 1),
            num_days=eval_days,
        )
        ideal = zm["ideal_profits"]
        zm_akncp = float(
            np.mean(M.compute_AKNCP(zm["kw_profits"], ideal))
        )
        zm_ncp = float(np.mean(M.compute_NCP(zm["kw_profits"], ideal)))
        artifact = {
            "config": args.config,
            "num_envs": args.num_envs,
            "num_keywords": k,
            "steps": args.steps,
            "lr": args.lr,
            "rollout_days": args.rollout_days,
            "seed": args.seed,
            "curve": curve,
            "untrained": untrained_eval,
            "final": final_eval,
            "baseline_zero_margin": {"AKNCP": zm_akncp, "NCP": zm_ncp},
            "backend": jax.default_backend(),
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps({"out": args.out, "final": final_eval,
                          "baseline_zero_margin": artifact[
                              "baseline_zero_margin"]}), flush=True)

    if args.checkpoint:
        from adcraft_tpu.checkpoint import save_checkpoint

        # the full TrainState (params, optimizer state, env batch, PRNG
        # key) so --restore continues training exactly where it stopped
        save_checkpoint(args.checkpoint, state)
        print(json.dumps({"checkpoint": args.checkpoint}))


if __name__ == "__main__":
    main()
