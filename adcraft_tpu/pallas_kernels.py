"""Fused Pallas day kernel.

The XLA step is HBM-bandwidth bound: every sub-timestep materializes
(E, K, M) cost/revenue/flag tensors, and the budget gate re-reads the
prefix tensor per Jacobi sweep (profiled ~8 ms per sub-timestep at
E=1024, ~80% of step time in those passes). This kernel runs the ENTIRE
day in VMEM:

* grid (E/E_BLK, T, K) — the TPU grid is sequential, so the shared
  depleting budget threads through (t, k) cells in exactly the reference's
  order (bidding_simulation.py:216-233) via VMEM scratch carries;
* per cell, all sampling happens in-register from the hardware PRNG
  (pltpu.prng_random_bits): literal per-auction competitor bids, click
  coinflips, conversion coinflips, Box-Muller revenue draws;
* HBM traffic is only: per-cell auction counts in, per-keyword day
  aggregates out (output blocks stay VMEM-resident for a whole env block).

Supported model: implicit single-competitor cents costs (the reference
experiment configuration). Other models use the XLA path.

The kernel is distribution-exact but NOT stream-identical to the XLA
path (different PRNG); it is validated by moment tests against the XLA
path and by invariant checks (tests/test_pallas.py; statistical
validation needs a real TPU — the interpreter stubs the hardware PRNG).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adcraft_tpu.config import CompetitorModel, EnvConfig, KeywordKind
from adcraft_tpu.keywords import KeywordState
from adcraft_tpu.step import DayOutcomes, split_volume

Array = jax.Array

_INV24 = 1.0 / (1 << 24)


def _uniform(shape) -> Array:
    """f32 uniforms in (0, 1) from hardware random bits."""
    bits = pltpu.prng_random_bits(shape)
    u = (bits >> jnp.uint32(8)).astype(jnp.float32) * _INV24
    # keep strictly inside (0,1) for icdf logs
    return jnp.clip(u, 1e-7, 1.0 - 1e-7)


def _laplace_icdf(u, loc, scale):
    lo = jnp.log(2.0 * u)
    hi = -jnp.log(2.0 * (1.0 - u))
    return loc + scale * jnp.where(u < 0.5, lo, hi)


def _day_kernel(
    # scalar prefetch
    seed_ref,  # (1,) i32 (SMEM)
    # inputs
    params_ref,  # (8, E_BLK, K) f32 (VMEM): bid_cents, bid_loc, bid_scale,
    #             bctr, sctr, rev_mean, rev_std, (pad) — per-env keyword
    #             params (each env samples its own keyword set)
    n_auc_ref,  # (1, E_BLK, K) i32 (VMEM) — this sub-timestep's counts
    budget_ref,  # (E_BLK, 1) i32 cents (VMEM)
    # outputs (blocked per env-block; VMEM-resident across all (t, k))
    imp_ref,  # (E_BLK, K) i32
    clicks_ref,
    cost_c_ref,
    convs_ref,
    rev_c_ref,
    elig_ref,
    # scratch
    b_ref,  # (E_BLK, 1) i32 — remaining budget cents
    broken_ref,  # (E_BLK, 1) i32
    *,
    m: int,
    num_k: int,
):
    e = pl.program_id(0)
    t = pl.program_id(1)
    k = pl.program_id(2)

    # deterministic stream per (block, cell) — Mosaic allows at most two
    # seed words, so the cell coordinate packs into one
    cell = (e * pl.num_programs(1) + t) * pl.num_programs(2) + k
    pltpu.prng_seed(seed_ref[0], cell)

    @pl.when((t == 0) & (k == 0))
    def _():
        b_ref[:, :] = budget_ref[:, :]
        broken_ref[:, :] = jnp.zeros_like(broken_ref)
        imp_ref[:, :] = jnp.zeros_like(imp_ref)
        clicks_ref[:, :] = jnp.zeros_like(clicks_ref)
        cost_c_ref[:, :] = jnp.zeros_like(cost_c_ref)
        convs_ref[:, :] = jnp.zeros_like(convs_ref)
        rev_c_ref[:, :] = jnp.zeros_like(rev_c_ref)
        elig_ref[:, :] = jnp.zeros_like(elig_ref)

    e_blk = b_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (e_blk, m), 1)
    # select keyword k's column via a one-hot matvec (dynamic lane indexing
    # is not lowerable; this is an MXU op, exact for ints < 2^24 and for
    # f32 params, since one-hot matvec performs no actual summation)
    kcol_k = jax.lax.broadcasted_iota(jnp.int32, (num_k, 1), 0)
    onehot_col = (kcol_k == k).astype(jnp.float32)  # (K, 1)

    def col(x_ek):  # (E_BLK, K) -> (E_BLK, 1), keyword k's column
        return jnp.dot(
            x_ek.astype(jnp.float32),
            onehot_col,
            preferred_element_type=jnp.float32,
        )

    n_auc = col(n_auc_ref[0, :, :]).astype(jnp.int32)  # (E_BLK, 1)
    active = lane < n_auc

    bid_c = col(params_ref[0]).astype(jnp.int32)  # (E_BLK, 1)
    loc = col(params_ref[1])
    scale = col(params_ref[2])
    bctr = col(params_ref[3])
    sctr = col(params_ref[4])
    rev_mean = col(params_ref[5])
    rev_std = col(params_ref[6])

    # literal competitor bids: C = round(|Laplace(loc, scale)|, 2) in cents
    u_comp = _uniform((e_blk, m))
    c_cents = jnp.round(
        100.0 * jnp.abs(_laplace_icdf(u_comp, loc, scale))
    ).astype(jnp.int32)
    won = active & (c_cents < bid_c)

    # click coinflips on won auctions (u <= bctr, synthetic_kw_helpers.py:73-77)
    u_click = _uniform((e_blk, m))
    clicked = won & (u_click <= bctr)

    # budget gating: accept clicked lanes while every clicked running sum
    # stays within the keyword's starting budget (break-at-first-overspend,
    # bidding_simulation.py:97-104). The first clicked lane whose running
    # sum overshoots kills every later lane.
    b = b_ref[:, :]  # (E_BLK, 1)
    click_cost = jnp.where(clicked, c_cents, 0)
    # lane prefix sums via a lower-triangular matmul (Mosaic has no cumsum;
    # this rides the MXU and is exact: cents values stay < 2^24 in f32)
    ii = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    tril = (ii <= jj).astype(jnp.float32)
    prefix = jnp.dot(
        click_cost.astype(jnp.float32), tril, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    viol = clicked & (prefix > b)
    first_viol = jnp.min(
        jnp.where(viol, lane, jnp.int32(m)), axis=1, keepdims=True
    )
    accepted = clicked & (lane < first_viol)

    sim = broken_ref[:, :] == 0  # (E_BLK, 1)
    acc_sim = accepted & sim
    spend = jnp.sum(jnp.where(acc_sim, c_cents, 0), axis=1, keepdims=True)
    n_acc = jnp.sum(acc_sim.astype(jnp.int32), axis=1, keepdims=True)

    # conversions + revenue on accepted clicks
    u_conv = _uniform((e_blk, m))
    conv = acc_sim & (u_conv <= sctr)
    u1 = _uniform((e_blk, m))
    u2 = _uniform((e_blk, m))
    normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    rev = jnp.maximum(rev_mean + rev_std * normal, 0.01)
    rev_cents = jnp.round(100.0 * rev).astype(jnp.int32)
    rev_sum = jnp.sum(jnp.where(conv, rev_cents, 0), axis=1, keepdims=True)
    n_conv = jnp.sum(conv.astype(jnp.int32), axis=1, keepdims=True)

    imps = jnp.sum((won & sim).astype(jnp.int32), axis=1, keepdims=True)

    # accumulate into the resident (E_BLK, K) aggregates via a one-hot
    # column mask (avoids dynamic minor-dim writes)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, num_k), 1)
    onehot = (kcol == k).astype(jnp.int32)  # (1, K)
    imp_ref[:, :] += imps * onehot
    clicks_ref[:, :] += n_acc * onehot
    cost_c_ref[:, :] += spend * onehot
    convs_ref[:, :] += n_conv * onehot
    rev_c_ref[:, :] += rev_sum * onehot
    elig_ref[:, :] += jnp.where((imps >= 1) & sim, n_auc, 0) * onehot

    # budget + break carry (reference: subtract then break on <= 0,
    # bidding_simulation.py:225-233)
    nb = b - spend
    b_ref[:, :] = nb
    broken_ref[:, :] = jnp.where(
        (broken_ref[:, :] != 0) | (nb <= 0), jnp.int32(1), jnp.int32(0)
    )


def pallas_simulate_day(
    cfg: EnvConfig,
    seed: Array,
    kw: KeywordState,
    bids: Array,
    budget: Array,
    volumes: Array,
    e_block: int = 256,
    interpret: bool = False,
) -> DayOutcomes:
    """Run a full day for an E-env batch with the fused kernel.

    ``seed``: int32 scalar; ``kw`` fields are (K,) (shared keyword set) or
    (E, K) (per-env keyword sets, the VectorBiddingEnv case). ``bids``
    (K,) or (E, K); ``budget`` scalar or (E,); ``volumes`` (E, K)
    pre-sampled daily volumes.
    """
    if cfg.kind is not KeywordKind.IMPLICIT or (
        cfg.competitor_model is not CompetitorModel.SINGLE_ABS_CENTS
    ):
        raise NotImplementedError("pallas day kernel: implicit single-competitor only")
    E, K = volumes.shape
    T = cfg.timesteps_per_day
    m = cfg.max_clicks_per_cell
    e_block = min(e_block, E)
    if E % e_block:
        raise ValueError(f"E={E} must divide by e_block={e_block}")

    n_auctions = split_volume(cfg, volumes.astype(jnp.int32))  # (T, E, K)
    budget_c = jnp.round(jnp.asarray(budget, jnp.float32) * 100.0).astype(
        jnp.int32
    )
    budget_c = jnp.broadcast_to(budget_c.reshape(-1), (E,))[:, None]

    def as_ek(x):  # (K,) shared or (E, K) per-env -> (E, K) f32
        return jnp.broadcast_to(jnp.asarray(x, jnp.float32), (E, K))

    params = jnp.stack(
        [
            jnp.round(as_ek(bids) * 100.0),
            as_ek(kw.bid_loc),
            as_ek(kw.bid_scale),
            as_ek(kw.bctr),
            as_ek(kw.sctr),
            as_ek(kw.rev_mean),
            as_ek(kw.rev_std),
            jnp.zeros((E, K), jnp.float32),
        ]
    )  # (8, E, K)

    out_shape = [jax.ShapeDtypeStruct((E, K), jnp.int32) for _ in range(6)]
    out_spec = pl.BlockSpec(
        (e_block, K), lambda e, t, k, _s: (e, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_day_kernel, m=m, num_k=K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // e_block, T, K),
        in_specs=[
            pl.BlockSpec(
                (8, e_block, K), lambda e, t, k, _s: (0, e, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, e_block, K), lambda e, t, k, _s: (t, e, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (e_block, 1), lambda e, t, k, _s: (e, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[out_spec] * 6,
        scratch_shapes=[
            pltpu.VMEM((e_block, 1), jnp.int32),
            pltpu.VMEM((e_block, 1), jnp.int32),
        ],
    )
    imp, clicks, cost_c, convs, rev_c, elig = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        params,
        n_auctions,
        budget_c,
    )
    dtype = cfg.money_dtype
    cost = cost_c.astype(dtype) / 100.0
    revenue = rev_c.astype(dtype) / 100.0
    return DayOutcomes(
        impressions=imp,
        buyside_clicks=clicks,
        cost=cost,
        sellside_conversions=convs,
        revenue=revenue,
        profit=revenue - cost,
        volume=volumes.astype(jnp.int32),
        eligible_volume=elig,
    )
