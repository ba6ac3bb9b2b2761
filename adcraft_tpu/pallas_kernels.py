"""Fused Pallas day kernel — ARCHIVED reference kernel, not a perf path.

STATUS (round 4, PLAN.md "Pallas day-kernel FATE"): hardware-validated at
1,915 env-steps/s in round 1, but both of its premises are measured dead
— the hardware PRNG (3.43G words/s) is ~6x SLOWER than healthy threefry,
and the agg sampling modes already removed the HBM tables it avoided.
The r4 XLA path runs 164x faster (314k env-steps/s). It is retained as
an interpret-tested reference TPU kernel for the lanes-semantics day
(tests/test_pallas.py keeps it compiling and distribution-correct);
``day_kernel="pallas"`` remains a guarded opt-in.

Original design notes — the kernel runs the ENTIRE day in VMEM:

* grid (E/E_BLK, T) — the TPU grid is sequential, so the shared depleting
  budget threads through sub-timesteps in exactly the reference's order
  (bidding_simulation.py:216-233) via VMEM scratch carries; all K keywords
  of a sub-timestep are processed vectorized in one invocation.
* all sampling happens in-register from the hardware PRNG
  (pltpu.prng_random_bits): literal per-auction competitor bids, click
  coinflips, conversion coinflips, Box-Muller revenue draws.
* the within-sub-timestep budget threading across keywords (priority by
  keyword order, break-at-first-overspend within a keyword,
  bidding_simulation.py:97-104,216-233) is solved by an in-kernel
  while_loop of Jacobi sweeps over the K cells, run to its fixed point —
  exact, like the XLA gates (forward substitution converges in <= K
  sweeps; typically 2-4; the ``gate_converged`` output certifies the cap
  was never hit on hardware) — using lane-masked sums
  instead of gathers and lower-triangular MXU matvecs for the K-axis
  cumulative sums (Mosaic has no native cumsum; cents stay < 2^24 so f32
  matmuls are exact).
* HBM traffic is only: per-cell auction counts in, per-keyword day
  aggregates out (output blocks stay VMEM-resident for a whole env block).

Supported model: implicit single-competitor cents costs (the reference
experiment configuration). Other models use the XLA path.

The kernel is distribution-exact but NOT stream-identical to the XLA
path (different PRNG); it is validated by moment tests against the XLA
path on real TPU (scripts/validate_pallas.py) and by invariant checks
(tests/test_pallas.py; the interpreter stubs the hardware PRNG).
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
    """f32 uniforms in (0, 1) from hardware random bits.

    ``prng_random_bits`` returns int32 (signed!); take the LOW 24 bits via
    a mask — a right shift would be arithmetic and sign-extend half the
    draws into the clip bounds, silently skewing every distribution (this
    is invisible in interpret mode, which stubs the bits to zero).
    """
    bits = pltpu.prng_random_bits(shape)
    u = (bits & jnp.int32(0x00FFFFFF)).astype(jnp.float32) * _INV24
    # keep strictly inside (0,1) for icdf logs
    return jnp.clip(u, 1e-7, 1.0 - 1e-7)


def _laplace_icdf(u, loc, scale):
    lo = jnp.log(2.0 * u)
    hi = -jnp.log(2.0 * (1.0 - u))
    return loc + scale * jnp.where(u < 0.5, lo, hi)


def _cumsum0(x: Array) -> Array:
    """Inclusive cumsum along (untiled) axis 0 by log-doubling shifts."""
    m = x.shape[0]
    d = 1
    while d < m:
        x = x + jnp.concatenate([jnp.zeros_like(x[:d]), x[:-d]], axis=0)
        d *= 2
    return x


def _day_kernel(
    # scalar prefetch
    seed_ref,  # (1,) i32 (SMEM)
    # inputs
    params_ref,  # (8, E_BLK, K) f32 (VMEM): bid_cents, bid_loc, bid_scale,
    #             bctr, sctr, rev_mean, rev_std, (pad) — per-env keyword
    #             params (each env samples its own keyword set)
    n_auc_ref,  # (1, E_BLK, K) i32 (VMEM) — this sub-timestep's counts
    budget_ref,  # (E_BLK, 1) i32 cents (VMEM)
    # outputs (blocked per env-block; VMEM-resident across all t)
    imp_ref,  # (E_BLK, K) i32
    clicks_ref,
    cost_c_ref,
    convs_ref,
    rev_c_ref,
    elig_ref,
    conv_flag_ref,  # (E_BLK, 1) i32 — 1 iff the gate converged every t
    # scratch
    b_ref,  # (E_BLK, 1) i32 — remaining budget cents
    broken_ref,  # (E_BLK, 1) i32
    *,
    m: int,
):
    e = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], e * pl.num_programs(1) + t)

    @pl.when(t == 0)
    def _():
        b_ref[:, :] = budget_ref[:, :]
        broken_ref[:, :] = jnp.zeros_like(broken_ref)
        imp_ref[:, :] = jnp.zeros_like(imp_ref)
        clicks_ref[:, :] = jnp.zeros_like(clicks_ref)
        cost_c_ref[:, :] = jnp.zeros_like(cost_c_ref)
        convs_ref[:, :] = jnp.zeros_like(convs_ref)
        rev_c_ref[:, :] = jnp.zeros_like(rev_c_ref)
        elig_ref[:, :] = jnp.zeros_like(elig_ref)
        conv_flag_ref[:, :] = jnp.ones_like(conv_flag_ref)

    e_blk, K = imp_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, e_blk, K), 0)
    n_auc = n_auc_ref[0]  # (E_BLK, K)
    active = lane < n_auc[None]

    bid_c = params_ref[0].astype(jnp.int32)  # (E_BLK, K)
    loc = params_ref[1]
    scale = params_ref[2]
    bctr = params_ref[3]
    sctr = params_ref[4]
    rev_mean = params_ref[5]
    rev_std = params_ref[6]

    # literal competitor bids: C = round(|Laplace(loc, scale)|, 2) in cents
    u_comp = _uniform((m, e_blk, K))
    c_cents = jnp.round(
        100.0 * jnp.abs(_laplace_icdf(u_comp, loc[None], scale[None]))
    ).astype(jnp.int32)
    won = active & (c_cents < bid_c[None])

    # click coinflips on won auctions (u <= bctr, synthetic_kw_helpers.py:73-77)
    u_click = _uniform((m, e_blk, K))
    clicked = won & (u_click <= bctr[None])
    click_cost = jnp.where(clicked, c_cents, 0)
    prefix = _cumsum0(click_cost)  # running clicked-cost sums per cell
    n_clicks = jnp.sum(clicked.astype(jnp.int32), axis=0)
    s_full = jnp.sum(click_cost, axis=0)

    # within-sub-timestep budget threading across keywords: unrolled
    # Jacobi sweeps (exact at the fixed point; costs are nonneg cents so a
    # cell's acceptance is "clicked lanes whose running sum stays <= its
    # start budget", a pure mask — no gathers)
    b0 = b_ref[:, :]  # (E_BLK, 1)
    broken0 = broken_ref[:, :] != 0  # (E_BLK, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    l_strict = (kk < jj).astype(jnp.float32)  # excl-cumsum matvec over K

    def sweep(spend):
        excl = jnp.dot(
            spend.astype(jnp.float32), l_strict,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        B = b0 - excl  # (E_BLK, K) start budget per cell
        acc_mask = clicked & (prefix <= B[None])
        p2 = jnp.sum(acc_mask.astype(jnp.int32), axis=0)
        s2 = jnp.sum(jnp.where(acc_mask, click_cost, 0), axis=0)
        nb = B - s2
        # sim: no break strictly before the cell, and day not broken
        breaks_before = jnp.dot(
            (nb <= 0).astype(jnp.float32), l_strict,
            preferred_element_type=jnp.float32,
        ) > 0.0
        sim = (~broken0) & (~breaks_before)
        return jnp.where(sim, s2, 0), jnp.where(sim, p2, 0), sim, B, nb

    def w_cond(carry):
        spend_c, prev_c, it = carry
        return jnp.any(spend_c != prev_c) & (it < K + 2)

    def w_body(carry):
        spend_c, _prev, it = carry
        s2, _p2, _sim2, _B2, _nb2 = sweep(spend_c)
        return s2, spend_c, it + 1

    spend0 = jnp.where(broken0, 0, s_full)
    s1, _p1, _sim1, _B1, _nb1 = sweep(spend0)
    spend, _prev, iters = jax.lax.while_loop(
        w_cond, w_body, (s1, spend0, jnp.asarray(1, jnp.int32))
    )
    # exit requires sweep(prev) == prev == spend: a true fixed point, so
    # this final evaluation is a no-op that yields the consistent
    # (p, sim, B, nb) tuple for output assembly. Forward substitution
    # makes the first i cells exact after i sweeps, so the K+2 cap is
    # unreachable — the flag records that on actual hardware.
    spend, p, sim, B, nb = sweep(spend)
    conv_flag_ref[:, :] = conv_flag_ref[:, :] * (iters < K + 2).astype(
        jnp.int32
    )

    acc = clicked & (prefix <= B[None]) & sim[None]

    # conversions + revenue on accepted clicks
    u_conv = _uniform((m, e_blk, K))
    conv = acc & (u_conv <= sctr[None])
    u1 = _uniform((m, e_blk, K))
    u2 = _uniform((m, e_blk, K))
    normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    rev = jnp.maximum(rev_mean[None] + rev_std[None] * normal, 0.01)
    rev_cents = jnp.where(conv, jnp.round(100.0 * rev).astype(jnp.int32), 0)

    imps = jnp.where(sim, jnp.sum((won).astype(jnp.int32), axis=0), 0)
    imp_ref[:, :] += imps
    clicks_ref[:, :] += p
    cost_c_ref[:, :] += spend
    convs_ref[:, :] += jnp.sum(conv.astype(jnp.int32), axis=0)
    rev_c_ref[:, :] += jnp.sum(rev_cents, axis=0)
    elig_ref[:, :] += jnp.where(sim & (imps >= 1), n_auc, 0)

    # budget + break carry (reference: subtract then break on <= 0,
    # bidding_simulation.py:225-233)
    b_ref[:, :] = b0 - jnp.sum(spend, axis=1, keepdims=True)
    day_broke = jnp.any(sim & (nb <= 0), axis=1, keepdims=True)
    broken_ref[:, :] = (broken0 | day_broke).astype(jnp.int32)


def pallas_simulate_day(
    cfg: EnvConfig,
    seed: Array,
    kw: KeywordState,
    bids: Array,
    budget: Array,
    volumes: Array,
    e_block: int = 64,
    interpret: bool = False,
) -> Tuple[DayOutcomes, Array]:
    """Run a full day for an E-env batch with the fused kernel.

    ``seed``: int32 scalar; ``kw`` fields are (K,) (shared keyword set) or
    (E, K) (per-env keyword sets, the VectorBiddingEnv case). ``bids``
    (K,) or (E, K); ``budget`` scalar or (E,); ``volumes`` (E, K)
    pre-sampled daily volumes.

    Returns (DayOutcomes, gate_converged (E,) bool). ``gate_converged``
    certifies the in-kernel budget gate reached its fixed point in every
    sub-timestep (forward substitution converges in <= K sweeps, so the
    flag is True unless the hardware misbehaves; a False value means
    that env block's results are untrusted).
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
    out_shape.append(jax.ShapeDtypeStruct((E, 1), jnp.int32))
    out_spec = pl.BlockSpec(
        (e_block, K), lambda e, t, _s: (e, 0), memory_space=pltpu.VMEM
    )
    flag_spec = pl.BlockSpec(
        (e_block, 1), lambda e, t, _s: (e, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_day_kernel, m=m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // e_block, T),
        in_specs=[
            pl.BlockSpec(
                (8, e_block, K), lambda e, t, _s: (0, e, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, e_block, K), lambda e, t, _s: (t, e, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (e_block, 1), lambda e, t, _s: (e, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[out_spec] * 6 + [flag_spec],
        scratch_shapes=[
            pltpu.VMEM((e_block, 1), jnp.int32),
            pltpu.VMEM((e_block, 1), jnp.int32),
        ],
    )
    imp, clicks, cost_c, convs, rev_c, elig, conv_flag = pl.pallas_call(
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
    day = DayOutcomes(
        impressions=imp,
        buyside_clicks=clicks,
        cost=cost,
        sellside_conversions=convs,
        revenue=revenue,
        profit=revenue - cost,
        volume=volumes.astype(jnp.int32),
        eligible_volume=elig,
    )
    return day, conv_flag[:, 0] > 0
