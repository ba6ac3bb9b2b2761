"""Decompose TPU step time by ablating control-flow-heavy components.

Variants (monkeypatched, NOT semantics-preserving — timing probes only):

  full    — the production step, unmodified.
  fixed4  — Jacobi gate with 4 UNROLLED sweeps, no while_loop (wrong if a
            gate needs >4 sweeps; fine for timing).
  nogate  — gate replaced by unconditional full acceptance (no budget
            threading at all).
  nobinom — nogate + dist.binomial replaced by a deterministic round(n*p)
            (removes jax.random.binomial's internal while_loops) — what's
            left is pure sampling + reductions.

Usage: python scripts/tpu_probe.py [variant ...]   (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
NUM_KEYWORDS = int(os.environ.get("BENCH_NUM_KEYWORDS", 100))
STEPS = int(os.environ.get("BENCH_STEPS", 8))


def time_step(tag):
    from adcraft_tpu.config import EnvConfig, KeywordKind
    from adcraft_tpu.env import VectorBiddingEnv
    from adcraft_tpu.quantiles import simple_experiment_table

    # env-count read per variant so "BENCH_NUM_ENVS=8192+full" A/Bs batch
    # scaling INSIDE one bracketed process (the only trustworthy kind of
    # comparison through the drifting tunnel)
    n_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    # mirror bench.py's config (same env knobs) so "full" hits the warm
    # compile cache and ablations decompose the actual bench path
    from adcraft_tpu.config import CompetitorModel

    cfg = EnvConfig(
        num_keywords=NUM_KEYWORDS,
        kind=KeywordKind.IMPLICIT,
        competitor_model=CompetitorModel(
            os.environ.get("BENCH_COMPETITOR", "single_abs_cents")
        ),
        max_volume=int(os.environ.get("BENCH_MAX_VOLUME", "576")),
        max_days=60,
        day_kernel=os.environ.get("BENCH_KERNEL", "xla"),
        prng_impl=os.environ.get("BENCH_PRNG", "threefry2x32"),
        conv_sampling=os.environ.get("BENCH_CONV", "counts"),
        rev_sampling=os.environ.get("BENCH_REV", "sum"),
        cost_sampling=os.environ.get("BENCH_COST", "agg"),
        lane_bits=int(os.environ.get("BENCH_LANE_BITS", "16")),
        binomial_sampler=os.environ.get("BENCH_BINOM", "inversion"),
        gate_scope=os.environ.get("BENCH_GATE_SCOPE", "chunk"),
        agg_lite_lanes=int(os.environ.get("BENCH_LITE", "1")),
        gate_chunk_t=int(os.environ.get("BENCH_CHUNK_T", "4")),
        gate_compact=os.environ.get("BENCH_COMPACT", "auto"),
        gate_compact_phase_a=int(os.environ.get("BENCH_PHASE_A", "0")),
        gate_compact_cap=int(os.environ.get("BENCH_COMPACT_CAP", "0")),
        gate_scan_unroll=int(os.environ.get("BENCH_UNROLL", "1")),
        agg_draw_bits=int(os.environ.get("BENCH_AGG_BITS", "32")),
    )
    table = simple_experiment_table(
        float(os.environ.get("PROBE_VOL", "128")),
        float(os.environ.get("PROBE_CVR", "0.8")),
    )
    venv = VectorBiddingEnv(cfg, n_envs, table=table)
    key = jax.random.PRNGKey(0)
    state, _ = venv.reset(key)
    bids = jnp.full((n_envs, NUM_KEYWORDS), 1.0, jnp.float32)

    # PROBE_DISPATCH=scan rolls the whole STEPS-day window into one
    # device program (VectorBiddingEnv.rollout) — isolates per-call
    # dispatch from compute (VERDICT r4 item 6); default percall keeps
    # continuity with the r1-r4 probe records.
    scan_days = os.environ.get("PROBE_DISPATCH", "percall") == "scan"

    def run_window(state):
        if scan_days:
            state, tss = venv.rollout(state, bids, STEPS)
            float(tss.reward.sum())
            return state
        for _ in range(STEPS):
            state, ts = venv.step(state, bids)
        float(ts.reward.sum())
        return state

    t_c0 = time.perf_counter()
    state = run_window(state)
    compile_s = time.perf_counter() - t_c0

    # min over several timing windows: the tunnel's service latency
    # drifts UP over a process's life (measured: an identical program
    # re-timed at the end of a 7-variant process ran 41 ms/step vs 27 at
    # the start), so the minimum is the closest available estimate of
    # device time; the per-window list is printed to expose the drift.
    windows = []
    for _ in range(int(os.environ.get("PROBE_WINDOWS", 3))):
        t0 = time.perf_counter()
        state = run_window(state)
        windows.append(time.perf_counter() - t0)
    dt = min(windows)
    print(
        f"PROBE {tag}: {n_envs * STEPS / dt:.1f} env-steps/s "
        f"({dt / STEPS * 1e3:.1f} ms/step min of "
        f"{[round(w / STEPS * 1e3, 1) for w in windows]}, "
        f"compile+warm {compile_s:.1f}s)",
        flush=True,
    )


def patch_fixed4():
    import adcraft_tpu.step as step_mod

    def jacobi_fixed(budget0, broken0, prefix, n_clicks, max_iter):
        m1, K = prefix.shape
        m = m1 - 1
        lane = jnp.arange(m)
        zero = jnp.zeros((), prefix.dtype)

        def g(B):
            valid = (prefix[1:, :] <= B[None, :]) & (
                lane[:, None] < n_clicks[None, :]
            )
            ok = jnp.cumprod(valid.astype(jnp.int32), axis=0)
            p = jnp.sum(ok, axis=0).astype(jnp.int32)
            spend = jnp.take_along_axis(prefix, p[None, :], axis=0)[0]
            return p, spend

        def sweep(spend):
            excl = jnp.concatenate([zero[None], jnp.cumsum(spend)[:-1]])
            B = budget0 - excl
            p2, s2 = g(B)
            nb = B - s2
            alive = jnp.cumprod((nb > 0).astype(jnp.int32))
            sim = ~broken0 & jnp.concatenate(
                [jnp.ones((1,), bool), alive[:-1].astype(bool)]
            )
            return jnp.where(sim, s2, zero), jnp.where(sim, p2, 0), sim

        p, spend = g(jnp.full((K,), budget0, prefix.dtype))
        sim = jnp.full((K,), ~broken0)
        spend = jnp.where(sim, spend, zero)
        p = jnp.where(sim, p, 0)
        for _ in range(4):  # unrolled — no dynamic control flow
            spend, p, sim = sweep(spend)
        b_path = budget0 - jnp.cumsum(spend)
        return (b_path[-1], broken0 | jnp.any(b_path <= 0)), (p, spend, sim)

    step_mod._gate_keywords_jacobi = jacobi_fixed


def patch_nogate():
    import adcraft_tpu.step as step_mod

    def accept_all(budget0, broken0, prefix, n_clicks, max_iter=0):
        K = prefix.shape[1]
        spend = jnp.take_along_axis(prefix, n_clicks[None, :], axis=0)[0]
        sim = jnp.full((K,), True)
        return (budget0, broken0), (n_clicks, spend, sim)

    step_mod._gate_keywords_jacobi = accept_all
    step_mod._gate_keywords_lazy = accept_all  # bench path (cents → lazy)


def patch_nobinom():
    from adcraft_tpu import distributions as dist_mod
    import adcraft_tpu.auction as auction_mod
    import adcraft_tpu.step as step_mod

    def det_binomial(key, n, p, shape=None):
        n = jnp.asarray(n, jnp.float32)
        p = jnp.clip(jnp.asarray(p, jnp.float32), 0.0, 1.0)
        if shape is None:
            shape = jnp.broadcast_shapes(n.shape, p.shape)
        return jnp.broadcast_to(jnp.round(n * p), shape).astype(jnp.int32)

    dist_mod.binomial = det_binomial
    auction_mod.dist.binomial = det_binomial
    step_mod.dist.binomial = det_binomial

    def det_binomial_inv(key, n, p, nmax=0, bits=32, shape=None):
        return det_binomial(key, n, p, shape)

    dist_mod.binomial_inv = det_binomial_inv  # bench path (inversion mode)


def patch_linearcost():
    """Cost lanes keep their threefry draws but skip the log inverse-CDF."""
    from adcraft_tpu import distributions as dist_mod

    def linear_trunc(key, loc, scale, low, high, shape, bits=32):
        u = (
            dist_mod.uniform16(key, shape)
            if bits == 16
            else jax.random.uniform(key, shape)
        )
        return low + (high - low) * u

    dist_mod.truncated_laplace = linear_trunc


def patch_nocostdraws():
    """Cost lanes become a constant table (no threefry, no transform)."""
    from adcraft_tpu import distributions as dist_mod

    def const_trunc(key, loc, scale, low, high, shape, bits=32):
        return jnp.broadcast_to(jnp.asarray(0.25, jnp.float32), shape)

    dist_mod.truncated_laplace = const_trunc


def patch_nomoments():
    """Replace the exact cent-moment computations with constants (timing
    only). Patches BOTH the grid and the closed-form implicit moments —
    the bench path calls the closed form (step.py) — plus the explicit
    grid moments, so the variant ablates whichever one the config uses."""
    from adcraft_tpu import distributions as dist_mod

    def _const(bid):
        bid = jnp.asarray(bid, jnp.float32)
        one = jnp.ones_like(bid)
        return 47.5 * one, 23.8 * one, jnp.maximum(
            jnp.round(bid * 100.0) - 1.0, 0.0
        )

    def const_moments(bid, loc, scale, grid):
        return _const(bid)

    def const_moments_closed(bid, loc, scale):
        return _const(bid)

    def const_moments_generic(bid, grid):
        return _const(bid)

    def const_moments_pool(bid, loc, scale, k):
        mu, sig, _ = _const(bid)
        return 10.0 * mu, 10.0 * sig, jnp.round(
            jnp.asarray(bid, jnp.float32) * 1000.0
        ) * jnp.ones_like(mu)

    dist_mod.single_cost_cent_moments = const_moments
    dist_mod.single_cost_cent_moments_closed = const_moments_closed
    dist_mod.generic_cost_cent_moments = const_moments_generic
    dist_mod.pool_cost_deci_moments = const_moments_pool


def patch_nogate_agg():
    """Agg gate -> unconditional full acceptance (timing only). Patched
    at the _make_agg_gate factory so BOTH the unbatched path and the
    compacted custom_vmap rule are ablated."""
    import adcraft_tpu.step as step_mod

    def factory(make_resolve, gate_mode, compact, phase_a, cap, min_batch=64):
        def accept_all(b0, br, sf, lite, ncl, t_base, kc, *params):
            n = sf.shape[0]
            return (b0, br), (ncl, sf, jnp.full((n,), True))

        return accept_all

    step_mod._make_agg_gate = factory


def patch_maxiter_agg(cap: int):
    """Cap the lazy-agg gate's while_loop iterations (timing only; WRONG
    results when a gate needs more sweeps). A ladder of caps separates
    per-sweep cost from sweep count: if step time scales with the cap,
    envs are hitting it (non-convergence); if it saturates, the loop
    converges below the cap."""
    import adcraft_tpu.step as step_mod

    orig = step_mod._lazy_agg_loop

    def capped(b0, sf, lt, ncl, resolve_fn, max_iter, state):
        return orig(b0, sf, lt, ncl, resolve_fn, min(max_iter, cap), state)

    step_mod._lazy_agg_loop = capped


def patch_noresolve_agg():
    """Deep lane resolution -> constant (0, 0) (timing only; WRONG when a
    budget-partial cell exists). Isolates resolve_fn's cost per sweep,
    in both the unbatched path and the compacted rule."""
    import adcraft_tpu.step as step_mod

    orig = step_mod._make_agg_gate

    def factory(make_resolve, *a, **k):
        def dummy_make(lite_n, t_base, kc, *params):
            def dummy(j, B, nk, hit):
                return jnp.asarray(0, jnp.int32), jnp.zeros((), jnp.int32)

            return dummy

        return orig(dummy_make, *a, **k)

    step_mod._make_agg_gate = factory


def patch_oldepi():
    """Restore the round-4 epilogue (cumsum+cumprod+cumsum) — A/B of the
    round-5 single-cumsum epilogue."""
    import adcraft_tpu.step as step_mod

    def old_epilogue(budget0, broken0, spend, p):
        zero = jnp.zeros((), spend.dtype)
        nb = budget0 - jnp.cumsum(spend)
        alive = jnp.cumprod((nb > 0).astype(jnp.int32))
        sim = ~broken0 & jnp.concatenate(
            [jnp.ones((1,), bool), alive[:-1].astype(bool)]
        )
        spend = jnp.where(sim, spend, zero)
        p = jnp.where(sim, p, 0)
        b_path = budget0 - jnp.cumsum(spend)
        return (b_path[-1], broken0 | jnp.any(b_path <= 0)), (p, spend, sim)

    step_mod._lazy_agg_epilogue = old_epilogue


def patch_nocompact():
    """Force gate_compact off (the round-4 lockstep batched gate) without
    a new config — in-process A/B of the straggler compaction."""
    import adcraft_tpu.step as step_mod

    orig = step_mod._make_agg_gate

    def factory(make_resolve, gate_mode, compact, phase_a, cap, min_batch=64):
        return orig(make_resolve, gate_mode, False, phase_a, cap, min_batch)

    step_mod._make_agg_gate = factory


def patch_compact(cap: int, phase_a: int = 0):
    """Force compaction on with an explicit cap / phase-A iteration count
    (in-process ladder of compaction knobs)."""
    import adcraft_tpu.step as step_mod

    orig = step_mod._make_agg_gate

    def factory(make_resolve, gate_mode, compact, _pa, _cap, min_batch=64):
        return orig(make_resolve, gate_mode, True, phase_a, cap, min_batch)

    step_mod._make_agg_gate = factory


def patch_nodraws_agg():
    """Aggregate spend/revenue normals -> deterministic means (timing
    only) — isolates the cost of the per-cell aggregate draws."""
    from adcraft_tpu import distributions as dist_mod

    def det_agg_cost(key, n_clicks, mu, sigma, cmax, cents_dtype,
                     cmin=None, bits=32):
        import jax.numpy as jnp

        n = n_clicks.astype(jnp.float32)
        lo = 0.0 if cmin is None else n * cmin
        return jnp.clip(jnp.round(n * mu), lo, n * cmax).astype(cents_dtype)

    def det_rev_sum(key, nconv, rev_mean, rev_std, cents_dtype):
        import jax.numpy as jnp

        n = nconv.astype(jnp.float32)
        return jnp.round(n * 100.0 * rev_mean).astype(cents_dtype)

    dist_mod.agg_cost_cents = det_agg_cost
    dist_mod.rev_sum_cents = det_rev_sum


def patch_nodrift():
    """Non-stationarity drift -> identity (timing only) — isolates
    update_keywords' share of the env-step shell."""
    import adcraft_tpu.step as step_mod
    import adcraft_tpu.env as env_mod

    def ident(cfg, key, kw):
        return kw

    step_mod.update_keywords = ident
    env_mod.update_keywords = ident


def patch_noimp():
    """Hoisted impression-ladder draw -> deterministic round(n*p) (timing
    only) — isolates the tier-1 imp CDF-ladder build + compare."""
    from adcraft_tpu import distributions as dist_mod

    def det_from_cdf(key, ladder, bits=32):
        cdf, flip, ni = ladder
        nmax = cdf.shape[0] - 1
        u = jnp.full(cdf.shape[1:], 0.5, jnp.float32)
        cnt = jnp.sum((cdf[:nmax] < u[None]).astype(jnp.int32), axis=0,
                      dtype=jnp.int32)
        cnt = jnp.clip(cnt, 0, ni)
        return jnp.where(flip, ni - cnt, cnt).astype(jnp.int32)

    dist_mod.binomial_inv_from_cdf = det_from_cdf


def patch_nobinom_agg():
    """Inversion binomials -> deterministic round(n*p) (timing only)."""
    from adcraft_tpu import distributions as dist_mod

    def det_binomial_inv(key, n, p, nmax=0, bits=32, shape=None):
        n = jnp.asarray(n, jnp.float32)
        p = jnp.clip(jnp.asarray(p, jnp.float32), 0.0, 1.0)
        if shape is None:
            shape = jnp.broadcast_shapes(n.shape, p.shape)
        return jnp.broadcast_to(jnp.round(n * p), shape).astype(jnp.int32)

    dist_mod.binomial_inv = det_binomial_inv


def _apply(part):
    if part.startswith("full"):  # "full", "full2", ... re-time unpatched
        pass
    elif "=" in part:
        # config-override variant piece, e.g. "BENCH_REV=day+full" or
        # "BENCH_LITE=2": sets the env knob for THIS variant only (the
        # run loop restores the original environment), so different
        # EnvConfigs can be A/B'd inside one bracketed process
        k, v = part.split("=", 1)
        os.environ[k] = v
    elif part == "fixed4":
        patch_fixed4()
    elif part == "nogate":
        patch_nogate()
    elif part == "nobinom":
        patch_nogate()
        patch_nobinom()
    elif part == "linearcost":
        patch_linearcost()
    elif part == "nocost":
        patch_nocostdraws()
    elif part == "nomoments":
        patch_nomoments()
    elif part == "nogate_agg":
        patch_nogate_agg()
    elif part == "nocompact":
        patch_nocompact()
    elif part == "oldepi":
        patch_oldepi()
    elif part.startswith("compact"):
        spec = part[len("compact"):]
        if "p" in spec:
            cap_s, pa_s = spec.split("p")
            patch_compact(int(cap_s), int(pa_s))
        else:
            patch_compact(int(spec))
    elif part == "nobinom_agg":
        patch_nobinom_agg()
    elif part == "noresolve_agg":
        patch_noresolve_agg()
    elif part == "nodraws_agg":
        patch_nodraws_agg()
    elif part == "noimp":
        patch_noimp()
    elif part == "nodrift":
        patch_nodrift()
    elif part.startswith("maxiter"):
        patch_maxiter_agg(int(part[len("maxiter"):]))
    else:
        raise SystemExit(f"unknown variant {part}")


def _snapshot():
    """Pristine copies of every patchable site, so variants don't stack
    across the run loop (a 'maxiter4' after a 'maxiter8' must not compose
    into min(4, 8)). Composition within one variant is spelled explicitly
    with '+': e.g. 'nogate_agg+nobinom_agg'."""
    import adcraft_tpu.auction as auction_mod
    import adcraft_tpu.env as env_mod
    import adcraft_tpu.step as step_mod
    from adcraft_tpu import distributions as dist_mod

    return {
        (step_mod, "update_keywords"): step_mod.update_keywords,
        (env_mod, "update_keywords"): env_mod.update_keywords,
        (step_mod, "_gate_keywords_lazy_agg"): step_mod._gate_keywords_lazy_agg,
        (step_mod, "_make_agg_gate"): step_mod._make_agg_gate,
        (step_mod, "_lazy_agg_loop"): step_mod._lazy_agg_loop,
        (step_mod, "_lazy_agg_epilogue"): step_mod._lazy_agg_epilogue,
        (step_mod, "_gate_keywords_lazy"): step_mod._gate_keywords_lazy,
        (step_mod, "_gate_keywords_jacobi"): step_mod._gate_keywords_jacobi,
        (dist_mod, "binomial"): dist_mod.binomial,
        (dist_mod, "binomial_inv"): dist_mod.binomial_inv,
        (dist_mod, "truncated_laplace"): dist_mod.truncated_laplace,
        (dist_mod, "single_cost_cent_moments"): dist_mod.single_cost_cent_moments,
        (dist_mod, "single_cost_cent_moments_closed"):
            dist_mod.single_cost_cent_moments_closed,
        (dist_mod, "generic_cost_cent_moments"):
            dist_mod.generic_cost_cent_moments,
        (dist_mod, "pool_cost_deci_moments"):
            dist_mod.pool_cost_deci_moments,
        (dist_mod, "agg_cost_cents"): dist_mod.agg_cost_cents,
        (dist_mod, "binomial_inv_from_cdf"): dist_mod.binomial_inv_from_cdf,
        (dist_mod, "rev_sum_cents"): dist_mod.rev_sum_cents,
        (auction_mod.dist, "binomial"): dist_mod.binomial,
    }


if __name__ == "__main__":
    variants = sys.argv[1:] or ["full", "fixed4", "nogate", "nobinom"]
    pristine = _snapshot()
    env0 = dict(os.environ)
    for v in variants:
        for (mod, name), fn in pristine.items():
            setattr(mod, name, fn)
        for k in [k for k in os.environ if k not in env0]:
            del os.environ[k]
        os.environ.update(env0)
        for part in v.split("+"):
            _apply(part)
        time_step(v)
