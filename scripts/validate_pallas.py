"""Validate the fused Pallas day kernel on real TPU: moments vs XLA path + timing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_pallas.py [E] [days]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
import jax, jax.numpy as jnp, numpy as np
from adcraft_tpu.config import CompetitorModel, EnvConfig, KeywordKind
from adcraft_tpu.keywords import make_keyword_state
from adcraft_tpu.pallas_kernels import pallas_simulate_day
from adcraft_tpu.step import simulate_day
from adcraft_tpu import distributions as dist

import os
MODE = os.environ.get("VALIDATE_MODE", "both")
E = int(sys.argv[1]) if len(sys.argv) > 1 else 256
DAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

cfg = EnvConfig(num_keywords=100, kind=KeywordKind.IMPLICIT,
                competitor_model=CompetitorModel.SINGLE_ABS_CENTS, max_volume=576)
rng = np.random.default_rng(0)
K = cfg.num_keywords
kw = make_keyword_state(
    K,
    vol_mean=rng.uniform(64, 256, K), vol_std=rng.uniform(1, 64, K),
    bctr=rng.uniform(0.1, 0.9, K), sctr=rng.uniform(0.1, 0.9, K),
    rev_mean=rng.uniform(0.3, 1.5, K), rev_std=rng.uniform(0.01, 0.3, K),
    bid_loc=rng.uniform(0.3, 1.0, K), bid_scale=rng.uniform(0.01, 0.3, K),
    max_bidders=1, participation_rate=1.0,
)
bids = jnp.asarray(np.round(rng.uniform(0.3, 1.5, K), 2), jnp.float32)
budget = jnp.full((E,), 1000.0)

# volumes shared by both paths
vol_key = jax.random.PRNGKey(123)
volumes = jax.vmap(lambda k: jnp.minimum(
    dist.nonneg_int_normal(k, kw.vol_mean, kw.vol_std), cfg.max_volume
))(jax.random.split(vol_key, E))

# pallas path
acc = None
if MODE != "xla":
    E_BLOCK = int(os.environ.get("PALLAS_EBLOCK", 64))
    pallas_fn = jax.jit(
        lambda seed: pallas_simulate_day(
            cfg, seed, kw, bids, budget, volumes, e_block=E_BLOCK
        )
    )
    t0 = time.perf_counter()
    day_p, conv = jax.tree.map(np.asarray, pallas_fn(jnp.asarray(1, jnp.int32)))
    print(f"pallas compile+run: {time.perf_counter()-t0:.1f}s "
          f"(gate converged: {bool(conv.all())})", flush=True)
    acc = [day_p]
    t0 = time.perf_counter()
    for d in range(DAYS):
        day_d, conv_d = jax.tree.map(
            np.asarray, pallas_fn(jnp.asarray(2 + d, jnp.int32))
        )
        assert conv_d.all(), "gate did not converge"
        acc.append(day_d)
    dt_p = (time.perf_counter() - t0) / DAYS
    print(
        f"pallas: {dt_p*1000:.1f} ms/day-step -> {E/dt_p:,.0f} env-steps/s",
        flush=True,
    )
    # sanity while we're here — budget accounting is exact integer cents
    # in-kernel; sum cents, not f32 dollars (a 100-term f32 dollar sum
    # wobbles ~1e-3 and false-flags the comparison)
    tot_cents = np.round(day_p.cost * 100.0).astype(np.int64).sum(axis=1)
    print(
        f"  sanity: mean imp {day_p.impressions.mean():.1f}, "
        f"mean cost {tot_cents.mean()/100:.2f} "
        f"(<= budget: {bool((tot_cents <= 100000).all())})",
        flush=True,
    )

if MODE == "pallas":
    sys.exit(0)
# xla path (same kw, same budget; own RNG)
def xla_day(key):
    return simulate_day(cfg, key, kw, bids, jnp.asarray(1000.0, jnp.float32))
xla_fn = jax.jit(jax.vmap(xla_day))
keys = jax.random.split(jax.random.PRNGKey(7), E)
t0 = time.perf_counter()
day_x = jax.tree.map(np.asarray, xla_fn(keys))
print(f"xla compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
xacc = [day_x]
t0 = time.perf_counter()
for d in range(DAYS):
    xacc.append(jax.tree.map(np.asarray, xla_fn(jax.random.split(jax.random.PRNGKey(100+d), E))))
dt_x = (time.perf_counter()-t0)/DAYS
print(f"xla:    {dt_x*1000:.1f} ms/day-step -> {E/dt_x:,.0f} env-steps/s", flush=True)

def summarize(days, name):
    fields = ("impressions", "buyside_clicks", "cost", "sellside_conversions", "revenue")
    out = {}
    for f in fields:
        v = np.concatenate([np.asarray(getattr(d, f)) for d in days], axis=0)  # (N*E, K)
        out[f] = v.mean(axis=0)
    return out

sp, sx = summarize(acc, "pallas"), summarize(xacc, "xla")
print("\nper-field mean |relative diff| over keywords (pallas vs xla):")
ok = True
for f in sp:
    denom = np.maximum(np.abs(sx[f]), 0.3)
    rel = np.abs(sp[f] - sx[f]) / denom
    flag = "OK " if rel.mean() < 0.05 and rel.max() < 0.25 else "BAD"
    if flag == "BAD": ok = False
    print(f"  {f:22s} mean {rel.mean():.4f} max {rel.max():.4f} {flag}", flush=True)
print("VALIDATION", "PASS" if ok else "FAIL")
