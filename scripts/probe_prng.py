"""Minimal Pallas kernel probing pltpu.prng_random_bits on real hardware.

Dumps bit statistics for a few (seed, fold) pairs: if the hardware PRNG
is healthy, means ~2^31, ~50% odd bits, and different seeds give
different streams. All-zero or constant outputs mean the PRNG is not
usable through this backend.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(seed_ref, out_ref):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], i)
    out_ref[:, :] = pltpu.prng_random_bits(out_ref.shape)


def draw(seed):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4,),
        in_specs=[],
        out_specs=pl.BlockSpec((8, 128), lambda i, _s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.uint32),
    )(jnp.asarray([seed], jnp.int32))


for seed in (1, 2):
    bits = np.asarray(jax.jit(draw)(seed))
    print(
        f"seed={seed}: mean={bits.mean():.3e} (want ~2.1e9) "
        f"odd-frac={(bits & 1).mean():.3f} zeros={(bits == 0).mean():.4f} "
        f"unique={len(np.unique(bits))}/{bits.size}",
        flush=True,
    )
    blocks = bits.reshape(4, 8, 128)
    same01 = np.array_equal(blocks[0], blocks[1])
    print(f"  block0==block1 (different fold): {same01}", flush=True)


# --- second probe: does the stream advance between calls in ONE kernel? ---
def kernel2(seed_ref, a_ref, b_ref):
    pltpu.prng_seed(seed_ref[0], 0)
    a_ref[:, :] = pltpu.prng_random_bits(a_ref.shape)
    b_ref[:, :] = pltpu.prng_random_bits(b_ref.shape)


def draw2(seed):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, _s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, _s: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel2,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.uint32)] * 2,
    )(jnp.asarray([seed], jnp.int32))


a, b = (np.asarray(x) for x in jax.jit(draw2)(5))
print(f"two calls identical: {np.array_equal(a, b)} "
      f"(a mean {a.mean():.3e}, b mean {b.mean():.3e})", flush=True)


# --- third probe: raw prng_random_bits throughput ---
import time

REPS = 16
def kernel3(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for _ in range(REPS):
        acc = acc ^ pltpu.prng_random_bits((47, out_ref.shape[0], out_ref.shape[1]))[0]
    out_ref[:, :] = acc


def draw3(seed):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(24,),
        in_specs=[],
        out_specs=pl.BlockSpec((64, 100), lambda i, _s: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel3,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((64, 100), jnp.int32),
    )(jnp.asarray([seed], jnp.int32))


f3 = jax.jit(draw3)
r = np.asarray(f3(1))  # compile+warm
t0 = time.perf_counter()
for s in range(2, 7):
    r = np.asarray(f3(s))
dt = (time.perf_counter() - t0) / 5
words = REPS * 47 * 64 * 100 * 24
print(f"prng rate: {dt*1e3:.2f} ms for {words/1e6:.1f}M words "
      f"-> {words/dt/1e9:.2f} G words/s", flush=True)
