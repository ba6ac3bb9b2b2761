"""Device-mesh parallelism: env sharding, collectives, multi-host entry."""

from adcraft_tpu.parallel.mesh import (
    make_env_mesh,
    shard_env_batch,
    sharded_vector_env,
    psum_metrics,
    initialize_multihost,
)

__all__ = [
    "make_env_mesh",
    "shard_env_batch",
    "sharded_vector_env",
    "psum_metrics",
    "initialize_multihost",
]
