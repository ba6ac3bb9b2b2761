"""Checkpoint / restore via orbax.

The reference delegates checkpointing to RLlib (``agent.save`` /
``Algorithm.from_checkpoint``, RL/train_agent.ipynb cells 12, 14) and
never checkpoints env state. Here both env state and learner state are
pytrees, so one orbax call captures an exactly-resumable snapshot of a
whole training run (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _is_typed_key(x: Any) -> bool:
    return isinstance(x, jax.Array) and jax.numpy.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _to_savable(x: Any):
    """Typed PRNG keys are opaque to orbax — save their raw counter words."""
    if _is_typed_key(x):
        return np.asarray(jax.random.key_data(x))
    return np.asarray(x)


def save_checkpoint(path: str, tree: Any) -> None:
    """Save any pytree (EnvState, TrainState, params, ...) to ``path``.

    Typed PRNG key leaves (``jax.random.key``-style dtypes) are unwrapped
    to their raw uint32 data automatically; :func:`restore_checkpoint`
    re-wraps them using the template's key impl.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(_to_savable, tree), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``target`` is a template pytree with the desired structure/dtypes
    (e.g. a freshly built TrainState); typed PRNG key leaves in the
    template come back as typed keys with the same impl.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, jax.tree.map(_to_savable, target))

    def back(t, r):
        if _is_typed_key(t):
            return jax.random.wrap_key_data(
                jax.numpy.asarray(r), impl=jax.random.key_impl(t)
            )
        return jax.numpy.asarray(r, getattr(t, "dtype", None))

    return jax.tree.map(back, target, restored)
