"""Checkpoint / restore via orbax.

The reference delegates checkpointing to RLlib (``agent.save`` /
``Algorithm.from_checkpoint``, RL/train_agent.ipynb cells 12, 14) and
never checkpoints env state. Here both env state and learner state are
pytrees, so one orbax call captures an exactly-resumable snapshot of a
whole training run (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(path: str, tree: Any) -> None:
    """Save any pytree (EnvState, TrainState, params, ...) to ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, tree), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``target`` is a template pytree with the desired structure/dtypes
    (e.g. a freshly built TrainState).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, jax.tree.map(np.asarray, target))
    return jax.tree.map(
        lambda t, r: jax.numpy.asarray(r, getattr(t, "dtype", None)),
        target,
        restored,
    )
