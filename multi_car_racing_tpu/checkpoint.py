"""Checkpoint / resume (SURVEY.md §5: no reference counterpart — the
reference's EzPickle only re-runs constructor args and cannot capture
mid-episode state).

Every piece of runtime state here is a pytree (EnvState, learner TrainState),
so checkpointing is orbax on the whole tree: save mid-episode env batches,
learner params/optimizer state, and RNG keys, and resume bit-exactly.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, tree: Any) -> None:
    """Save any pytree (EnvState, TrainState, ...) to ``path``."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(tree), force=True)


def restore(path: str, template: Any) -> Any:
    """Restore a pytree saved with :func:`save`.

    ``template`` supplies structure/dtypes (e.g. a freshly-initialized
    TrainState); arrays are restored onto the default device — re-shard with
    parallel.mesh helpers afterwards for multi-chip runs.
    """
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path, item=jax.device_get(template))
    return jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r, t.dtype)
                                  if hasattr(t, "dtype") else r,
                                  template, restored)
