"""Checkpoint / resume (SURVEY.md §5: no reference counterpart — the
reference's EzPickle only re-runs constructor args and cannot capture
mid-episode state).

Every piece of runtime state here is a pytree (EnvState, learner TrainState),
so checkpointing is orbax on the whole tree: save mid-episode env batches,
learner params/optimizer state, and RNG keys, and resume bit-exactly.

Multi-process (multi-host) runs: arrays sharded over a global mesh are not
host-addressable, so ``save`` all-gathers the global values and writes from
process 0 only (with a barrier so no worker races ahead and dies mid-write);
``restore`` rebuilds host-local arrays on every process — re-sharding onto
the global mesh is the caller's job (parallel.mesh.shard_train_state), and
``jax.device_put`` scatters each process's addressable shards.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _to_host(tree: Any) -> Any:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # Per-leaf: only globally-sharded/replicated arrays (not fully
        # addressable) need the collective fetch. process_allgather on a
        # fully-addressable (host-local) leaf would CONCATENATE each
        # process's copy along axis 0 — wrong for replicated host values.
        # Every process sees the same tree structure, so the per-leaf
        # branch keeps the collective order consistent.
        def leaf(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return multihost_utils.process_allgather(x, tiled=True)
            return jax.device_get(x)

        return jax.tree_util.tree_map(leaf, tree)
    return jax.device_get(tree)


def _slots(path: str):
    return path + ".slot0", path + ".slot1", path + ".latest"


def save(path: str, tree: Any) -> None:
    """Save any pytree (EnvState, TrainState, ...) under ``path``.

    Crash-safe two-slot scheme: alternating slot directories plus an
    atomically-replaced pointer file. A crash (SIGKILL, host failure) during
    a save can only corrupt the slot being written — the pointer still names
    the previous complete checkpoint, so recovery never finds an empty or
    half-written state (exercised by tests/test_fault_injection.py and
    tests/test_multiprocess.py)."""
    path = os.path.abspath(path)
    host_tree = _to_host(tree)
    s0, s1, ptr = _slots(path)
    # Every process must make the same calls in the same order: orbax runs
    # its own cross-process barriers inside save(), so it is called by ALL
    # processes (the slot choice is consistent — the pointer only moves
    # behind the barrier below). Only the pointer replace is process-0.
    cur = None
    if os.path.exists(ptr):
        with open(ptr) as f:
            cur = f.read().strip()
    # The pointer stores the slot BASENAME so a checkpoint tree can be
    # copied/moved across paths and hosts and still resolve.
    nxt = s1 if cur == os.path.basename(s0) else s0
    _checkpointer().save(nxt, host_tree, force=True)
    if jax.process_index() == 0:
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(os.path.basename(nxt))
        os.replace(tmp, ptr)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mcr_checkpoint_save")


def restore(path: str, template: Any) -> Any:
    """Restore a pytree saved with :func:`save`.

    ``template`` supplies structure/dtypes (e.g. a freshly-initialized
    TrainState) and may hold non-addressable global arrays — only shapes and
    dtypes are read from it. Arrays are restored host-local; re-shard with
    parallel.mesh helpers afterwards for multi-chip / multi-process runs.
    """
    path = os.path.abspath(path)
    ptr = _slots(path)[2]
    if os.path.exists(ptr):
        with open(ptr) as f:
            slot = f.read().strip()
        # Basename pointers resolve relative to the checkpoint directory;
        # absolute ones (older saves) pass through.
        path = slot if os.path.isabs(slot) else os.path.join(
            os.path.dirname(path), slot
        )
    item = jax.tree_util.tree_map(
        lambda t: np.zeros(t.shape, t.dtype) if hasattr(t, "dtype") else t,
        template,
    )
    ck = _checkpointer()
    try:
        restored = ck.restore(path, item=item)
    except ValueError:
        # Dataclass fields added AFTER this checkpoint was written (e.g.
        # TrainState.frames, round 5) are absent on disk. That is only a
        # compatible difference when the template holds None for them:
        # restore the on-disk subset through a dict item and graft it back.
        import dataclasses

        if not dataclasses.is_dataclass(item):
            raise
        disk_keys = set(ck.metadata(path).item_metadata.keys())
        flds = [f for f in dataclasses.fields(item)
                if not f.metadata.get("static", False)]
        missing = [f.name for f in flds if f.name not in disk_keys]
        if not missing or any(
            getattr(template, n) is not None for n in missing
        ):
            raise
        sub = {f.name: getattr(item, f.name) for f in flds
               if f.name in disk_keys}
        restored = dataclasses.replace(item, **ck.restore(path, item=sub))
    return jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r, t.dtype)
                                  if hasattr(t, "dtype") else r,
                                  template, restored)
