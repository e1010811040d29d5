"""Device-mesh sharding for batched envs and the PPO learner.

The scaling model (SURVEY.md §2.15): env data parallelism only. The env batch
(and every per-env leaf of ``EnvState``/rollout data) is sharded over a 1-D
'data' mesh axis; learner params are replicated. With those in_shardings, jit
(GSPMD) partitions the whole train step and inserts the gradient all-reduce
over ICI in backward — no hand-written collectives needed. Multi-host: the
same code under ``jax.distributed.initialize`` with each host feeding its
local shard of envs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ambient_mesh():
    """The ambient (abstract) mesh if tracing under ``jax.set_mesh`` with a
    real multi-device mesh, else None.

    Pallas calls are single-device programs; under a multi-device mesh they
    must be wrapped in ``shard_map`` so each device runs the kernel on its
    local shard. Reading the ambient mesh at trace time lets the env/obs
    dispatch do that automatically (see env._make_solver,
    obs.pixel_observation_batched)."""
    am = jax.sharding.get_abstract_mesh()
    if not am.axis_names or am.size <= 1:
        return None
    return am


def shard_leading(fn, am):
    """shard_map ``fn`` with every arg/output sharded on its leading axis
    over ALL mesh axes (the env-batch layout). check_vma=False because
    pallas_call out_shapes carry no varying-mesh-axes info."""
    spec = P(am.axis_names)
    return jax.shard_map(fn, mesh=am, in_specs=spec, out_specs=spec, check_vma=False)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env-batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batched(tree, mesh: Mesh):
    """Place every leaf of a batched pytree with its leading axis sharded."""
    sh = data_sharding(mesh)
    return jax.device_put(tree, jax.tree_util.tree_map(lambda _: sh, tree))


def shard_train_state(ts, mesh: Mesh):
    """Sharding layout for learner.TrainState: env_state + pool-draw randomness
    sharded over 'data'; params/opt replicated; pool replicated (read-only)."""
    sh_data = data_sharding(mesh)
    sh_rep = replicated(mesh)

    def place(leaf_path_tree, sharding):
        return jax.device_put(leaf_path_tree, jax.tree_util.tree_map(lambda _: sharding, leaf_path_tree))

    return ts.replace(
        params=place(ts.params, sh_rep),
        opt_state=place(ts.opt_state, sh_rep),
        env_state=place(ts.env_state, sh_data),
        pool=place(ts.pool, sh_rep),
        key=jax.device_put(ts.key, sh_rep),
        update_i=jax.device_put(ts.update_i, sh_rep),
        obs_rms=place(ts.obs_rms, sh_rep) if ts.obs_rms is not None else None,
        frames=(jax.device_put(ts.frames, sh_data)
                if ts.frames is not None else None),
    )
