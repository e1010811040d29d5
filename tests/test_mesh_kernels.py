"""Pallas kernels under a multi-device mesh (gap #4 of docs/COVERAGE.md).

On a real pod the env batch is sharded over the 'data' mesh axis and each
device must run the fused physics kernel / rasterizer on its local shard.
The dispatch (env._make_solver, obs.pixel_observation_batched) wraps the
pallas_call in ``jax.shard_map`` whenever an ambient mesh is set. Here the
kernels run in the Pallas interpreter on the 8-virtual-CPU-device test mesh;
the shard_map plumbing is identical on TPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_car_racing_tpu import config as C, env as tenv, seeding
from multi_car_racing_tpu.parallel import mesh as pmesh

VI, PI = 20, 8
E = 16


def _batch(cfg, n_envs):
    states = [
        tenv.host_reset(cfg, seed=s, global_stream=seeding.GlobalStream(s))[0]
        for s in range(n_envs)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def _rollout(cfg, st, steps=5):
    step = jax.jit(jax.vmap(partial(tenv.step, cfg)))
    a = jnp.tile(jnp.asarray([[0.3, 0.8, 0.0]], jnp.float32), (E, cfg.num_agents, 1))
    rews = []
    for _ in range(steps):
        st, r, d = step(st, a)
        rews.append(r)
    return st, jnp.stack(rews)


def test_pallas_solver_sharded_matches_xla():
    cfg_x = C.EnvConfig(num_agents=2, velocity_iters=VI, position_iters=PI,
                        solver="xla")
    cfg_p = C.EnvConfig(num_agents=2, velocity_iters=VI, position_iters=PI,
                        solver="pallas")
    st0 = _batch(cfg_x, E)

    st_ref, r_ref = _rollout(cfg_x, st0)

    mesh = pmesh.make_mesh(8)
    with jax.set_mesh(mesh):
        st_sh = pmesh.shard_batched(st0, mesh)
        st_pal, r_pal = _rollout(cfg_p, st_sh)
        # outputs stay sharded over 'data'
        assert "data" in str(st_pal.reward.sharding.spec)

    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(st_pal.cars.hull_c), np.asarray(st_ref.cars.hull_c),
        rtol=0, atol=1e-4,
    )


def test_rasterizer_sharded_matches_unsharded():
    from multi_car_racing_tpu.render import pallas_raster

    cfg = C.EnvConfig(num_agents=2, velocity_iters=VI, position_iters=PI)
    st = _batch(cfg, E)

    render = partial(pallas_raster.render_pixels, cfg, interpret=True)
    ref = jax.jit(render)(st)

    mesh = pmesh.make_mesh(8)
    with jax.set_mesh(mesh):
        st_sh = pmesh.shard_batched(st, mesh)

        def sharded_render(state):
            am = pmesh.ambient_mesh()
            assert am is not None
            return pmesh.shard_leading(render, am)(state)

        out = jax.jit(sharded_render)(st_sh)
        assert "data" in str(out.sharding.spec)

    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ambient_mesh_detection():
    assert pmesh.ambient_mesh() is None
    mesh = pmesh.make_mesh(8)
    with jax.set_mesh(mesh):
        am = pmesh.ambient_mesh()
        assert am is not None and am.axis_names == ("data",)
