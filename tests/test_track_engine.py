"""Fused track-pass kernel (physics/track_engine.py) vs the XLA stage ops.

Interpret mode on CPU: the kernel mirrors overlap.wheel_tile_overlap /
env's visit-reward + post-step analysis term-for-term, so masks must be
EXACTLY equal and the float outputs equal to reduction-order noise."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from multi_car_racing_tpu import config as C, env as tenv, seeding, obs as tobs
from multi_car_racing_tpu.physics import track_engine
from multi_car_racing_tpu.physics.state import wheel_forward_side


def _driven_states(num_agents, steps, seeds=(11, 3, 7, 5)):
    cfg = C.EnvConfig(num_agents=num_agents)
    step = jax.jit(partial(tenv.step, cfg))
    states = []
    for seed in seeds:
        s, _ = tenv.host_reset(
            cfg, seed=seed, global_stream=seeding.GlobalStream(seed)
        )
        for t in range(steps):
            f = np.asarray(tobs.state_observation(s))
            steer = np.clip(-2.0 * f[:, 16], -1, 1)
            a = np.stack(
                [steer, 0.4 * np.ones(num_agents), np.zeros(num_agents)], -1
            )
            s, _, _ = step(s, jnp.asarray(a, jnp.float32))
        states.append(s)
    return cfg, jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def _xla_outputs(cfg, batched):
    tp = tenv._make_track_pass(cfg.num_agents, "xla", False)
    return jax.vmap(
        lambda tr, cars, po, vis, tt: tp(tr, cars, po, vis, tt)
    )(
        batched.track, batched.cars, batched.cars.hull_origin,
        batched.visited, batched.tile_touched,
    )


def _kernel_outputs(cfg, batched):
    cars = batched.cars
    forw, side = wheel_forward_side(cars)
    tr = batched.track
    return track_engine.track_pass_batched(
        tr.quad_T, tr.quad_ax_T, tr.quad_lo, tr.quad_hi, tr.curb_quad_T,
        tr.xy, tr.beta, tr.valid, tr.n_tiles,
        cars.wheel_c, forw, side, cars.hull_origin, cars.hull_origin,
        batched.visited, batched.tile_touched,
        num_agents=cfg.num_agents, interpret=True,
    )


def _compare(cfg, batched):
    ref = _xla_outputs(cfg, batched)
    out = _kernel_outputs(cfg, batched)
    names = [
        "wheel_on_road", "visited", "bonus", "count", "touched",
        "nearest_beta", "on_grass",
    ]
    for name, r, o in zip(names, ref, out):
        r, o = np.asarray(r), np.asarray(o)
        if r.dtype == bool or name == "count":
            np.testing.assert_array_equal(o, r, err_msg=name)
        else:
            np.testing.assert_allclose(o, r, atol=2e-5, err_msg=name)


def test_kernel_matches_xla_two_agents():
    cfg, batched = _driven_states(2, 40)
    _compare(cfg, batched)


def test_kernel_matches_xla_one_agent():
    cfg, batched = _driven_states(1, 60, seeds=(2, 9))
    _compare(cfg, batched)


def test_kernel_matches_xla_four_agents_with_visits():
    cfg, batched = _driven_states(4, 25, seeds=(11, 4))
    _compare(cfg, batched)


def test_kernel_spawn_tick_bonuses():
    """At spawn, several cars first-visit the same tiles in one step — the
    car-id tie-break rank path must agree exactly."""
    cfg = C.EnvConfig(num_agents=4)
    states = []
    for seed in (11, 5):
        s, _ = tenv.host_reset(
            cfg, seed=seed, global_stream=seeding.GlobalStream(seed)
        )
        # Clear visit state so the pass re-pays spawn bonuses.
        s = s.replace(
            visited=jnp.zeros_like(s.visited),
            tile_touched=jnp.zeros_like(s.tile_touched),
        )
        states.append(s)
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    _compare(cfg, batched)


def _kernel_outputs_v2(cfg, batched):
    cars = batched.cars
    forw, side = wheel_forward_side(cars)
    tr = batched.track
    return track_engine.track_pass_batched_v2(
        tr.quad_T, tr.quad_ax_T, tr.quad_lo, tr.quad_hi, tr.curb_quad_T,
        tr.xy, tr.beta, tr.valid, tr.n_tiles,
        cars.wheel_c, forw, side, cars.hull_origin, cars.hull_origin,
        batched.visited, batched.tile_touched,
        num_agents=cfg.num_agents, interpret=True,
    )


def _compare_v2(cfg, batched):
    ref = _xla_outputs(cfg, batched)
    out = _kernel_outputs_v2(cfg, batched)
    names = [
        "wheel_on_road", "visited", "bonus", "count", "touched",
        "nearest_beta", "on_grass",
    ]
    for name, r, o in zip(names, ref, out):
        r, o = np.asarray(r), np.asarray(o)
        if r.dtype == bool or name == "count":
            np.testing.assert_array_equal(o, r, err_msg=name)
        else:
            np.testing.assert_allclose(o, r, atol=2e-5, err_msg=name)


def test_kernel_v2_matches_xla_two_agents():
    cfg, batched = _driven_states(2, 40)
    _compare_v2(cfg, batched)


def test_kernel_v2_matches_xla_one_agent():
    cfg, batched = _driven_states(1, 60, seeds=(2, 9))
    _compare_v2(cfg, batched)


def test_kernel_v2_matches_xla_four_agents_with_visits():
    cfg, batched = _driven_states(4, 25, seeds=(11, 4))
    _compare_v2(cfg, batched)


def test_kernel_v2_spawn_tick_bonuses():
    cfg = C.EnvConfig(num_agents=4)
    states = []
    for seed in (11, 5):
        s, _ = tenv.host_reset(
            cfg, seed=seed, global_stream=seeding.GlobalStream(seed)
        )
        s = s.replace(
            visited=jnp.zeros_like(s.visited),
            tile_touched=jnp.zeros_like(s.tile_touched),
        )
        states.append(s)
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    _compare_v2(cfg, batched)
