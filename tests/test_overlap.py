"""Contact-pass geometry: rect-SAT (tiles-last hot path) vs generic SAT."""

import numpy as np
import jax
import jax.numpy as jnp

from multi_car_racing_tpu import config as C, env as tenv, seeding
from multi_car_racing_tpu.physics import overlap, state as pstate, tire, world


def test_wheel_tile_overlap_matches_generic_sat():
    """The production rect-optimized, tiles-last SAT must agree with the
    reference-style polygon SAT over a long random rollout."""
    cfg = C.EnvConfig(num_agents=2)
    state, _ = tenv.host_reset(cfg, seed=3, global_stream=seeding.GlobalStream(3))

    @jax.jit
    def step(s, a):
        s, r, d = tenv.step(cfg, s, a)
        return s

    @jax.jit
    def both_masks(s):
        fast = overlap.wheel_tile_overlap(s.cars, s.track)          # (N,4,MT)
        fv, fn = overlap.car_fixture_world_geometry(s.cars)
        slow = overlap.fixtures_vs_quads(fv, fn, s.track.quad)[:, 4:8]
        return fast, slow

    rng = np.random.RandomState(0)
    mismatches = 0
    total = 0
    for t in range(60):
        a = jnp.asarray(
            rng.uniform([-1, 0, 0], [1, 1, 0.3], size=(2, 3)), jnp.float32
        )
        state = step(state, a)
        fast, slow = jax.device_get(both_masks(state))
        total += fast.size
        mismatches += int((fast != slow).sum())
    # Allow only boundary-epsilon flips (floating-point order differences on
    # gaps within ~1e-6 of the margin), which are vanishingly rare.
    assert mismatches <= total * 1e-6, (mismatches, total)


def test_point_in_quads_T_matches_generic():
    cfg = C.EnvConfig(num_agents=4)
    state, _ = tenv.host_reset(cfg, seed=5, global_stream=seeding.GlobalStream(5))
    pts = np.asarray(state.cars.hull_origin) + np.random.RandomState(1).uniform(
        -8, 8, size=(4, 2)
    )
    pts = jnp.asarray(pts, jnp.float32)
    a = np.asarray(overlap.point_in_quads_T(pts, state.track.quad_T))
    b = np.asarray(overlap.point_in_quads(pts, state.track.quad))
    np.testing.assert_array_equal(a, b)
