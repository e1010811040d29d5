"""Single-car physics vs the reference (Box2D 2.3.5) — tolerance-band parity.

The solver path (tire model -> revolute joints -> integration) is analytically
determined for a single car with no car-car contacts, so agreement should be
tight: float32 accumulation-order noise only (SURVEY.md §7 hard part 1).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_car_racing_tpu import seeding, config as C
from multi_car_racing_tpu.track import host, common
from multi_car_racing_tpu.physics import state as pstate, tire, world, overlap, shapes


def test_mass_properties_match_box2d():
    import Box2D
    from Box2D.b2 import fixtureDef, polygonShape

    w = Box2D.b2World((0, 0))
    hull = w.CreateDynamicBody(
        position=(0, 0),
        fixtures=[
            fixtureDef(
                shape=polygonShape(
                    vertices=[(x * C.SIZE, y * C.SIZE) for x, y in p]
                ),
                density=1.0,
            )
            for p in (C.HULL_POLY1, C.HULL_POLY2, C.HULL_POLY3, C.HULL_POLY4)
        ],
    )
    assert abs(shapes.HULL_MASS - hull.mass) < 1e-5
    # b2Body.inertia is about the body origin; ours is about the COM.
    i_origin = shapes.HULL_I + shapes.HULL_MASS * (
        shapes.HULL_LOCAL_CENTER @ shapes.HULL_LOCAL_CENTER
    )
    assert abs(i_origin - hull.inertia) < 1e-4
    np.testing.assert_allclose(
        shapes.HULL_LOCAL_CENTER, [hull.localCenter[0], hull.localCenter[1]], atol=1e-6
    )


@pytest.fixture(scope="module")
def rollouts():
    """80-step mixed maneuver: full gas, then steer, then brake."""
    from multi_car_racing_tpu.oracle import shims

    SEED = 7
    Env, _ = shims.load_reference_env_class()
    env = Env(num_agents=1, verbose=0)
    env.seed(SEED)
    np.random.seed(3)
    env.reset()
    car = env.cars[0]

    actions = (
        [[0.0, 1.0, 0.0]] * 30 + [[0.3, 0.5, 0.0]] * 25 + [[-0.2, 0.0, 0.5]] * 25
    )
    ref = []
    for a in actions:
        env.step(np.array([a]))
        ref.append(
            dict(
                pos=np.array(car.hull.position),
                ang=car.hull.angle,
                vel=np.array(car.hull.linearVelocity),
                spin=np.array([w.omega for w in car.wheels]),
                jang=np.array([w.joint.angle for w in car.wheels]),
            )
        )

    gs = seeding.GlobalStream(3)
    direction = gs.direction()
    order = gs.car_order(1)
    rng, _ = seeding.np_random(SEED)
    pts, border, _ = host.generate_track(rng)
    track = common.pack_track(pts, border, max_tiles=384)
    pos0, ang0 = common.spawn_poses(
        pts[:, 2:4], pts[:, 1], len(pts), order, direction == "CW"
    )

    @jax.jit
    def step_fn(cs, mask, action):
        cs = pstate.apply_controls(cs, action)
        cs, force, motor, _ = tire.tire_step(cs, mask)
        fv, fn = overlap.car_fixture_world_geometry(cs)
        new_mask = overlap.fixtures_vs_quads(fv, fn, track.quad)[:, 4:8].any(-1)
        cs = world.world_step(cs, force, motor)
        return cs, new_mask

    @jax.jit
    def step0(cs):
        cs2, force, motor, _ = tire.tire_step(cs, jnp.zeros((1, 4), bool))
        fv, fn = overlap.car_fixture_world_geometry(cs2)
        new_mask = overlap.fixtures_vs_quads(fv, fn, track.quad)[:, 4:8].any(-1)
        return world.world_step(cs2, force, motor), new_mask

    cs = pstate.create_cars(jnp.asarray(pos0), jnp.asarray(ang0))
    cs, mask = step0(cs)  # reset's step(None)
    ours = []
    for a in actions:
        cs, mask = step_fn(cs, mask, jnp.asarray([a]))
        ours.append(cs)
    return ref, ours


def test_hull_trajectory_parity(rollouts):
    ref, ours = rollouts
    for r, o in zip(ref, ours):
        assert np.abs(np.asarray(o.hull_origin)[0] - r["pos"]).max() < 2e-3
        assert abs(float(o.hull_a[0]) - r["ang"]) < 2e-4
        assert np.abs(np.asarray(o.hull_v)[0] - r["vel"]).max() < 5e-3


def test_wheel_state_parity(rollouts):
    ref, ours = rollouts
    for r, o in zip(ref, ours):
        assert np.abs(np.asarray(o.spin)[0] - r["spin"]).max() < 5e-3
        assert np.abs(np.asarray(o.joint_angle)[0] - r["jang"]).max() < 1e-4


def test_gas_rate_limit():
    cs = pstate.create_cars(jnp.zeros((1, 2)), jnp.zeros((1,)))
    cs = pstate.apply_controls(cs, jnp.asarray([[0.0, 1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(cs.gas)[0], [0, 0, 0.1, 0.1], atol=1e-6)
    cs = pstate.apply_controls(cs, jnp.asarray([[0.0, 0.05, 0.0]]))
    # decrease is instant
    np.testing.assert_allclose(np.asarray(cs.gas)[0], [0, 0, 0.05, 0.05], atol=1e-6)


def test_steer_sign_convention(rollouts):
    """action steer=+1 must turn the car clockwise (hull angle decreases) —
    measured reference behavior (SURVEY.md §2.9)."""
    ref, ours = rollouts
    # actions 30..55 steer +0.3: angle at 55 must be below angle at 30.
    assert float(ours[54].hull_a[0]) < float(ours[29].hull_a[0])
    assert ref[54]["ang"] < ref[29]["ang"]


def test_batched_lockstep_bitexact():
    cs = pstate.create_cars(jnp.zeros((16, 2)), jnp.zeros((16,)))
    mask = jnp.ones((16, 4), bool)

    @jax.jit
    def bstep(cs):
        cs = pstate.apply_controls(
            cs, jnp.tile(jnp.asarray([[0.2, 0.8, 0.0]]), (16, 1))
        )
        cs, f, m, _ = tire.tire_step(cs, mask)
        return world.world_step(cs, f, m)

    for _ in range(20):
        cs = bstep(cs)
    hull = np.asarray(cs.hull_c)
    assert np.all(hull == hull[0])
