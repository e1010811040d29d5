"""Friction-circle tire / engine / brake model — ``Car.step`` (cd:172-266).

Pure function over ``CarState``: consumes current wheel velocities and the
on-road mask (from the previous sensor pass — Box2D updates contacts at the
*start* of ``world.Step``, so the friction limit a tire sees lags geometry by
one step; the env preserves that ordering), produces per-wheel world forces
for the integrator plus updated rolling state and the joint servo speeds.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config as C
from . import shapes
from .state import CarState, wheel_forward_side


def tire_step(
    state: CarState,
    wheel_on_road: jnp.ndarray,   # (N, 4) bool — any touched tile (cd:180-186)
    dt: float = C.DT,
):
    """Returns (state', wheel_force (N,4,2), motor_speed (N,4), skid (N,4) bool).

    ``skid`` flags |force| > 2*friction_limit before the circle clamp
    (cd:233) — used by the renderer for skid particles, not by physics.
    """
    # 1. Steering servo command (cd:174-177): motorSpeed =
    #    sign(err) * min(50|err|, 3); solved by the revolute joint motor.
    err = state.steer - state.joint_angle
    motor_speed = jnp.sign(err) * jnp.minimum(
        C.STEER_SERVO_GAIN * jnp.abs(err), C.STEER_SERVO_MAX_SPEED
    )

    # 2. Friction limit (cd:180-186): binary grass/road via the sensor tiles.
    friction_limit = jnp.where(
        wheel_on_road, C.FRICTION_LIMIT, C.FRICTION_LIMIT * C.GRASS_FRICTION_FACTOR
    )

    # 3. Wheel-frame velocities (cd:189-193).
    forw, side = wheel_forward_side(state)
    vf = jnp.sum(forw * state.wheel_v, axis=-1)
    vs = jnp.sum(side * state.wheel_v, axis=-1)

    # 4. Engine spin-up (cd:199-207): domega = dt*P*gas / (I*(|omega|+5)).
    spin = state.spin + (
        dt * C.ENGINE_POWER * state.gas
        / (C.WHEEL_MOMENT_OF_INERTIA * (jnp.abs(state.spin) + 5.0))
    )
    fuel_spent = state.fuel_spent + jnp.sum(dt * C.ENGINE_POWER * state.gas, axis=-1)

    # 5. Brake (cd:209-217): >= 0.9 locks the wheel; else bleed omega toward 0.
    bleed = jnp.sign(spin) * jnp.minimum(C.BRAKE_FORCE * state.brake, jnp.abs(spin))
    spin = jnp.where(
        state.brake >= 0.9,
        0.0,
        jnp.where(state.brake > 0.0, spin - bleed, spin),
    )
    phase = state.phase + spin * dt

    # 6. Slip forces (cd:220-229) + friction circle (cd:251-256).
    vr = spin * shapes.WHEEL_RAD
    f_force = (-vf + vr) * C.TIRE_STIFFNESS
    p_force = -vs * C.TIRE_STIFFNESS
    force = jnp.sqrt(jnp.square(f_force) + jnp.square(p_force))
    skid = jnp.abs(force) > 2.0 * friction_limit

    over = jnp.abs(force) > friction_limit
    scale = jnp.where(over, friction_limit / jnp.maximum(force, 1e-30), 1.0)
    f_force = f_force * scale
    p_force = p_force * scale

    # 7. Spin feedback (cd:258) + world-frame force at the wheel COM (cd:260-266).
    spin = spin - dt * f_force * shapes.WHEEL_RAD / C.WHEEL_MOMENT_OF_INERTIA
    wheel_force = p_force[..., None] * side + f_force[..., None] * forw

    new_state = state.replace(spin=spin, phase=phase, fuel_spent=fuel_spent)
    return new_state, wheel_force, motor_speed, skid
