"""World step: velocity integration + constraint solve + position integration.

Pure-functional equivalent of ``world.Step(1/50, 180, 60)`` (mcr:428) for the
fixed topology this game exercises: per car one hull + four wheels joined by
revolute joints (solved in joints.py), car-car polygon contacts (collide.py),
and *no* collision response with track tiles (they are sensors). Gravity is
zero (mcr:138); body damping is zero (Box2D defaults).

Box2D's b2Island order is preserved:
  1. v += dt * invM * F (tire forces on wheels only; hulls receive none)
  2. contact init/warm-start, joint init/warm-start
  3. velocity iterations: joints (Gauss-Seidel per car), then contacts
  4. position integration with maxTranslation/maxRotation clamps
  5. position iterations: contacts, then joints
(Box2D's early exit when position errors drop below slop is replaced by a
fixed iteration count — past convergence the extra iterations only polish
sub-slop error; see tests/test_physics_parity.py tolerance bands.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as C
from . import joints, shapes
from .state import CarState
from .joints import Velocities, Positions


def world_step(
    state: CarState,
    wheel_force: jnp.ndarray,     # (N, 4, 2) from the tire model
    motor_speed: jnp.ndarray,     # (N, 4) steering servo speeds
    dt: float = C.DT,
    velocity_iters: int = C.VELOCITY_ITERS,
    position_iters: int = C.POSITION_ITERS,
    contacts=None,                # optional collide.ContactBundle (car-car)
    contact_velocity_iters: int = C.CONTACT_VELOCITY_ITERS,
    contact_position_iters: int = C.CONTACT_POSITION_ITERS,
):
    """Returns the new CarState, and the updated ContactBundle when car-car
    contacts are enabled (for impulse warm-start carry)."""
    from . import collide  # local import to avoid cycle

    # --- 1. integrate velocities (forces only on wheels).
    vel = Velocities(
        hull_v=state.hull_v,
        hull_w=state.hull_w,
        wheel_v=state.wheel_v + dt * shapes.WHEEL_INV_MASS * wheel_force,
        wheel_w=state.wheel_w,
    )

    # --- 2. init + warm start (contacts first, then joints — b2Island order).
    n_cars = state.hull_c.shape[0]
    if contacts is not None:
        vel = collide.warm_start(vel, contacts, n_cars)
    state, jdata = joints.init_constraints(state, motor_speed)
    j_imp = state.joint_impulse
    m_imp = state.motor_impulse
    vel = joints.warm_start(vel, jdata, j_imp, m_imp)

    # --- 3. velocity iterations. Contacts converge in a few dozen passes;
    # Box2D interleaves them through all 180 anyway, but past convergence the
    # extra contact passes are numeric no-ops, so we split: the first
    # ``contact_velocity_iters`` interleave joints+contacts, the remainder
    # polish joints only (saves ~5/6 of the contact-solver work per step).
    #
    # The loop carries ONLY the mutating arrays (velocities + impulse
    # accumulators, ~35 floats/car); the full CarState / ContactBundle stay
    # loop-invariant closures. Inside a scanned rollout XLA materializes the
    # whole carry to HBM every iteration, so a fat carry costs 30x+ the HBM
    # traffic (measured 13 ms -> sub-ms per step at 4096x2 envs).
    n_imp = contacts.normal_imp if contacts is not None else None
    t_imp = contacts.tangent_imp if contacts is not None else None

    def vel_iter_contacts(_, carry):
        vel, j_imp, m_imp, n_imp, t_imp = carry
        vel, j_imp, m_imp = joints.solve_velocity(vel, jdata, j_imp, m_imp, dt)
        vel, n_imp, t_imp = collide.velocity_pass(vel, n_imp, t_imp, contacts, n_cars)
        return (vel, j_imp, m_imp, n_imp, t_imp)

    def vel_iter_joints(_, carry):
        vel, j_imp, m_imp = carry
        vel, j_imp, m_imp = joints.solve_velocity(vel, jdata, j_imp, m_imp, dt)
        return (vel, j_imp, m_imp)

    if contacts is not None:
        k = min(contact_velocity_iters, velocity_iters)
        vel, j_imp, m_imp, n_imp, t_imp = jax.lax.fori_loop(
            0, k, vel_iter_contacts, (vel, j_imp, m_imp, n_imp, t_imp)
        )
        vel, j_imp, m_imp = jax.lax.fori_loop(
            0, velocity_iters - k, vel_iter_joints, (vel, j_imp, m_imp)
        )
        contacts = contacts._replace(normal_imp=n_imp, tangent_imp=t_imp)
    else:
        vel, j_imp, m_imp = jax.lax.fori_loop(
            0, velocity_iters, vel_iter_joints, (vel, j_imp, m_imp)
        )
    state = state.replace(joint_impulse=j_imp, motor_impulse=m_imp)

    # --- 4. integrate positions with Box2D's translation/rotation clamps.
    def clamp_v(v, w):
        tr = dt * v
        tr2 = jnp.sum(tr * tr, axis=-1)
        scale_t = jnp.where(
            tr2 > C.B2_MAX_TRANSLATION**2,
            C.B2_MAX_TRANSLATION / jnp.sqrt(jnp.maximum(tr2, 1e-30)),
            1.0,
        )
        rot = dt * w
        scale_r = jnp.where(
            rot * rot > C.B2_MAX_ROTATION**2,
            C.B2_MAX_ROTATION / jnp.maximum(jnp.abs(rot), 1e-30),
            1.0,
        )
        return v * scale_t[..., None], w * scale_r

    hv, hw = clamp_v(vel.hull_v, vel.hull_w)
    wv, ww = clamp_v(vel.wheel_v, vel.wheel_w)
    pos = Positions(
        hull_c=state.hull_c + dt * hv,
        hull_a=state.hull_a + dt * hw,
        wheel_c=state.wheel_c + dt * wv,
        wheel_a=state.wheel_a + dt * ww,
    )

    # --- 5. position iterations (contacts then joints, like b2Island);
    # contact push-out converges like the velocity pass and runs only in the
    # first ``contact_position_iters``.
    def pos_iter_contacts(_, pos):
        posx = collide.position_pass(pos, contacts, n_cars)
        return joints.solve_position(posx, jdata)

    def pos_iter_joints(_, pos):
        return joints.solve_position(pos, jdata)

    if contacts is not None:
        k = min(contact_position_iters, position_iters)
        pos = jax.lax.fori_loop(0, k, pos_iter_contacts, pos)
        pos = jax.lax.fori_loop(0, position_iters - k, pos_iter_joints, pos)
    else:
        pos = jax.lax.fori_loop(0, position_iters, pos_iter_joints, pos)

    new_state = state.replace(
        hull_c=pos.hull_c,
        hull_a=pos.hull_a,
        hull_v=hv,
        hull_w=hw,
        wheel_c=pos.wheel_c,
        wheel_a=pos.wheel_a,
        wheel_v=wv,
        wheel_w=ww,
    )
    if contacts is not None:
        return new_state, contacts
    return new_state
