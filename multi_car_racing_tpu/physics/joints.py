"""Revolute steering-joint solver (Box2D 2.3.5 ``b2RevoluteJoint`` semantics).

Each car is a 5-body island: hull (A) + 4 wheels (B_k), joined by revolute
joints at ``WHEELPOS*SIZE`` with motor (torque cap 64.8) and angle limits
±0.4 (cd:122-134). This module reproduces the sequential-impulse velocity/
position constraint math — warm starting, the motor impulse clamp, the
2x2 point solve, the 3x3 point+limit solve with the accumulated-z clamp, and
the slop/Baumgarte position correction — vectorized over ``(N, 4)`` joints
with Gauss-Seidel ordering across a car's four joints (hull state updates
between joints, matching Box2D's per-island joint iteration).

Simplifications valid for this system (asserted by construction, not
approximations): the wheel's local anchor and local center are both the wheel
origin, so rB == 0 everywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import config as C
from . import shapes
from .state import CarState

_MA = float(shapes.HULL_INV_MASS)
_IA = float(shapes.HULL_INV_I)
_MB = float(shapes.WHEEL_INV_MASS)
_IB = float(shapes.WHEEL_INV_I)
_MOTOR_MASS = 1.0 / (_IA + _IB)

INACTIVE, AT_LOWER, AT_UPPER = 0, 1, 2


class Velocities(NamedTuple):
    hull_v: jnp.ndarray   # (N, 2)
    hull_w: jnp.ndarray   # (N,)
    wheel_v: jnp.ndarray  # (N, 4, 2)
    wheel_w: jnp.ndarray  # (N, 4)


class Positions(NamedTuple):
    hull_c: jnp.ndarray   # (N, 2)
    hull_a: jnp.ndarray   # (N,)
    wheel_c: jnp.ndarray  # (N, 4, 2)
    wheel_a: jnp.ndarray  # (N, 4)


class JointData(NamedTuple):
    """Per-step constants computed by InitVelocityConstraints."""
    r_a: jnp.ndarray          # (N, 4, 2) hull anchor arm (world frame)
    limit_state: jnp.ndarray  # (N, 4) int32
    motor_speed: jnp.ndarray  # (N, 4)


def _rot(angle, vec):
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.stack(
        [c * vec[..., 0] - s * vec[..., 1], s * vec[..., 0] + c * vec[..., 1]],
        axis=-1,
    )


def _cross_sv(w, r):
    """scalar x vector: w × r = (-w*r_y, w*r_x)."""
    return jnp.stack([-w * r[..., 1], w * r[..., 0]], axis=-1)


def _cross_vv(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _k_matrix(r_a):
    """Point-constraint effective-mass 2x2 (symmetric) given rB = 0."""
    rx, ry = r_a[..., 0], r_a[..., 1]
    k11 = _MA + _MB + _IA * ry * ry
    k12 = -_IA * rx * ry
    k22 = _MA + _MB + _IA * rx * rx
    return k11, k12, k22


def _solve22(k11, k12, k22, bx, by):
    det = k11 * k22 - k12 * k12
    inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
    x = inv * (k22 * bx - k12 * by)
    y = inv * (k11 * by - k12 * bx)
    return x, y


def init_constraints(state: CarState, motor_speed: jnp.ndarray):
    """b2RevoluteJoint::InitVelocityConstraints (the parts that persist):
    anchor arms, limit-state transition (zeroing the accumulated limit
    impulse on entry/exit), vectorized over all (N, 4) joints."""
    local_anchor = jnp.asarray(shapes.WHEEL_POS, state.hull_c.dtype)
    lc = jnp.asarray(shapes.HULL_LOCAL_CENTER, state.hull_c.dtype)
    arm_local = local_anchor[None, :, :] - lc[None, None, :]       # (1, 4, 2)
    r_a = _rot(state.hull_a[:, None], arm_local)                   # (N, 4, 2)

    joint_angle = state.wheel_a - state.hull_a[:, None]
    new_ls = jnp.where(
        joint_angle <= C.STEER_JOINT_LOWER,
        AT_LOWER,
        jnp.where(joint_angle >= C.STEER_JOINT_UPPER, AT_UPPER, INACTIVE),
    ).astype(jnp.int32)
    # impulse.z survives only while staying in the same active limit state.
    keep_z = (new_ls == state.limit_state) & (new_ls != INACTIVE)
    imp = state.joint_impulse
    imp = imp.at[..., 2].set(jnp.where(keep_z, imp[..., 2], 0.0))

    state = state.replace(limit_state=new_ls, joint_impulse=imp)
    return state, JointData(r_a=r_a, limit_state=new_ls, motor_speed=motor_speed)


def warm_start(vel: Velocities, data: JointData, joint_imp, motor_imp) -> Velocities:
    """Apply accumulated impulses (dtRatio == 1: fixed dt)."""
    hull_v, hull_w, wheel_v, wheel_w = vel
    p = joint_imp[..., 0:2]                           # (N, 4, 2)
    ang = motor_imp + joint_imp[..., 2]
    hull_v = hull_v - _MA * jnp.sum(p, axis=1)
    hull_w = hull_w - _IA * jnp.sum(_cross_vv(data.r_a, p) + ang, axis=1)
    wheel_v = wheel_v + _MB * p
    wheel_w = wheel_w + _IB * ang
    return Velocities(hull_v, hull_w, wheel_v, wheel_w)


def solve_velocity(vel: Velocities, data: JointData, joint_imp, motor_imp, dt: float):
    """One velocity iteration: the four joints of each car solved
    sequentially (Gauss-Seidel), all cars in parallel.

    Carries only the mutating arrays (velocities + impulse accumulators) —
    NOT the whole CarState — so a ``fori_loop`` over this function moves the
    minimum number of bytes per iteration (the difference is 30x+ HBM traffic
    inside scanned rollouts; see world_step)."""
    hull_v, hull_w, wheel_v, wheel_w = vel
    max_motor = dt * C.STEER_JOINT_MAX_MOTOR_TORQUE

    for k in range(4):
        r_a = data.r_a[:, k]                        # (N, 2)
        ls = data.limit_state[:, k]
        w_v = wheel_v[:, k]
        w_w = wheel_w[:, k]

        # --- Motor (always enabled; limits are not equal).
        cdot = w_w - hull_w - data.motor_speed[:, k]
        imp = -_MOTOR_MASS * cdot
        old = motor_imp[:, k]
        new = jnp.clip(old + imp, -max_motor, max_motor)
        imp = new - old
        motor_imp = motor_imp.at[:, k].set(new)
        hull_w = hull_w - _IA * imp
        w_w = w_w + _IB * imp

        # --- Point + (maybe) limit.
        cdot1 = w_v - hull_v - _cross_sv(hull_w, r_a)   # rB = 0
        cdot2 = w_w - hull_w
        k11, k12, k22 = _k_matrix(r_a)
        ez_x = -_IA * r_a[:, 1]
        ez_y = _IA * r_a[:, 0]
        ez_z = _IA + _IB

        acc = joint_imp[:, k]                           # (N, 3)

        # 3x3 solve (limit active): K3 columns (ex, ey, ez) with
        # ex=(k11,k12,ez_x), ey=(k12,k22,ez_y), ez=(ez_x,ez_y,ez_z).
        bx, by, bz = cdot1[:, 0], cdot1[:, 1], cdot2
        # det = ex . (ey x ez)
        cx = k22 * ez_z - ez_y * ez_y
        cy = ez_y * ez_x - k12 * ez_z
        cz = k12 * ez_y - k22 * ez_x
        det = k11 * cx + k12 * cy + ez_x * cz
        inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
        ix = -inv_det * (bx * cx + by * cy + bz * cz)
        cy2x = ez_x * ez_y - k12 * ez_z
        cy2y = k11 * ez_z - ez_x * ez_x
        cy2z = k12 * ez_x - k11 * ez_y
        iy = -inv_det * (bx * cy2x + by * cy2y + bz * cy2z)
        cz3x = k12 * ez_y - k22 * ez_x
        cz3y = k12 * ez_x - k11 * ez_y
        cz3z = k11 * k22 - k12 * k12
        iz = -inv_det * (bx * cz3x + by * cz3y + bz * cz3z)

        new_z = acc[:, 2] + iz
        clampdown = ((ls == AT_LOWER) & (new_z < 0.0)) | (
            (ls == AT_UPPER) & (new_z > 0.0)
        )
        # Reduced solve when the limit impulse unwinds to zero.
        rhs_x = -bx + acc[:, 2] * ez_x
        rhs_y = -by + acc[:, 2] * ez_y
        red_x, red_y = _solve22(k11, k12, k22, rhs_x, rhs_y)
        lim_ix = jnp.where(clampdown, red_x, ix)
        lim_iy = jnp.where(clampdown, red_y, iy)
        lim_iz = jnp.where(clampdown, -acc[:, 2], iz)
        lim_acc = jnp.stack(
            [acc[:, 0] + lim_ix, acc[:, 1] + lim_iy,
             jnp.where(clampdown, 0.0, acc[:, 2] + iz)],
            axis=-1,
        )

        # 2x2 point-only solve (limit inactive).
        pt_x, pt_y = _solve22(k11, k12, k22, -bx, -by)
        pt_acc = jnp.stack(
            [acc[:, 0] + pt_x, acc[:, 1] + pt_y, acc[:, 2]], axis=-1
        )

        active = ls != INACTIVE
        imp_x = jnp.where(active, lim_ix, pt_x)
        imp_y = jnp.where(active, lim_iy, pt_y)
        imp_z = jnp.where(active, lim_iz, 0.0)
        joint_imp = joint_imp.at[:, k].set(jnp.where(active[:, None], lim_acc, pt_acc))

        p = jnp.stack([imp_x, imp_y], axis=-1)
        hull_v = hull_v - _MA * p
        hull_w = hull_w - _IA * (_cross_vv(r_a, p) + imp_z)
        w_v = w_v + _MB * p
        w_w = w_w + _IB * imp_z

        wheel_v = wheel_v.at[:, k].set(w_v)
        wheel_w = wheel_w.at[:, k].set(w_w)

    vel = Velocities(hull_v, hull_w, wheel_v, wheel_w)
    return vel, joint_imp, motor_imp


def solve_position(pos: Positions, data: JointData) -> Positions:
    """One position iteration (b2RevoluteJoint::SolvePositionConstraints),
    joints of a car sequential, cars parallel."""
    hull_c, hull_a, wheel_c, wheel_a = pos
    local_anchor = jnp.asarray(shapes.WHEEL_POS, hull_c.dtype)
    lc = jnp.asarray(shapes.HULL_LOCAL_CENTER, hull_c.dtype)

    for k in range(4):
        ls = data.limit_state[:, k]
        # --- Limit correction.
        angle = wheel_a[:, k] - hull_a
        c_low = jnp.clip(
            angle - C.STEER_JOINT_LOWER + C.B2_ANGULAR_SLOP,
            -C.B2_MAX_ANGULAR_CORRECTION, 0.0,
        )
        c_up = jnp.clip(
            angle - C.STEER_JOINT_UPPER - C.B2_ANGULAR_SLOP,
            0.0, C.B2_MAX_ANGULAR_CORRECTION,
        )
        c_lim = jnp.where(ls == AT_LOWER, c_low, jnp.where(ls == AT_UPPER, c_up, 0.0))
        limit_impulse = -_MOTOR_MASS * c_lim
        hull_a = hull_a - _IA * limit_impulse
        wheel_a = wheel_a.at[:, k].add(_IB * limit_impulse)

        # --- Point correction (anchors re-derived from updated angles).
        arm_local = local_anchor[k][None, :] - lc[None, :]
        r_a = _rot(hull_a, arm_local)
        cvec = wheel_c[:, k] - hull_c - r_a                     # rB = 0
        k11, k12, k22 = _k_matrix(r_a)
        imp_x, imp_y = _solve22(k11, k12, k22, -cvec[:, 0], -cvec[:, 1])
        p = jnp.stack([imp_x, imp_y], axis=-1)
        hull_c = hull_c - _MA * p
        hull_a = hull_a - _IA * _cross_vv(r_a, p)
        wheel_c = wheel_c.at[:, k].add(_MB * p)
        # wheel_a unchanged: cross(rB, P) = 0.

    return Positions(hull_c, hull_a, wheel_c, wheel_a)
