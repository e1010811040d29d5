"""Car rigid-body + tire state pytrees (fixed shapes, batched over envs).

Replaces the reference's per-car Box2D object graph (hull body, 4 wheel
bodies, 4 revolute joints, per-wheel scalar tire state — cd:54-139) with flat
arrays over ``(N, ...)`` so thousands of envs step in lockstep under
``jit``/``vmap``. Positions are stored Box2D-solver style: ``c`` is the world
position of the *center of mass* and ``a`` the angle; the body-origin
position (what Box2D exposes as ``body.position``) is derived.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..struct import pytree_dataclass
from . import shapes


@pytree_dataclass
class CarState:
    # Rigid bodies (hull + 4 wheels per car).
    hull_c: jnp.ndarray      # (N, 2) COM position
    hull_a: jnp.ndarray      # (N,) angle
    hull_v: jnp.ndarray      # (N, 2) linear velocity (at COM)
    hull_w: jnp.ndarray      # (N,) angular velocity
    wheel_c: jnp.ndarray     # (N, 4, 2)
    wheel_a: jnp.ndarray     # (N, 4)
    wheel_v: jnp.ndarray     # (N, 4, 2)
    wheel_w: jnp.ndarray     # (N, 4)

    # Revolute joint solver state (warm-start accumulators, cd:122-134).
    joint_impulse: jnp.ndarray   # (N, 4, 3) point x/y + limit z impulse
    motor_impulse: jnp.ndarray   # (N, 4)
    limit_state: jnp.ndarray     # (N, 4) int32: 0 inactive, 1 at lower, 2 at upper

    # Tire / control state (cd:113-119).
    gas: jnp.ndarray         # (N, 4) — only rear wheels receive gas
    brake: jnp.ndarray       # (N, 4)
    steer: jnp.ndarray       # (N, 4) — servo target, only front wheels set
    spin: jnp.ndarray        # (N, 4) — rolling angular velocity w.omega
    phase: jnp.ndarray       # (N, 4) — rolling angle (render)
    fuel_spent: jnp.ndarray  # (N,)

    @property
    def num_cars(self) -> int:
        return self.hull_c.shape[-2]

    @property
    def hull_origin(self) -> jnp.ndarray:
        """Box2D ``hull.position`` (body origin), (N, 2)."""
        s, c = jnp.sin(self.hull_a), jnp.cos(self.hull_a)
        lc = shapes.HULL_LOCAL_CENTER
        off = jnp.stack(
            [c * lc[0] - s * lc[1], s * lc[0] + c * lc[1]], axis=-1
        )
        return self.hull_c - off

    @property
    def joint_angle(self) -> jnp.ndarray:
        """Revolute joint angles (wheel - hull), (N, 4)."""
        return self.wheel_a - self.hull_a[..., None]


def create_cars(pos: jnp.ndarray, angle: jnp.ndarray, dtype=jnp.float32) -> CarState:
    """Spawn cars like ``Car.__init__`` (cd:54-139).

    Quirk kept for parity: wheel bodies are created at ``origin + WHEELPOS``
    *without rotating the offset by the spawn angle* (cd:98) — the joints pull
    them into place during the first solver steps.
    """
    pos = jnp.asarray(pos, dtype)
    angle = jnp.asarray(angle, dtype)
    n = pos.shape[0]

    hull_origin = pos
    s, c = jnp.sin(angle), jnp.cos(angle)
    lc = shapes.HULL_LOCAL_CENTER
    hull_c = hull_origin + jnp.stack(
        [c * lc[0] - s * lc[1], s * lc[0] + c * lc[1]], axis=-1
    )

    wheel_off = jnp.asarray(shapes.WHEEL_POS, dtype)          # (4, 2), unrotated
    wheel_c = pos[:, None, :] + wheel_off[None, :, :]
    wheel_a = jnp.broadcast_to(angle[:, None], (n, 4))

    z4 = jnp.zeros((n, 4), dtype)
    return CarState(
        hull_c=hull_c,
        hull_a=angle,
        hull_v=jnp.zeros((n, 2), dtype),
        hull_w=jnp.zeros((n,), dtype),
        wheel_c=wheel_c,
        wheel_a=wheel_a,
        wheel_v=jnp.zeros((n, 4, 2), dtype),
        wheel_w=z4,
        joint_impulse=jnp.zeros((n, 4, 3), dtype),
        motor_impulse=z4,
        limit_state=jnp.zeros((n, 4), jnp.int32),
        gas=z4,
        brake=z4,
        steer=z4,
        spin=z4,
        phase=z4,
        fuel_spent=jnp.zeros((n,), dtype),
    )


def apply_controls(state: CarState, action: jnp.ndarray) -> CarState:
    """Apply ``(N, 3)`` actions with the reference's exact setter semantics:
    ``car.steer(-a[0]); car.gas(a[1]); car.brake(a[2])`` (mcr:421-424).

    - steer: sets the front-wheel servo target instantly (cd:163-170);
    - gas: clipped to [0,1], rear wheels only, increase rate-limited to
      +0.1 per call, decrease instant (cd:141-152);
    - brake: set on all four wheels (cd:154-161).
    """
    steer_t = -action[:, 0]
    gas_t = jnp.clip(action[:, 1], 0.0, 1.0)
    brake_t = action[:, 2]

    steer = state.steer.at[:, :2].set(steer_t[:, None])

    rear = state.gas[:, 2:4]
    diff = jnp.minimum(gas_t[:, None] - rear, 0.1)
    gas = state.gas.at[:, 2:4].set(rear + diff)

    brake = jnp.broadcast_to(brake_t[:, None], state.brake.shape)
    return state.replace(steer=steer, gas=gas, brake=brake)


def wheel_forward_side(state: CarState):
    """World-frame forward (local (0,1)) and side (local (1,0)) unit vectors
    per wheel (cd:189-190)."""
    s, c = jnp.sin(state.wheel_a), jnp.cos(state.wheel_a)
    forw = jnp.stack([-s, c], axis=-1)
    side = jnp.stack([c, s], axis=-1)
    return forw, side
