"""Sensor overlap: car fixtures vs track-tile quads (SAT, batched).

Replaces Box2D's broadphase + sensor Begin/EndContact events (mcr:84-123,
exercised via ``fixtures[0].sensor = True`` at mcr:325) with a dense batched
separating-axis test. "Touching" in Box2D is GJK distance below the summed
polygon skins (2 * b2_polygonRadius = 0.02); the SAT max-axis separation
equals that distance except in corner-corner configurations (where it is a
lower bound), a documented tolerance-level divergence.

Outputs drive three consumers:
- per-wheel on-road flag -> tire friction limit (cd:180-186),
- per-car newly-visited tiles -> reward engine (mcr:110-120),
- per-tile "touched" flag -> render color flattening (mcr:102-104; any
  fixture, hulls included).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config as C
from . import shapes
from .state import CarState


def car_fixture_world_geometry(state: CarState):
    """World-space fixture polygons for each car.

    Returns (verts (N, 8, 8, 2), normals (N, 8, 8, 2)) — fixtures 0-3 are the
    hull polys (transformed by the hull *origin* frame), 4-7 the wheel rects.
    Padded vertices repeat the last real vertex (harmless for SAT).
    """
    dtype = state.hull_c.dtype
    local_v = jnp.asarray(shapes.CAR_FIXTURE_VERTS, dtype)       # (8,8,2)
    local_n = jnp.asarray(shapes.CAR_FIXTURE_NORMALS, dtype)     # (8,8,2)

    origin = jnp.concatenate(
        [state.hull_origin[:, None, :], state.wheel_c], axis=1
    )                                                            # (N,5,2)
    angle = jnp.concatenate([state.hull_a[:, None], state.wheel_a], axis=1)
    body = jnp.asarray(shapes.CAR_FIXTURE_BODY)                  # (8,)
    f_origin = origin[:, body]                                   # (N,8,2)
    f_angle = angle[:, body]                                     # (N,8)

    s, c = jnp.sin(f_angle), jnp.cos(f_angle)                    # (N,8)
    rot = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )                                                            # (N,8,2,2)
    verts = jnp.einsum("nfij,nfvj->nfvi", rot, local_v[None]) + f_origin[:, :, None, :]
    normals = jnp.einsum("nfij,nfvj->nfvi", rot, local_n[None])
    return verts, normals


def _interval_gap(axes, averts, bverts):
    """Separation along each axis: max(minB-maxA, minA-maxB).

    axes (..., K, 2); averts (..., Va, 2); bverts (..., Vb, 2) — broadcasting
    over leading dims. Returns (..., K)."""
    pa = jnp.einsum("...kc,...vc->...kv", axes, averts)
    pb = jnp.einsum("...kc,...vc->...kv", axes, bverts)
    return jnp.maximum(
        pb.min(-1) - pa.max(-1), pa.min(-1) - pb.max(-1)
    )


def quad_axes(quads: jnp.ndarray) -> jnp.ndarray:
    """Unit edge normals of quads (..., 4, 2) -> (..., 4, 2). Degenerate
    (padding) quads produce NaN axes, which make every comparison False —
    exactly the desired 'no overlap'."""
    edges = jnp.roll(quads, -1, axis=-2) - quads
    n = jnp.stack([edges[..., 1], -edges[..., 0]], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def fixtures_vs_quads(
    fverts: jnp.ndarray,     # (N, F, 8, 2) world fixture verts
    fnormals: jnp.ndarray,   # (N, F, 8, 2) world fixture normals (unit)
    quads: jnp.ndarray,      # (T, 4, 2)
    margin: float = C.SENSOR_OVERLAP_MARGIN,
) -> jnp.ndarray:
    """(N, F, T) bool — SAT overlap (within margin) of every fixture against
    every quad."""
    qax = quad_axes(quads)                                       # (T,4,2)
    q = quads[None, None]                                        # (1,1,T,4,2)
    fv = fverts[:, :, None]                                      # (N,F,1,8,2)
    # Axes from the fixture (8) and from the quad (4).
    gap_f = _interval_gap(fnormals[:, :, None], fv, q)           # (N,F,T,8)
    gap_q = _interval_gap(qax[None, None], fv, q)                # (N,F,T,4)
    sep = jnp.maximum(gap_f.max(-1), gap_q.max(-1))
    return sep < margin


def point_in_quads(points: jnp.ndarray, quads: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) points strictly inside (T, 4, 2) quads -> (..., T) bool.

    Mirrors shapely's ``Point.within`` on convex quads (mcr:469-471):
    interior only, either winding. Degenerate padding quads -> False.
    """
    p = points[..., None, None, :]                   # (..., 1, 1, 2)
    a = quads                                        # (T, 4, 2)
    b = jnp.roll(quads, -1, axis=-2)
    cross = (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (p[..., 0] - a[..., 0])                      # (..., T, 4)
    return jnp.all(cross > 0, axis=-1) | jnp.all(cross < 0, axis=-1)
