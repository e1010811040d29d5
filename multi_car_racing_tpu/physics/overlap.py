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

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from . import shapes
from .state import CarState


def car_fixture_world_geometry(state: CarState):
    """World-space fixture polygons for each car.

    Returns (verts (N, 8, 8, 2), normals (N, 8, 8, 2)) — fixtures 0-3 are the
    hull polys (transformed by the hull *origin* frame), 4-7 the wheel rects.
    Padded vertices wrap cyclically (harmless for SAT).
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
    verts = jnp.einsum("nfij,nfvj->nfvi", rot, local_v[None],
                       precision=jax.lax.Precision.HIGHEST) + f_origin[:, :, None, :]
    normals = jnp.einsum("nfij,nfvj->nfvi", rot, local_n[None],
                         precision=jax.lax.Precision.HIGHEST)
    return verts, normals


def _interval_gap(axes, averts, bverts):
    """Separation along each axis: max(minB-maxA, minA-maxB).

    axes (..., K, 2); averts (..., Va, 2); bverts (..., Vb, 2) — broadcasting
    over leading dims. Returns (..., K)."""
    # Explicit mul+sum instead of einsum: the c=2 contraction carries WORLD
    # vertex coordinates (|x| up to 333) — an MXU dot at default precision
    # truncates them to bf16 (~1 m separation error), and HIGHEST pays a
    # 6-pass decomposition. The elementwise form is exact f32 on the VPU
    # and measures at least as fast (this runs inside the hot per-step
    # contact pass).
    pa = jnp.sum(axes[..., :, None, :] * averts[..., None, :, :], axis=-1)
    pb = jnp.sum(axes[..., :, None, :] * bverts[..., None, :, :], axis=-1)
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
    quads: jnp.ndarray,      # (T, 4, 2) shared, or (N, T, 4, 2) per-car
    margin: float = C.SENSOR_OVERLAP_MARGIN,
) -> jnp.ndarray:
    """(N, F, T) bool — SAT overlap (within margin) of every fixture against
    every quad. ``quads`` may be per-car (candidate-gathered) or shared."""
    if quads.ndim == 3:
        q = quads[None, None]                                    # (1,1,T,4,2)
        qax = quad_axes(quads)[None, None]
    else:
        q = quads[:, None]                                       # (N,1,T,4,2)
        qax = quad_axes(quads)[:, None]
    fv = fverts[:, :, None]                                      # (N,F,1,8,2)
    # Axes from the fixture (8) and from the quad (4).
    gap_f = _interval_gap(fnormals[:, :, None], fv, q)           # (N,F,T,8)
    gap_q = _interval_gap(qax, fv, q)                            # (N,F,T,4)
    sep = jnp.maximum(gap_f.max(-1), gap_q.max(-1))
    return sep < margin


# ---------------------------------------------------------------------------
# Hot-path contact tests, tiles-last layout.
#
# On TPU the minor (last) dimension maps to vector lanes (x128); arrays whose
# last dimension is a small structural size (2 coords, 4 verts) run the VPU at
# a few percent occupancy. The production contact pass therefore computes
# everything with the tile dimension last — (N, 4, MT) intermediates over
# precomputed (4, 2, MT) tile geometry — with the tiny vertex/axis loops
# unrolled in Python. Dense over all padded tiles: no gather, no scatter, no
# sort, all of which lower catastrophically on TPU (measured: a top-k +
# scatter variant cost 30+ ms/step at 4096 envs; this path is ~1 ms).
# ---------------------------------------------------------------------------

_WHEEL_HX = float(C.WHEEL_W * C.SIZE)   # rect half-width along local x (side)
_WHEEL_HY = float(C.WHEEL_R * C.SIZE)   # rect half-height along local y (forw)


def wheel_tile_overlap(
    state: CarState, track, margin: float = C.SENSOR_OVERLAP_MARGIN
) -> jnp.ndarray:
    """SAT overlap of each wheel rect against every tile quad: (N, 4, MT) bool.

    Wheel rects are oriented boxes: 2 unique face axes + analytic support
    radius, so the full SAT needs 6 axes instead of 8 and ~80 flops/pair.
    """
    from .state import wheel_forward_side

    forw, side = wheel_forward_side(state)            # (N, 4, 2)
    c = state.wheel_c                                 # (N, 4, 2)
    qx, qy = track.quad_T[:, 0], track.quad_T[:, 1]   # (4v, MT)

    sep = None

    # --- wheel's own axes (side: half-extent HX, forw: HY).
    for ax, h in ((side, _WHEEL_HX), (forw, _WHEEL_HY)):
        axx, axy = ax[..., 0:1], ax[..., 1:2]          # (N, 4, 1)
        cp = c[..., 0:1] * axx + c[..., 1:2] * axy     # (N, 4, 1)
        lo_b = hi_b = None
        for v in range(4):
            p = axx * qx[v] + axy * qy[v]              # (N, 4, MT)
            lo_b = p if lo_b is None else jnp.minimum(lo_b, p)
            hi_b = p if hi_b is None else jnp.maximum(hi_b, p)
        g = jnp.maximum(lo_b - (cp + h), (cp - h) - hi_b)
        sep = g if sep is None else jnp.maximum(sep, g)

    # --- tile's 4 edge normals with precomputed own-interval.
    for a in range(4):
        axx, axy = track.quad_ax_T[a, 0], track.quad_ax_T[a, 1]   # (MT,)
        cp = c[..., 0:1] * axx + c[..., 1:2] * axy                # (N, 4, MT)
        sp = side[..., 0:1] * axx + side[..., 1:2] * axy
        fp = forw[..., 0:1] * axx + forw[..., 1:2] * axy
        r = _WHEEL_HX * jnp.abs(sp) + _WHEEL_HY * jnp.abs(fp)
        g = jnp.maximum(
            track.quad_lo[a] - (cp + r), (cp - r) - track.quad_hi[a]
        )
        sep = jnp.maximum(sep, g)

    return sep < margin


def point_in_quads_T(points: jnp.ndarray, quad_T: jnp.ndarray) -> jnp.ndarray:
    """Points (N, 2) strictly inside quads given tiles-last verts (4, 2, MT)
    -> (N, MT) bool. Same semantics as point_in_quads."""
    px, py = points[:, 0:1], points[:, 1:2]            # (N, 1)
    pos = neg = None
    for v in range(4):
        ax_, ay_ = quad_T[v, 0], quad_T[v, 1]          # (MT,)
        bx_, by_ = quad_T[(v + 1) % 4, 0], quad_T[(v + 1) % 4, 1]
        cr = (bx_ - ax_) * (py - ay_) - (by_ - ay_) * (px - ax_)   # (N, MT)
        p, q = cr > 0, cr < 0
        pos = p if pos is None else pos & p
        neg = q if neg is None else neg & q
    return pos | neg


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
