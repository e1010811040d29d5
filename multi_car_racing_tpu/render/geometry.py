"""Camera + scene geometry shared by the XLA and Pallas rasterizers.

Reproduces the reference's per-agent view pipeline (mcr:520-604):
- zoom animates 0.1*SCALE -> ZOOM*SCALE over the first second (mcr:540),
- the view rotates so the car's velocity direction (speed > 0.5; else the
  hull heading) points up (mcr:544-549),
- the car sits horizontally centered at ``h_ratio`` window height
  (mcr:552-556),
- the full 1000x800 window space is squeezed anisotropically into the
  viewport (96x96 for state pixels; 600x400 rgb_array).

Window coords: ``win = trans + R(angle) @ (zoom * world)``; obs row 0 is the
top of the window (the reference flips the GL readback, mcr:602).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config as C
from ..physics import shapes
from ..physics.state import CarState


def camera(cfg, state):
    """Per-view camera parameters: (zoom (), angle (N,), trans (N, 2))."""
    t = state.t
    zoom = 0.1 * C.SCALE * jnp.maximum(1.0 - t, 0.0) + C.ZOOM * C.SCALE * jnp.minimum(
        t, 1.0
    )
    cars = state.cars
    scroll = cars.hull_origin                       # (N, 2)
    vel = cars.hull_v
    speed = jnp.linalg.norm(vel, axis=-1)
    angle = jnp.where(
        speed > 0.5, jnp.arctan2(vel[:, 0], vel[:, 1]), -cars.hull_a
    )
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    tx = C.WINDOW_W / 2 - zoom * (ca * scroll[:, 0] - sa * scroll[:, 1])
    ty = C.WINDOW_H * cfg.h_ratio - zoom * (sa * scroll[:, 0] + ca * scroll[:, 1])
    return zoom, angle, jnp.stack([tx, ty], axis=-1)


def world_to_window(pts, zoom, angle, trans):
    """pts (..., 2) world -> window. Broadcast zoom/angle/trans as scalars or
    per-view leading dims."""
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    x = pts[..., 0] * zoom
    y = pts[..., 1] * zoom
    return jnp.stack(
        [trans[..., 0] + ca * x - sa * y, trans[..., 1] + sa * x + ca * y],
        axis=-1,
    )


def pixel_window_coords(vp_w: int, vp_h: int, dtype=jnp.float32):
    """Window coordinates of viewport pixel centers: (vp_h, vp_w) each for
    x and y; row 0 = window top."""
    col = (jnp.arange(vp_w, dtype=dtype) + 0.5) * (C.WINDOW_W / vp_w)
    row = (vp_h - 0.5 - jnp.arange(vp_h, dtype=dtype)) * (C.WINDOW_H / vp_h)
    wx = jnp.broadcast_to(col[None, :], (vp_h, vp_w))
    wy = jnp.broadcast_to(row[:, None], (vp_h, vp_w))
    return wx, wy


def window_to_world(wx, wy, zoom, angle, trans):
    """Inverse camera: window pixel coords -> world coords."""
    dx = (wx - trans[..., 0])
    dy = (wy - trans[..., 1])
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    inv = 1.0 / zoom
    return (ca * dx + sa * dy) * inv, (-sa * dx + ca * dy) * inv


# ---------------------------------------------------------------------------
# Car polygons (world space) in reference paint order
# ---------------------------------------------------------------------------

# Paint order within one car (gym-0.17 Car.draw, drawlist = wheels + [hull]):
# wheel poly + its phase marker for each of the 4 wheels, then the 4 hull
# fixtures. 12 polys + 4 markers per car.

_WHEEL_LOCAL = np.asarray(shapes.WHEEL_POLY, dtype=np.float32)        # (4, 2)
_HULL_LOCALS = [np.asarray(p, np.float32) for p in shapes.HULL_POLYS]  # 4 x (V, 2)


def _rot(points, angle):
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    x, y = points[..., 0], points[..., 1]
    return jnp.stack([ca * x - sa * y, sa * x + ca * y], axis=-1)


def wheel_marker_local(phase):
    """The rotating white stripe on each wheel (gymnasium cd:302-321).

    phase (...,) -> (verts (..., 4, 2), valid (...,))."""
    a1 = phase
    a2 = phase + 1.2
    s1, s2 = jnp.sin(a1), jnp.sin(a2)
    c1, c2 = jnp.cos(a1), jnp.cos(a2)
    valid = ~((s1 > 0) & (s2 > 0))
    c1 = jnp.where(s1 > 0, jnp.sign(c1), c1)
    c2 = jnp.where(s2 > 0, jnp.sign(c2), c2)
    w = C.WHEEL_W * C.SIZE
    r = C.WHEEL_R * C.SIZE
    y1 = r * c1
    y2 = r * c2
    one = jnp.ones_like(phase)
    verts = jnp.stack(
        [
            jnp.stack([-w * one, y1], axis=-1),
            jnp.stack([+w * one, y1], axis=-1),
            jnp.stack([+w * one, y2], axis=-1),
            jnp.stack([-w * one, y2], axis=-1),
        ],
        axis=-2,
    )
    return verts, valid


def car_polys_world(cars: CarState):
    """World-space car polygons in paint order.

    Returns dict with:
      wheel_quads (N, 4, 4, 2), marker_quads (N, 4, 4, 2), marker_valid (N, 4),
      hull_polys  (N, 4, 8, 2)  (padded to 8 verts; pad repeats last vertex)
    """
    n = cars.num_cars
    wheel_local = jnp.asarray(_WHEEL_LOCAL)
    wq = _rot(wheel_local[None, None], cars.wheel_a[..., None]) + cars.wheel_c[..., None, :]

    mk_local, mk_valid = wheel_marker_local(cars.phase)      # (N,4,4,2),(N,4)
    mq = _rot(mk_local, cars.wheel_a[..., None]) + cars.wheel_c[..., None, :]

    origin = cars.hull_origin
    hulls = []
    for poly in _HULL_LOCALS:
        v = np.zeros((8, 2), np.float32)
        v[: len(poly)] = poly
        v[len(poly):] = poly[-1]
        pv = _rot(jnp.asarray(v)[None], cars.hull_a[:, None]) + origin[:, None, :]
        hulls.append(pv)
    hull_polys = jnp.stack(hulls, axis=1)                     # (N, 4, 8, 2)
    return dict(
        wheel_quads=wq, marker_quads=mq, marker_valid=mk_valid,
        hull_polys=hull_polys,
    )


def car_colors(cfg, num_agents: int):
    """Static per-(view, car) hull colors honoring use_ego_color (mcr:559-563)
    -> (n_views, n_cars, 3) numpy."""
    n = num_agents
    out = np.zeros((n, n, 3), np.float32)
    for view in range(n):
        for car in range(n):
            if cfg.use_ego_color:
                out[view, car] = (0.8, 0, 0) if car == view else (0, 0, 0.8)
            else:
                out[view, car] = C.CAR_COLORS[car % len(C.CAR_COLORS)]
    return out


# ---------------------------------------------------------------------------
# HUD (window coordinates, mcr:634-674) — static geometry + per-view values
# ---------------------------------------------------------------------------

HUD_S = C.WINDOW_W / 40.0    # 25
HUD_H = C.WINDOW_H / 40.0    # 20


def hud_values(state):
    """Per-view dynamic HUD scalars: (speed_val (N,), abs_vals (N,4),
    steer_val (N,), gyro_val (N,), score (N,), backward (N,))."""
    cars = state.cars
    true_speed = jnp.linalg.norm(cars.hull_v, axis=-1)
    return dict(
        speed=0.02 * true_speed,
        abs0=0.01 * cars.spin[:, 0],
        abs1=0.01 * cars.spin[:, 1],
        abs2=0.01 * cars.spin[:, 2],
        abs3=0.01 * cars.spin[:, 3],
        steer=-10.0 * cars.joint_angle[:, 0],
        gyro=-0.8 * cars.hull_w,
        score=state.reward,
        backward=state.driving_backward,
    )


# 5x7 bitmap digit font for the score label (the reference uses a pyglet
# 36 px font; glyph-exact parity is not achievable — this is a documented
# approximation at matching position/size).
DIGIT_FONT = np.array(
    [
        [0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110],  # 0
        [0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110],  # 1
        [0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111],  # 2
        [0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110],  # 3
        [0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010],  # 4
        [0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110],  # 5
        [0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110],  # 6
        [0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000],  # 7
        [0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110],  # 8
        [0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100],  # 9
    ],
    dtype=np.uint8,
)

SCORE_X = 20.0           # label x (mcr:533-534)
SCORE_Y = C.WINDOW_H * 2.5 / 40.0   # 50, anchor center
SCORE_DIGIT_W = 20.0
SCORE_DIGIT_H = 36.0
SCORE_SPACING = 24.0
