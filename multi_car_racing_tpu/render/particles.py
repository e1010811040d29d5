"""Skid particles (cd:232-249, 337-349) — render-only tire marks.

The reference grows per-wheel polylines while ``|tire force| > 2 *
friction_limit`` (black on road, mud-colored on grass) and keeps the last 30
particles of up to 30 points; they are drawn as width-2 polylines only in
non-state_pixels render modes, so they never appear in the training
observation. Here the same trails are a fixed-shape per-car ring of line
segments (consecutive skidding positions chain into the same visual
polyline), updated by the env when ``EnvConfig.track_skid`` is on (the Gym
facade enables it; batched training leaves it off — the reference wouldn't
draw them there anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as C
from ..struct import pytree_dataclass

MAX_SEGMENTS = 256   # per car (reference cap: 30 particles x <=30 points)


@pytree_dataclass
class SkidState:
    seg: jnp.ndarray      # (N, K, 4) [x1, y1, x2, y2] world coords
    grass: jnp.ndarray    # (N, K) bool — mud color vs wheel color
    valid: jnp.ndarray    # (N, K) bool
    head: jnp.ndarray     # (N,) int32 ring position
    prev: jnp.ndarray     # (N, 4, 2) wheel positions last step
    active: jnp.ndarray   # (N, 4) bool — wheel was skidding last step


def init(num_cars: int, dtype=jnp.float32) -> SkidState:
    k = MAX_SEGMENTS
    return SkidState(
        seg=jnp.zeros((num_cars, k, 4), dtype),
        grass=jnp.zeros((num_cars, k), bool),
        valid=jnp.zeros((num_cars, k), bool),
        head=jnp.zeros((num_cars,), jnp.int32),
        prev=jnp.zeros((num_cars, 4, 2), dtype),
        active=jnp.zeros((num_cars, 4), bool),
    )


def update(state: SkidState, wheel_pos, skidding, on_road) -> SkidState:
    """Advance trails: a wheel skidding on consecutive steps contributes the
    segment between its previous and current position.

    wheel_pos (N, 4, 2); skidding (N, 4) — the tire model's
    |force| > 2*limit flag (cd:233); on_road (N, 4)."""
    n = state.prev.shape[0]
    emit = skidding & state.active                      # (N, 4)
    new_seg = jnp.concatenate([state.prev, wheel_pos], axis=-1)   # (N, 4, 4)

    # Ring-write the (up to 4) new segments per car at head, head+1, ...
    offset = jnp.cumsum(emit.astype(jnp.int32), axis=1) - emit.astype(jnp.int32)
    slot = jnp.mod(state.head[:, None] + offset, MAX_SEGMENTS)    # (N, 4)
    rows = jnp.arange(n)[:, None]
    seg = state.seg.at[rows, slot].set(
        jnp.where(emit[..., None], new_seg, state.seg[rows, slot])
    )
    grass = state.grass.at[rows, slot].set(
        jnp.where(emit, ~on_road, state.grass[rows, slot])
    )
    valid = state.valid.at[rows, slot].set(
        jnp.where(emit, True, state.valid[rows, slot])
    )
    head = jnp.mod(
        state.head + jnp.sum(emit, axis=1, dtype=jnp.int32), MAX_SEGMENTS
    )
    return SkidState(
        seg=seg, grass=grass, valid=valid, head=head,
        prev=wheel_pos, active=skidding,
    )


def segments_window(state: SkidState, to_win):
    """All cars' segments in window coords for one view transform:
    (N_cars*K, 4) + colors (N_cars*K, 3) + valid."""
    a = to_win(state.seg[..., 0:2].reshape(-1, 2))
    b = to_win(state.seg[..., 2:4].reshape(-1, 2))
    grass = state.grass.reshape(-1)
    color = jnp.where(
        grass[:, None],
        jnp.asarray(C.MUD_COLOR, jnp.float32),
        jnp.asarray(C.WHEEL_COLOR, jnp.float32),
    )
    return jnp.concatenate([a, b], axis=-1), color, state.valid.reshape(-1)


def coverage(segs, px, py, half_width: float = 1.0):
    """Pixel coverage of width-2*half_width segments: segs (S, 4) window
    coords; px/py (P,) -> (S, P) bool."""
    ax, ay, bx, by = segs[:, 0:1], segs[:, 1:2], segs[:, 2:3], segs[:, 3:4]
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = jnp.clip(
        ((px[None] - ax) * dx + (py[None] - ay) * dy)
        / jnp.maximum(len2, 1e-9),
        0.0, 1.0,
    )
    cx = ax + t * dx
    cy = ay + t * dy
    d2 = (px[None] - cx) ** 2 + (py[None] - cy) ** 2
    return d2 <= half_width * half_width
