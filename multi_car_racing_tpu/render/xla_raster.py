"""Reference rasterizer in plain XLA ops (portable oracle).

Per-agent scene exactly as the reference paints it (mcr:586-674): white clear
color, grass playfield + checkerboard, road tiles and curbs in creation order
(later polys overdraw), car wheels + phase markers + hull fixtures per car in
id order, then the window-space HUD (black bar, speed/ABS/steer/gyro bars,
score digits, backwards flag).

This implementation favors clarity: one ``lax.scan`` over ~800 polygon slots
per view with painter's overdraw. It is the correctness oracle for the Pallas
production kernel and the CPU fallback; use render/pallas_raster.py for
throughput.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from . import geometry as G


def _pad_quad_to8(q):
    """(..., 4, 2) -> (..., 8, 2) repeating the last vertex."""
    return jnp.concatenate([q, jnp.broadcast_to(q[..., 3:4, :], q.shape[:-2] + (4, 2))], axis=-2)


def _coverage(wx, wy, verts):
    """Convex-poly coverage of pixels: verts (8, 2) window coords ->
    (H, W) bool. Zero-length (padding) edges count as agreeing."""
    inside_pos = None
    inside_neg = None
    for v in range(8):
        ax, ay = verts[v, 0], verts[v, 1]
        bx, by = verts[(v + 1) % 8, 0], verts[(v + 1) % 8, 1]
        cr = (bx - ax) * (wy - ay) - (by - ay) * (wx - ax)
        p, q = cr >= 0, cr <= 0
        inside_pos = p if inside_pos is None else inside_pos & p
        inside_neg = q if inside_neg is None else inside_neg & q
    return inside_pos | inside_neg


def _scene_polys(cfg, state, view: int, colors_table):
    """Stacked polygon slots for one view, painter order. Returns
    (verts (P, 8, 2) window, colors (P, 3), valid (P,))."""
    track = state.track
    mt = track.max_tiles
    n = cfg.num_agents
    zoom, angles, trans = G.camera(cfg, state)
    zoom_v, ang_v, tr_v = zoom, angles[view], trans[view]
    to_win = lambda pts: G.world_to_window(pts, zoom_v, ang_v, tr_v)

    # Road tiles + curbs, interleaved in creation order (mcr:309-334).
    tile_color = jnp.where(
        state.tile_touched[:, None],
        jnp.asarray(C.ROAD_COLOR, jnp.float32)[None, :],
        track.color0,
    )
    curb_color = jnp.where(
        track.curb_red[:, None],
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32)[None, :],
        jnp.asarray([1.0, 1.0, 1.0], jnp.float32)[None, :],
    )
    road = _pad_quad_to8(to_win(track.quad))                 # (MT, 8, 2)
    curb = _pad_quad_to8(to_win(track.curb_quad))
    inter_v = jnp.stack([road, curb], axis=1).reshape(2 * mt, 8, 2)
    inter_c = jnp.stack([tile_color, curb_color], axis=1).reshape(2 * mt, 3)
    inter_ok = jnp.stack(
        [track.valid, track.has_curb], axis=1
    ).reshape(2 * mt)

    # Cars (id order; per car: wheel+marker x4, then hull fixtures).
    polys = G.car_polys_world(state.cars)
    car_v, car_c, car_ok = [], [], []
    wheel_col = jnp.asarray(C.WHEEL_COLOR, jnp.float32)
    white = jnp.asarray(C.WHEEL_WHITE, jnp.float32)
    for car in range(n):
        for w in range(4):
            car_v.append(_pad_quad_to8(to_win(polys["wheel_quads"][car, w])))
            car_c.append(wheel_col)
            car_ok.append(jnp.asarray(True))
            car_v.append(_pad_quad_to8(to_win(polys["marker_quads"][car, w])))
            car_c.append(white)
            car_ok.append(polys["marker_valid"][car, w])
        for hp in range(4):
            car_v.append(to_win(polys["hull_polys"][car, hp]))
            car_c.append(colors_table[view, car])
            car_ok.append(jnp.asarray(True))

    # HUD (window coordinates, mcr:634-664).
    hud = G.hud_values(state)
    s, h = G.HUD_S, G.HUD_H

    def rect(x0, x1, y0, y1):
        q = jnp.stack(
            [jnp.stack([x0, y0]), jnp.stack([x1, y0]),
             jnp.stack([x1, y1]), jnp.stack([x0, y1])]
        )
        return _pad_quad_to8(q)

    f = jnp.float32
    hud_v = [rect(f(0), f(C.WINDOW_W), f(0), f(5 * h))]
    hud_c = [jnp.asarray([0.0, 0.0, 0.0], jnp.float32)]
    hud_ok = [jnp.asarray(True)]

    def vertical(place, val, color):
        hud_v.append(rect(f(place * s), f((place + 1) * s), f(h), h + h * val))
        hud_c.append(jnp.asarray(color, jnp.float32))
        hud_ok.append(jnp.asarray(True))

    def horiz(place, val, color):
        hud_v.append(rect(f(place * s), place * s + val * s, f(2 * h), f(4 * h)))
        hud_c.append(jnp.asarray(color, jnp.float32))
        hud_ok.append(jnp.asarray(True))

    vertical(5, hud["speed"][view], (1, 1, 1))
    vertical(7, hud["abs0"][view], (0.0, 0, 1))
    vertical(8, hud["abs1"][view], (0.0, 0, 1))
    vertical(9, hud["abs2"][view], (0.2, 0, 1))
    vertical(10, hud["abs3"][view], (0.2, 0, 1))
    horiz(20, hud["steer"][view], (0, 1, 0))
    horiz(30, hud["gyro"][view], (1, 0, 0))

    # Backwards flag (mcr:668-674) — painted last.
    if cfg.backwards_flag:
        tri = jnp.asarray(
            [[C.WINDOW_W - 100, 30], [C.WINDOW_W - 75, 70],
             [C.WINDOW_W - 50, 30], [C.WINDOW_W - 50, 30]],
            jnp.float32,
        )
        hud_v.append(_pad_quad_to8(tri))
        hud_c.append(jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
        hud_ok.append(hud["backward"][view])

    verts = jnp.concatenate([inter_v, jnp.stack(car_v), jnp.stack(hud_v)], axis=0)
    colors = jnp.concatenate([inter_c, jnp.stack(car_c), jnp.stack(hud_c)], axis=0)
    valid = jnp.concatenate([inter_ok, jnp.stack(car_ok), jnp.stack(hud_ok)], axis=0)
    return verts, colors, valid


def _background(cfg, state, view, wx, wy):
    """White clear + grass + checkerboard (mcr:613-627), via inverse camera."""
    zoom, angles, trans = G.camera(cfg, state)
    gx, gy = G.window_to_world(wx, wy, zoom, angles[view], trans[view])
    k = C.PLAYFIELD / 20.0
    ix = jnp.floor(gx / k)
    iy = jnp.floor(gy / k)
    infield = (jnp.abs(gx) <= C.PLAYFIELD) & (jnp.abs(gy) <= C.PLAYFIELD)
    lighter = (
        (jnp.mod(ix, 2) == 0) & (jnp.mod(iy, 2) == 0)
        & (ix >= -20) & (ix < 20) & (iy >= -20) & (iy < 20)
    )
    white = jnp.ones((3,), jnp.float32)
    dark = jnp.asarray([0.4, 0.8, 0.4], jnp.float32)
    light = jnp.asarray([0.4, 0.9, 0.4], jnp.float32)
    img = jnp.where(infield[..., None], dark, white)
    img = jnp.where((infield & lighter)[..., None], light, img)
    return img


def _score_overlay(img, wx, wy, score):
    """4-char "%04i" score at (20, 50), 5x7 bitmap glyphs (approximate font;
    see geometry.DIGIT_FONT note)."""
    sc = jnp.clip(jnp.trunc(score), -999, 9999).astype(jnp.int32)
    neg = sc < 0
    a = jnp.abs(sc)
    d = jnp.stack([a // 1000 % 10, a // 100 % 10, a // 10 % 10, a % 10])
    # leading char: '-' when negative (rendered as glyph index 10).
    font = jnp.asarray(
        np.concatenate([G.DIGIT_FONT, [[0, 0, 0, 0b11111, 0, 0, 0]]]), jnp.int32
    )
    chars = jnp.where(
        jnp.asarray([True, False, False, False]) & neg, 10, d
    )
    x0, y_c = G.SCORE_X, G.SCORE_Y
    cw, chh, sp = G.SCORE_DIGIT_W, G.SCORE_DIGIT_H, G.SCORE_SPACING
    out = img
    for i in range(4):
        dx = (wx - (x0 + i * sp)) / cw * 5.0
        dy = (y_c + chh / 2 - wy) / chh * 7.0
        col = jnp.floor(dx).astype(jnp.int32)
        row = jnp.floor(dy).astype(jnp.int32)
        inbox = (col >= 0) & (col < 5) & (row >= 0) & (row < 7)
        bits = font[chars[i]]                       # (7,)
        rowbits = bits[jnp.clip(row, 0, 6)]
        on = inbox & (jnp.bitwise_and(
            rowbits, jnp.left_shift(1, 4 - jnp.clip(col, 0, 4))
        ) > 0)
        out = jnp.where(on[..., None], jnp.ones((3,), jnp.float32), out)
    return out


def render_view(cfg, state, view: int, vp_w: int = C.STATE_W, vp_h: int = C.STATE_H,
                colors_table=None):
    """Render one agent's view -> (vp_h, vp_w, 3) uint8."""
    if colors_table is None:
        colors_table = jnp.asarray(G.car_colors(cfg, cfg.num_agents))
    wx, wy = G.pixel_window_coords(vp_w, vp_h)
    img = _background(cfg, state, view, wx, wy)
    verts, colors, valid = _scene_polys(cfg, state, view, colors_table)

    def body(img, poly):
        v, c, ok = poly
        cov = _coverage(wx, wy, v) & ok
        return jnp.where(cov[..., None], c, img), None

    img, _ = jax.lax.scan(body, img, (verts, colors, valid))

    # Score text over the HUD, under the backwards flag — the flag is a
    # polygon slot painted before this; both never overlap (flag sits at the
    # right edge, score at the left), so ordering here is inconsequential.
    img = _score_overlay(img, wx, wy, state.reward[view])
    return jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def render_observation(cfg, state):
    """All agent views, (N, 96, 96, 3) uint8 (the reference obs contract)."""
    colors_table = jnp.asarray(G.car_colors(cfg, cfg.num_agents))
    views = [
        render_view(cfg, state, v, C.STATE_W, C.STATE_H, colors_table)
        for v in range(cfg.num_agents)
    ]
    return jnp.stack(views, axis=0)
