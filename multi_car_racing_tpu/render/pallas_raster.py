"""Pallas TPU rasterization kernel — the production pixel path.

Why a kernel: the scene painter is a long chain of conditional writes to the
image. In XLA, every paint layer materializes the batched image to HBM
(measured 138-1300 ms/step at 4096x2 views depending on dtype tricks); here
the palette-index plane lives in a VMEM scratch register for the whole
program, polygon/slot parameters sit in SMEM, and each slot touches only a
32-row band around its precomputed bbox. One HBM write per view at the end.

Organization:
- XLA precompute (shared with render/raster.py geometry): per-view packed
  slot tables in *window coordinates* — quad slots (road tiles + curbs,
  windowed + visibility-culled), poly8 slots (car wheels/markers/hulls +
  backwards flag), HUD rect slots, score glyph row-bits — plus camera
  scalars for the background.
- Kernel: grid (V,), V = E*N views. Per program: background (world-space
  grass/checker via inverse camera), then banded painter over the slot
  tables into a (96, 128) int32 palette plane, stored once.
- XLA post: palette -> RGB uint8, crop the 32 pad lanes, reshape to
  (E, N, 96, 96, 3).

The slot tables make this kernel exact for the full episode including the
first-second zoom-out: tiles outside the windows are handled by the same
windowing as render/raster.py (same documented warmup approximation), but
banding makes the zoomed-out phase cheap rather than wrong-er: every slot
still paints, just into a tiny band.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config as C
from . import geometry as G
from . import raster as R

BAND = 32          # rows touched per quad/poly slot (max quad height is ~29)
H, W = C.STATE_H, C.STATE_W
WPAD = 128         # lane-padded width

SQ = 2 * R.WS      # quad slots: tile+curb interleaved
SR = 8             # rect slots: black bar + 5 vertical + 2 horizontal


def _row_of_wy(wy):
    return (H - 0.5) - wy * (H / C.WINDOW_H)


def _band_start(rmin_f):
    return jnp.clip(jnp.floor(rmin_f) - 1.0, 0, H - BAND).astype(jnp.int32)


def _view_inputs(cfg, state, n):
    """Per-env (N views) packed slot tables; vmap over E outside."""
    f32 = jnp.float32
    track = state.track
    zoom, angles, trans = G.camera(cfg, state)

    def to_win(pts, extra_dims):
        return G.world_to_window(
            pts, zoom,
            angles.reshape((n,) + (1,) * extra_dims),
            trans.reshape((n,) + (1,) * extra_dims + (2,)),
        )

    # --- camera scalars for the background; slot 5 flags the first-second
    # zoom-out (mcr:540), during which the kernel paints the FULL track in
    # world space instead of the windowed slots (far segments would
    # otherwise be missing from warmup frames).
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    warm = (zoom < 0.999 * C.ZOOM * C.SCALE).astype(f32) * jnp.ones_like(ca)
    cam = jnp.stack(
        [ca, sa, trans[:, 0], trans[:, 1],
         1.0 / zoom * jnp.ones_like(ca),
         warm, jnp.zeros_like(ca), jnp.zeros_like(ca)],
        axis=-1,
    )[:, None, :]                                                # (N, 1, 8)

    # --- quad slots: windowed tiles + curbs, interleaved (paint order).
    ccx, ccy = G.window_to_world(
        jnp.full((n,), C.WINDOW_W / 2, f32), jnp.full((n,), C.WINDOW_H / 2, f32),
        zoom, angles, trans,
    )
    widx = R._window_indices(track, jnp.stack([ccx, ccy], -1), R.W1, R.W2)
    i32 = jnp.int32
    tile_pal = jnp.where(
        state.tile_touched, jnp.asarray(R.PAL_ROAD0, i32),
        (R.PAL_ROAD0 + jnp.mod(jnp.arange(track.max_tiles), 3)).astype(i32),
    )
    curb_pal = jnp.where(
        track.curb_red, jnp.asarray(R.PAL_RED, i32), jnp.asarray(R.PAL_WHITE, i32)
    )
    tq = to_win(jnp.take(track.quad, widx, axis=0), 2)           # (N, WS, 4, 2)
    cq = to_win(jnp.take(track.curb_quad, widx, axis=0), 2)
    quads = jnp.stack([tq, cq], axis=2).reshape(n, SQ, 4, 2)
    pals = jnp.stack(
        [jnp.take(tile_pal, widx, axis=0), jnp.take(curb_pal, widx, axis=0)],
        axis=2,
    ).reshape(n, SQ)
    valid = jnp.stack(
        [jnp.take(track.valid, widx, axis=0), jnp.take(track.has_curb, widx, axis=0)],
        axis=2,
    ).reshape(n, SQ)

    def pack_quads(quads, pals, valid):
        rows = _row_of_wy(quads[..., 1])                         # (N, S, 4)
        cols = quads[..., 0] * (W / C.WINDOW_W) - 0.5
        rmin, rmax = rows.min(-1), rows.max(-1)
        cmin, cmax = cols.min(-1), cols.max(-1)
        onscreen = (rmax >= 0) & (rmin < H) & (cmax >= 0) & (cmin < W)
        active = (valid & onscreen).astype(jnp.float32)
        r0 = _band_start(rmin).astype(jnp.float32)
        v8 = quads.reshape(quads.shape[:-2] + (8,))
        pad = jnp.zeros(quads.shape[:-2] + (2,), jnp.float32)
        return jnp.concatenate(
            [v8, pals[..., None].astype(jnp.float32), active[..., None],
             r0[..., None], pad[..., :1]], axis=-1
        )                                                        # (N, S, 12)

    quad_slots = pack_quads(quads, pals, valid)

    # --- poly8 slots: cars in id order + backwards triangle.
    polys = G.car_polys_world(state.cars)
    if cfg.use_ego_color:
        hull_pal_np = np.full((n, n), R.PAL_CAR0 + 1, np.int32)
        np.fill_diagonal(hull_pal_np, R.PAL_CAR0)
    else:
        hull_pal_np = np.tile(
            (R.PAL_CAR0 + np.arange(n) % len(C.CAR_COLORS)).astype(np.int32),
            (n, 1),
        )
    hull_pal = jnp.asarray(hull_pal_np)

    def pad8(q):  # (..., 4, 2) -> (..., 8, 2)
        return jnp.concatenate(
            [q, jnp.broadcast_to(q[..., 3:4, :], q.shape[:-2] + (4, 2))], axis=-2
        )

    slot_v, slot_p, slot_a = [], [], []
    ones = jnp.ones((n,), f32)
    for car in range(n):
        for w in range(4):
            slot_v.append(to_win(pad8(
                jnp.broadcast_to(polys["wheel_quads"][car, w][None], (n, 4, 2))
            ), 1))
            slot_p.append(R.PAL_BLACK * ones)
            slot_a.append(ones)
            slot_v.append(to_win(pad8(
                jnp.broadcast_to(polys["marker_quads"][car, w][None], (n, 4, 2))
            ), 1))
            slot_p.append(R.PAL_WHEEL_WHITE * ones)
            slot_a.append(jnp.broadcast_to(
                polys["marker_valid"][car, w].astype(f32), (n,)
            ))
        for hp in range(4):
            slot_v.append(to_win(
                jnp.broadcast_to(polys["hull_polys"][car, hp][None], (n, 8, 2)), 1
            ))
            slot_p.append(hull_pal[:, car].astype(f32))
            slot_a.append(ones)
    # Backwards flag triangle (window space, painted after HUD in the
    # reference; it never overlaps the HUD bars or score, so slot order here
    # is inconsequential).
    if cfg.backwards_flag:
        tri = jnp.asarray(
            [[C.WINDOW_W - 100, 30], [C.WINDOW_W - 75, 70], [C.WINDOW_W - 50, 30]],
            f32,
        )
        tri8 = jnp.concatenate([tri, jnp.broadcast_to(tri[2:3], (5, 2))], 0)
        slot_v.append(jnp.broadcast_to(tri8[None], (n, 8, 2)))
        slot_p.append(R.PAL_ABS_BLUE * ones)
        slot_a.append(state.driving_backward.astype(f32))

    pv = jnp.stack(slot_v, axis=1)                               # (N, SP, 8, 2)
    pp = jnp.stack(slot_p, axis=1)
    pa = jnp.stack(slot_a, axis=1)
    rows = _row_of_wy(pv[..., 1])
    cols = pv[..., 0] * (W / C.WINDOW_W) - 0.5
    onscreen = (rows.max(-1) >= 0) & (rows.min(-1) < H) & (cols.max(-1) >= 0) & (
        cols.min(-1) < W
    )
    r0 = _band_start(rows.min(-1)).astype(f32)
    poly_slots = jnp.concatenate(
        [pv.reshape(n, pv.shape[1], 16), pp[..., None],
         (pa * onscreen).astype(f32)[..., None], r0[..., None],
         jnp.zeros((n, pv.shape[1], 1), f32)],
        axis=-1,
    )                                                            # (N, SP, 20)

    # --- HUD rect slots (window coords; val<0 handled via min/max).
    hud = G.hud_values(state)
    s, h = G.HUD_S, G.HUD_H
    z = jnp.zeros_like(hud["speed"])
    o = jnp.ones_like(hud["speed"])
    rects = [
        (z, C.WINDOW_W * o, z, 5 * h * o, R.PAL_BLACK * o),
        (5 * s * o, 6 * s * o, h * o, h + h * hud["speed"], R.PAL_WHITE * o),
        (7 * s * o, 8 * s * o, h * o, h + h * hud["abs0"], R.PAL_ABS_BLUE * o),
        (8 * s * o, 9 * s * o, h * o, h + h * hud["abs1"], R.PAL_ABS_BLUE * o),
        (9 * s * o, 10 * s * o, h * o, h + h * hud["abs2"], R.PAL_ABS_BLUE2 * o),
        (10 * s * o, 11 * s * o, h * o, h + h * hud["abs3"], R.PAL_ABS_BLUE2 * o),
        (20 * s * o, 20 * s + hud["steer"] * s, 2 * h * o, 4 * h * o, R.PAL_GREEN * o),
        (30 * s * o, 30 * s + hud["gyro"] * s, 2 * h * o, 4 * h * o, R.PAL_RED * o),
    ]
    rect_rows = []
    for (x0, x1, y0, y1, pal) in rects:
        xa, xb = jnp.minimum(x0, x1), jnp.maximum(x0, x1)
        ya, yb = jnp.minimum(y0, y1), jnp.maximum(y0, y1)
        r0r = _band_start(_row_of_wy(yb)).astype(f32)
        rect_rows.append(jnp.stack([xa, xb, ya, yb, pal, o, r0r, z], axis=-1))
    rect_slots = jnp.stack(rect_rows, axis=1)                    # (N, SR, 8)

    # --- score glyph row bits ("%04i", 5x7 font).
    sc = jnp.clip(jnp.trunc(state.reward), -999, 9999).astype(i32)
    neg = sc < 0
    a = jnp.abs(sc)
    digits = jnp.stack([a // 1000 % 10, a // 100 % 10, a // 10 % 10, a % 10], 1)
    font = jnp.asarray(
        np.concatenate([G.DIGIT_FONT, [[0, 0, 0, 0b11111, 0, 0, 0]]]), i32
    )
    chars = digits.at[:, 0].set(jnp.where(neg, 10, digits[:, 0]))
    oh = (chars[..., None] == jnp.arange(font.shape[0])[None, None]).astype(i32)
    bits = jnp.einsum("ndk,kr->ndr", oh, font)                   # (N, 4, 7)
    score_bits = jnp.concatenate(
        [bits, jnp.zeros((n, 4, 1), i32)], axis=-1
    )                                                            # (N, 4, 8)

    # --- per-env full-track metadata for the warmup world-space pass.
    tmeta = jnp.stack(
        [tile_pal.astype(f32), curb_pal.astype(f32),
         track.valid.astype(f32), track.has_curb.astype(f32)],
        axis=-1,
    )                                                            # (MT, 4)
    return cam, quad_slots, poly_slots, rect_slots, score_bits, tmeta


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(cam_ref, quad_ref, poly_ref, rect_ref, score_ref,
            tq_ref, cq_ref, tmeta_ref, out_ref, idx, wxs, wys, gxs, gys):
    f32 = jnp.float32
    row = jax.lax.broadcasted_iota(jnp.int32, (H, WPAD), 0).astype(f32)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, WPAD), 1).astype(f32)
    wx = (col + 0.5) * (C.WINDOW_W / W)          # pad lanes map past 1000
    wy = (H - 0.5 - row) * (C.WINDOW_H / H)
    wxs[:, :] = wx
    wys[:, :] = wy

    # --- background: inverse camera -> world, grass + checker, white outside.
    ca = cam_ref[0, 0, 0]
    sa = cam_ref[0, 0, 1]
    tx = cam_ref[0, 0, 2]
    ty = cam_ref[0, 0, 3]
    inv_zoom = cam_ref[0, 0, 4]
    dx = wx - tx
    dy = wy - ty
    gx = (ca * dx + sa * dy) * inv_zoom
    gy = (-sa * dx + ca * dy) * inv_zoom
    gxs[:, :] = gx
    gys[:, :] = gy
    k = C.PLAYFIELD / 20.0
    ix = jnp.floor(gx / k)
    iy = jnp.floor(gy / k)
    infield = (jnp.abs(gx) <= C.PLAYFIELD) & (jnp.abs(gy) <= C.PLAYFIELD)
    lighter = (
        (jnp.mod(ix, 2) == 0) & (jnp.mod(iy, 2) == 0)
        & (ix >= -20) & (ix < 20) & (iy >= -20) & (iy < 20)
    )
    base = jnp.full((H, WPAD), R.PAL_WHITE, jnp.int32)
    base = jnp.where(infield, R.PAL_GRASS_DARK, base)
    base = jnp.where(infield & lighter, R.PAL_GRASS_LIGHT, base)
    idx[:, :] = base

    warmup = cam_ref[0, 0, 5] > 0.0

    def edge_cov(bx, by, ax, ay, wxb, wyb):
        c1 = by - ay
        c2 = bx - ax
        k0 = c1 * ax - c2 * ay
        cr = c2 * wyb - c1 * wxb + k0
        return cr >= 0.0, cr <= 0.0

    def paint_poly(vref, t, nverts, pal_i, act_i, r0_i):
        active = vref[0, t, act_i] > 0.0

        @pl.when(active)
        def _():
            r0 = vref[0, t, r0_i].astype(jnp.int32)
            wxb = wxs[pl.ds(r0, BAND), :]
            wyb = wys[pl.ds(r0, BAND), :]
            pos = neg = None
            for v in range(nverts):
                ax = vref[0, t, 2 * v]
                ay = vref[0, t, 2 * v + 1]
                nxt = (v + 1) % nverts
                bx = vref[0, t, 2 * nxt]
                by = vref[0, t, 2 * nxt + 1]
                p, q = edge_cov(bx, by, ax, ay, wxb, wyb)
                pos = p if pos is None else pos & p
                neg = q if neg is None else neg & q
            cov = pos | neg
            pal = vref[0, t, pal_i].astype(jnp.int32)
            cur = idx[pl.ds(r0, BAND), :]
            idx[pl.ds(r0, BAND), :] = jnp.where(cov, pal, cur)

    # --- road tiles + curbs.
    # Steady state: windowed slots (banded). During the first-second
    # zoom-out: the FULL track painted in world space (creation order —
    # tile i then its curb, mcr:309-334), since the windows cover only the
    # tiles near the car while most of the track is visible.
    @pl.when(jnp.logical_not(warmup))
    def _():
        def quad_body(t, _):
            paint_poly(quad_ref, t, 4, 8, 9, 10)
            return 0

        jax.lax.fori_loop(0, SQ, quad_body, 0)

    @pl.when(warmup)
    def _():
        gxb = gxs[:, :]
        gyb = gys[:, :]

        def lanes(x11):
            # Mosaic can't broadcast (1,1)->(H,WPAD) in one op ("broadcast in
            # both sublanes and lanes"); widen lanes first.
            return jnp.broadcast_to(x11, (1, WPAD))

        def world_quad(qrow, pal1, mask1):
            # qrow (1, 8) world verts; pal1/mask1 (1, 1) — everything stays a
            # vector (no scalar loads; VMEM scalars are SMEM-only in Mosaic).
            pos = neg = None
            for v in range(4):
                ax = lanes(qrow[:, 2 * v:2 * v + 1])
                ay = lanes(qrow[:, 2 * v + 1:2 * v + 2])
                nxt = (v + 1) % 4
                bx = lanes(qrow[:, 2 * nxt:2 * nxt + 1])
                by = lanes(qrow[:, 2 * nxt + 1:2 * nxt + 2])
                p, q = edge_cov(bx, by, ax, ay, gxb, gyb)
                pos = p if pos is None else pos & p
                neg = q if neg is None else neg & q
            cov = (pos | neg) & (lanes(mask1) > 0.0)
            idx[:, :] = jnp.where(cov, lanes(pal1).astype(jnp.int32), idx[:, :])

        def far_body(t, _):
            meta = tmeta_ref[0, pl.ds(t, 1), :]        # (1, 4)
            world_quad(
                tq_ref[0, pl.ds(t, 1), :], meta[:, 0:1], meta[:, 2:3]
            )
            world_quad(
                cq_ref[0, pl.ds(t, 1), :], meta[:, 1:2], meta[:, 3:4]
            )
            return 0

        jax.lax.fori_loop(0, tq_ref.shape[1], far_body, 0)

    # --- cars + backwards triangle.
    n_poly = poly_ref.shape[1]

    def poly_body(t, _):
        paint_poly(poly_ref, t, 8, 16, 17, 18)
        return 0

    jax.lax.fori_loop(0, n_poly, poly_body, 0)

    # --- HUD rects.
    def rect_body(t, _):
        r0 = rect_ref[0, t, 6].astype(jnp.int32)
        wxb = wxs[pl.ds(r0, BAND), :]
        wyb = wys[pl.ds(r0, BAND), :]
        cov = (
            (wxb >= rect_ref[0, t, 0]) & (wxb <= rect_ref[0, t, 1])
            & (wyb >= rect_ref[0, t, 2]) & (wyb <= rect_ref[0, t, 3])
        )
        pal = rect_ref[0, t, 4].astype(jnp.int32)
        cur = idx[pl.ds(r0, BAND), :]
        idx[pl.ds(r0, BAND), :] = jnp.where(cov, pal, cur)
        return 0

    jax.lax.fori_loop(0, SR, rect_body, 0)

    # --- score glyphs (fixed 16-row band).
    r0 = H - 16
    wxb = wxs[pl.ds(r0, 16), :]
    wyb = wys[pl.ds(r0, 16), :]
    for i in range(4):
        dxg = (wxb - (G.SCORE_X + i * G.SCORE_SPACING)) / G.SCORE_DIGIT_W * 5.0
        dyg = (G.SCORE_Y + G.SCORE_DIGIT_H / 2 - wyb) / G.SCORE_DIGIT_H * 7.0
        gcol = jnp.floor(dxg)
        grow = jnp.floor(dyg)
        inbox = (gcol >= 0) & (gcol < 5) & (grow >= 0) & (grow < 7)
        rowbits = jnp.zeros((16, WPAD), jnp.int32)
        for rr in range(7):
            rowbits = jnp.where(grow == rr, score_ref[0, i, rr], rowbits)
        shift = jnp.clip(4 - gcol, 0, 4).astype(jnp.int32)
        on = inbox & (
            jnp.bitwise_and(rowbits, jnp.left_shift(1, shift)) > 0
        )
        cur = idx[pl.ds(r0, 16), :]
        idx[pl.ds(r0, 16), :] = jnp.where(on, R.PAL_WHITE, cur)

    out_ref[0, :, :] = idx[:, :]


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_pixels(cfg, state, interpret: bool = False):
    """Batched EnvState (E, ...) -> (E, N, 96, 96, 3) uint8 via the kernel.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    n = cfg.num_agents
    cam, quads, polys, rects, score, tmeta = jax.vmap(
        lambda s: _view_inputs(cfg, s, n)
    )(state)
    E = cam.shape[0]
    V = E * n
    mt = state.track.max_tiles
    tq = state.track.quad.reshape(E, mt, 8).astype(jnp.float32)
    cq = state.track.curb_quad.reshape(E, mt, 8).astype(jnp.float32)

    def flat(x):
        return x.reshape((V,) + x.shape[2:])

    cam, quads, polys, rects, score = map(flat, (cam, quads, polys, rects, score))
    sp = polys.shape[1]

    def env_spec(rows, width):
        # Per-ENV block (views of one env share the track): program v reads
        # env v // n.
        return pl.BlockSpec(
            (1, rows, width), lambda v: (v // n, 0, 0),
            memory_space=pltpu.ANY if interpret else pltpu.VMEM,
        )

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((V, H, WPAD), jnp.int32),
        grid=(V,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda v: (v, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SQ, 12), lambda v: (v, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sp, 20), lambda v: (v, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SR, 8), lambda v: (v, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, 8), lambda v: (v, 0, 0), memory_space=pltpu.SMEM),
            env_spec(mt, 8),
            env_spec(mt, 8),
            env_spec(mt, 4),
        ],
        out_specs=pl.BlockSpec((1, H, WPAD), lambda v: (v, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, WPAD), jnp.int32),
            pltpu.VMEM((H, WPAD), jnp.float32),
            pltpu.VMEM((H, WPAD), jnp.float32),
            pltpu.VMEM((H, WPAD), jnp.float32),
            pltpu.VMEM((H, WPAD), jnp.float32),
        ],
        interpret=interpret,
    )(cam, quads, polys, rects, score, tq, cq, tmeta)

    # Palette expansion + crop pad lanes.
    idx = out[:, :, :W]
    r = g = b = jnp.zeros(idx.shape, jnp.uint8)
    for c in range(R.PALETTE_U8.shape[0]):
        m = idx == c
        r = jnp.where(m, jnp.asarray(R.PALETTE_U8[c, 0], jnp.uint8), r)
        g = jnp.where(m, jnp.asarray(R.PALETTE_U8[c, 1], jnp.uint8), g)
        b = jnp.where(m, jnp.asarray(R.PALETTE_U8[c, 2], jnp.uint8), b)
    img = jnp.stack([r, g, b], axis=-1)
    return img.reshape(E, n, H, W, 3)
