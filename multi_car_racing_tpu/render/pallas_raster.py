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
  scalars for the background. Slots carry precomputed *edge coefficients*
  (cr = c2*y - c1*x + k0 per edge) with the polygon's orientation sign
  folded in (an exact f32 negation), so the kernel does one >= test per
  edge instead of both-signs tests, and windowed tile fetches ride the MXU
  as a one-hot matmul instead of a serial gather.
- Kernel: grid (V,), V = E*N views. Per program: background (world-space
  grass/checker via inverse camera), banded painter over the slot tables
  into a (96, 128) int32 palette plane, then in-VMEM palette expansion to
  three uint8 channel planes, stored once.
- XLA post: crop the 32 pad lanes, transpose to (E, N, 96, 96, 3).

The slot tables make this kernel exact for the full episode including the
first-second zoom-out: warmup frames take a dedicated full-track pass (all
tiles, not just the near window — see the `@pl.when(warmup)` branch below and
tests/test_render.py's warmup cases), and banding keeps that zoomed-out
phase cheap: every slot still paints, just into a tiny band.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config as C
from . import geometry as G
from . import raster as R

# Dev-only ablation knob for kernel profiling: comma list of sections to
# SKIP (background,quads,warmup,cars,hud,score,flag,palette). Read at trace
# time; never set in production (output is wrong with any section off).
_ABLATE = frozenset(
    s for s in os.environ.get("MCR_RASTER_ABLATE", "").split(",") if s
)

# Compact active quad slots to the front of the table (XLA precompute) so
# the kernel's slot loop only visits live slots. Exact (stable order).
# MCR_RASTER_COMPACT=0 restores the fixed-bound loop for A/B timing.
_COMPACT = os.environ.get("MCR_RASTER_COMPACT", "1") == "1"

BAND = 32          # rows touched per tile-quad/rect slot (max quad height ~29)
CAR_BAND = 16      # rows per car slot (car diag 3.63 m * 16.2 px/m * 96/800
                   # rows/px = 7.1 rows max at full zoom, +2 band margin)
H, W = C.STATE_H, C.STATE_W
WPAD = 128         # lane-padded width

SQ = 2 * R.WS      # quad slots: tile+curb interleaved
SR = 8             # rect slots: black bar + 5 vertical + 2 horizontal


def _row_of_wy(wy):
    return (H - 0.5) - wy * (H / C.WINDOW_H)


def _band_start(rmin_f):
    return jnp.clip(jnp.floor(rmin_f) - 1.0, 0, H - BAND).astype(jnp.int32)


def _edge_coefs(poly):
    """(..., V, 2) polygon -> (..., 3V) edge coefficients [c1,c2,k0]*V with
    the orientation sign folded in: interior pixels satisfy
    c2*y - c1*x + k0 >= 0 for EVERY edge regardless of winding.

    Sign folding is an exact f32 negation, so coverage is bit-identical to
    the both-signs (pos|neg) test for consistently-wound convex polygons;
    degenerate (repeated-vertex) edges yield cr == +-0 which passes >=."""
    b = jnp.roll(poly, -1, axis=-2)
    c1 = b[..., 1] - poly[..., 1]
    c2 = b[..., 0] - poly[..., 0]
    k0 = c1 * poly[..., 0] - c2 * poly[..., 1]
    shoelace = jnp.sum(
        poly[..., 0] * b[..., 1] - poly[..., 1] * b[..., 0], axis=-1
    )
    sgn = jnp.where(shoelace < 0, -1.0, 1.0)[..., None, None]
    coef = jnp.stack([c1, c2, k0], axis=-1) * sgn           # (..., V, 3)
    return coef.reshape(poly.shape[:-2] + (3 * poly.shape[-2],))


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

    # --- quad slots: windowed tiles + curbs, interleaved (paint order).
    ccx, ccy = G.window_to_world(
        jnp.full((n,), C.WINDOW_W / 2, f32), jnp.full((n,), C.WINDOW_H / 2, f32),
        zoom, angles, trans,
    )
    i32 = jnp.int32
    mt = track.max_tiles
    tile_pal = jnp.where(
        state.tile_touched, jnp.asarray(R.PAL_ROAD0, i32),
        (R.PAL_ROAD0 + jnp.mod(jnp.arange(mt), 3)).astype(i32),
    )
    curb_pal = jnp.where(
        track.curb_red, jnp.asarray(R.PAL_RED, i32), jnp.asarray(R.PAL_WHITE, i32)
    )
    # Window membership as a MASK + stable cumsum compaction — no sort.
    # (R._window_indices ends in jnp.sort over the merged windows, which
    # profiled at ~0.3 us/view; the compacted one-hot below produces the
    # same tiles in the same ascending creation/paint order, with window
    # overlaps collapsed instead of painted twice — pixel-identical.)
    centers = jnp.stack([ccx, ccy], -1)                          # (N, 2)
    d2 = jnp.sum(jnp.square(centers[:, None, :] - track.xy[None]), axis=-1)
    d2 = jnp.where(track.valid[None], d2, jnp.inf)
    ntil = track.n_tiles
    iota_mt = jnp.arange(mt, dtype=i32)
    near1 = jnp.argmin(d2, axis=1).astype(i32)
    s1 = jnp.mod(near1 - R.W1 // 2, ntil)
    off1 = jnp.mod(iota_mt[None, :] - s1[:, None], ntil)
    in1 = (off1 < R.W1) & track.valid[None, :]
    near2 = jnp.argmin(jnp.where(in1, jnp.inf, d2), axis=1).astype(i32)
    s2 = jnp.mod(near2 - R.W2 // 2, ntil)
    off2 = jnp.mod(iota_mt[None, :] - s2[:, None], ntil)
    wmask = in1 | ((off2 < R.W2) & track.valid[None, :])         # (N, MT)
    wpos = jnp.cumsum(wmask, axis=-1) - 1
    oh = (
        (wpos[:, None, :] == jnp.arange(R.WS, dtype=i32)[None, :, None])
        & wmask[:, None, :]
    ).astype(f32)                                                # (N, WS, MT)
    # Windowed gather as a one-hot MXU matmul: jnp.take with (N, WS) indices
    # and 8-float trailing payload lowers to a serial gather on TPU (measured
    # ~70x slower at 2048 views). A single (N·WS, MT) @ (MT, 20) product
    # fetches quads + curb quads + palettes + validity in one pass, exactly
    # (one nonzero per one-hot row; x*1.0 is exact in f32).
    cols = jnp.concatenate(
        [
            track.quad.reshape(mt, 8).astype(f32),
            track.curb_quad.reshape(mt, 8).astype(f32),
            tile_pal[:, None].astype(f32),
            curb_pal[:, None].astype(f32),
            track.valid[:, None].astype(f32),
            track.has_curb[:, None].astype(f32),
        ],
        axis=-1,
    )                                                            # (MT, 20)
    # HIGHEST is load-bearing: cols carries world-space quad vertices
    # (|x| up to 333); the default MXU precision truncates payloads to bf16
    # (~1 m -> ~2 obs px of geometry error on TPU). The incidence side (oh)
    # is 0/1. Runs once per view-step over (N*WS, MT) — cost is noise.
    g = jax.lax.dot_general(
        oh.reshape(-1, mt), cols, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(n, R.WS, 20)
    tq = to_win(g[..., 0:8].reshape(n, R.WS, 4, 2), 2)           # (N, WS, 4, 2)
    cq = to_win(g[..., 8:16].reshape(n, R.WS, 4, 2), 2)
    quads = jnp.stack([tq, cq], axis=2).reshape(n, SQ, 4, 2)
    pals = jnp.stack([g[..., 16], g[..., 17]], axis=2).reshape(n, SQ).astype(i32)
    valid = jnp.stack([g[..., 18], g[..., 19]], axis=2).reshape(n, SQ) > 0.5

    def pack_quads(quads, pals, valid):
        rows = _row_of_wy(quads[..., 1])                         # (N, S, 4)
        cols = quads[..., 0] * (W / C.WINDOW_W) - 0.5
        rmin, rmax = rows.min(-1), rows.max(-1)
        cmin, cmax = cols.min(-1), cols.max(-1)
        onscreen = (rmax >= 0) & (rmin < H) & (cmax >= 0) & (cmin < W)
        active = (valid & onscreen).astype(jnp.float32)
        r0 = _band_start(rmin).astype(jnp.float32)
        coef = _edge_coefs(quads)                                # (N, S, 12)
        pad = jnp.zeros(quads.shape[:-2] + (1,), jnp.float32)
        return jnp.concatenate(
            [coef, pals[..., None].astype(jnp.float32), active[..., None],
             r0[..., None], pad], axis=-1
        )                                                        # (N, S, 16)

    quad_slots = pack_quads(quads, pals, valid)

    # Compact the active (onscreen) quad slots to the front, preserving
    # their relative order (paint order is semantic: later tiles overwrite
    # seam pixels), and pass the active count to the kernel so the slot
    # loop only visits live slots (~half of SQ in steady state). Stable
    # cumsum positions + a one-hot MXU product (a scatter would serialize).
    act = quad_slots[..., 13] > 0.0                              # (N, SQ)
    nq = jnp.sum(act, axis=-1).astype(f32)                       # (N,)
    if _COMPACT:
        dpos = jnp.cumsum(act, axis=-1) - 1                      # (N, SQ)
        oh2 = (
            (dpos[:, None, :] == jnp.arange(SQ, dtype=i32)[None, :, None])
            & act[:, None, :]
        ).astype(f32)                                            # (N, SQ->j, SQ<-t)
        # oh2 is a 0/1 permutation; HIGHEST keeps the routed slot payload
        # (edge coefficients with |k0| up to ~1e6, palette ids) bit-intact
        # instead of bf16-rounded on TPU.
        quad_slots = jax.lax.dot_general(
            oh2, quad_slots, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # (N, SQ, 16)
    else:
        nq = jnp.full_like(nq, SQ)

    cam = jnp.stack(
        [ca, sa, trans[:, 0], trans[:, 1],
         1.0 / zoom * jnp.ones_like(ca),
         warm, nq, jnp.zeros_like(ca)],
        axis=-1,
    )[:, None, :]                                                # (N, 1, 8)

    # --- car slots, two tables: 4-edge wheel/marker quads and 8-edge hull
    # polys (+ backwards triangle). Splitting saves the 4 degenerate padded
    # edges per wheel/marker the old single poly8 table paid; both tables
    # use the narrow CAR_BAND (cars span <= ~9 obs rows at full zoom — the
    # camera only ever zooms OUT from there, shrinking them).
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

    def pack_polys(pv, pp, pa, band):
        rows = _row_of_wy(pv[..., 1])
        cols = pv[..., 0] * (W / C.WINDOW_W) - 0.5
        onscreen = (
            (rows.max(-1) >= 0) & (rows.min(-1) < H)
            & (cols.max(-1) >= 0) & (cols.min(-1) < W)
        )
        r0 = jnp.clip(jnp.floor(rows.min(-1)) - 1.0, 0, H - band)
        return jnp.concatenate(
            [_edge_coefs(pv), pp[..., None],
             (pa * onscreen).astype(f32)[..., None], r0[..., None],
             jnp.zeros(pv.shape[:-2] + (1,), f32)],
            axis=-1,
        )

    ones = jnp.ones((n,), f32)
    q4_v, q4_p, q4_a = [], [], []            # 8 slots per car: (wheel, marker)*4
    p8_v, p8_p, p8_a = [], [], []            # 4 hull slots per car, + flag
    for car in range(n):
        for w in range(4):
            q4_v.append(to_win(
                jnp.broadcast_to(polys["wheel_quads"][car, w][None], (n, 4, 2)), 1
            ))
            q4_p.append(R.PAL_BLACK * ones)
            q4_a.append(ones)
            q4_v.append(to_win(
                jnp.broadcast_to(polys["marker_quads"][car, w][None], (n, 4, 2)), 1
            ))
            q4_p.append(R.PAL_WHEEL_WHITE * ones)
            q4_a.append(jnp.broadcast_to(
                polys["marker_valid"][car, w].astype(f32), (n,)
            ))
        for hp in range(4):
            p8_v.append(to_win(
                jnp.broadcast_to(polys["hull_polys"][car, hp][None], (n, 8, 2)), 1
            ))
            p8_p.append(hull_pal[:, car].astype(f32))
            p8_a.append(ones)
    # Backwards flag triangle (window space, painted after HUD in the
    # reference; it never overlaps the HUD bars or score, so slot order here
    # is inconsequential).
    if cfg.backwards_flag:
        tri = jnp.asarray(
            [[C.WINDOW_W - 100, 30], [C.WINDOW_W - 75, 70], [C.WINDOW_W - 50, 30]],
            f32,
        )
        tri8 = jnp.concatenate([tri, jnp.broadcast_to(tri[2:3], (5, 2))], 0)
        p8_v.append(jnp.broadcast_to(tri8[None], (n, 8, 2)))
        p8_p.append(R.PAL_ABS_BLUE * ones)
        p8_a.append(state.driving_backward.astype(f32))

    quad4_slots = pack_polys(
        jnp.stack(q4_v, 1), jnp.stack(q4_p, 1), jnp.stack(q4_a, 1), CAR_BAND
    )                                                            # (N, 8n, 16)
    poly8_slots = pack_polys(
        jnp.stack(p8_v, 1), jnp.stack(p8_p, 1), jnp.stack(p8_a, 1), CAR_BAND
    )                                                            # (N, 4n[+1], 28)

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

    return cam, quad_slots, quad4_slots, poly8_slots, rect_slots, score_bits


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _make_kernel(B: int, n: int, warm: bool):
    """Kernel painting B views per program (B a multiple of n).

    Per-program fixed costs — input/output DMA latency, grid bookkeeping,
    the window-coordinate plane setup — amortize over the B views. Views of
    the same env share its track tables: the per-program track block covers
    G = B/n envs and view b reads env b//n.

    ``warm=False`` compiles WITHOUT the zoom-out full-track branch: the
    full-track tables (tq/cq/tmeta) are warmup-only, and materializing +
    layout-copying + DMA-ing them every step profiled at ~1.5 us/view of
    the steady-state cost (narrow inner dims pad 16-32x under T(8,128)
    tiling). render_pixels lax.cond-selects the variant per step."""
    G_ENVS = max(1, B // n)

    def kernel(cam_ref, quad_ref, q4_ref, p8_ref, rect_ref, score_ref,
               tq_ref, cq_ref, tmeta_ref, out_ref, idx, wxs, wys, gxs, gys):
        f32 = jnp.float32
        row = jax.lax.broadcasted_iota(jnp.int32, (H, WPAD), 0).astype(f32)
        col = jax.lax.broadcasted_iota(jnp.int32, (H, WPAD), 1).astype(f32)
        wx = (col + 0.5) * (C.WINDOW_W / W)      # pad lanes map past 1000
        wy = (H - 0.5 - row) * (C.WINDOW_H / H)
        wxs[:, :] = wx
        wys[:, :] = wy

        for b in range(B):
            _paint_view(
                b, (b // n) if G_ENVS > 1 else 0, warm,
                cam_ref, quad_ref, q4_ref, p8_ref, rect_ref, score_ref,
                tq_ref, cq_ref, tmeta_ref, out_ref,
                idx, wxs, wys, gxs, gys, wx, wy,
            )

    return kernel


def _paint_view(b, el, warm, cam_ref, quad_ref, q4_ref, p8_ref, rect_ref,
                score_ref, tq_ref, cq_ref, tmeta_ref, out_ref,
                idx, wxs, wys, gxs, gys, wx, wy):
    """Paint view b (track tables at env-local index el) into out_ref[b]."""
    # --- background: inverse camera -> world, grass + checker, white outside.
    ca = cam_ref[b, 0, 0]
    sa = cam_ref[b, 0, 1]
    tx = cam_ref[b, 0, 2]
    ty = cam_ref[b, 0, 3]
    inv_zoom = cam_ref[b, 0, 4]
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
    if "background" not in _ABLATE:
        base = jnp.full((H, WPAD), R.PAL_WHITE, jnp.int32)
        base = jnp.where(infield, R.PAL_GRASS_DARK, base)
        base = jnp.where(infield & lighter, R.PAL_GRASS_LIGHT, base)
        idx[:, :] = base
    else:
        idx[:, :] = jnp.zeros((H, WPAD), jnp.int32)

    warmup = cam_ref[b, 0, 5] > 0.0

    def paint_poly(vref, t, nedges, pal_i, act_i, r0_i, band=BAND):
        active = vref[b, t, act_i] > 0.0

        @pl.when(active)
        def _():
            r0 = vref[b, t, r0_i].astype(jnp.int32)
            wxb = wxs[pl.ds(r0, band), :]
            wyb = wys[pl.ds(r0, band), :]
            cov = None
            for e in range(nedges):
                c1 = vref[b, t, 3 * e]
                c2 = vref[b, t, 3 * e + 1]
                k0 = vref[b, t, 3 * e + 2]
                c = c2 * wyb - c1 * wxb + k0 >= 0.0
                cov = c if cov is None else cov & c
            pal = vref[b, t, pal_i].astype(jnp.int32)
            cur = idx[pl.ds(r0, band), :]
            idx[pl.ds(r0, band), :] = jnp.where(cov, pal, cur)

    # --- road tiles + curbs.
    # Steady state: windowed slots (banded). During the first-second
    # zoom-out: the FULL track painted in world space (creation order —
    # tile i then its curb, mcr:309-334), since the windows cover only the
    # tiles near the car while most of the track is visible.
    @pl.when(jnp.logical_not(warmup) & ("quads" not in _ABLATE))
    def _():
        def quad_body(t, _):
            paint_poly(quad_ref, t, 4, 12, 13, 14)
            return 0

        nq = cam_ref[b, 0, 6].astype(jnp.int32)   # active count (compacted)
        jax.lax.fori_loop(0, nq, quad_body, 0)

    if warm and "warmup" not in _ABLATE:
        _def_warm_branch = pl.when(warmup)
    else:
        # Steady-state kernel variant: the full-track refs are 1-row
        # dummies; skip tracing the branch entirely.
        _def_warm_branch = lambda f: None

    @_def_warm_branch
    def _warm_branch():
        gxb = gxs[:, :]
        gyb = gys[:, :]

        def lanes(x11):
            # Mosaic can't broadcast (1,1)->(H,WPAD) in one op ("broadcast in
            # both sublanes and lanes"); widen lanes first.
            return jnp.broadcast_to(x11, (1, WPAD))

        def world_quad(qrow, pal1, mask1):
            # qrow (1, 8) world verts; pal1/mask1 (1, 1) — everything stays
            # a vector (no scalar loads; VMEM scalars are SMEM-only in
            # Mosaic). Vertex form (not precomputed coefficients): the
            # (1,1)->(1,WPAD) broadcasts must feed a real vector op before
            # the (H,WPAD) multiply, or Mosaic folds them into an
            # unsupported both-axes broadcast.
            pos = neg = None
            for v in range(4):
                ax = lanes(qrow[:, 2 * v:2 * v + 1])
                ay = lanes(qrow[:, 2 * v + 1:2 * v + 2])
                nxt = (v + 1) % 4
                bx = lanes(qrow[:, 2 * nxt:2 * nxt + 1])
                by = lanes(qrow[:, 2 * nxt + 1:2 * nxt + 2])
                c1 = by - ay
                c2 = bx - ax
                k0 = c1 * ax - c2 * ay
                cr = c2 * gyb - c1 * gxb + k0
                p, q = cr >= 0.0, cr <= 0.0
                pos = p if pos is None else pos & p
                neg = q if neg is None else neg & q
            cov = (pos | neg) & (lanes(mask1) > 0.0)
            idx[:, :] = jnp.where(cov, lanes(pal1).astype(jnp.int32), idx[:, :])

        def far_body(t, _):
            meta = tmeta_ref[el, pl.ds(t, 1), :]       # (1, 4)
            world_quad(
                tq_ref[el, pl.ds(t, 1), :], meta[:, 0:1], meta[:, 2:3]
            )
            world_quad(
                cq_ref[el, pl.ds(t, 1), :], meta[:, 1:2], meta[:, 3:4]
            )
            return 0

        jax.lax.fori_loop(0, tq_ref.shape[1], far_body, 0)

    # --- cars (id order: 8 wheel/marker quads then 4 hull polys per car).
    # Car count is static from the table shapes.
    ncar = q4_ref.shape[1] // 8

    def q4_body(t, _):
        paint_poly(q4_ref, t, 4, 12, 13, 14, band=CAR_BAND)
        return 0

    def p8_body(t, _):
        paint_poly(p8_ref, t, 8, 24, 25, 26, band=CAR_BAND)
        return 0

    if "cars" not in _ABLATE:
        for car in range(ncar):
            jax.lax.fori_loop(8 * car, 8 * car + 8, q4_body, 0)
            jax.lax.fori_loop(4 * car, 4 * car + 4, p8_body, 0)

    # --- HUD rects.
    def rect_body(t, _):
        r0 = rect_ref[b, t, 6].astype(jnp.int32)
        wxb = wxs[pl.ds(r0, BAND), :]
        wyb = wys[pl.ds(r0, BAND), :]
        cov = (
            (wxb >= rect_ref[b, t, 0]) & (wxb <= rect_ref[b, t, 1])
            & (wyb >= rect_ref[b, t, 2]) & (wyb <= rect_ref[b, t, 3])
        )
        pal = rect_ref[b, t, 4].astype(jnp.int32)
        cur = idx[pl.ds(r0, BAND), :]
        idx[pl.ds(r0, BAND), :] = jnp.where(cov, pal, cur)
        return 0

    if "hud" not in _ABLATE:
        jax.lax.fori_loop(0, SR, rect_body, 0)

    # --- score glyphs (fixed 16-row band).
    r0 = H - 16
    wxb = wxs[pl.ds(r0, 16), :]
    wyb = wys[pl.ds(r0, 16), :]
    for i in range(4 if "score" not in _ABLATE else 0):
        dxg = (wxb - (G.SCORE_X + i * G.SCORE_SPACING)) / G.SCORE_DIGIT_W * 5.0
        dyg = (G.SCORE_Y + G.SCORE_DIGIT_H / 2 - wyb) / G.SCORE_DIGIT_H * 7.0
        gcol = jnp.floor(dxg)
        grow = jnp.floor(dyg)
        inbox = (gcol >= 0) & (gcol < 5) & (grow >= 0) & (grow < 7)
        rowbits = jnp.zeros((16, WPAD), jnp.int32)
        for rr in range(7):
            rowbits = jnp.where(grow == rr, score_ref[b, i, rr], rowbits)
        shift = jnp.clip(4 - gcol, 0, 4).astype(jnp.int32)
        on = inbox & (
            jnp.bitwise_and(rowbits, jnp.left_shift(1, shift)) > 0
        )
        cur = idx[pl.ds(r0, 16), :]
        idx[pl.ds(r0, 16), :] = jnp.where(on, R.PAL_WHITE, cur)

    # --- backwards flag triangle, LAST (mcr:668-674 paints it after the
    # HUD; its rows sit inside the black bar, so painting it before the
    # rects erased it — a pixel the oracle shows on every backward frame).
    if p8_ref.shape[1] > 4 * ncar and "flag" not in _ABLATE:
        paint_poly(p8_ref, 4 * ncar, 8, 24, 25, 26, band=CAR_BAND)

    # --- palette expansion in VMEM: idx plane -> 3 uint8 channel planes.
    # Doing this here (vs XLA on the int32 plane) avoids ~17 HBM passes over
    # the batched plane (measured 2.2 ms at 2048 views).
    plane = idx[:, :]
    if "palette" in _ABLATE:
        for ch in range(3):
            out_ref[b, ch, :, :] = plane.astype(jnp.uint8)
    else:
        for ch in range(3):
            chan = jnp.full((H, WPAD), int(R.PALETTE_U8[0, ch]), jnp.int32)
            for c in range(1, R.PALETTE_U8.shape[0]):
                val = int(R.PALETTE_U8[c, ch])
                if val != int(R.PALETTE_U8[0, ch]):
                    chan = jnp.where(plane == c, val, chan)
            out_ref[b, ch, :, :] = chan.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_pixels(cfg, state, interpret: bool = False):
    """Batched EnvState (E, ...) -> (E, N, 96, 96, 3) uint8 via the kernel.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    n = cfg.num_agents
    cam, quads, quad4, poly8, rects, score = jax.vmap(
        lambda s: _view_inputs(cfg, s, n)
    )(state)
    E = cam.shape[0]
    V = E * n
    mt = state.track.max_tiles

    def flat(x):
        return x.reshape((V,) + x.shape[2:])

    cam, quads, quad4, poly8, rects, score = map(
        flat, (cam, quads, quad4, poly8, rects, score)
    )
    s4, s8 = quad4.shape[1], poly8.shape[1]

    # Views per program (B): per-program fixed costs (DMA latency, plane
    # setup) amortize over B views; views of one env share its track-table
    # block. Default 8 (measure: MCR_RASTER_VPB). B must be a multiple of
    # n and divide V.
    B = int(os.environ.get("MCR_RASTER_VPB", "8"))
    B = max(n, (B // n) * n)
    while V % B:
        B -= n
    B = max(B, n)
    genv = B // n

    views = (cam, quads, quad4, poly8, rects, score)

    def call(warm, vws, tq, cq, tmeta):
        cam_, quads_, quad4_, poly8_, rects_, score_ = vws
        v_ = cam_.shape[0]
        b_ = B
        while v_ % b_:
            b_ -= n
        b_ = max(b_, n)
        genv = b_ // n
        trows = tq.shape[1]

        def env_spec(rows, width):
            # Per-program track block: G envs, view b reads env b // n.
            return pl.BlockSpec(
                (genv, rows, width), lambda v: (v, 0, 0),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            )

        return pl.pallas_call(
            _make_kernel(b_, n, warm),
            out_shape=jax.ShapeDtypeStruct((v_, 3, H, WPAD), jnp.uint8),
            grid=(v_ // b_,),
            in_specs=[
                pl.BlockSpec((b_, 1, 8), lambda v: (v, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((b_, SQ, 16), lambda v: (v, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((b_, s4, 16), lambda v: (v, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((b_, s8, 28), lambda v: (v, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((b_, SR, 8), lambda v: (v, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((b_, 4, 8), lambda v: (v, 0, 0),
                             memory_space=pltpu.SMEM),
                env_spec(trows, 8),
                env_spec(trows, 8),
                env_spec(trows, 4),
            ],
            out_specs=pl.BlockSpec((b_, 3, H, WPAD), lambda v: (v, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((H, WPAD), jnp.int32),
                pltpu.VMEM((H, WPAD), jnp.float32),
                pltpu.VMEM((H, WPAD), jnp.float32),
                pltpu.VMEM((H, WPAD), jnp.float32),
                pltpu.VMEM((H, WPAD), jnp.float32),
            ],
            interpret=interpret,
        )(cam_, quads_, quad4_, poly8_, rects_, score_, tq, cq, tmeta)

    # The full-track tables feed ONLY the zoom-out branch. Build (and pay
    # the layout copies + per-program DMA for) them only for envs that are
    # still zooming — in steady state the cond's other branch passes 1-row
    # dummies and a kernel compiled without the branch.
    def warm_tables(sel):
        track = state.track
        f32, i32 = jnp.float32, jnp.int32
        quad, curb_quad, touched, curb_red, valid, has_curb = (
            track.quad, track.curb_quad, state.tile_touched,
            track.curb_red, track.valid, track.has_curb,
        )
        if sel is not None:
            quad, curb_quad, touched, curb_red, valid, has_curb = (
                x[sel]
                for x in (quad, curb_quad, touched, curb_red, valid, has_curb)
            )
        e = quad.shape[0]
        tq = quad.reshape(e, mt, 8).astype(f32)
        cq = curb_quad.reshape(e, mt, 8).astype(f32)
        tile_pal = jnp.where(
            touched, jnp.asarray(R.PAL_ROAD0, i32),
            (R.PAL_ROAD0 + jnp.mod(jnp.arange(mt), 3)).astype(i32)[None, :],
        )
        curb_pal = jnp.where(
            curb_red, jnp.asarray(R.PAL_RED, i32),
            jnp.asarray(R.PAL_WHITE, i32),
        )
        tmeta = jnp.stack(
            [tile_pal.astype(f32), curb_pal.astype(f32),
             valid.astype(f32), has_curb.astype(f32)],
            axis=-1,
        )                                                    # (e, MT, 4)
        return tq, cq, tmeta

    def steady_call(_):
        z8 = jnp.zeros((E, 1, 8), jnp.float32)
        z4 = jnp.zeros((E, 1, 4), jnp.float32)
        return call(False, views, z8, z8, z4)

    def warm_call(_):
        return call(True, views, *warm_tables(None))

    # Zoom is a function of the per-env clock, so warm is per-ENV (every
    # view of an env shares it). A batch-wide any-warm cond would send the
    # WHOLE batch down the ~35x-cost full-track path whenever ANY env is in
    # its first-second zoom-out — under training autoreset (staggered
    # episode clocks) that is essentially every step, which is what capped
    # pixel PPO at ~6.5k env-steps/s in round 3. Instead: compact the warm
    # envs (<= cap of them) into a sub-batch for the warm kernel, run
    # everyone through the steady kernel, and overwrite the warm views.
    # Exact at any cap: a steady view through the warm kernel takes the
    # per-view non-warmup branch (same paint), pad slots duplicate env 0's
    # views with identical values, and lax.cond falls back to the full warm
    # path when more than cap envs are warm (e.g. right after a mass reset).
    warm_env = cam.reshape(E, n, 1, 8)[:, 0, 0, 5] > 0.0      # (E,)
    explicit_cap = os.environ.get("MCR_RASTER_WARM_CAP")
    cap = int(explicit_cap) if explicit_cap else max(1, E // 8)
    if 0 < cap < E and (E >= 64 or explicit_cap):
        n_warm = jnp.sum(warm_env)
        pos = jnp.cumsum(warm_env) - 1
        slot = jnp.where(warm_env, pos, cap).astype(jnp.int32)
        sub = jnp.zeros((cap,), jnp.int32).at[slot].set(
            jnp.arange(E, dtype=jnp.int32), mode="drop"
        )
        vidx = (
            sub[:, None] * n + jnp.arange(n, dtype=jnp.int32)[None, :]
        ).reshape(-1)

        def part(_):
            steady = steady_call(None)
            sub_views = tuple(v[vidx] for v in views)
            wout = call(True, sub_views, *warm_tables(sub))
            return steady.at[vidx].set(wout)

        out = jax.lax.cond(
            n_warm == 0,
            steady_call,
            lambda _: jax.lax.cond(n_warm <= cap, part, warm_call, None),
            None,
        )
    else:
        out = jax.lax.cond(jnp.any(warm_env), warm_call, steady_call, None)

    # Crop pad lanes, channels-last.
    img = jnp.transpose(out[:, :, :, :W], (0, 2, 3, 1))
    return img.reshape(E, n, H, W, 3)
