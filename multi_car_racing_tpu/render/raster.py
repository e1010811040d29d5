"""Production rasterizer: windowed palette painter, pixels-last, jit/vmap.

Same scene semantics as render/xla_raster.py (the oracle), engineered around
the two TPU walls measured on the naive forms:

1. *Lane occupancy*: pixels are a flat last dimension; per-channel planes
   would still be fine, but see (2).
2. *HBM bandwidth*: a painter that rewrites an RGB f32 image per layer moves
   ~145 GB/step at 4096x2 views (measured 218 ms). Instead we paint a single
   *palette-index* plane (int32: uint8 where-chains measured 6x slower on the
   VPU) and expand indices to RGB once at the end. Every scene color lives in
   one static palette (road dither levels included), so the final uint8 image
   is bit-identical to the oracle's. This XLA form is still bandwidth-bound;
   the Pallas kernel (pallas_raster.py) keeps the plane in VMEM and is the
   production path on TPU.

Track tiles are windowed per view in the steady state (two windows cover
crossing sections, merged ascending = creation/paint order). During the
first-second zoom-out (mcr:540) the windows would miss far track segments,
so a ``lax.cond`` switches to an exact FULL-track pass: chunked
priority-max painting in world space, where key = (creation-order priority
<< 5) | palette reproduces painter's overdraw without sequential writes.
Unbatched callers (the gym facade) pay the full pass only on real warmup
frames; under vmap both branches run (fallback path only — the Pallas
kernel is the production TPU rasterizer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from . import geometry as G

W1 = 32   # primary tile window
W2 = 8    # secondary window (crossing sections)
WS = W1 + W2

# ---------------------------------------------------------------------------
# Static palette: every color the scene can produce.
# ---------------------------------------------------------------------------
PAL_WHITE = 0        # clear color / curb white / HUD white / score
PAL_GRASS_DARK = 1
PAL_GRASS_LIGHT = 2
PAL_ROAD0 = 3        # road + 0.00 dither == flattened "touched" color
PAL_ROAD1 = 4
PAL_ROAD2 = 5
PAL_RED = 6          # curb red / gyro bar red
PAL_BLACK = 7        # wheel / HUD bar black
PAL_WHEEL_WHITE = 8
PAL_CAR0 = 9         # 8 car colors: 9..16 (CAR_COLORS; ego red/blue reuse 9/10)
PAL_ABS_BLUE = 17    # (0, 0, 1): ABS bars front, backwards flag
PAL_ABS_BLUE2 = 18   # (0.2, 0, 1): ABS bars rear
PAL_GREEN = 19       # steering bar
PAL_MUD = 20         # skid particles on grass (rgb_array mode, future)

PALETTE = np.array(
    [
        (1.0, 1.0, 1.0),
        (0.4, 0.8, 0.4),
        (0.4, 0.9, 0.4),
        (0.4, 0.4, 0.4),
        (0.41, 0.41, 0.41),
        (0.42, 0.42, 0.42),
        (1.0, 0.0, 0.0),
        (0.0, 0.0, 0.0),
        C.WHEEL_WHITE,
    ]
    + list(C.CAR_COLORS)
    + [
        (0.0, 0.0, 1.0),
        (0.2, 0.0, 1.0),
        (0.0, 1.0, 0.0),
        C.MUD_COLOR,
    ],
    dtype=np.float32,
)
PALETTE_U8 = np.round(np.clip(PALETTE, 0, 1) * 255).astype(np.uint8)


def _window_indices(track, centers, w1: int, w2: int):
    """Two tile windows around each view's camera center, merged ascending
    (= canonical creation/paint order). centers (V, 2) -> (V, w1+w2) int32."""
    d2 = jnp.sum(jnp.square(centers[:, None, :] - track.xy[None]), axis=-1)
    d2 = jnp.where(track.valid[None], d2, jnp.inf)
    near1 = jnp.argmin(d2, axis=1).astype(jnp.int32)
    n = track.n_tiles
    s1 = jnp.mod(near1 - w1 // 2, n)
    off = jnp.mod(
        jnp.arange(track.max_tiles, dtype=jnp.int32)[None, :] - s1[:, None], n
    )
    d2b = jnp.where(off < w1, jnp.inf, d2)
    near2 = jnp.argmin(d2b, axis=1).astype(jnp.int32)
    s2 = jnp.mod(near2 - w2 // 2, n)
    i1 = jnp.mod(s1[:, None] + jnp.arange(w1, dtype=jnp.int32)[None], n)
    i2 = jnp.mod(s2[:, None] + jnp.arange(w2, dtype=jnp.int32)[None], n)
    return jnp.sort(jnp.concatenate([i1, i2], axis=1), axis=1)


def _paint_track_world(track, tile_pal, curb_pal, gx, gy, idx, chunk: int = 32):
    """Exact full-track painting in world coordinates via priority-max.

    Sequential painter order (tile i, then curb i, ascending i — mcr:309-334)
    is reproduced by encoding key = (order << 5) | palette per covering quad
    and taking the pixel-wise max: the last-painted quad has the highest
    order, and palettes (< 32) never disturb the order comparison. Chunked
    fori_loop keeps the graph small and intermediates (N, chunk, P) bounded.
    """
    mt = track.max_tiles
    n_chunks = -(-mt // chunk)
    i32 = jnp.int32

    def cov_world(quad):
        # quad (T, 4, 2) world verts -> (N, T, P) bool coverage.
        pos = neg = None
        for v in range(4):
            ax = quad[None, :, v, 0, None]
            ay = quad[None, :, v, 1, None]
            bx = quad[None, :, (v + 1) % 4, 0, None]
            by = quad[None, :, (v + 1) % 4, 1, None]
            cr = (bx - ax) * (gy[:, None, :] - ay) - (by - ay) * (gx[:, None, :] - ax)
            p, q = cr >= 0, cr <= 0
            pos = p if pos is None else pos & p
            neg = q if neg is None else neg & q
        return pos | neg

    def body(c, best):
        # Modular indexing: a final partial chunk re-reads leading tiles with
        # their ORIGINAL ids, so duplicate keys are identical and max-idempotent.
        ids = jnp.mod(c * chunk + jnp.arange(chunk, dtype=i32), mt)

        def sl(x):
            return jnp.take(x, ids, axis=0)

        tid = ids[None, :, None]
        keyt = jnp.where(
            cov_world(sl(track.quad)) & sl(track.valid)[None, :, None],
            ((2 * tid + 1) << 5) | sl(tile_pal)[None, :, None], 0,
        )
        keyc = jnp.where(
            cov_world(sl(track.curb_quad)) & sl(track.has_curb)[None, :, None],
            ((2 * tid + 2) << 5) | sl(curb_pal)[None, :, None], 0,
        )
        return jnp.maximum(best, jnp.maximum(keyt.max(1), keyc.max(1)))

    best = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros_like(idx))
    return jnp.where(best > 0, jnp.bitwise_and(best, 31), idx)


def render_observation(cfg, state, vp_w: int = C.STATE_W, vp_h: int = C.STATE_H,
                       draw_particles: bool = False):
    """All agent views of one env -> (N, vp_h, vp_w, 3) uint8. vmap over E.

    ``draw_particles`` overlays skid trails (requires cfg.track_skid state;
    the reference draws them only in non-state_pixels modes, mcr:564)."""
    n = cfg.num_agents
    track = state.track
    f32 = jnp.float32
    u8 = jnp.int32  # palette plane dtype: int32 is VPU-native (uint8 where-chains measured 6x slower)

    zoom, angles, trans = G.camera(cfg, state)                  # (), (N,), (N,2)
    wx, wy = G.pixel_window_coords(vp_w, vp_h)                  # (H, W)
    px = wx.reshape(-1)[None, :]                                # (1, P)
    py = wy.reshape(-1)[None, :]
    P = px.shape[1]

    # ---- background (white / grass / checker) per view.
    gx, gy = G.window_to_world(px, py, zoom, angles[:, None], trans[:, None, :])
    k = C.PLAYFIELD / 20.0
    ix, iy = jnp.floor(gx / k), jnp.floor(gy / k)
    infield = (jnp.abs(gx) <= C.PLAYFIELD) & (jnp.abs(gy) <= C.PLAYFIELD)
    lighter = (
        (jnp.mod(ix, 2) == 0) & (jnp.mod(iy, 2) == 0)
        & (ix >= -20) & (ix < 20) & (iy >= -20) & (iy < 20)
    )
    idx = jnp.full((n, P), PAL_WHITE, u8)
    idx = jnp.where(infield, jnp.asarray(PAL_GRASS_DARK, u8), idx)
    idx = jnp.where(infield & lighter, jnp.asarray(PAL_GRASS_LIGHT, u8), idx)

    # ---- windowed road tiles + curbs.
    ccx, ccy = G.window_to_world(
        jnp.full((n,), C.WINDOW_W / 2, f32), jnp.full((n,), C.WINDOW_H / 2, f32),
        zoom, angles, trans,
    )
    widx = _window_indices(track, jnp.stack([ccx, ccy], -1), W1, W2)   # (N, WS)

    tile_pal = jnp.where(
        state.tile_touched,
        jnp.asarray(PAL_ROAD0, u8),
        (PAL_ROAD0 + jnp.mod(jnp.arange(track.max_tiles), 3)).astype(u8),
    )
    curb_pal = jnp.where(
        track.curb_red, jnp.asarray(PAL_RED, u8), jnp.asarray(PAL_WHITE, u8)
    )

    def to_win(pts, extra_dims):
        return G.world_to_window(
            pts, zoom,
            angles.reshape((n,) + (1,) * extra_dims),
            trans.reshape((n,) + (1,) * extra_dims + (2,)),
        )

    tqw = to_win(jnp.take(track.quad, widx, axis=0), 2)          # (N, WS, 4, 2)
    cqw = to_win(jnp.take(track.curb_quad, widx, axis=0), 2)
    tp = jnp.take(tile_pal, widx, axis=0)                        # (N, WS) u8
    cp = jnp.take(curb_pal, widx, axis=0)
    tv = jnp.take(track.valid, widx, axis=0)                     # (N, WS)
    cv = jnp.take(track.has_curb, widx, axis=0)

    def quad_cov(quad):
        """quad (N, 4, 2) window verts -> (N, P) bool coverage."""
        pos = neg = None
        for v in range(4):
            ax, ay = quad[:, v, 0:1], quad[:, v, 1:2]
            bx, by = quad[:, (v + 1) % 4, 0:1], quad[:, (v + 1) % 4, 1:2]
            cr = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            p, q = cr >= 0, cr <= 0
            pos = p if pos is None else pos & p
            neg = q if neg is None else neg & q
        return pos | neg

    def poly_cov8(poly):
        pos = neg = None
        for v in range(8):
            ax, ay = poly[:, v, 0:1], poly[:, v, 1:2]
            bx, by = poly[:, (v + 1) % 8, 0:1], poly[:, (v + 1) % 8, 1:2]
            cr = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            p, q = cr >= 0, cr <= 0
            pos = p if pos is None else pos & p
            neg = q if neg is None else neg & q
        return pos | neg

    def paint_windowed(idx):
        for slot in range(WS):
            cov_t = quad_cov(tqw[:, slot]) & tv[:, slot:slot + 1]
            cov_c = quad_cov(cqw[:, slot]) & cv[:, slot:slot + 1]
            idx = jnp.where(cov_t, tp[:, slot:slot + 1], idx)
            idx = jnp.where(cov_c, cp[:, slot:slot + 1], idx)
        return idx

    def paint_full(idx):
        return _paint_track_world(track, tile_pal, curb_pal, gx, gy, idx)

    # First-second zoom-out (mcr:540): the camera sees far past the windows —
    # switch to the exact full-track pass for those frames.
    warm = zoom < 0.999 * C.ZOOM * C.SCALE
    idx = jax.lax.cond(warm, paint_full, paint_windowed, idx)

    # ---- skid trails (under the cars, like the reference's draw order).
    if draw_particles:
        from . import particles as PT

        S = state.skid.seg.shape[0] * state.skid.seg.shape[1]
        seg_flat = state.skid.seg.reshape(S, 4)
        pa = to_win(jnp.broadcast_to(seg_flat[None, :, 0:2], (n, S, 2)), 1)
        pb = to_win(jnp.broadcast_to(seg_flat[None, :, 2:4], (n, S, 2)), 1)
        grassf = state.skid.grass.reshape(S)
        validf = state.skid.valid.reshape(S)
        dxs = pb[..., 0] - pa[..., 0]
        dys = pb[..., 1] - pa[..., 1]
        len2 = dxs * dxs + dys * dys
        # (n, S, P) point-segment distances, half-width 1 window px.
        tpar = jnp.clip(
            ((px[:, None, :] - pa[..., 0:1]) * dxs[..., None]
             + (py[:, None, :] - pa[..., 1:2]) * dys[..., None])
            / jnp.maximum(len2[..., None], 1e-9),
            0.0, 1.0,
        )
        cxs = pa[..., 0:1] + tpar * dxs[..., None]
        cys = pa[..., 1:2] + tpar * dys[..., None]
        d2 = (px[:, None, :] - cxs) ** 2 + (py[:, None, :] - cys) ** 2
        hw = max(1.0, 0.6 * C.WINDOW_W / vp_w)   # >= ~1 obs pixel visible
        covp = (d2 <= hw * hw) & validf[None, :, None]
        cov_black = (covp & ~grassf[None, :, None]).any(1)
        cov_mud = (covp & grassf[None, :, None]).any(1)
        idx = jnp.where(cov_black, jnp.asarray(PAL_BLACK, u8), idx)
        idx = jnp.where(cov_mud, jnp.asarray(PAL_MUD, u8), idx)

    # ---- cars (id order: wheels+markers then hull fixtures).
    polys = G.car_polys_world(state.cars)
    # Palette index per (view, car) hull color.
    if cfg.use_ego_color:
        hull_pal_np = np.full((n, n), PAL_CAR0 + 1, np.int32)   # blue
        np.fill_diagonal(hull_pal_np, PAL_CAR0)                 # ego red
    else:
        hull_pal_np = np.tile(
            (PAL_CAR0 + np.arange(n) % len(C.CAR_COLORS)).astype(np.int32), (n, 1)
        )
    hull_pal = jnp.asarray(hull_pal_np)

    def bview(poly):  # world poly (V, 2) -> per-view window (N, V, 2)
        return to_win(jnp.broadcast_to(poly[None], (n,) + poly.shape), 1)

    for car in range(n):
        for w in range(4):
            cov_w = quad_cov(bview(polys["wheel_quads"][car, w]))
            idx = jnp.where(cov_w, jnp.asarray(PAL_BLACK, u8), idx)
            mcov = quad_cov(bview(polys["marker_quads"][car, w]))
            mcov = mcov & polys["marker_valid"][car, w]
            idx = jnp.where(mcov, jnp.asarray(PAL_WHEEL_WHITE, u8), idx)
        for hp in range(4):
            cov_h = poly_cov8(bview(polys["hull_polys"][car, hp]))
            idx = jnp.where(cov_h, hull_pal[:, car:car + 1], idx)

    # ---- HUD (window coordinates).
    hud = G.hud_values(state)
    s, h = G.HUD_S, G.HUD_H

    def rect_cov(x0, x1, y0, y1):
        xa, xb = jnp.minimum(x0, x1), jnp.maximum(x0, x1)
        ya, yb = jnp.minimum(y0, y1), jnp.maximum(y0, y1)
        return (px >= xa) & (px <= xb) & (py >= ya) & (py <= yb)

    o = jnp.ones((n, 1), f32)
    idx = jnp.where(
        rect_cov(0.0 * o, C.WINDOW_W * o, 0.0 * o, 5 * h * o),
        jnp.asarray(PAL_BLACK, u8), idx,
    )
    for place, val, pal in (
        (5, hud["speed"], PAL_WHITE),
        (7, hud["abs0"], PAL_ABS_BLUE),
        (8, hud["abs1"], PAL_ABS_BLUE),
        (9, hud["abs2"], PAL_ABS_BLUE2),
        (10, hud["abs3"], PAL_ABS_BLUE2),
    ):
        cov = rect_cov(place * s * o, (place + 1) * s * o, h * o,
                       (h + h * val)[:, None])
        idx = jnp.where(cov, jnp.asarray(pal, u8), idx)
    for place, val, pal in (
        (20, hud["steer"], PAL_GREEN),
        (30, hud["gyro"], PAL_RED),
    ):
        cov = rect_cov(place * s * o, (place * s + val * s)[:, None],
                       2 * h * o, 4 * h * o)
        idx = jnp.where(cov, jnp.asarray(pal, u8), idx)

    # ---- score digits ("%04i", approximate 5x7 glyphs at the label box).
    sc = jnp.clip(jnp.trunc(state.reward), -999, 9999).astype(jnp.int32)  # (N,)
    neg = sc < 0
    a = jnp.abs(sc)
    digits = jnp.stack([a // 1000 % 10, a // 100 % 10, a // 10 % 10, a % 10], 1)
    font = jnp.asarray(
        np.concatenate([G.DIGIT_FONT, [[0, 0, 0, 0b11111, 0, 0, 0]]]), jnp.int32
    )
    chars = digits.at[:, 0].set(jnp.where(neg, 10, digits[:, 0]))   # (N, 4)
    for i in range(4):
        dx = (px - (G.SCORE_X + i * G.SCORE_SPACING)) / G.SCORE_DIGIT_W * 5.0
        dy = (G.SCORE_Y + G.SCORE_DIGIT_H / 2 - py) / G.SCORE_DIGIT_H * 7.0
        col = jnp.floor(dx).astype(jnp.int32)
        row = jnp.floor(dy).astype(jnp.int32)
        inbox = (col >= 0) & (col < 5) & (row >= 0) & (row < 7)
        oh = (chars[:, i:i + 1] == jnp.arange(font.shape[0])[None]).astype(jnp.int32)
        bits_iv = oh @ font                                      # (N, 7)
        rowbits = jnp.zeros_like(col)
        for rr in range(7):
            rowbits = jnp.where(row == rr, bits_iv[:, rr:rr + 1], rowbits)
        on = inbox & (
            jnp.bitwise_and(rowbits, jnp.left_shift(1, 4 - jnp.clip(col, 0, 4))) > 0
        )
        idx = jnp.where(on, jnp.asarray(PAL_WHITE, u8), idx)

    # ---- backwards flag triangle (painted last, mcr:668-674).
    if cfg.backwards_flag:
        tri = jnp.asarray(
            [[C.WINDOW_W - 100, 30], [C.WINDOW_W - 75, 70],
             [C.WINDOW_W - 50, 30]],
            f32,
        )
        tri8 = jnp.concatenate([tri, jnp.broadcast_to(tri[2:3], (5, 2))], 0)
        cov = poly_cov8(jnp.broadcast_to(tri8[None], (n, 8, 2)))
        idx = jnp.where(
            cov & hud["backward"][:, None], jnp.asarray(PAL_ABS_BLUE, u8), idx
        )

    # ---- palette expansion: uint8 indices -> RGB (one pass).
    kk = PALETTE_U8.shape[0]
    r = g = b = jnp.zeros(idx.shape, jnp.uint8)
    for c in range(kk):
        m = idx == c
        r = jnp.where(m, jnp.asarray(PALETTE_U8[c, 0], jnp.uint8), r)
        g = jnp.where(m, jnp.asarray(PALETTE_U8[c, 1], jnp.uint8), g)
        b = jnp.where(m, jnp.asarray(PALETTE_U8[c, 2], jnp.uint8), b)
    img = jnp.stack([r, g, b], axis=-1)
    return img.reshape(n, vp_h, vp_w, 3)
