"""Fused Pallas TPU kernel for the per-step track passes.

Round-1 profile (docs/PERF.md): after the physics mega-kernel, the
remaining ~2 ms/step at 4096x2 envs was three separate XLA sweeps over the
(E, N*4, MT) wheel-vs-tile space — the SAT contact pass (~1.0 ms), the
post-step track analysis (~0.6 ms) and the visit-reward engine (~0.4 ms) —
each re-reading the per-env track tables from HBM with big boolean
intermediates in between. This kernel does all of it in ONE sweep with the
tables VMEM-resident:

- wheel-rect vs tile SAT (physics/overlap.wheel_tile_overlap semantics:
  6 axes, analytic support radius) -> lagged friction mask for the next
  step (cd:180-186),
- FrictionDetector visit bookkeeping (mcr:110-120): new-visit mask,
  first/second-visitor factors (car-id tie-break), per-car bonus,
- render "touched" flattening incl. hull-center-in-tile (mcr:102-104),
- post-step analysis on the post-solve pose (mcr:446-495): nearest-tile
  heading (argmin over the centerline) and the on-grass flag
  (hull center inside any road/curb quad; env._post_step).

Layout: env-major blocks (eb envs per program, fori_loop inside); per env
the working set is (4N wheels x MT tiles) with wheels on sublanes and tiles
on lanes — full VPU occupancy with zero table transposes: the (4, 2, MT)
tiles-last tables the Track already stores reshape (bitcast) to (8, MT)
slabs. The arithmetic mirrors physics/overlap.py and env._post_step
term-for-term so results match the XLA path to float-accumulation noise
(tests/test_track_engine.py runs both on CPU, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config as C

_HX = float(C.WHEEL_W * C.SIZE)     # wheel rect half-width (side axis)
_HY = float(C.WHEEL_R * C.SIZE)     # wheel rect half-height (forward axis)
_MARGIN = float(C.SENSOR_OVERLAP_MARGIN)
_BIG = 1.0e30


def _eb_for(E: int) -> int:
    for eb in (32, 16, 8, 4, 2, 1):
        if E % eb == 0:
            return eb
    return 1


def _make_kernel(num_agents: int, eb: int, mt: int):
    N = num_agents
    W = 4 * N

    def kernel(quad_ref, ax_ref, lohi_ref, curb_ref, misc_ref, ws_ref,
               ho_ref, vis_ref, tt_ref,
               won_out, car_out, vis_out, tt_out):
        def body(e, _):
            Q = quad_ref[e]          # (8, MT)  v*2+c rows of quad_T
            AX = ax_ref[e]           # (8, MT)  a*2+c rows of quad_ax_T
            LH = lohi_ref[e]         # (8, MT)  rows 0-3 lo, 4-7 hi
            MS = misc_ref[e]         # (4, MT)  rows x, y, beta, valid
            WS = ws_ref[e]           # (W, 8)   cols cx cy fx fy sx sy
            HO = ho_ref[e]           # (N, 8)   cols pre_ox pre_oy post_ox
                                     #          post_oy n_tiles
            VIS = vis_ref[e]         # (N, MT)  visited (0/1)
            TT = tt_ref[e]           # (1, MT)  touched (0/1)

            cx, cy = WS[:, 0:1], WS[:, 1:2]
            fx, fy = WS[:, 2:3], WS[:, 3:4]
            sx, sy = WS[:, 4:5], WS[:, 5:6]

            # --- SAT (overlap.wheel_tile_overlap term-for-term) ----------
            sep = None
            for axx, axy, h in ((sx, sy, _HX), (fx, fy, _HY)):
                cp = cx * axx + cy * axy                     # (W, 1)
                lo_b = hi_b = None
                for v in range(4):
                    qx = Q[2 * v:2 * v + 1, :]               # (1, MT)
                    qy = Q[2 * v + 1:2 * v + 2, :]
                    p = axx * qx + axy * qy                  # (W, MT)
                    lo_b = p if lo_b is None else jnp.minimum(lo_b, p)
                    hi_b = p if hi_b is None else jnp.maximum(hi_b, p)
                g = jnp.maximum(lo_b - (cp + h), (cp - h) - hi_b)
                sep = g if sep is None else jnp.maximum(sep, g)
            for a in range(4):
                axx = AX[2 * a:2 * a + 1, :]                 # (1, MT)
                axy = AX[2 * a + 1:2 * a + 2, :]
                cp = cx * axx + cy * axy                     # (W, MT)
                sp = sx * axx + sy * axy
                fp = fx * axx + fy * axy
                r = _HX * jnp.abs(sp) + _HY * jnp.abs(fp)
                g = jnp.maximum(
                    LH[a:a + 1, :] - (cp + r), (cp - r) - LH[4 + a:4 + a + 1, :]
                )
                sep = jnp.maximum(sep, g)
            wheel_ov = (sep < _MARGIN).astype(jnp.float32)   # (W, MT)

            won_out[e] = jnp.max(wheel_ov, axis=1, keepdims=True)  # (W, 1)

            # car_tile: OR over each car's 4 wheels (wheel row = n*4 + k).
            # Static contiguous slices only — a strided wheel_ov[0::4] lowers
            # to a Mosaic gather that the TPU backend rejects.
            car_rows = [
                jnp.max(wheel_ov[4 * n:4 * n + 4, :], axis=0, keepdims=True)
                for n in range(N)
            ]
            car_tile = (
                jnp.concatenate(car_rows, axis=0) if N > 1 else car_rows[0]
            )                                                # (N, MT)

            # --- hull-center point-in-quad (pre pose) for "touched" ------
            def point_in(px, py, T):                         # (N,1),(N,1),(8,MT)
                pos = neg = None
                for v in range(4):
                    ax_ = T[2 * v:2 * v + 1, :]
                    ay_ = T[2 * v + 1:2 * v + 2, :]
                    w = (v + 1) % 4
                    bx_ = T[2 * w:2 * w + 1, :]
                    by_ = T[2 * w + 1:2 * w + 2, :]
                    cr = (bx_ - ax_) * (py - ay_) - (by_ - ay_) * (px - ax_)
                    p, q = cr > 0, cr < 0
                    pos = p if pos is None else pos & p
                    neg = q if neg is None else neg & q
                return (pos | neg).astype(jnp.float32)       # (N, MT)

            hull_in = point_in(HO[:, 0:1], HO[:, 1:2], Q)
            touched = jnp.max(
                jnp.maximum(car_tile, hull_in), axis=0, keepdims=True
            )                                                # (1, MT)
            tt_out[e] = jnp.maximum(TT, touched)

            # --- visit rewards (env._visit_rewards) ----------------------
            valid = MS[3:4, :]                               # (1, MT)
            new = car_tile * (1.0 - VIS) * valid             # (N, MT)
            prev_count = jnp.sum(VIS, axis=0, keepdims=True)
            # Exclusive cumsum over cars (car-id tie-break), N small.
            rank = jnp.zeros_like(new)
            acc = jnp.zeros_like(prev_count)
            rows = []
            for n in range(N):
                rows.append(acc)
                acc = acc + new[n:n + 1, :]
            rank = jnp.concatenate(rows, axis=0) if N > 1 else rank
            past = prev_count + rank
            factor = 1.0 - past / float(N)
            n_tiles = HO[0:1, 4:5]                           # (1, 1)
            tile_bonus = 1000.0 / n_tiles
            bonus = jnp.sum(new * factor, axis=1, keepdims=True) * tile_bonus
            vis_out[e] = jnp.maximum(VIS, new)
            cnt = jnp.sum(new, axis=1, keepdims=True)        # (N, 1)

            # --- post-step analysis on the post-solve pose ---------------
            ox, oy = HO[:, 2:3], HO[:, 3:4]                  # (N, 1)
            X, Y = MS[0:1, :], MS[1:2, :]
            beta = MS[2:3, :]
            d2 = jnp.square(ox - X) + jnp.square(oy - Y)     # (N, MT)
            d2 = jnp.where(valid > 0, d2, _BIG)
            m = jnp.min(d2, axis=1, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, (N, mt), 1)
            idx = jnp.min(
                jnp.where(d2 == m, iota, mt), axis=1, keepdims=True
            )                                                # first argmin
            nbeta = jnp.sum(
                jnp.where(iota == idx, beta, 0.0), axis=1, keepdims=True
            )
            road_in = point_in(ox, oy, Q)
            curb_in = point_in(ox, oy, curb_ref[e])
            on_grass = 1.0 - jnp.max(
                jnp.maximum(road_in, curb_in), axis=1, keepdims=True
            )

            car_out[e] = jnp.concatenate(
                [bonus, cnt, nbeta, on_grass,
                 jnp.zeros((N, 4), jnp.float32)], axis=1
            )                                                # (N, 8)
            return 0

        jax.lax.fori_loop(0, eb, body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_agents", "interpret")
)
def track_pass_batched(
    quad_T,        # (E, 4, 2, MT) f32
    quad_ax_T,     # (E, 4, 2, MT) f32
    quad_lo,       # (E, 4, MT) f32
    quad_hi,       # (E, 4, MT) f32
    curb_quad_T,   # (E, 4, 2, MT) f32
    xy,            # (E, MT, 2) f32
    beta,          # (E, MT) f32
    valid,         # (E, MT) bool
    n_tiles,       # (E,) int32
    wheel_c,       # (E, N, 4, 2) f32 — PRE-solve pose
    forw,          # (E, N, 4, 2)
    side,          # (E, N, 4, 2)
    pre_origin,    # (E, N, 2) — PRE-solve hull origin (touched flattening)
    post_origin,   # (E, N, 2) — POST-solve hull origin (nearest/grass)
    visited,       # (E, N, MT) bool
    tile_touched,  # (E, MT) bool
    num_agents: int,
    interpret: bool = False,
):
    """Returns (wheel_on_road (E,N,4) bool, visited' (E,N,MT) bool,
    bonus (E,N) f32, count_delta (E,N) int32, tile_touched' (E,MT) bool,
    nearest_beta (E,N) f32, on_grass (E,N) bool)."""
    E, N = wheel_c.shape[0], num_agents
    MT = beta.shape[1]
    W = 4 * N
    f32 = jnp.float32

    quad8 = quad_T.reshape(E, 8, MT)
    ax8 = quad_ax_T.reshape(E, 8, MT)
    lohi = jnp.concatenate([quad_lo, quad_hi], axis=1)          # (E, 8, MT)
    curb8 = curb_quad_T.reshape(E, 8, MT)
    misc = jnp.concatenate(
        [jnp.swapaxes(xy, 1, 2), beta[:, None, :],
         valid.astype(f32)[:, None, :]], axis=1
    )                                                           # (E, 4, MT)
    ws = jnp.concatenate(
        [wheel_c.reshape(E, W, 2), forw.reshape(E, W, 2),
         side.reshape(E, W, 2), jnp.zeros((E, W, 2), f32)], axis=2
    )                                                           # (E, W, 8)
    ho = jnp.concatenate(
        [pre_origin, post_origin,
         jnp.broadcast_to(
             n_tiles.astype(f32)[:, None, None], (E, N, 1)
         ),
         jnp.zeros((E, N, 3), f32)], axis=2
    )                                                           # (E, N, 8)
    vis_f = visited.astype(f32)
    tt_f = tile_touched.astype(f32)[:, None, :]                 # (E, 1, MT)

    eb = _eb_for(E)
    grid = E // eb
    mem = pltpu.ANY if interpret else pltpu.VMEM

    def bspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (eb,) + shape,
            (lambda g, _nd=nd: (g,) + (0,) * _nd),
            memory_space=mem,
        )

    won_o, car_o, vis_o, tt_o = pl.pallas_call(
        _make_kernel(N, eb, MT),
        grid=(grid,),
        in_specs=[
            bspec(8, MT), bspec(8, MT), bspec(8, MT), bspec(8, MT),
            bspec(4, MT), bspec(W, 8), bspec(N, 8), bspec(N, MT),
            bspec(1, MT),
        ],
        out_specs=[bspec(W, 1), bspec(N, 8), bspec(N, MT), bspec(1, MT)],
        out_shape=[
            jax.ShapeDtypeStruct((E, W, 1), f32),
            jax.ShapeDtypeStruct((E, N, 8), f32),
            jax.ShapeDtypeStruct((E, N, MT), f32),
            jax.ShapeDtypeStruct((E, 1, MT), f32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(quad8, ax8, lohi, curb8, misc, ws, ho, vis_f, tt_f)

    return (
        won_o[:, :, 0].reshape(E, N, 4) > 0.0,
        vis_o > 0.0,
        car_o[:, :, 0],
        car_o[:, :, 1].astype(jnp.int32),
        tt_o[:, 0, :] > 0.0,
        car_o[:, :, 2],
        car_o[:, :, 3] > 0.0,
    )


# ---------------------------------------------------------------------------
# v2: envs-on-sublanes kernel. The v1 kernel above serializes an env block
# through a fori_loop of tiny (8, MT) ops and measured SLOWER than XLA's
# fused sweeps (6.42 vs 5.60 ms/step at 4096x2 — instruction-issue bound).
# v2 lays envs on sublanes: every op covers (eb, MT) or (eb, 4, MT), the
# wheel/car loops are static python unrolls, and there is NO in-kernel
# slicing except lane-dim scalar columns (middle-dim slices of VMEM blocks
# force Mosaic relayouts; reductions over the 4-vertex axis replace them).
# ---------------------------------------------------------------------------


def _eb2_for(E: int) -> int:
    import os
    want = int(os.environ.get("MCR_TRACK_EB", "128"))
    for eb in (want, 128, 64, 32, 16, 8, 4, 2, 1):
        if eb <= E and E % eb == 0:
            return eb
    return 1


def _make_kernel_v2(num_agents: int, mt: int):
    N = num_agents
    W = 4 * N
    f32 = jnp.float32

    def kernel(qx_r, qy_r, edx_r, edy_r, axx_r, axy_r, lo_r, hi_r,
               cqx_r, cqy_r, cdx_r, cdy_r,
               tx_r, ty_r, beta_r, valid_r, nt_r,
               cx_r, cy_r, fx_r, fy_r, sx_r, sy_r,
               pox_r, poy_r, qox_r, qoy_r, vis_r, tt_r,
               won_o, bonus_o, cnt_o, nbeta_o, grass_o, vis_o, tt_o):
        QX, QY = qx_r[...], qy_r[...]            # (eb, 4, MT)
        EDX, EDY = edx_r[...], edy_r[...]
        AXX, AXY = axx_r[...], axy_r[...]
        LO, HI = lo_r[...], hi_r[...]
        TX, TY = tx_r[...], ty_r[...]            # (eb, MT)
        BETA, VALID = beta_r[...], valid_r[...]
        NT = nt_r[...]                           # (eb, 1)
        CX, CY = cx_r[...], cy_r[...]            # (eb, W)
        FX, FY = fx_r[...], fy_r[...]
        SX, SY = sx_r[...], sy_r[...]
        TT = tt_r[...]                           # (eb, MT)

        # wheel-center projections on the wheel's own axes, all wheels at
        # once (lane-dim math on (eb, W)).
        CPS = CX * SX + CY * SY
        CPF = CX * FX + CY * FY

        def col3(A, j):                          # (eb, W) -> (eb, 1, 1)
            return A[:, j:j + 1][:, :, None]

        wheel_ov = []
        won_cols = []
        for w in range(W):
            sxw, syw = col3(SX, w), col3(SY, w)
            fxw, fyw = col3(FX, w), col3(FY, w)
            cxw, cyw = col3(CX, w), col3(CY, w)
            # wheel box axes: min/max of tile-vertex projections.
            ps = sxw * QX + syw * QY             # (eb, 4, MT)
            pf = fxw * QX + fyw * QY
            cps = CPS[:, w:w + 1]                # (eb, 1)
            cpf = CPF[:, w:w + 1]
            g = jnp.maximum(
                jnp.min(ps, axis=1) - (cps + _HX),
                (cps - _HX) - jnp.max(ps, axis=1),
            )
            g = jnp.maximum(g, jnp.maximum(
                jnp.min(pf, axis=1) - (cpf + _HY),
                (cpf - _HY) - jnp.max(pf, axis=1),
            ))
            # tile face axes with analytic support radius.
            cpa = cxw * AXX + cyw * AXY
            spa = sxw * AXX + syw * AXY
            fpa = fxw * AXX + fyw * AXY
            r = _HX * jnp.abs(spa) + _HY * jnp.abs(fpa)
            ga = jnp.max(
                jnp.maximum(LO - (cpa + r), (cpa - r) - HI), axis=1
            )
            sep = jnp.maximum(g, ga)
            ov = (sep < _MARGIN).astype(f32)     # (eb, MT)
            wheel_ov.append(ov)
            won_cols.append(jnp.max(ov, axis=1, keepdims=True))
        won_o[...] = jnp.concatenate(won_cols, axis=1)     # (eb, W)

        def point_in(px, py, VX, VY, DX, DY):
            # strict-interior: all edge crosses same sign.
            px3, py3 = px[:, :, None], py[:, :, None]      # (eb, 1, 1)
            cr = DX * (py3 - VY) - DY * (px3 - VX)         # (eb, 4, MT)
            pos = jnp.min(cr, axis=1) > 0.0
            neg = jnp.max(cr, axis=1) < 0.0
            return (pos | neg).astype(f32)                 # (eb, MT)

        POX, POY = pox_r[...], poy_r[...]        # (eb, N)
        QOX, QOY = qox_r[...], qoy_r[...]
        CQX, CQY = cqx_r[...], cqy_r[...]
        CDX, CDY = cdx_r[...], cdy_r[...]

        car_tiles = []
        touched = TT
        for n in range(N):
            ct = wheel_ov[4 * n]
            for k in range(1, 4):
                ct = jnp.maximum(ct, wheel_ov[4 * n + k])
            car_tiles.append(ct)
            hull_in = point_in(POX[:, n:n + 1], POY[:, n:n + 1],
                               QX, QY, EDX, EDY)
            touched = jnp.maximum(touched, jnp.maximum(ct, hull_in))
        tt_o[...] = touched

        # visit rewards (env._visit_rewards semantics, car-id tie-break).
        prev_count = vis_r[..., 0, :] * 0.0                # (eb, MT)
        VIS = [vis_r[..., n, :] for n in range(N)]         # each (eb, MT)
        for n in range(N):
            prev_count = prev_count + VIS[n]
        acc = prev_count * 0.0
        bonus_cols, cnt_cols, vis_new = [], [], []
        tile_bonus = 1000.0 / NT                           # (eb, 1)
        for n in range(N):
            new = car_tiles[n] * (1.0 - VIS[n]) * VALID
            factor = 1.0 - (prev_count + acc) / float(N)
            bonus_cols.append(
                jnp.sum(new * factor, axis=1, keepdims=True) * tile_bonus
            )
            cnt_cols.append(jnp.sum(new, axis=1, keepdims=True))
            vis_new.append(jnp.maximum(VIS[n], new))
            acc = acc + new
        bonus_o[...] = jnp.concatenate(bonus_cols, axis=1)  # (eb, N)
        cnt_o[...] = jnp.concatenate(cnt_cols, axis=1)
        vis_o[...] = jnp.stack(vis_new, axis=1)             # (eb, N, MT)

        # post-step analysis on the post-solve pose.
        nbeta_cols, grass_cols = [], []
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, mt), 1)
        for n in range(N):
            ox, oy = QOX[:, n:n + 1], QOY[:, n:n + 1]       # (eb, 1)
            d2 = jnp.square(ox - TX) + jnp.square(oy - TY)  # (eb, MT)
            d2 = jnp.where(VALID > 0.0, d2, _BIG)
            m = jnp.min(d2, axis=1, keepdims=True)
            idx = jnp.min(
                jnp.where(d2 == m, iota, mt), axis=1, keepdims=True
            )
            nbeta_cols.append(jnp.sum(
                jnp.where(iota == idx, BETA, 0.0), axis=1, keepdims=True
            ))
            road_in = point_in(ox, oy, QX, QY, EDX, EDY)
            curb_in = point_in(ox, oy, CQX, CQY, CDX, CDY)
            grass_cols.append(1.0 - jnp.max(
                jnp.maximum(road_in, curb_in), axis=1, keepdims=True
            ))
        nbeta_o[...] = jnp.concatenate(nbeta_cols, axis=1)
        grass_o[...] = jnp.concatenate(grass_cols, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_agents", "interpret"))
def track_pass_batched_v2(
    quad_T,        # (E, 4, 2, MT) f32
    quad_ax_T,     # (E, 4, 2, MT) f32
    quad_lo,       # (E, 4, MT) f32
    quad_hi,       # (E, 4, MT) f32
    curb_quad_T,   # (E, 4, 2, MT) f32
    xy,            # (E, MT, 2) f32
    beta,          # (E, MT) f32
    valid,         # (E, MT) bool
    n_tiles,       # (E,) int32
    wheel_c,       # (E, N, 4, 2) f32 — PRE-solve pose
    forw,          # (E, N, 4, 2)
    side,          # (E, N, 4, 2)
    pre_origin,    # (E, N, 2)
    post_origin,   # (E, N, 2)
    visited,       # (E, N, MT) bool
    tile_touched,  # (E, MT) bool
    num_agents: int,
    interpret: bool = False,
):
    """Same contract as track_pass_batched, envs-on-sublanes layout.

    All table preparation (coordinate splits, edge deltas) is XLA on the
    UNCHANGED per-step track leaves — loop-invariant inside rollout scans,
    so XLA's LICM hoists it out of the hot loop."""
    E, N = wheel_c.shape[0], num_agents
    MT = beta.shape[1]
    W = 4 * N
    f32 = jnp.float32

    qx, qy = quad_T[:, :, 0, :], quad_T[:, :, 1, :]         # (E, 4, MT)
    edx = jnp.roll(qx, -1, axis=1) - qx
    edy = jnp.roll(qy, -1, axis=1) - qy
    axx, axy = quad_ax_T[:, :, 0, :], quad_ax_T[:, :, 1, :]
    cqx, cqy = curb_quad_T[:, :, 0, :], curb_quad_T[:, :, 1, :]
    cdx = jnp.roll(cqx, -1, axis=1) - cqx
    cdy = jnp.roll(cqy, -1, axis=1) - cqy
    tx, ty = xy[..., 0], xy[..., 1]
    validf = valid.astype(f32)
    nt = n_tiles.astype(f32)[:, None]                        # (E, 1)
    wc = wheel_c.reshape(E, W, 2)
    fw = forw.reshape(E, W, 2)
    sd = side.reshape(E, W, 2)
    vis_f = visited.astype(f32)                              # (E, N, MT)
    tt_f = tile_touched.astype(f32)

    eb = _eb2_for(E)
    grid = E // eb
    mem = pltpu.ANY if interpret else pltpu.VMEM

    def bspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (eb,) + shape,
            (lambda g, _nd=nd: (g,) + (0,) * _nd),
            memory_space=mem,
        )

    outs = pl.pallas_call(
        _make_kernel_v2(N, MT),
        grid=(grid,),
        in_specs=[
            bspec(4, MT)] * 12 + [bspec(MT)] * 4 + [bspec(1)]
            + [bspec(W)] * 6 + [bspec(N)] * 4
            + [bspec(N, MT), bspec(MT)],
        out_specs=[
            bspec(W), bspec(N), bspec(N), bspec(N), bspec(N),
            bspec(N, MT), bspec(MT),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E, W), f32),
            jax.ShapeDtypeStruct((E, N), f32),
            jax.ShapeDtypeStruct((E, N), f32),
            jax.ShapeDtypeStruct((E, N), f32),
            jax.ShapeDtypeStruct((E, N), f32),
            jax.ShapeDtypeStruct((E, N, MT), f32),
            jax.ShapeDtypeStruct((E, MT), f32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qx, qy, edx, edy, axx, axy, quad_lo, quad_hi, cqx, cqy, cdx, cdy,
      tx, ty, beta, validf, nt,
      wc[..., 0], wc[..., 1], fw[..., 0], fw[..., 1], sd[..., 0], sd[..., 1],
      pre_origin[..., 0], pre_origin[..., 1],
      post_origin[..., 0], post_origin[..., 1],
      vis_f, tt_f)

    won_o, bonus_o, cnt_o, nbeta_o, grass_o, vis_o, tt_o = outs
    return (
        won_o.reshape(E, N, 4) > 0.0,
        vis_o > 0.0,
        bonus_o,
        cnt_o.astype(jnp.int32),
        tt_o > 0.0,
        nbeta_o,
        grass_o > 0.0,
    )
