"""Fused Pallas TPU kernels for the per-step physics.

Why kernels: ``world.Step(1/50, 180, 60)`` (mcr:428) is 240 *sequential*
Gauss-Seidel iterations over tiny per-env systems, and the surrounding
stages (tire model cd:172-266, b2CollidePolygons manifolds) are hundreds of
small ops on arrays whose minor dims are structural (2 coords, 4 wheels). As
XLA ops inside a rollout loop every one of those pays its own dispatch and
HBM round-trip — measured 13 ms/step for the solve and 5 ms for the Collide
pass at 4096x2 envs. Here the whole physics step runs as ONE program per
env block with every array VMEM/vreg-resident and envs on the vector lanes;
manifold<->body routing contracts constant 0/1 incidence matrices on the MXU.

Layout: all arrays env-minor ``(..., E)``; bodies flattened to ``5N`` rows
(hulls 0..N-1, wheel k of car n at ``N + k*N + n``).

Two entry points:
- :func:`world_step_batched` — the constraint solve alone (differential
  baseline vs physics/world.py; used by tests).
- :func:`step_physics_batched` — tire model + Collide pass + solve fused
  (the production path behind env._make_solver).

The math mirrors physics/{tire,collide,joints,world}.py term for term, so
results match the XLA pipeline to float-accumulation noise
(tests/test_pallas_world.py; verified on TPU hardware at 4096x2 envs).
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
from . import collide, shapes
from .state import CarState

_MA = float(shapes.HULL_INV_MASS)
_IA = float(shapes.HULL_INV_I)
_MB = float(shapes.WHEEL_INV_MASS)
_IB = float(shapes.WHEEL_INV_I)
_MOTOR_MASS = 1.0 / (_IA + _IB)
_FRICTION = C.HULL_FRICTION
_TOTAL_RADIUS = 2.0 * C.B2_POLYGON_RADIUS
_WHEEL_RAD = float(shapes.WHEEL_RAD)

MAX_ENVS_PER_PROGRAM = 4096


# ---------------------------------------------------------------------------
# Constant tables (numpy; passed to kernels as inputs — Pallas forbids
# captured array constants).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _contact_tables(num_cars: int):
    """Incidence matrices over the kernel's flat body order.

    Returns (WA, WB, WD=WB-WA (MM,5N), inv_m, inv_i (5N,1)) as numpy f32.
    """
    n = num_cars
    pairs = collide.car_pairs(n)
    mm = len(pairs) * collide.M_PER_PAIR
    nb = 5 * n
    body = shapes.CAR_FIXTURE_BODY           # fixture -> 0 (hull) | 1..4 (wheel+1)
    wa = np.zeros((mm, nb), np.float32)
    wb = np.zeros((mm, nb), np.float32)

    def row(car, fixture):
        b = body[fixture]
        return car if b == 0 else n + (b - 1) * n + car

    i = 0
    for (a, b) in pairs:
        for (fa, fb) in collide.FIXTURE_PAIRS:
            wa[i, row(a, fa)] = 1.0
            wb[i, row(b, fb)] = 1.0
            i += 1
    inv_m = np.concatenate(
        [np.full(n, _MA), np.full(4 * n, _MB)]
    ).astype(np.float32)[:, None]
    inv_i = np.concatenate(
        [np.full(n, _IA), np.full(4 * n, _IB)]
    ).astype(np.float32)[:, None]
    return wa, wb, wb - wa, inv_m, inv_i


@functools.lru_cache(maxsize=None)
def _collide_tables(num_cars: int):
    """Constants for the in-kernel Collide pass.

    NF = 8*num_cars flat fixture rows (car-major, fixture-minor).
    Returns dict of numpy arrays:
      lvx, lvy, lnx, lny (NF, 8) — local verts / outward normals (padded
        cyclically, shapes.poly_with_normals)
      f2b (NF, 5N)              — fixture -> body one-hot
      lcx, lcy (5N, 1)          — body local center (COM - origin offset)
      fixa, fixb (MM, NF)       — manifold side -> fixture one-hot
    """
    n = num_cars
    nf = 8 * n
    pairs = collide.car_pairs(n)
    mm = len(pairs) * collide.M_PER_PAIR
    body = shapes.CAR_FIXTURE_BODY

    lv = np.tile(shapes.CAR_FIXTURE_VERTS, (n, 1, 1)).astype(np.float32)
    ln = np.tile(shapes.CAR_FIXTURE_NORMALS, (n, 1, 1)).astype(np.float32)
    f2b = np.zeros((nf, 5 * n), np.float32)
    for car in range(n):
        for f in range(8):
            b = body[f]
            row = car if b == 0 else n + (b - 1) * n + car
            f2b[car * 8 + f, row] = 1.0
    lc = np.zeros((5 * n, 2), np.float32)
    lc[:n] = shapes.HULL_LOCAL_CENTER        # wheels: local center == origin
    fixa = np.zeros((mm, nf), np.float32)
    fixb = np.zeros((mm, nf), np.float32)
    i = 0
    for (a, b) in pairs:
        for (fa, fb) in collide.FIXTURE_PAIRS:
            fixa[i, a * 8 + fa] = 1.0
            fixb[i, b * 8 + fb] = 1.0
            i += 1
    return dict(
        lvx=lv[..., 0], lvy=lv[..., 1], lnx=ln[..., 0], lny=ln[..., 1],
        f2b=f2b, lcx=lc[:, 0:1], lcy=lc[:, 1:2], fixa=fixa, fixb=fixb,
    )


def _dot(a, b):
    # precision=HIGHEST is load-bearing: the default MXU precision truncates
    # BOTH operands to bf16. The incidence side (0/±1) is bf16-exact, but the
    # payload side carries world positions (|x| up to PLAYFIELD=333) — bf16
    # error ~1 m on contact lever arms of ~1.5 m, which inflated the solver's
    # effective-mass/bias terms until the contact Gauss-Seidel DIVERGED
    # (x2/iteration -> inf impulses -> NaN hulls) for sustained multi-point
    # car-car contacts. Interpret mode (CPU tests) computes f32 exactly, so
    # only compiled-TPU training runs ever saw it. Measured cost of the
    # 3-pass decomposition here: ~0 (the solver is issue-bound, not
    # MXU-bound; docs/PERF.md "routing form" table).
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot1(a, b):
    """Single-pass (default-precision) routing dot: payloads whose values
    are already small DELTAS (per-point impulse/position corrections), where
    bf16's ~0.4% relative error applies to the delta, not the state."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


_VEL_GATHER_PASSES = int(os.environ.get("MCR_VEL_GATHER_PASSES", "1"))


def _dot2(a, b, passes=2):
    """Two-pass hi/lo routing dot for the per-iteration solver dots.

    ``a`` is a 0/±1 incidence table (bf16-exact); splitting the payload as
    b = hi + lo with hi = bf16(b) makes the first pass exact and leaves lo
    ~= 0.4% of b, whose own bf16 truncation bounds the total relative error
    at ~1.5e-5 — inside the 5e-3 first-impact parity bar for velocities up
    to ~40 m/s, at 2x a default-precision dot instead of HIGHEST's 6
    passes. Positions (|x| up to 333) must NOT come through here: 1.5e-5
    relative is 5 mm absolute, the size of B2_LINEAR_SLOP — use _dot.

    ``passes=1`` drops the lo pass (bf16 payload, ~0.4% relative): used for
    the per-iteration contact velocity gather when MCR_VEL_GATHER_PASSES=1
    — the Gauss-Seidel stays convergent (effective masses are exact; the
    noise only perturbs the residual it is cancelling) and the error is
    inside the documented ~1 m post-impact collision-chaos tolerance."""
    dn = (((1,), (0,)), ((), ()))
    if passes == 1:
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
    hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    lo = b - hi
    return (
        jax.lax.dot_general(a, hi, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(a, lo, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    )


# ---------------------------------------------------------------------------
# Cores: pure value -> value functions shared by the kernels. All arrays are
# env-minor; lists are unrolled over the 4 wheels / 8 verts at trace time.
# ---------------------------------------------------------------------------

_ARM = (shapes.WHEEL_POS - shapes.HULL_LOCAL_CENTER[None, :])   # (4, 2)
_ARM_X = [float(_ARM[k, 0]) for k in range(4)]
_ARM_Y = [float(_ARM[k, 1]) for k in range(4)]

# Broadphase AABB constants (near_flags): local-frame AABB of the four hull
# fixtures relative to the hull COM (mid + half-extents), and the wheel's
# symmetric box. Disjoint world AABBs fattened by the polygon skin guarantee
# b2CollidePolygons culls the pair (sep > totalRadius).
_HULL_FIXT = shapes.CAR_FIXTURE_BODY == 0
_hv = (shapes.CAR_FIXTURE_VERTS[_HULL_FIXT].reshape(-1, 2)
       - shapes.HULL_LOCAL_CENTER[None, :])
_HULL_AABB_MID = tuple(
    float(v) for v in (_hv.min(0) + _hv.max(0)) / 2.0
)
_HULL_AABB_HALF = tuple(
    float(v) for v in (_hv.max(0) - _hv.min(0)) / 2.0
)
_wv = shapes.CAR_FIXTURE_VERTS[~_HULL_FIXT].reshape(-1, 2)
_WHEEL_AABB_HALF = tuple(float(v) for v in np.abs(_wv).max(0))
# Box2D's b2_aabbExtension (b2Settings.h). A slack of just _TOTAL_RADIUS is
# NOT sufficient for culling soundness: for vertex-vertex closest features
# the SAT max face separation can be as low as gap*cos(45 deg) for these
# right-angle boxes, so a pair whose AABB gap is barely above the slack
# could still produce manifold points with separation <= _TOTAL_RADIUS.
# 0.1 m >= sqrt(2)*_TOTAL_RADIUS covers that with Box2D's own margin; far
# envs are meters apart, so the culling rate is unaffected.
_BP_SLACK = 0.1


def _tire_core(ha, wa_, wvx, wvy, gas, brake, steer, spin, phase, fuel,
               onroad, dt):
    """Car.step's per-wheel model (cd:172-266) minus the Box2D solve.

    Returns (motor_speed[4], force_x[4], force_y[4], spin[4], phase[4],
    fuel, skid[4]); each entry (N, E)."""
    mspeed, fx, fy, skid = [], [], [], []
    spin, phase = list(spin), list(phase)
    for k in range(4):
        err = steer[k] - (wa_[k] - ha)
        mspeed.append(
            jnp.sign(err)
            * jnp.minimum(C.STEER_SERVO_GAIN * jnp.abs(err),
                          C.STEER_SERVO_MAX_SPEED)
        )
        fl = jnp.where(
            onroad[k] > 0.0, C.FRICTION_LIMIT,
            C.FRICTION_LIMIT * C.GRASS_FRICTION_FACTOR,
        )
        sw, cw = jnp.sin(wa_[k]), jnp.cos(wa_[k])
        vf = -sw * wvx[k] + cw * wvy[k]          # forward = (-sin, cos)
        vs = cw * wvx[k] + sw * wvy[k]           # side = (cos, sin)
        sp = spin[k] + (
            dt * C.ENGINE_POWER * gas[k]
            / (C.WHEEL_MOMENT_OF_INERTIA * (jnp.abs(spin[k]) + 5.0))
        )
        fuel = fuel + dt * C.ENGINE_POWER * gas[k]
        bleed = jnp.sign(sp) * jnp.minimum(
            C.BRAKE_FORCE * brake[k], jnp.abs(sp)
        )
        sp = jnp.where(
            brake[k] >= 0.9, 0.0, jnp.where(brake[k] > 0.0, sp - bleed, sp)
        )
        phase[k] = phase[k] + sp * dt
        vr = sp * _WHEEL_RAD
        f_f = (-vf + vr) * C.TIRE_STIFFNESS
        p_f = -vs * C.TIRE_STIFFNESS
        force = jnp.sqrt(f_f * f_f + p_f * p_f)
        skid.append((jnp.abs(force) > 2.0 * fl).astype(jnp.float32))
        over = jnp.abs(force) > fl
        scale = jnp.where(over, fl / jnp.maximum(force, 1e-30), 1.0)
        f_f = f_f * scale
        p_f = p_f * scale
        spin[k] = sp - dt * f_f * _WHEEL_RAD / C.WHEEL_MOMENT_OF_INERTIA
        fx.append(p_f * cw + f_f * -sw)
        fy.append(p_f * sw + f_f * cw)
    return mspeed, fx, fy, spin, phase, fuel, skid


def _select8(arrs, idx):
    """arrs: list of 8 (MM, E); idx: (MM, E) int32 -> selected (MM, E)."""
    out = arrs[0]
    for v in range(1, 8):
        out = jnp.where(idx == v, arrs[v], out)
    return out


def _collide_core(N, tb, hcx, hcy, ha, wcx, wcy, wa_,
                  prev_ids, prev_ni, prev_ti):
    """b2CollidePolygons over all fixture pairs (mirrors collide._collide_pair)
    + the warm-start keep-mask (collide.make_bundle).

    tb: dict of constant VALUE arrays from _collide_tables.
    Returns (nx, ny, pkx[2], pky[2], sep[2], ok[2] bool, ni[2], ti[2],
    ids (MM,E) int32)."""
    # --- body origin frame (hull fixtures rotate about the body ORIGIN).
    cxf = jnp.concatenate([hcx] + list(wcx), axis=0)       # (5N, E)
    cyf = jnp.concatenate([hcy] + list(wcy), axis=0)
    af = jnp.concatenate([ha] + list(wa_), axis=0)
    sb, cb = jnp.sin(af), jnp.cos(af)
    ox = cxf - (cb * tb["lcx"] - sb * tb["lcy"])
    oy = cyf - (sb * tb["lcx"] + cb * tb["lcy"])

    # --- world fixture geometry, (NF, E) per vertex index. Dots stacked
    # along lanes: one MXU call fetches all four per-fixture quantities.
    E1 = hcx.shape[-1]
    g4 = _dot(tb["f2b"], jnp.concatenate([ox, oy, cb, sb], axis=1))
    fo_x, fo_y = g4[:, 0:E1], g4[:, E1:2 * E1]
    fc, fs = g4[:, 2 * E1:3 * E1], g4[:, 3 * E1:]
    FIXS = jnp.concatenate([tb["fixa"], tb["fixb"]], axis=0)   # (2MM, NF)
    MM = tb["fixa"].shape[0]
    vax, vay, nax, nay = [], [], [], []
    vbx, vby, nbx, nby = [], [], [], []
    for v in range(8):
        lvx = tb["lvx"][:, v:v + 1]
        lvy = tb["lvy"][:, v:v + 1]
        lnx = tb["lnx"][:, v:v + 1]
        lny = tb["lny"][:, v:v + 1]
        wvx_ = fc * lvx - fs * lvy + fo_x
        wvy_ = fs * lvx + fc * lvy + fo_y
        wnx_ = fc * lnx - fs * lny
        wny_ = fs * lnx + fc * lny
        g = _dot(FIXS, jnp.concatenate([wvx_, wvy_, wnx_, wny_], axis=1))
        gx, gy = g[:, 0:E1], g[:, E1:2 * E1]
        hx, hy = g[:, 2 * E1:3 * E1], g[:, 3 * E1:]
        vax.append(gx[:MM]); vbx.append(gx[MM:])
        vay.append(gy[:MM]); vby.append(gy[MM:])
        nax.append(hx[:MM]); nbx.append(hx[MM:])
        nay.append(hy[:MM]); nby.append(hy[MM:])

    def max_sep(nx_, ny_, vx_, vy_, ux_, uy_):
        """b2FindMaxSeparation brute force: axes (nx_,ny_) of poly (vx_,vy_)
        vs other poly (ux_,uy_). Returns (sep, edge int32)."""
        best = None
        edge = None
        for i in range(8):
            d = None
            for j in range(8):
                dj = nx_[i] * ux_[j] + ny_[i] * uy_[j]
                d = dj if d is None else jnp.minimum(d, dj)
            s = d - (nx_[i] * vx_[i] + ny_[i] * vy_[i])
            if best is None:
                best, edge = s, jnp.zeros_like(s, jnp.int32)
            else:
                upd = s > best                       # strict: first max wins
                best = jnp.where(upd, s, best)
                edge = jnp.where(upd, i, edge)
        return best, edge

    sep_a, edge_a = max_sep(nax, nay, vax, vay, vbx, vby)
    sep_b, edge_b = max_sep(nbx, nby, vbx, vby, vax, vay)
    no_contact = (sep_a > _TOTAL_RADIUS) | (sep_b > _TOTAL_RADIUS)

    flip = sep_b > sep_a + 0.1 * C.B2_LINEAR_SLOP
    rvx = [jnp.where(flip, vbx[v], vax[v]) for v in range(8)]
    rvy = [jnp.where(flip, vby[v], vay[v]) for v in range(8)]
    rnx = [jnp.where(flip, nbx[v], nax[v]) for v in range(8)]
    rny = [jnp.where(flip, nby[v], nay[v]) for v in range(8)]
    ivx = [jnp.where(flip, vax[v], vbx[v]) for v in range(8)]
    ivy = [jnp.where(flip, vay[v], vby[v]) for v in range(8)]
    inx = [jnp.where(flip, nax[v], nbx[v]) for v in range(8)]
    iny = [jnp.where(flip, nay[v], nby[v]) for v in range(8)]
    ref_edge = jnp.where(flip, edge_b, edge_a)

    rn_x = _select8(rnx, ref_edge)
    rn_y = _select8(rny, ref_edge)
    # incident edge: argmin_j rn . inc_n[j] (first min wins).
    best = None
    inc_edge = None
    for j in range(8):
        d = rn_x * inx[j] + rn_y * iny[j]
        if best is None:
            best, inc_edge = d, jnp.zeros_like(d, jnp.int32)
        else:
            upd = d < best
            best = jnp.where(upd, d, best)
            inc_edge = jnp.where(upd, j, inc_edge)

    inc2 = jnp.mod(inc_edge + 1, 8)
    ref2 = jnp.mod(ref_edge + 1, 8)
    i1x = _select8(ivx, inc_edge); i1y = _select8(ivy, inc_edge)
    i2x = _select8(ivx, inc2);     i2y = _select8(ivy, inc2)
    v1x = _select8(rvx, ref_edge); v1y = _select8(rvy, ref_edge)
    v2x = _select8(rvx, ref2);     v2y = _select8(rvy, ref2)

    tx_ = v2x - v1x
    ty_ = v2y - v1y
    tlen = jnp.maximum(jnp.sqrt(tx_ * tx_ + ty_ * ty_), 1e-12)
    tx_ = tx_ / tlen
    ty_ = ty_ / tlen

    def clip(p1x, p1y, p2x, p2y, nx_, ny_, offset):
        d1 = nx_ * p1x + ny_ * p1y - offset
        d2 = nx_ * p2x + ny_ * p2y - offset
        t = d1 / jnp.where(jnp.abs(d1 - d2) > 1e-12, d1 - d2, 1.0)
        tc = jnp.clip(t, 0.0, 1.0)
        ix_ = p1x + tc * (p2x - p1x)
        iy_ = p1y + tc * (p2y - p1y)
        keep1 = d1 <= 0
        keep2 = d2 <= 0
        crossed = d1 * d2 < 0
        o1x = jnp.where(keep1, p1x, jnp.where(crossed, ix_, p2x))
        o1y = jnp.where(keep1, p1y, jnp.where(crossed, iy_, p2y))
        o2x = jnp.where(keep2, p2x, jnp.where(crossed, ix_, p1x))
        o2y = jnp.where(keep2, p2y, jnp.where(crossed, iy_, p1y))
        ok_ = (keep1.astype(jnp.int32) + keep2.astype(jnp.int32)
               + crossed.astype(jnp.int32)) >= 2
        return o1x, o1y, o2x, o2y, ok_

    off1 = -(tx_ * v1x + ty_ * v1y) + _TOTAL_RADIUS
    p1x, p1y, p2x, p2y, ok1 = clip(i1x, i1y, i2x, i2y, -tx_, -ty_, off1)
    off2 = (tx_ * v2x + ty_ * v2y) + _TOTAL_RADIUS
    q1x, q1y, q2x, q2y, ok2 = clip(p1x, p1y, p2x, p2y, tx_, ty_, off2)

    front = rn_x * v1x + rn_y * v1y
    s1 = rn_x * q1x + rn_y * q1y - front - _TOTAL_RADIUS
    s2 = rn_x * q2x + rn_y * q2y - front - _TOTAL_RADIUS
    ok = ok1 & ok2 & ~no_contact
    ok_pt = [ok & (s1 <= _TOTAL_RADIUS), ok & (s2 <= _TOTAL_RADIUS)]

    nx = jnp.where(flip, -rn_x, rn_x)
    ny = jnp.where(flip, -rn_y, rn_y)
    cid = flip.astype(jnp.int32) * 1024 + ref_edge * 64 + inc_edge
    cid = jnp.where(ok_pt[0] | ok_pt[1], cid, -1)

    # warm-start keep-mask (make_bundle): impulses survive while the
    # manifold's feature id persists.
    keep = (prev_ids == cid) & (cid >= 0)
    ni = [jnp.where(keep & ok_pt[k], prev_ni[k], 0.0) for k in range(2)]
    ti = [jnp.where(keep & ok_pt[k], prev_ti[k], 0.0) for k in range(2)]

    return (nx, ny, [q1x, q2x], [q1y, q2y], [s1, s2], ok_pt, ni, ti, cid)


def _solve_core(N, velocity_iters, position_iters, k_vel_c, k_pos_c, dt,
                body, jnt, ls, man, tbl):
    """The b2Island solve (mirrors physics/world.py world_step).

    body: (hvx, hvy, hw, hcx, hcy, ha, wvx[4], wvy[4], ww[4], wcx[4],
           wcy[4], wa_[4]) — velocities AFTER force integration.
    jnt: (jix[4], jiy[4], jiz[4], mimp[4], mspeed[4]) — jiz already
         limit-state-masked, ls the NEW limit states.
    man: None or (nx, ny, pkx[2], pky[2], sep[2], ok[2], ni[2], ti[2]).
    tbl: None or (WS, WDT, WBA, INVM, INVI) value arrays (_contact_tbls).
    Returns updated (body, jix, jiy, jiz, mimp, ni, ti)."""
    (hvx, hvy, hw, hcx, hcy, ha, wvx, wvy, ww, wcx, wcy, wa_) = body
    jix, jiy, jiz, mimp, mspeed = jnt
    has_contacts = man is not None
    max_motor = dt * C.STEER_JOINT_MAX_MOTOR_TORQUE

    sa, ca = jnp.sin(ha), jnp.cos(ha)
    r_ax = [ca * _ARM_X[k] - sa * _ARM_Y[k] for k in range(4)]
    r_ay = [sa * _ARM_X[k] + ca * _ARM_Y[k] for k in range(4)]

    if has_contacts:
        (nx, ny, pkx, pky, sep, ok, ni, ti) = man
        WS, WDT, WBA, INVM, INVI = tbl
        MM = WS.shape[0] // 2
        E1 = hvx.shape[-1]
        tx = ny
        ty = -nx
        gmi = _dot(WS, jnp.concatenate([INVM, INVI], axis=1))   # (2MM, 2)
        ma, mb = gmi[0:MM, 0:1], gmi[MM:, 0:1]
        ia, ib = gmi[0:MM, 1:2], gmi[MM:, 1:2]

        def flat(h, w4):
            return jnp.concatenate([h] + list(w4), axis=0)

        gc = _dot(WS, jnp.concatenate([flat(hcx, wcx), flat(hcy, wcy)], axis=1))
        com_a0x, com_b0x = gc[0:MM, 0:E1], gc[MM:, 0:E1]
        com_a0y, com_b0y = gc[0:MM, E1:], gc[MM:, E1:]
        r_akx = [pkx[k] - com_a0x for k in range(2)]
        r_aky = [pky[k] - com_a0y for k in range(2)]
        r_bkx = [pkx[k] - com_b0x for k in range(2)]
        r_bky = [pky[k] - com_b0y for k in range(2)]
        nmass, tmass = [], []
        for k in range(2):
            for (ax_, ay_, out) in ((nx, ny, nmass), (tx, ty, tmass)):
                crn_a = r_akx[k] * ay_ - r_aky[k] * ax_
                crn_b = r_bkx[k] * ay_ - r_bky[k] * ax_
                kk = ma + mb + ia * crn_a * crn_a + ib * crn_b * crn_b
                out.append(
                    jnp.where(kk > 0.0, 1.0 / jnp.maximum(kk, 1e-12), 0.0)
                )

        def contact_apply(vxf, vyf, wf, lam, k, ax_, ay_):
            px = lam * ax_
            py = lam * ay_
            la = r_akx[k] * py - r_aky[k] * px
            lb = r_bkx[k] * py - r_bky[k] * px
            # Scatter payloads are per-point impulse DELTAS: default
            # precision errs ~0.4% of each delta, i.e. ~0.4% of the total
            # accumulated impulse — well under the contact-chaos tolerance.
            dlin = _dot1(WDT, jnp.concatenate([px, py], axis=1)) * INVM
            vxf = vxf + dlin[:, 0:E1]
            vyf = vyf + dlin[:, E1:]
            wf = wf + _dot1(WBA, jnp.concatenate([lb, la], axis=0)) * INVI
            return vxf, vyf, wf

        # ---- contact warm start (before joints: b2Island order).
        vxf = flat(hvx, wvx)
        vyf = flat(hvy, wvy)
        wf = flat(hw, ww)
        for k in range(2):
            vxf, vyf, wf = contact_apply(
                vxf, vyf, wf, jnp.ones_like(ni[k]), k,
                ni[k] * nx + ti[k] * tx, ni[k] * ny + ti[k] * ty,
            )
        hvx, hvy, hw = vxf[0:N], vyf[0:N], wf[0:N]
        wvx = [vxf[N + k * N:N + (k + 1) * N] for k in range(4)]
        wvy = [vyf[N + k * N:N + (k + 1) * N] for k in range(4)]
        ww = [wf[N + k * N:N + (k + 1) * N] for k in range(4)]
    else:
        z = hvx * 0.0
        ni = ti = (z, z)

    # ---- joint warm start.
    for k in range(4):
        ang = mimp[k] + jiz[k]
        hvx = hvx - _MA * jix[k]
        hvy = hvy - _MA * jiy[k]
        hw = hw - _IA * (r_ax[k] * jiy[k] - r_ay[k] * jix[k] + ang)
        wvx[k] = wvx[k] + _MB * jix[k]
        wvy[k] = wvy[k] + _MB * jiy[k]
        ww[k] = ww[k] + _IB * ang

    # ---- velocity iterations.
    # The joint 3x3 K-matrix, its cofactor rows, and both inverse scales
    # depend only on (r_ax, r_ay), which are FIXED for the whole velocity
    # phase — but Mosaic performs no loop-invariant code motion out of a
    # fori_loop body, so computing them inside joints_once re-paid ~40% of
    # the joint math 180 times per step. Hoist them here, once.
    _jc = []
    for k in range(4):
        k11 = _MA + _MB + _IA * r_ay[k] * r_ay[k]
        k12 = -_IA * r_ax[k] * r_ay[k]
        k22 = _MA + _MB + _IA * r_ax[k] * r_ax[k]
        ez_x = -_IA * r_ay[k]
        ez_y = _IA * r_ax[k]
        ez_z = _IA + _IB
        cx_ = k22 * ez_z - ez_y * ez_y
        cy_ = ez_y * ez_x - k12 * ez_z
        cz_ = k12 * ez_y - k22 * ez_x
        det = k11 * cx_ + k12 * cy_ + ez_x * cz_
        inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
        cy2x = ez_x * ez_y - k12 * ez_z
        cy2y = k11 * ez_z - ez_x * ez_x
        cy2z = k12 * ez_x - k11 * ez_y
        cz3x = k12 * ez_y - k22 * ez_x
        cz3y = k12 * ez_x - k11 * ez_y
        cz3z = k11 * k22 - k12 * k12
        det22 = k11 * k22 - k12 * k12
        inv22 = jnp.where(det22 != 0.0, 1.0 / det22, 0.0)
        _jc.append(dict(
            k11=k11, k12=k12, k22=k22, ez_x=ez_x, ez_y=ez_y,
            cx_=cx_, cy_=cy_, cz_=cz_, inv_det=inv_det,
            cy2x=cy2x, cy2y=cy2y, cy2z=cy2z,
            cz3x=cz3x, cz3y=cz3y, cz3z=cz3z, inv22=inv22,
        ))

    def joints_once(hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp):
        wvx, wvy, ww = list(wvx), list(wvy), list(ww)
        jix, jiy, jiz, mimp = list(jix), list(jiy), list(jiz), list(mimp)
        for k in range(4):
            c = _jc[k]
            # motor
            cdot = ww[k] - hw - mspeed[k]
            new = jnp.clip(mimp[k] - _MOTOR_MASS * cdot, -max_motor, max_motor)
            imp = new - mimp[k]
            mimp[k] = new
            hw = hw - _IA * imp
            ww[k] = ww[k] + _IB * imp
            # point (+ limit)
            bx = wvx[k] - hvx + hw * r_ay[k]
            by = wvy[k] - hvy - hw * r_ax[k]
            bz = ww[k] - hw
            k11, k12, k22 = c["k11"], c["k12"], c["k22"]
            ez_x, ez_y = c["ez_x"], c["ez_y"]
            inv_det = c["inv_det"]
            ix = -inv_det * (bx * c["cx_"] + by * c["cy_"] + bz * c["cz_"])
            iy = -inv_det * (bx * c["cy2x"] + by * c["cy2y"] + bz * c["cy2z"])
            iz = -inv_det * (bx * c["cz3x"] + by * c["cz3y"] + bz * c["cz3z"])

            new_z = jiz[k] + iz
            clampdown = ((ls[k] == 1) & (new_z < 0.0)) | (
                (ls[k] == 2) & (new_z > 0.0)
            )
            inv22 = c["inv22"]
            rhs_x = -bx + jiz[k] * ez_x
            rhs_y = -by + jiz[k] * ez_y
            red_x = inv22 * (k22 * rhs_x - k12 * rhs_y)
            red_y = inv22 * (k11 * rhs_y - k12 * rhs_x)
            lim_ix = jnp.where(clampdown, red_x, ix)
            lim_iy = jnp.where(clampdown, red_y, iy)
            lim_iz = jnp.where(clampdown, -jiz[k], iz)
            pt_x = inv22 * (k22 * -bx - k12 * -by)
            pt_y = inv22 * (k11 * -by - k12 * -bx)

            active = ls[k] != 0
            imp_x = jnp.where(active, lim_ix, pt_x)
            imp_y = jnp.where(active, lim_iy, pt_y)
            imp_z = jnp.where(active, lim_iz, 0.0)
            jix[k] = jix[k] + imp_x
            jiy[k] = jiy[k] + imp_y
            jiz[k] = jnp.where(
                active, jnp.where(clampdown, 0.0, jiz[k] + iz), jiz[k]
            )
            hvx = hvx - _MA * imp_x
            hvy = hvy - _MA * imp_y
            hw = hw - _IA * (r_ax[k] * imp_y - r_ay[k] * imp_x + imp_z)
            wvx[k] = wvx[k] + _MB * imp_x
            wvy[k] = wvy[k] + _MB * imp_y
            ww[k] = ww[k] + _IB * imp_z
        return hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp

    def pack(hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp, ni, ti):
        return (hvx, hvy, hw, tuple(wvx), tuple(wvy), tuple(ww),
                tuple(jix), tuple(jiy), tuple(jiz), tuple(mimp),
                tuple(ni), tuple(ti))

    def vel_body_contacts(_, carry):
        (hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp, ni, ti) = carry
        hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp = joints_once(
            hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp
        )
        ni, ti = list(ni), list(ti)
        vxf = jnp.concatenate([hvx] + list(wvx), axis=0)
        vyf = jnp.concatenate([hvy] + list(wvy), axis=0)
        wf = jnp.concatenate([hw] + list(ww), axis=0)

        def rel_vel(k):
            g = _dot2(WS, jnp.concatenate([vxf, vyf, wf], axis=1),
                      passes=_VEL_GATHER_PASSES)
            va_x, vb_x = g[0:MM, 0:E1], g[MM:, 0:E1]
            va_y, vb_y = g[0:MM, E1:2 * E1], g[MM:, E1:2 * E1]
            wa_g, wb_g = g[0:MM, 2 * E1:], g[MM:, 2 * E1:]
            dvx = vb_x - wb_g * r_bky[k] - va_x + wa_g * r_aky[k]
            dvy = vb_y + wb_g * r_bkx[k] - va_y - wa_g * r_akx[k]
            return dvx, dvy

        for k in range(2):
            dvx, dvy = rel_vel(k)
            vt = dvx * tx + dvy * ty
            max_f = _FRICTION * ni[k]
            new = jnp.clip(ti[k] - tmass[k] * vt, -max_f, max_f)
            new = jnp.where(ok[k], new, 0.0)
            lam = new - ti[k]
            ti[k] = new
            vxf, vyf, wf = contact_apply(vxf, vyf, wf, lam, k, tx, ty)
        for k in range(2):
            dvx, dvy = rel_vel(k)
            vn = dvx * nx + dvy * ny
            new = jnp.maximum(ni[k] - nmass[k] * vn, 0.0)
            new = jnp.where(ok[k], new, 0.0)
            lam = new - ni[k]
            ni[k] = new
            vxf, vyf, wf = contact_apply(vxf, vyf, wf, lam, k, nx, ny)

        hvx, hvy, hw = vxf[0:N], vyf[0:N], wf[0:N]
        wvx = [vxf[N + k * N:N + (k + 1) * N] for k in range(4)]
        wvy = [vyf[N + k * N:N + (k + 1) * N] for k in range(4)]
        ww = [wf[N + k * N:N + (k + 1) * N] for k in range(4)]
        return pack(hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp, ni, ti)

    def vel_body_joints(_, carry):
        (hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp, ni, ti) = carry
        hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp = joints_once(
            hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp
        )
        return pack(hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp, ni, ti)

    carry = pack(hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp, ni, ti)
    if has_contacts:
        carry = jax.lax.fori_loop(0, k_vel_c, vel_body_contacts, carry)
        carry = jax.lax.fori_loop(
            0, velocity_iters - k_vel_c, vel_body_joints, carry
        )
    else:
        carry = jax.lax.fori_loop(0, velocity_iters, vel_body_joints, carry)
    (hvx, hvy, hw, wvx, wvy, ww, jix, jiy, jiz, mimp, ni, ti) = carry
    wvx, wvy, ww = list(wvx), list(wvy), list(ww)

    if has_contacts:
        # Pre-integration positions — the poses the manifold (sep) was
        # collided on. The contact position loop only ever needs
        # com - com0, so it routes position DELTAS vs this base (|d| <=
        # ~2.2 m: one clamped integration step + corrections) through the
        # 2-pass dot instead of absolute world positions (|x| up to 333,
        # which would need HIGHEST to keep sub-slop accuracy).
        cx0f = jnp.concatenate([hcx] + list(wcx), axis=0)
        cy0f = jnp.concatenate([hcy] + list(wcy), axis=0)

    # ---- position integration with Box2D translation/rotation clamps.
    def clamp(vx, vy, w):
        tr2 = (dt * vx) ** 2 + (dt * vy) ** 2
        s_t = jnp.where(
            tr2 > C.B2_MAX_TRANSLATION ** 2,
            C.B2_MAX_TRANSLATION / jnp.sqrt(jnp.maximum(tr2, 1e-30)),
            1.0,
        )
        rot = dt * w
        s_r = jnp.where(
            rot * rot > C.B2_MAX_ROTATION ** 2,
            C.B2_MAX_ROTATION / jnp.maximum(jnp.abs(rot), 1e-30),
            1.0,
        )
        return vx * s_t, vy * s_t, w * s_r

    hvx, hvy, hw = clamp(hvx, hvy, hw)
    hcx = hcx + dt * hvx
    hcy = hcy + dt * hvy
    ha = ha + dt * hw
    for k in range(4):
        wvx[k], wvy[k], ww[k] = clamp(wvx[k], wvy[k], ww[k])
        wcx[k] = wcx[k] + dt * wvx[k]
        wcy[k] = wcy[k] + dt * wvy[k]
        wa_[k] = wa_[k] + dt * ww[k]

    # ---- position iterations (contacts then joints per b2Island).
    def joints_pos_once(hcx, hcy, ha, wcx, wcy, wa_):
        wcx, wcy, wa_ = list(wcx), list(wcy), list(wa_)
        for k in range(4):
            angle = wa_[k] - ha
            c_low = jnp.clip(
                angle - C.STEER_JOINT_LOWER + C.B2_ANGULAR_SLOP,
                -C.B2_MAX_ANGULAR_CORRECTION, 0.0,
            )
            c_up = jnp.clip(
                angle - C.STEER_JOINT_UPPER - C.B2_ANGULAR_SLOP,
                0.0, C.B2_MAX_ANGULAR_CORRECTION,
            )
            c_lim = jnp.where(
                ls[k] == 1, c_low, jnp.where(ls[k] == 2, c_up, 0.0)
            )
            li = -_MOTOR_MASS * c_lim
            ha = ha - _IA * li
            wa_[k] = wa_[k] + _IB * li

            sp, cp = jnp.sin(ha), jnp.cos(ha)
            rax = cp * _ARM_X[k] - sp * _ARM_Y[k]
            ray = sp * _ARM_X[k] + cp * _ARM_Y[k]
            cvx = wcx[k] - hcx - rax
            cvy = wcy[k] - hcy - ray
            k11 = _MA + _MB + _IA * ray * ray
            k12 = -_IA * rax * ray
            k22 = _MA + _MB + _IA * rax * rax
            det = k11 * k22 - k12 * k12
            inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
            px = inv * (k22 * -cvx - k12 * -cvy)
            py = inv * (k11 * -cvy - k12 * -cvx)
            hcx = hcx - _MA * px
            hcy = hcy - _MA * py
            ha = ha - _IA * (rax * py - ray * px)
            wcx[k] = wcx[k] + _MB * px
            wcy[k] = wcy[k] + _MB * py
        return hcx, hcy, ha, wcx, wcy, wa_

    def pos_body_contacts(_, carry):
        hcx, hcy, ha, wcx, wcy, wa2 = carry
        cxf = jnp.concatenate([hcx] + list(wcx), axis=0)
        cyf = jnp.concatenate([hcy] + list(wcy), axis=0)
        af = jnp.zeros_like(cxf)   # angle deltas only (rigid-shift manifold)
        for k in range(2):
            g = _dot2(
                WS, jnp.concatenate([cxf - cx0f, cyf - cy0f], axis=1)
            )
            da_x, db_x = g[0:MM, 0:E1], g[MM:, 0:E1]
            da_y, db_y = g[0:MM, E1:], g[MM:, E1:]
            shift = (db_x - da_x) * nx + (db_y - da_y) * ny
            cc = jnp.clip(
                C.B2_BAUMGARTE * (sep[k] + shift + C.B2_LINEAR_SLOP),
                -C.B2_MAX_LINEAR_CORRECTION, 0.0,
            )
            imp = jnp.where(ok[k], -cc * nmass[k], 0.0)
            px = imp * nx
            py = imp * ny
            la = r_akx[k] * py - r_aky[k] * px
            lb = r_bkx[k] * py - r_bky[k] * px
            dlin = _dot1(WDT, jnp.concatenate([px, py], axis=1)) * INVM
            cxf = cxf + dlin[:, 0:E1]
            cyf = cyf + dlin[:, E1:]
            af = af + _dot1(WBA, jnp.concatenate([lb, la], axis=0)) * INVI
        hcx, hcy = cxf[0:N], cyf[0:N]
        ha = ha + af[0:N]
        wcx = [cxf[N + k * N:N + (k + 1) * N] for k in range(4)]
        wcy = [cyf[N + k * N:N + (k + 1) * N] for k in range(4)]
        wa2 = [wa2[k] + af[N + k * N:N + (k + 1) * N] for k in range(4)]
        hcx, hcy, ha, wcx, wcy, wa2 = joints_pos_once(
            hcx, hcy, ha, wcx, wcy, wa2
        )
        return hcx, hcy, ha, tuple(wcx), tuple(wcy), tuple(wa2)

    def pos_body_joints(_, carry):
        hcx, hcy, ha, wcx, wcy, wa2 = carry
        hcx, hcy, ha, wcx, wcy, wa2 = joints_pos_once(
            hcx, hcy, ha, wcx, wcy, wa2
        )
        return hcx, hcy, ha, tuple(wcx), tuple(wcy), tuple(wa2)

    carry = (hcx, hcy, ha, tuple(wcx), tuple(wcy), tuple(wa_))
    if has_contacts:
        carry = jax.lax.fori_loop(0, k_pos_c, pos_body_contacts, carry)
    carry = jax.lax.fori_loop(
        0, position_iters - k_pos_c, pos_body_joints, carry
    )
    hcx, hcy, ha, wcx, wcy, wa_ = carry

    body = (hvx, hvy, hw, hcx, hcy, ha,
            list(wvx), list(wvy), list(ww), list(wcx), list(wcy), list(wa_))
    return body, jix, jiy, jiz, mimp, ni, ti


def _joint_init(ha, wa_, jiz, ls_prev):
    """b2RevoluteJoint::InitVelocityConstraints limit-state transition."""
    ls = []
    jiz = list(jiz)
    for k in range(4):
        jangle = wa_[k] - ha
        new_ls = jnp.where(
            jangle <= C.STEER_JOINT_LOWER, 1,
            jnp.where(jangle >= C.STEER_JOINT_UPPER, 2, 0),
        ).astype(jnp.int32)
        keep = (new_ls == ls_prev[k]) & (new_ls != 0)
        jiz[k] = jnp.where(keep, jiz[k], 0.0)
        ls.append(new_ls)
    return ls, jiz


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _read_common(hull_ref, wheel_ref, jnt_ref):
    hvx, hvy, hw = hull_ref[0], hull_ref[1], hull_ref[2]
    hcx, hcy, ha = hull_ref[3], hull_ref[4], hull_ref[5]
    wvx = [wheel_ref[0, k] for k in range(4)]
    wvy = [wheel_ref[1, k] for k in range(4)]
    ww = [wheel_ref[2, k] for k in range(4)]
    wcx = [wheel_ref[3, k] for k in range(4)]
    wcy = [wheel_ref[4, k] for k in range(4)]
    wa_ = [wheel_ref[5, k] for k in range(4)]
    jix = [jnt_ref[0, k] for k in range(4)]
    jiy = [jnt_ref[1, k] for k in range(4)]
    jiz = [jnt_ref[2, k] for k in range(4)]
    mimp = [jnt_ref[3, k] for k in range(4)]
    return (hvx, hvy, hw, hcx, hcy, ha, wvx, wvy, ww, wcx, wcy, wa_,
            jix, jiy, jiz, mimp)


def _write_common(hull_out, wheel_out, jnt_out, body, jix, jiy, jiz, mimp):
    (hvx, hvy, hw, hcx, hcy, ha, wvx, wvy, ww, wcx, wcy, wa_) = body
    hull_out[0], hull_out[1], hull_out[2] = hvx, hvy, hw
    hull_out[3], hull_out[4], hull_out[5] = hcx, hcy, ha
    for k in range(4):
        wheel_out[0, k] = wvx[k]
        wheel_out[1, k] = wvy[k]
        wheel_out[2, k] = ww[k]
        wheel_out[3, k] = wcx[k]
        wheel_out[4, k] = wcy[k]
        wheel_out[5, k] = wa_[k]
        jnt_out[0, k] = jix[k]
        jnt_out[1, k] = jiy[k]
        jnt_out[2, k] = jiz[k]
        jnt_out[3, k] = mimp[k]


def _make_solve_kernel(num_cars, velocity_iters, position_iters,
                       contact_velocity_iters, contact_position_iters, dt):
    """Solve-only kernel (differential baseline; manifolds from XLA)."""
    N = num_cars
    has_contacts = N > 1
    k_vel_c = min(contact_velocity_iters, velocity_iters) if has_contacts else 0
    k_pos_c = min(contact_position_iters, position_iters) if has_contacts else 0

    def kernel(hull_ref, wheel_ref, force_ref, jnt_ref, ls_ref, man_ref,
               ws_ref, wdt_ref, wba_ref, invm_ref, invi_ref,
               hull_out, wheel_out, jnt_out, ls_out, cimp_out):
        (hvx, hvy, hw, hcx, hcy, ha, wvx, wvy, ww, wcx, wcy, wa_,
         jix, jiy, jiz, mimp) = _read_common(hull_ref, wheel_ref, jnt_ref)
        mspeed = [jnt_ref[4, k] for k in range(4)]

        for k in range(4):
            wvx[k] = wvx[k] + dt * _MB * force_ref[0, k]
            wvy[k] = wvy[k] + dt * _MB * force_ref[1, k]

        ls_prev = [ls_ref[k] for k in range(4)]
        ls, jiz = _joint_init(ha, wa_, jiz, ls_prev)
        for k in range(4):
            ls_out[k] = ls[k]

        if has_contacts:
            man = (
                man_ref[0], man_ref[1],
                [man_ref[2], man_ref[4]], [man_ref[3], man_ref[5]],
                [man_ref[6], man_ref[7]],
                [man_ref[8] > 0.0, man_ref[9] > 0.0],
                [jnp.where(man_ref[8] > 0.0, man_ref[10], 0.0),
                 jnp.where(man_ref[9] > 0.0, man_ref[11], 0.0)],
                [jnp.where(man_ref[8] > 0.0, man_ref[12], 0.0),
                 jnp.where(man_ref[9] > 0.0, man_ref[13], 0.0)],
            )
            tbl = (ws_ref[:], wdt_ref[:], wba_ref[:],
                   invm_ref[:], invi_ref[:])
        else:
            man = tbl = None

        body = (hvx, hvy, hw, hcx, hcy, ha, wvx, wvy, ww, wcx, wcy, wa_)
        body, jix, jiy, jiz, mimp, ni, ti = _solve_core(
            N, velocity_iters, position_iters, k_vel_c, k_pos_c, dt,
            body, (jix, jiy, jiz, mimp, mspeed), ls, man, tbl,
        )
        _write_common(hull_out, wheel_out, jnt_out, body, jix, jiy, jiz, mimp)
        cimp_out[0], cimp_out[1] = ni[0], ni[1]
        cimp_out[2], cimp_out[3] = ti[0], ti[1]

    return kernel


def near_flags(cars, num_cars: int, per_pair: bool = False) -> jnp.ndarray:
    """Per-env broadphase (XLA): could ANY car pair produce a contact?

    AABB test per colliding fixture-body combination (hull-hull,
    hull-wheel; wheel-wheel is masked out by Box2D category bits), fattened
    by the polygon skin: if the fattened AABBs of a pair are disjoint,
    b2CollidePolygons culls it (sep > totalRadius) and every contact
    sub-pass is an algebraic no-op for that pair. Mirrors Box2D's
    AABB-tree broadphase semantics (SURVEY §2.10).

    cars: batched CarState (E, N, ...). Returns (E,) bool; with
    ``per_pair=True`` instead returns (E, P) bool over
    ``collide.car_pairs(n)`` order — used to size the prospective
    PAIR-level manifold partition (scripts/bench_extras.py nearpairs)."""
    n = num_cars
    s, c = jnp.sin(cars.hull_a), jnp.cos(cars.hull_a)          # (E, N)
    ac, as_ = jnp.abs(c), jnp.abs(s)
    # Hull: world AABB of the rotated local AABB (rel. COM).
    mid, half = _HULL_AABB_MID, _HULL_AABB_HALF
    hull_cx = cars.hull_c[..., 0] + c * mid[0] - s * mid[1]
    hull_cy = cars.hull_c[..., 1] + s * mid[0] + c * mid[1]
    hull_hx = ac * half[0] + as_ * half[1]
    hull_hy = as_ * half[0] + ac * half[1]
    # Wheels: symmetric local box about the wheel center.
    ws, wc = jnp.sin(cars.wheel_a), jnp.cos(cars.wheel_a)      # (E, N, 4)
    wx = cars.wheel_c[..., 0]
    wy = cars.wheel_c[..., 1]
    whx = jnp.abs(wc) * _WHEEL_AABB_HALF[0] + jnp.abs(ws) * _WHEEL_AABB_HALF[1]
    why = jnp.abs(ws) * _WHEEL_AABB_HALF[0] + jnp.abs(wc) * _WHEEL_AABB_HALF[1]

    def overlap(ax, ay, ahx, ahy, bx, by, bhx, bhy):
        return (jnp.abs(ax - bx) <= ahx + bhx + _BP_SLACK) & (
            jnp.abs(ay - by) <= ahy + bhy + _BP_SLACK
        )

    near = None
    pair_flags = []
    for (a, b) in collide.car_pairs(n):
        hits = [overlap(hull_cx[:, a], hull_cy[:, a], hull_hx[:, a],
                        hull_hy[:, a], hull_cx[:, b], hull_cy[:, b],
                        hull_hx[:, b], hull_hy[:, b])]
        for k in range(4):
            hits.append(overlap(hull_cx[:, a], hull_cy[:, a], hull_hx[:, a],
                                hull_hy[:, a], wx[:, b, k], wy[:, b, k],
                                whx[:, b, k], why[:, b, k]))
            hits.append(overlap(wx[:, a, k], wy[:, a, k], whx[:, a, k],
                                why[:, a, k], hull_cx[:, b], hull_cy[:, b],
                                hull_hx[:, b], hull_hy[:, b]))
        p = hits[0]
        for h in hits[1:]:
            p = p | h
        pair_flags.append(p)
        near = p if near is None else near | p
    if per_pair:
        return jnp.stack(pair_flags, axis=-1)                   # (E, P)
    return near


def _make_mega_kernel(num_cars, velocity_iters, position_iters,
                      contact_velocity_iters, contact_position_iters, dt,
                      force_no_contacts=False):
    """tire + Collide + solve in one program (the production path)."""
    N = num_cars
    has_contacts = N > 1
    k_vel_c = min(contact_velocity_iters, velocity_iters) if has_contacts else 0
    k_pos_c = min(contact_position_iters, position_iters) if has_contacts else 0

    def kernel(hull_ref, wheel_ref, tire_ref, fuel_ref, onroad_ref, jnt_ref,
               ls_ref, pids_ref, pimp_ref,
               lvx_ref, lvy_ref, lnx_ref, lny_ref, f2b_ref, lcx_ref, lcy_ref,
               fixa_ref, fixb_ref,
               ws_ref, wdt_ref, wba_ref, invm_ref, invi_ref,
               hull_out, wheel_out, jnt_out, ls_out, tire_out, fuel_out,
               ids_out, cimp_out):
        (hvx, hvy, hw, hcx, hcy, ha, wvx, wvy, ww, wcx, wcy, wa_,
         jix, jiy, jiz, mimp) = _read_common(hull_ref, wheel_ref, jnt_ref)
        gas = [tire_ref[0, k] for k in range(4)]
        brake = [tire_ref[1, k] for k in range(4)]
        steer = [tire_ref[2, k] for k in range(4)]
        spin = [tire_ref[3, k] for k in range(4)]
        phase = [tire_ref[4, k] for k in range(4)]
        fuel = fuel_ref[0]
        onroad = [onroad_ref[k] for k in range(4)]

        # --- 1. tire model (cd:172-266).
        mspeed, fx, fy, spin, phase, fuel, skid = _tire_core(
            ha, wa_, wvx, wvy, gas, brake, steer, spin, phase, fuel,
            onroad, dt,
        )
        fuel_out[0] = fuel
        for k in range(4):
            tire_out[0, k] = spin[k]
            tire_out[1, k] = phase[k]
            tire_out[2, k] = skid[k]

        # --- 2. integrate tire forces into wheel velocities (pre-solve
        # poses are what the Collide pass reads; forces only touch
        # velocities, so this commutes with it).
        wvx = [wvx[k] + dt * _MB * fx[k] for k in range(4)]
        wvy = [wvy[k] + dt * _MB * fy[k] for k in range(4)]

        ls_prev = [ls_ref[k] for k in range(4)]
        ls, jiz = _joint_init(ha, wa_, jiz, ls_prev)
        for k in range(4):
            ls_out[k] = ls[k]

        body = (hvx, hvy, hw, hcx, hcy, ha, wvx, wvy, ww, wcx, wcy, wa_)
        jnt = (jix, jiy, jiz, mimp, mspeed)

        def commit(body2, jix, jiy, jiz, mimp, ni, ti, cid):
            _write_common(hull_out, wheel_out, jnt_out, body2,
                          list(jix), list(jiy), list(jiz), list(mimp))
            cimp_out[0], cimp_out[1] = ni[0], ni[1]
            cimp_out[2], cimp_out[3] = ti[0], ti[1]
            ids_out[0] = cid

        def joints_only():
            # Collide would cull every pair and each contact sub-pass is an
            # algebraic no-op — run the joints-only island (same total
            # iteration counts).
            b2, jx, jy, jz, mi, _, _ = _solve_core(
                N, velocity_iters, position_iters, 0, 0, dt,
                body, jnt, ls, None, None,
            )
            z = pimp_ref[0] * 0.0
            commit(b2, jx, jy, jz, mi, [z, z], [z, z], pids_ref[0] * 0 - 1)

        # --- 3/4. Collide pass + solve.
        if has_contacts and not force_no_contacts:
            tb = dict(
                lvx=lvx_ref[:], lvy=lvy_ref[:], lnx=lnx_ref[:], lny=lny_ref[:],
                f2b=f2b_ref[:], lcx=lcx_ref[:], lcy=lcy_ref[:],
                fixa=fixa_ref[:], fixb=fixb_ref[:],
            )
            tbl = (ws_ref[:], wdt_ref[:], wba_ref[:],
                   invm_ref[:], invi_ref[:])
            prev_ids = pids_ref[0]
            prev_ni = [pimp_ref[0], pimp_ref[1]]
            prev_ti = [pimp_ref[2], pimp_ref[3]]

            (nx, ny, pkx, pky, sep, ok, ni, ti, cid) = _collide_core(
                N, tb, hcx, hcy, ha, wcx, wcy, wa_,
                prev_ids, prev_ni, prev_ti,
            )
            man = (nx, ny, pkx, pky, sep, ok, ni, ti)
            b2, jx, jy, jz, mi, ni, ti = _solve_core(
                N, velocity_iters, position_iters, k_vel_c, k_pos_c, dt,
                body, jnt, ls, man, tbl,
            )
            commit(b2, jx, jy, jz, mi, ni, ti, cid)
        else:
            joints_only()

    return kernel


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

def _grid_eb(E, mm=1):
    """Grid size and envs-per-program block.

    The per-program VMEM working set scales with eb * manifold rows. The
    2-agent case (MM=48) fits a whole 4096-env batch in one program; larger
    agent counts (MM grows ~N^2: 288 at N=4) must shrink the env block or
    the kernel VMEM-OOMs (measured 534 MB scoped at N=4, eb=4096). Scale
    eb so eb*MM stays within half the 2-agent budget (margin for the
    register allocator), keeping eb a power-of-two divisor of E."""
    cap = MAX_ENVS_PER_PROGRAM
    if mm > 48:
        cap = max(128, (MAX_ENVS_PER_PROGRAM * 24 // mm) // 128 * 128)
    eb = 1
    while eb * 2 <= min(E, cap) and E % (eb * 2) == 0:
        eb *= 2
    if E <= cap:
        eb = E                       # odd small batches: one program
    return E // eb, eb


def _specs(eb, mem):
    def bspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape + (eb,),
            (lambda g, _nd=nd: (0,) * _nd + (g,)),
            memory_space=mem,
        )

    def cspec(t):
        nd = t.ndim
        return pl.BlockSpec(
            t.shape, (lambda g, _nd=nd: (0,) * _nd), memory_space=mem
        )

    return bspec, cspec


def _t2(x):                      # (E, a) -> (a, E)
    return jnp.transpose(x, (1, 0)).astype(jnp.float32)


def _t3(x):                      # (E, a, b) -> (b, a, E)
    return jnp.transpose(x, (2, 1, 0)).astype(jnp.float32)


def _u2(x):                      # (a, E) -> (E, a)
    return jnp.transpose(x, (1, 0))


def _u3(x):                      # (b, a, E) -> (E, a, b)
    return jnp.transpose(x, (2, 1, 0))


def _pack_state(cars):
    hull_in = jnp.stack([
        _t2(cars.hull_v[..., 0]), _t2(cars.hull_v[..., 1]), _t2(cars.hull_w),
        _t2(cars.hull_c[..., 0]), _t2(cars.hull_c[..., 1]), _t2(cars.hull_a),
    ])                                                    # (6, N, E)
    wheel_in = jnp.stack([
        _t3(cars.wheel_v[..., 0]), _t3(cars.wheel_v[..., 1]), _t3(cars.wheel_w),
        _t3(cars.wheel_c[..., 0]), _t3(cars.wheel_c[..., 1]), _t3(cars.wheel_a),
    ])                                                    # (6, 4, N, E)
    return hull_in, wheel_in


def _unpack_state(cars, hull_o, wheel_o, jnt_o, ls_o):
    return cars.replace(
        hull_v=jnp.stack([_u2(hull_o[0]), _u2(hull_o[1])], axis=-1),
        hull_w=_u2(hull_o[2]),
        hull_c=jnp.stack([_u2(hull_o[3]), _u2(hull_o[4])], axis=-1),
        hull_a=_u2(hull_o[5]),
        wheel_v=jnp.stack([_u3(wheel_o[0]), _u3(wheel_o[1])], axis=-1),
        wheel_w=_u3(wheel_o[2]),
        wheel_c=jnp.stack([_u3(wheel_o[3]), _u3(wheel_o[4])], axis=-1),
        wheel_a=_u3(wheel_o[5]),
        joint_impulse=jnp.stack(
            [_u3(jnt_o[0]), _u3(jnt_o[1]), _u3(jnt_o[2])], axis=-1
        ),
        motor_impulse=_u3(jnt_o[3]),
        limit_state=jnp.transpose(ls_o, (2, 1, 0)),
    )


def _contact_tbls(N, f32):
    """(WS (2MM,5N), WDT (5N,MM), WBA=[WB^T | -WA^T] (5N,2MM), INVM, INVI).

    WS gathers both manifold sides in one dot; WBA applies the angular
    impulse of both sides in one dot — half the MXU calls per solver
    iteration vs separate WA/WB/WAT/WBT contractions."""
    if N > 1:
        wa_np, wb_np, wd_np, invm_np, invi_np = _contact_tables(N)
        ws = np.concatenate([wa_np, wb_np], axis=0)
        wba = np.concatenate([wb_np.T, -wa_np.T], axis=1)
        return [
            jnp.asarray(ws), jnp.asarray(wd_np.T), jnp.asarray(wba),
            jnp.asarray(invm_np), jnp.asarray(invi_np),
        ]
    return [jnp.zeros((1, 1), f32)] * 5


_VMEM_LIMIT = 116 * 1024 * 1024


def world_step_batched(
    cars: CarState,            # batched (E, N, ...)
    wheel_force: jnp.ndarray,  # (E, N, 4, 2)
    motor_speed: jnp.ndarray,  # (E, N, 4)
    bundle,                    # batched collide.ContactBundle or None
    num_cars: int,
    velocity_iters: int = C.VELOCITY_ITERS,
    position_iters: int = C.POSITION_ITERS,
    contact_velocity_iters: int = C.CONTACT_VELOCITY_ITERS,
    contact_position_iters: int = C.CONTACT_POSITION_ITERS,
    dt: float = C.DT,
    interpret: bool = False,
):
    """Batched world_step via the solve kernel (manifolds from XLA).

    Returns (new CarState (E, ...), (normal_imp, tangent_imp) (E, MM, 2)) —
    the same results as ``vmap(world.world_step)`` up to float noise."""
    E, N = cars.hull_c.shape[0], num_cars
    f32 = jnp.float32
    hull_in, wheel_in = _pack_state(cars)
    force_in = jnp.stack(
        [_t3(wheel_force[..., 0]), _t3(wheel_force[..., 1])]
    )                                                     # (2, 4, N, E)
    jnt_in = jnp.stack([
        _t3(cars.joint_impulse[..., 0]), _t3(cars.joint_impulse[..., 1]),
        _t3(cars.joint_impulse[..., 2]), _t3(cars.motor_impulse),
        _t3(motor_speed),
    ])                                                    # (5, 4, N, E)
    ls_in = jnp.transpose(cars.limit_state, (2, 1, 0))    # (4, N, E) int32

    if bundle is not None:
        man = bundle.man
        mm = man.normal.shape[1]
        man_in = jnp.stack([
            _t2(man.normal[..., 0]), _t2(man.normal[..., 1]),
            _t2(man.point[:, :, 0, 0]), _t2(man.point[:, :, 0, 1]),
            _t2(man.point[:, :, 1, 0]), _t2(man.point[:, :, 1, 1]),
            _t2(man.separation[..., 0]), _t2(man.separation[..., 1]),
            _t2(man.point_ok[..., 0].astype(f32)),
            _t2(man.point_ok[..., 1].astype(f32)),
            _t2(bundle.normal_imp[..., 0]), _t2(bundle.normal_imp[..., 1]),
            _t2(bundle.tangent_imp[..., 0]), _t2(bundle.tangent_imp[..., 1]),
        ])                                                # (14, MM, E)
    else:
        mm = 1
        man_in = jnp.zeros((14, 1, E), f32)

    kern = _make_solve_kernel(
        N, velocity_iters, position_iters,
        contact_velocity_iters, contact_position_iters, dt,
    )
    grid, eb = _grid_eb(E, mm)
    mem = pltpu.VMEM if not interpret else pltpu.ANY
    bspec, cspec = _specs(eb, mem)
    tbls = _contact_tbls(N, f32)

    hull_o, wheel_o, jnt_o, ls_o, cimp_o = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            bspec(6, N), bspec(6, 4, N), bspec(2, 4, N), bspec(5, 4, N),
            bspec(4, N), bspec(14, mm),
        ] + [cspec(t) for t in tbls],
        out_specs=[
            bspec(6, N), bspec(6, 4, N), bspec(4, 4, N), bspec(4, N),
            bspec(4, mm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, N, E), f32),
            jax.ShapeDtypeStruct((6, 4, N, E), f32),
            jax.ShapeDtypeStruct((4, 4, N, E), f32),
            jax.ShapeDtypeStruct((4, N, E), jnp.int32),
            jax.ShapeDtypeStruct((4, mm, E), f32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(hull_in, wheel_in, force_in, jnt_in, ls_in, man_in, *tbls)

    new_cars = _unpack_state(cars, hull_o, wheel_o, jnt_o, ls_o)
    if bundle is None:
        return new_cars, None
    n_imp = jnp.stack([_u2(cimp_o[0]), _u2(cimp_o[1])], axis=-1)   # (E, MM, 2)
    t_imp = jnp.stack([_u2(cimp_o[2]), _u2(cimp_o[3])], axis=-1)
    return new_cars, (n_imp, t_imp)


def step_physics_batched(
    cars: CarState,              # batched (E, N, ...)
    wheel_on_road: jnp.ndarray,  # (E, N, 4) bool — LAGGED tile contact
    contact_state,               # batched collide.ContactState
    num_cars: int,
    velocity_iters: int = C.VELOCITY_ITERS,
    position_iters: int = C.POSITION_ITERS,
    contact_velocity_iters: int = C.CONTACT_VELOCITY_ITERS,
    contact_position_iters: int = C.CONTACT_POSITION_ITERS,
    dt: float = C.DT,
    interpret: bool = False,
    force_no_contacts: bool = False,
    partition_cap: int = 0,
    partition_cap2: int = 0,
    pair_partition_cap: int = 0,
    coupled_cap: int = 0,
):
    """Fused tire + Collide + solve (one program per env block).

    Equivalent to ``tire.tire_step`` -> ``collide.collide`` ->
    ``collide.make_bundle`` -> ``world.world_step`` -> impulse extraction,
    up to float-accumulation noise.

    ``force_no_contacts``: compile the joints-only island (used as the
    far-envs kernel of the contact partition; exact for envs whose pairs
    the broadphase culls).

    ``partition_cap`` > 0 enables the contact partition: an XLA broadphase
    (near_flags) splits the batch; up to ``cap`` broadphase-positive envs
    are gathered into a compact sub-batch that runs the full
    collide+contact kernel, everyone runs the (much cheaper) joints-only
    kernel, and results scatter back. If more than ``cap`` envs are near,
    a lax.cond falls back to the full kernel on the whole batch — results
    are exact either way (Box2D likewise only dispatches
    broadphase-surviving pairs to its narrow phase/solver).

    ``partition_cap2`` > ``partition_cap`` adds a second tier: when the
    near count overflows the first cap but fits the second, the partition
    runs at the bigger cap instead of falling all the way back to the
    full kernel. This is the workload-matched default for trained
    policies — pack racing measures ~52% broadphase-near envs
    (docs/PERF.md "Policy-driven workload"), which overflowed the single
    E/4 cap on most steps and cost a 33% throughput cliff with no env-var
    tuning to save it. Compiles one extra full-kernel variant.

    ``pair_partition_cap`` > 0 (N >= 3 only) enables the finer PAIR-level
    partition: each broadphase-near car PAIR whose env has no car in two
    near pairs is routed through the 2-car kernel (48 manifold rows
    instead of the full P*48), and only envs with COUPLED near pairs (a
    car shared by >= 2 near pairs, where Gauss-Seidel impulse propagation
    ties the pairs together) fall back to the compact full-N sub-batch
    (``coupled_cap`` slots). Exact: a far pair's contact ops are algebraic
    no-ops, so a vertex-disjoint near pair solves independently of the
    rest of its env, and the per-car scatter overwrites the joints-only
    base only for the two cars actually in the pair.

    Returns (new CarState, skid (E, N, 4) bool, new collide.ContactState).
    """
    E, N = cars.hull_c.shape[0], num_cars
    mm = contact_state.ids.shape[1] if N > 1 else 1
    kw = dict(
        velocity_iters=velocity_iters, position_iters=position_iters,
        contact_velocity_iters=contact_velocity_iters,
        contact_position_iters=contact_position_iters,
        dt=dt, interpret=interpret,
    )
    packed = _pack_inputs(cars, wheel_on_road, contact_state, N, E, mm)

    if (pair_partition_cap and N > 2 and not force_no_contacts
            and coupled_cap and E > coupled_cap):
        outs = _pair_partition_step(
            cars, packed, N, E, mm, pair_partition_cap, coupled_cap, kw
        )
        return _unpack_outputs(cars, outs)

    if partition_cap and N > 1 and not force_no_contacts and E > partition_cap:
        near = near_flags(cars, N)
        n_near = jnp.sum(near)

        def make_fast(cap):
            def fast(packed):
                # Compact the broadphase-positive envs into `cap` slots with
                # a cumsum + one (E,)-int32 scatter. The partition operates
                # on the 9 packed env-minor kernel inputs / 8 outputs — NOT
                # the CarState pytree — so routing is ~17 last-axis
                # gathers/scatters instead of ~80 (a stable argsort over E
                # plus full-tree routing measured ~1.3 ms/step of pure
                # overhead at E=4096; docs/PERF.md).
                pos = jnp.cumsum(near) - 1
                slot = jnp.where(near, pos, cap).astype(jnp.int32)
                sub = jnp.zeros((cap,), jnp.int32).at[slot].set(
                    jnp.arange(E, dtype=jnp.int32), mode="drop"
                )
                sub_out = _call_packed(
                    tuple(x[..., sub] for x in packed), N, cap, mm,
                    force_no_contacts=False, **kw,
                )
                all_out = _joints_only_call(packed, N, E, mm, **kw)
                # Unconditional scatter is exact: a broadphase-negative env
                # in the (padded) sub-batch produces bit-equal results to
                # the joints-only kernel (all its contact ops add exact
                # zeros), and duplicate pad slots (unused entries point at
                # env 0) write identical values.
                return tuple(
                    a.at[..., sub].set(b) for a, b in zip(all_out, sub_out)
                )

            return fast

        def slow(packed):
            return _call_packed(
                packed, N, E, mm, force_no_contacts=False, **kw
            )

        caps = [partition_cap]
        if partition_cap2 > partition_cap and E > partition_cap2:
            caps.append(partition_cap2)

        branch = slow
        for cap in reversed(caps):
            def branch(packed, _f=make_fast(cap), _nxt=branch, _cap=cap):
                return jax.lax.cond(n_near <= _cap, _f, _nxt, packed)

        outs = branch(packed)
    elif force_no_contacts or N == 1:
        outs = _joints_only_call(packed, N, E, mm, **kw)
    else:
        outs = _call_packed(
            packed, N, E, mm, force_no_contacts=force_no_contacts, **kw
        )
    return _unpack_outputs(cars, outs)


def _pair_partition_step(cars, packed, N, E, mm, pcap, ccap, kw):
    """PAIR-level contact partition (N >= 3).

    Three kernels instead of one: (1) joints-only over all E envs (the
    base), (2) the 2-car full kernel over up to ``pcap`` compacted near
    PAIRS (mm2 = mm/P manifold rows per slot — a ~P-fold cut of the
    dominant per-iteration routing work vs gathering whole envs), (3) the
    full N-car kernel over up to ``ccap`` COUPLED envs (a car in >= 2
    near pairs — the only case where pair solves don't separate).

    Exactness argument (mirrors the env partition's): a broadphase-far
    pair's Collide culls every fixture pair, so its contact sub-passes
    add exact zeros — a vertex-disjoint near pair (a, b) therefore solves
    bit-equal to the full kernel restricted to cars {a, b}; the per-car
    scatter overwrites the base for exactly those cars. Pad slots point
    at (pair 0, env 0): they write either the joints-only-equal value
    (pair far), a duplicate of env 0's own slot (pair near, env simple),
    or are overwritten by the later coupled-env scatter (env coupled).
    If the broadphase finds more eligible pairs than ``pcap`` or more
    coupled envs than ``ccap``, a lax.cond falls back to the full kernel
    on the whole batch — exact either way.
    """
    pairs = collide.car_pairs(N)
    npairs = len(pairs)
    mm2 = mm // npairs                       # manifold rows per pair (48)
    pa = jnp.asarray(np.asarray([a for a, _ in pairs]), jnp.int32)
    pb = jnp.asarray(np.asarray([b for _, b in pairs]), jnp.int32)

    pnear = near_flags(cars, N, per_pair=True)            # (E, P) bool
    deg = jnp.zeros((E, N), jnp.int32)
    for pi, (a, b) in enumerate(pairs):
        f = pnear[:, pi].astype(jnp.int32)
        deg = deg.at[:, a].add(f).at[:, b].add(f)
    coupled = jnp.any(deg >= 2, axis=1)                   # (E,)
    elig = pnear & ~coupled[:, None]                      # (E, P)
    n_elig = jnp.sum(elig)
    n_coup = jnp.sum(coupled)

    def fast(packed):
        all_out = _joints_only_call(packed, N, E, mm, **kw)

        # --- (2) pair sub-batch through the 2-car kernel.
        flags = jnp.reshape(jnp.transpose(elig), (-1,))   # (P*E,) p*E + e
        pos = jnp.cumsum(flags) - 1
        slot = jnp.where(flags, pos, pcap).astype(jnp.int32)
        sub = jnp.zeros((pcap,), jnp.int32).at[slot].set(
            jnp.arange(npairs * E, dtype=jnp.int32), mode="drop"
        )
        p_s, e_s = sub // E, sub % E
        colAB = jnp.concatenate([pa[p_s] * E + e_s, pb[p_s] * E + e_s])
        rowflat = jnp.reshape(
            (p_s[None, :] * mm2 + jnp.arange(mm2, dtype=jnp.int32)[:, None])
            * E + e_s[None, :],
            (-1,),
        )                                                  # (mm2*pcap,)

        def gcar(x):      # (..., N, E) -> (..., 2, pcap)
            sh = x.shape
            fl = jnp.reshape(x, sh[:-2] + (sh[-2] * sh[-1],))
            return jnp.reshape(
                jnp.take(fl, colAB, axis=-1), sh[:-2] + (2, pcap)
            )

        def gman(x):      # (c, mm, E) -> (c, mm2, pcap)
            fl = jnp.reshape(x, (x.shape[0], mm * E))
            return jnp.reshape(
                jnp.take(fl, rowflat, axis=-1), (x.shape[0], mm2, pcap)
            )

        packed2 = tuple(gcar(x) for x in packed[:7]) + (
            gman(packed[7]), gman(packed[8]),
        )
        sub2 = _call_packed(
            packed2, 2, pcap, mm2, force_no_contacts=False, **kw
        )

        def scar(full, val):
            sh = full.shape
            fl = jnp.reshape(full, sh[:-2] + (sh[-2] * sh[-1],))
            v = jnp.reshape(val, val.shape[:-2] + (2 * pcap,))
            return jnp.reshape(fl.at[..., colAB].set(v), sh)

        def sman(full, val):
            fl = jnp.reshape(full, (full.shape[0], mm * E))
            v = jnp.reshape(val, (val.shape[0], mm2 * pcap))
            return jnp.reshape(fl.at[..., rowflat].set(v), full.shape)

        out = [scar(a, b) for a, b in zip(all_out[:6], sub2[:6])]
        out.append(sman(all_out[6], sub2[6]))
        out.append(sman(all_out[7], sub2[7]))

        # --- (3) coupled envs through the full N-car kernel.
        cpos = jnp.cumsum(coupled) - 1
        cslot = jnp.where(coupled, cpos, ccap).astype(jnp.int32)
        csub = jnp.zeros((ccap,), jnp.int32).at[cslot].set(
            jnp.arange(E, dtype=jnp.int32), mode="drop"
        )
        sub4 = _call_packed(
            tuple(x[..., csub] for x in packed), N, ccap, mm,
            force_no_contacts=False, **kw,
        )
        return tuple(
            a.at[..., csub].set(b) for a, b in zip(out, sub4)
        )

    def slow(packed):
        return _call_packed(packed, N, E, mm, force_no_contacts=False, **kw)

    return jax.lax.cond(
        (n_elig <= pcap) & (n_coup <= ccap), fast, slow, packed
    )


def _pack_inputs(cars, wheel_on_road, contact_state, N, E, mm):
    """CarState / ContactState -> the 9 packed env-minor kernel inputs."""
    f32 = jnp.float32
    hull_in, wheel_in = _pack_state(cars)
    tire_in = jnp.stack([
        _t3(cars.gas), _t3(cars.brake), _t3(cars.steer), _t3(cars.spin),
        _t3(cars.phase),
    ])                                                    # (5, 4, N, E)
    fuel_in = _t2(cars.fuel_spent)[None]                  # (1, N, E)
    onroad_in = _t3(wheel_on_road.astype(f32))            # (4, N, E)
    jnt_in = jnp.stack([
        _t3(cars.joint_impulse[..., 0]), _t3(cars.joint_impulse[..., 1]),
        _t3(cars.joint_impulse[..., 2]), _t3(cars.motor_impulse),
    ])                                                    # (4, 4, N, E)
    ls_in = jnp.transpose(cars.limit_state, (2, 1, 0))    # (4, N, E) int32

    if N > 1:
        pids_in = jnp.transpose(contact_state.ids, (1, 0))[None]   # (1, MM, E)
        pimp_in = jnp.stack([
            _t2(contact_state.normal_imp[..., 0]),
            _t2(contact_state.normal_imp[..., 1]),
            _t2(contact_state.tangent_imp[..., 0]),
            _t2(contact_state.tangent_imp[..., 1]),
        ])                                                # (4, MM, E)
    else:
        pids_in = jnp.full((1, 1, E), -1, jnp.int32)
        pimp_in = jnp.zeros((4, 1, E), f32)
    return (hull_in, wheel_in, tire_in, fuel_in, onroad_in, jnt_in, ls_in,
            pids_in, pimp_in)


def _joints_only_call(packed, N, E, mm, **kw):
    """Joints-only kernel dispatch: full-sublane flat layout by default,
    MCR_JOINTS_FLAT=0 keeps the (N, E)-plane layout for A/B timing."""
    if os.environ.get("MCR_JOINTS_FLAT", "1") == "0":
        return _call_packed(packed, N, E, mm, force_no_contacts=True, **kw)
    return _call_packed_flat(packed, N, E, mm, **kw)


def _call_packed_flat(packed, N, E, mm, **kw):
    """Joints-only mega-kernel call in FULL-SUBLANE layout.

    The joints-only island (the partition's base kernel, and the whole
    N=1 solver) is 100% elementwise over the (car, env) plane — no op
    mixes rows — so the plane layout is free to choose. The natural
    (N, E) layout occupies only N of 8 sublanes per vreg (a 4x vector-op
    inflation at N=2, the docs/PERF.md "Solver roofline" gap (a)). This
    wrapper reshapes every packed input's trailing (A, E) dims to
    (A*8/N, N*E/8) row-major OUTSIDE the kernel (an XLA relayout of a few
    MB), runs the identical kernel with full 8-sublane vregs, and
    reshapes the outputs back — bit-exact by construction, since every
    element sees the same arithmetic at a different vreg position.
    Falls back to the plain call when the reshape doesn't divide."""
    S = 8
    eb = _grid_eb(E, mm)[1]
    if (N * E) % S or (eb * N) % S:
        return _call_packed(packed, N, E, mm, force_no_contacts=True, **kw)
    EF = N * E // S
    mmf = mm * E // EF

    def rflat(x):
        a = x.shape[-2]
        return jnp.reshape(x, x.shape[:-2] + (a * E // EF, EF))

    outs = _call_packed(
        tuple(rflat(x) for x in packed), S, EF, mmf,
        force_no_contacts=True, **kw,
    )
    back = (N, N, N, N, N, N, mm, mm)

    def unflat(x, a):
        return jnp.reshape(x, x.shape[:-2] + (a, E))

    return tuple(unflat(o, a) for o, a in zip(outs, back))


def _call_packed(packed, N, E, mm, *, velocity_iters, position_iters,
                 contact_velocity_iters, contact_position_iters, dt,
                 interpret, force_no_contacts):
    """Run the fused mega-kernel on packed inputs; returns 8 packed outputs."""
    (hull_in, wheel_in, tire_in, fuel_in, onroad_in, jnt_in, ls_in,
     pids_in, pimp_in) = packed
    f32 = jnp.float32
    if N > 1 and not force_no_contacts:
        ct = _collide_tables(N)
        ctbls = [
            jnp.asarray(ct["lvx"]), jnp.asarray(ct["lvy"]),
            jnp.asarray(ct["lnx"]), jnp.asarray(ct["lny"]),
            jnp.asarray(ct["f2b"]), jnp.asarray(ct["lcx"]),
            jnp.asarray(ct["lcy"]), jnp.asarray(ct["fixa"]),
            jnp.asarray(ct["fixb"]),
        ]
    else:
        ctbls = [jnp.zeros((1, 1), f32)] * 9

    kern = _make_mega_kernel(
        N, velocity_iters, position_iters,
        contact_velocity_iters, contact_position_iters, dt,
        force_no_contacts=force_no_contacts,
    )
    grid, eb = _grid_eb(E, mm)
    mem = pltpu.VMEM if not interpret else pltpu.ANY
    bspec, cspec = _specs(eb, mem)
    # force_no_contacts never reads the collide/contact tables — ship (1,1)
    # dummies instead of DMA'ing the full constant tables to every program.
    tbls = (_contact_tbls(N, f32) if N > 1 and not force_no_contacts
            else [jnp.zeros((1, 1), f32)] * 5)

    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            bspec(6, N), bspec(6, 4, N), bspec(5, 4, N), bspec(1, N),
            bspec(4, N), bspec(4, 4, N), bspec(4, N), bspec(1, mm),
            bspec(4, mm),
        ] + [cspec(t) for t in ctbls] + [cspec(t) for t in tbls],
        out_specs=[
            bspec(6, N), bspec(6, 4, N), bspec(4, 4, N), bspec(4, N),
            bspec(3, 4, N), bspec(1, N), bspec(1, mm), bspec(4, mm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, N, E), f32),
            jax.ShapeDtypeStruct((6, 4, N, E), f32),
            jax.ShapeDtypeStruct((4, 4, N, E), f32),
            jax.ShapeDtypeStruct((4, N, E), jnp.int32),
            jax.ShapeDtypeStruct((3, 4, N, E), f32),
            jax.ShapeDtypeStruct((1, N, E), f32),
            jax.ShapeDtypeStruct((1, mm, E), jnp.int32),
            jax.ShapeDtypeStruct((4, mm, E), f32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(hull_in, wheel_in, tire_in, fuel_in, onroad_in, jnt_in, ls_in,
      pids_in, pimp_in, *ctbls, *tbls)


def _unpack_outputs(cars, outs):
    """8 packed kernel outputs -> (new CarState, skid, new ContactState)."""
    hull_o, wheel_o, jnt_o, ls_o, tire_o, fuel_o, ids_o, cimp_o = outs
    new_cars = _unpack_state(cars, hull_o, wheel_o, jnt_o, ls_o)
    new_cars = new_cars.replace(
        spin=_u3(tire_o[0]),
        phase=_u3(tire_o[1]),
        fuel_spent=_u2(fuel_o[0]),
    )
    skid = _u3(tire_o[2]) > 0.0                            # (E, N, 4)
    new_cs = collide.ContactState(
        normal_imp=jnp.stack([_u2(cimp_o[0]), _u2(cimp_o[1])], axis=-1),
        tangent_imp=jnp.stack([_u2(cimp_o[2]), _u2(cimp_o[3])], axis=-1),
        ids=jnp.transpose(ids_o[0], (1, 0)),
    )
    return new_cars, skid, new_cs
