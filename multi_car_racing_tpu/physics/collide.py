"""Car-car polygon contacts: manifold generation + impulse solver.

The only non-sensor collisions in the game (SURVEY.md §2.10): hull-hull and
cross-car wheel-hull pairs (wheel-wheel is masked out by category bits,
cd:108-109; own-car wheel-hull pairs are joint-connected and skip collision).

Box2D semantics reproduced:
- ``b2CollidePolygons``: SAT max-separation over both polys' face normals,
  reference-face selection with the 0.1*linearSlop bias, incident-edge
  clipping, up to two contact points, polygon skin radii.
- ``b2ContactSolver``: warm starting (impulses persist while the manifold's
  feature id persists), friction-first accumulated-clamp velocity solve
  (friction sqrt(0.2*0.2), restitution 0), Baumgarte position push-out with
  slop and maxLinearCorrection.

Documented divergences (collision outcomes are tolerance-level events,
SURVEY.md §7.1): within one velocity iteration the manifolds are solved in
three Jacobi sub-passes (friction, normal point 0, normal point 1) instead of
Box2D's per-contact sequential sweep; the 2-point block solver is per-point;
the position pass reuses the Collide-time manifold moved rigidly with the
bodies instead of re-clipping. With the reference's 180/60 iterations both
formulations converge to the same contact fixed point.

Structure: bodies are flattened to ``5N`` slots (hull + 4 wheels per car) and
manifolds to ``P*48`` rows; body<->manifold routing uses static 0/1 incidence
matrices so the whole solver is a handful of small matmuls per iteration —
no gathers, no scatters, loop-friendly graph size.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from . import shapes
from .joints import Velocities, Positions

_TOTAL_RADIUS = 2.0 * C.B2_POLYGON_RADIUS
_FRICTION = C.HULL_FRICTION

FIXTURE_PAIRS = [
    (fa, fb) for fa in range(8) for fb in range(8) if not (fa >= 4 and fb >= 4)
]
M_PER_PAIR = len(FIXTURE_PAIRS)          # 48


def car_pairs(n: int):
    return list(itertools.combinations(range(n), 2))


def _tables(num_cars: int):
    """Static routing tables for the flattened manifold list."""
    pairs = car_pairs(num_cars)
    body = shapes.CAR_FIXTURE_BODY
    rows_a, rows_b = [], []
    for (a, b) in pairs:
        for (fa, fb) in FIXTURE_PAIRS:
            rows_a.append(a * 5 + body[fa])
            rows_b.append(b * 5 + body[fb])
    # Manifold -> flat-fixture (car*8 + fixture) index, for the batched
    # Collide pass.
    fix_a = np.asarray(
        [a * 8 + fa for (a, _) in pairs for (fa, _) in FIXTURE_PAIRS]
    )
    fix_b = np.asarray(
        [b * 8 + fb for (_, b) in pairs for (_, fb) in FIXTURE_PAIRS]
    )
    mm = len(rows_a)
    nb = num_cars * 5
    wa = np.zeros((mm, nb), np.float32)
    wb = np.zeros((mm, nb), np.float32)
    wa[np.arange(mm), rows_a] = 1.0
    wb[np.arange(mm), rows_b] = 1.0
    inv_m = np.tile(
        np.asarray([shapes.HULL_INV_MASS] + [shapes.WHEEL_INV_MASS] * 4), num_cars
    ).astype(np.float32)
    inv_i = np.tile(
        np.asarray([shapes.HULL_INV_I] + [shapes.WHEEL_INV_I] * 4), num_cars
    ).astype(np.float32)
    return pairs, np.asarray(rows_a), np.asarray(rows_b), wa, wb, inv_m, inv_i, fix_a, fix_b


_TABLE_CACHE: dict = {}


def tables(num_cars: int):
    if num_cars not in _TABLE_CACHE:
        _TABLE_CACHE[num_cars] = _tables(num_cars)
    return _TABLE_CACHE[num_cars]


# ---------------------------------------------------------------------------
# Flat body-state helpers
# ---------------------------------------------------------------------------

def flatten_vel(vel: Velocities):
    """-> (V (5N, 2), W (5N,))."""
    n = vel.hull_v.shape[0]
    v = jnp.concatenate(
        [vel.hull_v[:, None, :], vel.wheel_v], axis=1
    ).reshape(5 * n, 2)
    w = jnp.concatenate([vel.hull_w[:, None], vel.wheel_w], axis=1).reshape(5 * n)
    return v, w


def unflatten_vel(v, w, n) -> Velocities:
    v = v.reshape(n, 5, 2)
    w = w.reshape(n, 5)
    return Velocities(
        hull_v=v[:, 0], hull_w=w[:, 0], wheel_v=v[:, 1:], wheel_w=w[:, 1:]
    )


def flatten_com(pos_hull_c, pos_hull_a, wheel_c, wheel_a):
    n = pos_hull_c.shape[0]
    c = jnp.concatenate([pos_hull_c[:, None, :], wheel_c], axis=1).reshape(5 * n, 2)
    a = jnp.concatenate([pos_hull_a[:, None], wheel_a], axis=1).reshape(5 * n)
    return c, a


# ---------------------------------------------------------------------------
# Manifold generation (Collide pass)
# ---------------------------------------------------------------------------

def _take_row(arr, i):
    oh = (jnp.arange(arr.shape[0]) == i).astype(arr.dtype)
    return jnp.tensordot(oh, arr, axes=1,
                         precision=jax.lax.Precision.HIGHEST)


def _max_separation(va, na, vb):
    d = jnp.einsum("ic,jc->ij", na, vb,
                   precision=jax.lax.Precision.HIGHEST) - jnp.sum(
        na * va, axis=-1, keepdims=True)
    s = jnp.min(d, axis=1)
    edge = jnp.argmax(s).astype(jnp.int32)
    return jnp.max(s), edge


def _collide_pair(va, na, vb, nb):
    """One fixture pair -> (normal (2,), pts (2,2), seps (2,), ok (2,), id)."""
    sep_a, edge_a = _max_separation(va, na, vb)
    sep_b, edge_b = _max_separation(vb, nb, va)
    no_contact = (sep_a > _TOTAL_RADIUS) | (sep_b > _TOTAL_RADIUS)

    flip = sep_b > sep_a + 0.1 * C.B2_LINEAR_SLOP
    ref_v = jnp.where(flip, vb, va)
    ref_n = jnp.where(flip, nb, na)
    inc_v = jnp.where(flip, va, vb)
    inc_n = jnp.where(flip, na, nb)
    ref_edge = jnp.where(flip, edge_b, edge_a)

    rn = _take_row(ref_n, ref_edge)
    inc_edge = jnp.argmin(
        jnp.einsum("c,jc->j", rn, inc_n,
                   precision=jax.lax.Precision.HIGHEST)
    ).astype(jnp.int32)

    i1 = _take_row(inc_v, inc_edge)
    i2 = _take_row(inc_v, jnp.mod(inc_edge + 1, 8))
    v1 = _take_row(ref_v, ref_edge)
    v2 = _take_row(ref_v, jnp.mod(ref_edge + 1, 8))

    tangent = v2 - v1
    tangent = tangent / jnp.maximum(jnp.linalg.norm(tangent), 1e-12)

    def clip(p1, p2, nrm, offset):
        d1 = jnp.dot(nrm, p1) - offset
        d2 = jnp.dot(nrm, p2) - offset
        t = d1 / jnp.where(jnp.abs(d1 - d2) > 1e-12, d1 - d2, 1.0)
        interp = p1 + jnp.clip(t, 0.0, 1.0) * (p2 - p1)
        keep1 = d1 <= 0
        keep2 = d2 <= 0
        crossed = d1 * d2 < 0
        out1 = jnp.where(keep1, p1, jnp.where(crossed, interp, p2))
        out2 = jnp.where(keep2, p2, jnp.where(crossed, interp, p1))
        ok = (keep1.astype(jnp.int32) + keep2.astype(jnp.int32)
              + crossed.astype(jnp.int32)) >= 2
        return out1, out2, ok

    off1 = -jnp.dot(tangent, v1) + _TOTAL_RADIUS
    p1, p2, ok1 = clip(i1, i2, -tangent, off1)
    off2 = jnp.dot(tangent, v2) + _TOTAL_RADIUS
    q1, q2, ok2 = clip(p1, p2, tangent, off2)

    front = jnp.dot(rn, v1)
    s1 = jnp.dot(rn, q1) - front - _TOTAL_RADIUS
    s2 = jnp.dot(rn, q2) - front - _TOTAL_RADIUS
    ok = ok1 & ok2 & ~no_contact
    pt_ok = jnp.stack([ok & (s1 <= _TOTAL_RADIUS), ok & (s2 <= _TOTAL_RADIUS)])

    normal = jnp.where(flip, -rn, rn)
    cid = flip.astype(jnp.int32) * 1024 + ref_edge * 64 + inc_edge
    cid = jnp.where(pt_ok.any(), cid, -1)
    return normal, jnp.stack([q1, q2]), jnp.stack([s1, s2]), pt_ok, cid


class Manifolds(NamedTuple):
    normal: jnp.ndarray      # (MM, 2)
    point: jnp.ndarray       # (MM, 2, 2)
    separation: jnp.ndarray  # (MM, 2)
    point_ok: jnp.ndarray    # (MM, 2)
    ids: jnp.ndarray         # (MM,)


def collide(cars, num_cars: int) -> Manifolds:
    """Collide pass over all car pairs (single env; vmap for batches).

    All ``P*48`` fixture pairs are collided as ONE stacked ``(MM, ...)``
    computation (``vmap`` of :func:`_collide_pair`) rather than 48 unrolled
    scalar programs — on TPU this replaces hundreds of sub-vector-width
    opslets per env with a handful of (MM, 8, 8)-shaped ones."""
    *_, fix_a, fix_b = tables(num_cars)
    dtype = cars.hull_c.dtype
    local_v = jnp.asarray(shapes.CAR_FIXTURE_VERTS, dtype)       # (8,8,2)
    local_n = jnp.asarray(shapes.CAR_FIXTURE_NORMALS, dtype)
    origin = jnp.concatenate([cars.hull_origin[:, None, :], cars.wheel_c], axis=1)
    angle = jnp.concatenate([cars.hull_a[:, None], cars.wheel_a], axis=1)
    body = jnp.asarray(shapes.CAR_FIXTURE_BODY)
    f_origin = origin[:, body]                                   # (N,8,2)
    f_angle = angle[:, body]                                     # (N,8)

    # World-space geometry for all N*8 fixtures at once.
    ca, sa = jnp.cos(f_angle)[..., None], jnp.sin(f_angle)[..., None]  # (N,8,1)
    vx, vy = local_v[None, ..., 0], local_v[None, ..., 1]        # (1,8,8)
    nx, ny = local_n[None, ..., 0], local_n[None, ..., 1]
    wv = jnp.stack(
        [ca * vx - sa * vy, sa * vx + ca * vy], axis=-1
    ) + f_origin[:, :, None, :]                                  # (N,8,8,2)
    wn = jnp.stack([ca * nx - sa * ny, sa * nx + ca * ny], axis=-1)

    flat_v = wv.reshape(num_cars * 8, 8, 2)
    flat_n = wn.reshape(num_cars * 8, 8, 2)
    normal, pts, seps, ok, cid = jax.vmap(_collide_pair)(
        flat_v[fix_a], flat_n[fix_a], flat_v[fix_b], flat_n[fix_b]
    )
    return Manifolds(
        normal=normal, point=pts, separation=seps, point_ok=ok, ids=cid
    )


# ---------------------------------------------------------------------------
# Contact solver (velocity + position), matmul-incidence form
# ---------------------------------------------------------------------------

class ContactState(NamedTuple):
    """Warm-start accumulators carried in EnvState, (MM, ...)."""
    normal_imp: jnp.ndarray    # (MM, 2)
    tangent_imp: jnp.ndarray   # (MM, 2)
    ids: jnp.ndarray           # (MM,) int32


def init_contact_state(num_cars: int, dtype=jnp.float32) -> ContactState:
    mm = max(len(car_pairs(num_cars)) * M_PER_PAIR, 1)
    return ContactState(
        normal_imp=jnp.zeros((mm, 2), dtype),
        tangent_imp=jnp.zeros((mm, 2), dtype),
        ids=jnp.full((mm,), -1, jnp.int32),
    )


class ContactBundle(NamedTuple):
    man: Manifolds
    normal_imp: jnp.ndarray
    tangent_imp: jnp.ndarray
    r_a: jnp.ndarray           # (MM, 2, 2) point - comA
    r_b: jnp.ndarray
    normal_mass: jnp.ndarray   # (MM, 2)
    tangent_mass: jnp.ndarray  # (MM, 2)
    com_a0: jnp.ndarray        # (MM, 2) COM at init (for position pass)
    com_b0: jnp.ndarray


def make_bundle(man: Manifolds, cstate: ContactState, cars, num_cars: int):
    """InitializeVelocityConstraints: effective masses + warm-start carry."""
    _, rows_a, rows_b, wa, wb, inv_m, inv_i, *_ = tables(num_cars)
    com, _ = flatten_com(cars.hull_c, cars.hull_a, cars.wheel_c, cars.wheel_a)
    wa_j = jnp.asarray(wa)
    wb_j = jnp.asarray(wb)
    com_a = wa_j @ com                                   # (MM, 2)
    com_b = wb_j @ com
    m_a = wa_j @ jnp.asarray(inv_m)
    m_b = wb_j @ jnp.asarray(inv_m)
    i_a = wa_j @ jnp.asarray(inv_i)
    i_b = wb_j @ jnp.asarray(inv_i)

    r_a = man.point - com_a[:, None, :]                  # (MM, 2, 2)
    r_b = man.point - com_b[:, None, :]
    n = man.normal[:, None, :]
    t = jnp.stack([man.normal[:, 1], -man.normal[:, 0]], axis=-1)[:, None, :]

    def eff_mass(axis):
        crn_a = r_a[..., 0] * axis[..., 1] - r_a[..., 1] * axis[..., 0]
        crn_b = r_b[..., 0] * axis[..., 1] - r_b[..., 1] * axis[..., 0]
        k = m_a[:, None] + m_b[:, None] + i_a[:, None] * crn_a**2 + i_b[:, None] * crn_b**2
        return jnp.where(k > 0, 1.0 / jnp.maximum(k, 1e-12), 0.0)

    keep = (cstate.ids == man.ids) & (man.ids >= 0)
    n_imp = jnp.where(keep[:, None] & man.point_ok, cstate.normal_imp, 0.0)
    t_imp = jnp.where(keep[:, None] & man.point_ok, cstate.tangent_imp, 0.0)

    return ContactBundle(
        man=man, normal_imp=n_imp, tangent_imp=t_imp,
        r_a=r_a, r_b=r_b,
        normal_mass=eff_mass(n), tangent_mass=eff_mass(t),
        com_a0=com_a, com_b0=com_b,
    )


def warm_start(vel: Velocities, bundle: ContactBundle, n_cars: int) -> Velocities:
    """Apply carried-over impulses before iterating (b2ContactSolver::WarmStart)."""
    _, _, _, wa, wb, inv_m, inv_i, *_ = tables(n_cars)
    wa_j, wb_j = jnp.asarray(wa), jnp.asarray(wb)
    inv_m_j, inv_i_j = jnp.asarray(inv_m), jnp.asarray(inv_i)
    v, w = flatten_vel(vel)
    n = bundle.man.normal
    t = jnp.stack([n[:, 1], -n[:, 0]], axis=-1)
    for k in range(2):
        p = bundle.normal_imp[:, k, None] * n + bundle.tangent_imp[:, k, None] * t
        ra, rb = bundle.r_a[:, k], bundle.r_b[:, k]
        la = ra[:, 0] * p[:, 1] - ra[:, 1] * p[:, 0]
        lb = rb[:, 0] * p[:, 1] - rb[:, 1] * p[:, 0]
        v = v + (wb_j.T @ p - wa_j.T @ p) * inv_m_j[:, None]
        w = w + (wb_j.T @ lb - wa_j.T @ la) * inv_i_j
    return unflatten_vel(v, w, n_cars)


def velocity_pass(vel: Velocities, n_imp, t_imp, bundle: ContactBundle, n_cars: int):
    """One velocity iteration: friction sub-pass then two normal sub-passes,
    each Jacobi across manifolds with immediate (matmul) application.

    The impulse accumulators are explicit carry arguments (not read from
    ``bundle``) so a ``fori_loop`` over this pass carries only (vel, n_imp,
    t_imp); the bundle's manifold constants stay loop-invariant."""
    _, _, _, wa, wb, inv_m, inv_i, *_ = tables(n_cars)
    wa_j, wb_j = jnp.asarray(wa), jnp.asarray(wb)
    inv_m_j, inv_i_j = jnp.asarray(inv_m), jnp.asarray(inv_i)
    v, w = flatten_vel(vel)
    man = bundle.man
    n = man.normal
    t = jnp.stack([n[:, 1], -n[:, 0]], axis=-1)

    def rel_vel(k):
        va = wa_j @ v
        wa_ = wa_j @ w
        vb = wb_j @ v
        wb_ = wb_j @ w
        ra = bundle.r_a[:, k]
        rb = bundle.r_b[:, k]
        dva = jnp.stack([-wa_ * ra[:, 1], wa_ * ra[:, 0]], axis=-1)
        dvb = jnp.stack([-wb_ * rb[:, 1], wb_ * rb[:, 0]], axis=-1)
        return (vb + dvb) - (va + dva)

    def apply_point(v, w, k, lam, axis):
        p = lam[:, None] * axis                           # (MM, 2)
        ra, rb = bundle.r_a[:, k], bundle.r_b[:, k]
        la = ra[:, 0] * p[:, 1] - ra[:, 1] * p[:, 0]
        lb = rb[:, 0] * p[:, 1] - rb[:, 1] * p[:, 0]
        v = v + (wb_j.T @ p - wa_j.T @ p) * inv_m_j[:, None]
        w = w + (wb_j.T @ lb - wa_j.T @ la) * inv_i_j
        return v, w

    # Friction (both points).
    for k in range(2):
        dv = rel_vel(k)
        vt = jnp.sum(dv * t, axis=-1)
        lam = -bundle.tangent_mass[:, k] * vt
        max_f = _FRICTION * n_imp[:, k]
        new = jnp.clip(t_imp[:, k] + lam, -max_f, max_f)
        new = jnp.where(man.point_ok[:, k], new, 0.0)
        lam = new - t_imp[:, k]
        t_imp = t_imp.at[:, k].set(new)
        v, w = apply_point(v, w, k, lam, t)

    # Normal (per point, sequential sub-passes).
    for k in range(2):
        dv = rel_vel(k)
        vn = jnp.sum(dv * n, axis=-1)
        lam = -bundle.normal_mass[:, k] * vn
        new = jnp.maximum(n_imp[:, k] + lam, 0.0)
        new = jnp.where(man.point_ok[:, k], new, 0.0)
        lam = new - n_imp[:, k]
        n_imp = n_imp.at[:, k].set(new)
        v, w = apply_point(v, w, k, lam, n)

    return unflatten_vel(v, w, n_cars), n_imp, t_imp


def position_pass(pos: Positions, bundle: ContactBundle, n_cars: int):
    """One position iteration: Baumgarte push-out along the Collide-time
    normal, separations tracked by rigid translation of the bodies (rotation
    deltas during correction are sub-slop; see module docstring)."""
    _, _, _, wa, wb, inv_m, inv_i, *_ = tables(n_cars)
    wa_j, wb_j = jnp.asarray(wa), jnp.asarray(wb)
    inv_m_j, inv_i_j = jnp.asarray(inv_m), jnp.asarray(inv_i)

    c, a = flatten_com(pos.hull_c, pos.hull_a, pos.wheel_c, pos.wheel_a)
    man = bundle.man
    n = man.normal

    com_a = wa_j @ c
    com_b = wb_j @ c
    shift = jnp.sum(((com_b - bundle.com_b0) - (com_a - bundle.com_a0)) * n, axis=-1)

    for k in range(2):
        sep = man.separation[:, k] + shift
        cc = jnp.clip(
            C.B2_BAUMGARTE * (sep + C.B2_LINEAR_SLOP),
            -C.B2_MAX_LINEAR_CORRECTION, 0.0,
        )
        # impulse magnitude = -C / K, with normal_mass == 1/K.
        imp = jnp.where(man.point_ok[:, k], -cc * bundle.normal_mass[:, k], 0.0)
        p = imp[:, None] * n
        ra, rb = bundle.r_a[:, k], bundle.r_b[:, k]
        la = ra[:, 0] * p[:, 1] - ra[:, 1] * p[:, 0]
        lb = rb[:, 0] * p[:, 1] - rb[:, 1] * p[:, 0]
        c = c + (wb_j.T @ p - wa_j.T @ p) * inv_m_j[:, None]
        a = a + (wb_j.T @ lb - wa_j.T @ la) * inv_i_j
        com_a = wa_j @ c
        com_b = wb_j @ c
        shift = jnp.sum(
            ((com_b - bundle.com_b0) - (com_a - bundle.com_a0)) * n, axis=-1
        )

    c = c.reshape(n_cars, 5, 2)
    a = a.reshape(n_cars, 5)
    return Positions(
        hull_c=c[:, 0], hull_a=a[:, 0], wheel_c=c[:, 1:], wheel_a=a[:, 1:]
    )


def extract_state(bundle: ContactBundle) -> ContactState:
    """StoreImpulses: carry accumulators + ids for next-step warm start."""
    return ContactState(
        normal_imp=bundle.normal_imp,
        tangent_imp=bundle.tangent_imp,
        ids=bundle.man.ids,
    )
