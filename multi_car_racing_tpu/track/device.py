"""Device track generator: the procedural track under jit/vmap.

Same algorithm as the host oracle (track/host.py = mcr:183-338) expressed as
fixed-bound JAX control flow: a 2500-step ``lax.scan`` for the integrator
walk, masked closed-loop extraction, vectorized curb marking (including the
reference's negative-index smear quirk), and rejection-resampling retries via
``lax.while_loop``. Consumes ``jax.random`` threefry keys — the documented
divergence from the host path's MT19937 bit-parity stream (SURVEY.md §2.14):
device tracks are statistically identical, not bit-identical, to reference
tracks. Used for on-device track pools and autoreset at scale; parity
harnesses use the host path.

Tracks longer than ``max_tiles`` (not yet observed; >355 tiles would need a
pathological walk) are rejected and resampled like glue failures.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .. import config as C
from .common import Track, _PAD_FAR


def _checkpoints(key, dtype=jnp.float32):
    """mcr:186-198. Both uniforms drawn for every checkpoint."""
    ncp = C.CHECKPOINTS
    u = jax.random.uniform(key, (ncp, 2), dtype)
    c = jnp.arange(ncp, dtype=dtype)
    alpha = 2 * math.pi * c / ncp + u[:, 0] * (2 * math.pi / ncp)
    rad = C.TRACK_RAD / 3 + u[:, 1] * (C.TRACK_RAD - C.TRACK_RAD / 3)
    alpha = alpha.at[0].set(0.0).at[ncp - 1].set(2 * math.pi * (ncp - 1) / ncp)
    rad = rad.at[0].set(1.5 * C.TRACK_RAD).at[ncp - 1].set(1.5 * C.TRACK_RAD)
    return alpha, rad * jnp.cos(alpha), rad * jnp.sin(alpha)


def _walk(cp_alpha, cp_x, cp_y, max_points: int, dtype=jnp.float32):
    """The integrator walk (mcr:206-259) as a fixed-length scan.

    Returns (alpha (P,), beta_mid (P,), x (P,), y (P,), count ()) where
    entries past ``count`` are inactive."""
    ncp = C.CHECKPOINTS
    two_pi = jnp.asarray(2 * math.pi, dtype)

    def body(carry, _):
        x, y, beta, dest_i, laps, visited, active = carry
        alpha = jnp.arctan2(y, x)
        lap_cross = visited & (alpha > 0)
        laps = laps + lap_cross.astype(jnp.int32)
        visited = jnp.where(lap_cross, False, visited)
        visited = visited | (alpha < 0)
        alpha = jnp.where(alpha < 0, alpha + two_pi, alpha)

        # Destination scan with wrap-unwind (mcr:221-234).
        def dest_cond(c):
            di, al = c
            return al > cp_alpha[jnp.mod(di, ncp)]

        def dest_body(c):
            di, al = c
            di = di + 1
            al = jnp.where(jnp.mod(di, ncp) == 0, al - two_pi, al)
            return di, al

        dest_i, alpha = jax.lax.while_loop(dest_cond, dest_body, (dest_i, alpha))
        dest_x = cp_x[jnp.mod(dest_i, ncp)]
        dest_y = cp_y[jnp.mod(dest_i, ncp)]

        r1x, r1y = jnp.cos(beta), jnp.sin(beta)
        p1x, p1y = -r1y, r1x
        proj = r1x * (dest_x - x) + r1y * (dest_y - y)

        # beta unwinding (mcr:242-245): closed form of the repeated +-2pi.
        db = beta - alpha
        beta = beta - two_pi * jnp.ceil((db - 1.5 * math.pi) / (2 * math.pi)).clip(0)
        db = beta - alpha
        beta = beta + two_pi * jnp.ceil((-db - 1.5 * math.pi) / (2 * math.pi)).clip(0)

        prev_beta = beta
        proj = proj * C.SCALE
        beta = jnp.where(
            proj > 0.3, beta - jnp.minimum(C.TRACK_TURN_RATE, jnp.abs(0.001 * proj)), beta
        )
        beta = jnp.where(
            proj < -0.3, beta + jnp.minimum(C.TRACK_TURN_RATE, jnp.abs(0.001 * proj)), beta
        )
        x = x + p1x * C.TRACK_DETAIL_STEP
        y = y + p1y * C.TRACK_DETAIL_STEP
        out = (alpha, 0.5 * (prev_beta + beta), x, y, active)
        active = active & (laps <= 4)
        return (x, y, beta, dest_i, laps, visited, active), out

    init = (
        jnp.asarray(1.5 * C.TRACK_RAD, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32), jnp.asarray(False), jnp.asarray(True),
    )
    _, (alpha, beta, x, y, active) = jax.lax.scan(body, init, None, length=max_points)
    count = jnp.sum(active.astype(jnp.int32))
    return alpha, beta, x, y, active, count


def _attempt(key, max_tiles: int, max_points: int, dtype=jnp.float32):
    """One generation attempt. Returns (track_arrays..., n_tiles, ok)."""
    cp_alpha, cp_x, cp_y = _checkpoints(key, dtype)
    start_alpha = jnp.asarray(2 * math.pi * (-0.5) / C.CHECKPOINTS, dtype)
    alpha, beta, x, y, active, _cnt = _walk(cp_alpha, cp_x, cp_y, max_points, dtype)

    # Closed-loop extraction (mcr:263-281): last two start_alpha crossings.
    P = max_points
    i = jnp.arange(P, dtype=jnp.int32)
    prev_alpha = jnp.concatenate([alpha[:1], alpha[:-1]])
    cross = (alpha > start_alpha) & (prev_alpha <= start_alpha) & active & (i >= 1)
    ci = jnp.where(cross, i, -1)
    i2 = jnp.max(ci)
    ci1 = jnp.where(ci < i2, ci, -1)
    i1 = jnp.max(ci1)
    ok = (i1 > 0) & (i2 > 0)

    L = jnp.clip(i2 - 1 - i1, 0, max_tiles)
    ok = ok & (L > 0) & ((i2 - 1 - i1) <= max_tiles)

    # Contiguous slice [i1, i1+MT) via dynamic_slice on padded buffers.
    def sl(a):
        pad = jnp.zeros((max_tiles,), a.dtype)
        return jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([a, pad]), i1, max_tiles
        )

    t_beta, t_x, t_y = sl(beta), sl(x), sl(y)
    valid = jnp.arange(max_tiles) < L

    # Glue check (mcr:283-291).
    first_beta = t_beta[0]
    fpx, fpy = jnp.cos(first_beta), jnp.sin(first_beta)
    lx = jax.lax.dynamic_index_in_dim(t_x, L - 1, keepdims=False)
    ly = jax.lax.dynamic_index_in_dim(t_y, L - 1, keepdims=False)
    glue = jnp.sqrt(
        jnp.square(fpx * (t_x[0] - lx)) + jnp.square(fpy * (t_y[0] - ly))
    )
    ok = ok & (glue <= C.TRACK_DETAIL_STEP)

    return t_beta, t_x, t_y, valid, L, ok


def _mod_take(a, idx, L):
    return jnp.take(a, jnp.mod(idx, jnp.maximum(L, 1)), axis=0)


def _borders(t_beta, L, max_tiles: int):
    """Curb marking (mcr:294-307) vectorized, incl. the in-place smear's
    negative-index wrap quirk (head good-values leak to the tail, then smear
    backwards from there — see track/host.py)."""
    mt = max_tiles
    i = jnp.arange(mt, dtype=jnp.int32)
    good = jnp.ones((mt,), bool)
    oneside = jnp.zeros((mt,))
    for neg in range(C.BORDER_MIN_COUNT):
        b1 = _mod_take(t_beta, i - neg, L)
        b2 = _mod_take(t_beta, i - neg - 1, L)
        good = good & (jnp.abs(b1 - b2) > C.TRACK_TURN_RATE * 0.2)
        oneside = oneside + jnp.sign(b1 - b2)
    good = good & (jnp.abs(oneside) == C.BORDER_MIN_COUNT) & (i < L)

    # wrap_in[L-m] = OR of good[0..3-m] for m = 1..3.
    g0, g1, g2 = good[0], good[1], good[2]
    wrap = jnp.zeros((mt,), bool)
    wrap = wrap | ((i == L - 1) & (g0 | g1 | g2))
    wrap = wrap | ((i == L - 2) & (g0 | g1))
    wrap = wrap | ((i == L - 3) & g0)
    read = good | wrap

    border = jnp.zeros((mt,), bool)
    for k in range(C.BORDER_MIN_COUNT):
        shifted = jnp.concatenate([read[k:], jnp.zeros((k,), bool)])
        border = border | (shifted & ((i + k) < L))
    return border


def _build_track(t_beta, t_x, t_y, valid, L, max_tiles: int, dtype=jnp.float32):
    """Tile/curb geometry (mcr:309-334) from extracted track points."""
    mt = max_tiles
    i = jnp.arange(mt, dtype=jnp.int32)
    xy1 = jnp.stack([t_x, t_y], axis=-1)
    prev = jnp.mod(i - 1, jnp.maximum(L, 1))
    beta2 = jnp.take(t_beta, prev)
    xy2 = jnp.take(xy1, prev, axis=0)
    beta1 = t_beta

    def offs(beta, k):
        return jnp.stack([k * jnp.cos(beta), k * jnp.sin(beta)], axis=-1)

    w = C.TRACK_WIDTH
    quad = jnp.stack(
        [xy1 - offs(beta1, w), xy1 + offs(beta1, w),
         xy2 + offs(beta2, w), xy2 - offs(beta2, w)], axis=1
    )  # [r1_l, r1_r, r2_r, r2_l]
    far = jnp.asarray(_PAD_FAR, dtype)
    quad = jnp.where(valid[:, None, None], quad, far)

    dither = 0.01 * jnp.mod(i, 3).astype(dtype)
    color0 = jnp.asarray(C.ROAD_COLOR, dtype)[None, :] + dither[:, None]

    border = _borders(t_beta, L, mt)
    side = jnp.sign(beta2 - beta1)
    b = C.BORDER
    curb = jnp.stack(
        [xy1 + offs(beta1, side * w), xy1 + offs(beta1, side * (w + b)),
         xy2 + offs(beta2, side * (w + b)), xy2 + offs(beta2, side * w)], axis=1
    )
    curb = jnp.where((valid & border)[:, None, None], curb, far)

    # Tiles-last layouts + SAT precompute (mirrors pack_track).
    quad_T = jnp.transpose(quad, (1, 2, 0))
    edges = jnp.roll(quad, -1, axis=1) - quad
    nrm = jnp.stack([edges[..., 1], -edges[..., 0]], axis=-1)
    ln = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = jnp.where(ln > 1e-12, nrm / jnp.maximum(ln, 1e-12),
                    jnp.asarray([1.0, 0.0], dtype))
    proj = jnp.einsum("tac,tvc->tav", nrm, quad,
                      precision=jax.lax.Precision.HIGHEST)
    return Track(
        n_tiles=L.astype(jnp.int32),
        valid=valid,
        xy=jnp.where(valid[:, None], xy1, far),
        beta=t_beta,
        quad=quad,
        color0=color0,
        has_curb=border & valid,
        curb_quad=curb,
        curb_red=jnp.mod(i, 2) != 0,
        quad_T=quad_T,
        quad_ax_T=jnp.transpose(nrm, (1, 2, 0)),
        quad_lo=jnp.transpose(proj.min(-1)),
        quad_hi=jnp.transpose(proj.max(-1)),
        curb_quad_T=jnp.transpose(curb, (1, 2, 0)),
    )


def generate_track(
    key,
    max_tiles: int = 384,
    max_points: int = 2500,
    max_retries: int = 12,
    dtype=jnp.float32,
) -> tuple[Track, jnp.ndarray]:
    """Generate one track on device, retrying failed attempts with fresh keys
    (mcr:359-364, bounded). Returns (Track, ok). vmap over keys for a batch.
    """

    def cond(c):
        attempt, ok, _key, _parts = c
        return (~ok) & (attempt < max_retries)

    def body(c):
        attempt, _ok, key, _parts = c
        key, sub = jax.random.split(key)
        t_beta, t_x, t_y, valid, L, ok = _attempt(sub, max_tiles, max_points, dtype)
        return attempt + 1, ok, key, (t_beta, t_x, t_y, valid, L)

    z = jnp.zeros((max_tiles,), dtype)
    init_parts = (z, z, z, jnp.zeros((max_tiles,), bool), jnp.asarray(0, jnp.int32))
    _, ok, _, parts = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), jnp.asarray(False), key, init_parts)
    )
    t_beta, t_x, t_y, valid, L = parts
    track = _build_track(t_beta, t_x, t_y, valid, jnp.maximum(L, 1), max_tiles, dtype)
    return track, ok


def episode_params(key, cfg):
    """Device-side episode config draws: direction + spawn order.

    Replaces the reference's global ``np.random`` stream (mcr:352-357) with
    threefry draws — statistical equivalence, not bit parity."""
    k1, k2 = jax.random.split(key)
    if cfg.use_random_direction:
        direction_cw = jax.random.bernoulli(k1)
    else:
        direction_cw = jnp.asarray(cfg.direction == "CW")
    order = jax.random.permutation(k2, cfg.num_agents).astype(jnp.int32)
    return direction_cw, order
