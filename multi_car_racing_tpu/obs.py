"""Observation extraction.

The reference's only observation is the 96x96x3 per-agent pixel frame
(mcr:431, 511-604) — produced here by render/ (Pallas rasterizer). This
module adds a compact *state-vector* observation (a new capability, no
reference counterpart) so physics-only training runs never touch the
rasterizer, plus helpers shared by both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import config as C
from .env import EnvState

STATE_OBS_DIM = 38

# Tile-index offsets of the lookahead waypoints (signed by episode direction:
# a CW episode traverses the track in decreasing index order). At the mean
# tile spacing of TRACK_DETAIL_STEP = 3.5 m the farthest point is ~157 m out
# — ~3 s of lookahead at racing speed, enough to set up for corners.
LOOKAHEAD_OFFSETS = (3, 6, 10, 15, 21, 28, 36, 45)


def state_observation(state: EnvState) -> jnp.ndarray:
    """Per-car feature vector, (N, STATE_OBS_DIM), all roughly unit-scale.

    Features (documented order):
      0:2   hull velocity in the car frame (forward, lateral) / 40
      2     hull angular velocity / 3
      3     speed / 40
      4:8   wheel rolling speeds (omega) / 120
      8:10  front joint angles / 0.4
      10    steer target, 11 rear gas, 12 brake
      13:15 vector to nearest tile center, car frame / 10
      15:17 cos/sin of heading error vs track direction
      17    curvature ahead (signed beta[i±5] - beta[i], wrapped) / 0.5
      18    on-grass flag, 19 driving-backward flag
      20:36 8 lookahead waypoints (car-frame forward, lateral) / 40, at the
            direction-signed tile offsets LOOKAHEAD_OFFSETS — the racing-line
            preview that makes anticipatory (fast) driving learnable
      36:38 cos/sin of the track tangent at the farthest waypoint relative to
            the car heading
    """
    cars = state.cars
    s, c = jnp.sin(cars.hull_a), jnp.cos(cars.hull_a)
    # car frame: forward = (-sin, cos), lateral = (cos, sin)
    fwd = jnp.stack([-s, c], axis=-1)
    lat = jnp.stack([c, s], axis=-1)
    v_f = jnp.sum(cars.hull_v * fwd, axis=-1)
    v_l = jnp.sum(cars.hull_v * lat, axis=-1)
    speed = jnp.linalg.norm(cars.hull_v, axis=-1)

    origin = cars.hull_origin
    d2 = jnp.sum(jnp.square(origin[:, None, :] - state.track.xy[None]), axis=-1)
    d2 = jnp.where(state.track.valid[None], d2, jnp.inf)
    nearest = jnp.argmin(d2, axis=1)
    mt = state.track.max_tiles
    oh = jnp.arange(mt)[None, :] == nearest[:, None]

    def pick(arr, idx_oh):
        return jnp.sum(jnp.where(idx_oh, arr[None, :], 0.0), axis=1)

    nx = pick(state.track.xy[:, 0], oh)
    ny = pick(state.track.xy[:, 1], oh)
    nbeta = pick(state.track.beta, oh)
    # Direction-signed "ahead": CW episodes run the track in decreasing
    # tile-index order.
    sign = jnp.where(state.direction_cw, -1, 1)
    ahead = jnp.arange(mt)[None, :] == jnp.mod(
        nearest[:, None] + 5 * sign, state.track.n_tiles
    )
    beta_ahead = pick(state.track.beta, ahead)

    rel = jnp.stack([nx, ny], axis=-1) - origin
    rel_f = jnp.sum(rel * fwd, axis=-1)
    rel_l = jnp.sum(rel * lat, axis=-1)

    desired = nbeta + jnp.where(state.direction_cw, jnp.pi, 0.0)
    err = desired - cars.hull_a
    curv = sign * (jnp.mod(beta_ahead - nbeta + jnp.pi, 2 * jnp.pi) - jnp.pi)

    # Lookahead waypoints: car-frame positions of tiles ahead along the
    # driving direction (one-hot MXU contraction, no gathers).
    offs = jnp.asarray(LOOKAHEAD_OFFSETS, jnp.int32)              # (K,)
    wp_idx = jnp.mod(nearest[:, None] + offs[None, :] * sign, state.track.n_tiles)
    wp_oh = (
        jnp.arange(mt)[None, None, :] == wp_idx[:, :, None]
    ).astype(state.track.xy.dtype)                                # (N, K, MT)
    wp_xy = jnp.einsum("nkm,md->nkd", wp_oh, state.track.xy,
                       precision=jax.lax.Precision.HIGHEST)     # (N, K, 2)
    wp_rel = wp_xy - origin[:, None, :]
    wp_f = jnp.sum(wp_rel * fwd[:, None, :], axis=-1) / 40.0      # (N, K)
    wp_l = jnp.sum(wp_rel * lat[:, None, :], axis=-1) / 40.0
    far_beta = jnp.einsum("nm,m->n", wp_oh[:, -1], state.track.beta,
                          precision=jax.lax.Precision.HIGHEST)
    far_err = far_beta + jnp.where(state.direction_cw, jnp.pi, 0.0) - cars.hull_a

    f = state.reward.dtype
    base = jnp.stack(
        [
            v_f / 40.0, v_l / 40.0, cars.hull_w / 3.0, speed / 40.0,
            cars.spin[:, 0] / 120.0, cars.spin[:, 1] / 120.0,
            cars.spin[:, 2] / 120.0, cars.spin[:, 3] / 120.0,
            cars.joint_angle[:, 0] / 0.4, cars.joint_angle[:, 1] / 0.4,
            cars.steer[:, 0], cars.gas[:, 2], cars.brake[:, 0],
            rel_f / 10.0, rel_l / 10.0,
            jnp.cos(err), jnp.sin(err), curv / 0.5,
            state.driving_on_grass.astype(f), state.driving_backward.astype(f),
        ],
        axis=-1,
    )
    wps = jnp.stack([wp_f, wp_l], axis=-1).reshape(base.shape[0], -1)  # (N, 2K)
    return jnp.concatenate(
        [base, wps, jnp.cos(far_err)[:, None], jnp.sin(far_err)[:, None]],
        axis=-1,
    )


def pixel_observation_batched(cfg, state) -> jnp.ndarray:
    """Batched pixel observations (E, N, 96, 96, 3) uint8.

    Dispatches to the Pallas rasterization kernel on TPU
    (render/pallas_raster.py — measured 22x the XLA painter at 2048 views):
    directly on a single chip, per-shard via ``shard_map`` under a
    multi-device mesh (``jax.set_mesh``). Falls back to the windowed XLA
    painter elsewhere (CPU tests; multi-device without an ambient mesh)."""
    import jax
    from functools import partial
    from .parallel import mesh as pmesh
    from .render import raster

    import os

    am = pmesh.ambient_mesh()
    E = state.reward.shape[0]
    if am is not None and E % am.size != 0:
        am = None          # shard_map needs even shards; fall back to XLA
    # MCR_RASTER=pallas forces the Pallas kernel path off-TPU (interpret
    # mode) — used by the full-fidelity multichip dryrun so the production
    # rasterizer crosses the shard_map seam on the virtual CPU mesh.
    force_pallas = os.environ.get("MCR_RASTER", "") == "pallas"
    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu or force_pallas) and (jax.device_count() == 1 or am is not None):
        from .render import pallas_raster

        fn = partial(pallas_raster.render_pixels, cfg, interpret=not on_tpu)
        if am is not None:
            fn = pmesh.shard_leading(fn, am)
        return fn(state)
    return jax.vmap(partial(raster.render_observation, cfg))(state)
