"""Observation extraction.

The reference's only observation is the 96x96x3 per-agent pixel frame
(mcr:431, 511-604) — produced here by render/ (Pallas rasterizer). This
module adds a compact *state-vector* observation (a new capability, no
reference counterpart) so physics-only training runs never touch the
rasterizer, plus helpers shared by both.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import config as C
from .env import EnvState

STATE_OBS_DIM = 20


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
      17    curvature ahead (beta[i+5] - beta[i], wrapped) / 0.5
      18    on-grass flag, 19 driving-backward flag
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
    ahead = jnp.arange(mt)[None, :] == jnp.mod(nearest[:, None] + 5, state.track.n_tiles)
    beta_ahead = pick(state.track.beta, ahead)

    rel = jnp.stack([nx, ny], axis=-1) - origin
    rel_f = jnp.sum(rel * fwd, axis=-1)
    rel_l = jnp.sum(rel * lat, axis=-1)

    desired = nbeta + jnp.where(state.direction_cw, jnp.pi, 0.0)
    err = desired - cars.hull_a
    curv = jnp.mod(beta_ahead - nbeta + jnp.pi, 2 * jnp.pi) - jnp.pi

    f = state.reward.dtype
    return jnp.stack(
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

    am = pmesh.ambient_mesh()
    E = state.reward.shape[0]
    if am is not None and E % am.size != 0:
        am = None          # shard_map needs even shards; fall back to XLA
    if jax.default_backend() == "tpu" and (jax.device_count() == 1 or am is not None):
        from .render import pallas_raster

        fn = partial(pallas_raster.render_pixels, cfg)
        if am is not None:
            fn = pmesh.shard_leading(fn, am)
        return fn(state)
    return jax.vmap(partial(raster.render_observation, cfg))(state)
