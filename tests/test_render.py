"""Rasterizer tests: production vs oracle pixel equality + structure."""

from functools import partial

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_car_racing_tpu import config as C, env as tenv, seeding, obs as tobs
from multi_car_racing_tpu.render import raster, xla_raster


@pytest.fixture(scope="module")
def driven_state():
    cfg = C.EnvConfig(num_agents=2)
    state, _ = tenv.host_reset(cfg, seed=11, global_stream=seeding.GlobalStream(5))
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(150):
        f = np.asarray(tobs.state_observation(state))
        steer = np.clip(-2.0 * f[:, 16], -1, 1)
        a = np.stack([steer, 0.35 * np.ones(2), np.zeros(2)], -1)
        state, _, _ = step(state, jnp.asarray(a, jnp.float32))
    return cfg, state


def test_production_matches_oracle_postwarmup(driven_state):
    cfg, state = driven_state
    oracle = np.asarray(jax.jit(partial(xla_raster.render_observation, cfg))(state))
    prod = np.asarray(jax.jit(partial(raster.render_observation, cfg))(state))
    np.testing.assert_array_equal(prod, oracle)


def test_frame_structure(driven_state):
    cfg, state = driven_state
    img = np.asarray(jax.jit(partial(raster.render_observation, cfg))(state))[0]
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    # HUD black bar: bottom 12 rows mostly black (bars/score paint over some).
    assert (img[92:, 60:80] == 0).mean() > 0.9
    # Road gray visible somewhere in the upper 84 rows (car follows track).
    road = (np.abs(img[:84].astype(int) - 102) < 6).all(-1)
    assert road.mean() > 0.1
    # Ego car color (red, car id 0 default palette) present near car anchor
    # (h_ratio 0.25 from bottom, horizontally centered).
    patch = img[60:80, 40:56].reshape(-1, 3).astype(int)
    assert (np.abs(patch - [204, 0, 0]).sum(-1) < 40).any()


def test_ego_color_mode(driven_state):
    _, state = driven_state
    cfg = C.EnvConfig(num_agents=2, use_ego_color=True)
    img = np.asarray(jax.jit(partial(raster.render_observation, cfg))(state))
    # view 0: ego red near anchor; view 1: ego red too (its own view).
    for v in range(2):
        patch = img[v, 56:84, 32:64].reshape(-1, 3).astype(int)
        assert (np.abs(patch - [204, 0, 0]).sum(-1) < 40).any()


def test_rgb_array_viewport(driven_state):
    cfg, state = driven_state
    img = np.asarray(
        jax.jit(
            partial(raster.render_observation, cfg, vp_w=C.VIDEO_W, vp_h=C.VIDEO_H)
        )(state)
    )
    assert img.shape == (2, 400, 600, 3)


def test_gym_facade_roundtrip():
    import multi_car_racing_tpu as mcr

    env = mcr.make("CarRacing-v0")   # 1-agent special case
    env.seed(3)
    obs = env.reset()
    assert obs.shape == (1, 96, 96, 3)
    total = 0.0
    for _ in range(10):
        obs, r, done, info = env.step(np.asarray([[0.0, 0.5, 0.0]]))
        total += float(r[0])
    assert np.isfinite(total)
    assert env.render("state_pixels").shape == (1, 96, 96, 3)
    assert env.render("rgb_array").shape == (1, 400, 600, 3)
    env.close()


def test_time_limit_truncation():
    import multi_car_racing_tpu as mcr

    env = mcr.make("MultiCarRacing-v0", num_agents=1)
    env.max_episode_steps = 5  # shrink for test speed
    env.seed(0)
    env.reset()
    done = False
    for i in range(5):
        _, _, done, info = env.step(np.zeros((1, 3)))
    assert done and info.get("TimeLimit.truncated") is True


def test_pallas_kernel_matches_painter(driven_state):
    """The Pallas rasterization kernel (interpret mode on CPU) must be
    pixel-identical to the XLA painter."""
    from multi_car_racing_tpu.render import pallas_raster as PR

    cfg, state = driven_state
    batched = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], state)
    pallas_img = np.asarray(PR.render_pixels(cfg, batched, interpret=True))[0]
    xla_img = np.asarray(jax.jit(partial(raster.render_observation, cfg))(state))
    np.testing.assert_array_equal(pallas_img, xla_img)


def test_skid_particles_recorded_and_drawn():
    """Wheelspin must record trails (cfg.track_skid) and rgb_array must show
    them; state_pixels must NOT (reference draws particles only in
    non-state-pixels modes, mcr:564)."""
    import multi_car_racing_tpu as mcr

    env = mcr.make("MultiCarRacing-v0", num_agents=1, verbose=0)
    env.seed(11)
    env.reset()
    for _ in range(40):
        env.step(np.asarray([[0.6, 1.0, 0.0]]))
    assert int(np.asarray(env.state.skid.valid).sum()) > 10

    rgb = env.render("rgb_array")[0]
    sp = env.render("state_pixels")[0]
    # Trails are palette-black/mud pixels outside the HUD area; compare
    # against the same scene rendered without particles.
    from functools import partial as _p
    from multi_car_racing_tpu.render import raster as _r

    no_part = np.asarray(
        jax.jit(_p(_r.render_observation, env.cfg, vp_w=600, vp_h=400))(env.state)
    )[0]
    assert (rgb != no_part).any(), "rgb_array should include trails"
    sp_no = np.asarray(jax.jit(_p(_r.render_observation, env.cfg))(env.state))[0]
    np.testing.assert_array_equal(sp, sp_no)


def test_pallas_kernel_warmup_far_track_exact():
    """During the first-second zoom-out the kernel paints the FULL track in
    world space; frames must equal the oracle exactly (the windowed painter
    documents missing far segments here — the kernel does not)."""
    from multi_car_racing_tpu.render import pallas_raster, xla_raster

    cfg = C.EnvConfig(num_agents=2)
    state, _ = tenv.host_reset(cfg, seed=11, global_stream=seeding.GlobalStream(5))
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(10):
        state, _, _ = step(state, jnp.zeros((2, 3)))
    assert float(state.t) < 1.0, "not a warmup frame"
    st = jax.tree_util.tree_map(lambda x: jnp.stack([x]), state)
    oracle = np.asarray(jax.jit(partial(xla_raster.render_observation, cfg))(state))
    prod = np.asarray(pallas_raster.render_pixels(cfg, st, interpret=True))[0]
    np.testing.assert_array_equal(prod, oracle)


def test_pallas_kernel_warm_partition_mixed_batch(driven_state, monkeypatch):
    """A batch mixing zooming and steady envs must render exactly through
    the warm-env partition (compact warm sub-batch + steady kernel for
    everyone + scatter): per-view pixels equal the per-env oracle. Guards
    the path that restored pixel-PPO throughput (a batch-wide any-warm cond
    sent every training step down the ~35x full-track pass)."""
    from multi_car_racing_tpu.render import pallas_raster, xla_raster

    cfg, steady = driven_state
    warm, _ = tenv.host_reset(cfg, seed=23, global_stream=seeding.GlobalStream(9))
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(5):
        warm, _, _ = step(warm, jnp.zeros((2, 3)))
    assert float(warm.t) < 1.0
    batched = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b, a]), steady, warm
    )
    monkeypatch.setenv("MCR_RASTER_WARM_CAP", "1")      # force the partition
    prod = np.asarray(pallas_raster.render_pixels(cfg, batched, interpret=True))
    for i, st in enumerate((steady, warm, steady)):
        oracle = np.asarray(
            jax.jit(partial(xla_raster.render_observation, cfg))(st)
        )
        np.testing.assert_array_equal(prod[i], oracle, err_msg=f"env {i}")


def test_pallas_kernel_matches_oracle_postwarmup(driven_state):
    from multi_car_racing_tpu.render import pallas_raster, xla_raster

    cfg, state = driven_state
    st = jax.tree_util.tree_map(lambda x: jnp.stack([x]), state)
    oracle = np.asarray(jax.jit(partial(xla_raster.render_observation, cfg))(state))
    prod = np.asarray(pallas_raster.render_pixels(cfg, st, interpret=True))[0]
    np.testing.assert_array_equal(prod, oracle)


def test_xla_painter_warmup_far_track_exact():
    """The XLA painter's warmup branch (full-track priority-max pass) must
    equal the oracle exactly — the windowed approximation is gone."""
    cfg = C.EnvConfig(num_agents=2)
    state, _ = tenv.host_reset(cfg, seed=11, global_stream=seeding.GlobalStream(5))
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(10):
        state, _, _ = step(state, jnp.zeros((2, 3)))
    assert float(state.t) < 1.0, "not a warmup frame"
    oracle = np.asarray(jax.jit(partial(xla_raster.render_observation, cfg))(state))
    prod = np.asarray(jax.jit(partial(raster.render_observation, cfg))(state))
    np.testing.assert_array_equal(prod, oracle)


def test_four_agent_ego_color_h_ratio_variants():
    """BASELINE.json config 3: 4 agents with use_ego_color and a non-default
    h_ratio. All three rasterizers must agree exactly."""
    from multi_car_racing_tpu.render import pallas_raster

    cfg = C.EnvConfig(
        num_agents=4, use_ego_color=True, h_ratio=0.5,
        velocity_iters=20, position_iters=8,
    )
    state, _ = tenv.host_reset(cfg, seed=7, global_stream=seeding.GlobalStream(3))
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(80):
        state, _, _ = step(state, jnp.tile(jnp.asarray([0.05, 0.4, 0.0]), (4, 1)))

    oracle = np.asarray(jax.jit(partial(xla_raster.render_observation, cfg))(state))
    prod = np.asarray(jax.jit(partial(raster.render_observation, cfg))(state))
    np.testing.assert_array_equal(prod, oracle)
    st = jax.tree_util.tree_map(lambda x: jnp.stack([x]), state)
    kern = np.asarray(pallas_raster.render_pixels(cfg, st, interpret=True))[0]
    np.testing.assert_array_equal(kern, oracle)
    assert oracle.shape == (4, 96, 96, 3)
    # each agent's own view shows the ego car red near its anchor (h_ratio
    # 0.5 -> vertical center)
    for v in range(4):
        patch = oracle[v, 36:60, 32:64].reshape(-1, 3).astype(int)
        assert (np.abs(patch - [204, 0, 0]).sum(-1) < 40).any()


def test_backwards_flag_painted_over_hud(driven_state):
    """The blue backwards triangle sits inside the HUD black bar rows and is
    painted LAST (mcr:668-674); all three rasterizers must show it."""
    from multi_car_racing_tpu.render import pallas_raster

    cfg, state = driven_state
    state = state.replace(driving_backward=jnp.ones(2, bool))
    oracle = np.asarray(jax.jit(partial(xla_raster.render_observation, cfg))(state))
    # blue flag pixels present
    blue = (oracle[..., 2] == 255) & (oracle[..., 0] == 0) & (oracle[..., 1] == 0)
    assert blue[:, 84:, :].any(), "oracle shows no flag pixels"
    prod = np.asarray(jax.jit(partial(raster.render_observation, cfg))(state))
    np.testing.assert_array_equal(prod, oracle)
    st = jax.tree_util.tree_map(lambda x: jnp.stack([x]), state)
    kern = np.asarray(pallas_raster.render_pixels(cfg, st, interpret=True))[0]
    np.testing.assert_array_equal(kern, oracle)
