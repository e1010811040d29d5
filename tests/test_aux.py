"""Aux subsystems: state observation, metrics, checkpoint round-trip."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from multi_car_racing_tpu import (
    checkpoint, config as C, env as tenv, metrics, obs as tobs, seeding,
)


def test_state_observation_shape_and_scale():
    cfg = C.EnvConfig(num_agents=3)
    state, _ = tenv.host_reset(cfg, seed=4, global_stream=seeding.GlobalStream(4))
    f = np.asarray(tobs.state_observation(state))
    assert f.shape == (3, tobs.STATE_OBS_DIM)
    assert np.isfinite(f).all()
    # roughly unit-scale features at spawn
    assert np.abs(f).max() < 5.0
    # heading error ~0 at spawn (cars face along the track)
    assert (f[:, 15] > 0.9).all()          # cos(err) ~ 1


def test_env_metrics_finite():
    cfg = C.EnvConfig(num_agents=2)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    batched = jax.jit(jax.vmap(lambda k: tenv.device_reset(cfg, k)))(keys)
    m = metrics.env_metrics(batched)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    assert float(m["frac_done"]) == 0.0


def test_jsonl_logger(tmp_path):
    p = str(tmp_path / "log.jsonl")
    lg = metrics.JsonlLogger(p)
    lg.log(100, {"a": 1.5})
    lg.log(200, {"a": 2.5}, note="x")
    import json

    rows = [json.loads(l) for l in open(p)]
    assert rows[0]["a"] == 1.5 and rows[1]["env_steps"] == 200
    assert "env_steps_per_sec" in rows[1]


def test_checkpoint_roundtrip_env_state(tmp_path):
    cfg = C.EnvConfig(num_agents=2)
    state, _ = tenv.host_reset(cfg, seed=9, global_stream=seeding.GlobalStream(9))
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(5):
        state, _, _ = step(state, jnp.asarray([[0.0, 0.5, 0.0]] * 2))

    path = str(tmp_path / "ckpt")
    checkpoint.save(path, state)
    template, _ = tenv.host_reset(cfg, seed=1, global_stream=seeding.GlobalStream(1))
    restored = checkpoint.restore(path, template)

    # Bit-identical resume: continuing from the restored state matches.
    a, ra, _ = step(state, jnp.asarray([[0.1, 0.5, 0.0]] * 2))
    b, rb, _ = step(restored, jnp.asarray([[0.1, 0.5, 0.0]] * 2))
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    np.testing.assert_array_equal(
        np.asarray(a.cars.hull_c), np.asarray(b.cars.hull_c)
    )


def test_tui_frame_and_keymap():
    """Terminal-play helpers: ANSI frame structure + reference key bindings."""
    from multi_car_racing_tpu import tui

    img = np.zeros((96, 96, 3), np.uint8)
    img[0, 0] = (255, 0, 0)
    s = tui.frame_to_ansi(img)
    assert s.count("\n") == 47                  # 96 rows -> 48 half-block lines
    assert "38;2;255;0;0" in s                  # top-left red fg
    now = 0.0
    held = {"UP": 1.0, "a": 1.0, "s": 1.0}      # car0 gas, car1 left+brake
    a = tui.actions_from_keys(held, 2, now)
    assert a[0, 1] == 1.0 and a[0, 0] == 0.0
    assert a[1, 0] == -1.0 and a[1, 2] == np.float32(0.8)


def test_vector_env_facade():
    """VectorMultiCarRacing: batched numpy API with autoreset."""
    import numpy as np
    from multi_car_racing_tpu import gym_api as mcr

    E, N = 4, 2
    venv = mcr.VectorMultiCarRacing(
        E, num_agents=N, obs="state", seed=3, pool_size=2,
        max_episode_steps=12, velocity_iters=8, position_iters=3,
    )
    obs = venv.reset()
    assert obs.shape == (E, N, tobs.STATE_OBS_DIM)
    a = np.tile([0.0, 0.7, 0.0], (E, N, 1))
    steps_before = np.asarray(venv.state.steps)
    for t in range(14):
        obs, r, d, _ = venv.step(a)
        assert obs.shape == (E, N, tobs.STATE_OBS_DIM) and r.shape == (E, N) and d.shape == (E,)
    # time limit is 12: every env must have been autoreset at least once,
    # so step counters are all < 14.
    assert (np.asarray(venv.state.steps) < 14).all()
    assert (np.asarray(venv.state.steps) > 0).all()
    venv.close()


def test_vector_env_pixels_shape():
    import numpy as np
    from multi_car_racing_tpu import gym_api as mcr

    venv = mcr.VectorMultiCarRacing(
        2, num_agents=2, obs="pixels", seed=0, pool_size=2,
        velocity_iters=8, position_iters=3,
    )
    obs = venv.reset()
    assert obs.shape == (2, 2, 96, 96, 3) and obs.dtype == np.uint8
    obs, r, d, _ = venv.step(np.zeros((2, 2, 3)))
    assert obs.shape == (2, 2, 96, 96, 3)
    venv.close()


def test_checkpoint_relocatable(tmp_path):
    """Two-slot checkpoints must survive being moved to a new path (pointer
    stores the slot basename, resolved against the checkpoint directory)."""
    import shutil
    import jax
    import jax.numpy as jnp
    from multi_car_racing_tpu import checkpoint

    tree = {"a": jnp.arange(6.0), "b": {"c": jnp.asarray(3, jnp.int32)}}
    src = tmp_path / "orig"
    src.mkdir()
    checkpoint.save(str(src / "ck"), tree)
    tree2 = jax.tree_util.tree_map(lambda x: x + 1, tree)
    checkpoint.save(str(src / "ck"), tree2)       # second save -> other slot
    dst = tmp_path / "moved"
    shutil.move(str(src), str(dst))
    template = jax.tree_util.tree_map(jnp.zeros_like, tree)
    restored = checkpoint.restore(str(dst / "ck"), template)
    assert float(restored["a"][3]) == 4.0         # latest (incremented) slot
    assert int(restored["b"]["c"]) == 4
