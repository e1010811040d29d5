"""API-surface polish (VERDICT round-1 #9): EzPickle-style pickling,
Monitor recording wrapper, human-render window fallback."""

import os
import pickle

import numpy as np

from multi_car_racing_tpu import gym_api as mcr


def test_facade_pickle_roundtrip():
    """Reference env is EzPickle (mcr:10,134): pickling captures constructor
    args; unpickling re-runs __init__."""
    env = mcr.MultiCarRacing(
        num_agents=2, verbose=0, direction="CW", use_random_direction=False,
        use_ego_color=True, global_seed=9,
    )
    env2 = pickle.loads(pickle.dumps(env))
    assert env2.num_agents == 2
    assert env2.cfg.direction == "CW"
    assert env2.cfg.use_ego_color and not env2.cfg.use_random_direction
    env2.seed(3)
    obs = env2.reset()
    assert obs.shape == (2, 96, 96, 3)
    obs, r, d, _ = env2.step(np.zeros((2, 3)))
    assert r.shape == (2,)


def test_registered_env_pickle_roundtrip():
    env = mcr.make("CarRacing-v0", verbose=0)
    env2 = pickle.loads(pickle.dumps(env))
    assert env2.max_episode_steps == 1000
    assert env2.num_agents == 1
    env2.seed(1)
    env2.reset()
    env2.step(np.zeros((1, 3)))


def test_monitor_records_video_and_stats(tmp_path):
    """Monitor-equivalent of the reference demo's gym.wrappers.Monitor
    (mcr:714-717): per-episode video + stats.json."""
    from multi_car_racing_tpu import monitor

    env = monitor.Monitor(
        mcr.make("CarRacing-v0", verbose=0), str(tmp_path), force=True
    )
    env.seed(5)
    env.reset()
    for _ in range(4):
        _, r, done, _ = env.step(np.asarray([[0.0, 0.2, 0.0]]))
    env.close()

    files = os.listdir(tmp_path)
    assert "stats.json" in files
    vids = [f for f in files if f.startswith("episode000000")]
    assert vids, files
    assert os.path.getsize(tmp_path / vids[0]) > 0
    import json

    stats = json.load(open(tmp_path / "stats.json"))
    assert stats["episode_lengths"] == [4]
    assert len(stats["episode_returns"]) == 1
    # env paid -0.1/step minus spawn/tile bonuses; just sanity the shape.
    assert len(stats["episode_returns"][0]) == 1


def test_render_human_headless_returns_frames(monkeypatch):
    """Without a display, render('human') returns rgb frames (round-1
    contract); the demo's window gate treats nonzero arrays as isopen."""
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    monkeypatch.delenv("MCR_FORCE_WINDOW", raising=False)
    env = mcr.MultiCarRacing(num_agents=1, verbose=0)
    env.seed(2)
    env.reset()
    out = env.render("human")
    assert out.shape[0] == 1 and out.dtype == np.uint8
    env.close()


def test_human_render_per_agent_windows(monkeypatch):
    import pytest
    """render('human') opens one window PER AGENT with the reference's
    captions (mcr:529-536) and returns per-agent isopen bools (mcr:595-597).
    SDL's dummy driver exercises the real window path headlessly."""
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
    monkeypatch.setenv("MCR_FORCE_WINDOW", "1")
    pygame = pytest.importorskip("pygame")
    pytest.importorskip("pygame._sdl2.video")

    import multi_car_racing_tpu as mcr

    env = mcr.make("MultiCarRacing-v0", num_agents=2, verbose=0)
    env.seed(3)
    env.reset()
    out = env.render("human")
    assert out.shape == (2,) and out.dtype == bool and out.all()
    viewer = env._viewer
    assert viewer is not None and viewer._windows is not None
    assert len(viewer._windows) == 2
    assert viewer._windows[0].window.title == "Car 0"
    assert viewer._windows[1].window.title == "Car 1"
    env.close()
    assert not viewer.isopen
