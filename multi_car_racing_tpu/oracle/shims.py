"""Import shims that let the reference env run headlessly on this machine.

The reference pins gym~=0.17.2 / pyglet / shapely~=1.7 (setup.py:10-13), none
of which are installed. Box2D 2.3.5 (the exact pinned version) *is* installed,
and gymnasium's ``car_dynamics`` is numerically identical to gym 0.17's
(see SURVEY.md header caveat). These shims map the missing imports onto
installed packages so the reference's physics/reward/track code runs unmodified
— used ONLY by the parity tests (tests/test_env_parity.py,
tests/test_collide.py, tests/test_physics_parity.py, tests/test_track_host.py),
never by the engine itself.

Seeding: ``gym.utils.seeding.np_random`` is mapped to *our* reimplementation of
the gym 0.17.2 hash-seed chain (multi_car_racing_tpu.seeding), so fixtures and
the engine share one seed derivation on this machine.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def install() -> None:
    if "gym" in sys.modules and getattr(sys.modules["gym"], "_mcr_tpu_shim", False):
        return

    # -- pyglet: only needed at import time; render paths are stubbed.
    pyglet = types.ModuleType("pyglet")
    pyglet.gl = types.ModuleType("pyglet.gl")
    pyglet.text = types.SimpleNamespace(Label=lambda *a, **k: None)
    pyglet.graphics = types.SimpleNamespace(draw=lambda *a, **k: None)
    sys.modules["pyglet"] = pyglet
    sys.modules["pyglet.gl"] = pyglet.gl

    # -- shapely: Point.within(Polygon) via matplotlib.path (GEOS-equivalent
    # point-in-polygon for simple quads).
    from matplotlib.path import Path as MplPath

    class Point:
        def __init__(self, xy):
            self.xy = xy

        def within(self, poly):
            return bool(poly._path.contains_point(self.xy))

    class Polygon:
        def __init__(self, verts):
            self._path = MplPath(np.asarray(verts, dtype=float))

    shap = types.ModuleType("shapely")
    geom = types.ModuleType("shapely.geometry")
    geom.Point, geom.Polygon = Point, Polygon
    shap.geometry = geom
    sys.modules["shapely"] = shap
    sys.modules["shapely.geometry"] = geom

    # -- old gym API onto gymnasium + our gym-0.17 seeding chain.
    import gymnasium
    import gymnasium.envs.box2d.car_dynamics as car_dynamics

    from .. import seeding as tpu_seeding

    gym = types.ModuleType("gym")
    gym._mcr_tpu_shim = True
    gym.Env = gymnasium.Env

    spaces = types.ModuleType("gym.spaces")
    spaces.Box = gymnasium.spaces.Box
    gym.spaces = spaces

    utils = types.ModuleType("gym.utils")

    class EzPickle:
        def __init__(self, *a, **k):
            pass

    seeding = types.ModuleType("gym.utils.seeding")
    seeding.np_random = tpu_seeding.np_random
    seeding.hash_seed = tpu_seeding.hash_seed
    seeding.create_seed = tpu_seeding.create_seed
    utils.EzPickle = EzPickle
    utils.colorize = lambda s, *a, **k: s
    utils.seeding = seeding
    gym.utils = utils

    envs = types.ModuleType("gym.envs")
    box2d_mod = types.ModuleType("gym.envs.box2d")
    box2d_mod.car_dynamics = car_dynamics
    envs.box2d = box2d_mod
    gym.envs = envs

    reg = types.ModuleType("gym.envs.registration")
    reg.register = lambda **k: None
    gym.envs.registration = reg

    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = spaces
    sys.modules["gym.utils"] = utils
    sys.modules["gym.utils.seeding"] = seeding
    sys.modules["gym.envs"] = envs
    sys.modules["gym.envs.box2d"] = box2d_mod
    sys.modules["gym.envs.box2d.car_dynamics"] = car_dynamics
    sys.modules["gym.envs.registration"] = reg

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def load_reference_env_class():
    """Import the reference MultiCarRacing class (render stubbed out)."""
    install()
    import gym_multi_car_racing.multi_car_racing as mcr

    class HeadlessMultiCarRacing(mcr.MultiCarRacing):
        def render(self, mode="human"):
            return np.zeros((self.num_agents, 96, 96, 3), dtype=np.uint8)

    return HeadlessMultiCarRacing, mcr
