"""Gym-compatible facade: numpy in/out, reference API surface.

Drop-in equivalent of the reference's ``MultiCarRacing`` class (mcr:125-674)
and its registration entry (reference __init__.py:5-10):

    env = multi_car_racing_tpu.make("MultiCarRacing-v0", num_agents=2)
    obs = env.reset()                       # (N, 96, 96, 3) uint8
    obs, reward, done, info = env.step(a)   # reward (N,), done bool

Single-env convenience wrapper over the batched functional core; for
throughput use the functional API (env.step / vmap) directly.

API-parity notes (SURVEY.md §2.1):
- the reference declares per-car/per-agent spaces that don't match its own
  step contract; we declare honest batched spaces instead (documented
  divergence),
- ``step`` re-flattens any action shape via reshape(num_agents, -1), like
  mcr:420,
- ``render('human')`` opens a live SDL window (agent views tiled in one
  window) and returns per-agent ``isopen`` bools when a display exists
  (window.py); on headless hosts it returns the rgb_array frames instead.
  'state_pixels' and 'rgb_array' match the reference viewports. For video
  capture, wrap with ``monitor.Monitor`` (the gym Monitor equivalent,
  mcr:714-717).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import config as C
from . import env as tenv
from . import seeding

metadata = {
    "render.modes": ["human", "rgb_array", "state_pixels"],
    "video.frames_per_second": C.FPS,
}


class Box:
    """Minimal Box space (gymnasium-compatible attributes)."""

    def __init__(self, low, high, shape, dtype):
        self.low = np.broadcast_to(np.asarray(low, dtype), shape)
        self.high = np.broadcast_to(np.asarray(high, dtype), shape)
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)

    def sample(self, rng=None):
        rng = rng or np.random
        # gymnasium semantics: uniform on bounded dims, standard normal on
        # unbounded ones (np.random.uniform raises on infinite bounds).
        bounded = np.isfinite(self.low) & np.isfinite(self.high)
        out = rng.standard_normal(self.shape)
        out = np.where(
            bounded,
            rng.uniform(np.where(bounded, self.low, 0.0),
                        np.where(bounded, self.high, 1.0)),
            out,
        )
        return out.astype(self.dtype)

    def contains(self, x):
        x = np.asarray(x)
        return (
            x.shape == self.shape
            and bool((x >= self.low - 1e-6).all())
            and bool((x <= self.high + 1e-6).all())
        )

    def __repr__(self):
        return f"Box{self.shape}"


class MultiCarRacing:
    metadata = metadata

    def __init__(
        self,
        num_agents: int = 2,
        verbose: int = 1,
        direction: str = "CCW",
        use_random_direction: bool = True,
        backwards_flag: bool = True,
        h_ratio: float = 0.25,
        use_ego_color: bool = False,
        global_seed: int | None = None,
    ):
        # EzPickle-equivalent (mcr:10,134): pickling captures the constructor
        # args and unpickling re-runs __init__ — no mid-episode state capture,
        # exactly like the reference.
        self._ezpickle_kwargs = dict(
            num_agents=num_agents, verbose=verbose, direction=direction,
            use_random_direction=use_random_direction,
            backwards_flag=backwards_flag, h_ratio=h_ratio,
            use_ego_color=use_ego_color, global_seed=global_seed,
        )
        self.cfg = C.EnvConfig(
            num_agents=num_agents,
            direction=direction,
            use_random_direction=use_random_direction,
            backwards_flag=backwards_flag,
            h_ratio=h_ratio,
            use_ego_color=use_ego_color,
            verbose=verbose,
            track_skid=True,   # rgb_array/human render skid trails
        )
        self.num_agents = num_agents
        # The reference draws direction/spawn order from the module-global
        # np.random (mcr:352-357); here that stream is explicit and seedable.
        self._global = seeding.GlobalStream(global_seed)
        self.np_random, _ = seeding.np_random(None)
        self._state = None
        self._viewer = None
        self.reward = np.zeros(num_agents)

        n = num_agents
        self.action_space = Box(
            np.tile([-1.0, 0.0, 0.0], (n, 1)), np.tile([1.0, 1.0, 1.0], (n, 1)),
            (n, 3), np.float32,
        )
        self.observation_space = Box(0, 255, (n, C.STATE_H, C.STATE_W, 3), np.uint8)

        cfg = self.cfg
        self._step_fn = jax.jit(partial(tenv.step, cfg))

        from .render import raster

        self._obs_fn = jax.jit(partial(raster.render_observation, cfg))
        self._video_fn = jax.jit(
            partial(raster.render_observation, cfg, vp_w=C.VIDEO_W, vp_h=C.VIDEO_H,
                    draw_particles=True)
        )

    # -- pickling (EzPickle semantics, mcr:10,134) --------------------------
    def __getstate__(self):
        return dict(self._ezpickle_kwargs)

    def __setstate__(self, kwargs):
        self.__init__(**kwargs)

    # -- gym API ----------------------------------------------------------
    def seed(self, seed=None):
        self.np_random, seed = seeding.np_random(seed)
        return [seed]

    def reset(self):
        state, info = tenv.host_reset(
            self.cfg, np_rng=self.np_random, global_stream=self._global
        )
        if self.cfg.verbose == 1:
            print(
                f"Track generation: {info['n_tiles']}-tiles track "
                f"({info['retries']} retries)"
            )
        self._state = state
        self.reward = np.asarray(state.reward)
        return np.asarray(self._obs_fn(state))

    def step(self, action):
        if self._state is None:
            raise RuntimeError("call reset() first")
        if action is None:
            # reference step(None) is internal-only (reset tick); reset()
            # already performed it.
            raise ValueError("action must not be None; reset() handles the spawn tick")
        action = np.reshape(np.asarray(action, np.float32), (self.num_agents, -1))
        state, r, done = self._step_fn(self._state, jnp.asarray(action))
        self._state = state
        self.reward = np.asarray(state.reward)
        obs = np.asarray(self._obs_fn(state))
        return obs, np.asarray(r), bool(done), {}

    def render(self, mode: str = "human"):
        assert mode in ("human", "state_pixels", "rgb_array")
        if self._state is None:
            return None  # reference guards on reset-not-called (mcr:538)
        if mode == "state_pixels":
            return np.asarray(self._obs_fn(self._state))
        frames = np.asarray(self._video_fn(self._state))
        if mode == "human":
            from . import window

            if self._viewer is None and window.display_available():
                self._viewer = window.HumanViewer()
            if self._viewer is not None:
                # Reference contract: per-window isopen bools (mcr:595-597).
                return self._viewer.show(frames)
        return frames

    def close(self):
        self._state = None
        if self._viewer is not None:
            self._viewer.close()
            self._viewer = None

    # -- convenience ------------------------------------------------------
    @property
    def state(self):
        """The functional EnvState (for tooling/checkpointing)."""
        return self._state

    @property
    def track_length(self):
        return int(self._state.track.n_tiles) if self._state is not None else None

    @property
    def tile_visited_count(self):
        return list(np.asarray(self._state.tile_visited_count))

    @property
    def driving_backward(self):
        return np.asarray(self._state.driving_backward)

    @property
    def driving_on_grass(self):
        return np.asarray(self._state.driving_on_grass)


class TimeLimit:
    """The registration wrapper (reference __init__.py:8): truncates at
    max_episode_steps (reported through ``done`` like gym 0.17)."""

    def __init__(self, env: MultiCarRacing, max_episode_steps: int = C.MAX_EPISODE_STEPS):
        self.env = env
        self.max_episode_steps = max_episode_steps
        self._elapsed = 0

    def __getattr__(self, name):
        # 'env' / dunders must fail fast: during unpickling this runs before
        # __dict__ is restored and a delegating lookup would recurse.
        if name == "env" or name.startswith("__"):
            raise AttributeError(name)
        return getattr(self.env, name)

    def reset(self):
        self._elapsed = 0
        return self.env.reset()

    def step(self, action):
        obs, r, done, info = self.env.step(action)
        self._elapsed += 1
        if self._elapsed >= self.max_episode_steps:
            info["TimeLimit.truncated"] = not done
            done = True
        return obs, r, done, info


class VectorMultiCarRacing:
    """Batched numpy facade: E lockstep envs on device (new capability — the
    reference is strictly single-env; this is the throughput entry point the
    functional core exists for).

    - ``reset()`` -> obs; ``step(actions (E, N, 3))`` -> (obs, rewards
      (E, N), dones (E,), info). Done/time-limited envs auto-reset at the
      START of the next step (the returned obs/reward of a finishing step
      are the terminal ones), drawing fresh tracks from an on-device pool.
    - Tracks and episode params come from the on-device threefry generator
      (statistically equivalent to the reference's MT19937 streams; use the
      single-env ``MultiCarRacing`` facade for bit-parity work).
    - obs="pixels" renders (E, N, 96, 96, 3) uint8 via the Pallas kernel on
      TPU; obs="state" returns the compact (E, N, 20) feature vector
      (obs.state_observation); obs="none" returns None (physics only).
    """

    metadata = metadata

    def __init__(
        self,
        num_envs: int,
        num_agents: int = 2,
        obs: str = "pixels",
        seed: int = 0,
        pool_size: int = 32,
        max_episode_steps: int = C.MAX_EPISODE_STEPS,
        **env_kwargs,
    ):
        assert obs in ("pixels", "state", "none"), obs
        self.num_envs = num_envs
        self.num_agents = num_agents
        self.obs_type = obs
        self.cfg = C.EnvConfig(
            num_agents=num_agents, max_episode_steps=max_episode_steps,
            **env_kwargs,
        )
        self._key = jax.random.PRNGKey(seed)
        self._pool = None
        self._state = None
        self._pool_size = pool_size

        n, E = num_agents, num_envs
        self.action_space = Box(
            np.tile([-1.0, 0.0, 0.0], (E, n, 1)),
            np.tile([1.0, 1.0, 1.0], (E, n, 1)), (E, n, 3), np.float32,
        )
        if obs == "pixels":
            self.observation_space = Box(
                0, 255, (E, n, C.STATE_H, C.STATE_W, 3), np.uint8
            )
        elif obs == "state":
            from . import obs as tobs

            self.observation_space = Box(
                -np.inf, np.inf, (E, n, tobs.STATE_OBS_DIM), np.float32
            )
        else:
            self.observation_space = None

        cfg = self.cfg

        def _obs(state):
            if obs == "pixels":
                from . import obs as tobs

                return tobs.pixel_observation_batched(cfg, state)
            if obs == "state":
                from . import obs as tobs

                return jax.vmap(tobs.state_observation)(state)
            return None

        def _tick(state, actions, key):
            # Autoreset only when some env actually needs it: reset_done_envs
            # computes a full fresh reset (track gather + spawn physics tick)
            # for the whole batch, which would double the physics cost of
            # every step if run unconditionally.
            needs = state.done | (state.steps >= max_episode_steps)
            state = jax.lax.cond(
                jnp.any(needs),
                lambda s: tenv.reset_done_envs(cfg, s, self._pool, key),
                lambda s: s,
                state,
            )
            state, r, d = jax.vmap(partial(tenv.step, cfg))(state, actions)
            return state, _obs(state), r, d | (state.steps >= max_episode_steps)

        self._tick = jax.jit(_tick, donate_argnums=0)
        self._obs_fn = jax.jit(_obs)
        self._reset_fn = jax.jit(jax.vmap(partial(tenv.device_reset, cfg)))

    def _split(self):
        self._key, k = jax.random.split(self._key)
        return k

    def reset(self):
        cfg = self.cfg
        if self._pool is None:
            self._pool = tenv.make_track_pool_checked(
                cfg, self._split(), self._pool_size
            )
        keys = jax.random.split(self._split(), self.num_envs)
        self._state = self._reset_fn(keys)
        out = self._obs_fn(self._state)
        return None if out is None else np.asarray(out)

    def step(self, actions):
        if self._state is None:
            raise RuntimeError("call reset() first")
        actions = jnp.asarray(
            np.reshape(np.asarray(actions, np.float32),
                       (self.num_envs, self.num_agents, -1))
        )
        self._state, obs, r, d = self._tick(self._state, actions, self._split())
        return (
            None if obs is None else np.asarray(obs),
            np.asarray(r), np.asarray(d), {},
        )

    @property
    def state(self):
        return self._state

    def close(self):
        self._state = None


REGISTRY = {
    "MultiCarRacing-v0": dict(
        max_episode_steps=C.MAX_EPISODE_STEPS, reward_threshold=C.REWARD_THRESHOLD
    ),
    # The exact CarRacing-v0 special case (reference README.md:66-71).
    "CarRacing-v0": dict(
        max_episode_steps=C.MAX_EPISODE_STEPS,
        reward_threshold=C.REWARD_THRESHOLD,
        kwargs=dict(
            num_agents=1, use_random_direction=False, backwards_flag=False
        ),
    ),
}


def make(env_id: str = "MultiCarRacing-v0", **kwargs) -> TimeLimit:
    if env_id not in REGISTRY:
        raise KeyError(f"unknown env id {env_id!r}; have {sorted(REGISTRY)}")
    spec = REGISTRY[env_id]
    merged = dict(spec.get("kwargs", {}))
    merged.update(kwargs)
    env = MultiCarRacing(**merged)
    wrapped = TimeLimit(env, spec["max_episode_steps"])
    wrapped.reward_threshold = spec["reward_threshold"]
    return wrapped
