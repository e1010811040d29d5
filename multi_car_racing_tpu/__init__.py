"""multi_car_racing_tpu — TPU-native vectorized multi-agent car racing.

Reimplements the capabilities of ``gym_multi_car_racing`` (MultiCarRacing-v0)
as a batched, jit/vmap-compiled JAX engine: analytic Box2D-semantics car
physics, procedural track generation (host bit-parity + device throughput
paths), tile-visit reward engine, pixel rasterization, mesh-sharded PPO
learner, and a Gym-compatible facade.

Quick start (Gym-style, single env):

    import multi_car_racing_tpu as mcr
    env = mcr.make("MultiCarRacing-v0", num_agents=2)
    obs = env.reset()
    obs, reward, done, info = env.step(actions)   # actions (2, 3)

Batched functional core (thousands of envs under jit/vmap):

    from multi_car_racing_tpu import config, env
    cfg = config.EnvConfig(num_agents=2)
    state = jax.vmap(lambda k: env.device_reset(cfg, k))(keys)
    state, reward, done = jax.vmap(partial(env.step, cfg))(state, actions)
"""

from . import config
from .config import EnvConfig
from .gym_api import MultiCarRacing, TimeLimit, VectorMultiCarRacing, make

__version__ = "0.1.0"
__all__ = [
    "config", "EnvConfig", "MultiCarRacing", "TimeLimit",
    "VectorMultiCarRacing", "make",
]
