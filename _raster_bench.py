import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from functools import partial
import numpy as np
from multi_car_racing_tpu import config as C, env as tenv, obs as tobs
from multi_car_racing_tpu.track import host as th
from multi_car_racing_tpu import seeding as ms

cfg = C.EnvConfig(num_agents=2)
E = int(os.environ.get("E", 2048))
np_rng, _ = ms.np_random(0)
gs = ms.GlobalStream(0)
d = gs.direction(); order = np.asarray(gs.car_order(2))
pts, border, _ = th.generate_track_fast(np_rng)
track = tenv.pack_track(pts, border, max_tiles=cfg.max_tiles)
state = jax.jit(jax.vmap(partial(tenv.reset_from_parts, cfg)))(
    jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x[None], (E,)+x.shape), track),
    jnp.broadcast_to(jnp.asarray(order, jnp.int32)[None], (E,2)),
    jnp.broadcast_to(jnp.asarray(d=="CW")[None], (E,)))

from functools import partial as _p
@_p(jax.jit, static_argnums=1)
def render_chain(state, n):
    def body(acc, _):
        img = tobs.pixel_observation_batched(cfg, state)
        return acc + img.astype(jnp.uint32).sum(), None
    acc, _ = jax.lax.scan(body, jnp.uint32(0), None, length=n)
    return acc

n = 20
t0=time.time(); r = render_chain(state, n); jax.block_until_ready(r); c=time.time()-t0
t0=time.time(); r = render_chain(state, n); jax.block_until_ready(r); e=time.time()-t0
views = E*2*n
print(f"E={E} n={n} compile+first={c:.1f}s timed={e:.3f}s -> {e/views*1e6:.2f} us/view, {views/e:.0f} views/s")
