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

# Advance past the 1 s zoom animation unless MCR_RB_WARMUP=1: warmup frames
# take the kernel's full-track world-space path (~122 us/view vs ~5.7
# steady) and would otherwise dominate the measurement.
if os.environ.get("MCR_RB_WARMUP", "0") != "1":
    _step = jax.jit(jax.vmap(_p(tenv.step, cfg)))
    _act = jnp.tile(jnp.asarray([[0.0, 0.3, 0.0]], jnp.float32), (E, 2, 1))

    @_p(jax.jit, static_argnums=1)
    def _roll(s, k):
        def b(s, _):
            s, r, d = _step(s, _act)
            return s, r.mean()
        return jax.lax.scan(b, s, None, length=k)

    state, _rs = _roll(state, 60)
    float(_rs.sum())


@_p(jax.jit, static_argnums=1)
def render_chain(state, n):
    # Perturb the state per iteration (hull position by t*1e-6 m) so the
    # render is NOT loop-invariant — XLA hoists an invariant render out of
    # the scan and the timing becomes a no-op (measured 0.01 us/view).
    # Consume only a pixel slice: the kernel can't be partially executed,
    # and a full-image uint32 sum is itself multiple HBM sweeps.
    def body(acc, t):
        st = state.replace(
            cars=state.cars.replace(
                hull_c=state.cars.hull_c + t.astype(jnp.float32) * 1e-6
            )
        )
        img = tobs.pixel_observation_batched(cfg, st)
        return acc + img[0, 0, ::31, ::31, 0].astype(jnp.uint32).sum(), None
    acc, _ = jax.lax.scan(body, jnp.uint32(0), jnp.arange(n), length=n)
    return acc

n = 20
# Timing methodology (docs/PERF.md): the timed dispatch needs a FRESH input
# value — repeating the identical computation can return at enqueue time.
state2 = state.replace(
    cars=state.cars.replace(hull_c=state.cars.hull_c + 1e-5)
)
# block_until_ready can acknowledge at enqueue over the axon tunnel; a
# host read of the result scalar cannot.
t0=time.time(); float(render_chain(state, n)); c=time.time()-t0
t0=time.time(); float(render_chain(state2, n)); e=time.time()-t0
views = E*2*n
print(f"E={E} n={n} compile+first={c:.1f}s timed={e:.3f}s -> {e/views*1e6:.2f} us/view, {views/e:.0f} views/s")
