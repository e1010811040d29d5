"""Perf-phase measurements beyond bench.py's headline (run on the TPU).

    python scripts/bench_extras.py near4        # N=4 broadphase near-fraction
    python scripts/bench_extras.py policy2      # 2-agent policy-driven bench row
    python scripts/bench_extras.py goldentpu    # compiled-raster vs committed goldens

near4: fraction of envs with any broadphase-positive car pair at 4096x4
under the bench's random action stream — sizes the N=4 contact-partition
cap (docs/PERF.md "Contact partition").

policy2: the honest companion to bench.py's random-action headline
(VERDICT r3 #5a): drive 4096x2 envs with the committed 2-agent checkpoint
policy (docs/runs/multi2p_ckpt) and report env-steps/s + the
broadphase near-fraction under realistic racing traffic.

goldentpu: render the golden-fixture scenes with the COMPILED Pallas
rasterizer on TPU and diff against the committed CPU-interpret fixtures —
the hardware-only check that MXU routing precision keeps frames
pixel-identical across backends (scripts/tpu_checks.py is the physics
counterpart).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import time
from functools import partial

import numpy as np


def _bench_state(cfg, E, n_tracks=16):
    import jax
    import jax.numpy as jnp

    from multi_car_racing_tpu import env as tenv, seeding as mseed
    from multi_car_racing_tpu.track import host as track_host

    tracks, orders, dirs = [], [], []
    for seed in range(n_tracks):
        np_rng, _ = mseed.np_random(seed)
        gs = mseed.GlobalStream(seed)
        direction = gs.direction() if cfg.use_random_direction else cfg.direction
        orders.append(np.asarray(gs.car_order(cfg.num_agents)))
        pts, border, _ = track_host.generate_track_fast(np_rng)
        tracks.append(tenv.pack_track(pts, border, max_tiles=cfg.max_tiles))
        dirs.append(direction == "CW")
    stack = lambda xs: jax.tree_util.tree_map(lambda *l: jnp.stack(l), *xs)
    reset_batch = jax.jit(jax.vmap(partial(tenv.reset_from_parts, cfg)))
    batched = reset_batch(
        stack(tracks), jnp.asarray(np.stack(orders), jnp.int32),
        jnp.asarray(dirs),
    )
    reps = E // n_tracks
    return jax.tree_util.tree_map(
        lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)), batched
    )


def near4():
    import jax
    import jax.numpy as jnp

    from multi_car_racing_tpu import config as C, env as tenv
    from multi_car_racing_tpu.physics import pallas_world

    E, N, T = 4096, 4, 200
    cfg = C.EnvConfig(num_agents=N)
    state = _bench_state(cfg, E)
    step = jax.jit(jax.vmap(partial(tenv.step, cfg)))
    rng = np.random.RandomState(0)
    acts = jnp.asarray(
        rng.uniform([-1, 0, 0], [1, 1, 0.2], size=(8, E, N, 3)), jnp.float32
    )
    fracs = []
    for t in range(T):
        state, _, _ = step(state, acts[t % 8])
        if t % 10 == 9:
            near = pallas_world.near_flags(state.cars, N)
            fracs.append(float(jnp.mean(near.astype(jnp.float32))))
            print(f"t={t+1}: near fraction {fracs[-1]:.3f}", flush=True)
    print(f"near4: mean {np.mean(fracs):.3f} max {np.max(fracs):.3f} "
          f"over steps 10..{T}")


def policy2():
    import jax
    import jax.numpy as jnp

    from multi_car_racing_tpu import checkpoint, config as C, env as tenv
    from multi_car_racing_tpu import obs as tobs
    from multi_car_racing_tpu.learner import ppo
    from multi_car_racing_tpu.learner.networks import ActorCritic
    from multi_car_racing_tpu.physics import pallas_world

    E, N, T = 4096, 2, 100
    cfg = C.EnvConfig(num_agents=N)
    pcfg = ppo.PPOConfig(num_envs=8, obs_type="state", action_repeat=4,
                         normalize_obs=True, width=512)
    ts = ppo.init_train_state(cfg, pcfg, jax.random.PRNGKey(0))
    ts = checkpoint.restore(
        os.path.join("docs", "runs", "multi2p_ckpt"), ts)
    net = ActorCritic(obs_type="state", width=512)
    state = _bench_state(cfg, E)
    step = jax.vmap(partial(tenv.step, cfg))

    params, rms = ts.params, ts.obs_rms

    @jax.jit
    def rollout(state):
        def body(carry, _):
            st = carry
            obs = jax.vmap(tobs.state_observation)(st)
            obs = ppo._rms_normalize(rms, obs)
            mean, _, _ = net.apply(params, obs)
            a = jnp.stack(
                [jnp.clip(mean[..., 0], -1, 1), jnp.clip(mean[..., 1], 0, 1),
                 jnp.clip(mean[..., 2], 0, 1)], axis=-1)

            def rep(st, _):
                st, r, d = step(st, a)
                return st, r.mean()

            st, rs = jax.lax.scan(rep, st, None, length=4)
            near = pallas_world.near_flags(st.cars, N)
            return st, (rs.mean(), near.mean())

        state, (rews, nears) = jax.lax.scan(body, state, None, length=T // 4)
        return state, rews, nears

    # settle into racing traffic, then time
    state, _, nears = rollout(state)
    jax.block_until_ready(nears)
    t0 = time.time()
    state, rews, nears = rollout(state)
    r = float(rews.mean())   # host read forces completion (axon enqueue ack)
    el = time.time() - t0
    sps = E * T / el
    print(f"policy2: {sps:,.0f} env-steps/s at {E}x{N} under the committed "
          f"2-agent policy (mean near-fraction {float(nears.mean()):.3f}, "
          f"mean step reward {r:+.3f})")


def goldentpu():
    import glob
    import json

    import jax
    import jax.numpy as jnp

    from multi_car_racing_tpu import config as C, env as tenv, seeding
    from multi_car_racing_tpu.render import pallas_raster

    assert jax.default_backend() == "tpu"
    fails = 0
    paths = [p for p in sorted(glob.glob(os.path.join(
        "tests", "fixtures", "golden", "*.npz")))
        if "rgb_array" not in os.path.basename(p)]
    for path in paths:
        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data["meta"]))
        cfg = C.EnvConfig(**meta["cfg"])
        template, _ = tenv.host_reset(
            cfg, seed=0, global_stream=seeding.GlobalStream(0))
        treedef = jax.tree_util.tree_structure(template)
        leaves = [jnp.asarray(data[f"leaf_{i}"])
                  for i in range(meta["n_leaves"])]
        state = jax.tree_util.tree_unflatten(treedef, leaves)
        batched = jax.tree_util.tree_map(lambda x: x[None], state)
        prod = np.asarray(pallas_raster.render_pixels(cfg, batched))[0]
        same = (prod == data["frame"]).all()
        ndiff = int((prod != data["frame"]).sum())
        mdiff = int(np.abs(prod.astype(int) - data["frame"].astype(int)).max())
        print(f"{os.path.basename(path)}: "
              f"{'PIXEL-IDENTICAL' if same else f'{ndiff} px differ (max {mdiff})'}")
        fails += not same
    print("goldentpu:", "all identical" if not fails else f"{fails} fixtures differ")




def nearpairs():
    """Pair-level broadphase stats at 4096x4: how many of an env's 6 car
    pairs are actually near when the env-level broadphase fires — sizes
    the prospective PAIR-level manifold partition (docs/PERF.md N=4
    notes). Appended to the file-level command table."""
    import jax
    import jax.numpy as jnp

    from multi_car_racing_tpu import config as C, env as tenv
    from multi_car_racing_tpu.physics import pallas_world

    E, N, T = 4096, 4, 200
    cfg = C.EnvConfig(num_agents=N)
    state = _bench_state(cfg, E)
    step = jax.jit(jax.vmap(partial(tenv.step, cfg)))
    rng = np.random.RandomState(0)
    acts = jnp.asarray(
        rng.uniform([-1, 0, 0], [1, 1, 0.2], size=(8, E, N, 3)), jnp.float32
    )
    rows = []
    for t in range(T):
        state, _, _ = step(state, acts[t % 8])
        if t % 20 == 19:
            pp = np.asarray(pallas_world.near_flags(state.cars, N,
                                                    per_pair=True))
            env_near = pp.any(-1)
            pairs_in_near = pp[env_near].sum(-1)
            rows.append((env_near.mean(), pp.mean(),
                         pairs_in_near.mean() if env_near.any() else 0.0))
            print(f"t={t+1}: env-near {rows[-1][0]:.3f}, pair-near "
                  f"{rows[-1][1]:.3f}, pairs/near-env {rows[-1][2]:.2f}",
                  flush=True)
    a = np.array(rows)
    print(f"nearpairs: env-near {a[:,0].mean():.3f}, pair-near "
          f"{a[:,1].mean():.3f} of 6, mean near-pairs per near env "
          f"{a[:,2].mean():.2f}")




def satbench():
    """Time the XLA wheel<->tile SAT sweep and the whole fused track-pass
    stage in isolation at 4096x2 (chained scan, fresh input, host-read
    sync) — sizes the headroom of a Pallas SAT kernel vs docs/PERF.md's
    per-component step breakdown."""
    import jax
    import jax.numpy as jnp

    from multi_car_racing_tpu import config as C, env as tenv
    from multi_car_racing_tpu.physics import overlap

    E, N, T = 4096, 2, 100
    cfg = C.EnvConfig(num_agents=N)
    state = _bench_state(cfg, E)
    cars, track = state.cars, state.track

    def time_scan(fn, init):
        run = jax.jit(lambda c: jax.lax.scan(fn, c, None, length=T)[0])
        # Warm up with a HOST READ, not block_until_ready: over the axon
        # tunnel block_until_ready can acknowledge at enqueue, and the
        # first real execution pays a one-shot ~10 s deferred upload of the
        # closure-captured track tables — which previously landed inside
        # the timed call and inflated the figure 100x (round-5 ledger).
        out = run(init)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        t0 = time.time()
        out = run(init)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())  # host read
        return (time.time() - t0) / T * 1e3

    # Dependency-chaining trap (found round 5): threading a per-env (E,)
    # reduction of the output back into the carry state made XLA compile a
    # ~200x-slower program (208 ms/step) than the identical computation
    # chained through a single scalar (0.98 ms/step, which matches the
    # whole-step budget). Chain through ONE scalar.
    def sat_body(carry, _):
        c, acc = carry
        ov = jax.vmap(overlap.wheel_tile_overlap)(c, track)
        s = jnp.sum(ov).astype(jnp.float32)
        c = c.replace(wheel_c=c.wheel_c + s * 1e-12)
        return (c, acc + s), ()

    ms = time_scan(sat_body, (cars, jnp.float32(0)))
    print(f"satbench: wheel_tile_overlap alone {ms:.3f} ms/step at {E}x{N}")

    # The track pass is a custom_vmap function: call it through jax.vmap so
    # the batching rule dispatches (a direct batched call runs the
    # unbatched body and shape-errors).
    tp = jax.vmap(tenv._make_track_pass(N, "auto", False),
                  in_axes=(0, 0, 0, 0, 0))

    def track_body(carry, _):
        c, visited, touched, acc = carry
        wor, new_vis, bonus, cnt, new_touch, nearest_beta, on_grass = tp(
            track, c, c.hull_origin, visited, touched
        )
        # chain EVERY output so nothing is dead-code-eliminated
        s = (
            jnp.sum(wor).astype(jnp.float32)
            + bonus.sum() + cnt.sum().astype(jnp.float32)
            + nearest_beta.sum() + on_grass.sum().astype(jnp.float32)
            + new_touch.sum().astype(jnp.float32)
        )
        return (c.replace(wheel_c=c.wheel_c + s * 1e-12),
                new_vis, new_touch, acc + s), ()

    visited = jnp.zeros((E, N, cfg.max_tiles), bool)
    touched = jnp.zeros((E, cfg.max_tiles), bool)
    ms2 = time_scan(track_body, (cars, visited, touched, jnp.float32(0)))
    print(f"satbench: full track-pass stage {ms2:.3f} ms/step")

if __name__ == "__main__":
    globals()[sys.argv[1]]()
