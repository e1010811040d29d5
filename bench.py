"""Benchmark: env-steps/s/chip at 4096 parallel 2-agent envs (BASELINE.json
north-star config 4). Prints ONE JSON line.

Baseline: the reference measures ~544 env-steps/s for the same 2-agent
no-render config on one CPU core (BASELINE.md). ``vs_baseline`` is our
throughput divided by that.

Run on the ambient JAX platform (TPU under axon; CPU if forced). Physics-only
stepping (obs_type='none'): identical work to the reference's no-render row.
Set MCR_BENCH_PIXELS=1 to also rasterize the (E, N, 96, 96, 3) observation
every step (the Pallas kernel); the reference baseline for that mode is its
state_pixels render path (well under the no-render 544 steps/s, so
vs_baseline stays conservatively against 544).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np


def main():
    # Persistent compilation cache: host_reset + the fused kernels are ~300
    # XLA programs; cold-compiling them every bench invocation costs minutes.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multi_car_racing_tpu import config as C, env as tenv, seeding

    E = int(os.environ.get("MCR_BENCH_ENVS", 4096))
    T = int(os.environ.get("MCR_BENCH_STEPS", 100))
    N_TRACKS = int(os.environ.get("MCR_BENCH_TRACKS", 16))
    N = int(os.environ.get("MCR_BENCH_AGENTS", 2))  # BASELINE.json config 3: 4
    cfg = C.EnvConfig(num_agents=N)

    # Host-generate a small set of distinct tracks and tile the batch from
    # them (physics cost is track-independent; this keeps bench startup
    # seconds, not minutes). The spawn tick runs as ONE jitted vmapped
    # reset_from_parts — eager per-seed host_reset dispatches ~300 XLA
    # programs each (minutes over the axon tunnel).
    from multi_car_racing_tpu import seeding as mseed
    from multi_car_racing_tpu.track import host as track_host

    tracks, orders, dirs = [], [], []
    for seed in range(N_TRACKS):
        np_rng, _ = mseed.np_random(seed)
        gs = seeding.GlobalStream(seed)
        direction = gs.direction() if cfg.use_random_direction else cfg.direction
        orders.append(np.asarray(gs.car_order(cfg.num_agents)))
        pts, border, _ = track_host.generate_track_fast(np_rng)
        tracks.append(tenv.pack_track(pts, border, max_tiles=cfg.max_tiles))
        dirs.append(direction == "CW")
    stack = lambda xs: jax.tree_util.tree_map(lambda *l: jnp.stack(l), *xs)
    reset_batch = jax.jit(jax.vmap(partial(tenv.reset_from_parts, cfg)))
    batched = reset_batch(
        stack(tracks),
        jnp.asarray(np.stack(orders), jnp.int32),
        jnp.asarray(dirs),
    )
    reps = E // N_TRACKS
    batched = jax.tree_util.tree_map(
        lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)), batched
    )

    step = jax.vmap(partial(tenv.step, cfg))

    rng = np.random.RandomState(0)
    actions = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [
                        rng.uniform([-1, 0, 0], [1, 1, 0.2], size=(N, 3))
                        for _ in range(E)
                    ]
                )
                for _ in range(8)
            ]
        ),
        jnp.float32,
    )  # (8, E, 2, 3) — cycled

    # Scanned rollout — the PPO training shape (learner/ppo.py): T steps in
    # ONE dispatch. With the fused Pallas physics kernel (physics/
    # pallas_world.py) this is the fastest stepping mode; a donated
    # step-per-dispatch loop pays ~2.5 ms/step of dispatch overhead on top.
    pixels = bool(int(os.environ.get("MCR_BENCH_PIXELS", "0")))
    if pixels:
        from multi_car_racing_tpu import obs as tobs

    @jax.jit
    def rollout(state):
        def body(carry, t):
            state = carry
            a = actions[t % 8]
            state, r, d = step(state, a)
            out = r.mean()
            if pixels:
                img = tobs.pixel_observation_batched(cfg, state)
                out = out + img.astype(jnp.uint32).sum().astype(out.dtype) * 1e-30
            return state, out

        state, rews = jax.lax.scan(body, state, jnp.arange(T))
        return state, rews

    # Warmup/compile.
    t0 = time.time()
    out_state, rews = rollout(batched)
    jax.block_until_ready(rews)
    compile_s = time.time() - t0

    t0 = time.time()
    out_state, rews = rollout(out_state)
    jax.block_until_ready(rews)
    elapsed = time.time() - t0

    steps_per_sec = E * T / elapsed
    # Reference, no render, one CPU core (BASELINE.md): 1058 / 544 / 258
    # env-steps/s at 1 / 2 / 4 agents.
    baseline = {1: 1058.0, 2: 544.0, 4: 258.0}.get(N, 544.0 * 2 / N)
    metric = f"env_steps_per_sec_per_chip_{E}x{N}agents"
    if pixels:
        metric += "_pixels"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / baseline, 2),
            }
        )
    )
    if os.environ.get("MCR_BENCH_VERBOSE"):
        print(
            f"# E={E} T={T} elapsed={elapsed:.3f}s compile+first={compile_s:.1f}s "
            f"platform={jax.devices()[0].platform} mean_r={float(rews.mean()):.4f}"
        )


if __name__ == "__main__":
    main()
