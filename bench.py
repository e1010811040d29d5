"""Benchmark: env-steps/s/chip at 4096 parallel 2-agent envs (BASELINE.json
north-star config 4). Prints ONE JSON line.

Baseline: the reference measures ~544 env-steps/s for the same 2-agent
no-render config on one CPU core (BASELINE.md). ``vs_baseline`` is our
throughput divided by that.

Run on the ambient JAX platform (TPU under axon; CPU if forced). Physics-only
stepping (obs_type='none'): identical work to the reference's no-render row.
Set MCR_BENCH_PIXELS=1 to include the 96x96x3 observation rasterizer once the
pixel path lands.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multi_car_racing_tpu import config as C, env as tenv, seeding

    E = int(os.environ.get("MCR_BENCH_ENVS", 4096))
    T = int(os.environ.get("MCR_BENCH_STEPS", 100))
    N_TRACKS = int(os.environ.get("MCR_BENCH_TRACKS", 16))
    cfg = C.EnvConfig(num_agents=2)

    # Host-generate a small set of distinct tracks and tile the batch from
    # them (physics cost is track-independent; this keeps bench startup
    # seconds, not minutes).
    states = []
    for seed in range(N_TRACKS):
        s, _ = tenv.host_reset(cfg, seed=seed, global_stream=seeding.GlobalStream(seed))
        states.append(s)
    batched = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *states
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
                        rng.uniform([-1, 0, 0], [1, 1, 0.2], size=(2, 3))
                        for _ in range(E)
                    ]
                )
                for _ in range(8)
            ]
        ),
        jnp.float32,
    )  # (8, E, 2, 3) — cycled

    # Production stepping mode: one dispatch per env step with the state
    # buffers DONATED — exactly how a serving/rollout loop drives the env
    # (policy inference between steps). Donation lets XLA update the state
    # in place; without it (and inside lax.scan bodies, whatever the carry
    # slimming) the same program runs ~30x slower on TPU — measured 0.44 vs
    # 15.4 ms/step at 4096x2 (see docs/COVERAGE.md perf notes).
    @partial(jax.jit, donate_argnums=0)
    def step_once(state, a):
        state, r, d = step(state, a)
        return state, r.mean()

    # Warmup/compile (donates `batched`).
    t0 = time.time()
    state, r = step_once(batched, actions[0])
    jax.block_until_ready(r)
    compile_s = time.time() - t0

    t0 = time.time()
    rews = []
    for t in range(T):
        state, r = step_once(state, actions[t % 8])
        rews.append(r)
    rews = jnp.stack(rews)
    jax.block_until_ready(rews)
    elapsed = time.time() - t0

    steps_per_sec = E * T / elapsed
    baseline = 544.0  # reference, 2 agents, no render (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_4096x2agents",
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
