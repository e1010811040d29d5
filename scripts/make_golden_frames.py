"""Generate versioned golden-frame fixtures (VERDICT round-1 #7).

Freezes ~6 rendering scenarios as checked-in npz files under
tests/fixtures/golden/: each file stores the exact EnvState pytree leaves
(so the fixture is immune to future physics changes — only the renderer is
pinned), the env-config kwargs, the viewport, and the oracle-rendered frame.
tests/test_golden_frames.py then asserts all three rasterizers reproduce the
stored pixels byte-for-byte, so the oracle and production renderers can no
longer drift together silently (the round-1 weakness: all three rasterizers
were only ever compared to each other in-process).

    python scripts/make_golden_frames.py            # writes fixtures
"""

import json
import os
import sys
from functools import partial

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multi_car_racing_tpu import config as C, env as tenv, seeding  # noqa: E402
from multi_car_racing_tpu import obs as tobs  # noqa: E402
from multi_car_racing_tpu.render import xla_raster  # noqa: E402

OUT = os.path.join("tests", "fixtures", "golden")


def drive(cfg, seed, gseed, steps, brake_pulse=False):
    state, _ = tenv.host_reset(
        cfg, seed=seed, global_stream=seeding.GlobalStream(gseed)
    )
    step = jax.jit(partial(tenv.step, cfg))
    n = cfg.num_agents
    for t in range(steps):
        f = np.asarray(tobs.state_observation(state))
        steer = np.clip(-2.0 * f[:, 16], -1, 1)
        brake = np.full(n, 0.5 if (brake_pulse and t % 30 > 24) else 0.0)
        a = np.stack([steer, 0.35 * np.ones(n), brake], -1)
        state, _, _ = step(state, jnp.asarray(a, jnp.float32))
    return state


def save(name, cfg_kwargs, state, vp=None):
    cfg = C.EnvConfig(**cfg_kwargs)
    if vp is None:
        render = partial(xla_raster.render_observation, cfg)
    else:
        # The oracle renders the 96x96 observation contract only; the
        # rgb_array viewport fixture pins the painter (render/raster.py).
        from multi_car_racing_tpu.render import raster

        render = partial(
            raster.render_observation, cfg, vp_w=vp[0], vp_h=vp[1],
            draw_particles=True,
        )
    frame = np.asarray(jax.jit(render)(state))
    leaves = jax.tree_util.tree_leaves(state)
    np.savez_compressed(
        os.path.join(OUT, name + ".npz"),
        frame=frame,
        meta=json.dumps(dict(cfg=cfg_kwargs, vp=vp, n_leaves=len(leaves))),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    print(f"{name}: frame {frame.shape}, {len(leaves)} leaves")


def main():
    os.makedirs(OUT, exist_ok=True)

    # 1. warmup (first-second zoom-out, t=0.2 s) — 2 agents.
    kw = dict(num_agents=2)
    save("warmup_2agent", kw, drive(C.EnvConfig(**kw), 11, 5, 10))

    # 2. steady state after 150 driven steps — 2 agents.
    save("steady_2agent", kw, drive(C.EnvConfig(**kw), 11, 5, 150))

    # 3. 4-agent ego-color mode.
    kw4 = dict(num_agents=4, use_ego_color=True)
    save("egocolor_4agent", kw4, drive(C.EnvConfig(**kw4), 11, 5, 120))

    # 4. backwards flag raised (flag geometry in the HUD, mcr:668-674).
    kwb = dict(num_agents=2, backwards_flag=True)
    st = drive(C.EnvConfig(**kwb), 11, 5, 150)
    st = st.replace(driving_backward=jnp.ones_like(st.driving_backward))
    save("backwards_flag", kwb, st)

    # 5. rgb_array 600x400 viewport with skid trails (brake pulses).
    kws = dict(num_agents=2, track_skid=True)
    save(
        "rgb_array_skid", kws,
        drive(C.EnvConfig(**kws), 11, 5, 150, brake_pulse=True),
        vp=(C.VIDEO_W, C.VIDEO_H),
    )

    # 6. CW episode (direction-dependent camera/flag logic).
    kwc = dict(num_agents=1, direction="CW", use_random_direction=False)
    save("cw_1agent", kwc, drive(C.EnvConfig(**kwc), 3, 9, 150))


if __name__ == "__main__":
    main()
