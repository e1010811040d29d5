"""Demo: drive the env and record frames (reference mcr:677-738 equivalent).

The reference's demo is a pyglet keyboard loop; this environment targets
headless TPU hosts, so the demo drives a built-in heuristic track follower
(or random actions) and writes a GIF + prints per-car returns every 200 steps
exactly like the reference loop.

    python -m multi_car_racing_tpu.demo --steps 400 --out /tmp/mcr.gif
    python -m multi_car_racing_tpu.demo --policy random
    python -m multi_car_racing_tpu.demo --interactive   # keyboard play (tui.py)

``--interactive`` needs only a TTY: the per-agent view renders as ANSI
truecolor half-blocks and arrows/WASD drive the cars with the reference's
bindings (tui.py).
"""

from __future__ import annotations

import argparse

import numpy as np


def heuristic_actions(env, prev=None):
    """Simple track follower on the state features (obs.state_observation)."""
    import jax.numpy as jnp

    from . import obs as tobs

    f = np.asarray(tobs.state_observation(env.state))
    err_sin = f[:, 16]
    steer = np.clip(-2.0 * err_sin, -1, 1)
    gas = np.full(env.num_agents, 0.3)
    brake = np.zeros(env.num_agents)
    return np.stack([steer, gas, brake], axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-cars", type=int, default=2)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--policy", choices=["follow", "random"], default="follow")
    ap.add_argument("--out", default="/tmp/multi_car_racing.gif")
    ap.add_argument("--view", type=int, default=0, help="agent view to record")
    ap.add_argument("--every", type=int, default=2, help="record every k frames")
    ap.add_argument("--interactive", action="store_true",
                    help="keyboard play in the terminal (ANSI rendering; "
                         "arrows car 0, WASD car 1 — see tui.py)")
    ap.add_argument("--monitor", default=None, metavar="DIR",
                    help="record per-episode mp4 + stats.json to DIR "
                         "(gym Monitor equivalent, mcr:714-717)")
    ap.add_argument("--window", action="store_true",
                    help="also flip frames to a live window each step "
                         "(needs a display; render('human'))")
    args = ap.parse_args()

    if args.interactive:
        from . import tui

        total = tui.play(num_agents=args.num_cars, seed=args.seed,
                         view=args.view, every=args.every)
        print("final returns:", total)
        return

    from . import gym_api

    env = gym_api.make("MultiCarRacing-v0", num_agents=args.num_cars, verbose=1)
    if args.monitor:
        from . import monitor

        env = monitor.Monitor(env, args.monitor, force=True)
    env.seed(args.seed)
    rng = np.random.RandomState(args.seed)

    env.reset()
    total_reward = np.zeros(args.num_cars)
    frames = []
    for step in range(args.steps):
        if args.policy == "follow":
            a = heuristic_actions(env)
        else:
            a = rng.uniform([-1, 0, 0], [1, 1, 0.2], size=(args.num_cars, 3))
        obs, r, done, info = env.step(a)
        total_reward += r
        if args.window:
            # Reference demo loop gates on render().all() (mcr:735).
            if not np.asarray(env.render("human")).all():
                break
        if step % args.every == 0:
            frames.append(obs[args.view])
        if step % 200 == 0 or done:
            print(f"Step {step} Total_reward {total_reward}")
        if done:
            break

    try:
        from PIL import Image

        imgs = [Image.fromarray(f).resize((192, 192), Image.NEAREST) for f in frames]
        imgs[0].save(
            args.out, save_all=True, append_images=imgs[1:], duration=40, loop=0
        )
        print(f"wrote {args.out} ({len(imgs)} frames)")
    except ImportError:
        out = args.out.replace(".gif", "_last.png")
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(out, frames[-1])
        print(f"PIL unavailable; wrote last frame to {out}")
    env.close()


if __name__ == "__main__":
    main()
