"""Policy evaluation against the reference's published quality bar.

The reference's only quality number is the Gym registration
``reward_threshold=900`` (/root/reference/gym_multi_car_racing/__init__.py:9):
an agent "solves" the env when its mean episode return reaches 900, i.e. it
visits every track tile within the 1000-step TimeLimit. This module measures
that number honestly: fresh on-device tracks per episode, the deterministic
policy (Gaussian mean), returns accumulated as the sum of the env's actual
``step_reward`` (including the -100 off-playfield overwrite, mcr:501-507),
frozen at the step the episode finishes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as Cfg
from .. import env as tenv
from .networks import ActorCritic
from .ppo import (PPOConfig, _observe, _push_frames, _rms_normalize,
                  _stack_obs, init_frames, squash_env_action)


def make_eval_fn(env_cfg: Cfg.EnvConfig, ppo_cfg: PPOConfig, num_episodes: int,
                 stochastic: bool = False):
    """Returns eval(params, obs_rms, key) -> dict of (E,...) device arrays.

    One batched rollout of ``num_episodes`` independent fresh-track episodes,
    stepped to the 1000-step TimeLimit (done envs are frozen out of the
    accumulators). Deterministic actions (policy mean) by default;
    ``stochastic=True`` samples from the trained Gaussian instead — the
    policy as it actually acts. The two can differ materially: a clipped
    Gaussian can park an action MEAN at/outside a clip boundary and rely on
    the noise for the effective control (observed on the pixel policy,
    docs/PERF.md "Learning from pixels"), so report which one a number is.
    """
    net = ActorCritic(obs_type=ppo_cfg.obs_type, width=ppo_cfg.width)
    env_step = jax.vmap(partial(tenv.step, env_cfg))
    E, N = num_episodes, env_cfg.num_agents
    R = ppo_cfg.action_repeat
    max_steps = env_cfg.max_episode_steps
    n_policy_steps = -(-max_steps // R)
    use_rms = ppo_cfg.normalize_obs and ppo_cfg.obs_type == "state"

    def eval_fn(params, obs_rms, key):
        key, k_env = jax.random.split(key)
        env_state = jax.vmap(lambda k: tenv.device_reset(env_cfg, k))(
            jax.random.split(k_env, E)
        )

        def policy_step(carry, _):
            es, frames, ret, fin, tiles, length, k = carry
            obs_now = _observe(env_cfg, ppo_cfg, es)
            obs = _stack_obs(frames, obs_now)
            frames = _push_frames(frames, obs_now)
            if use_rms:
                obs = _rms_normalize(obs_rms, obs)
            mean, log_std, _ = net.apply(params, obs)
            if stochastic:
                k, k_act = jax.random.split(k)
                mean = mean + jnp.exp(log_std) * jax.random.normal(
                    k_act, mean.shape
                )
            if ppo_cfg.squash_actions:
                a_env = squash_env_action(mean)
            else:
                a_env = jnp.stack(
                    [jnp.clip(mean[..., 0], -1, 1),
                     jnp.clip(mean[..., 1], 0, 1),
                     jnp.clip(mean[..., 2], 0, 1)],
                    axis=-1,
                )

            def rep_body(carry, _):
                es, ret, fin, tiles, length = carry
                live = ~fin
                es, r, done = env_step(es, a_env)
                ret = ret + r * live.astype(r.dtype)[:, None]
                tiles = jnp.where(fin[:, None], tiles, es.tile_visited_count)
                length = length + live.astype(jnp.int32)
                fin = fin | done | (es.steps >= max_steps)
                return (es, ret, fin, tiles, length), None

            (es, ret, fin, tiles, length), _ = jax.lax.scan(
                rep_body, (es, ret, fin, tiles, length), None, length=R
            )
            return (es, frames, ret, fin, tiles, length, k), None

        init = (
            env_state,
            init_frames(ppo_cfg, _observe(env_cfg, ppo_cfg, env_state)),
            jnp.zeros((E, N), jnp.float32),
            jnp.zeros((E,), bool),
            env_state.tile_visited_count,
            jnp.zeros((E,), jnp.int32),
            key,
        )
        (es, _, ret, fin, tiles, length, _), _ = jax.lax.scan(
            policy_step, init, None, length=n_policy_steps
        )
        return dict(
            returns=ret,                 # (E, N) summed step rewards
            tiles=tiles,                 # (E, N) tiles visited at finish
            n_tiles=es.track.n_tiles,    # (E,) track sizes
            length=length,               # (E,) episode length in env steps
        )

    return jax.jit(eval_fn)


def summarize(out) -> dict:
    """Host-side summary of an eval_fn result (scalars, json-friendly)."""
    ret = np.asarray(out["returns"])         # (E, N)
    tiles = np.asarray(out["tiles"], np.float64)
    ntile = np.asarray(out["n_tiles"], np.float64)[:, None]
    per_ep = ret.mean(-1)                    # mean over agents
    return dict(
        eval_return=float(per_ep.mean()),
        eval_return_std=float(per_ep.std()),
        eval_return_min=float(per_ep.min()),
        eval_return_max=float(per_ep.max()),
        eval_best_agent_return=float(ret.max(-1).mean()),
        eval_tiles_frac=float((tiles / ntile).mean()),
        eval_len=float(np.asarray(out["length"]).mean()),
        eval_episodes=int(ret.shape[0]),
    )


def main():
    """Standalone: evaluate a training checkpoint.

        python -m multi_car_racing_tpu.learner.evaluate \
            --checkpoint /tmp/ckpt --episodes 20 [--carracing-v0]
    """
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--episodes", type=int, default=20)
    ap.add_argument("--num-agents", type=int, default=2)
    ap.add_argument("--obs", choices=["state", "pixels"], default="state")
    ap.add_argument("--action-repeat", type=int, default=1)
    ap.add_argument("--width", type=int, default=256,
                    help="state-torso width (must match the checkpoint)")
    ap.add_argument("--normalize-obs", action="store_true")
    ap.add_argument("--carracing-v0", action="store_true",
                    help="1 agent, fixed CCW direction, no backwards flag")
    ap.add_argument("--stochastic", action="store_true",
                    help="sample actions from the trained Gaussian (the "
                         "policy as it acts) instead of the mean")
    ap.add_argument("--squash-actions", action="store_true",
                    help="checkpoint was trained with the tanh-squashed "
                         "action head")
    ap.add_argument("--frame-stack", type=int, default=1,
                    help="pixel frame stacking K (must match the checkpoint)")
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    from .. import checkpoint
    from . import ppo

    if args.carracing_v0:
        env_cfg = Cfg.EnvConfig(
            num_agents=1, use_random_direction=False, backwards_flag=False
        )
    else:
        env_cfg = Cfg.EnvConfig(num_agents=args.num_agents)
    ppo_cfg = PPOConfig(
        num_envs=args.episodes, obs_type=args.obs,
        action_repeat=args.action_repeat, normalize_obs=args.normalize_obs,
        width=args.width, squash_actions=args.squash_actions,
        frame_stack=args.frame_stack,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    ts = checkpoint.restore(args.checkpoint, ts)
    eval_fn = make_eval_fn(env_cfg, ppo_cfg, args.episodes,
                           stochastic=args.stochastic)
    out = eval_fn(ts.params, ts.obs_rms, jax.random.PRNGKey(args.seed))
    print(json.dumps(summarize(out)))


if __name__ == "__main__":
    main()
