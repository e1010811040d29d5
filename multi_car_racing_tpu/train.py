"""PPO training driver (BASELINE.json config 5).

    python -m multi_car_racing_tpu.train --updates 50 --num-envs 256
    python -m multi_car_racing_tpu.train --obs state --log /tmp/ppo.jsonl

Multi-host pod slices: launch one process per host with the standard JAX
coordinator env (or pass --distributed to call jax.distributed.initialize);
the mesh spans all devices, env batches shard per host, gradients all-reduce
over ICI/DCN via GSPMD (parallel/mesh.py).
"""

from __future__ import annotations

import argparse
import os
import time


def main():
    # jax is already imported by the time main() runs (package __init__ ->
    # gym_api), so the JAX_COMPILATION_CACHE_DIR env var would be a no-op
    # here; the post-import config.update path works regardless.
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=20)
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--rollout", type=int, default=64)
    ap.add_argument("--pool-size", type=int, default=32,
                    help="autoreset track-pool size")
    ap.add_argument("--num-agents", type=int, default=2)
    ap.add_argument("--carracing-v0", action="store_true",
                    help="reference CarRacing-v0 preset: 1 agent, fixed CCW "
                         "direction, no backwards flag (README.md:66-71)")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="run a deterministic fresh-track eval every N updates")
    ap.add_argument("--eval-episodes", type=int, default=20)
    ap.add_argument("--obs", choices=["state", "pixels"], default="state")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--gamma", type=float, default=0.99)
    ap.add_argument("--ent-coef", type=float, default=0.0)
    ap.add_argument("--action-repeat", type=int, default=1,
                    help="hold each policy action this many env steps")
    ap.add_argument("--normalize-obs", action="store_true",
                    help="running mean/var normalization of state obs")
    ap.add_argument("--width", type=int, default=256,
                    help="state-torso MLP width")
    ap.add_argument("--train-step-cost", type=float, default=0.0,
                    help="extra per-step time cost added ONLY to the "
                         "learner's reward signal (pace shaping; eval uses "
                         "the real env return)")
    ap.add_argument("--train-grass-cost", type=float, default=0.0,
                    help="training-only per-step cost while on grass "
                         "(anti-corner-cutting; eval uses the real return)")
    ap.add_argument("--train-skip-cost", type=float, default=0.0,
                    help="training-only potential-based penalty per skipped "
                         "tile (passed without visiting; eval uses the real "
                         "return)")
    ap.add_argument("--anneal-lr", action="store_true",
                    help="linear lr decay to 0 over --updates")
    ap.add_argument("--kl-target", type=float, default=0.0,
                    help="approx-KL early stop for the minibatch loop "
                         "(0 disables)")
    ap.add_argument("--squash-actions", action="store_true",
                    help="tanh-squashed action head (exact log-det) "
                         "instead of clipping the raw Gaussian")
    ap.add_argument("--frame-stack", type=int, default=1,
                    help="stack the last K pixel frames channel-wise "
                         "(velocity in the observation; pixels only)")
    ap.add_argument("--step-cost-start", type=int, default=0,
                    help="update at which --train-step-cost starts ramping "
                         "in (pace curriculum; 0 = active from scratch)")
    ap.add_argument("--step-cost-ramp", type=int, default=1,
                    help="updates over which the step cost ramps to full")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log", default=None, help="JSONL metrics path")
    ap.add_argument("--checkpoint", default=None, help="save path (every --ckpt-every)")
    ap.add_argument("--ckpt-every", type=int, default=10)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--best-so-far", type=float, default=None,
                    help="floor for the best-eval checkpoint: on --resume, "
                         "<checkpoint>_best is only overwritten once an eval "
                         "beats this (otherwise a resumed run's first eval "
                         "clobbers a better earlier snapshot)")
    ap.add_argument("--profile", default=None, help="jax.profiler trace dir")
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() (multi-host)")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator host:port (else auto-detect from env)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--fast-solver", action="store_true",
                    help="velocity/position iterations 30/12 instead of 180/60")
    args = ap.parse_args()

    import jax

    if args.distributed:
        if args.coordinator is not None:
            if args.num_processes is None or args.process_id is None:
                ap.error("--coordinator requires --num-processes and "
                         "--process-id (they cannot be auto-detected from "
                         "an address alone)")
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            jax.distributed.initialize()

    from . import checkpoint, config as C, metrics
    from .learner import ppo
    from .parallel import mesh as pmesh

    if args.action_repeat < 1:
        ap.error("--action-repeat must be >= 1")
    if args.normalize_obs and args.obs == "pixels":
        ap.error("--normalize-obs only applies to --obs state "
                 "(pixel frames are uint8-scaled inside the network)")

    env_kw = {}
    if args.fast_solver:
        env_kw = dict(velocity_iters=30, position_iters=12)
    if args.carracing_v0:
        args.num_agents = 1
        env_kw.update(use_random_direction=False, backwards_flag=False)
    env_cfg = C.EnvConfig(num_agents=args.num_agents, **env_kw)
    ppo_cfg = ppo.PPOConfig(
        rollout_len=args.rollout, num_envs=args.num_envs, lr=args.lr,
        obs_type=args.obs, pool_size=args.pool_size,
        gamma=args.gamma, ent_coef=args.ent_coef,
        action_repeat=args.action_repeat, normalize_obs=args.normalize_obs,
        anneal_lr=args.anneal_lr, total_updates=args.updates,
        kl_target=args.kl_target,
        squash_actions=args.squash_actions,
        frame_stack=args.frame_stack,
        width=args.width, train_step_cost=args.train_step_cost,
        train_grass_cost=args.train_grass_cost,
        train_skip_cost=args.train_skip_cost,
        train_step_cost_start=args.step_cost_start,
        train_step_cost_ramp=args.step_cost_ramp,
    )

    mesh = pmesh.make_mesh()
    print(f"devices: {jax.device_count()} ({jax.devices()[0].platform}), "
          f"mesh axes: {mesh.shape}")
    with jax.set_mesh(mesh):
        ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(args.seed))
        if args.resume:
            ts = checkpoint.restore(args.resume, ts)
            print(f"resumed from {args.resume} at update {int(ts.update_i)}")
        ts = pmesh.shard_train_state(ts, mesh)
        train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg), donate_argnums=0)
        eval_fn = None
        if args.eval_every:
            from .learner import evaluate as ev

            eval_fn = ev.make_eval_fn(env_cfg, ppo_cfg, args.eval_episodes)
            eval_key = jax.random.PRNGKey(args.seed + 1_000_003)
            best_eval = (-float("inf") if args.best_so_far is None
                         else args.best_so_far)

        logger = metrics.JsonlLogger(args.log)
        steps_per_update = (args.rollout * args.action_repeat
                            * args.num_envs * args.num_agents)
        with metrics.profile_trace(args.profile):
            for i in range(args.updates):
                t0 = time.time()
                ts, m = train_step(ts)
                m = {k: float(v) for k, v in m.items()}
                env_m = {k: float(v) for k, v in metrics.env_metrics(ts.env_state).items()}
                row = logger.log(
                    int(ts.update_i) * steps_per_update, {**m, **env_m},
                    update=int(ts.update_i), update_s=round(time.time() - t0, 3),
                )
                print(
                    f"update {row['update']:4d} "
                    f"loss {m['loss']:+.4f} v {m['v_loss']:.4f} "
                    f"r/step {m['mean_step_reward']:+.3f} "
                    f"ret {m['ep_return']:+.1f} (max {m['ep_return_max']:+.1f}, "
                    f"n={m['episodes_finished']:.0f}) "
                    f"tiles {env_m['mean_tiles_visited']:.1f} "
                    f"{row.get('env_steps_per_sec', 0):,.0f} steps/s"
                )
                if args.checkpoint and (i + 1) % args.ckpt_every == 0:
                    checkpoint.save(args.checkpoint, ts)
                    print(f"checkpointed -> {args.checkpoint}")
                if eval_fn is not None and (i + 1) % args.eval_every == 0:
                    eval_key, k = jax.random.split(eval_key)
                    summary = ev.summarize(eval_fn(ts.params, ts.obs_rms, k))
                    logger.log(
                        int(ts.update_i) * steps_per_update, summary,
                        update=int(ts.update_i),
                    )
                    print(
                        f"  eval: return {summary['eval_return']:+.1f} "
                        f"± {summary['eval_return_std']:.1f} "
                        f"(min {summary['eval_return_min']:+.1f}, "
                        f"max {summary['eval_return_max']:+.1f}) "
                        f"tiles {100 * summary['eval_tiles_frac']:.1f}% "
                        f"len {summary['eval_len']:.0f} "
                        f"over {summary['eval_episodes']} episodes"
                    )
                    if args.checkpoint and summary["eval_return"] > best_eval:
                        best_eval = summary["eval_return"]
                        checkpoint.save(args.checkpoint + "_best", ts)
                        print(f"  new best ({best_eval:+.1f}) -> "
                              f"{args.checkpoint}_best")

    if args.checkpoint:
        checkpoint.save(args.checkpoint, ts)
        print(f"final checkpoint -> {args.checkpoint}")


if __name__ == "__main__":
    main()
