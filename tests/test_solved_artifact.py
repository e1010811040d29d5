"""The committed solved-run artifact (docs/runs/) must stay restorable.

The CarRacing-v0 solved evidence (README "Learning", docs/PERF.md
"Learning quality") is a checkpoint committed in the two-slot pointer
layout. This guards it against checkpoint-format drift: a format change
that cannot read the artifact anymore must either migrate it or fail
here, not silently orphan the published result.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "docs", "runs", "carracing_v0_solved_ckpt")
LOG = os.path.join(REPO, "docs", "runs", "carracing_v0_solved.jsonl")


@pytest.fixture(scope="module")
def restored():
    from multi_car_racing_tpu import checkpoint, config as C
    from multi_car_racing_tpu.learner import ppo

    env_cfg = C.EnvConfig(
        num_agents=1, use_random_direction=False, backwards_flag=False
    )
    # Geometry must match the training run (README recipe); num_envs may
    # differ — checkpoint restore reshapes nothing but the env batch is
    # saved per-run, so keep a tiny batch and let restore overwrite it.
    pcfg = ppo.PPOConfig(
        rollout_len=32, num_envs=8, obs_type="state", action_repeat=4,
        normalize_obs=True, width=512,
    )
    ts = ppo.init_train_state(env_cfg, pcfg, jax.random.PRNGKey(0))
    return checkpoint.restore(CKPT, ts)


def test_checkpoint_restores_best_update(restored):
    # The committed slot is the best-eval snapshot (update 280 of the
    # documented run). A format migration that re-saves it may move the
    # counter; it must stay a real, positive update.
    assert int(restored.update_i) == 280


def test_checkpoint_params_finite(restored):
    leaves = jax.tree_util.tree_leaves(restored.params)
    assert leaves, "restored params tree is empty"
    for leaf in leaves:
        assert bool(jnp.isfinite(leaf).all())


def test_policy_drives_from_spawn(restored):
    """The restored policy must act sensibly: on a fresh env it should
    accumulate positive return over a short rollout (a scrambled restore
    would produce near-random actions and bleed -0.1/step)."""
    from functools import partial

    from multi_car_racing_tpu import config as C, env as tenv
    from multi_car_racing_tpu.learner import ppo
    from multi_car_racing_tpu.learner.networks import ActorCritic

    env_cfg = C.EnvConfig(
        num_agents=1, use_random_direction=False, backwards_flag=False,
        # Short CPU test: the reference iteration counts dominate runtime
        # and do not change what "drives forward, gains tiles" looks like.
        velocity_iters=30, position_iters=12,
    )
    pcfg = ppo.PPOConfig(
        rollout_len=32, num_envs=1, obs_type="state", action_repeat=4,
        normalize_obs=True, width=512,
    )
    net = ActorCritic(obs_type=pcfg.obs_type, width=pcfg.width)
    env_step = jax.jit(jax.vmap(partial(tenv.step, env_cfg)))
    state = jax.vmap(lambda k: tenv.device_reset(env_cfg, k))(
        jax.random.split(jax.random.PRNGKey(123), 1)
    )

    @jax.jit
    def act(params, obs_rms, es):
        obs = ppo._observe(env_cfg, pcfg, es)
        obs = ppo._rms_normalize(obs_rms, obs)
        mean, _, _ = net.apply(params, obs)
        return jnp.stack(
            [jnp.clip(mean[..., 0], -1, 1), jnp.clip(mean[..., 1], 0, 1),
             jnp.clip(mean[..., 2], 0, 1)],
            axis=-1,
        )

    total = 0.0
    for _ in range(40):  # 40 policy steps x action_repeat 4 = 160 env steps
        a = act(restored.params, restored.obs_rms, state)
        for _ in range(4):
            state, r, done = env_step(state, a)
            total += float(np.asarray(r).sum())
    assert total > 5.0, f"restored policy earned {total}, expected > 5"
    # Tiles gained is robust to the reduced solver iterations above (a
    # physics-insensitive signal of "drives forward along the track").
    tiles = int(np.asarray(state.visited.sum()))
    assert tiles >= 10, f"restored policy visited {tiles} tiles in 160 steps"


def test_log_contains_solved_eval():
    import json

    best = -1e9
    with open(LOG) as f:
        for line in f:
            row = json.loads(line)
            if "eval_return" in row:
                best = max(best, row["eval_return"])
    assert best >= 900.0, f"best eval in committed log is {best}"
