"""PPO learner over batched envs (BASELINE.json config 5).

The whole training step — T-step rollout (lax.scan over the env), pool-based
autoreset, GAE, and K epochs of minibatched clipped-surrogate updates — is one
jitted function over a ``TrainState`` pytree. Multi-chip data parallelism is
pure GSPMD: shard the env batch over the mesh's 'data' axis and replicate
params (parallel/mesh.py); XLA inserts the gradient all-reduce in backward.
No reference counterpart (the reference ships no learner); the env-facing
contract it exercises is exactly the public step/reset API.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as Cfg
from .. import env as tenv
from .. import obs as tobs
from ..struct import pytree_dataclass
from .networks import ActorCritic


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    rollout_len: int = 64
    num_envs: int = 256
    pool_size: int = 32
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    epochs: int = 4
    minibatches: int = 8
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    obs_type: str = "state"       # 'state' | 'pixels'
    # Quality levers (COVERAGE.md gap 6). action_repeat holds each policy
    # action for R env steps (rewards summed, classic CarRacing frame-skip) —
    # credit assignment over the 50 Hz physics is hopeless without it.
    action_repeat: int = 1
    normalize_obs: bool = False   # running mean/var over state features
    anneal_lr: bool = False       # linear lr -> 0 over total_updates
    total_updates: int = 1000
    width: int = 256              # state-torso width
    # Training-only extra per-step time cost (pace shaping): the env's own
    # -0.1/step is what the published 900 bar scores against (mcr:436);
    # adding cost ONLY to the learner's reward signal pushes PPO toward
    # faster laps while evaluation (learner/evaluate.py) stays on the real
    # env return.
    train_step_cost: float = 0.0
    # Training-only on-grass cost: the dominant failure mode at the 900 bar
    # is corner-cutting — the car clips a chicane over grass, skips a few
    # tiles, and can never complete the tile set (all-tiles done,
    # mcr:498-499). The env's driving_on_grass flag (mcr:469-472, unused
    # for reward by the reference) priced into the learner's signal keeps
    # the racing line on asphalt; evaluation stays on the real env return.
    train_grass_cost: float = 0.0
    # KL early stopping (0 disables): once the mean approximate KL between
    # the rollout policy and the updated policy exceeds this target, the
    # REMAINING minibatch updates of the train step are skipped (the scan
    # can't break, so they become no-ops). The round-4 pixel run collapsed
    # exactly this way: dlogp_max ~25 / grad norms ~3000 through the shared
    # CNN torso wrecked a policy that was at +686 mean return. Standard
    # spinning-up-style trust-region proxy.
    kl_target: float = 0.0
    # Squashed (tanh) action head: sample u ~ N(mean, std) and map
    # a = [tanh(u0), (tanh(u1)+1)/2, (tanh(u2)+1)/2] with the exact
    # log-det correction, instead of clipping the raw Gaussian into the
    # action box. Fixes the clip pathology where the MEAN drifts to/past a
    # boundary and the policy's deterministic behavior decouples from its
    # sampled behavior (observed on the pixel policy: deterministic eval
    # degraded under any further training while sampled returns held —
    # docs/PERF.md "Learning from pixels").
    squash_actions: bool = False
    # Training-only potential-based shaping on SKIPPED tiles (the direct
    # price of chicane-cutting): potential phi(s) = -c * skipped(s), where
    # skipped = unvisited valid tiles minus the largest circular unvisited
    # run (the not-yet-reached arc). Added as gamma*phi(s') - phi(s), so it
    # is policy-invariant in the limit (Ng et al. 1999) and pays -c the
    # moment a tile is passed without being visited, +c when a missed tile
    # is recovered. Evaluation stays on the real env return.
    train_skip_cost: float = 0.0
    # Pace curriculum: with train_step_cost_start > 0 the extra step cost
    # ramps in linearly from update `start` over `ramp` updates instead of
    # applying from scratch (the round-4 diagnosis: the pixel policy's gap
    # to the 900 bar is lap PACE; pricing time only after basic driving is
    # learned pushes lap speed without destabilizing early training).
    train_step_cost_start: int = 0
    train_step_cost_ramp: int = 1
    # Frame stacking (pixels only): the policy sees the last K policy-step
    # frames channel-stacked (96, 96, 3K). K=1 reproduces the single-frame
    # observation. The reference's observation is one frame (mcr:431) — a
    # single pixel policy must infer speed from the HUD bar; stacking puts
    # velocity directly in the observation (round-4 diagnosis: lap pace,
    # docs/PERF.md "Analysis of the 10-point gap"). Buffers are zero-filled
    # at episode start (training and eval identically).
    frame_stack: int = 1


@pytree_dataclass
class TrainState:
    params: Any
    opt_state: Any
    env_state: Any                # batched EnvState (E, ...)
    pool: Any                     # stacked Track (P, ...)
    key: jnp.ndarray
    update_i: jnp.ndarray         # () int32
    obs_rms: Any = None           # dict(mean, var, count) | None
    frames: Any = None            # (E, N, 96, 96, 3*(K-1)) uint8 | None


def _rms_init(dim):
    return dict(
        mean=jnp.zeros((dim,), jnp.float32),
        var=jnp.ones((dim,), jnp.float32),
        count=jnp.asarray(1e-4, jnp.float32),
    )


def _rms_normalize(rms, obs):
    return jnp.clip(
        (obs - rms["mean"]) / jnp.sqrt(rms["var"] + 1e-8), -10.0, 10.0
    )


def _rms_update(rms, batch, mask=None):
    """Chan et al. parallel-variance merge of a new batch (..., D).

    ``mask`` (batch.shape[:-1]) excludes samples from the statistics —
    post-termination observations (an off-field car drifting until the
    autoreset) would otherwise drag the running mean/var arbitrarily far."""
    x = batch.reshape(-1, batch.shape[-1]).astype(jnp.float32)
    if mask is not None:
        mw = mask.reshape(-1).astype(jnp.float32)[:, None]
        # Masked rows can be NaN (quarantined envs): x * 0 would still be
        # NaN in the sums — zero the rows, not just the weights.
        x = jnp.where(mw > 0, x, 0.0)
        bc = jnp.maximum(mw.sum(), 1.0)
        bm = (x * mw).sum(0) / bc
        bv = (jnp.square(x - bm) * mw).sum(0) / bc
    else:
        bc = jnp.asarray(x.shape[0], jnp.float32)
        bm, bv = x.mean(0), x.var(0)
    delta = bm - rms["mean"]
    tot = rms["count"] + bc
    new_mean = rms["mean"] + delta * bc / tot
    m2 = rms["var"] * rms["count"] + bv * bc + jnp.square(delta) * rms["count"] * bc / tot
    merged = dict(mean=new_mean, var=m2 / tot, count=tot)
    if mask is not None:
        # An all-masked batch must be a no-op, not a phantom zero-sample
        # merged at the bc=1 clamp.
        keep = mw.sum() > 0
        merged = jax.tree_util.tree_map(
            lambda a, b: jnp.where(keep, a, b), merged, rms
        )
    return merged


def _skipped_tiles(env_state):
    """Per-car count of *skipped* tiles: unvisited valid tiles that are not
    part of the largest circular unvisited run. The visited set of a car
    driving the lap is a contiguous arc, so every unvisited tile outside the
    single biggest gap (the not-yet-reached arc) was passed and missed — the
    exact event that makes the all-tiles done condition (mcr:498-499)
    unreachable. Direction-independent. Returns (E, N) float32."""
    u = env_state.visited  # (E, N, MT) bool
    u = (~u) & env_state.track.valid[:, None, :]
    mt = u.shape[-1]
    idx = jnp.arange(mt, dtype=jnp.int32)
    # Linear run length ending at i: i - (last index j <= i with u_j False).
    last_false = jax.lax.cummax(jnp.where(u, -1, idx), axis=u.ndim - 1)
    run = jnp.where(u, idx - last_false, 0)                       # (E, N, MT)
    longest_lin = run.max(-1)
    # Circular wrap: run starting at tile 0 + run ending at tile n-1
    # (padding past n is u=False, so take the run value at n-1 directly).
    head = jnp.cumprod(u.astype(jnp.int32), axis=-1).sum(-1)
    n1 = jnp.maximum(env_state.track.n_tiles.astype(jnp.int32) - 1, 0)
    tail = jnp.take_along_axis(run, n1[:, None, None], axis=-1)[..., 0]
    total = u.sum(-1)
    longest = jnp.minimum(jnp.maximum(longest_lin, head + tail), total)
    return (total - longest).astype(jnp.float32)


def _observe(env_cfg, ppo_cfg, env_state):
    if ppo_cfg.obs_type == "state":
        return jax.vmap(tobs.state_observation)(env_state)       # (E, N, D)
    return tobs.pixel_observation_batched(env_cfg, env_state)


def _uses_stack(ppo_cfg):
    return ppo_cfg.obs_type == "pixels" and ppo_cfg.frame_stack > 1


def _stack_obs(frames, cur):
    """Stacked observation: previous K-1 frames (oldest first) + current."""
    if frames is None:
        return cur
    return jnp.concatenate([frames, cur], axis=-1)


def _push_frames(frames, cur):
    """Shift the stacking buffer: drop the oldest frame, append ``cur``."""
    if frames is None:
        return None
    c = cur.shape[-1]
    return jnp.concatenate([frames, cur], axis=-1)[..., c:]


def init_frames(ppo_cfg: PPOConfig, dummy_obs):
    """Zero-filled stacking buffer matching ``dummy_obs`` (E, N, H, W, 3)."""
    if not _uses_stack(ppo_cfg):
        return None
    k1 = ppo_cfg.frame_stack - 1
    shape = dummy_obs.shape[:-1] + (dummy_obs.shape[-1] * k1,)
    return jnp.zeros(shape, dummy_obs.dtype)


def init_train_state(env_cfg: Cfg.EnvConfig, ppo_cfg: PPOConfig, key) -> TrainState:
    net = ActorCritic(obs_type=ppo_cfg.obs_type, width=ppo_cfg.width)
    k_pool, k_env, k_par, key = jax.random.split(key, 4)
    pool = tenv.make_track_pool_checked(env_cfg, k_pool, ppo_cfg.pool_size)
    env_keys = jax.random.split(k_env, ppo_cfg.num_envs)
    env_state = jax.vmap(lambda k: tenv.device_reset(env_cfg, k))(env_keys)
    dummy_obs = _observe(env_cfg, ppo_cfg, env_state)
    frames = init_frames(ppo_cfg, dummy_obs)
    params = net.init(k_par, _stack_obs(frames, dummy_obs))
    tx = optimizer(ppo_cfg)
    use_rms = ppo_cfg.normalize_obs and ppo_cfg.obs_type == "state"
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        env_state=env_state,
        pool=pool,
        key=key,
        update_i=jnp.asarray(0, jnp.int32),
        obs_rms=_rms_init(dummy_obs.shape[-1]) if use_rms else None,
        frames=frames,
    )


def optimizer(ppo_cfg: PPOConfig):
    if ppo_cfg.anneal_lr:
        lr = optax.linear_schedule(
            ppo_cfg.lr, 0.0,
            ppo_cfg.total_updates * ppo_cfg.epochs * ppo_cfg.minibatches,
        )
    else:
        # A constant *schedule* (not a float) keeps the opt_state tree
        # structure identical to the anneal case (ScaleByScheduleState), so
        # checkpoints restore across fine-tune phases that switch anneal
        # on/off or change the lr (a float lr lowers to stateless
        # optax.scale, which breaks orbax structural restore).
        lr = optax.constant_schedule(ppo_cfg.lr)
    return optax.chain(
        optax.clip_by_global_norm(ppo_cfg.max_grad_norm),
        optax.adam(lr),
    )


def _logp_gauss(mean, log_std, a):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * jnp.square(a - mean) / var - log_std - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )


def squash_env_action(u):
    """Pre-squash sample u -> env action box (steer [-1,1], gas/brake
    [0,1]) via tanh + affine."""
    t = jnp.tanh(u)
    return jnp.stack(
        [t[..., 0], 0.5 * (t[..., 1] + 1.0), 0.5 * (t[..., 2] + 1.0)],
        axis=-1,
    )


def _logp_squashed(mean, log_std, u):
    """log pi(a) for a = affine(tanh(u)), u the stored pre-squash sample.

    log(1 - tanh(u)^2) computed stably as 2*(log 2 - u - softplus(-2u));
    the affine 1/2 scales on gas/brake add a constant log-det that cancels
    in PPO ratios and is omitted."""
    corr = jnp.sum(
        2.0 * (jnp.log(2.0) - u - jax.nn.softplus(-2.0 * u)), axis=-1
    )
    return _logp_gauss(mean, log_std, u) - corr


def make_train_step(env_cfg: Cfg.EnvConfig, ppo_cfg: PPOConfig):
    """Returns train_step(ts) -> (ts, metrics); jit (and shard) at call site."""
    assert ppo_cfg.action_repeat >= 1, "action_repeat must be >= 1"
    net = ActorCritic(obs_type=ppo_cfg.obs_type, width=ppo_cfg.width)
    tx = optimizer(ppo_cfg)
    env_step_raw = jax.vmap(partial(tenv.step, env_cfg))
    T, E, N = ppo_cfg.rollout_len, ppo_cfg.num_envs, env_cfg.num_agents

    def env_step(es, a):
        """Physics fault containment: an env whose solver state goes
        nonfinite is quarantined — marked done (so the alive mask excludes
        it from losses/RMS and the end-of-update autoreset replaces it)
        with its trip-step reward zeroed — instead of poisoning GAE for the
        whole batch (0 * NaN in the masked sums). Counted in the nan_envs
        metric so residual solver blowups stay VISIBLE in every log."""
        es, r, done = env_step_raw(es, a)
        bad = ~(
            jnp.isfinite(es.cars.hull_c).all(axis=(1, 2))
            & jnp.isfinite(es.cars.hull_v).all(axis=(1, 2))
        )
        es = es.replace(done=es.done | bad)
        r = jnp.where(bad[:, None], 0.0, r)
        return es, r, done | bad, bad

    def policy(params, obs, key):
        mean, log_std, value = net.apply(params, obs)
        a = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        if ppo_cfg.squash_actions:
            logp = _logp_squashed(mean, log_std, a)
            a_env = squash_env_action(a)
        else:
            logp = _logp_gauss(mean, log_std, a)
            a_env = jnp.stack(
                [jnp.clip(a[..., 0], -1, 1), jnp.clip(a[..., 1], 0, 1),
                 jnp.clip(a[..., 2], 0, 1)],
                axis=-1,
            )
        return a, a_env, logp, value

    use_rms = ppo_cfg.normalize_obs and ppo_cfg.obs_type == "state"
    R = ppo_cfg.action_repeat

    def train_step(ts: TrainState):
        key = ts.key
        key, k_roll, k_reset, k_perm = jax.random.split(key, 4)

        def norm(obs):
            return _rms_normalize(ts.obs_rms, obs) if use_rms else obs

        max_steps = env_cfg.max_episode_steps
        # Pace curriculum (train_step_cost_start > 0): ramp the extra step
        # cost in linearly from that update. Static float otherwise.
        if ppo_cfg.train_step_cost and ppo_cfg.train_step_cost_start > 0:
            frac = jnp.clip(
                (ts.update_i + 1 - ppo_cfg.train_step_cost_start)
                / max(ppo_cfg.train_step_cost_ramp, 1),
                0.0, 1.0,
            ).astype(jnp.float32)
            shape_cost = ppo_cfg.train_step_cost * frac
        else:
            shape_cost = ppo_cfg.train_step_cost

        def rollout_body(carry, _):
            env_state, frames, key = carry
            key, k_act = jax.random.split(key)
            # Envs finished earlier in this rollout (no mid-rollout reset)
            # keep stepping; their transitions are garbage — an off-field car
            # pays -100 EVERY subsequent step (env._post_step) — so they are
            # masked out of rewards here and out of the losses below. A
            # nonfinite carry-in state (possible only through external
            # corruption; the in-rollout quarantine marks trips done) is
            # excluded the same way.
            state_ok = (
                jnp.isfinite(env_state.cars.hull_c).all(axis=(1, 2))
                & jnp.isfinite(env_state.cars.hull_v).all(axis=(1, 2))
            )
            alive = state_ok & ~(
                env_state.done | (env_state.steps >= max_steps)
            )
            obs_now = _observe(env_cfg, ppo_cfg, env_state)      # (E, N, ...)
            obs = _stack_obs(frames, obs_now)
            frames = _push_frames(frames, obs_now)
            a, a_env, logp, value = policy(ts.params, norm(obs), k_act)
            grass_cost = ppo_cfg.train_grass_cost
            skip_cost = ppo_cfg.train_skip_cost

            def shaped(r, es):
                r = r - shape_cost
                if grass_cost:
                    r = r - grass_cost * es.driving_on_grass.astype(r.dtype)
                return r

            def phi(es):
                return -skip_cost * _skipped_tiles(es)            # (E, N)

            if R == 1:
                if skip_cost:
                    phi0 = phi(env_state)
                env_state, r, done, bad = env_step(env_state, a_env)
                r = shaped(r, env_state)
                if skip_cost:
                    r = r + (ppo_cfg.gamma * phi(env_state) - phi0)
                r = r * alive.astype(jnp.float32)[:, None]
                fin = done | (env_state.steps >= max_steps)
                ret_snap = env_state.reward                       # (E, N)
            else:
                # Frame skip: hold the action R steps, sum rewards. Env done
                # is sticky; rewards emitted after done (the env keeps paying
                # -0.1/step and -100 while off-field) are masked out so a
                # terminal event isn't scaled by where it lands in the window.
                # ret_snap freezes the cumulative env score at the step the
                # episode actually finished (for honest return metrics).
                def rep_body(carry, _):
                    es, racc, seen_fin, snap, phi_prev, anybad = carry
                    es, r, done, bad = env_step(es, a_env)
                    r = shaped(r, es)
                    if skip_cost:
                        phi_new = phi(es)
                        r = r + (ppo_cfg.gamma * phi_new - phi_prev)
                        phi_prev = phi_new
                    live = 1.0 - seen_fin.astype(jnp.float32)
                    racc = racc + r * live[:, None]
                    snap = jnp.where(seen_fin[:, None], snap, es.reward)
                    seen_fin = seen_fin | done | (es.steps >= max_steps)
                    return (es, racc, seen_fin, snap, phi_prev,
                            anybad | bad), None

                (env_state, r, fin, ret_snap, _, bad), _ = jax.lax.scan(
                    rep_body,
                    (
                        env_state,
                        jnp.zeros((E, N), jnp.float32),
                        ~alive,
                        env_state.reward,
                        phi(env_state) if skip_cost
                        else jnp.zeros((E, N), jnp.float32),
                        jnp.zeros((E,), bool),
                    ),
                    None, length=R,
                )
                done = env_state.done
            trans = dict(
                obs=obs, action=a, logp=logp, value=value, reward=r,
                done=jnp.broadcast_to(done[:, None], (E, N)),
                fin=fin, ret_snap=ret_snap,
                alive=jnp.broadcast_to(alive[:, None], (E, N)),
                nan_env=bad,
            )
            return (env_state, frames, key), trans

        (env_state, frames, _), traj = jax.lax.scan(
            rollout_body, (ts.env_state, ts.frames, k_roll), None, length=T
        )

        # Bootstrap + GAE (masked at dones). Values from post-trip NaN obs
        # (quarantined envs) are zeroed first: nonterm=0 does NOT neutralize
        # them inside the recursion (0 * NaN = NaN at the trip step, whose
        # transition IS live) — this is what made the event updates display
        # a NaN loss (caught by the skip guard) before this sanitization.
        last_obs = _stack_obs(frames, _observe(env_cfg, ppo_cfg, env_state))
        _, _, last_value = net.apply(ts.params, norm(last_obs))  # (E, N)
        last_value = jnp.where(jnp.isfinite(last_value), last_value, 0.0)
        traj["value"] = jnp.where(
            jnp.isfinite(traj["value"]), traj["value"], 0.0
        )

        def gae_body(carry, x):
            adv_next, v_next = carry
            r, v, d = x
            nonterm = 1.0 - d.astype(jnp.float32)
            delta = r + ppo_cfg.gamma * v_next * nonterm - v
            adv = delta + ppo_cfg.gamma * ppo_cfg.gae_lambda * nonterm * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            gae_body,
            (jnp.zeros_like(last_value), last_value),
            (traj["reward"], traj["value"], traj["done"]),
            reverse=True,
        )
        returns = advs + traj["value"]

        # Flatten (T, E, N) -> (B,).
        def flat(x):
            return x.reshape((T * E * N,) + x.shape[3:])

        batch = dict(
            obs=flat(traj["obs"]), action=flat(traj["action"]),
            logp=flat(traj["logp"]), value=flat(traj["value"]),
            adv=flat(advs), ret=flat(returns),
            mask=flat(traj["alive"].astype(jnp.float32)),
        )
        # Zero every masked sample ONCE, wholesale. Masked entries can be
        # NaN (a quarantined env's post-trip obs/values/advs) or merely
        # extreme; either way they must never reach the network or the
        # weighted sums — a zero cotangent does NOT stop NaN from flowing
        # through the backward of e.g. (action - mean)^2 (0 * NaN = NaN).
        live_b = batch["mask"] > 0
        batch = {
            k: (v if k == "mask" else jnp.where(
                live_b.reshape(live_b.shape + (1,) * (v.ndim - 1)), v,
                jnp.zeros((), v.dtype)))
            for k, v in batch.items()
        }
        B = T * E * N
        mb = B // ppo_cfg.minibatches

        def loss_fn(params, mbatch):
            # Post-termination transitions (alive=0) carry no learning signal.
            live = mbatch["mask"] > 0
            w = mbatch["mask"] / jnp.maximum(mbatch["mask"].sum(), 1.0)
            # Masked obs can be arbitrarily extreme (off-field drift until
            # autoreset); without --normalize-obs's +-10 clip they can drive
            # inf/nan activations whose jnp.where backward (0 * inf) still
            # NaNs grads. Zero the inputs, not just the cotangents.
            obs_live = live.reshape(live.shape + (1,) * (mbatch["obs"].ndim - 1))
            obs_safe = jnp.where(obs_live, mbatch["obs"], 0)
            mean, log_std, value = net.apply(params, norm(obs_safe))
            logp = (
                _logp_squashed(mean, log_std, mbatch["action"])
                if ppo_cfg.squash_actions
                else _logp_gauss(mean, log_std, mbatch["action"])
            )
            # Masked samples are garbage (an off-field car drifts until the
            # end-of-update autoreset, so its obs are extreme): exp() or the
            # squared value error can overflow to inf there, and inf * w=0 is
            # NaN in the weighted sums — neutralize the INPUTS, not just the
            # weights. (Observed: a 2-agent run where every env hit the time
            # limit in the same rollout NaN'd the whole update.)
            dlogp = jnp.where(live, logp - mbatch["logp"], 0.0)
            ratio = jnp.exp(dlogp)
            # Masked advs can be NaN (GAE over a quarantined env's post-trip
            # steps): 0 * NaN in the weighted mean would still poison the
            # whole minibatch — sanitize them like the other inputs.
            adv = jnp.where(live, mbatch["adv"], 0.0)
            adv_mu = jnp.sum(adv * w)
            adv_sd = jnp.sqrt(jnp.sum(jnp.square(adv - adv_mu) * w))
            adv = (adv - adv_mu) / (adv_sd + 1e-8)
            pg = -jnp.sum(
                jnp.minimum(
                    ratio * adv,
                    jnp.clip(ratio, 1 - ppo_cfg.clip_eps, 1 + ppo_cfg.clip_eps) * adv,
                ) * w
            )
            v_clip = mbatch["value"] + jnp.clip(
                value - mbatch["value"], -ppo_cfg.clip_eps, ppo_cfg.clip_eps
            )
            v_err = jnp.where(live, value - mbatch["ret"], 0.0)
            vc_err = jnp.where(live, v_clip - mbatch["ret"], 0.0)
            v_loss = 0.5 * jnp.sum(
                jnp.maximum(jnp.square(v_err), jnp.square(vc_err)) * w
            )
            ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1).mean()
            loss = pg + ppo_cfg.vf_coef * v_loss - ppo_cfg.ent_coef * ent
            # k3 approximate KL (Schulman): E[(r - 1) - log r] >= 0; dead
            # samples contribute exactly 0 (dlogp zeroed, ratio 1).
            approx_kl = jnp.sum((ratio - 1.0 - dlogp) * w)
            return loss, (
                pg, v_loss, jnp.sum(jnp.abs(ratio - 1) * w),
                jnp.max(jnp.abs(dlogp)), approx_kl,
            )

        def epoch_body(carry, k_ep):
            params, opt_state, stopped = carry
            perm = jax.random.permutation(k_ep, B)

            def mb_body(carry, mb_i):
                params, opt_state, stopped = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, mb_i * mb, mb)
                mbatch = {k: v[idx] for k, v in batch.items()}
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mbatch
                )
                gn = optax.global_norm(grads)
                # Last line of defense: a nonfinite gradient (however it
                # arose) must not reach adam — inf/NaN there is permanent
                # parameter death. Skip the whole minibatch update instead
                # and count it (skipped_updates metric). Selecting old
                # params/opt_state keeps the tree structure checkpoint-
                # compatible (unlike optax.apply_if_finite). The same
                # mechanism implements KL early stopping: once approx KL
                # crosses kl_target, the remaining minibatches are no-ops.
                ok = jnp.isfinite(gn) & jnp.isfinite(loss) & ~stopped
                safe = jax.tree_util.tree_map(
                    lambda g: jnp.where(ok, g, 0.0), grads
                )
                updates, new_opt = tx.update(safe, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                params = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(ok, n, o), new_params, params
                )
                opt_state = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(ok, n, o), new_opt, opt_state
                )
                if ppo_cfg.kl_target > 0:
                    stopped = stopped | (aux[-1] > ppo_cfg.kl_target)
                return (params, opt_state, stopped), (
                    loss, *aux, gn, 1.0 - ok.astype(jnp.float32)
                )

            (params, opt_state, stopped), stats = jax.lax.scan(
                mb_body, (params, opt_state, stopped),
                jnp.arange(ppo_cfg.minibatches),
            )
            return (params, opt_state, stopped), stats

        ep_keys = jax.random.split(k_perm, ppo_cfg.epochs)
        (params, opt_state, _), stats = jax.lax.scan(
            epoch_body,
            (ts.params, ts.opt_state, jnp.asarray(False)),
            ep_keys,
        )

        # Episode returns: the cumulative env score snapshotted at the step
        # the episode actually finished (done or time limit) — not biased by
        # the -0.1/step the env keeps paying until the end-of-update autoreset.
        fin_t = traj["fin"]                                      # (T, E)
        finished = fin_t.any(0)                                  # (E,)
        tfirst = jnp.argmax(fin_t, axis=0)                       # (E,)
        snap = jnp.take_along_axis(
            traj["ret_snap"], tfirst[None, :, None], axis=0
        )[0]                                                     # (E, N)
        snap = jnp.where(jnp.isfinite(snap), snap, 0.0)          # quarantined
        n_fin = jnp.sum(finished)
        per_env_ret = snap.mean(-1)                              # (E,)
        ep_return = jnp.where(
            n_fin > 0,
            jnp.sum(jnp.where(finished, per_env_ret, 0.0)) / jnp.maximum(n_fin, 1),
            0.0,
        )
        ep_return_max = jnp.where(
            n_fin > 0, jnp.max(jnp.where(finished, per_env_ret, -jnp.inf)), 0.0
        )

        if frames is not None:
            # Envs about to be autoreset start their next episode with a
            # zero-filled stacking buffer (same convention as eval).
            needs = env_state.done | (env_state.steps >= max_steps)
            frames = jnp.where(
                needs.reshape((E,) + (1,) * (frames.ndim - 1)),
                jnp.zeros((), frames.dtype), frames,
            )
        env_state = tenv.reset_done_envs(env_cfg, env_state, ts.pool, k_reset)
        obs_rms = (
            _rms_update(ts.obs_rms, traj["obs"], traj["alive"])
            if use_rms else None
        )

        if os.environ.get("MCR_PPO_DEBUG_STATS"):
            # Unreduced (epochs, minibatches) stats for NaN forensics.
            return (
                TrainState(
                    params=params, opt_state=opt_state, env_state=env_state,
                    pool=ts.pool, key=key, update_i=ts.update_i + 1,
                    obs_rms=obs_rms, frames=frames,
                ),
                dict(stats_loss=stats[0], stats_pg=stats[1],
                     stats_v=stats[2], stats_dlogp=stats[4],
                     stats_kl=stats[5], stats_gn=stats[6]),
            )
        metrics = dict(
            loss=stats[0].mean(),
            pg_loss=stats[1].mean(),
            v_loss=stats[2].mean(),
            ratio_dev=stats[3].mean(),
            dlogp_max=stats[4].max(),
            approx_kl_max=stats[5].max(),
            grad_norm_max=stats[6].max(),
            skipped_updates=stats[7].sum(),
            nan_envs=traj["nan_env"].max(0).sum().astype(jnp.float32),
            mean_step_reward=traj["reward"].mean(),
            mean_value=jnp.where(
                jnp.isfinite(traj["value"]), traj["value"], 0.0
            ).mean(),
            ep_return=ep_return,
            ep_return_max=ep_return_max,
            episodes_finished=n_fin.astype(jnp.float32),
        )
        return (
            TrainState(
                params=params, opt_state=opt_state, env_state=env_state,
                pool=ts.pool, key=key, update_i=ts.update_i + 1,
                obs_rms=obs_rms, frames=frames,
            ),
            metrics,
        )

    return train_step
