"""Full-episode parity harness (VERDICT round-1 item #4).

Drives the *reference* env (/root/reference/gym_multi_car_racing/
multi_car_racing.py, loaded through oracle/shims.py) to a natural episode end
— done=True (all tiles visited or off-playfield, mcr:498-507) or the
1000-step TimeLimit (init:8) — under a deterministic track-follower policy,
records the action sequence, then replays it open-loop through the TPU
engine and compares termination step and cumulative return.

The follower is computed from the reference env's own state (float64 Box2D),
so the recorded actions are exactly what the reference experienced; the
engine receives the identical action array. Any reward/termination drift is
then purely engine physics/reward error, not policy feedback divergence.

Used by tests/test_episode_parity.py (small in-suite sweep) and
scripts/parity_sweep.py (the >=20-seed x {1,2,4} agents x both directions
table recorded in docs/PARITY.md).
"""

from __future__ import annotations

import math

import numpy as np


def lane_offsets(num_cars: int) -> np.ndarray:
    """Per-car lateral lane (m from centerline). Cars following one shared
    racing line rear-end each other within ~60 steps (measured) and the
    episode enters contact chaos; distinct lanes inside the ±6.67 m track
    width keep multi-agent parity episodes contact-free (hull-hull impact
    parity has its own dedicated first-impact test, tests/test_collide.py)."""
    if num_cars == 1:
        return np.zeros(1)
    return np.linspace(-3.2, 3.2, num_cars)


def follower_action(track_xy, track_beta, cw, hulls, max_speed=40.0,
                    lanes=None):
    """Deterministic per-car track follower.

    track_xy: (T, 2) centerline, track_beta: (T,) tile headings, cw: bool;
    hulls: list of (pos(2,), vel(2,), angle) float64 tuples; lanes: (N,)
    per-car lateral offset (default lane_offsets).
    Returns (N, 3) [steer, gas, brake] in the env's action convention
    (steer +1 = right, mcr:422).
    """
    n = len(track_beta)
    sgn = -1 if cw else 1
    if lanes is None:
        lanes = lane_offsets(len(hulls))
    acts = np.zeros((len(hulls), 3), dtype=np.float64)
    for k, (pos, vel, ang) in enumerate(hulls):
        d2 = (track_xy[:, 0] - pos[0]) ** 2 + (track_xy[:, 1] - pos[1]) ** 2
        i = int(np.argmin(d2))
        j = (i + sgn * 4) % n
        desired = float(track_beta[j]) + (math.pi if cw else 0.0)
        err = (desired - ang + math.pi) % (2 * math.pi) - math.pi
        # Signed lateral offset from the centerline: (cos b, sin b) is the
        # tile's lateral axis (mcr:311-318), 90 deg clockwise of the CCW
        # driving direction (-sin b, cos b) — so positive lat = car right of
        # center when driving CCW, left when CW; steer back with -lat*sgn
        # (steer +1 = right, mcr:422).
        b = float(track_beta[i])
        lat = ((pos[0] - track_xy[i, 0]) * math.cos(b)
               + (pos[1] - track_xy[i, 1]) * math.sin(b)) - lanes[k]
        steer = -2.0 * math.sin(err) - 0.12 * max(-4.0, min(4.0, lat)) * sgn
        speed = math.hypot(vel[0], vel[1])
        # Slow for upcoming curvature.
        kk = (i + sgn * 10) % n
        curv = abs((track_beta[kk] - track_beta[j] + math.pi) % (2 * math.pi)
                   - math.pi)
        target = max_speed * (1.0 - min(curv, 1.0) * 0.65)
        gas = 0.25 if speed < target else 0.0
        brake = 0.4 if speed > target + 6.0 else 0.0
        acts[k] = (max(-1.0, min(1.0, steer)), gas, brake)
    return acts


def run_reference_episode(num_agents, seed, gseed, direction=None,
                          max_steps=1000):
    """Run the reference env to natural end under the follower.

    direction: None (reference default: random from the global stream) or
    'CW'/'CCW' (fixed). Returns a dict with the recorded actions, per-step
    reward matrix, done step (or max_steps if time-limited), reset reward,
    tile counts, and track size.
    """
    from . import shims

    Env, _ = shims.load_reference_env_class()
    kw = dict(num_agents=num_agents, verbose=0)
    if direction is not None:
        kw.update(direction=direction, use_random_direction=False)
    env = Env(**kw)
    env.seed(seed)
    np.random.seed(gseed)
    env.reset()

    track_xy = np.array([(t[2], t[3]) for t in env.track], dtype=np.float64)
    track_beta = np.array([t[1] for t in env.track], dtype=np.float64)
    cw = env.episode_direction == "CW"

    actions, rewards = [], []
    done_step = max_steps
    for t in range(max_steps):
        hulls = [
            (np.asarray(car.hull.position, np.float64),
             np.asarray(car.hull.linearVelocity, np.float64),
             float(car.hull.angle))
            for car in env.cars
        ]
        a = follower_action(track_xy, track_beta, cw, hulls)
        actions.append(a)
        _, r, done, _ = env.step(a)
        rewards.append(np.asarray(r, np.float64))
        if done:
            done_step = t
            break
    return dict(
        actions=np.array(actions),
        rewards=np.array(rewards),
        done_step=done_step,
        reset_reward=np.asarray(env.reward, np.float64)
        - np.asarray(rewards).sum(0),
        tiles=list(env.tile_visited_count),
        n_tiles=len(env.track),
        direction=env.episode_direction,
    )


def run_reference_replay(num_agents, seed, gseed, actions, direction=None,
                         max_steps=1000, perturb=0.0):
    """Replay a recorded action sequence through the REFERENCE itself,
    optionally nudging car 0's hull x by ``perturb`` meters right after
    reset. With perturb ~1e-6 this measures the reference's own Lyapunov
    sensitivity under open-loop replay — the null hypothesis against which
    engine-vs-reference drift on contact-coupled (N>=2) episodes must be
    judged (identical seeds, identical actions, the only difference is a
    sub-micron initial offset)."""
    from . import shims

    Env, _ = shims.load_reference_env_class()
    kw = dict(num_agents=num_agents, verbose=0)
    if direction is not None:
        kw.update(direction=direction, use_random_direction=False)
    env = Env(**kw)
    env.seed(seed)
    np.random.seed(gseed)
    env.reset()
    if perturb:
        h = env.cars[0].hull
        h.position = (float(h.position[0]) + perturb, float(h.position[1]))

    rewards = []
    done_step = max_steps
    for t in range(min(len(actions), max_steps)):
        _, r, done, _ = env.step(actions[t])
        rewards.append(np.asarray(r, np.float64))
        if done:
            done_step = t
            break
    return dict(
        rewards=np.array(rewards),
        done_step=done_step,
        tiles=list(env.tile_visited_count),
        n_tiles=len(env.track),
        direction=env.episode_direction,
    )


def reference_self_divergence(num_agents, seed, gseed, direction=None,
                              max_steps=1000, perturb=1e-6):
    """Reference-vs-perturbed-reference drift under open-loop replay of the
    follower's recorded actions — the chaos floor for compare_episode."""
    ref = run_reference_episode(num_agents, seed, gseed, direction, max_steps)
    pert = run_reference_replay(
        num_agents, seed, gseed, ref["actions"], direction, max_steps,
        perturb=perturb,
    )
    L = min(len(ref["rewards"]), len(pert["rewards"]))
    a = ref["rewards"][:L]
    b = pert["rewards"][:L]
    return dict(
        num_agents=num_agents, seed=seed, gseed=gseed,
        direction=ref["direction"], perturb=perturb,
        ref_done=ref["done_step"], pert_done=pert["done_step"],
        ref_tiles=ref["tiles"], pert_tiles=pert["tiles"],
        ref_return=a.sum(0).tolist(), pert_return=b.sum(0).tolist(),
        total_drift=float(abs(a.sum() - b.sum())),
        max_step_err_post0=float(np.abs(a - b)[1:].max()) if L > 1 else 0.0,
        tiles_match=list(ref["tiles"]) == list(pert["tiles"]),
        steps=L,
    )


def run_engine_episode(num_agents, seed, gseed, actions, direction=None,
                       max_steps=1000):
    """Replay a recorded action sequence through the TPU engine (host-parity
    reset path: bit-exact MT19937 track + global-stream episode draws)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from .. import config as C, env as tenv, seeding

    kw = dict(num_agents=num_agents)
    if direction is not None:
        kw.update(direction=direction, use_random_direction=False)
    cfg = C.EnvConfig(**kw)
    gs = seeding.GlobalStream(gseed)
    state, info = tenv.host_reset(cfg, seed=seed, global_stream=gs)
    step_fn = jax.jit(partial(tenv.step, cfg))

    rewards = []
    done_step = max_steps
    for t in range(min(len(actions), max_steps)):
        state, r, d = step_fn(state, jnp.asarray(actions[t]))
        rewards.append(np.asarray(r, np.float64))
        if bool(d):
            done_step = t
            break
    return dict(
        rewards=np.array(rewards),
        done_step=done_step,
        tiles=np.asarray(state.tile_visited_count).tolist(),
        n_tiles=int(state.track.n_tiles),
        direction="CW" if bool(state.direction_cw) else "CCW",
    )


def run_engine_episode_closed(num_agents, seed, gseed, direction=None,
                              max_steps=1000):
    """Drive the TPU engine CLOSED-LOOP with the same follower policy the
    reference harness uses (actions recomputed from the engine's own hull
    states each step). For contact-coupled episodes (N>=2) open-loop replay
    is dominated by Lyapunov divergence (see reference_self_divergence);
    the functional parity question is whether the same *policy* earns the
    same *return distribution* on both engines — this provides the engine
    side of that comparison."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from .. import config as C, env as tenv, seeding

    kw = dict(num_agents=num_agents)
    if direction is not None:
        kw.update(direction=direction, use_random_direction=False)
    cfg = C.EnvConfig(**kw)
    gs = seeding.GlobalStream(gseed)
    state, info = tenv.host_reset(cfg, seed=seed, global_stream=gs)
    step_fn = jax.jit(partial(tenv.step, cfg))

    track_xy = np.asarray(state.track.xy, np.float64)
    track_beta = np.asarray(state.track.beta, np.float64)
    nt = int(state.track.n_tiles)
    track_xy, track_beta = track_xy[:nt], track_beta[:nt]
    cw = bool(state.direction_cw)

    rewards = []
    done_step = max_steps
    for t in range(max_steps):
        hulls = [
            (np.asarray(state.cars.hull_c[i], np.float64),
             np.asarray(state.cars.hull_v[i], np.float64),
             float(state.cars.hull_a[i]))
            for i in range(num_agents)
        ]
        a = follower_action(track_xy, track_beta, cw, hulls)
        state, r, d = step_fn(state, jnp.asarray(a))
        rewards.append(np.asarray(r, np.float64))
        if bool(d):
            done_step = t
            break
    return dict(
        rewards=np.array(rewards),
        done_step=done_step,
        tiles=np.asarray(state.tile_visited_count).tolist(),
        n_tiles=nt,
        direction="CW" if cw else "CCW",
    )


def compare_episode(num_agents, seed, gseed, direction=None, max_steps=1000):
    """Run both and return a comparison row (dict)."""
    ref = run_reference_episode(num_agents, seed, gseed, direction, max_steps)
    ours = run_engine_episode(
        num_agents, seed, gseed, ref["actions"], direction, max_steps
    )
    L = min(len(ref["rewards"]), len(ours["rewards"]))
    ref_cum = ref["rewards"][:L].sum(0)
    our_cum = ours["rewards"][:L].sum(0)
    step_err = np.abs(ref["rewards"][:L] - ours["rewards"][:L])
    return dict(
        num_agents=num_agents,
        seed=seed,
        gseed=gseed,
        direction=ref["direction"],
        ref_done=ref["done_step"],
        our_done=ours["done_step"],
        n_tiles=ref["n_tiles"],
        ref_tiles=ref["tiles"],
        our_tiles=ours["tiles"],
        ref_return=ref_cum.tolist(),
        our_return=our_cum.tolist(),
        cum_drift=float(np.abs(ref_cum - our_cum).max()),
        # Multi-agent: t=0 splits the spawn-tile bonuses by contact order in
        # the reference vs car-id here (SURVEY.md §7.5) — the per-car figures
        # below exclude t=0, and total_drift sums over cars (the tie-break
        # moves reward between cars, never creates or destroys it).
        cum_drift_post0=float(
            np.abs(ref["rewards"][1:L].sum(0) - ours["rewards"][1:L].sum(0)).max()
        ) if L > 1 else 0.0,
        total_drift=float(abs(ref_cum.sum() - our_cum.sum())),
        max_step_err=float(step_err.max()) if L else 0.0,
        # t=0 carries the spawn-tile tie-break divergence (SURVEY.md §7.5);
        # exclude it from the per-step figure like tests/test_env_parity.py.
        max_step_err_post0=float(step_err[1:].max()) if L > 1 else 0.0,
        steps=L,
    )
