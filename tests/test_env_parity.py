"""End-to-end env parity vs the reference + vectorization invariance."""

from functools import partial

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_car_racing_tpu import config as C, env as tenv, seeding


def _action_schedule(steps, num_agents):
    acts = []
    for t in range(steps):
        steer = 0.25 * np.sin(t / 23.0)
        gas = 0.35 if t % 40 < 30 else 0.0
        brake = 0.3 if t % 97 > 90 else 0.0
        acts.append(np.tile([steer, gas, brake], (num_agents, 1)))
    return acts


def _run_reference(num_agents, seed, gseed, actions):
    from multi_car_racing_tpu.oracle import shims

    Env, _ = shims.load_reference_env_class()
    env = Env(num_agents=num_agents, verbose=0)
    env.seed(seed)
    np.random.seed(gseed)
    env.reset()
    reset_reward = np.array(env.reward)
    rews = []
    done = False
    for a in actions:
        _, r, done, _ = env.step(a)
        rews.append(np.array(r))
        if done:
            break
    return reset_reward, np.array(rews), done, env


def _run_ours(num_agents, seed, gseed, actions):
    cfg = C.EnvConfig(num_agents=num_agents)
    gs = seeding.GlobalStream(gseed)
    state, info = tenv.host_reset(cfg, seed=seed, global_stream=gs)
    reset_reward = np.asarray(state.reward)
    step_fn = jax.jit(partial(tenv.step, cfg))
    rews = []
    done = False
    for a in actions:
        state, r, d = step_fn(state, jnp.asarray(a))
        rews.append(np.asarray(r))
        done = bool(d)
        if done:
            break
    return reset_reward, np.array(rews), done, state


@pytest.mark.parametrize("seed,gseed", [(11, 5), (42, 7)])
def test_single_agent_seeded_return_parity(seed, gseed):
    actions = _action_schedule(250, 1)
    ref_r0, ref_rews, ref_done, _ = _run_reference(1, seed, gseed, actions)
    our_r0, our_rews, our_done, _ = _run_ours(1, seed, gseed, actions)

    np.testing.assert_allclose(our_r0, ref_r0, atol=1e-5)
    assert len(ref_rews) == len(our_rews)
    np.testing.assert_allclose(our_rews, ref_rews, atol=1e-4)
    assert ref_done == our_done


def test_two_agent_parity_modulo_spawn_tiebreak():
    """Per-step rewards match except t=0, where the spawn-tile first-visitor
    bonus order differs (Box2D contact-manager order vs our car-id rule —
    SURVEY.md §7.5). Totals must agree regardless."""
    actions = _action_schedule(250, 2)
    _, ref_rews, ref_done, _ = _run_reference(2, 11, 5, actions)
    _, our_rews, our_done, _ = _run_ours(2, 11, 5, actions)

    L = min(len(ref_rews), len(our_rews))
    np.testing.assert_allclose(our_rews[1:L], ref_rews[1:L], atol=1e-4)
    # t=0 carries the spawn bonuses: the multiset of per-car rewards matches.
    np.testing.assert_allclose(
        np.sort(our_rews[0]), np.sort(ref_rews[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        our_rews[:L].sum(axis=0).sum(), ref_rews[:L].sum(axis=0).sum(), atol=1e-3
    )
    assert ref_done == our_done


def test_done_on_all_tiles_visited():
    cfg = C.EnvConfig(num_agents=1)
    state, _ = tenv.host_reset(cfg, seed=0, global_stream=seeding.GlobalStream(0))
    # Surgically mark every valid tile visited except one the car sits on.
    visited = jnp.asarray(state.track.valid)[None, :]
    state = state.replace(
        visited=visited,
        tile_visited_count=jnp.asarray([state.track.n_tiles], jnp.int32),
    )
    state, r, d = jax.jit(partial(tenv.step, cfg))(state, jnp.zeros((1, 3)))
    assert bool(d)


def test_off_playfield_minus_100():
    cfg = C.EnvConfig(num_agents=1)
    state, _ = tenv.host_reset(cfg, seed=0, global_stream=seeding.GlobalStream(0))
    far = jnp.asarray([[C.PLAYFIELD + 50.0, 0.0]], state.reward.dtype)
    cars = state.cars.replace(
        hull_c=far, wheel_c=far[:, None, :] + state.cars.wheel_c - state.cars.hull_c[:, None, :]
    )
    state = state.replace(cars=cars)
    state, r, d = jax.jit(partial(tenv.step, cfg))(state, jnp.zeros((1, 3)))
    assert bool(d)
    assert float(r[0]) == -100.0


def test_vmap_matches_single_env():
    """Batched lockstep must equal independent single-env runs bit-for-bit
    (SURVEY.md §4.3)."""
    cfg = C.EnvConfig(num_agents=2)
    states = []
    for seed in [1, 2, 3, 4]:
        s, _ = tenv.host_reset(cfg, seed=seed, global_stream=seeding.GlobalStream(seed))
        states.append(s)
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    actions = _action_schedule(20, 2)
    step1 = jax.jit(partial(tenv.step, cfg))
    stepN = jax.jit(jax.vmap(partial(tenv.step, cfg)))

    for a in actions:
        a1 = jnp.asarray(a)
        states = [step1(s, a1) for s in states]
        batched = stepN(batched, jnp.broadcast_to(a1, (4,) + a1.shape))
        batched_state, batched_r, _ = batched
        for i, (s, r, _) in enumerate(states):
            np.testing.assert_array_equal(
                np.asarray(batched_state.cars.hull_c[i]), np.asarray(s.cars.hull_c)
            )
            np.testing.assert_array_equal(np.asarray(batched_r[i]), np.asarray(r))
        states = [s for s, _, _ in states]
        batched = batched_state


def test_four_agent_parity_modulo_spawn_tiebreak():
    """BASELINE.json config 3: num_agents=4. Same contract as the 2-agent
    test — per-step rewards match after t=0; spawn-bonus multiset and totals
    match at t=0 (car-id tie-break vs Box2D contact order, SURVEY.md §7.5)."""
    actions = _action_schedule(120, 4)
    _, ref_rews, ref_done, _ = _run_reference(4, 11, 5, actions)
    _, our_rews, our_done, _ = _run_ours(4, 11, 5, actions)

    L = min(len(ref_rews), len(our_rews))
    np.testing.assert_allclose(our_rews[1:L], ref_rews[1:L], atol=1e-4)
    np.testing.assert_allclose(
        np.sort(our_rews[0]), np.sort(ref_rews[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        our_rews[:L].sum(axis=0).sum(), ref_rews[:L].sum(axis=0).sum(), atol=1e-3
    )
    assert ref_done == our_done
