"""PPO learner + mesh sharding smoke/behavior tests (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp

from multi_car_racing_tpu import config as C
from multi_car_racing_tpu.learner import ppo
from multi_car_racing_tpu.parallel import mesh as pmesh


def _tiny_cfgs(n_envs=4):
    env_cfg = C.EnvConfig(num_agents=2, velocity_iters=8, position_iters=3)
    ppo_cfg = ppo.PPOConfig(
        rollout_len=4, num_envs=n_envs, pool_size=2, minibatches=2, epochs=1
    )
    return env_cfg, ppo_cfg


def test_train_step_updates_params():
    env_cfg, ppo_cfg = _tiny_cfgs()
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg))
    ts2, metrics = train_step(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params must have moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.params, ts2.params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    assert int(ts2.update_i) == 1


def test_train_step_sharded_over_mesh():
    env_cfg, ppo_cfg = _tiny_cfgs(n_envs=16)
    mesh = pmesh.make_mesh(8)
    with jax.set_mesh(mesh):
        ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
        ts = pmesh.shard_train_state(ts, mesh)
        train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg))
        ts, metrics = train_step(ts)
        jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics["loss"]))
    # env batch stays sharded over 'data' after the step
    sh = ts.env_state.reward.sharding
    assert "data" in str(sh.spec) or sh.is_fully_replicated is False


def test_learning_signal_on_tiny_problem():
    """A few updates should reduce value loss on-policy (sanity, not a full
    training run)."""
    env_cfg, ppo_cfg = _tiny_cfgs(n_envs=8)
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(1))
    train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg))
    first = None
    for i in range(6):
        ts, metrics = train_step(ts)
        if i == 0:
            first = float(metrics["v_loss"])
    assert float(metrics["v_loss"]) < first * 1.5  # not diverging


def test_skipped_tiles_counter():
    """_skipped_tiles = unvisited valid tiles outside the largest circular
    unvisited run (the not-yet-reached arc)."""
    from types import SimpleNamespace

    def mk(visited_idx, n=10, mt=12):
        v = np.zeros((1, 1, mt), bool)
        v[0, 0, visited_idx] = True
        valid = np.zeros((1, mt), bool)
        valid[0, :n] = True
        return SimpleNamespace(
            visited=jnp.asarray(v),
            track=SimpleNamespace(
                valid=jnp.asarray(valid),
                n_tiles=jnp.asarray([n], jnp.int32),
            ),
        )

    f = lambda s: float(ppo._skipped_tiles(s)[0, 0])
    assert f(mk([0, 1, 2, 3])) == 0.0            # contiguous arc: no skips
    assert f(mk([8, 9, 0, 1])) == 0.0            # arc wraps the seam
    assert f(mk([0, 1, 2, 4, 5])) == 1.0         # tile 3 missed
    assert f(mk([0, 1, 3, 5])) == 2.0            # tiles 2 and 4 missed
    assert f(mk(list(range(10)))) == 0.0         # all visited
    assert f(mk([])) == 0.0                      # none visited (fresh reset)
    # Missed tile at the seam: unvisited = {0} and {4..8}; the largest
    # circular run is 4..8 (len 5), so the lone tile 0 counts as skipped.
    assert f(mk([9, 1, 2, 3])) == 1.0


def test_skip_cost_train_step_runs():
    """train_skip_cost wires into both the R==1 and the action-repeat rollout
    paths without breaking the update."""
    env_cfg = C.EnvConfig(num_agents=2, velocity_iters=4, position_iters=2)
    for repeat in (1, 2):
        ppo_cfg = ppo.PPOConfig(
            rollout_len=2, num_envs=4, pool_size=2, minibatches=2, epochs=1,
            train_skip_cost=3.0, action_repeat=repeat,
        )
        ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
        train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg))
        ts2, metrics = train_step(ts)
        assert np.isfinite(float(metrics["loss"]))


def test_train_step_pixels():
    """PPO over the real 96x96x3 pixel observations (reference contract):
    rollout renders per step, CNN torso, one update."""
    env_cfg = C.EnvConfig(num_agents=1, velocity_iters=4, position_iters=2)
    ppo_cfg = ppo.PPOConfig(
        rollout_len=2, num_envs=2, pool_size=2, minibatches=1, epochs=1,
        obs_type="pixels",
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg))
    ts2, metrics = train_step(ts)
    assert np.isfinite(float(metrics["loss"]))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.params, ts2.params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_frame_stacking_pixels():
    """Frame stacking (round 5): K=2 stacked pixel rollout trains, the
    buffer threads through TrainState, eval runs the same stacking, and a
    legacy (pre-frames-field) checkpoint template still restores."""
    from multi_car_racing_tpu.learner import evaluate as ev

    env_cfg = C.EnvConfig(num_agents=1, velocity_iters=4, position_iters=2)
    ppo_cfg = ppo.PPOConfig(
        rollout_len=2, num_envs=2, pool_size=2, minibatches=1, epochs=1,
        obs_type="pixels", frame_stack=2, action_repeat=2,
        train_step_cost=0.05, train_step_cost_start=1, train_step_cost_ramp=2,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    assert ts.frames.shape == (2, 1, 96, 96, 3) and ts.frames.dtype == jnp.uint8
    # network input channels = 3 * K
    kernel = ts.params["params"]["PixelTorso_0"]["Conv_0"]["kernel"]
    assert kernel.shape[2] == 6
    train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg))
    ts2, metrics = train_step(ts)
    assert np.isfinite(float(metrics["loss"]))
    # buffer advanced: after a rollout with moving cars it is not all-zero
    assert int(jnp.sum(ts2.frames)) > 0
    out = ev.make_eval_fn(env_cfg, ppo_cfg, 2)(
        ts2.params, ts2.obs_rms, jax.random.PRNGKey(1)
    )
    s = ev.summarize(out)
    assert np.isfinite(s["eval_return"])


def test_checkpoint_restore_legacy_template(tmp_path):
    """A checkpoint saved WITHOUT the frames field (simulating a round-4
    artifact) restores into the current TrainState when frames is None."""
    import dataclasses

    from multi_car_racing_tpu import checkpoint

    env_cfg, ppo_cfg = _tiny_cfgs(n_envs=2)
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    assert ts.frames is None
    # Save the on-disk shape a round-4 TrainState had: a dict without frames.
    legacy = {f.name: getattr(ts, f.name)
              for f in dataclasses.fields(ts) if f.name != "frames"}
    checkpoint.save(str(tmp_path / "ck"), legacy)
    ts2 = checkpoint.restore(str(tmp_path / "ck"), ts)
    assert ts2.frames is None
    np.testing.assert_array_equal(np.asarray(ts2.key), np.asarray(ts.key))


def test_checkpoint_restore_across_lr_configs(tmp_path):
    """A checkpoint from an --anneal-lr run restores into a constant-lr run
    (fine-tune phases routinely change the lr config). The optimizer always
    uses a schedule so the opt_state tree structure is invariant; a float lr
    would lower to stateless optax.scale and break orbax structural
    restore (the round-3 p2 launch failure)."""
    from multi_car_racing_tpu import checkpoint

    env_cfg = C.EnvConfig(num_agents=1, use_random_direction=False,
                          backwards_flag=False,
                          velocity_iters=4, position_iters=2)
    pc_anneal = ppo.PPOConfig(rollout_len=2, num_envs=2, pool_size=2,
                              anneal_lr=True, total_updates=7)
    pc_const = ppo.PPOConfig(rollout_len=2, num_envs=2, pool_size=2,
                             anneal_lr=False, lr=1e-4)
    ts_a = ppo.init_train_state(env_cfg, pc_anneal, jax.random.PRNGKey(0))
    ts_c = ppo.init_train_state(env_cfg, pc_const, jax.random.PRNGKey(1))
    path = str(tmp_path / "ck")
    checkpoint.save(path, ts_a)
    out = checkpoint.restore(path, ts_c)
    # Params came from the anneal run, structure from the constant-lr one.
    a, b = jax.tree_util.tree_leaves(ts_a.params), jax.tree_util.tree_leaves(out.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_all_envs_finished_no_nan():
    """Every env hitting the time limit inside one rollout must not NaN the
    update. Post-termination transitions carry extreme garbage obs (an
    off-field car drifts until the autoreset); inf * 0-weight used to NaN
    the weighted loss sums (observed on a 2-agent run where all 1024 envs
    crossed the 1000-step limit in the same rollout)."""
    env_cfg = C.EnvConfig(num_agents=2, velocity_iters=4, position_iters=2,
                          max_episode_steps=3)
    ppo_cfg = ppo.PPOConfig(
        rollout_len=6, num_envs=4, pool_size=2, minibatches=2, epochs=1,
        normalize_obs=True, train_grass_cost=0.5, train_skip_cost=2.0,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg))
    for _ in range(3):
        ts, metrics = train_step(ts)
        for k in ("loss", "pg_loss", "v_loss"):
            assert np.isfinite(float(metrics[k])), k
        for leaf in jax.tree_util.tree_leaves(ts.params):
            assert bool(jnp.isfinite(leaf).all())
        assert bool(jnp.isfinite(ts.obs_rms["mean"]).all())
        assert bool(jnp.isfinite(ts.obs_rms["var"]).all())


def test_rms_update_mask_excludes_garbage():
    rng = np.random.RandomState(0)
    clean = rng.randn(50, 3).astype(np.float32)
    garbage = np.full((10, 3), 1e30, np.float32)
    batch = jnp.asarray(np.concatenate([clean, garbage]))
    mask = jnp.asarray(np.concatenate([np.ones(50), np.zeros(10)]))
    rms = dict(mean=jnp.zeros(3), var=jnp.ones(3),
               count=jnp.asarray(1e-4, jnp.float32))
    out = ppo._rms_update(rms, batch, mask)
    np.testing.assert_allclose(np.asarray(out["mean"]), clean.mean(0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(out["count"]), 50 + 1e-4, rtol=1e-5)
    # Unmasked call on the same batch is poisoned — the guard matters.
    bad = ppo._rms_update(rms, batch)
    assert float(np.abs(np.asarray(bad["mean"])).max()) > 1e20


def test_nan_env_quarantined():
    """A physics blowup in ONE env (nonfinite car state) must be contained:
    the env is marked done and reset, the nan_envs metric counts it, every
    loss stays finite, and params stay finite. Round-4 regression: before
    the quarantine, one NaN env poisoned GAE (0 * NaN in the masked sums)
    and killed the whole 2-agent training run."""
    env_cfg = C.EnvConfig(num_agents=2, velocity_iters=4, position_iters=2)
    ppo_cfg = ppo.PPOConfig(
        rollout_len=4, num_envs=4, pool_size=2, minibatches=2, epochs=1,
        normalize_obs=True, action_repeat=2,
        train_grass_cost=0.5, train_skip_cost=2.0,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    # Poison env 1's hull state with NaN mid-flight.
    cars = ts.env_state.cars
    hull_c = cars.hull_c.at[1].set(jnp.nan)
    hull_v = cars.hull_v.at[1].set(jnp.nan)
    ts = ts.replace(
        env_state=ts.env_state.replace(
            cars=cars.replace(hull_c=hull_c, hull_v=hull_v)
        )
    )
    train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg))
    ts, metrics = train_step(ts)
    assert float(metrics["nan_envs"]) >= 1.0
    for k in ("loss", "pg_loss", "v_loss", "mean_step_reward", "mean_value",
              "ep_return"):
        assert np.isfinite(float(metrics[k])), k
    for leaf in jax.tree_util.tree_leaves(ts.params):
        assert bool(jnp.isfinite(leaf).all())
    assert bool(jnp.isfinite(ts.obs_rms["mean"]).all())
    assert bool(jnp.isfinite(ts.obs_rms["var"]).all())
    # The autoreset must have replaced the poisoned env with a fresh one.
    assert bool(jnp.isfinite(ts.env_state.cars.hull_c).all())

    # And a second step from the recovered state stays healthy.
    ts, metrics = train_step(ts)
    assert np.isfinite(float(metrics["loss"]))


def test_kl_early_stop_masks_updates():
    """With a tiny kl_target every minibatch after the first KL breach must
    be a no-op and count into skipped_updates; params still move (the first
    minibatch always applies)."""
    env_cfg = C.EnvConfig(num_agents=1, velocity_iters=4, position_iters=2)
    ppo_cfg = ppo.PPOConfig(
        rollout_len=4, num_envs=4, pool_size=2, minibatches=4, epochs=2,
        kl_target=1e-9,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    p0 = jax.tree_util.tree_leaves(ts.params)
    train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg))
    ts, metrics = train_step(ts)
    assert float(metrics["skipped_updates"]) >= 1.0
    assert float(metrics["skipped_updates"]) < 8.0  # first mb always applies
    p1 = jax.tree_util.tree_leaves(ts.params)
    assert any((np.asarray(a) != np.asarray(b)).any() for a, b in zip(p0, p1))
    assert np.isfinite(float(metrics["loss"]))


def test_squashed_action_head():
    """--squash-actions: env actions are inside the box by construction,
    the log-det correction matches the numerical change of variables, and
    a train step runs finite."""
    # logp correction vs numerical jacobian for the tanh+affine map.
    u = jnp.asarray([[0.3, -1.2, 2.0], [0.0, 0.5, -0.7]])
    mean = jnp.zeros((2, 3))
    log_std = jnp.full((2, 3), -0.5)
    lp = ppo._logp_squashed(mean, log_std, u)
    # d a / d u = diag(s_i * (1 - tanh(u_i)^2)), s = (1, 1/2, 1/2); the
    # implementation omits the constant log s (cancels in PPO ratios), so
    # compare against logp_u - sum log(1 - tanh(u)^2).
    expect = ppo._logp_gauss(mean, log_std, u) - jnp.log(
        1.0 - jnp.tanh(u) ** 2
    ).sum(-1)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(expect), rtol=1e-5)

    env_cfg = C.EnvConfig(num_agents=1, velocity_iters=4, position_iters=2)
    ppo_cfg = ppo.PPOConfig(
        rollout_len=4, num_envs=4, pool_size=2, minibatches=2, epochs=1,
        squash_actions=True,
    )
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    train_step = jax.jit(ppo.make_train_step(env_cfg, ppo_cfg))
    ts, metrics = train_step(ts)
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree_util.tree_leaves(ts.params):
        assert bool(jnp.isfinite(leaf).all())
    # squash maps any u into the action box exactly.
    a = ppo.squash_env_action(jnp.asarray([[5.0, -5.0, 0.1]]))
    a = np.asarray(a)
    assert -1 <= a[0, 0] <= 1 and 0 <= a[0, 1] <= 1 and 0 <= a[0, 2] <= 1
