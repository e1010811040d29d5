"""Differential tests: fused Pallas solver (physics/pallas_world.py) vs the
XLA solver (physics/world.py) it mirrors. Run in the Pallas interpreter on
the CPU test mesh; the same kernel compiles via Mosaic on TPU (verified on
hardware: max deviation 2e-11 at 4096x2 envs).

Reduced iteration counts keep the interpreter fast; the iteration structure
(interleaved contacts, limit-state transitions, warm starting) is identical
at any count."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_car_racing_tpu import config as C, env as tenv, seeding
from multi_car_racing_tpu.physics import collide, tire, world, pallas_world

VI, PI = 30, 12


def _batched_state(num_agents, n_envs, steps=10, gas=0.8, steer=0.3):
    cfg = C.EnvConfig(num_agents=num_agents, velocity_iters=VI,
                      position_iters=PI, solver="xla")
    states = [
        tenv.host_reset(cfg, seed=s, global_stream=seeding.GlobalStream(s))[0]
        for s in range(n_envs)
    ]
    st = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    step = jax.jit(jax.vmap(partial(tenv.step, cfg)))
    a = jnp.tile(
        jnp.asarray([[steer, gas, 0.0]], jnp.float32), (n_envs, num_agents, 1)
    )
    for _ in range(steps):
        st, _, _ = step(st, a)
    return st


def _solve_both(st, n):
    cars, force, motor, _ = jax.vmap(tire.tire_step)(st.cars, st.wheel_on_road)
    if n > 1:
        man = jax.vmap(lambda c: collide.collide(c, n))(cars)
        bundle = jax.vmap(lambda m, cs, c: collide.make_bundle(m, cs, c, n))(
            man, st.contacts, cars
        )
        ref_cars, ref_bundle = jax.vmap(
            lambda c, f, m, b: world.world_step(
                c, f, m, velocity_iters=VI, position_iters=PI, contacts=b
            )
        )(cars, force, motor, bundle)
        ref_imp = (ref_bundle.normal_imp, ref_bundle.tangent_imp)
    else:
        bundle = None
        ref_cars = jax.vmap(
            lambda c, f, m: world.world_step(
                c, f, m, velocity_iters=VI, position_iters=PI
            )
        )(cars, force, motor)
        ref_imp = None
    pal_cars, pal_imp = pallas_world.world_step_batched(
        cars, force, motor, bundle, n,
        velocity_iters=VI, position_iters=PI, interpret=True,
    )
    return ref_cars, ref_imp, pal_cars, pal_imp


def _assert_close(name, a, b, tol=5e-4):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(1.0, float(np.abs(a).max()))
    d = float(np.abs(a - b).max())
    assert d <= tol * scale, f"{name}: maxabs {d} (scale {scale})"


FIELDS = ("hull_c", "hull_a", "hull_v", "hull_w", "wheel_c", "wheel_a",
          "wheel_v", "wheel_w", "joint_impulse", "motor_impulse")


def test_kernel_matches_xla_joints_only():
    st = _batched_state(num_agents=1, n_envs=4, steps=12)
    ref_cars, _, pal_cars, _ = _solve_both(st, 1)
    for f in FIELDS:
        _assert_close(f, getattr(ref_cars, f), getattr(pal_cars, f))
    assert bool((ref_cars.limit_state == pal_cars.limit_state).all())


def test_kernel_matches_xla_with_contacts():
    # The rear-end ram from test_collide: by step ~110 the two cars' hulls
    # are in persistent contact with warm-started impulses.
    N = 4
    cfg = C.EnvConfig(num_agents=N, velocity_iters=VI, position_iters=PI,
                      solver="xla")
    state, _ = tenv.host_reset(cfg, seed=11, global_stream=seeding.GlobalStream(5))
    gs = seeding.GlobalStream(5)
    gs.direction()
    order = list(gs.car_order(N))
    acts = np.zeros((N, 3), np.float32)
    acts[order.index(2)] = [0.0, 1.0, 0.0]
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(110):
        state, _, _ = step(state, jnp.asarray(acts))
    st = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), state)

    ref_cars, ref_imp, pal_cars, pal_imp = _solve_both(st, N)
    assert float(jnp.abs(ref_imp[0]).max()) > 0.1, "setup produced no contact"
    for f in FIELDS:
        _assert_close(f, getattr(ref_cars, f), getattr(pal_cars, f))
    _assert_close("normal_imp", ref_imp[0], pal_imp[0])
    _assert_close("tangent_imp", ref_imp[1], pal_imp[1])


def test_mega_kernel_matches_xla_pipeline_with_contacts():
    """step_physics_batched (tire + Collide + solve fused) vs the XLA
    pipeline, on a state with live car-car contacts."""
    N = 4
    cfg = C.EnvConfig(num_agents=N, velocity_iters=VI, position_iters=PI,
                      solver="xla")
    state, _ = tenv.host_reset(cfg, seed=11, global_stream=seeding.GlobalStream(5))
    gs = seeding.GlobalStream(5)
    gs.direction()
    order = list(gs.car_order(N))
    acts = np.zeros((N, 3), np.float32)
    acts[order.index(2)] = [0.0, 1.0, 0.0]
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(110):
        state, _, _ = step(state, jnp.asarray(acts))
    st = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), state)

    def xla_pipeline(cars, onroad, cs):
        cars2, force, motor, skid = tire.tire_step(cars, onroad)
        man = collide.collide(cars2, N)
        bundle = collide.make_bundle(man, cs, cars2, N)
        new_cars, new_bundle = world.world_step(
            cars2, force, motor, velocity_iters=VI, position_iters=PI,
            contacts=bundle,
        )
        return new_cars, skid, (new_bundle.normal_imp, new_bundle.tangent_imp,
                                man.ids)

    ref_cars, ref_skid, ref_cs = jax.vmap(xla_pipeline)(
        st.cars, st.wheel_on_road, st.contacts
    )
    pal_cars, pal_skid, pal_cs = pallas_world.step_physics_batched(
        st.cars, st.wheel_on_road, st.contacts, N,
        velocity_iters=VI, position_iters=PI, interpret=True,
    )
    assert float(jnp.abs(ref_cs[0]).max()) > 0.1, "setup produced no contact"
    for f in FIELDS + ("spin", "phase", "fuel_spent"):
        _assert_close(f, getattr(ref_cars, f), getattr(pal_cars, f))
    assert bool((ref_skid == pal_skid).all())
    assert bool((ref_cs[2] == pal_cs.ids).all()), "manifold ids differ"
    _assert_close("normal_imp", ref_cs[0], pal_cs.normal_imp)
    _assert_close("tangent_imp", ref_cs[1], pal_cs.tangent_imp)


def test_solver_dispatch_reward_parity():
    """Full env steps: solver='pallas' (interpreted) must produce the exact
    same rewards/done as solver='xla' through the custom_vmap dispatch."""
    E = 3
    rewards = {}
    for solver in ("xla", "pallas"):
        cfg = C.EnvConfig(num_agents=2, velocity_iters=VI, position_iters=PI,
                          solver=solver)
        states = [
            tenv.host_reset(cfg, seed=s, global_stream=seeding.GlobalStream(s))[0]
            for s in range(E)
        ]
        st = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
        step = jax.jit(jax.vmap(partial(tenv.step, cfg)))
        a = jnp.tile(jnp.asarray([[0.2, 0.7, 0.0]], jnp.float32), (E, 2, 1))
        acc = []
        for _ in range(8):
            st, r, d = step(st, a)
            acc.append(np.asarray(r))
        rewards[solver] = np.stack(acc)
    np.testing.assert_allclose(rewards["xla"], rewards["pallas"], atol=1e-5)


def _near_host(cars, n):
    """Host reference for the AABB broadphase (loose check only)."""
    import numpy as np
    return np.asarray(pallas_world.near_flags(cars, n))


def test_partition_far_apart_exact():
    """Spawn-grid states (cars ~6 m apart, AABBs disjoint): the partition
    fast path (joints-only + padded sub-batch scatter) must equal the full
    kernel bit-for-bit."""
    st = _batched_state(2, 4, steps=3, gas=0.4, steer=0.0)
    assert not _near_host(st.cars, 2).any(), "setup: AABBs overlap at spawn"
    full = pallas_world.step_physics_batched(
        st.cars, st.wheel_on_road, st.contacts, 2,
        velocity_iters=VI, position_iters=PI, interpret=True)
    part = pallas_world.step_physics_batched(
        st.cars, st.wheel_on_road, st.contacts, 2,
        velocity_iters=VI, position_iters=PI, interpret=True,
        partition_cap=2)
    # Tight-but-not-bitwise: CPU interpret evaluates transcendentals with
    # SIMD/tail-lane ULP wobble across array widths (on TPU the paths are
    # lane-uniform); logic equality is what is being pinned here.
    for f in FIELDS + ("spin", "phase", "fuel_spent"):
        _assert_close(f, getattr(full[0], f), getattr(part[0], f), tol=1e-6)
    assert bool((full[1] == part[1]).all())
    assert bool((full[2].ids == part[2].ids).all())
    _assert_close("normal_imp", full[2].normal_imp, part[2].normal_imp, tol=1e-6)
    _assert_close("tangent_imp", full[2].tangent_imp, part[2].tangent_imp, tol=1e-6)


def _touching_state(N=4):
    cfg = C.EnvConfig(num_agents=N, velocity_iters=VI, position_iters=PI,
                      solver="xla")
    state, _ = tenv.host_reset(cfg, seed=11, global_stream=seeding.GlobalStream(5))
    gs = seeding.GlobalStream(5)
    gs.direction()
    order = list(gs.car_order(N))
    acts = np.zeros((N, 3), np.float32)
    acts[order.index(2)] = [0.0, 1.0, 0.0]
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(110):
        state, _, _ = step(state, jnp.asarray(acts))
    return state


def test_partition_mixed_and_overflow_exact():
    """One touching env + far envs: fast path (cap covers the near envs)
    and the cap-overflow lax.cond fallback must both equal the full
    kernel."""
    N = 4
    touch = _touching_state(N)
    far = _batched_state(N, 1, steps=3, gas=0.4, steer=0.0)
    far1 = jax.tree_util.tree_map(lambda x: x[0], far)
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b, b]), touch, far1
    )
    near = _near_host(st.cars, N)
    assert near[0] and not near[1:].any(), "setup: expected [near, far, far]"
    full = pallas_world.step_physics_batched(
        st.cars, st.wheel_on_road, st.contacts, N,
        velocity_iters=VI, position_iters=PI, interpret=True)
    assert float(jnp.abs(full[2].normal_imp[0]).max()) > 0.1, "no contact"
    for cap in (1, 2):   # cap=1: near env exactly fills the sub-batch;
        part = pallas_world.step_physics_batched(
            st.cars, st.wheel_on_road, st.contacts, N,
            velocity_iters=VI, position_iters=PI, interpret=True,
            partition_cap=cap)
        for f in FIELDS + ("spin", "phase", "fuel_spent"):
            _assert_close(f, getattr(full[0], f), getattr(part[0], f),
                          tol=1e-6)
        assert bool((full[2].ids == part[2].ids).all())
        _assert_close("normal_imp", full[2].normal_imp, part[2].normal_imp,
                      tol=1e-6)


def test_joints_flat_layout_exact():
    """Full-sublane flat layout of the joints-only kernel (round-5 solver
    layout work): pure relayout, must equal the (N, E)-plane layout
    BIT-exactly — same arithmetic at different vreg positions — for both
    the N=1 solver and the partition's joints-only base."""
    import os

    for N, E in ((1, 8), (2, 4)):
        st = _batched_state(N, E, steps=3, gas=0.5, steer=0.1)
        kw = dict(velocity_iters=VI, position_iters=PI, interpret=True)
        os.environ["MCR_JOINTS_FLAT"] = "0"
        try:
            base = pallas_world.step_physics_batched(
                st.cars, st.wheel_on_road, st.contacts, N,
                force_no_contacts=True, **kw)
        finally:
            os.environ.pop("MCR_JOINTS_FLAT")
        flat = pallas_world.step_physics_batched(
            st.cars, st.wheel_on_road, st.contacts, N,
            force_no_contacts=True, **kw)
        for f in FIELDS + ("spin", "phase", "fuel_spent"):
            a, b = np.asarray(getattr(base[0], f)), np.asarray(getattr(flat[0], f))
            np.testing.assert_array_equal(a, b, err_msg=f"{N=} {f}")
        np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(flat[1]))


def test_partition_second_tier_exact():
    """Dual-cap partition (round 5, policy-workload cliff): a near count
    that overflows cap1 but fits cap2 must route through the second-tier
    partition and equal the full kernel; overflowing both falls back."""
    N = 4
    touch = _touching_state(N)
    far = _batched_state(N, 1, steps=3, gas=0.4, steer=0.0)
    far1 = jax.tree_util.tree_map(lambda x: x[0], far)
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, a, b, b]), touch, far1
    )
    near = _near_host(st.cars, N)
    assert near[0] and near[1] and not near[2:].any()
    full = pallas_world.step_physics_batched(
        st.cars, st.wheel_on_road, st.contacts, N,
        velocity_iters=VI, position_iters=PI, interpret=True)
    for cap1, cap2 in ((1, 2), (1, 3), (1, 0)):  # tier-2 exact fit, padded,
        part = pallas_world.step_physics_batched(  # and both-overflow
            st.cars, st.wheel_on_road, st.contacts, N,
            velocity_iters=VI, position_iters=PI, interpret=True,
            partition_cap=cap1, partition_cap2=cap2)
        # 5e-5: CPU interpret's SIMD tail-lane transcendental wobble across
        # the differing sub-batch widths, amplified through the 28-iteration
        # contact solve of TWO touching envs (the single-near-env test above
        # holds 1e-6); TPU lane-uniform agreement is pinned by
        # scripts/tpu_checks.py.
        for f in FIELDS + ("spin", "phase", "fuel_spent"):
            _assert_close(f, getattr(full[0], f), getattr(part[0], f),
                          tol=5e-5)
        assert bool((full[2].ids == part[2].ids).all())
        _assert_close("normal_imp", full[2].normal_imp, part[2].normal_imp,
                      tol=5e-5)


def test_degenerate_multipoint_contact_converges():
    """Regression fixture for the round-4 NaN: a head-on 2-car state with 5
    simultaneous contact points across several fixture-pair manifolds. On
    TPU, default-precision MXU routing truncated world positions to bf16
    (~1 m error on 1.5 m lever arms), corrupting the effective masses until
    the contact Gauss-Seidel diverged x2/iteration to NaN (every 2-agent
    training run died this way). The fix pins the position-carrying dots to
    exact routing (_dot HIGHEST / delta-based position loop). This CPU test
    guards the solve-core algebra on that state: the fused kernel must stay
    finite, converge to bounded impulses, and agree with the XLA pipeline.
    The TPU-compiled counterpart is scripts/tpu_checks.py (CPU interpret
    math was never wrong, so only hardware runs can catch the bf16 leg)."""
    import pickle
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "contact_divergence_state.pkl")
    with open(path, "rb") as f:
        st_np, action = pickle.load(f)
    st = jax.tree_util.tree_map(jnp.asarray, st_np)
    from multi_car_racing_tpu.physics import state as pstate

    cars = pstate.apply_controls(st.cars, jnp.asarray(action))
    carsb = jax.tree_util.tree_map(lambda x: x[None], cars)
    lag = st.wheel_on_road[None]
    cs = jax.tree_util.tree_map(lambda x: x[None], st.contacts)
    # Full reference iteration counts — the divergence grew with iterations.
    new_cars, skid, new_cs = pallas_world.step_physics_batched(
        carsb, lag, cs, 2, velocity_iters=180, position_iters=60,
        interpret=True)
    for leaf in jax.tree_util.tree_leaves(new_cars):
        assert bool(jnp.isfinite(leaf).all())
    ni = np.asarray(new_cs.normal_imp)
    assert np.isfinite(ni).all() and np.abs(ni).max() < 100.0, (
        f"contact impulses should stay bounded, got {np.abs(ni).max()}")

    # XLA pipeline on the same state: gross agreement (the two formulations
    # are Jacobi-subpass vs sequential; this contact state is chaotic).
    c2, force, motor, _ = tire.tire_step(cars, st.wheel_on_road)
    man = collide.collide(c2, 2)
    bundle = collide.make_bundle(man, st.contacts, c2, 2)
    ref_cars, _ = world.world_step(
        c2, force, motor, velocity_iters=180, position_iters=60,
        contacts=bundle)
    d = np.abs(np.asarray(ref_cars.hull_c) - np.asarray(new_cars.hull_c[0]))
    assert d.max() < 0.5, f"hull positions drifted {d.max()} from XLA"


def _place_car_y(st, env_i, car_i, ref_car, gap, sign=1):
    """Rigid-translate car `car_i` of env `env_i` so its world hull AABB
    sits `gap` metres beyond `ref_car`'s along world +/-y (x centers
    aligned). AABB x-overlap is total, y-gap = gap: gap < broadphase
    slack (0.1) makes the pair broadphase-NEAR, while gap > the polygon
    skin keeps every fixture geometrically separated (hulls/wheels are
    inside their AABBs) — zero contact points, so the pair's solve is an
    algebraic no-op. Wheel AABBs can stick ~0.1 m out of the hull AABB in
    x only, never y, so stacking along y is contact-safe."""
    import numpy as np
    cars = st.cars
    mid = np.asarray(pallas_world._HULL_AABB_MID)
    half = np.asarray(pallas_world._HULL_AABB_HALF)

    def aabb(ei, ci):
        a = float(cars.hull_a[ei, ci])
        c, s = np.cos(a), np.sin(a)
        cx = float(cars.hull_c[ei, ci, 0]) + c * mid[0] - s * mid[1]
        cy = float(cars.hull_c[ei, ci, 1]) + s * mid[0] + c * mid[1]
        hy = abs(s) * half[0] + abs(c) * half[1]
        return cx, cy, hy

    rx, ry, rhy = aabb(env_i, ref_car)
    mx, my, mhy = aabb(env_i, car_i)
    delta = jnp.asarray(
        [rx - mx, ry + sign * (rhy + mhy + gap) - my], jnp.float32)
    cars = cars.replace(
        hull_c=cars.hull_c.at[env_i, car_i].add(delta),
        wheel_c=cars.wheel_c.at[env_i, car_i].add(delta[None, :]),
    )
    return st.replace(cars=cars)


def _check_pair_partition(st, N, configs, expect_contact):
    full = pallas_world.step_physics_batched(
        st.cars, st.wheel_on_road, st.contacts, N,
        velocity_iters=VI, position_iters=PI, interpret=True)
    if expect_contact:
        assert float(jnp.abs(full[2].normal_imp).max()) > 0.1, "no contact"
    for pcap, ccap in configs:
        part = pallas_world.step_physics_batched(
            st.cars, st.wheel_on_road, st.contacts, N,
            velocity_iters=VI, position_iters=PI, interpret=True,
            pair_partition_cap=pcap, coupled_cap=ccap)
        for f in FIELDS + ("spin", "phase", "fuel_spent"):
            _assert_close(f, getattr(full[0], f), getattr(part[0], f),
                          tol=1e-6)
        assert bool((full[1] == part[1]).all())
        assert bool((full[2].ids == part[2].ids).all())
        _assert_close("normal_imp", full[2].normal_imp, part[2].normal_imp,
                      tol=1e-6)
        _assert_close("tangent_imp", full[2].tangent_imp,
                      part[2].tangent_imp, tol=1e-6)


def _exile_car(st, env_i, car_i, dx, dy):
    """Rigid-translate a car to an absolute offset (out of everyone's
    broadphase range)."""
    delta = jnp.asarray([dx, dy], jnp.float32)
    cars = st.cars
    cars = cars.replace(
        hull_c=cars.hull_c.at[env_i, car_i].add(delta),
        wheel_c=cars.wheel_c.at[env_i, car_i].add(delta[None, :]),
    )
    return st.replace(cars=cars)


def test_pair_partition_routing_exact():
    """PAIR-level partition (N=4), broadphase-near but geometrically
    separated placements: simple pairs, a coupled env, disjoint double
    pairs, a far env — the fast path (joints base + 2-car pair kernel +
    compact coupled kernel) and both overflow fallbacks must equal the
    full kernel."""
    N = 4
    st = _batched_state(N, 4, steps=3, gas=0.4, steer=0.0)
    # env0: one near pair (0,1). env1: coupled — car 0 near 1 AND 2.
    # env2: two vertex-disjoint near pairs (0,1), (2,3). env3: far.
    # Non-participating cars are exiled to controlled far corners first
    # (the spawn grid staggers cars along the track, so a car placed next
    # to another can otherwise land in a third car's broadphase range).
    st = _exile_car(st, 0, 2, 500.0, 500.0)
    st = _exile_car(st, 0, 3, -500.0, -500.0)
    st = _place_car_y(st, 0, 1, 0, 0.05)
    st = _exile_car(st, 1, 3, 500.0, 500.0)
    st = _place_car_y(st, 1, 1, 0, 0.05, sign=1)
    st = _place_car_y(st, 1, 2, 0, 0.05, sign=-1)
    st = _exile_car(st, 2, 2, 500.0, 500.0)
    st = _place_car_y(st, 2, 1, 0, 0.05)
    st = _place_car_y(st, 2, 3, 2, 0.05)
    pn = np.asarray(pallas_world.near_flags(st.cars, N, per_pair=True))
    pairs = collide.car_pairs(N)
    assert pn[0, pairs.index((0, 1))] and pn[0].sum() == 1, pn[0]
    assert (pn[1, pairs.index((0, 1))] and pn[1, pairs.index((0, 2))]
            and pn[1].sum() == 2), pn[1]
    assert (pn[2, pairs.index((0, 1))] and pn[2, pairs.index((2, 3))]
            and pn[2].sum() == 2), pn[2]
    assert not pn[3].any(), pn[3]
    # (pcap, ccap): exact fit; slack; pair overflow; coupled overflow.
    _check_pair_partition(
        st, N, [(3, 1), (8, 2), (2, 1), (3, 1)], expect_contact=False)


def test_pair_partition_contact_exact():
    """PAIR-level partition on a REAL contact (the ramming fixture of
    test_partition_mixed_and_overflow_exact): the touching env's near
    pair(s) carry nonzero impulses through whichever sub-kernel the
    classification routes them to, and must match the full kernel."""
    N = 4
    touch = _touching_state(N)
    far = _batched_state(N, 1, steps=3, gas=0.4, steer=0.0)
    far1 = jax.tree_util.tree_map(lambda x: x[0], far)
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b, b]), touch, far1
    )
    pn = np.asarray(pallas_world.near_flags(st.cars, N, per_pair=True))
    assert pn[0].any() and not pn[1:].any(), pn
    _check_pair_partition(st, N, [(6, 1), (1, 1)], expect_contact=True)
