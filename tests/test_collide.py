"""Car-car collision tests vs the reference (tolerance-band: contact events
are chaotic, SURVEY.md §7.1 — assert impulse-scale agreement, not bit parity)."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from multi_car_racing_tpu import config as C, env as tenv, seeding


def _setup(N=4, seed=11, gseed=5):
    from multi_car_racing_tpu.oracle import shims

    Env, _ = shims.load_reference_env_class()
    env = Env(num_agents=N, verbose=0)
    env.seed(seed)
    np.random.seed(gseed)
    env.reset()
    order = [env.car_order[i] for i in range(N)]
    rear, front = order.index(2), order.index(0)
    return env, order, rear, front


def test_rear_end_collision_matches_reference():
    N = 4
    env, order, rear, front = _setup(N)
    acts = np.zeros((N, 3))
    acts[rear] = [0.0, 1.0, 0.0]

    for _ in range(120):
        env.step(acts)
    ref_front = np.array(env.cars[front].hull.position)
    ref_front_v = np.linalg.norm(env.cars[front].hull.linearVelocity)

    cfg = C.EnvConfig(num_agents=N)
    state, _ = tenv.host_reset(cfg, seed=11, global_stream=seeding.GlobalStream(5))
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(120):
        state, _, _ = step(state, jnp.asarray(acts, jnp.float32))
    our_front = np.asarray(state.cars.hull_origin[front])
    our_front_v = float(jnp.linalg.norm(state.cars.hull_v[front]))

    # The stationary car must have been rammed and pushed in both engines.
    assert ref_front_v > 2.0 and our_front_v > 2.0
    # Post-impact positions: the crash is chaotic (float reduction-order
    # noise of ~1e-6 at the first impulse amplifies to meters within 80
    # steps — measured across solver-internal reorderings), so assert the
    # displacement scale, not the trajectory.
    assert np.linalg.norm(our_front - ref_front) < 25.0
    ref_disp = np.linalg.norm(ref_front - np.array([221.73, -52.66]))
    our_disp = np.linalg.norm(our_front - np.array([221.73, -52.66]))
    assert 0.3 < our_disp / max(ref_disp, 1e-6) < 3.0


def test_first_impact_velocity_parity():
    """VERDICT round-1 #4: the pre-chaos window must match tightly.

    Rear car rams the stationary front car (mcr:428 solve). Both engines must
    register first contact on the SAME step, and the first impulse must give
    float-tight velocity agreement across all cars (measured 1.6e-3 on
    ~19 m/s). From the next step the cars stay in multi-point sliding
    contact and solver reduction-order noise re-amplifies (measured ~1.3 m/s
    by k=1) — asserted only at impulse scale."""
    N = 4
    env, order, rear, front = _setup(N)
    acts = np.zeros((N, 3))
    acts[rear] = [0.0, 1.0, 0.0]

    ref_vel = []
    for _ in range(60):
        env.step(acts)
        ref_vel.append((
            np.array([np.asarray(c.hull.linearVelocity) for c in env.cars]),
            np.array([c.hull.angularVelocity for c in env.cars]),
        ))
    ref_imp = next(
        t for t, (v, w) in enumerate(ref_vel)
        if np.linalg.norm(v[front]) > 1e-4
    )

    cfg = C.EnvConfig(num_agents=N)
    state, _ = tenv.host_reset(cfg, seed=11, global_stream=seeding.GlobalStream(5))
    step = jax.jit(partial(tenv.step, cfg))
    our_vel = []
    for _ in range(60):
        state, _, _ = step(state, jnp.asarray(acts, jnp.float32))
        our_vel.append(
            (np.asarray(state.cars.hull_v), np.asarray(state.cars.hull_w))
        )
    our_imp = next(
        t for t, (v, w) in enumerate(our_vel)
        if np.linalg.norm(v[front]) > 1e-4
    )

    assert ref_imp == our_imp, (ref_imp, our_imp)
    # k=0: the first contact impulse, all cars, linear + angular.
    np.testing.assert_allclose(
        our_vel[our_imp][0], ref_vel[ref_imp][0], atol=5e-3
    )
    np.testing.assert_allclose(
        our_vel[our_imp][1], ref_vel[ref_imp][1], atol=2e-3
    )
    # k=1: sustained contact — impulse-scale agreement only.
    np.testing.assert_allclose(
        our_vel[our_imp + 1][0], ref_vel[ref_imp + 1][0], atol=2.5
    )


def test_no_contact_forces_at_spawn():
    """Side-by-side spawn (6 m apart): contacts must do nothing."""
    cfg = C.EnvConfig(num_agents=2)
    state, _ = tenv.host_reset(cfg, seed=3, global_stream=seeding.GlobalStream(3))
    step = jax.jit(partial(tenv.step, cfg))
    s = state
    for _ in range(10):
        s, r, d = step(s, jnp.zeros((2, 3)))
    # No impulses accumulated, cars at rest.
    assert float(jnp.abs(s.contacts.normal_imp).max()) == 0.0
    assert float(jnp.linalg.norm(s.cars.hull_v, axis=-1).max()) < 1e-3


def test_cars_do_not_interpenetrate():
    """Ram hard for a long time: solver must keep hull centers separated by
    at least roughly a car length (no tunnelling)."""
    N = 4
    cfg = C.EnvConfig(num_agents=N)
    state, _ = tenv.host_reset(cfg, seed=11, global_stream=seeding.GlobalStream(5))
    order = None
    # Identify rear/front like the reference test (order from same streams).
    gs = seeding.GlobalStream(5)
    gs.direction()
    order = list(gs.car_order(N))
    rear, front = order.index(2), order.index(0)
    acts = np.zeros((N, 3))
    acts[rear] = [0.0, 1.0, 0.0]
    step = jax.jit(partial(tenv.step, cfg))
    for _ in range(200):
        state, _, _ = step(state, jnp.asarray(acts, jnp.float32))
    d = float(
        jnp.linalg.norm(
            state.cars.hull_origin[rear] - state.cars.hull_origin[front]
        )
    )
    assert d > 2.0, f"cars interpenetrated: {d:.2f} m apart"


def test_manifold_matches_box2d_random_poses():
    """Differential test of `_collide_pair` vs Box2D's b2CollidePolygons over
    random overlapping poses of the real car fixtures — normals, contact
    counts, points, and separations must agree (covers the closing-edge
    reference-face case, where naive last-vertex padding degenerates)."""
    import Box2D
    from Box2D import b2PolygonShape, b2Transform, b2Manifold, b2WorldManifold

    from multi_car_racing_tpu.physics import collide as pc, shapes

    rng = np.random.RandomState(7)
    checked = 0
    for trial in range(3000):
        fa, fb = rng.randint(0, 8), rng.randint(0, 8)
        na_, nb_ = shapes.CAR_FIXTURE_NVERTS[fa], shapes.CAR_FIXTURE_NVERTS[fb]
        va_loc = shapes.CAR_FIXTURE_VERTS[fa][:na_]
        vb_loc = shapes.CAR_FIXTURE_VERTS[fb][:nb_]
        scale = np.max(np.abs(va_loc)) + np.max(np.abs(vb_loc))
        ang_a, ang_b = rng.uniform(-np.pi, np.pi, 2)
        off = rng.uniform(-0.6, 0.6, 2) * scale

        def xf(ang, pos):
            t = b2Transform()
            t.Set((float(pos[0]), float(pos[1])), float(ang))
            return t

        pa = b2PolygonShape(vertices=[tuple(map(float, v)) for v in va_loc])
        pb = b2PolygonShape(vertices=[tuple(map(float, v)) for v in vb_loc])
        xfa, xfb = xf(ang_a, (0, 0)), xf(ang_b, off)
        m = b2Manifold()
        Box2D.b2CollidePolygons(m, pa, xfa, pb, xfb)

        def world(verts, normals, ang, pos):
            c, s = np.cos(ang), np.sin(ang)
            R = np.array([[c, -s], [s, c]])
            return verts @ R.T + pos, normals @ R.T

        wa_v, wa_n = world(
            shapes.CAR_FIXTURE_VERTS[fa], shapes.CAR_FIXTURE_NORMALS[fa],
            ang_a, (0.0, 0.0),
        )
        wb_v, wb_n = world(
            shapes.CAR_FIXTURE_VERTS[fb], shapes.CAR_FIXTURE_NORMALS[fb],
            ang_b, off,
        )
        normal, pts, seps, ok, _ = jax.device_get(
            pc._collide_pair(
                jnp.asarray(wa_v, jnp.float32), jnp.asarray(wa_n, jnp.float32),
                jnp.asarray(wb_v, jnp.float32), jnp.asarray(wb_n, jnp.float32),
            )
        )
        ours_n = int(ok.sum())
        if m.pointCount == 0 and ours_n == 0:
            continue
        # Near-touching configurations can differ (GJK skin vs SAT margin);
        # only compare when Box2D reports clear overlap.
        wm = b2WorldManifold()
        wm.Initialize(m, xfa, pa.radius, xfb, pb.radius)
        # Deep penetration: Box2D 2.3.5's hill-climbing b2FindMaxSeparation
        # can settle on a different near-tied face than brute-force SAT (and
        # clipping then differs wholesale); the position solver keeps real
        # contacts shallow, so compare strictly only there.
        depth = float(np.max(np.abs(seps[ok]))) if ours_n else 0.0
        if depth > 0.05 * scale:
            continue
        if m.pointCount != ours_n:
            # Allow disagreement only at the contact margin (|sep| tiny).
            # A point whose separation sits within the polygon-skin band of
            # the keep cutoff (sep <= 2*b2_polygonRadius) is margin-ambiguous
            # between the two clippers.
            near = np.min(np.abs(seps[ok])) if ours_n else 0.0
            assert near < 2.5e-2 or m.pointCount == 0, (
                f"trial {trial}: count {ours_n} vs box2d {m.pointCount}, "
                f"seps {seps[ok]}"
            )
            continue
        checked += 1
        ref_normal = np.array(tuple(wm.normal))
        # Adjacent near-parallel hull faces can tie for max separation; allow
        # sub-degree-scale disagreement in the face pick.
        assert float(normal @ ref_normal) > 0.9995, (
            f"trial {trial}: normal {normal} vs {ref_normal}"
        )
        ref_pts = np.array([tuple(p) for p in wm.points[: m.pointCount]])
        our_pts = pts[ok]
        # b2WorldManifold points are overlap midpoints: they sit up to
        # |separation|/2 along the normal from our clip points (which lie on
        # the incident face). Compare tangentially tight, normally within the
        # penetration depth.
        tangent = np.array([ref_normal[1], -ref_normal[0]])
        max_pen = float(np.max(np.abs(seps[ok]))) if ours_n else 0.0
        for rp in ref_pts:
            d = our_pts - rp
            i = int(np.argmin(np.linalg.norm(d, axis=-1)))
            dt_ = abs(float(d[i] @ tangent))
            dn_ = abs(float(d[i] @ ref_normal))
            assert dt_ < 0.03 * scale + 0.03, (
                f"trial {trial}: tangential mismatch {dt_} (ours {our_pts}, ref {rp})"
            )
            assert dn_ < max_pen + 0.05, (
                f"trial {trial}: normal mismatch {dn_} > pen {max_pen}"
            )
    assert checked >= 60, f"only {checked} overlapping configurations tested"
