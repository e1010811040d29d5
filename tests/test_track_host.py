"""Host track generator: bit-parity vs the reference + structural invariants."""

import numpy as np
import pytest

from multi_car_racing_tpu import config as C
from multi_car_racing_tpu import seeding
from multi_car_racing_tpu.track import common, host

SEEDS = [0, 1, 2, 3, 42, 123, 999, 31337]


@pytest.fixture(scope="module")
def reference_env():
    from multi_car_racing_tpu.oracle import shims

    Env, _ = shims.load_reference_env_class()
    return Env(num_agents=2, verbose=0)


@pytest.mark.parametrize("seed", SEEDS)
def test_track_bit_parity_vs_reference(reference_env, seed):
    env = reference_env
    env.seed(seed)
    np.random.seed(7)
    env.reset()
    ref_track = np.asarray(env.track)

    rng, _ = seeding.np_random(seed)
    pts, border, _ = host.generate_track(rng)

    assert pts.shape == ref_track.shape
    assert np.array_equal(pts, ref_track), "track walk must be bit-exact"

    # Curb marking parity: reference keeps border implicitly via road_poly
    # entries ((1,1,1) / (1,0,0) colors); count curb polys.
    n_curbs_ref = sum(
        1 for _, color in env.road_poly if tuple(color) in ((1, 1, 1), (1, 0, 0))
    )
    assert int(border.sum()) == n_curbs_ref


@pytest.mark.parametrize("seed", SEEDS[:4])
def test_tile_quads_match_reference_road_poly(reference_env, seed):
    env = reference_env
    env.seed(seed)
    np.random.seed(7)
    env.reset()

    rng, _ = seeding.np_random(seed)
    pts, border, _ = host.generate_track(rng)
    track = common.pack_track(pts, border, max_tiles=C.EnvConfig().max_tiles)

    T = int(track.n_tiles)
    # Reference road_poly interleaves tile quads and curb quads in tile order.
    ref_iter = iter(env.road_poly)
    for i in range(T):
        poly, color = next(ref_iter)
        np.testing.assert_allclose(
            np.asarray(track.quad[i]), np.asarray(poly, dtype=np.float32),
            rtol=0, atol=1e-4,
        )
        # Tile colors are mutable in the reference: any contact (including the
        # spawn-tile contacts that fire inside reset's step(None)) flattens the
        # dithered color to plain ROAD_COLOR (mcr:102-104). So the observed
        # color is either our color0 (untouched) or exactly ROAD_COLOR.
        ref_color = np.asarray(color, dtype=np.float32)
        ours = np.asarray(track.color0[i])
        flattened = np.asarray(C.ROAD_COLOR, dtype=np.float32)
        assert (
            np.allclose(ours, ref_color, atol=1e-6)
            or np.allclose(ref_color, flattened, atol=1e-6)
        ), (i, ours, ref_color)
        if bool(track.has_curb[i]):
            cpoly, ccolor = next(ref_iter)
            np.testing.assert_allclose(
                np.asarray(track.curb_quad[i]), np.asarray(cpoly, dtype=np.float32),
                rtol=0, atol=1e-4,
            )
            expected = (1, 0, 0) if bool(track.curb_red[i]) else (1, 1, 1)
            assert tuple(ccolor) == expected
    assert next(ref_iter, None) is None, "poly counts must match"


def test_track_size_range():
    sizes = []
    for seed in range(20):
        rng, _ = seeding.np_random(seed)
        pts, _, _ = host.generate_track(rng)
        sizes.append(len(pts))
    # Measured envelope: 251-341 tiles (SURVEY.md §6).
    assert min(sizes) >= 200 and max(sizes) <= C.EnvConfig().max_tiles


def test_spawn_positions_match_reference(reference_env, monkeypatch):
    # Note: hull.position after reset() differs slightly from the spawn args
    # because reset ends in step(None), where the revolute joints pull the
    # (unrotated-offset) wheels into place and shift the hull. So compare
    # against the recorded Car(...) creation arguments, not post-step state.
    import gym_multi_car_racing.multi_car_racing as mcr

    created = []
    real_car = mcr.car_dynamics.Car

    class RecordingCar(real_car):
        def __init__(self, world, angle, x, y):
            created.append((angle, x, y))
            super().__init__(world, angle, x, y)

    monkeypatch.setattr(mcr.car_dynamics, "Car", RecordingCar)

    env = reference_env
    for seed in SEEDS[:4]:
        created.clear()
        env.seed(seed)
        np.random.seed(seed + 100)
        env.reset()
        ref_pos = np.array([[c[1], c[2]] for c in created])
        ref_ang = np.array([c[0] for c in created])

        # Mirror the global-stream draws with the same global seed.
        gs = seeding.GlobalStream(seed + 100)
        direction = gs.direction()
        order = gs.car_order(2)
        assert direction == env.episode_direction
        assert [int(order[i]) for i in range(2)] == [env.car_order[i] for i in range(2)]

        rng, _ = seeding.np_random(seed)
        pts, border, _ = host.generate_track(rng)
        pos, ang = common.spawn_poses(
            pts[:, 2:4], pts[:, 1], len(pts), order, direction == "CW"
        )
        # Box2D stores positions as float32.
        np.testing.assert_allclose(pos, ref_pos, atol=1e-4)
        np.testing.assert_allclose(ang, ref_ang, atol=1e-5)


def test_native_trackgen_bit_exact_with_stream_continuation():
    """C++ generator == Python oracle bit-for-bit, including the MT19937
    stream state across consecutive episodes (the reference shares one
    RandomState across resets)."""
    from multi_car_racing_tpu import native

    if native.load() is None:
        import pytest

        pytest.skip(f"no native toolchain: {native.build_error()}")
    r1, _ = seeding.np_random(5)
    r2, _ = seeding.np_random(5)
    for _ in range(3):
        p1, b1, k1 = host.generate_track(r1)
        p2, b2, k2 = native.generate_track(r2)
        assert np.array_equal(p1, p2)
        assert np.array_equal(b1, b2)
        assert k1 == k2
    assert np.array_equal(r1.get_state()[1], r2.get_state()[1])
