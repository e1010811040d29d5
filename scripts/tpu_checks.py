"""Hardware-only physics checks (run on a real TPU; CI is CPU-interpret).

The CPU test suite runs every Pallas kernel in the interpreter, where all
float math is exact f32 — it can never see Mosaic-lowering effects like the
default MXU precision truncating dot operands to bf16. That exact gap hid
the round-4 contact-solver divergence (world positions routed at bf16 ->
~1 m lever-arm error -> Gauss-Seidel gain > 1 -> NaN) through three rounds
of green CI. This script drives the COMPILED kernel on the degenerate
fixture and asserts convergence + interpret agreement.

    python scripts/tpu_checks.py          # needs jax.devices() -> TPU
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    assert jax.default_backend() == "tpu", (
        f"this check needs real TPU hardware, got {jax.default_backend()}"
    )
    from multi_car_racing_tpu.physics import state as pstate, pallas_world

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "fixtures",
                        "contact_divergence_state.pkl")
    with open(path, "rb") as f:
        st_np, action = pickle.load(f)
    st = jax.tree_util.tree_map(jnp.asarray, st_np)
    cars = pstate.apply_controls(st.cars, jnp.asarray(action))
    carsb = jax.tree_util.tree_map(lambda x: x[None], cars)
    lag = st.wheel_on_road[None]
    cs = jax.tree_util.tree_map(lambda x: x[None], st.contacts)

    def run(interpret):
        return pallas_world.step_physics_batched(
            carsb, lag, cs, 2, velocity_iters=180, position_iters=60,
            interpret=interpret)

    comp_cars, _, comp_cs = run(interpret=False)
    for leaf in jax.tree_util.tree_leaves(comp_cars):
        assert bool(jnp.isfinite(leaf).all()), "compiled kernel NaN'd"
    ni = np.asarray(comp_cs.normal_imp)
    assert np.abs(ni).max() < 100.0, f"impulses diverged: {np.abs(ni).max()}"

    int_cars, _, _ = run(interpret=True)
    d = np.abs(np.asarray(int_cars.hull_c) - np.asarray(comp_cars.hull_c))
    print(f"compiled-vs-interpret hull_c max dev: {d.max():.2e}")
    assert d.max() < 0.05, (
        f"compiled kernel deviates {d.max()} from interpret — MXU routing "
        "precision regressed (see pallas_world._dot/_dot2)")

    _pair_partition_check()
    _joints_flat_check()
    print("tpu_checks ok")


def _joints_flat_check():
    """COMPILED full-sublane flat layout vs the (N, E)-plane layout of the
    joints-only kernel (round-5 solver layout work): a pure relayout must
    be bit-exact on hardware too — any deviation means Mosaic lowered the
    two layouts to different arithmetic."""
    from multi_car_racing_tpu import config as C, env as tenv, seeding
    from multi_car_racing_tpu.physics import pallas_world, state as pstate

    N, E = 2, 256
    cfg = C.EnvConfig(num_agents=N, solver="xla")
    states = [
        tenv.host_reset(cfg, seed=s, global_stream=seeding.GlobalStream(s))[0]
        for s in range(8)
    ]
    st = jax.tree_util.tree_map(
        lambda *xs: jnp.tile(jnp.stack(xs), (E // 8,) + (1,) * xs[0].ndim),
        *states,
    )
    a = jnp.tile(jnp.asarray([[0.3, 0.9, 0.0]], jnp.float32), (E, N, 1))
    cars = jax.vmap(pstate.apply_controls)(st.cars, a)

    def run():
        out = pallas_world.step_physics_batched(
            cars, st.wheel_on_road, st.contacts, N,
            velocity_iters=180, position_iters=60, interpret=False,
            force_no_contacts=True)
        return jax.block_until_ready(out)

    os.environ["MCR_JOINTS_FLAT"] = "0"
    try:
        base = run()
    finally:
        os.environ.pop("MCR_JOINTS_FLAT")
    flat = run()
    worst = 0.0
    for f in ("hull_c", "hull_a", "hull_v", "wheel_c", "wheel_v", "spin"):
        a_, b_ = np.asarray(getattr(base[0], f)), np.asarray(getattr(flat[0], f))
        worst = max(worst, float(np.abs(a_ - b_).max()))
    print(f"joints-flat compiled max dev vs plane layout: {worst:.2e}")
    assert worst == 0.0, (
        f"flat joints layout deviates {worst} from the plane layout on "
        "hardware — relayout is no longer a pure relayout")


def _pair_partition_check():
    """COMPILED pair-level partition (N=4) vs the compiled full kernel on a
    near-contact fixture: the routing/scatter logic must agree on hardware,
    not just in the interpreter (tests/test_pallas_world.py covers CPU)."""
    from functools import partial

    from multi_car_racing_tpu import config as C, env as tenv, seeding
    from multi_car_racing_tpu.physics import pallas_world

    N, E = 4, 8
    cfg = C.EnvConfig(num_agents=N, solver="xla")
    states = [
        tenv.host_reset(cfg, seed=s, global_stream=seeding.GlobalStream(s))[0]
        for s in range(E)
    ]
    st = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    step = jax.jit(jax.vmap(partial(tenv.step, cfg)))
    a = jnp.tile(jnp.asarray([[0.1, 0.8, 0.0]], jnp.float32), (E, N, 1))
    for _ in range(5):
        st, _, _ = step(st, a)
    cars = st.cars
    # Pull car 1 of envs 0..3 next to car 0 (near pair), car 2 of env 1
    # to car 0's other side (coupled env).
    for e in range(4):
        delta = cars.hull_c[e, 0] + jnp.asarray([0.0, 5.05]) - cars.hull_c[e, 1]
        cars = cars.replace(
            hull_c=cars.hull_c.at[e, 1].add(delta),
            wheel_c=cars.wheel_c.at[e, 1].add(delta[None, :]),
        )
    delta = cars.hull_c[1, 0] - jnp.asarray([0.0, 5.05]) - cars.hull_c[1, 2]
    cars = cars.replace(
        hull_c=cars.hull_c.at[1, 2].add(delta),
        wheel_c=cars.wheel_c.at[1, 2].add(delta[None, :]),
    )
    pn = np.asarray(pallas_world.near_flags(cars, N, per_pair=True))
    assert pn.any(), "fixture produced no near pairs"

    def run(**kw):
        return pallas_world.step_physics_batched(
            cars, st.wheel_on_road, st.contacts, N,
            velocity_iters=180, position_iters=60, interpret=False, **kw)

    full = run()
    part = run(pair_partition_cap=4, coupled_cap=2)
    d = 0.0
    for f in ("hull_c", "hull_a", "hull_v", "wheel_c", "wheel_v"):
        a_, b_ = np.asarray(getattr(full[0], f)), np.asarray(getattr(part[0], f))
        scale = max(1.0, np.abs(a_).max())
        d = max(d, float(np.abs(a_ - b_).max() / scale))
    di = float(np.abs(np.asarray(full[2].normal_imp)
                      - np.asarray(part[2].normal_imp)).max())
    print(f"pair-partition compiled max rel dev: {d:.2e} (imp {di:.2e})")
    assert d < 1e-5 and di < 1e-2, (
        f"compiled pair partition deviates from full kernel: {d} / {di}")


if __name__ == "__main__":
    main()
