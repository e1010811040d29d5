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
    print("tpu_checks ok")


if __name__ == "__main__":
    main()
