"""Versioned golden-frame fixtures (VERDICT round-1 #7).

Each fixture in tests/fixtures/golden/ stores a frozen EnvState (pytree
leaves), the config kwargs, and the frame the oracle renderer produced when
the fixture was minted (scripts/make_golden_frames.py). All three
rasterizers must reproduce those pixels byte-for-byte — so a refactor can no
longer drift the oracle and production renderers together silently.

If a renderer change is INTENTIONAL, regenerate with
``python scripts/make_golden_frames.py`` and review the diff images.
"""

import glob
import json
import os
from functools import partial

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_car_racing_tpu import config as C, env as tenv, seeding
from multi_car_racing_tpu.render import raster, xla_raster

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))


def _load(path):
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    cfg = C.EnvConfig(**meta["cfg"])
    # Rebuild the pytree structure from a template state of the same config,
    # then substitute the frozen leaves. A structure mismatch means EnvState
    # changed shape — regenerate the fixtures (loudly).
    template, _ = tenv.host_reset(
        cfg, seed=0, global_stream=seeding.GlobalStream(0)
    )
    treedef = jax.tree_util.tree_structure(template)
    n = meta["n_leaves"]
    assert treedef.num_leaves == n, (
        f"EnvState structure changed ({treedef.num_leaves} leaves vs fixture "
        f"{n}) — regenerate tests/fixtures/golden via "
        f"scripts/make_golden_frames.py"
    )
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    vp = meta["vp"]
    kw = {} if vp is None else dict(vp_w=vp[0], vp_h=vp[1])
    return cfg, state, kw, data["frame"]


def test_fixtures_exist():
    assert len(FIXTURES) >= 6, (
        f"golden fixtures missing ({len(FIXTURES)} found in {GOLDEN_DIR}); "
        f"run scripts/make_golden_frames.py"
    )


@pytest.mark.parametrize(
    "path",
    [p for p in FIXTURES if "rgb_array" not in os.path.basename(p)],
    ids=[os.path.basename(p) for p in FIXTURES if "rgb_array" not in os.path.basename(p)],
)
def test_oracle_matches_golden(path):
    """The oracle renders the 96x96 observation contract; the rgb_array
    viewport fixture pins the painter only."""
    cfg, state, kw, frame = _load(path)
    out = np.asarray(
        jax.jit(partial(xla_raster.render_observation, cfg))(state)
    )
    np.testing.assert_array_equal(out, frame)


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_painter_matches_golden(path):
    cfg, state, kw, frame = _load(path)
    if kw:
        kw = dict(kw, draw_particles=True)
    out = np.asarray(
        jax.jit(partial(raster.render_observation, cfg, **kw))(state)
    )
    np.testing.assert_array_equal(out, frame)


@pytest.mark.parametrize(
    "path",
    [p for p in FIXTURES if "rgb_array" not in os.path.basename(p)],
    ids=[os.path.basename(p) for p in FIXTURES if "rgb_array" not in os.path.basename(p)],
)
def test_pallas_matches_golden(path):
    """Pallas kernel (interpret mode on CPU) vs golden pixels. The kernel
    renders the 96x96 observation layout only (the rgb_array viewport is the
    painter's job), so that fixture is skipped."""
    from multi_car_racing_tpu.render import pallas_raster as PR

    cfg, state, kw, frame = _load(path)
    batched = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], state)
    out = np.asarray(PR.render_pixels(cfg, batched, interpret=True))[0]
    np.testing.assert_array_equal(out, frame)
