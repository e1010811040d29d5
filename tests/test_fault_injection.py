"""Fault injection + elastic recovery (SURVEY.md §5: no reference counterpart
— the reference has no failure handling at all; the TPU framework's story is
checkpoint/resume + coordinator restart).

The test kills the training process (SIGKILL, a real crash: no atexit, no
flush) after it has written a checkpoint, then restarts from that checkpoint
and asserts training continues from the saved update counter to completion.
This is the single-host form of the multi-host recovery drill (where the JAX
coordinator restarts all workers and each resumes from the shared
checkpoint); the restart path exercised — restore() onto a fresh
TrainState + continued updates — is identical.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Run the CLI with the CPU platform forced *inside* the interpreter: the
# ambient JAX_PLATFORMS=axon pin ignores env-var overrides (sitecustomize
# pre-registers the TPU plugin), so `-c` with jax.config is the only reliable
# headless-CPU launch.
WRAPPER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.argv = ["train"] + sys.argv[1:]
from multi_car_racing_tpu.train import main
main()
"""

ARGS = [
    "--updates", "2", "--num-envs", "4", "--rollout", "4", "--pool-size", "2",
    "--num-agents", "2", "--obs", "state", "--fast-solver", "--ckpt-every", "1",
]


def _launch(ckpt, extra):
    cache = os.path.join(REPO, ".jax_cache")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # Don't inherit the test process's 8-virtual-device XLA_FLAGS: the
    # trainer must see one CPU device (num_envs is sized for that).
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, "-c", WRAPPER.format(cache=cache)]
        + ARGS + ["--checkpoint", ckpt] + extra,
        cwd=REPO, env=env, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def test_sigkill_mid_training_then_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt")

    # --- run until the first checkpoint lands, then hard-kill (this exact
    # child PID only).
    p = _launch(ckpt, [])
    lines = []
    deadline = time.time() + 1700
    try:
        for line in p.stdout:
            lines.append(line)
            if "checkpointed ->" in line:
                p.send_signal(signal.SIGKILL)
                break
            assert time.time() < deadline, "no checkpoint within 28 min"
        else:
            pytest.fail("trainer exited before checkpointing:\n" + "".join(lines))
    finally:
        p.kill()
        p.wait()

    # Two-slot scheme (checkpoint.py): the pointer file names the last
    # COMPLETE slot, surviving kills mid-save.
    assert os.path.exists(ckpt + ".latest"), "checkpoint pointer missing after kill"

    # --- restart from the checkpoint; must resume at update >= 1 and finish.
    p2 = _launch(ckpt, ["--resume", ckpt])
    out, _ = p2.communicate(timeout=1700)
    assert p2.returncode == 0, f"resume run failed:\n{out}"
    assert "resumed from" in out and "at update" in out, out
    resumed_at = int(out.split("at update")[1].split()[0])
    assert resumed_at >= 1, f"resume did not restore update counter:\n{out}"
    # Training continued past the restore point.
    last_update = max(
        int(l.split("update")[1].split()[0])
        for l in out.splitlines() if l.strip().startswith("update")
    )
    assert last_update > resumed_at, f"no progress after resume:\n{out}"
