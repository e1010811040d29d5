"""Metrics, logging, and profiling (SURVEY.md §5).

Reference observability is two print statements (track size at reset,
mcr:276-277; demo returns every 200 steps, mcr:728-730) plus the on-screen
HUD. Here: structured per-step metrics as device arrays (no host syncs inside
the step), a JSONL host logger, and jax.profiler trace helpers.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import IO

import jax
import jax.numpy as jnp


def env_metrics(state) -> dict:
    """Device-side metric pytree for a batched EnvState (E, ...)."""
    return dict(
        mean_cum_reward=state.reward.mean(),
        mean_tiles_visited=state.tile_visited_count.astype(jnp.float32).mean(),
        frac_done=state.done.astype(jnp.float32).mean(),
        frac_on_grass=state.driving_on_grass.astype(jnp.float32).mean(),
        frac_backward=state.driving_backward.astype(jnp.float32).mean(),
        mean_speed=jnp.linalg.norm(state.cars.hull_v, axis=-1).mean(),
        mean_episode_steps=state.steps.astype(jnp.float32).mean(),
    )


class JsonlLogger:
    """Append-only JSONL metric log with wall-clock + throughput bookkeeping."""

    def __init__(self, path: str | None = None, stream: IO | None = None):
        self._fh = open(path, "a") if path else stream
        self._t0 = time.time()
        self._last = self._t0
        self._last_steps = 0

    def log(self, step_count: int, metrics: dict, **extra) -> dict:
        now = time.time()
        host = {k: float(v) for k, v in metrics.items()}
        host.update(extra)
        host["env_steps"] = int(step_count)
        host["wall_s"] = round(now - self._t0, 3)
        dt = now - self._last
        if dt > 0:
            host["env_steps_per_sec"] = round((step_count - self._last_steps) / dt, 1)
        self._last, self._last_steps = now, step_count
        if self._fh:
            self._fh.write(json.dumps(host) + "\n")
            self._fh.flush()
        return host


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace (view with TensorBoard/Perfetto); no-op if logdir
    is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
