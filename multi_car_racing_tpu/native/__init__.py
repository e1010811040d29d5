"""Native (C++) host runtime components.

The TPU compute path is JAX/XLA/Pallas; host-side work that the reference
delegated to native code (Box2D, GEOS, GL) largely moved on-device. What
remains hot on the host is parity-mode track generation (a ~1000-iteration
float64 walk per reset, mcr:206-259): ``trackgen.cpp`` reimplements it with a
numpy-RandomState-compatible MT19937, bit-exact against track/host.py, ~20x
faster, and stream-continuing (the MT state round-trips through
``RandomState.get_state``/``set_state`` so Python and C++ can interleave
draws on one stream exactly like the reference's shared ``np_random``).

Built on demand with g++ (cached .so); callers fall back to the Python
oracle automatically if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "trackgen.cpp")
_SO = os.path.join(_DIR, "_trackgen.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return None
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            return None
        lib = ctypes.CDLL(_SO)
        lib.mcr_seed.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int),
        ]
        lib.mcr_generate_track.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mcr_generate_track.restype = ctypes.c_int
        _lib = lib
        return _lib


def build_error() -> str | None:
    return _build_error


def generate_track(rng: np.random.RandomState, max_retries: int = 100):
    """Drop-in for track.host.generate_track using the native core.

    Consumes and advances ``rng``'s MT19937 state exactly like the Python
    oracle (bit-exact tracks AND bit-exact stream continuation).
    Returns (track (T, 4) float64, border (T,) bool, retries) or raises
    RuntimeError if the native library is unavailable.
    """
    lib = load()
    if lib is None:
        raise RuntimeError(f"native trackgen unavailable: {_build_error}")

    kind, keys, pos, has_gauss, cached = rng.get_state()
    assert kind == "MT19937"
    state = np.ascontiguousarray(keys, dtype=np.uint32)
    pos_c = ctypes.c_int(int(pos))
    out_track = np.empty((2500, 4), np.float64)
    out_border = np.empty(2500, np.uint8)
    retries = ctypes.c_int(0)

    t = lib.mcr_generate_track(
        state.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.byref(pos_c),
        max_retries,
        out_track.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_border.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(retries),
    )
    if t <= 0:
        raise RuntimeError(f"track generation failed {max_retries} times")
    rng.set_state((kind, state, int(pos_c.value), has_gauss, cached))
    return (
        out_track[:t].copy(),
        out_border[:t].astype(bool),
        int(retries.value),
    )
