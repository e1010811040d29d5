"""Root conftest: make the in-repo package importable and force tests onto a
virtual 8-device CPU mesh (SURVEY.md §4.4) before JAX initializes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (TPU tunnel),
# which tests must not touch — sharding tests use 8 virtual CPU devices.
# sitecustomize (/root/.axon_site) already imported jax and registered the
# axon plugin, so the env var alone is not enough; set it through jax.config
# before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite compiles many large programs
# (180-iteration solvers, rasterizers); caching makes repeat runs fast.
# CPU-ONLY cache dir: the shared .jax_cache also receives XLA:CPU
# artifacts AOT-compiled by the axon remote-compile service for a
# DIFFERENT machine (avx512fp16/amx feature set); loading those on this
# host intermittently SIGSEGVs/SIGILLs CPU test workers. Keep the CPU
# cache separate.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
