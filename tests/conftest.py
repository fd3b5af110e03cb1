"""Test environment: CPU backend with 8 virtual devices for mesh tests.

The surrounding environment boots a TPU PJRT plugin via sitecustomize and jax
is already imported when pytest starts, so env vars alone are too late:
``jax.config.update`` is the reliable switch. Must run before any backend
initialization (i.e., before any test touches an array).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Stdlib-only; importing the package does not initialize a jax backend
# (verified: no module-level array creation), so this is safe pre-pinning.
from sph_retina_tpu.utils.hostfp import default_jax_cache_dir as _cpu_cache_dir  # noqa: E402,E501


flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compilation cache, shared with the subprocess-based CLI
# tests (they spawn with env={**os.environ}): the suite compiles the same
# tiny R18/64x128 programs dozens of times across processes, and reuse cuts
# the heaviest workflow test ~2.4x (653 s -> 274 s warm). setdefault so a
# caller-provided cache dir wins; env vars here (not jax.config) so
# children inherit.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cpu_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# jax was already imported by the environment's sitecustomize, so the env
# var above may be too late for this in-process config default — set it
# explicitly as well.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
