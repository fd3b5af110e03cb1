"""Test environment: CPU backend with 8 virtual devices for mesh tests.

The surrounding environment boots a TPU PJRT plugin via sitecustomize and jax
is already imported when pytest starts, so env vars alone are too late:
``jax.config.update`` is the reliable switch. Must run before any backend
initialization (i.e., before any test touches an array).
"""

import hashlib
import os
import tempfile


def _cpu_cache_dir():
    """Per-CPU-feature-set cache path. XLA:CPU AOT results embed the compile
    machine's feature list but the cache key does not; loading them on a
    different host (sessions migrate VMs mid-round) logs cpu_aot_loader
    feature-mismatch errors and risks SIGILL. Salting the directory with a
    fingerprint of /proc/cpuinfo flags gives every distinct host its own
    cache instead."""
    try:
        with open("/proc/cpuinfo") as f:
            flags_line = next(l for l in f if l.startswith("flags"))
        salt = hashlib.sha256(flags_line.encode()).hexdigest()[:12]
    except (OSError, StopIteration):
        salt = "nocpuinfo"
    return os.path.join(tempfile.gettempdir(),
                        f"sph_retina_tpu_jax_cache_{salt}")


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
