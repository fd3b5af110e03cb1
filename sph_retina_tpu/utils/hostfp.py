"""Host CPU-feature fingerprinting (stdlib only — safe before jax config).

Two consumers of host-specific binary artifacts share this:

- the persistent XLA compilation cache (tests/conftest.py, __graft_entry__.py):
  XLA:CPU AOT results embed the compile machine's feature list but the cache
  key does not, so loading them on a different host (sessions migrate VMs
  mid-round) logs cpu_aot_loader feature-mismatch errors and risks SIGILL —
  the cache directory is salted per host instead;
- the native C++ loader (data/native_loader.py): built with ``-march=native``,
  so a ``libsphloader.so`` carried over from another machine must be rebuilt
  (or refused), detected via a fingerprint file written at build time.

This module must stay importable with no third-party dependencies: it runs
before the JAX platform is pinned in the test suite and the driver entry.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def cpu_feature_fingerprint() -> str:
    """12-hex-char digest of this host's CPU feature flags.

    Falls back to ``"nocpuinfo"`` where /proc/cpuinfo has no x86 ``flags``
    line (non-Linux, aarch64): distinct hosts then share one bucket, which
    degrades to the pre-salt behavior rather than failing.
    """
    try:
        with open("/proc/cpuinfo") as f:
            flags_line = next(l for l in f if l.startswith("flags"))
        return hashlib.sha256(flags_line.encode()).hexdigest()[:12]
    except (OSError, StopIteration):
        return "nocpuinfo"


def default_jax_cache_dir() -> str:
    """Per-CPU-feature-set persistent XLA compilation cache path."""
    return os.path.join(
        tempfile.gettempdir(),
        f"sph_retina_tpu_jax_cache_{cpu_feature_fingerprint()}")
