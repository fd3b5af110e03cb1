"""Test environment: CPU backend with 8 virtual devices for mesh tests.

The surrounding environment boots a TPU PJRT plugin via sitecustomize and jax
is already imported when pytest starts, so env vars alone are too late:
``jax.config.update`` is the reliable switch. Must run before any backend
initialization (i.e., before any test touches an array).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
