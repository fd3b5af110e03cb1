"""CLI device selection shared by the tools/ entry points.

One place for the ``--device {cpu,tpu,axon}`` convention (reference CLIs
take ``--device`` per /root/reference/tools/analysis_tools/benchmark.py),
so every tool maps ``tpu`` to the axon PJRT platform the same way instead
of each carrying its own copy.
"""

from __future__ import annotations

__all__ = ["pin_platform"]


def pin_platform(device: str | None) -> None:
    """Pin the JAX platform for this process before any array op.

    ``tpu`` selects the axon PJRT plugin (how a TPU chip is reached in
    this environment); ``cpu``/``axon`` are passed through; None/"" keeps
    the environment default. Must run before the first jax computation —
    a config update, not an env var, because the axon site hook pins
    ``jax_platforms`` at interpreter start.
    """
    if not device:
        return
    import jax

    jax.config.update("jax_platforms", "axon" if device == "tpu" else device)
