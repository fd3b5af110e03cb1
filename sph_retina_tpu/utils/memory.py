"""Device-OOM retry ladder (AvoidCUDAOOM parity).

Counterpart of the reference's ``AvoidOOM.retry_if_cuda_oom``
(/root/reference/mmdet/utils/memory.py:79-213), which retries an op after
``torch.cuda.empty_cache()``, then with fp16 inputs, then on the host CPU.

The TPU/XLA analogue implemented here:

1. drop dead Python references + ``gc.collect()`` so XLA can reuse the
   freed HBM (there is no explicit cache to empty — buffers are freed when
   their last reference dies), and retry;
2. retry with floating-point inputs cast to **bfloat16** (halves HBM for
   fp32 workloads; bf16 is the TPU-native half type, fp16 is not), casting
   float outputs back to the original dtype;
3. retry on the **CPU backend** with fp32 inputs, moving results back.

Only genuine out-of-memory failures trigger the ladder: XLA surfaces them
as ``RESOURCE_EXHAUSTED`` runtime errors.
"""

from __future__ import annotations

import functools
import gc
import warnings

import jax
import numpy as np

__all__ = ["is_oom_error", "AvoidOOM"]


def is_oom_error(err: BaseException) -> bool:
    """True if ``err`` is an XLA device out-of-memory failure."""
    msg = str(err)
    return ("RESOURCE_EXHAUSTED" in msg
            or "Out of memory" in msg
            or "out of memory" in msg)


def _tree_cast_floats(tree, dtype):
    def cast(x):
        # jnp.issubdtype, not np: bfloat16 is an ml_dtypes extension type
        # that numpy does not classify under np.floating.
        if isinstance(x, (jax.Array, np.ndarray)) and jax.numpy.issubdtype(
                x.dtype, jax.numpy.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def _tree_to_device(tree, device):
    def put(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return jax.device_put(x, device)
        return x

    return jax.tree_util.tree_map(put, tree)


class AvoidOOM:
    """Decorator/wrapper that retries an array op when the device OOMs.

    >>> iou = AvoidOOM()(compute_pairwise_iou)   # doctest: +SKIP
    >>> iou = AvoidOOM(to_cpu=False)(fn)         # no host fallback

    Args:
        to_bf16: enable the bfloat16 retry rung (default True).
        to_cpu: enable the host-CPU retry rung (default True).
        verbose: kept for API compatibility. Result-altering fallbacks
            (bf16, CPU) always warn — the reference's AvoidCUDAOOM logs
            every fallback, and a silent precision change would make the
            same checkpoint score differently across machines.
    """

    def __init__(self, to_bf16: bool = True, to_cpu: bool = True,
                 verbose: bool = True):
        self.to_bf16 = to_bf16
        self.to_cpu = to_cpu
        self.verbose = verbose

    def _warn(self, msg: str) -> None:
        warnings.warn(msg, stacklevel=3)

    def __call__(self, func):
        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            # block_until_ready inside each rung: jax dispatch is async, so
            # an execution-time RESOURCE_EXHAUSTED would otherwise surface
            # at the caller's first use of the result — past this ladder.
            try:
                return jax.block_until_ready(func(*args, **kwargs))
            except Exception as err:  # noqa: BLE001 — filtered below
                if not is_oom_error(err):
                    raise
            # rung 1: free dead buffers and retry at full precision
            gc.collect()
            try:
                return jax.block_until_ready(func(*args, **kwargs))
            except Exception as err:
                if not is_oom_error(err):
                    raise
                last_oom = err

            # rung 2: bfloat16 inputs, outputs cast back to fp32
            if self.to_bf16:
                self._warn(f"{getattr(func, '__name__', func)}: device OOM; "
                           "retrying with bfloat16 inputs")
                try:
                    out = func(*_tree_cast_floats(args, jax.numpy.bfloat16),
                               **_tree_cast_floats(kwargs,
                                                   jax.numpy.bfloat16))
                    return _tree_cast_floats(jax.block_until_ready(out),
                                             np.float32)
                except Exception as err:
                    if not is_oom_error(err):
                        raise
                    last_oom = err

            # rung 3: host CPU at full precision
            if self.to_cpu:
                try:
                    cpu = jax.devices("cpu")[0]
                except RuntimeError:
                    # jax_platforms pinned to the accelerator only — the
                    # cpu backend is excluded; surface the real OOM rather
                    # than an "Unknown backend" error.
                    cpu = None
                if cpu is not None:
                    self._warn(f"{getattr(func, '__name__', func)}: device "
                               "OOM; falling back to the CPU backend")
                    return func(*_tree_to_device(args, cpu),
                                **_tree_to_device(kwargs, cpu))

            raise RuntimeError(
                f"{getattr(func, '__name__', func)} exhausted the OOM retry "
                "ladder (remaining rungs disabled or unavailable)"
            ) from last_oom

        return wrapped
