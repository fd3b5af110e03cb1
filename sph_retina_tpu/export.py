"""Serving-path export: jitted predict -> serialized StableHLO artifact.

The reference's deployment surface is ONNX export (vendored mmdet ships
onnx equivalence tests, /root/reference/tests/test_onnx/). The TPU-native
equivalent is ``jax.export``: the whole predict path — backbone, FPN, head,
decode, NMS — is one jitted function with static shapes, so it lowers to a
single StableHLO module that can be serialized, versioned, and executed
later (or on another host) without the Python model code.

``export_predict`` serializes a :class:`~sph_retina_tpu.apis.Detector`'s
predict closure (weights baked in as constants); ``load_exported`` returns
a callable that runs the artifact on the current backend.
"""

from __future__ import annotations

from typing import Sequence

__all__ = ["export_predict", "load_exported"]


def export_predict(det, batch_size: int = 1,
                   platforms: Sequence[str] | None = None) -> bytes:
    """Serialize the detector's full predict path to a StableHLO artifact.

    ``platforms``: lowering targets (e.g. ``["tpu"]``, ``["cpu", "tpu"]``);
    defaults to the current backend. Returns the serialized bytes
    (write them to disk; ``load_exported`` reads them back).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    h, w = det.cfg.get("img_size", (512, 1024))
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.float32)

    def serve(images):
        r = det.predict(det.variables, images)
        # plain tuple: (boxes, scores, labels, inds, valid) — NamedTuple
        # pytrees need registration for serialization, a tuple does not
        return tuple(r)

    exp = jexport.export(jax.jit(serve),
                         platforms=tuple(platforms) if platforms else None)(
        spec)
    return bytes(exp.serialize())


def load_exported(data: bytes):
    """Deserialize an artifact from :func:`export_predict`.

    Returns ``call(images) -> (boxes, scores, labels, inds, valid)``.
    """
    from jax import export as jexport

    exp = jexport.deserialize(bytearray(data))
    return exp.call
