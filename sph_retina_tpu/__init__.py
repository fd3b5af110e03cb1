"""sph_retina_tpu — a TPU-native (JAX/XLA/Pallas) spherical object detection framework.

A from-scratch rebuild of the capabilities of the Sph2Pob spherical-detection stack
(IJCAI'23 "Boosting Object Detection on Spherical Images with Planar Oriented Boxes
Methods") designed TPU-first:

- pure-functional geometry core on ``jnp`` arrays (static shapes, mask-don't-branch),
- a fused Pallas kernel for the pairwise spherical-IoU hot path,
- detectors (RetinaNet / FCOS / SSD / Faster R-CNN) as Flax modules,
- ``jit``/``shard_map`` data-parallel training over a ``jax.sharding.Mesh``.

Box conventions (matching the reference API surface, degrees at the boundary):

- BFoV:  ``(theta, phi, alpha, beta)``  — longitude center θ∈[0,360), colatitude
  center φ∈[0,180), horizontal/vertical field-of-view α,β∈(0,180), all degrees.
- RBFoV: ``(theta, phi, alpha, beta, gamma)`` — adds rotation γ in degrees.

Internally everything is radians and float32.
"""

__version__ = "0.1.0"

from . import geometry, iou  # noqa: F401
