"""aidet-tpu: TPU-native (JAX/XLA/Pallas) oriented object detection framework.

A from-scratch rebuild of the capabilities of jwwangchn/aidet (an
MMDetection-v1 fork specialised for oriented-bounding-box aerial-image
detection on DOTA), designed TPU-first:

- all geometry / target assignment / post-processing is vectorized,
  statically-shaped and jit-compiled (no per-image Python loops),
- models are flax.linen modules compiled under ``jax.jit`` / ``pjit``
  over a ``jax.sharding.Mesh``,
- hot kernels (rotated IoU, NMS, RoIAlign) have pure-XLA implementations
  with Pallas variants where profitable.
"""

__version__ = "0.1.0"
