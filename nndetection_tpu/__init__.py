"""nndetection-tpu: TPU-native self-configuring 3D medical object detection.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MIC-DKFZ/nnDetection (reference layout documented in SURVEY.md). The compute
path is functional JAX with static shapes throughout; parallelism is SPMD over
``jax.sharding.Mesh``; hot suppression/assignment kernels have Pallas
implementations with ``lax`` fallbacks.
"""

__version__ = "0.1.0"
