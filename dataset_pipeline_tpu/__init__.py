"""TPU-native scan-to-image registration and ground-truth generation engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the ETH3D
``dataset-pipeline`` reference (point-cloud cleanup, cube-map rendering,
point-to-plane ICP, normal estimation, splat/occlusion depth testing, dense
photometric joint pose+intrinsics refinement, and ground-truth creation),
re-designed array-first for TPU hardware: structs-of-arrays, static shapes,
vmapped/Pallas kernels, and `jax.sharding` meshes for multi-chip scale-out.
"""

__version__ = "0.1.0"
