"""TPU-native scan-to-image registration and ground-truth generation engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the ETH3D
``dataset-pipeline`` reference (point-cloud cleanup, cube-map rendering,
point-to-plane ICP, normal estimation, splat/occlusion depth testing, dense
photometric joint pose+intrinsics refinement, and ground-truth creation),
re-designed array-first for TPU hardware: structs-of-arrays, static shapes,
vmapped/Pallas kernels, and `jax.sharding` meshes for multi-chip scale-out.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: the TPU backend in this environment compiles
# through a remote relay (minutes for large programs); caching makes repeat
# runs start in seconds. Harmless on CPU.
_cache_dir = _os.environ.get(
    "DPT_COMPILATION_CACHE", _os.path.expanduser("~/.cache/dpt_jax_cache")
)
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without these options
    pass
