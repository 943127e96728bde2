"""Device-mesh helpers for sharded pipelines.

The reference is single-node OpenMP (SURVEY.md §2.8); here scale-out is a
first-class axis: points / correspondences / observations are sharded over a
1-D "data" mesh (ICI within a slice), partial normal-equation blocks are
``psum``-reduced, and the tiny solved system is replicated.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_rows(mesh: Mesh, arr, axis: str = "data"):
    """Place an array with its leading dim sharded over the mesh."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
