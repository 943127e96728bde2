"""Device-mesh helpers for sharded pipelines.

The reference is single-node OpenMP (SURVEY.md §2.8); here scale-out is a
first-class axis: points / correspondences / observations are sharded over a
1-D "data" mesh (ICI within a slice) or a 2-D ("hosts", "devices") mesh
(DCN across hosts x ICI within each host), partial normal-equation blocks
are ``psum``-reduced over all mesh axes, and the tiny solved system is
replicated.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Axis = Union[str, Tuple[str, ...]]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host entry point (SURVEY.md §5 distributed backend).

    Call once per host process before any device computation; afterwards
    ``jax.devices()`` spans the whole pod slice and meshes built from it
    psum over DCN+ICI. Configuration comes from the arguments or the
    ``DPT_COORDINATOR`` / ``DPT_NUM_PROCESSES`` / ``DPT_PROCESS_ID``
    environment (matching ``jax.distributed.initialize`` semantics; on
    Cloud TPU the arguments are auto-detected and may all be None).
    Returns True if a multi-host runtime was initialized, False for the
    single-process path (no coordinator configured) — a no-op that keeps
    single-host runs unchanged.
    """
    coordinator_address = coordinator_address or os.environ.get("DPT_COORDINATOR")
    if num_processes is None and "DPT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DPT_NUM_PROCESSES"])
    if process_id is None and "DPT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["DPT_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_data_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_host_device_mesh(num_hosts: Optional[int] = None,
                          devices_per_host: Optional[int] = None,
                          axes: Sequence[str] = ("hosts", "devices")) -> Mesh:
    """2-axis mesh: leading axis across hosts (DCN), trailing within a host
    (ICI). Defaults derive from ``jax.process_count()``; any (h, d) split of
    the available devices is accepted for single-process testing (e.g. a
    2x4 mesh over the forced-8-device CPU platform)."""
    devs = jax.devices()
    if num_hosts is None:
        num_hosts = max(jax.process_count(), 1)
    if devices_per_host is None:
        devices_per_host = len(devs) // num_hosts
    n = num_hosts * devices_per_host
    if n > len(devs):
        raise ValueError(f"mesh {num_hosts}x{devices_per_host} needs {n} devices, "
                         f"have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(num_hosts, devices_per_host)
    return Mesh(grid, tuple(axes))


def mesh_axes(mesh: Mesh) -> Tuple[str, ...]:
    return tuple(mesh.axis_names)


def shard_rows(mesh: Mesh, arr, axis: Axis = None):
    """Place an array with its leading dim sharded over ALL mesh axes (or
    the given axis/axes)."""
    if axis is None:
        axis = tuple(mesh.axis_names)
        axis = axis[0] if len(axis) == 1 else axis
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
