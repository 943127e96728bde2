"""Mesh-sharded photometric normal-equation accumulation.

The reference's hot loop walks images one by one on a single CPU
(``opt/intrinsics_and_pose_optimizer.cc:624-720``). The batched dispatch
layer (``photometric/optimizer.py::_hb_batch``) already turns an image chunk
into ONE vmapped program; this module shards that chunk's image axis over a
``jax.sharding.Mesh`` with ``shard_map``:

- every device holds ``nb / n_devices`` images of the chunk (poses, pyramid
  slices, observation masks) and the REPLICATED level geometry;
- each device runs the same vmapped ``_hb_core`` on its local images,
  producing per-image (V,V)/(V,) blocks that stay sharded (no collective —
  per-image pose blocks never interact across devices);
- the scalar cost/count sums are ``psum``-reduced over ICI so every device
  (and the host fetch) sees the global value.

The shared intrinsics block is summed on the host during assembly exactly as
in the sequential path, so sharded and sequential results agree (verified in
``tests/test_parallel.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dataset_pipeline_tpu.photometric import optimizer as _opt


def shard_image_axis(mesh: Mesh, tree, axis: str = "data"):
    """Place every array of a pytree with its leading (image) dim sharded."""

    def place(x):
        if x is None:
            return None
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def _pyr_specs(pyr, axis):
    return tuple(P(axis, None, None) for _ in pyr)


def make_sharded_hb_batch(mesh: Mesh, axis: str = "data"):
    """shard_map'ed counterpart of ``optimizer._hb_batch``.

    Returns ``fn(camera, params, pose_q, pose_t, points, neighbors, desc,
    image_pyr, obs_scale, contrib, radius, optimize_intrinsics,
    dynamic_scale, geom_batched)`` with identical semantics; the image axis
    (length divisible by the mesh size) is consumed shard-wise.
    """

    @partial(jax.jit, static_argnames=("optimize_intrinsics", "dynamic_scale",
                                       "geom_batched"))
    def fn(camera, params, pose_q, pose_t, points, neighbors, desc, image_pyr,
           obs_scale, contrib, radius, optimize_intrinsics: bool,
           dynamic_scale: bool, geom_batched: bool = False):
        ga0 = 0 if geom_batched else None
        gs = P(axis, *([None] * (points.ndim - 1))) if geom_batched else P()
        gn = P(axis, None, None) if geom_batched else P()

        def local(params, pose_q, pose_t, points, neighbors, desc, image_pyr,
                  obs_scale, contrib, radius):
            vf = jax.vmap(
                lambda q, t, pts, nbr, d, pyr, s, m: _opt._hb_core(
                    camera, params, q, t, pts, nbr, d, pyr, s, m, radius,
                    optimize_intrinsics, dynamic_scale),
                in_axes=(0, 0, ga0, ga0, ga0, 0, 0, 0))
            H, b, cost, count = vf(pose_q, pose_t, points, neighbors, desc,
                                   image_pyr, obs_scale, contrib)
            return (H, b, jax.lax.psum(jnp.sum(cost), axis),
                    jax.lax.psum(jnp.sum(count), axis))

        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), gs, gn, gn,
                      _pyr_specs(image_pyr, axis), P(axis, None),
                      P(axis, None), P()),
            out_specs=(P(axis), P(axis), P(), P()),
        check_vma=False)
        return sharded(params, pose_q, pose_t, points, neighbors, desc,
                       image_pyr, obs_scale, contrib, radius)

    return fn


def make_sharded_hb_rig_batch(mesh: Mesh, axis: str = "data"):
    """shard_map'ed counterpart of ``optimizer._hb_rig_batch`` (rig-dependent
    images: shared extrinsics replicated, per-image reference poses sharded)."""

    @partial(jax.jit, static_argnames=("optimize_intrinsics", "dynamic_scale",
                                       "geom_batched"))
    def fn(camera, params, extr_q, extr_t, ref_q, ref_t, points, neighbors,
           desc, image_pyr, obs_scale, contrib, radius,
           optimize_intrinsics: bool, dynamic_scale: bool,
           geom_batched: bool = False):
        ga0 = 0 if geom_batched else None
        gs = P(axis, *([None] * (points.ndim - 1))) if geom_batched else P()
        gn = P(axis, None, None) if geom_batched else P()

        def local(params, extr_q, extr_t, ref_q, ref_t, points, neighbors,
                  desc, image_pyr, obs_scale, contrib, radius):
            vf = jax.vmap(
                lambda rq, rt, pts, nbr, d, pyr, s, m: _opt._hb_rig_core(
                    camera, params, extr_q, extr_t, rq, rt, pts, nbr, d, pyr,
                    s, m, radius, optimize_intrinsics, dynamic_scale),
                in_axes=(0, 0, ga0, ga0, ga0, 0, 0, 0))
            H, b, cost, count = vf(ref_q, ref_t, points, neighbors, desc,
                                   image_pyr, obs_scale, contrib)
            return (H, b, jax.lax.psum(jnp.sum(cost), axis),
                    jax.lax.psum(jnp.sum(count), axis))

        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), gs, gn, gn,
                      _pyr_specs(image_pyr, axis), P(axis, None),
                      P(axis, None), P()),
            out_specs=(P(axis), P(axis), P(), P()),
        check_vma=False)
        return sharded(params, extr_q, extr_t, ref_q, ref_t, points,
                       neighbors, desc, image_pyr, obs_scale, contrib, radius)

    return fn


def make_sharded_hb_depth_batch(mesh: Mesh, axis: str = "data"):
    """shard_map'ed counterpart of ``optimizer._hb_depth_batch``."""

    @partial(jax.jit, static_argnames=("optimize_intrinsics", "geom_batched"))
    def fn(camera, params, pose_q, pose_t, points, depth_pyr, obs_scale,
           contrib, optimize_intrinsics: bool, geom_batched: bool = False):
        ga0 = 0 if geom_batched else None
        gs = P(axis, *([None] * (points.ndim - 1))) if geom_batched else P()

        def local(params, pose_q, pose_t, points, depth_pyr, obs_scale,
                  contrib):
            vf = jax.vmap(
                lambda q, t, pts, pyr, s, m: _opt._hb_depth_core(
                    camera, params, q, t, pts, pyr, s, m,
                    optimize_intrinsics),
                in_axes=(0, 0, ga0, 0, 0, 0))
            H, b, cost, count = vf(pose_q, pose_t, points, depth_pyr,
                                   obs_scale, contrib)
            return (H, b, jax.lax.psum(jnp.sum(cost), axis),
                    jax.lax.psum(jnp.sum(count), axis))

        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), gs,
                      _pyr_specs(depth_pyr, axis), P(axis, None),
                      P(axis, None)),
            out_specs=(P(axis), P(axis), P(), P()),
        check_vma=False)
        return sharded(params, pose_q, pose_t, points, depth_pyr, obs_scale,
                       contrib)

    return fn


class ShardedPhotometricKernels:
    """Drop-in replacements for the optimizer's batched H,b dispatches.

    Install on a ``PhotometricOptimizer`` via its ``mesh=`` argument; the
    optimizer pads each chunk to a multiple of the mesh size and calls these.
    """

    def __init__(self, mesh: Mesh, axis: str = "data"):
        self.mesh = mesh
        self.axis = axis
        self.n_devices = int(np.prod(mesh.devices.shape))
        self.hb_batch = make_sharded_hb_batch(mesh, axis)
        self.hb_rig_batch = make_sharded_hb_rig_batch(mesh, axis)
        self.hb_depth_batch = make_sharded_hb_depth_batch(mesh, axis)
