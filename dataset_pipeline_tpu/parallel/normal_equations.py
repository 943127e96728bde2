"""Sharded Gauss-Newton normal-equation accumulation.

The distributed pattern at the heart of the framework (SURVEY.md §2.8): each
device accumulates H, b over ITS shard of residual rows (ICP correspondences
or photometric observations), the small per-device blocks are ``psum``-reduced
over the mesh, and every device holds the replicated reduced system. XLA
lowers the psum to ICI all-reduces; no NCCL/MPI analog is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dataset_pipeline_tpu.models.lie import quat_rotate


def sharded_icp_hb(mesh: Mesh, q, t, ps, ns, pt, nt, src_id, tgt_id, w,
                   num_clouds: int, axis=None):
    """ICP H,b,cost with correspondence rows sharded over ``mesh``.

    Row counts must be divisible by the mesh size (pad with w=0 rows).
    ``axis`` defaults to ALL mesh axes — on a 2-axis ("hosts","devices")
    mesh the psum spans DCN and ICI (SURVEY.md §5). Returns replicated
    (H (6C,6C), b (6C,), cost).
    """
    C = num_clouds
    if axis is None:
        names = tuple(mesh.axis_names)
        axis = names[0] if len(names) == 1 else names

    def local_hb(q, t, ps, ns, pt, nt, sid, tid, w):
        gps = quat_rotate(q[sid], ps) + t[sid]
        gns = quat_rotate(q[sid], ns)
        gpt = quat_rotate(q[tid], pt) + t[tid]
        gnt = quat_rotate(q[tid], nt)
        diff = gpt - gps
        r1 = jnp.sum(gns * diff, -1)
        r2 = -jnp.sum(gnt * diff, -1)
        j1_tgt = jnp.concatenate([gns, jnp.cross(gpt, gns)], -1)
        j2_src = jnp.concatenate([gnt, jnp.cross(gps, gnt)], -1)
        oh_src = jax.nn.one_hot(sid, C, dtype=ps.dtype)
        oh_tgt = jax.nn.one_hot(tid, C, dtype=ps.dtype)
        sw = jnp.sqrt(w)
        rows1 = (oh_tgt[:, :, None] - oh_src[:, :, None]) * j1_tgt[:, None, :]
        rows2 = (oh_src[:, :, None] - oh_tgt[:, :, None]) * j2_src[:, None, :]
        rows = jnp.concatenate([rows1, rows2], 0).reshape(-1, 6 * C)
        rows = rows * jnp.concatenate([sw, sw], 0)[:, None]
        r = jnp.concatenate([r1 * sw, r2 * sw], 0)
        H = jax.lax.dot_general(
            rows, rows, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        b = jnp.sum(rows * r[:, None], 0)
        cost = jnp.sum(r * r)
        # cross-device reduction over ICI
        H = jax.lax.psum(H, axis)
        b = jax.lax.psum(b, axis)
        cost = jax.lax.psum(cost, axis)
        return H, b, cost

    sharded = P(axis)
    rep = P()
    fn = jax.shard_map(
        local_hb,
        mesh=mesh,
        in_specs=(rep, rep, sharded, sharded, sharded, sharded, sharded, sharded, sharded),
        out_specs=(rep, rep, rep),
    check_vma=False)
    return fn(q, t, ps, ns, pt, nt, src_id, tgt_id, w)


def sharded_moment_gram(mesh: Mesh, ps, ns, pt, nt, w, axis=None):
    """Monomial moment Gram P = sum m m^T for ONE correspondence group with
    rows sharded over ``mesh`` (the multi-chip path of the DEFAULT moment
    ICP inner loop, ``icp/moments.py``): each device accumulates its local
    42x42 Gram at HIGHEST precision and one tiny psum replicates P — after
    which the entire inner LM schedule is O(1) host math, independent of
    mesh size.

    Row count must be divisible by the mesh size (pad with w=0 rows, which
    vanish from the Gram). ``axis`` defaults to all mesh axes (DCN + ICI on
    a 2-axis host/device mesh). Returns replicated (42,42).
    """
    from dataset_pipeline_tpu.icp.moments import moment_gram_xla

    if axis is None:
        names = tuple(mesh.axis_names)
        axis = names[0] if len(names) == 1 else names

    def local(ps, ns, pt, nt, w):
        return jax.lax.psum(moment_gram_xla(ps, ns, pt, nt, w), axis)

    sh = P(axis)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(sh, sh, sh, sh, sh),
                       out_specs=P(), check_vma=False)
    return fn(ps, ns, pt, nt, w)
