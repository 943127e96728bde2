"""Sharded joint scan+image bundle adjustment with Schur elimination.

The multi-host north-star component (BASELINE.json): scans and image
keyframes of several scenes are optimized JOINTLY — variables are a small
"kept" block (intrinsics + scan poses, shared structure) plus one 6-dof block
per image. Residual rows (ICP correspondences and photometric observations)
are sharded over a device mesh; each device accumulates its partial normal
equations, ``psum`` reduces them over ICI, the per-image 6x6 diagonal blocks
are eliminated on-device (the classic reduced-camera-system Schur step — here
images play the role of points since the scan geometry provides structure),
and the small reduced system is solved replicated.

No reference counterpart exists (the reference is single-node with a dense
LDLT, ``opt/intrinsics_and_pose_optimizer.cc:217-219`` notes Schur as future
work); designed from the mesh/collective model.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def schur_eliminate_images(H, b, n_keep: int, num_images: int, lam=0.0):
    """Eliminate trailing per-image 6x6 blocks from the damped system.

    H: (n_keep + 6m, n_keep + 6m), b matching. Returns (S, rhs, back) where
    ``back(x_keep) -> x_images (m,6)`` completes the solution.
    """
    m = num_images
    Hkk = H[:n_keep, :n_keep]
    Hki = H[:n_keep, n_keep:]
    Hii = H[n_keep:, n_keep:]
    bk = b[:n_keep]
    bi = b[n_keep:]

    # block-diagonal 6x6 part of Hii (off-diagonal image-image coupling is
    # zero by construction: no residual touches two images)
    blocks = jnp.stack([Hii[6 * i : 6 * i + 6, 6 * i : 6 * i + 6] for i in range(m)])
    blocks = blocks + lam * jnp.eye(6)[None]
    inv_blocks = jnp.linalg.inv(blocks)  # (m,6,6)

    Hki_b = Hki.reshape(n_keep, m, 6)
    # W = Hki * Hii^-1, blockwise
    W = jnp.einsum("kmi,mij->kmj", Hki_b, inv_blocks)
    S = Hkk + lam * jnp.eye(n_keep) - jnp.einsum(
        "kmi,nmi->kn", W, Hki_b, precision=jax.lax.Precision.HIGHEST
    )
    rhs = bk - jnp.einsum("kmi,mi->k", W, bi.reshape(m, 6))

    def back(x_keep):
        r = bi.reshape(m, 6) - jnp.einsum("kmi,k->mi", Hki_b, x_keep)
        return jnp.einsum("mij,mj->mi", inv_blocks, r)

    return S, rhs, back


def make_sharded_hb(mesh: Mesh, row_fn: Callable, n_vars: int, axis: str = "data"):
    """Build a psum-reduced H,b accumulator over sharded residual inputs.

    ``row_fn(*shard_inputs) -> (rows (R, n_vars), r (R,), w (R,))`` evaluated
    per device on its shard; returns a function producing replicated
    (H (n_vars,n_vars), b (n_vars,), cost).
    """

    def local(*inputs):
        rows, r, w = row_fn(*inputs)
        sw = jnp.sqrt(w)[:, None]
        rows_w = rows * sw
        r_w = r * sw[:, 0]
        H = jax.lax.dot_general(
            rows_w, rows_w, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        b = jnp.sum(rows_w * r_w[:, None], 0)
        cost = jnp.sum(r_w * r_w)
        return jax.lax.psum(H, axis), jax.lax.psum(b, axis), jax.lax.psum(cost, axis)

    def wrapper(*inputs, in_specs):
        fn = jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=(P(), P(), P())
        )
        return fn(*inputs)

    return wrapper


def joint_ba_step(mesh: Mesh, row_fn: Callable, inputs: Tuple, in_specs,
                  n_keep: int, num_images: int, lam: float = 1e-3,
                  axis: str = "data"):
    """One damped GN step of the sharded joint BA.

    Returns (delta_keep (n_keep,), delta_images (m,6), cost). Deltas follow
    the framework convention: apply as ``exp(-delta)`` / subtract.
    """
    n_vars = n_keep + 6 * num_images
    hb = make_sharded_hb(mesh, row_fn, n_vars, axis)
    H, b, cost = hb(*inputs, in_specs=in_specs)
    S, rhs, back = schur_eliminate_images(H, b, n_keep, num_images, lam)
    x_keep = jnp.linalg.solve(S, rhs)
    x_img = back(x_keep)
    return x_keep, x_img, cost
