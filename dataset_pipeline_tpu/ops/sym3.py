"""Closed-form eigen-analysis of batched symmetric 3x3 matrices.

TPU-friendly replacement for per-point `eigh` calls in PCA normal estimation:
trigonometric eigenvalues + column-product eigenvectors, all elementwise VPU
math (no tiny-matmul MXU precision loss, no LAPACK).
"""

from __future__ import annotations

import jax.numpy as jnp


def sym3_eigenvalues(A):
    """Eigenvalues (ascending) of symmetric ``A (...,3,3)``."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    isotropic = p2 < 1e-20
    e_hi = jnp.where(isotropic, q, e_hi)
    e_mid = jnp.where(isotropic, q, e_mid)
    e_lo = jnp.where(isotropic, q, e_lo)
    return jnp.stack([e_lo, e_mid, e_hi], -1)


def _row(A, i):
    return A[..., i, 0], A[..., i, 1], A[..., i, 2]


def sym3_smallest_eigenvector(A):
    """Unit eigenvector for the smallest eigenvalue of symmetric ``A``.

    Uses columns of (A - l1 I)(A - l2 I), which span the l0 eigenspace;
    picks the largest column for stability. Degenerate (isotropic) input
    returns (0,0,1).
    """
    evals = sym3_eigenvalues(A)
    l0, l1, l2 = evals[..., 0], evals[..., 1], evals[..., 2]

    eye = jnp.eye(3, dtype=A.dtype)
    B = A - l1[..., None, None] * eye
    C = A - l2[..., None, None] * eye
    # columns of B @ C, computed elementwise
    cols = []
    for j in range(3):
        cj = C[..., :, j]
        col = jnp.stack(
            [
                B[..., 0, 0] * cj[..., 0] + B[..., 0, 1] * cj[..., 1] + B[..., 0, 2] * cj[..., 2],
                B[..., 1, 0] * cj[..., 0] + B[..., 1, 1] * cj[..., 1] + B[..., 1, 2] * cj[..., 2],
                B[..., 2, 0] * cj[..., 0] + B[..., 2, 1] * cj[..., 1] + B[..., 2, 2] * cj[..., 2],
            ],
            -1,
        )
        cols.append(col)
    cols = jnp.stack(cols, -2)  # (...,3cols,3)
    norms = jnp.sum(cols * cols, -1)
    best = jnp.argmax(norms, -1)
    v = jnp.take_along_axis(cols, best[..., None, None].repeat(3, -1), -2)[..., 0, :]
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), 1e-30))
    v = v / n
    degenerate = (jnp.max(norms, -1) < 1e-24) | ((l2 - l0) < 1e-12)
    fallback = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], A.dtype), v.shape)
    return jnp.where(degenerate[..., None], fallback, v)
