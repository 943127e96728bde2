"""Batched Lie-group math (SO3 / SE3 / Sim3) for JAX.

Poses are structs-of-arrays: a rotation is a unit quaternion array ``(..., 4)``
in ``wxyz`` order and a translation ``(..., 3)``.  All functions broadcast over
leading batch dimensions and are jit/vmap/grad friendly (Taylor fallbacks at
the small-angle singularities keep gradients finite).

Counterpart of the reference pipeline's use of Sophus ``SE3f``/``Sim3f``
(``/root/reference/src/thirdparty/sophus``; e.g. pose updates
``SE3::exp(delta) * T`` in ``src/opt/image.cc:156-166`` and the inner ICP
update ``src/icp/icp_point_to_plane_impl.h:217-291``), re-derived from the
standard exp/log maps rather than translated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternions (wxyz)
# ---------------------------------------------------------------------------

def quat_identity(batch_shape=(), dtype=jnp.float32):
    q = jnp.zeros(batch_shape + (4,), dtype).at[..., 0].set(1.0)
    return q


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_multiply(a, b):
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_rotate(q, v):
    """Rotate vectors ``v (...,3)`` by quaternions ``q (...,4)``."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_to_matrix(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_to_matrix_np(q):
    """Numpy float64 twin of :func:`quat_to_matrix` for host-side math
    (one quaternion (4,) wxyz -> (3,3))."""
    import numpy as np

    w, x, y, z = np.asarray(q, np.float64)
    return np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_from_matrix(m):
    """Rotation matrix ``(...,3,3)`` -> quaternion wxyz. Branch-free Shepperd."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically largest pivot.
    def cand_w():
        s = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 2.0
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], -1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], -1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 2.0
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], -1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 2.0
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], -1)

    pivots = jnp.stack([tr, m00, m11, m22], -1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand_w(), cand_x(), cand_y(), cand_z()], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

def so3_exp_quat(w):
    """Axis-angle vector ``(...,3)`` -> unit quaternion."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < _EPS
    half = 0.5 * theta
    # sin(theta/2)/theta with Taylor fallback 0.5 - theta^2/48
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    qw = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([qw, k * w], axis=-1)


def so3_log(q):
    """Unit quaternion -> axis-angle vector ``(...,3)``."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # w >= 0 branch
    w = q[..., :1]
    v = q[..., 1:]
    vn_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    vn = jnp.sqrt(jnp.maximum(vn_sq, _EPS * _EPS))
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn_sq < _EPS
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / vn)
    return k * v


def skew(w):
    """(...,3) -> (...,3,3) cross-product matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    m = jnp.stack([zeros, -wz, wy, wz, zeros, -wx, -wy, wx, zeros], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


# NOTE: these avoid 3x3 matmuls/einsums on purpose — tiny contractions would
# hit the TPU MXU at default (bf16) precision and cost ~1e-2 of accuracy.
# Closed forms keep everything on the VPU in full f32:
#   [w]x v      = cross(w, v)
#   [w]x^2 v    = w (w.v) - (w.w) v


def _apply_V(w, u):
    """V(w) @ u where V = I + (1-cos)/t^2 [w]x + (t-sin)/t^3 [w]x^2."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < _EPS
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (theta_sq * theta))
    wxu = jnp.cross(w, u)
    wdotu = jnp.sum(w * u, axis=-1, keepdims=True)
    wxxu = w * wdotu - theta_sq * u
    return u + a * wxu + b * wxxu


def _apply_V_inv(w, t):
    """V(w)^-1 @ t = t - 0.5 [w]x t + c [w]x^2 t."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < _EPS
    half_theta = 0.5 * theta
    c = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.sin(half_theta)) / theta_sq,
    )
    wxt = jnp.cross(w, t)
    wdott = jnp.sum(w * t, axis=-1, keepdims=True)
    wxxt = w * wdott - theta_sq * t
    return t - 0.5 * wxt + c * wxxt


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

class SE3(NamedTuple):
    """Rigid transform: x -> R x + t. ``q`` is wxyz, shape (...,4); ``t`` (...,3)."""

    q: jnp.ndarray
    t: jnp.ndarray

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        return SE3(quat_identity(batch_shape, dtype), jnp.zeros(batch_shape + (3,), dtype))

    @staticmethod
    def from_matrix(m) -> "SE3":
        return SE3(quat_from_matrix(m[..., :3, :3]), m[..., :3, 3])

    @staticmethod
    def from_rt(R, t) -> "SE3":
        return SE3(quat_from_matrix(R), t)

    @property
    def batch_shape(self):
        return self.q.shape[:-1]

    def rotation_matrix(self):
        return quat_to_matrix(self.q)

    def matrix(self):
        """(...,4,4) homogeneous matrix."""
        R = self.rotation_matrix()
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], self.q.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    def apply(self, p):
        """Transform points ``(...,3)``."""
        return quat_rotate(self.q, p) + self.t

    def rotate(self, v):
        return quat_rotate(self.q, v)

    def inverse(self) -> "SE3":
        qinv = quat_conjugate(self.q)
        return SE3(qinv, -quat_rotate(qinv, self.t))

    def compose(self, other: "SE3") -> "SE3":
        """self @ other (apply ``other`` first)."""
        return SE3(
            quat_normalize(quat_multiply(self.q, other.q)),
            quat_rotate(self.q, other.t) + self.t,
        )

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return self.compose(other)
        return self.apply(other)

    @staticmethod
    def exp(tangent) -> "SE3":
        """se3 tangent ``(...,6)`` = [translation, rotation] -> SE3.

        Uses the Sophus/twist convention ``t = V(w) @ u`` so that
        ``SE3.exp(x).log() == x``.
        """
        u, w = tangent[..., :3], tangent[..., 3:]
        q = so3_exp_quat(w)
        t = _apply_V(w, u)
        return SE3(q, t)

    def log(self):
        w = so3_log(self.q)
        u = _apply_V_inv(w, self.t)
        return jnp.concatenate([u, w], axis=-1)

    def cast(self, dtype) -> "SE3":
        return SE3(self.q.astype(dtype), self.t.astype(dtype))


# ---------------------------------------------------------------------------
# Sim3 (similarity transform; MeshLab .mlp global poses are Sim3)
# ---------------------------------------------------------------------------

class Sim3(NamedTuple):
    """Similarity transform x -> s R x + t."""

    q: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray  # scalar scale (...,)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Sim3":
        return Sim3(
            quat_identity(batch_shape, dtype),
            jnp.zeros(batch_shape + (3,), dtype),
            jnp.ones(batch_shape, dtype),
        )

    @staticmethod
    def from_matrix(m) -> "Sim3":
        R = m[..., :3, :3]
        s = jnp.linalg.norm(R, axis=(-2, -1)) / jnp.sqrt(3.0)
        return Sim3(quat_from_matrix(R / s[..., None, None]), m[..., :3, 3], s)

    @staticmethod
    def from_se3(se3: SE3, scale=None) -> "Sim3":
        s = jnp.ones(se3.batch_shape, se3.q.dtype) if scale is None else scale
        return Sim3(se3.q, se3.t, s)

    def se3(self) -> SE3:
        return SE3(self.q, self.t)

    def matrix(self):
        R = quat_to_matrix(self.q) * self.s[..., None, None]
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], self.q.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    def apply(self, p):
        return self.s[..., None] * quat_rotate(self.q, p) + self.t

    def inverse(self) -> "Sim3":
        qinv = quat_conjugate(self.q)
        sinv = 1.0 / self.s
        return Sim3(qinv, -sinv[..., None] * quat_rotate(qinv, self.t), sinv)

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(
            quat_normalize(quat_multiply(self.q, other.q)),
            self.s[..., None] * quat_rotate(self.q, other.t) + self.t,
            self.s * other.s,
        )

    def __matmul__(self, other):
        if isinstance(other, Sim3):
            return self.compose(other)
        return self.apply(other)


def average_quaternions(qs, axis=0):
    """Chordal-L2 rotation average: principal eigenvector of sum of q q^T.

    Counterpart of the SVD-projection rotation averaging in the reference rig
    assignment (``src/opt/rig.cc:29-269``).
    """
    qs = jnp.where(qs[..., :1] < 0, -qs, qs)
    M = jnp.sum(qs[..., :, None] * qs[..., None, :], axis=axis)
    # power iteration (fixed count, jit-friendly)
    v = jnp.ones(M.shape[:-1], M.dtype)

    def body(_, v):
        v = jnp.sum(M * v[..., None, :], axis=-1)  # elementwise matvec (VPU, f32)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    v = jax.lax.fori_loop(0, 50, body, v / jnp.linalg.norm(v, axis=-1, keepdims=True))
    return quat_normalize(v)
