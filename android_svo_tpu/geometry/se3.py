"""Batched SE(3)/SO(3) on unit quaternions — the TPU replacement for the
reference's custom mini-Sophus (`app/src/main/cpp/svo/include/svo/SE3.h:11-237`,
`SO3.h`).

Design: poses are pytrees of `(..., 4)` wxyz unit quaternions and `(..., 3)`
translations, so every operation is natively batched (vmap-free broadcasting)
and jit/vmap/shard_map-compatible.  Small-angle branches use Taylor expansions
selected with `jnp.where` (no data-dependent control flow), stable in f32.

Twist convention matches Sophus / the reference (`SE3.h:153-182`):
``xi = (rho, phi)`` with ``exp(xi) = (exp(phi^), V(phi) @ rho)`` — translation
block first, rotation block second, as used by the reference's GN updates
``T * SE3::exp(-x)`` (`sparse_img_align.cpp:302`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_EPS2 = 1e-8  # squared-angle threshold below which Taylor branches engage


# ---------------------------------------------------------------------------
# quaternion primitives (wxyz)
# ---------------------------------------------------------------------------

def quat_mul(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    pw, px, py, pz = jnp.moveaxis(p, -1, 0)
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (...,3) by unit quaternions q (...,4)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
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
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (...,3,3) -> wxyz quaternion, branch-free (Shepperd).

    Replaces the reference's `SE3::fromMatrix` (`SE3.h:81-99`).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best via argmax
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    c0 = jnp.stack([qw[..., 0], (m21 - m12) / (4 * qw[..., 0]),
                    (m02 - m20) / (4 * qw[..., 0]), (m10 - m01) / (4 * qw[..., 0])], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4 * qw[..., 1]), qw[..., 1],
                    (m01 + m10) / (4 * qw[..., 1]), (m02 + m20) / (4 * qw[..., 1])], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4 * qw[..., 2]), (m01 + m10) / (4 * qw[..., 2]),
                    qw[..., 2], (m12 + m21) / (4 * qw[..., 2])], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4 * qw[..., 3]), (m02 + m20) / (4 * qw[..., 3]),
                    (m12 + m21) / (4 * qw[..., 3]), qw[..., 3]], axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)          # (...,4cand,4)
    best = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # canonicalize sign (w >= 0) and normalize
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix (...,3) -> (...,3,3); ref `math_utils.h sqew`."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

class SO3:
    """Stateless helpers for rotation exp/log on quaternions."""

    @staticmethod
    def exp(phi: jnp.ndarray) -> jnp.ndarray:
        """Axis-angle (...,3) -> wxyz quaternion. Taylor branch at small angle."""
        theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
        theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
        small = theta2 < _EPS2
        half = 0.5 * theta
        # sin(t/2)/t: Taylor 0.5 - t^2/48
        k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
        w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
        return quat_normalize(jnp.concatenate([w, k * phi], axis=-1))

    @staticmethod
    def log(q: jnp.ndarray) -> jnp.ndarray:
        """wxyz quaternion -> axis-angle (...,3)."""
        q = jnp.where(q[..., :1] < 0, -q, q)  # shortest arc
        w = jnp.clip(q[..., :1], -1.0, 1.0)
        vn2 = jnp.sum(q[..., 1:] ** 2, axis=-1, keepdims=True)
        vn = jnp.sqrt(jnp.maximum(vn2, 1e-24))
        theta = 2.0 * jnp.arctan2(vn, w)
        small = vn2 < _EPS2
        k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-6), theta / vn)
        return k * q[..., 1:]


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

@struct.dataclass
class SE3:
    """Rigid transform(s): x_out = R @ x + t.  q is wxyz unit quaternion."""

    q: jnp.ndarray  # (..., 4)
    t: jnp.ndarray  # (..., 3)

    # -- constructors -------------------------------------------------------
    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "SE3":
        q = jnp.broadcast_to(
            jnp.array([1.0, 0, 0, 0], dtype=dtype), batch_shape + (4,))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return cls(q=q, t=t)

    @classmethod
    def from_matrix(cls, m: jnp.ndarray) -> "SE3":
        """(...,4,4) or (...,3,4) homogeneous matrix -> SE3 (ref SE3.h:81-99)."""
        return cls(q=matrix_to_quat(m[..., :3, :3]), t=m[..., :3, 3])

    @classmethod
    def from_rt(cls, rot: jnp.ndarray, t: jnp.ndarray) -> "SE3":
        return cls(q=matrix_to_quat(rot), t=t)

    # -- core ops ------------------------------------------------------------
    @property
    def batch_shape(self):
        return self.q.shape[:-1]

    def rotation_matrix(self) -> jnp.ndarray:
        return quat_to_matrix(self.q)

    def as_matrix(self) -> jnp.ndarray:
        """(...,4,4) homogeneous matrix (ref SE3.h getMatrix)."""
        rot = self.rotation_matrix()
        top = jnp.concatenate([rot, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0, 0, 1.0], dtype=self.t.dtype),
            top.shape[:-2] + (1, 4))
        return jnp.concatenate([top, bottom], axis=-2)

    def compose(self, other: "SE3") -> "SE3":
        """self @ other (apply other first)."""
        return SE3(
            q=quat_normalize(quat_mul(self.q, other.q)),
            t=quat_rotate(self.q, other.t) + self.t,
        )

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return self.compose(other)
        return self.apply(other)

    def inverse(self) -> "SE3":
        qi = quat_conj(self.q)
        return SE3(q=qi, t=-quat_rotate(qi, self.t))

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Transform points (...,3) under numpy broadcasting: a scalar pose
        applies to any batch of points; batched poses broadcast elementwise."""
        return quat_rotate(self.q, pts) + self.t

    def rotate(self, v: jnp.ndarray) -> jnp.ndarray:
        return quat_rotate(self.q, v)

    # -- exp / log ------------------------------------------------------------
    @classmethod
    def exp(cls, xi: jnp.ndarray) -> "SE3":
        """Twist (...,6) = (rho, phi) -> SE3 (ref SE3.h:153-182).

        R = exp(phi^);  t = V(phi) rho with
        V = I + (1-cos t)/t^2 phi^ + (t - sin t)/t^3 (phi^)^2.
        """
        rho, phi = xi[..., :3], xi[..., 3:]
        q = SO3.exp(phi)
        theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
        theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
        small = theta2 < _EPS2
        a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
        b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                      (theta - jnp.sin(theta)) / (theta2 * theta))
        cross1 = jnp.cross(phi, rho)
        cross2 = jnp.cross(phi, cross1)
        t = rho + a * cross1 + b * cross2
        return cls(q=q, t=t)

    def log(self) -> jnp.ndarray:
        """SE3 -> twist (...,6) = (rho, phi); inverse of exp."""
        phi = SO3.log(self.q)
        theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
        theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
        small = theta2 < _EPS2
        # V^{-1} = I - 1/2 phi^ + (1/t^2 - (1+cos t)/(2 t sin t)) (phi^)^2
        half_t = 0.5 * theta
        cot = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                        (1.0 / theta2)
                        - 0.5 * jnp.cos(half_t) / (theta * jnp.sin(half_t) + 1e-24))
        cross1 = jnp.cross(phi, self.t)
        cross2 = jnp.cross(phi, cross1)
        rho = self.t - 0.5 * cross1 + cot * cross2
        return jnp.concatenate([rho, phi], axis=-1)

    # -- misc -------------------------------------------------------------------
    def normalize(self) -> "SE3":
        return SE3(q=quat_normalize(self.q), t=self.t)

    def __getitem__(self, idx) -> "SE3":
        return SE3(q=self.q[idx], t=self.t[idx])


def distance(a: SE3, b: SE3):
    """(translation distance, rotation angle) between two poses."""
    rel = a.inverse().compose(b)
    return jnp.linalg.norm(rel.t, axis=-1), jnp.linalg.norm(SO3.log(rel.q), axis=-1)
