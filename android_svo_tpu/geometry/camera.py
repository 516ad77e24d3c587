"""Camera models as pure batched functions — TPU replacement for the
reference's `vk::AbstractCamera` hierarchy (`abstract_camera.h:19-73`,
`pinhole_camera.cpp:19-115`, `atan_camera.cpp:19-86`).

`cam2world` returns unit bearing vectors; `world2cam` projects 3D points (or
unit-plane coordinates) to distorted pixel coordinates.  The reference
delegates undistortion to `cv::undistortPoints` (`pinhole_camera.cpp:59`); we
use the same fixed-point iteration, fully vectorized and jit-compatible
(fixed iteration count, no data-dependent control flow).

Pixel convention: px[..., 0] = u (column/x), px[..., 1] = v (row/y), origin at
the center of the top-left pixel (matches OpenCV / the reference).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


def project2d(xyz: jnp.ndarray) -> jnp.ndarray:
    """3D -> unit-plane 2D (ref math_utils.h project2d)."""
    return xyz[..., :2] / xyz[..., 2:3]


def unproject2d(uv: jnp.ndarray) -> jnp.ndarray:
    """Unit-plane 2D -> homogeneous 3D with z=1 (ref math_utils.h unproject2d)."""
    return jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)


@struct.dataclass
class PinholeCamera:
    """Pinhole + radtan(k1,k2,p1,p2,k3) — ref `pinhole_camera.{h,cpp}`."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray                       # (5,) = k1,k2,p1,p2,k3
    width: int = struct.field(pytree_node=False, default=752)
    height: int = struct.field(pytree_node=False, default=480)
    # static (trace-time) flag: all-zero distortion skips the radtan
    # polynomial in world2cam and the 8-iteration fixed-point undistort in
    # cam2world — both sit on every hot path (projection, warping, epi
    # geometry), and zero-distortion rigs (and all synthetic benches) pay
    # them for nothing otherwise
    distortion_free: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, width, height, fx, fy, cx, cy,
               k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
               dtype=jnp.float32) -> "PinholeCamera":
        """Build a camera; the ONLY place `distortion_free` is derived.

        Do not mutate `dist` through `.replace(dist=...)` — the static
        flag would go stale and distort/undistort silently become no-ops
        (ADVICE r4 #4); build a fresh camera via `create` instead.
        Distortion coefficients must be Python/numpy scalars (calibration
        constants), never traced values — `float()` enforces that here.
        """
        ks = [float(k) for k in (k1, k2, p1, p2, k3)]
        return cls(
            fx=jnp.asarray(fx, dtype), fy=jnp.asarray(fy, dtype),
            cx=jnp.asarray(cx, dtype), cy=jnp.asarray(cy, dtype),
            dist=jnp.asarray(ks, dtype),
            width=int(width), height=int(height),
            distortion_free=all(k == 0.0 for k in ks),
        )

    @property
    def has_distortion(self) -> bool:
        return not self.distortion_free

    def errorMultiplier2(self) -> jnp.ndarray:
        """Focal length for angular->pixel error conversion
        (ref abstract_camera.h errorMultiplier2)."""
        return self.fx

    # -- distortion ----------------------------------------------------------
    def distort(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Unit-plane -> distorted unit-plane (ref pinhole_camera.cpp:44-58)."""
        if self.distortion_free:
            return uv
        k1, k2, p1, p2, k3 = (self.dist[i] for i in range(5))
        x, y = uv[..., 0], uv[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xy = x * y
        xd = x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
        return jnp.stack([xd, yd], axis=-1)

    def undistort(self, uvd: jnp.ndarray, n_iter: int = 8) -> jnp.ndarray:
        """Distorted -> ideal unit-plane via fixed-point iteration (the
        algorithm inside `cv::undistortPoints`, ref pinhole_camera.cpp:59)."""
        if self.distortion_free:
            return uvd
        k1, k2, p1, p2, k3 = (self.dist[i] for i in range(5))
        xd, yd = uvd[..., 0], uvd[..., 1]
        x, y = xd, yd
        for _ in range(n_iter):
            r2 = x * x + y * y
            radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
            dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
            x = (xd - dx) / radial
            y = (yd - dy) / radial
        return jnp.stack([x, y], axis=-1)

    # -- projection --------------------------------------------------------------
    def world2cam_uv(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Unit-plane -> pixel (applies distortion + K)."""
        uvd = self.distort(uv)
        return jnp.stack(
            [self.fx * uvd[..., 0] + self.cx, self.fy * uvd[..., 1] + self.cy],
            axis=-1)

    def world2cam(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame 3D point -> pixel (ref pinhole_camera world2cam)."""
        return self.world2cam_uv(project2d(xyz))

    def cam2world(self, px: jnp.ndarray) -> jnp.ndarray:
        """Pixel -> unit bearing vector (ref pinhole_camera cam2world)."""
        uvd = jnp.stack(
            [(px[..., 0] - self.cx) / self.fx, (px[..., 1] - self.cy) / self.fy],
            axis=-1)
        xyz = unproject2d(self.undistort(uvd))
        return xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)

    def is_in_frame(self, px: jnp.ndarray, boundary: float = 0.0,
                    level: int = 0) -> jnp.ndarray:
        """Bounds check at a pyramid level (ref abstract_camera.h isInFrame)."""
        scale = float(2 ** level)
        w = self.width / scale
        h = self.height / scale
        return ((px[..., 0] >= boundary) & (px[..., 0] < w - boundary)
                & (px[..., 1] >= boundary) & (px[..., 1] < h - boundary))


@struct.dataclass
class ATANCamera:
    """FOV/ATAN camera model (ref `atan_camera.{h,cpp}:19-86`)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    s: jnp.ndarray                          # FOV distortion parameter omega
    width: int = struct.field(pytree_node=False, default=752)
    height: int = struct.field(pytree_node=False, default=480)

    @classmethod
    def create(cls, width, height, fx, fy, cx, cy, s, dtype=jnp.float32):
        # the reference takes normalized intrinsics scaled by image size
        # (atan_camera.cpp:19-30); we take them in pixels directly.
        return cls(fx=jnp.asarray(fx, dtype), fy=jnp.asarray(fy, dtype),
                   cx=jnp.asarray(cx, dtype), cy=jnp.asarray(cy, dtype),
                   s=jnp.asarray(s, dtype), width=int(width), height=int(height))

    def errorMultiplier2(self) -> jnp.ndarray:
        return self.fx

    def _rd_factor(self, r: jnp.ndarray) -> jnp.ndarray:
        """rd/r for the FOV model: rd = atan(2 r tan(s/2)) / s."""
        two_tan_half = 2.0 * jnp.tan(self.s / 2.0)
        small = r < 1e-6
        rs = jnp.where(small, 1e-6, r)
        return jnp.where(small, two_tan_half / self.s,
                         jnp.arctan(rs * two_tan_half) / (rs * self.s))

    def _ru_factor(self, rd: jnp.ndarray) -> jnp.ndarray:
        """r/rd (inverse distortion): r = tan(rd s) / (2 tan(s/2))."""
        two_tan_half = 2.0 * jnp.tan(self.s / 2.0)
        small = rd < 1e-6
        rds = jnp.where(small, 1e-6, rd)
        return jnp.where(small, self.s / two_tan_half,
                         jnp.tan(rds * self.s) / (rds * two_tan_half))

    def world2cam_uv(self, uv: jnp.ndarray) -> jnp.ndarray:
        r = jnp.linalg.norm(uv, axis=-1)
        factor = self._rd_factor(r)
        uvd = uv * factor[..., None]
        return jnp.stack(
            [self.fx * uvd[..., 0] + self.cx, self.fy * uvd[..., 1] + self.cy],
            axis=-1)

    def world2cam(self, xyz: jnp.ndarray) -> jnp.ndarray:
        return self.world2cam_uv(project2d(xyz))

    def cam2world(self, px: jnp.ndarray) -> jnp.ndarray:
        uvd = jnp.stack(
            [(px[..., 0] - self.cx) / self.fx, (px[..., 1] - self.cy) / self.fy],
            axis=-1)
        rd = jnp.linalg.norm(uvd, axis=-1)
        uv = uvd * self._ru_factor(rd)[..., None]
        xyz = unproject2d(uv)
        return xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)

    def is_in_frame(self, px: jnp.ndarray, boundary: float = 0.0,
                    level: int = 0) -> jnp.ndarray:
        scale = float(2 ** level)
        w = self.width / scale
        h = self.height / scale
        return ((px[..., 0] >= boundary) & (px[..., 0] < w - boundary)
                & (px[..., 1] >= boundary) & (px[..., 1] < h - boundary))
