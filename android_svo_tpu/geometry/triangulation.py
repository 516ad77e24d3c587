"""Two-view geometry utilities — batched replacements for the reference's
`vk::math_utils` (`math_utils.cpp:15-203`) and the matcher's triangulation
(`matcher.cpp:123-153`).

All functions broadcast over leading batch dimensions and are jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from android_svo_tpu.geometry.se3 import SE3, hat


def triangulate_midpoint(T_w_ref: SE3, T_w_cur: SE3,
                         f_ref: jnp.ndarray, f_cur: jnp.ndarray) -> jnp.ndarray:
    """Midpoint triangulation in world frame (ref math_utils.cpp:15-32).

    Solves min ||A [d_ref, d_cur]^T - b|| for ray depths, returns the
    midpoint of the two closest ray points.
    """
    r_ref = T_w_ref.rotate(f_ref)
    r_cur = T_w_cur.rotate(f_cur)
    b = T_w_cur.t - T_w_ref.t
    a00 = jnp.sum(r_ref * r_ref, axis=-1)
    a01 = -jnp.sum(r_ref * r_cur, axis=-1)
    a11 = jnp.sum(r_cur * r_cur, axis=-1)
    b0 = jnp.sum(r_ref * b, axis=-1)
    b1 = -jnp.sum(r_cur * b, axis=-1)
    det = a00 * a11 - a01 * a01
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    d_ref = (a11 * b0 - a01 * b1) / det
    d_cur = (a00 * b1 - a01 * b0) / det
    p_ref = T_w_ref.t + d_ref[..., None] * r_ref
    p_cur = T_w_cur.t + d_cur[..., None] * r_cur
    return 0.5 * (p_ref + p_cur)


def depth_from_triangulation(T_cur_ref: SE3, f_ref: jnp.ndarray,
                             f_cur: jnp.ndarray):
    """Depth along the *reference* bearing from two bearing observations
    (ref matcher.cpp:123-153 depthFromTriangulation).

    Solves [R f_ref, -f_cur] [z_ref, z_cur]^T = t via normal equations.
    Returns (depth_ref, valid) where valid mirrors the reference's
    determinant gate `AtA.determinant() < 1e-6` (matcher.cpp:131) — but on
    the *normalized* system so the gate is scale-invariant in f32.
    """
    rf = T_cur_ref.rotate(f_ref)
    a00 = jnp.sum(rf * rf, axis=-1)
    a01 = -jnp.sum(rf * f_cur, axis=-1)
    a11 = jnp.sum(f_cur * f_cur, axis=-1)
    b0 = jnp.sum(rf * T_cur_ref.t, axis=-1)
    b1 = -jnp.sum(f_cur * T_cur_ref.t, axis=-1)
    det = a00 * a11 - a01 * a01
    valid = jnp.abs(det) >= 1e-6
    det_safe = jnp.where(valid, det, 1.0)
    depth = (a11 * b0 - a01 * b1) / det_safe
    return jnp.abs(depth), valid


def reproj_error_unit_plane(f: jnp.ndarray, xyz_cam: jnp.ndarray) -> jnp.ndarray:
    """Unit-plane reprojection error between bearing f and camera point
    (ref math_utils.cpp reprojError)."""
    uv_f = f[..., :2] / f[..., 2:3]
    uv_p = xyz_cam[..., :2] / xyz_cam[..., 2:3]
    return jnp.linalg.norm(uv_f - uv_p, axis=-1)


def compute_inliers(T_cur_ref: SE3, f_ref: jnp.ndarray, f_cur: jnp.ndarray,
                    reproj_thresh: jnp.ndarray, focal: jnp.ndarray):
    """Triangulate every correspondence and classify inliers by two-view
    reprojection error (ref math_utils.cpp:66-120 computeInliers).

    Returns (xyz_in_cur, inlier_mask, error_sum).  Points behind either
    camera are outliers.
    """
    # triangulate in "cur as world" coordinates: the ref camera's pose in the
    # cur frame is T_cur_ref, the cur camera sits at identity.
    T_ref_cur = T_cur_ref.inverse()
    xyz_cur = triangulate_midpoint(T_cur_ref, SE3.identity(dtype=f_ref.dtype),
                                   f_ref, f_cur)
    xyz_ref = T_ref_cur.apply(xyz_cur)
    e_cur = reproj_error_unit_plane(f_cur, xyz_cur) * focal
    e_ref = reproj_error_unit_plane(f_ref, xyz_ref) * focal
    err = e_cur + e_ref
    inlier = ((err < 2.0 * reproj_thresh)
              & (xyz_cur[..., 2] > 0) & (xyz_ref[..., 2] > 0))
    return xyz_cur, inlier, jnp.sum(jnp.where(inlier, err, 0.0), axis=-1)


def sampson_error(E: jnp.ndarray, f_ref: jnp.ndarray,
                  f_cur: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error of the epipolar constraint
    f_cur^T E f_ref (ref math_utils.cpp:186-201 / homography.cpp scoring)."""
    Ef1 = jnp.einsum("...ij,...nj->...ni", E, f_ref)
    Etf2 = jnp.einsum("...ji,...nj->...ni", E, f_cur)
    num = jnp.einsum("...ni,...ni->...n", f_cur, Ef1)
    den = (Ef1[..., 0] ** 2 + Ef1[..., 1] ** 2
           + Etf2[..., 0] ** 2 + Etf2[..., 1] ** 2)
    return num * num / jnp.maximum(den, 1e-12)


def essential_from_pose(T_cur_ref: SE3) -> jnp.ndarray:
    """E = [t]_x R mapping f_ref bearings to epipolar lines in cur."""
    return hat(T_cur_ref.t) @ T_cur_ref.rotation_matrix()


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of valid entries (ref math_utils.h getMedian, arena-safe)."""
    n = jnp.sum(mask.astype(jnp.int32))
    xs = jnp.sort(jnp.where(mask, x, jnp.inf))
    return xs[jnp.maximum(n - 1, 0) // 2]
