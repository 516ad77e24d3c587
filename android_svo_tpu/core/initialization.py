"""Two-frame monocular bootstrap — TPU-native rebuild of the reference's
`KltHomographyInit` (`initialization.cpp:32-138`): FAST detection on the
first frame, pyramidal KLT tracking to the second, a median-disparity gate,
relative pose from the epipolar constraint, triangulation, and map scaling
so the median scene depth equals `map_scale`.

Where the reference calls OpenCV (`cv::calcOpticalFlowPyrLK`
initialization.cpp:197, `cv::findFundamentalMat`/`recoverPose` :290-304), we
build both natively:
  * KLT = the same batched ICLK aligner as feature alignment, run
    coarse-to-fine with a large patch;
  * RANSAC = a fixed-trial, fully vectorized 8-point essential solve
    (T trials x batched SVD), Sampson-scored, cheirality-disambiguated —
    no data-dependent loop, one XLA program (SURVEY.md §7 L4).
The reference's PTAM homography path (homography.cpp) exists but is disabled
at its call site (initialization.cpp:78-79); the essential path is the live
one and is what we implement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry.camera import project2d
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.geometry.triangulation import (
    sampson_error, triangulate_midpoint, masked_median, compute_inliers)
from android_svo_tpu.ops import interp
from android_svo_tpu.ops.feature_align import align2d, patch_gradients


# ---------------------------------------------------------------------------
# pyramidal KLT (ref trackKlt, initialization.cpp:180-226)
# ---------------------------------------------------------------------------

def track_klt(ref_pyr, cur_pyr, px_ref: jnp.ndarray, valid: jnp.ndarray,
              cfg: SVOConfig, halfpatch: int = 7):
    """Track px_ref from ref to cur, coarse-to-fine.  Returns
    (px_cur, tracked_mask).  Window = (2*halfpatch+2)^2 ~ the reference's
    30x30 at full resolution spread across levels."""
    px_cur = px_ref
    n = px_ref.shape[0]
    tracked = valid
    for level in range(cfg.klt_max_level, -1, -1):
        s = 2.0 ** level
        ref_img = ref_pyr[level]
        cur_img = cur_pyr[level]
        pb = interp.extract_patches(ref_img, px_ref / s, halfpatch + 1)
        patch, gx, gy = patch_gradients(pb)
        uv, conv, _ = align2d(cur_img, patch, gx, gy, px_cur / s,
                              tracked, n_iter=cfg.klt_n_iter)
        px_cur = jnp.where(tracked[:, None], uv * s, px_cur)
        if level == 0:
            tracked = tracked & conv
    h, w = cur_pyr[0].shape
    tracked = tracked & interp.in_bounds(px_cur, h, w, halfpatch + 2)
    return px_cur, tracked


# ---------------------------------------------------------------------------
# vectorized 8-point essential RANSAC (replaces cv::findFundamentalMat +
# recoverPose, ref initialization.cpp:260-329)
# ---------------------------------------------------------------------------

def _eight_point(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """Batched 8-point: uv1/uv2 (T, 8, 2) unit-plane coords ->
    (T, 3, 3) essential matrices (rank-2 projected)."""
    u1, v1 = uv1[..., 0], uv1[..., 1]
    u2, v2 = uv2[..., 0], uv2[..., 1]
    one = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one],
                  axis=-1)                                  # (T, 8, 9)
    # null vector via SVD of A
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    e = vt[..., -1, :]                                      # (T, 9)
    E = e.reshape(e.shape[:-1] + (3, 3))
    # project to the essential manifold: singular values (1, 1, 0)
    u, s, vt2 = jnp.linalg.svd(E)
    d = jnp.zeros_like(s).at[..., 0].set(1.0).at[..., 1].set(1.0)
    return u @ (d[..., None] * vt2)


def _decompose_essential(E: jnp.ndarray):
    """E -> four (R, t) candidates (Hartley-Zisserman)."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))[..., None, None]
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[..., :, 2]
    return ((R1, t), (R1, -t), (R2, t), (R2, -t))


def estimate_relpose_ransac(f_ref: jnp.ndarray, f_cur: jnp.ndarray,
                            valid: jnp.ndarray, focal, cfg: SVOConfig,
                            key) -> tuple[SE3, jnp.ndarray]:
    """Fixed-trial vectorized RANSAC on the epipolar constraint.

    Returns (T_cur_ref with unit-norm translation, inlier_mask)."""
    dtype = f_ref.dtype
    C = f_ref.shape[0]
    T = cfg.ransac_n_trials
    uv_ref = project2d(f_ref)
    uv_cur = project2d(f_cur)

    # sample 8 valid correspondences per trial: random keys, invalid -> +inf
    r = jax.random.uniform(key, (T, C), dtype)
    r = jnp.where(valid[None, :], r, jnp.inf)
    idx = jnp.argsort(r, axis=-1)[:, :8]                    # (T, 8)
    E = _eight_point(uv_ref[idx], uv_cur[idx])              # (T,3,3)

    # score every hypothesis on all correspondences (Sampson on unit plane)
    err = sampson_error(E, _unproj(uv_ref), _unproj(uv_cur))  # (T, C)
    thresh = (cfg.ransac_thresh_px / focal) ** 2
    inl = (err < thresh) & valid[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    E_best = E[best]
    inlier = inl[best]

    # cheirality: pick the (R, t) with most points in front of both cameras
    cands = _decompose_essential(E_best)
    best_cnt = -jnp.ones((), jnp.int32)
    bq = jnp.zeros((4,), dtype).at[0].set(1.0)
    bt = jnp.zeros((3,), dtype)
    for R, t in cands:
        Tc = SE3.from_rt(R, t)
        xyz_cur = triangulate_midpoint(
            Tc, SE3.identity(dtype=dtype), f_ref, f_cur)
        xyz_ref = Tc.inverse().apply(xyz_cur)
        cnt = jnp.sum(inlier & (xyz_cur[..., 2] > 0)
                      & (xyz_ref[..., 2] > 0)).astype(jnp.int32)
        better = cnt > best_cnt
        bq = jnp.where(better, Tc.q, bq)
        bt = jnp.where(better, Tc.t, bt)
        best_cnt = jnp.where(better, cnt, best_cnt)
    return SE3(q=bq, t=bt), inlier


def _unproj(uv):
    return jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)


# ---------------------------------------------------------------------------
# homography RANSAC + Faugeras decomposition (ref vk::Homography,
# homography.cpp:38-283 — the PTAM planar-scene path).  Essential-matrix
# estimation degenerates for planar scenes, so like the reference we carry
# both models and pick by triangulation support.
# ---------------------------------------------------------------------------

def _four_point_dlt(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """Batched DLT homography from 4 correspondences: (T, 4, 2) x2 ->
    (T, 3, 3) with uv2 ~ H uv1 (unit-plane coords)."""
    u1, v1 = uv1[..., 0], uv1[..., 1]
    u2, v2 = uv2[..., 0], uv2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    rx = jnp.stack([-u1, -v1, -o, z, z, z, u2 * u1, u2 * v1, u2], axis=-1)
    ry = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    A = jnp.concatenate([rx, ry], axis=-2)                  # (T, 8, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[..., -1, :]
    return h.reshape(h.shape[:-1] + (3, 3))


def _homography_transfer_err(H: jnp.ndarray, uv1: jnp.ndarray,
                             uv2: jnp.ndarray) -> jnp.ndarray:
    """Forward transfer error |uv2 - proj(H uv1)|^2, (T, C)."""
    p = jnp.einsum("tij,cj->tci", H, _unproj(uv1))
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-12, 1e-12, p[..., 2])
    d = p[..., :2] / z[..., None] - uv2[None]
    return jnp.sum(d * d, axis=-1)


def _decompose_homography(H: jnp.ndarray):
    """Faugeras SVD decomposition into 8 (R, t, n) candidates
    (ref homography.cpp:91-204)."""
    U, S, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / denom, 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / denom, 0.0))
    V = Vt.T
    out = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            # case d' = +d2
            sin_t = (d1 - d3) * e1 * x1 * e3 * x3 / jnp.maximum(d2, 1e-12)
            cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / jnp.maximum(d2, 1e-12)
            Rp = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], H.dtype)
            Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-sin_t)
            Rp = Rp.at[2, 0].set(sin_t).at[2, 2].set(cos_t)
            tp = (d1 - d3) * jnp.stack(
                [e1 * x1, jnp.zeros_like(d1), -e3 * x3])
            npv = jnp.stack([e1 * x1, jnp.zeros_like(d1), e3 * x3])
            R = s * U @ Rp @ Vt
            t = U @ tp
            n = V @ npv
            out.append((R, t, n))
            # case d' = -d2
            sin_p = (d1 + d3) * e1 * x1 * e3 * x3 / jnp.maximum(d2, 1e-12)
            cos_p = (d3 * x1 * x1 - d1 * x3 * x3) / jnp.maximum(d2, 1e-12)
            Rp2 = jnp.zeros((3, 3), H.dtype)
            Rp2 = Rp2.at[0, 0].set(cos_p).at[0, 2].set(sin_p)
            Rp2 = Rp2.at[1, 1].set(-1.0)
            Rp2 = Rp2.at[2, 0].set(sin_p).at[2, 2].set(-cos_p)
            tp2 = (d1 + d3) * jnp.stack(
                [e1 * x1, jnp.zeros_like(d1), e3 * x3])
            R2 = s * U @ Rp2 @ Vt
            t2 = U @ tp2
            out.append((R2, t2, n))
    return out


def estimate_homography_ransac(f_ref: jnp.ndarray, f_cur: jnp.ndarray,
                               valid: jnp.ndarray, focal, cfg: SVOConfig,
                               key) -> tuple[SE3, jnp.ndarray]:
    """Fixed-trial vectorized homography RANSAC + decomposition.
    Returns (T_cur_ref with |t| arbitrary, inlier_mask)."""
    dtype = f_ref.dtype
    C = f_ref.shape[0]
    T = cfg.ransac_n_trials
    uv_ref = project2d(f_ref)
    uv_cur = project2d(f_cur)

    r = jax.random.uniform(key, (T, C), dtype)
    r = jnp.where(valid[None, :], r, jnp.inf)
    idx = jnp.argsort(r, axis=-1)[:, :4]
    Hs = _four_point_dlt(uv_ref[idx], uv_cur[idx])
    err = _homography_transfer_err(Hs, uv_ref, uv_cur)
    thresh = (cfg.ransac_thresh_px / focal) ** 2
    inl = (err < thresh) & valid[None, :]
    best = jnp.argmax(jnp.sum(inl, axis=-1))
    H_best = Hs[best]
    inlier = inl[best]

    cands = _decompose_homography(H_best)
    best_cnt = -jnp.ones((), jnp.int32)
    bq = jnp.zeros((4,), dtype).at[0].set(1.0)
    bt = jnp.zeros((3,), dtype)
    for R, t, n in cands:
        tn = jnp.linalg.norm(t)
        t_unit = t / jnp.maximum(tn, 1e-12)
        Tc = SE3.from_rt(R, t_unit)
        xyz_cur = triangulate_midpoint(
            Tc, SE3.identity(dtype=dtype), f_ref, f_cur)
        xyz_ref = Tc.inverse().apply(xyz_cur)
        cnt = jnp.sum(inlier & (xyz_cur[..., 2] > 0)
                      & (xyz_ref[..., 2] > 0)).astype(jnp.int32)
        # degenerate (pure-rotation) solutions have ~zero translation; skip
        cnt = jnp.where(tn < 1e-6, -1, cnt)
        better = cnt > best_cnt
        bq = jnp.where(better, Tc.q, bq)
        bt = jnp.where(better, Tc.t, bt)
        best_cnt = jnp.where(better, cnt, best_cnt)
    return SE3(q=bq, t=bt), inlier


# ---------------------------------------------------------------------------
# full two-frame bootstrap (ref addSecondFrame, initialization.cpp:61-138)
# ---------------------------------------------------------------------------

def bootstrap_pair(ref_pyr, cur_pyr, cam, px_ref: jnp.ndarray,
                   valid: jnp.ndarray, cfg: SVOConfig, key):
    """Returns a dict with the relative pose (scaled), triangulated points in
    the ref frame, per-correspondence masks, and diagnostics.  The caller
    (frame handler) gates on `disparity` and `n_inliers` and populates the
    arenas."""
    dtype = px_ref.dtype
    px_cur, tracked = track_klt(ref_pyr, cur_pyr, px_ref, valid, cfg)
    disparity = masked_median(
        jnp.linalg.norm(px_cur - px_ref, axis=-1), tracked)

    f_ref = cam.cam2world(px_ref)
    f_cur = cam.cam2world(px_cur)

    # two-model estimation: essential (general scenes) + homography (planar
    # scenes, where the 8-point solution degenerates).  The reference keeps
    # both paths too (initialization.cpp:78-79); we select by two-view
    # triangulation support instead of hardcoding one.
    ke, kh = jax.random.split(key)
    T_e, _ = estimate_relpose_ransac(
        f_ref, f_cur, tracked, cam.errorMultiplier2(), cfg, ke)
    T_h, _ = estimate_homography_ransac(
        f_ref, f_cur, tracked, cam.errorMultiplier2(), cfg, kh)
    _, inl_e, err_e = compute_inliers(
        T_e, f_ref, f_cur, jnp.asarray(cfg.reproj_thresh, dtype),
        cam.errorMultiplier2())
    _, inl_h, err_h = compute_inliers(
        T_h, f_ref, f_cur, jnp.asarray(cfg.reproj_thresh, dtype),
        cam.errorMultiplier2())
    inl_e = inl_e & tracked
    inl_h = inl_h & tracked
    use_h = jnp.sum(inl_h) > jnp.sum(inl_e)
    T_cur_ref = SE3(q=jnp.where(use_h, T_h.q, T_e.q),
                    t=jnp.where(use_h, T_h.t, T_e.t))
    inlier = jnp.where(use_h, inl_h, inl_e)

    # triangulate in the ref frame: ref camera at identity, cur at T_cur_ref
    xyz_ref = triangulate_midpoint(
        SE3.identity(dtype=dtype), T_cur_ref.inverse(), f_ref, f_cur)
    good = inlier & (xyz_ref[..., 2] > 1e-3)
    z_cur = T_cur_ref.apply(xyz_ref)[..., 2]
    good = good & (z_cur > 1e-3)

    # rescale so median depth = map_scale (ref initialization.cpp:92-115)
    depth_med = masked_median(xyz_ref[..., 2], good)
    scale = cfg.map_scale / jnp.maximum(depth_med, 1e-6)
    xyz_ref = xyz_ref * scale
    T_scaled = SE3(q=T_cur_ref.q, t=T_cur_ref.t * scale)

    return {
        "T_cur_ref": T_scaled,
        "px_cur": px_cur,
        "f_ref": f_ref,
        "f_cur": f_cur,
        "xyz_ref": xyz_ref,
        "tracked": tracked,
        "inlier": good,
        "disparity": disparity,
        "n_tracked": jnp.sum(tracked).astype(jnp.int32),
        "n_inliers": jnp.sum(good).astype(jnp.int32),
    }
