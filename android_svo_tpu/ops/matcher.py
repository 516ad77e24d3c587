"""Patch warping and direct matching — TPU-native rebuild of the reference's
`Matcher` (`matcher.cpp:36-352`): affine patch warp across views/levels,
search-level selection, direct subpixel matching (`findMatchDirect`), and the
epipolar-line ZMSSD search for depth-filter seeds
(`findEpipolarMatchDirect`).

Everything is batched over N features/seeds; keyframe images come in as a
stacked arena `(K, H_l, W_l)` per pyramid level with a per-feature keyframe
index, so one gather serves all features regardless of which keyframe each
references.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.geometry.camera import project2d, unproject2d
from android_svo_tpu.geometry.triangulation import depth_from_triangulation
from android_svo_tpu.ops import interp
from android_svo_tpu.ops.feature_align import align2d, patch_gradients


# ---------------------------------------------------------------------------
# affine warp (ref matcher.cpp:36-121)
# ---------------------------------------------------------------------------

def get_warp_matrix_affine(cam, px_ref: jnp.ndarray, f_ref: jnp.ndarray,
                           depth_ref: jnp.ndarray, T_cur_ref: SE3,
                           level_ref: jnp.ndarray,
                           halfpatch: int) -> jnp.ndarray:
    """First-order affine approximation A_cur_ref of the ref->cur pixel
    warp around each feature (ref warp::getWarpMatrixAffine, matcher.cpp:36).

    Probes how the pixels halfpatch to the right/below the feature (at the
    feature's pyramid level) move under the depth-induced homography.
    """
    xyz_ref = f_ref * depth_ref[..., None]
    step = (halfpatch + 1) * (2.0 ** level_ref.astype(px_ref.dtype))
    px_du = px_ref + jnp.stack([step, jnp.zeros_like(step)], axis=-1)
    px_dv = px_ref + jnp.stack([jnp.zeros_like(step), step], axis=-1)
    # unproject at the same depth plane (z of xyz_ref), ref matcher.cpp:47-50
    f_du = cam.cam2world(px_du)
    f_dv = cam.cam2world(px_dv)
    z = xyz_ref[..., 2:3]
    xyz_du = f_du / f_du[..., 2:3] * z
    xyz_dv = f_dv / f_dv[..., 2:3] * z
    uv_cur = cam.world2cam(T_cur_ref.apply(xyz_ref))
    uv_du = cam.world2cam(T_cur_ref.apply(xyz_du))
    uv_dv = cam.world2cam(T_cur_ref.apply(xyz_dv))
    col0 = (uv_du - uv_cur) / step[..., None]
    col1 = (uv_dv - uv_cur) / step[..., None]
    return jnp.stack([col0, col1], axis=-1)                 # (N, 2, 2)


def get_best_search_level(A_cur_ref: jnp.ndarray,
                          max_level: int) -> jnp.ndarray:
    """Pyramid level where the warped patch's area shrinks below 3
    (ref getBestSearchLevel, matcher.cpp:65-80)."""
    D = jnp.abs(jnp.linalg.det(A_cur_ref))                  # (N,)
    level = jnp.zeros(D.shape, jnp.int32)
    for _ in range(max_level):
        step_up = D > 3.0
        level = level + step_up.astype(jnp.int32)
        D = jnp.where(step_up, D * 0.25, D)
    return jnp.minimum(level, max_level)


def warp_affine_stack(imgs_by_level, kf_idx: jnp.ndarray,
                      A_cur_ref: jnp.ndarray, px_ref: jnp.ndarray,
                      level_ref: jnp.ndarray, search_level: jnp.ndarray,
                      halfpatch_border: int, n_ref_levels: int):
    """Warp reference patches (with border) out of the keyframe arena.

    For each patch pixel (in search-level units, centered), the ref-image
    coordinate is px_ref/2^level_ref + A_ref_cur @ (px_patch * 2^search_level
    / 2^level_ref) (ref warpAffine, matcher.cpp:83-121).

    imgs_by_level: tuple over pyramid levels of (K, H_l, W_l) arrays.
    Returns (N, P, P) patches with P = 2*halfpatch_border, plus a validity
    mask (A invertible; bounds are handled by clamped sampling).
    """
    n = px_ref.shape[0]
    p = 2 * halfpatch_border
    dtype = px_ref.dtype
    det = jnp.linalg.det(A_cur_ref)
    ok = jnp.abs(det) > 1e-8
    A_safe = jnp.where(ok[:, None, None], A_cur_ref,
                       jnp.eye(2, dtype=dtype))
    A_ref_cur = jnp.linalg.inv(A_safe)                      # (N,2,2)

    offs = interp.patch_offsets(halfpatch_border, dtype)    # (P*P, 2)
    scale_s = (2.0 ** search_level.astype(dtype))[:, None, None]
    # patch offsets in level-0 ref pixels:
    d_ref0 = jnp.einsum("nij,aj->nai", A_ref_cur, offs) * scale_s
    patch = jnp.zeros((n, p * p), dtype)
    # gather from the feature's own pyramid level (data-dependent level ->
    # masked accumulation over the static level range)
    for lr in range(n_ref_levels):
        sel = level_ref == lr
        imgs = imgs_by_level[lr]
        coords = (px_ref[:, None, :] + d_ref0) / (2.0 ** lr)
        vals = interp.bilinear_sample_stack(imgs, kf_idx, coords)
        patch = jnp.where(sel[:, None], vals, patch)
    return patch.reshape(n, p, p), ok


# ---------------------------------------------------------------------------
# ZMSSD (ref patch_score.h:40-220)
# ---------------------------------------------------------------------------

def zmssd(ref_patch: jnp.ndarray, cur_patches: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean SSD between one ref patch (..., A) and candidate patches
    (..., K, A). Lower is better (ref ZMSSD::computeScore)."""
    r = ref_patch - ref_patch.mean(axis=-1, keepdims=True)
    c = cur_patches - cur_patches.mean(axis=-1, keepdims=True)
    d = c - r[..., None, :]
    return jnp.sum(d * d, axis=-1)


# ---------------------------------------------------------------------------
# direct match (ref findMatchDirect, matcher.cpp:156-204)
# ---------------------------------------------------------------------------

def find_match_direct(cur_pyr, ref_imgs_by_level, kf_idx, cam,
                      px_ref, f_ref, depth_ref, level_ref,
                      T_cur_ref: SE3, px_cur_init, valid,
                      cfg: SVOConfig):
    """Subpixel match of map points into the current frame.

    Warps each point's reference patch to the current view, picks the best
    search level from the affine warp, and runs batched 2D ICLK around the
    projected position.  Returns (px_cur level-0, search_level, success).
    """
    halfpatch = cfg.patch_halfsize
    A = get_warp_matrix_affine(cam, px_ref, f_ref, depth_ref, T_cur_ref,
                               level_ref, halfpatch)
    n_levels = min(len(cur_pyr), cfg.max_search_level + 1)
    search_level = get_best_search_level(A, n_levels - 1)
    patch_b, ok_warp = warp_affine_stack(
        ref_imgs_by_level, kf_idx, A, px_ref, level_ref, search_level,
        halfpatch + 1, len(ref_imgs_by_level))
    ref_patch, gx, gy = patch_gradients(patch_b)

    scale_s = 2.0 ** search_level.astype(px_ref.dtype)
    uv_init = px_cur_init / scale_s[:, None]
    valid = valid & ok_warp

    # batched align at each static search level, merged by mask
    uv_out = uv_init
    conv_out = jnp.zeros(valid.shape, bool)
    for ls in range(n_levels):
        sel = (search_level == ls) & valid
        uv_l, conv_l, _ = align2d(cur_pyr[ls], ref_patch, gx, gy,
                                  uv_init, sel, cfg.align_max_iter)
        uv_out = jnp.where(sel[:, None], uv_l, uv_out)
        conv_out = jnp.where(sel, conv_l, conv_out)

    px_cur = uv_out * scale_s[:, None]
    return px_cur, search_level, conv_out & valid


# ---------------------------------------------------------------------------
# epipolar match (ref findEpipolarMatchDirect, matcher.cpp:207-352)
# ---------------------------------------------------------------------------

def find_epipolar_match(cur_pyr, ref_imgs_by_level, kf_idx, cam,
                        px_ref, f_ref, level_ref, T_cur_ref: SE3,
                        d_estimate, d_min, d_max, valid,
                        cfg: SVOConfig):
    """Search along the epipolar segment [d_min, d_max] for the best ZMSSD
    match of each seed's reference patch, refine to subpixel, and
    triangulate depth.

    All seeds share a fixed number of scan steps (`cfg.max_epi_search_steps`)
    with masking — the TPU-shape equivalent of the reference's dynamic
    `n_steps = epi_length/0.7` loop (matcher.cpp:280-324, which also aborts
    if n_steps > 1000).

    Returns (depth, px_cur, success).
    """
    halfpatch = cfg.patch_halfsize
    area = (2 * halfpatch) ** 2
    n = px_ref.shape[0]
    dtype = px_ref.dtype
    n_levels = min(len(cur_pyr), cfg.max_search_level + 1)

    # endpoints of the epipolar segment on the cur unit plane
    uv_A = project2d(T_cur_ref.apply(f_ref * d_min[..., None]))
    uv_B = project2d(T_cur_ref.apply(f_ref * d_max[..., None]))
    z_A = T_cur_ref.apply(f_ref * d_min[..., None])[..., 2]
    z_B = T_cur_ref.apply(f_ref * d_max[..., None])[..., 2]

    # affine warp + search level from the current depth estimate
    A_warp = get_warp_matrix_affine(cam, px_ref, f_ref, d_estimate,
                                    T_cur_ref, level_ref, halfpatch)
    search_level = get_best_search_level(A_warp, n_levels - 1)
    patch_b, ok_warp = warp_affine_stack(
        ref_imgs_by_level, kf_idx, A_warp, px_ref, level_ref, search_level,
        halfpatch + 1, len(ref_imgs_by_level))
    ref_patch, gx, gy = patch_gradients(patch_b)
    ref_flat = ref_patch.reshape(n, area)

    # pixel-space segment (level 0)
    px_A = cam.world2cam_uv(uv_A)
    px_B = cam.world2cam_uv(uv_B)
    scale_s = 2.0 ** search_level.astype(dtype)
    epi_len = jnp.linalg.norm(px_A - px_B, axis=-1) / scale_s

    # K candidate unit-plane positions uniformly on the segment
    K = cfg.max_epi_search_steps
    ts = jnp.linspace(0.0, 1.0, K, dtype=dtype)             # (K,)
    uv_cand = (uv_A[:, None, :] * (1 - ts[None, :, None])
               + uv_B[:, None, :] * ts[None, :, None])      # (N,K,2)
    px_cand0 = cam.world2cam_uv(uv_cand)                    # level-0 px
    # limit to ~0.7px spacing: steps beyond the needed count collapse
    # to the segment (they just oversample; masking not required for
    # correctness, only acceptance quality)

    # score candidates per seed at its search level (masked static levels)
    score = jnp.full((n, K), jnp.inf, dtype)
    for ls in range(n_levels):
        sel = search_level == ls
        h, w = cur_pyr[ls].shape
        px_l = px_cand0 / (2.0 ** ls)
        inb = interp.in_bounds(px_l, h, w, halfpatch + 2)
        offs = interp.patch_offsets(halfpatch, dtype)        # (A,2)
        coords = px_l[:, :, None, :] + offs[None, None, :, :]
        cand = interp.bilinear_sample(cur_pyr[ls], coords)   # (N,K,A)
        s = zmssd(ref_flat, cand)
        s = jnp.where(inb, s, jnp.inf)
        score = jnp.where(sel[:, None], s, score)

    best = jnp.argmin(score, axis=-1)                        # (N,)
    best_score = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]
    # acceptance threshold (ref patch_score.h:46: 2000 * area)
    thresh = cfg.zmssd_threshold_factor * area
    px_best0 = jnp.take_along_axis(
        px_cand0, best[:, None, None].repeat(2, -1), axis=1)[:, 0, :]

    # short-segment case: skip the scan, align directly from the estimate
    # (ref matcher.cpp:257-276: epi_length < 2.0)
    uv_est = project2d(T_cur_ref.apply(f_ref * d_estimate[..., None]))
    px_est0 = cam.world2cam_uv(uv_est)
    short = epi_len < 2.0
    px_start0 = jnp.where(short[:, None], px_est0, px_best0)
    score_ok = short | (best_score < thresh)

    # subpixel refinement at the search level
    valid_all = valid & ok_warp & score_ok
    uv_out = px_start0 / scale_s[:, None]
    conv_out = jnp.zeros((n,), bool)
    for ls in range(n_levels):
        sel = (search_level == ls) & valid_all
        uv_l, conv_l, _ = align2d(cur_pyr[ls], ref_patch, gx, gy,
                                  px_start0 / (2.0 ** ls), sel,
                                  cfg.subpix_n_iter)
        uv_out = jnp.where(sel[:, None], uv_l, uv_out)
        conv_out = jnp.where(sel, conv_l, conv_out)
    px_cur = uv_out * scale_s[:, None]

    # triangulate depth along the ref bearing (ref matcher.cpp:344-351)
    f_cur = cam.cam2world(px_cur)
    depth, tri_ok = depth_from_triangulation(T_cur_ref, f_ref, f_cur)
    behind = (z_A <= 1e-3) & (z_B <= 1e-3)
    success = valid_all & conv_out & tri_ok & ~behind
    return depth, px_cur, success
