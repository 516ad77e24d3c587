"""Patch warping and direct matching — TPU-native rebuild of the reference's
`Matcher` (`matcher.cpp:36-352`): affine patch warp across views/levels,
search-level selection, direct subpixel matching (`findMatchDirect`), and the
epipolar-line ZMSSD search for depth-filter seeds
(`findEpipolarMatchDirect`).

Everything is batched over N features/seeds.  Images are padded pyramid
stacks (ops/pyramid.build_stack): the current frame as one `(L, Hp, Wp)`
array, keyframes as a `(K, L, Hp, Wp)` arena.  Patch reads on the hot
per-iteration paths go through the Pallas window kernels
(`ops/patch_pallas`): `epi_scan` for the ZMSSD sweep and `align_iclk` for
subpixel refinement — the replacements for the reference's SSE2 ZMSSD
(`patch_score.h:87-196`) and SSE2/NEON `align2D`
(`feature_alignment.cpp:286/453`).  The once-per-frame affine warp reads
the keyframe arena through one merged (K*L)-plane gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.geometry.camera import project2d, unproject2d
from android_svo_tpu.geometry.linsolve import det2x2, inv2x2, inv_spd
from android_svo_tpu.geometry.triangulation import depth_from_triangulation
from android_svo_tpu.ops import interp
from android_svo_tpu.ops import patch_pallas as pp
from android_svo_tpu.ops.feature_align import patch_gradients


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
    D = jnp.abs(det2x2(A_cur_ref))                          # (N,)
    level = jnp.zeros(D.shape, jnp.int32)
    for _ in range(max_level):
        step_up = D > 3.0
        level = level + step_up.astype(jnp.int32)
        D = jnp.where(step_up, D * 0.25, D)
    return jnp.minimum(level, max_level)


def warp_affine_stack(kf_stack: jnp.ndarray, kf_idx: jnp.ndarray,
                      A_cur_ref: jnp.ndarray, px_ref: jnp.ndarray,
                      level_ref: jnp.ndarray, search_level: jnp.ndarray,
                      halfpatch_border: int, h: int, w: int):
    """Warp reference patches (with border) out of the keyframe arena.

    For each patch pixel (in search-level units, centered), the ref-image
    coordinate is px_ref/2^level_ref + A_ref_cur @ (px_patch * 2^search_level
    / 2^level_ref) (ref warpAffine, matcher.cpp:83-121).

    kf_stack: (K, L, Hp, Wp) padded keyframe pyramid arena.  The gather
    merges the (kf, level) axes so one `bilinear_sample_stack` serves all
    features regardless of which keyframe/level each references; coords are
    clamped to the TRUE level dims (h>>l, w>>l) so the zero padding never
    bleeds in (the reference clamps to the image border the same way).
    Returns (N, P, P) patches with P = 2*halfpatch_border, plus a validity
    mask (A invertible).
    """
    n = px_ref.shape[0]
    p = 2 * halfpatch_border
    dtype = px_ref.dtype
    K, L, Hp, Wp = kf_stack.shape
    det = det2x2(A_cur_ref)
    ok = jnp.abs(det) > 1e-8
    A_safe = jnp.where(ok[:, None, None], A_cur_ref,
                       jnp.eye(2, dtype=dtype))
    A_ref_cur = inv2x2(A_safe)                              # (N,2,2)

    lvl = jnp.clip(level_ref.astype(jnp.int32), 0, L - 1)
    offs = interp.patch_offsets(halfpatch_border, dtype)    # (P*P, 2)
    scale_s = (2.0 ** search_level.astype(dtype))[:, None, None]
    # patch offsets in level-0 ref pixels:
    d_ref0 = jnp.einsum("nij,aj->nai", A_ref_cur, offs) * scale_s
    scale_r = (2.0 ** lvl.astype(dtype))[:, None, None]
    coords = (px_ref[:, None, :] + d_ref0) / scale_r        # (N, A, 2)
    wl = (w >> lvl).astype(dtype)[:, None]
    hl = (h >> lvl).astype(dtype)[:, None]
    coords = jnp.stack([
        jnp.clip(coords[..., 0], 0.0, wl - 1.001),
        jnp.clip(coords[..., 1], 0.0, hl - 1.001)], axis=-1)
    merged = kf_stack.reshape(K * L, Hp, Wp)
    idx = jnp.clip(kf_idx.astype(jnp.int32), 0, K - 1) * L + lvl
    vals = interp.bilinear_sample_stack(merged, idx, coords)
    return vals.reshape(n, p, p), ok


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


def _zmssd_accept(cur_stack, search_level, ref_patch, uv_out, ok,
                  cfg: SVOConfig, use_pallas):
    """Appearance gate on a converged direct match: ZMSSD between the
    warped reference patch and the current patch at the aligned position,
    against the reference's epipolar-acceptance threshold
    (patch_score.h:46, 2000*area).  `cfg.direct_match_zmssd` rationale in
    config.py — a converged ICLK alone is no evidence of a match on
    occluded/unknown scenery."""
    n, p, _ = ref_patch.shape
    area = p * p
    cur = pp.sample_patches(cur_stack, search_level, uv_out, p // 2,
                            valid=ok, use_pallas=use_pallas)
    cur = cur.reshape(n, area)
    score = zmssd(ref_patch.reshape(n, area), cur[:, None, :])[:, 0]
    # information floor: a flat current patch "converges" trivially via
    # the mean term — no texture, no match (cfg.match_min_patch_std)
    textured = cur.std(axis=-1) >= cfg.match_min_patch_std
    return ok & textured & (score < cfg.zmssd_threshold_factor * area)


# ---------------------------------------------------------------------------
# 1D alignment along a direction on the stack (ref align1D,
# feature_alignment.cpp:35-133 — the edgelet / short-epipolar path)
# ---------------------------------------------------------------------------

def align1d_stack(stack, lvl, ref_patch, ref_dx, ref_dy, direction,
                  init_uv, valid, n_iter: int, h: int, w: int,
                  use_pallas=None):
    """Batched 1D ICLK along per-feature unit `direction` with
    mean-brightness term.  Off the hot path (cfg.epi_search_1d, default
    off), so patch reads go through `sample_patches` per iteration instead
    of a dedicated fused kernel."""
    n, p, _ = ref_patch.shape
    area = p * p
    half = p // 2
    dtype = init_uv.dtype
    T = ref_patch.reshape(n, area)
    gdir = (direction[:, 0:1] * ref_dx.reshape(n, area)
            + direction[:, 1:2] * ref_dy.reshape(n, area))
    ones = jnp.ones_like(gdir)
    J = jnp.stack([gdir, ones], axis=-1)                    # (N, A, 2)
    H = jnp.einsum("nai,naj->nij", J, J) + 1e-6 * jnp.eye(2, dtype=dtype)
    Hinv = inv_spd(H)
    lvl = jnp.clip(lvl.astype(jnp.int32), 0, stack.shape[0] - 1)
    wl = (w >> lvl).astype(dtype)
    hl = (h >> lvl).astype(dtype)
    m = half + 1.0

    def inb(uv):
        return ((uv[..., 0] >= m) & (uv[..., 0] < wl - 1 - m)
                & (uv[..., 1] >= m) & (uv[..., 1] < hl - 1 - m))

    def body(it, carry):
        del it
        uv, mean = carry
        ok = valid & inb(uv)
        cur = pp.sample_patches(stack, lvl, uv, half, valid=ok,
                                use_pallas=use_pallas).reshape(n, area)
        r = cur - T + mean[:, None]
        g = jnp.einsum("nai,na->ni", J, r)
        upd = jnp.einsum("nij,nj->ni", Hinv, g)
        uv_new = uv - upd[:, 0:1] * direction
        mean_new = mean - upd[:, 1]
        uv = jnp.where(ok[:, None], uv_new, uv)
        mean = jnp.where(ok, mean_new, mean)
        return uv, mean

    uv, mean = jax.lax.fori_loop(0, n_iter, body,
                                 (init_uv, jnp.zeros((n,), dtype)))
    ok = valid & inb(uv)
    drift = jnp.linalg.norm(uv - init_uv, axis=-1)
    converged = ok & (drift < p)
    return uv, converged, mean


# ---------------------------------------------------------------------------
# warped-patch cache helpers (the amortized form of warpAffine,
# matcher.cpp:83-121: a per-frame BUDGET of features re-warps; matching
# reads the cache)
# ---------------------------------------------------------------------------

def compute_warp_batch(kf_stack, kf_idx, cam, px_ref, f_ref, depth_ref,
                       level_ref, T_cur_ref: SE3, valid, cfg: SVOConfig,
                       ref_grad=None):
    """Warp one batch of reference patches out of the keyframe arena:
    affine matrix -> search level -> border patch (+ warped gradient
    direction for edgelets).  Returns (patch_b, search_level, grad_cur, ok).
    """
    halfpatch = cfg.patch_halfsize
    h, w = cam.height, cam.width
    A = get_warp_matrix_affine(cam, px_ref, f_ref, depth_ref, T_cur_ref,
                               level_ref, halfpatch)
    search_level = get_best_search_level(A, cfg.max_search_level)
    patch_b, ok_warp = warp_affine_stack(
        kf_stack, kf_idx, A, px_ref, level_ref, search_level,
        halfpatch + 1, h, w)
    if ref_grad is not None:
        g = jnp.einsum("nij,nj->ni", A, ref_grad)
        grad_cur = g / jnp.maximum(
            jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8)
    else:
        grad_cur = None
    return patch_b, search_level, grad_cur, valid & ok_warp


def identity_warp_patches(kf_stack, kf_idx, px_ref, level_ref, valid,
                          cfg: SVOConfig, h: int, w: int):
    """Spawn-time cache fill: the zero-baseline warp (A = identity, search
    level 0) — exactly what `getWarpMatrixAffine` produces for a feature
    born in the current frame.  Returns (patch_b, search_level, ok)."""
    n = px_ref.shape[0]
    A = jnp.broadcast_to(jnp.eye(2, dtype=px_ref.dtype), (n, 2, 2))
    search_level = jnp.zeros((n,), jnp.int32)
    patch_b, ok_warp = warp_affine_stack(
        kf_stack, kf_idx, A, px_ref, level_ref, search_level,
        cfg.patch_halfsize + 1, h, w)
    return patch_b, search_level, valid & ok_warp


def match_cached(cur_stack, cam, ref_patch_b, search_level, px_cur_init,
                 valid, cfg: SVOConfig, warp_grad=None, ref_type=None):
    """Subpixel match against CACHED warped reference patches (the cached
    form of findMatchDirect's align step, matcher.cpp:179-200).

    Returns (px_cur level-0, success)."""
    use_pallas = pp.cfg_use_pallas(cfg)
    h, w = cam.height, cam.width
    n_levels = min(cur_stack.shape[0], cfg.max_search_level + 1)
    cur_stack = cur_stack[:n_levels]
    search_level = jnp.clip(search_level, 0, n_levels - 1)
    ref_patch, gx, gy = patch_gradients(ref_patch_b)
    scale_s = 2.0 ** search_level.astype(px_cur_init.dtype)
    uv_init = px_cur_init / scale_s[:, None]

    gated_inline = cfg.align_mxu and not (cfg.edgelet_detection
                                          and warp_grad is not None)
    if cfg.align_mxu:
        uv_out, conv, _ = pp.align_iclk_mxu(
            cur_stack, search_level, ref_patch, gx, gy, uv_init, valid,
            cfg.align_max_iter, h, w, use_pallas=use_pallas,
            zmssd_factor=(cfg.zmssd_threshold_factor
                          if gated_inline and cfg.direct_match_zmssd
                          else None),
            min_patch_std=(cfg.match_min_patch_std
                           if gated_inline and cfg.direct_match_zmssd
                           else None))
    else:
        uv_out, conv, _ = pp.align_iclk(
            cur_stack, search_level, ref_patch, gx, gy, uv_init, valid,
            cfg.align_max_iter, h, w, use_pallas=use_pallas)

    if cfg.edgelet_detection and warp_grad is not None:
        from android_svo_tpu.ops.detect import FTYPE_EDGELET
        is_edge = (ref_type == FTYPE_EDGELET) & valid
        uv_e, conv_e, _ = align1d_stack(
            cur_stack, search_level, ref_patch, gx, gy, warp_grad, uv_init,
            is_edge, cfg.align_max_iter, h, w, use_pallas=use_pallas)
        uv_out = jnp.where(is_edge[:, None], uv_e, uv_out)
        conv = jnp.where(is_edge, conv_e, conv)

    success = conv & valid
    if cfg.direct_match_zmssd and not gated_inline:
        success = _zmssd_accept(cur_stack, search_level, ref_patch, uv_out,
                                success, cfg, use_pallas)
    px_cur = uv_out * scale_s[:, None]
    return px_cur, success


# ---------------------------------------------------------------------------
# direct match (ref findMatchDirect, matcher.cpp:156-204)
# ---------------------------------------------------------------------------

def find_match_direct(cur_stack, kf_stack, kf_idx, cam,
                      px_ref, f_ref, depth_ref, level_ref,
                      T_cur_ref: SE3, px_cur_init, valid,
                      cfg: SVOConfig, ref_grad=None, ref_type=None):
    """Subpixel match of map points into the current frame.

    Warps each point's reference patch to the current view, picks the best
    search level from the affine warp, and runs batched fused ICLK around
    the projected position.  Returns (px_cur level-0, search_level,
    success).

    When `cfg.edgelet_detection` and `ref_grad`/`ref_type` are given,
    EDGELET features are aligned 1D along their warped gradient direction
    instead of the full 2D ICLK (ref matcher.cpp:192-200:
    `A_cur_ref_*ref_ftr.grad` -> align1D).
    """
    halfpatch = cfg.patch_halfsize
    use_pallas = pp.cfg_use_pallas(cfg)
    h, w = cam.height, cam.width
    A = get_warp_matrix_affine(cam, px_ref, f_ref, depth_ref, T_cur_ref,
                               level_ref, halfpatch)
    n_levels = min(cur_stack.shape[0], cfg.max_search_level + 1)
    # only the searchable levels enter the (VMEM-resident) kernel stack
    cur_stack = cur_stack[:n_levels]
    search_level = get_best_search_level(A, n_levels - 1)
    patch_b, ok_warp = warp_affine_stack(
        kf_stack, kf_idx, A, px_ref, level_ref, search_level,
        halfpatch + 1, h, w)
    ref_patch, gx, gy = patch_gradients(patch_b)

    scale_s = 2.0 ** search_level.astype(px_ref.dtype)
    uv_init = px_cur_init / scale_s[:, None]
    valid = valid & ok_warp

    gated_inline = cfg.align_mxu and not (cfg.edgelet_detection
                                          and ref_grad is not None)
    if cfg.align_mxu:
        uv_out, conv, _ = pp.align_iclk_mxu(
            cur_stack, search_level, ref_patch, gx, gy, uv_init, valid,
            cfg.align_max_iter, h, w, use_pallas=use_pallas,
            zmssd_factor=(cfg.zmssd_threshold_factor
                          if gated_inline and cfg.direct_match_zmssd
                          else None),
            min_patch_std=(cfg.match_min_patch_std
                           if gated_inline and cfg.direct_match_zmssd
                           else None))
    else:
        uv_out, conv, _ = pp.align_iclk(
            cur_stack, search_level, ref_patch, gx, gy, uv_init, valid,
            cfg.align_max_iter, h, w, use_pallas=use_pallas)

    if cfg.edgelet_detection and ref_grad is not None:
        from android_svo_tpu.ops.detect import FTYPE_EDGELET
        is_edge = (ref_type == FTYPE_EDGELET) & valid
        # gradient direction carried into the current view by the affine
        # warp (ref matcher.cpp:192: A_cur_ref_ * ref_ftr.grad)
        dir_cur = jnp.einsum("nij,nj->ni", A, ref_grad)
        dir_cur = dir_cur / jnp.maximum(
            jnp.linalg.norm(dir_cur, axis=-1, keepdims=True), 1e-8)
        uv_e, conv_e, _ = align1d_stack(
            cur_stack, search_level, ref_patch, gx, gy, dir_cur, uv_init,
            is_edge, cfg.align_max_iter, h, w, use_pallas=use_pallas)
        uv_out = jnp.where(is_edge[:, None], uv_e, uv_out)
        conv = jnp.where(is_edge, conv_e, conv)

    success = conv & valid
    if cfg.direct_match_zmssd and not gated_inline:
        success = _zmssd_accept(cur_stack, search_level, ref_patch, uv_out,
                                success, cfg, use_pallas)
    px_cur = uv_out * scale_s[:, None]
    return px_cur, search_level, success


# ---------------------------------------------------------------------------
# epipolar match (ref findEpipolarMatchDirect, matcher.cpp:207-352)
# ---------------------------------------------------------------------------

def find_epipolar_match(cur_stack, kf_stack, kf_idx, cam,
                        px_ref, f_ref, level_ref, T_cur_ref: SE3,
                        d_estimate, d_min, d_max, valid,
                        cfg: SVOConfig, cached=None):
    """Search along the epipolar segment [d_min, d_max] for the best ZMSSD
    match of each seed's reference patch, refine to subpixel, and
    triangulate depth.

    Per-seed step counts follow the reference (`n_steps = epi_length/0.7`,
    matcher.cpp:288): the fused Pallas scan runs exactly that many
    iterations per seed (dynamic trip count), and — like the reference's
    abort at `n_steps > max_epi_search_steps` (matcher.cpp:291-296) — seeds
    whose segment exceeds the cap are rejected outright.

    Returns (depth, px_cur, success).
    """
    halfpatch = cfg.patch_halfsize
    area = (2 * halfpatch) ** 2
    n = px_ref.shape[0]
    dtype = px_ref.dtype
    use_pallas = pp.cfg_use_pallas(cfg)
    h, w = cam.height, cam.width
    n_levels = min(cur_stack.shape[0], cfg.max_search_level + 1)
    # only the searchable levels enter the (VMEM-resident) kernel stack
    cur_stack = cur_stack[:n_levels]

    # endpoints of the epipolar segment on the cur unit plane
    uv_A = project2d(T_cur_ref.apply(f_ref * d_min[..., None]))
    uv_B = project2d(T_cur_ref.apply(f_ref * d_max[..., None]))
    z_A = T_cur_ref.apply(f_ref * d_min[..., None])[..., 2]
    z_B = T_cur_ref.apply(f_ref * d_max[..., None])[..., 2]

    # affine warp + search level from the current depth estimate — or from
    # the caller's warped-patch cache (`cached=(patch_b, search_level)`),
    # which amortizes the arena warp across frames
    if cached is None:
        A_warp = get_warp_matrix_affine(cam, px_ref, f_ref, d_estimate,
                                        T_cur_ref, level_ref, halfpatch)
        search_level = get_best_search_level(A_warp, n_levels - 1)
        patch_b, ok_warp = warp_affine_stack(
            kf_stack, kf_idx, A_warp, px_ref, level_ref, search_level,
            halfpatch + 1, h, w)
    else:
        patch_b, search_level = cached
        search_level = jnp.clip(search_level, 0, n_levels - 1)
        ok_warp = jnp.ones(search_level.shape, bool)
    ref_patch, gx, gy = patch_gradients(patch_b)

    # pixel-space segment, in search-level units
    px_A = cam.world2cam_uv(uv_A)
    px_B = cam.world2cam_uv(uv_B)
    scale_s = 2.0 ** search_level.astype(dtype)
    epi_len = jnp.linalg.norm(px_A - px_B, axis=-1) / scale_s

    # one step per ~0.7 px (ref matcher.cpp:288); reject over-long segments
    # (ref matcher.cpp:291-296)
    Kmax = cfg.max_epi_search_steps
    n_steps = (epi_len / 0.7).astype(jnp.int32) + 1
    too_long = n_steps > Kmax

    # short-segment case: skip the scan, align directly from the segment
    # midpoint (ref matcher.cpp:257-276: epi_length < 2.0)
    short = epi_len < 2.0

    # seeds that are dead, unwarpable, short, or over-long get ZERO scan
    # steps — the kernel skips them entirely (steady-state arenas are mostly
    # dead slots; the reference's per-seed loop only visits live seeds)
    scans = valid & ok_warp & ~short & ~too_long
    n_steps = jnp.where(scans, jnp.clip(n_steps, 2, Kmax), 0)

    uv_a_l = px_A / scale_s[:, None]    # search-level coords of both ends
    uv_b_l = px_B / scale_s[:, None]
    t_best, score_best = pp.epi_scan(
        cur_stack, search_level, uv_a_l, uv_b_l, ref_patch,
        n_steps_max=Kmax, half=halfpatch, n_steps_each=n_steps,
        h=h, w=w, use_pallas=use_pallas)
    px_best0 = (px_A + (px_B - px_A) * t_best[:, None])

    # acceptance threshold (ref patch_score.h:46: 2000 * area)
    thresh = cfg.zmssd_threshold_factor * area

    px_start0 = jnp.where(short[:, None], 0.5 * (px_A + px_B), px_best0)
    score_ok = short | (score_best < thresh)

    # subpixel refinement at the search level
    valid_all = valid & ok_warp & score_ok & ~too_long
    uv_start = px_start0 / scale_s[:, None]
    if cfg.epi_search_1d:
        epi_dir = px_A - px_B
        epi_dir = epi_dir / jnp.maximum(
            jnp.linalg.norm(epi_dir, axis=-1, keepdims=True), 1e-8)
        uv_out, conv_out, _ = align1d_stack(
            cur_stack, search_level, ref_patch, gx, gy, epi_dir, uv_start,
            valid_all, cfg.subpix_n_iter, h, w, use_pallas=use_pallas)
    else:
        uv_out, conv_out, _ = pp.align_iclk(
            cur_stack, search_level, ref_patch, gx, gy, uv_start, valid_all,
            cfg.subpix_n_iter, h, w, use_pallas=use_pallas)
    px_cur = uv_out * scale_s[:, None]

    # triangulate depth along the ref bearing (ref matcher.cpp:344-351)
    f_cur = cam.cam2world(px_cur)
    depth, tri_ok = depth_from_triangulation(T_cur_ref, f_ref, f_cur)
    behind = (z_A <= 1e-3) & (z_B <= 1e-3)
    success = valid_all & conv_out & tri_ok & ~behind
    return depth, px_cur, success
