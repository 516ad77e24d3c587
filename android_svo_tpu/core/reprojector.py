"""Map reprojection: project landmarks into the current frame, pick one
candidate per grid cell, and match it by direct alignment — TPU-native
rebuild of the reference's `Reprojector` (`reprojector.cpp:72-259`) +
`Matcher::findMatchDirect` (`matcher.cpp:156-204`) +
`Point::getCloseViewObs` (`point.cpp:101-125`).

Differences from the reference, by design:
  * The reference projects points of the <=`maxNKfs` closest keyframes plus
    the candidate list (reprojector.cpp:94-146); we project the WHOLE
    landmark arena in one batched op, then gate each point by whether its
    patch-source keyframe is among the `cfg.max_n_kfs_reproject` closest —
    the same working set, computed as one mask instead of a loop.
  * The reference's per-cell loop tries candidates in quality order until
    one match succeeds (reprojectCell, :181-241); we run a fixed-depth
    retry chain: round r picks each unmatched cell's best not-yet-tried
    candidate with a scatter-max and matches all such cells in one batched
    alignment (`1 + cfg.reproject_n_retries` rounds total).  Every tried
    candidate feeds the quality counters exactly like a reference try;
    cells deeper than the chain depth record a failure where the reference
    might still recover — beyond depth 2 that is rare (cells are
    quality-sorted in both designs).
  * Quality bookkeeping (n_succ/n_fail promotion and deletion thresholds,
    :200-216) is applied as one masked update over the arena.

Patch-source selection follows the reference exactly: each matched point
warps its patch from the OBSERVATION whose viewing angle is closest to the
current one, and fails the match when even the best is beyond 60 degrees
(`getCloseViewObs`, point.cpp:101-125 — the gate feeds the failure counter
like any unsuccessful reprojection).  Candidates with an empty observation
table fall back to their birth keyframe anchor (`ref_*` fields).
"""

from __future__ import annotations

import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import state as st
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.ops import interp, matcher
from android_svo_tpu.ops.detect import cell_index


def closest_view_obs(pts: st.PointArena, kfs: st.KeyframeArena,
                     cam_pos_w: jnp.ndarray, cfg: SVOConfig):
    """Per-point closest-view observation (ref getCloseViewObs,
    point.cpp:101-125).

    Returns (src_kf, src_px, src_level, src_f, angle_ok): the patch-source
    keyframe/feature for each point — the observation whose viewing
    direction has the largest cosine to the current frame's — falling back
    to the birth anchor when the obs table is empty.  `angle_ok` is False
    when the best cosine is below `cfg.max_view_angle_cos` (cos 60°,
    point.cpp:122), which the caller must treat as a match failure.
    """
    P, O = pts.obs_kf.shape
    dtype = pts.pos.dtype
    dir_cur = pts.pos - cam_pos_w[None, :]                   # (P,3)
    dir_cur = dir_cur / jnp.maximum(
        jnp.linalg.norm(dir_cur, axis=-1, keepdims=True), 1e-9)

    ks = jnp.clip(pts.obs_kf, 0, kfs.q_kw.shape[0] - 1)      # (P,O)
    # camera centers once per KEYFRAME (K), gathered per observation —
    # not an SE3 inverse per (P,O) entry
    kf_centers = SE3(q=kfs.q_kw, t=kfs.t_kw).inverse().t     # (K,3)
    obs_cam_pos = kf_centers[ks]                             # (P,O,3)
    dir_obs = pts.pos[:, None, :] - obs_cam_pos
    dir_obs = dir_obs / jnp.maximum(
        jnp.linalg.norm(dir_obs, axis=-1, keepdims=True), 1e-9)
    cosang = jnp.einsum("poi,pi->po", dir_obs, dir_cur)      # (P,O)
    obs_ok = (pts.obs_kf >= 0) & kfs.valid[ks]
    cosang = jnp.where(obs_ok, cosang, -jnp.inf)
    best = jnp.argmax(cosang, axis=-1)                       # (P,)
    best_cos = jnp.take_along_axis(cosang, best[:, None], axis=1)[:, 0]
    have_obs = jnp.any(obs_ok, axis=-1)

    take = lambda a: jnp.take_along_axis(  # noqa: E731
        a, best.reshape((P,) + (1,) * (a.ndim - 1)), axis=1)[:, 0]
    src_kf = jnp.where(have_obs, take(pts.obs_kf), pts.ref_kf)
    src_px = jnp.where(have_obs[:, None], take(pts.obs_px), pts.ref_px)
    src_level = jnp.where(have_obs, take(pts.obs_level), pts.ref_level)
    src_f = jnp.where(have_obs[:, None], take(pts.obs_f), pts.ref_f)
    angle_ok = jnp.where(have_obs,
                         best_cos > jnp.asarray(cfg.max_view_angle_cos,
                                                dtype),
                         True)
    return src_kf, src_px, src_level, src_f, angle_ok


def keyframe_overlap(vo: st.VOState, T_cw: SE3, cam,
                     cfg: SVOConfig) -> jnp.ndarray:
    """Per-keyframe count of its landmarks visible in the current frame —
    the covisibility-overlap query (ref Map::getCloseKeyframes,
    map.cpp:109-154, which tests each keyframe's 5 spread "key points" for
    visibility, frame.cpp:84-146 setKeyPoints/checkKeyPoints).

    TPU-native: instead of 5 hand-picked key points per frame we project
    every keyframe's full cell-feature table in one batched op — (K, C)
    points through one transform — which is the same test with a denser
    sample.  Returns (K,) int32 visible-landmark counts (0 for invalid
    keyframes).
    """
    kfs = vo.kfs
    pts = vo.points
    K = kfs.ftr_point.shape[0]
    pid = jnp.maximum(kfs.ftr_point, 0)                     # (K,C)
    pos = pts.pos[pid]                                      # (K,C,3)
    ok = (kfs.ftr_valid & (kfs.ftr_point >= 0) & pts.valid[pid]
          & kfs.valid[:, None])
    xyz = T_cw.apply(pos.reshape(-1, 3)).reshape(pos.shape)
    in_front = xyz[..., 2] > 1e-3
    z_safe = jnp.where(in_front, xyz[..., 2], 1.0)
    px = cam.world2cam(xyz.at[..., 2].set(z_safe))
    vis = ok & in_front & interp.in_bounds(
        px.reshape(-1, 2), cam.height, cam.width,
        cfg.patch_halfsize + 2).reshape(ok.shape)
    return jnp.sum(vis, axis=-1).astype(jnp.int32)


def reproject_map(vo: st.VOState, cur_stack, T_cw: SE3, cam,
                  cfg: SVOConfig, dims):
    """Returns (features, points', n_matches) where features is the per-cell
    match table for the current frame and points' carries updated quality
    counters."""
    pts = vo.points
    P = pts.pos.shape[0]
    C = dims["C"]
    n_cols = dims["n_cols"]
    h, w = cam.height, cam.width

    # ---- project all landmarks -------------------------------------------
    xyz_cur = T_cw.apply(pts.pos)                          # (P,3)
    in_front = xyz_cur[..., 2] > 1e-3
    z_safe = jnp.where(in_front, xyz_cur[..., 2], 1.0)
    px = cam.world2cam(xyz_cur.at[..., 2].set(z_safe))
    margin = cfg.patch_halfsize + 2
    cam_pos_w = T_cw.inverse().t

    # patch source = closest-view observation (ref point.cpp:101-125)
    src_kf, src_px, src_level, src_f, angle_ok = closest_view_obs(
        pts, vo.kfs, cam_pos_w, cfg)

    # working set: points whose patch source lies in one of the
    # `max_n_kfs_reproject` closest OVERLAPPING keyframes (ref
    # reprojector.cpp:82-94: getCloseKeyframes = covisibility test,
    # map.cpp:109-154, then sort by distance and cap at max_n_kfs)
    kf_pos = SE3(q=vo.kfs.q_kw, t=vo.kfs.t_kw).inverse().t  # (K,3)
    kf_dist = jnp.linalg.norm(kf_pos - cam_pos_w, axis=-1)
    kf_usable = vo.kfs.valid
    if cfg.kf_select_covisibility:
        overlap = keyframe_overlap(vo, T_cw, cam, cfg)
        kf_usable = kf_usable & (overlap >= cfg.kf_overlap_min_fts)
    kf_dist = jnp.where(kf_usable, kf_dist, jnp.inf)
    K = kf_dist.shape[0]
    n_close = min(cfg.max_n_kfs_reproject, K)
    close_thresh = jnp.sort(kf_dist)[n_close - 1]
    kf_close = kf_usable & (kf_dist <= close_thresh)
    src_in_close = kf_close[jnp.clip(src_kf, 0, K - 1)]

    visible = (pts.valid & in_front
               & interp.in_bounds(px, h, w, margin)
               & vo.kfs.valid[jnp.clip(src_kf, 0, K - 1)]
               & src_in_close)

    T_cur_ref_all = T_cw.compose(
        SE3(q=vo.kfs.q_kw, t=vo.kfs.t_kw).inverse())         # per-KF, reused
    kf_centers = SE3(q=vo.kfs.q_kw, t=vo.kfs.t_kw).inverse().t

    # ---- warped-patch cache refresh (budget, oldest visible first) ---------
    # The affine warp out of the keyframe arena (ref warpAffine,
    # matcher.cpp:83-121) is the dominant per-frame gather; since the warp
    # drifts slowly (~relative-pose delta per frame), a fixed budget of the
    # stalest visible points re-warps each frame and matching below reads
    # the cache.  Never-warped points (fresh promotions/bootstrap) go first.
    never = visible & (pts.warp_frame < 0)
    age = jnp.where(never, jnp.iinfo(jnp.int32).min + 1, pts.warp_frame)
    age = jnp.where(visible, age, jnp.iinfo(jnp.int32).max)
    Bw = min(cfg.warp_refresh_budget, P)
    ridx = jnp.argsort(age)[:Bw]
    rok = visible[ridx]
    r_kf = jnp.clip(src_kf[ridx], 0, K - 1)
    depth_r = jnp.linalg.norm(pts.pos[ridx] - kf_centers[r_kf], axis=-1)
    T_cr = SE3(q=T_cur_ref_all.q[r_kf], t=T_cur_ref_all.t[r_kf])
    patch_r, slv_r, grad_r, ok_r = matcher.compute_warp_batch(
        vo.kfs.stack, r_kf, cam, src_px[ridx], src_f[ridx], depth_r,
        src_level[ridx], T_cr, rok, cfg, ref_grad=pts.ref_grad[ridx])
    mode = "drop"
    rscat = jnp.where(ok_r, ridx, P)
    pts = pts.replace(
        warp_patch=pts.warp_patch.at[rscat].set(patch_r, mode=mode),
        warp_level=pts.warp_level.at[rscat].set(slv_r, mode=mode),
        warp_grad=pts.warp_grad.at[rscat].set(grad_r, mode=mode),
        warp_frame=pts.warp_frame.at[rscat].set(vo.frame_id, mode=mode))

    # ---- quality-ordered candidate chain per cell ---------------------------
    # (ref reprojectCell, reprojector.cpp:181-241: sort candidates by
    # quality, try in order until one matches).  Round r: scatter-max picks
    # each still-unmatched cell's best untried candidate; one batched
    # alignment serves every such cell.
    cid = cell_index(px, w, cfg.grid_size, n_cols)
    cid = jnp.clip(cid, 0, C - 1)
    slot_ids = jnp.arange(P, dtype=jnp.int32)
    # quality-major candidate key; points whose warp cache is cold rank
    # below every cached one (they become matchable next frame — a bounded
    # warm-up the reference does not have, in exchange for not paying the
    # full-arena warp every frame)
    cached = pts.warp_frame >= 0
    key0 = jnp.where(visible,
                     (cached.astype(jnp.int32) * 4 + pts.ptype) * P
                     + slot_ids, -1)

    tried = jnp.zeros((P,), bool)
    need = jnp.ones((C,), bool)                              # unmatched cells
    succ_add = jnp.zeros((P,), jnp.int32)
    fail_add = jnp.zeros((P,), jnp.int32)
    dtype = pts.pos.dtype
    feats = {
        "px": jnp.zeros((C, 2), dtype),
        "f": jnp.zeros((C, 3), dtype),
        "level": jnp.zeros((C,), jnp.int32),
        "point": jnp.full((C,), -1, jnp.int32),
        "valid": jnp.zeros((C,), bool),
    }
    for round_i in range(1 + cfg.reproject_n_retries):
        key = jnp.where(tried, -1, key0)
        cell_best = jnp.full((C,), -1, jnp.int32).at[cid].max(key)
        winner = jnp.where(cell_best >= 0, cell_best % P, 0)  # (C,) pt slot
        cell_has = (cell_best >= 0) & need

        if round_i == 0:
            # first round: every cell tries its best candidate (dense)
            cells = jnp.arange(C, dtype=jnp.int32)
            cand = winner
            cand_ok = cell_has
        else:
            # retry rounds run on a COMPACTED batch: steady state leaves
            # few unmatched cells, and the warp+align cost is O(batch)
            # regardless of masks — a dense retry would re-pay the whole
            # grid for a handful of cells
            B = min(cfg.reproject_retry_budget, C)
            cells = jnp.nonzero(cell_has, size=B, fill_value=-1)[0]
            cand_ok = cells >= 0
            cells = jnp.maximum(cells, 0)
            cand = winner[cells]

        # every candidate in THIS round's (possibly compacted) batch is
        # "tried" whether or not it matches; cells beyond the retry budget
        # keep their candidate for the next round instead of burning it
        # un-attempted (ADVICE r4 #3)
        tried = tried.at[jnp.where(cand_ok, cand, P)].set(True, mode="drop")

        px_init = px[cand]
        has_cache = cached[cand]
        # the 60-degree gate: the cell still claims its try, but the match
        # is forced to fail (the reference counts it via n_failed_reproj_);
        # cache-cold points are not tried at all (no counter evidence)
        attempted = cand_ok & has_cache
        try_ok = attempted & angle_ok[cand]
        px_cur, success = matcher.match_cached(
            cur_stack, cam, pts.warp_patch[cand], pts.warp_level[cand],
            px_init, try_ok, cfg, warp_grad=pts.warp_grad[cand],
            ref_type=pts.ref_type[cand])
        search_level = jnp.clip(pts.warp_level[cand], 0,
                                cfg.max_search_level)

        # quality counters (ref reprojector.cpp:200-216): every try counts
        pslot = jnp.where(attempted, cand, P)
        succ_add = succ_add.at[pslot].add(success.astype(jnp.int32),
                                          mode="drop")
        fail_add = fail_add.at[pslot].add(
            (attempted & ~success).astype(jnp.int32), mode="drop")

        f_cur = cam.cam2world(px_cur)
        upd = success
        cslot = jnp.where(upd, cells, C)
        mode = "drop"
        feats = {
            "px": feats["px"].at[cslot].set(px_cur, mode=mode),
            "f": feats["f"].at[cslot].set(f_cur, mode=mode),
            "level": feats["level"].at[cslot].set(search_level, mode=mode),
            "point": feats["point"].at[cslot].set(cand, mode=mode),
            "valid": feats["valid"].at[cslot].set(True, mode=mode),
        }
        need = need.at[cslot].set(False, mode=mode)
    # global match budget (ref reprojector.cpp:152-167: the grid walk stops
    # once maxFts cells have matched).  In this batched fixed-shape design
    # the alignment cost is O(C) regardless, so the budget exists for
    # behavioral parity (bounding downstream per-feature work), not kernel
    # savings; cells are truncated in index order where the reference's
    # shuffled walk is random.  Inert at defaults (C < max_fts).
    if cfg.max_fts < feats["valid"].shape[0]:
        rank = jnp.cumsum(feats["valid"].astype(jnp.int32))
        keep = feats["valid"] & (rank <= cfg.max_fts)
        feats["valid"] = keep
        feats["point"] = jnp.where(keep, feats["point"], -1)
    n_succ = pts.n_succ + succ_add
    n_fail = pts.n_fail + fail_add
    ptype = pts.ptype
    # promote UNKNOWN -> GOOD after enough successes
    ptype = jnp.where((ptype == st.TYPE_UNKNOWN)
                      & (n_succ >= cfg.point_min_succ_good),
                      st.TYPE_GOOD, ptype)
    # delete on failure thresholds
    del_unk = ((ptype == st.TYPE_UNKNOWN) | (ptype == st.TYPE_CANDIDATE)) & (
        n_fail > cfg.point_max_reproj_fail_unknown)
    del_good = (ptype == st.TYPE_GOOD) & (
        n_fail > cfg.point_max_reproj_fail_good)
    ptype = jnp.where(del_unk | del_good, st.TYPE_DELETED, ptype)
    points_new = pts.replace(n_succ=n_succ, n_fail=n_fail, ptype=ptype)

    n_matches = jnp.sum(feats["valid"]).astype(jnp.int32)
    return feats, points_new, n_matches


def _kf_cam_pos(kfs: st.KeyframeArena, slots: jnp.ndarray) -> jnp.ndarray:
    """World position of keyframe cameras: T_kw stores world->kf, so the
    camera center is -R^T t (ref frame.h pos())."""
    T = SE3(q=kfs.q_kw[slots], t=kfs.t_kw[slots])
    return T.inverse().t


def _relative_pose(T_cw: SE3, kfs: st.KeyframeArena,
                   slots: jnp.ndarray) -> SE3:
    """T_cur_ref = T_cw o T_wk = T_cw o (T_kw)^-1, composed once per
    keyframe and gathered per slot."""
    T_k = T_cw.compose(SE3(q=kfs.q_kw, t=kfs.t_kw).inverse())
    return SE3(q=T_k.q[slots], t=T_k.t[slots])
