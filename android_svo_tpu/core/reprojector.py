"""Map reprojection: project landmarks into the current frame, pick one
candidate per grid cell, and match it by direct alignment — TPU-native
rebuild of the reference's `Reprojector` (`reprojector.cpp:72-259`) +
`Matcher::findMatchDirect` (`matcher.cpp:156-204`).

Differences from the reference, by design:
  * The reference projects points of the <=10 closest keyframes plus the
    candidate list (reprojector.cpp:94-146); we project the WHOLE landmark
    arena in one batched op — with a fixed-capacity arena this is cheaper
    than selection and covers at least the same set.
  * The reference's per-cell loop tries candidates in quality order until
    one match succeeds (reprojectCell, :181-241); we pick the single
    best-quality candidate per cell with a scatter-max and match all cells
    in one batched alignment.  (One try per cell; the reference usually
    succeeds on the first try too since cells are sorted.)
  * Quality bookkeeping (n_succ/n_fail promotion and deletion thresholds,
    :200-216) is applied as one masked update over the arena.
"""

from __future__ import annotations

import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import state as st
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.ops import interp, matcher
from android_svo_tpu.ops.detect import cell_index


def reproject_map(vo: st.VOState, cur_pyr, T_cw: SE3, cam,
                  cfg: SVOConfig, dims):
    """Returns (features, points') where features is the per-cell match table
    for the current frame and points' carries updated quality counters."""
    pts = vo.points
    P = pts.pos.shape[0]
    C = dims["C"]
    n_cols = dims["n_cols"]
    dtype = pts.pos.dtype

    # ---- project all landmarks -------------------------------------------
    xyz_cur = T_cw.apply(pts.pos)                          # (P,3)
    in_front = xyz_cur[..., 2] > 1e-3
    z_safe = jnp.where(in_front, xyz_cur[..., 2], 1.0)
    px = cam.world2cam(xyz_cur.at[..., 2].set(z_safe))
    h, w = cur_pyr[0].shape
    margin = cfg.patch_halfsize + 2
    visible = (pts.valid & in_front
               & interp.in_bounds(px, h, w, margin)
               & vo.kfs.valid[pts.ref_kf])                 # patch source alive

    # ---- one candidate per cell (scatter-max by quality key) --------------
    cid = cell_index(px, w, cfg.grid_size, n_cols)
    cid = jnp.clip(cid, 0, C - 1)
    slot_ids = jnp.arange(P, dtype=jnp.int32)
    key = pts.ptype * P + slot_ids                          # quality-major
    key = jnp.where(visible, key, -1)
    cell_best = jnp.full((C,), -1, jnp.int32).at[cid].max(key)
    winner = jnp.where(cell_best >= 0, cell_best % P, 0)    # (C,) point slot
    cell_has = cell_best >= 0

    # ---- batched direct match of the C winners ----------------------------
    depth_ref = jnp.linalg.norm(
        pts.pos[winner] - _kf_cam_pos(vo.kfs, pts.ref_kf[winner]), axis=-1)
    T_cur_ref = _relative_pose(T_cw, vo.kfs, pts.ref_kf[winner])
    px_init = px[winner]
    px_cur, search_level, success = matcher.find_match_direct(
        cur_pyr, vo.kfs.pyr, pts.ref_kf[winner], cam,
        pts.ref_px[winner], pts.ref_f[winner], depth_ref,
        pts.ref_level[winner], T_cur_ref, px_init, cell_has, cfg)

    # ---- quality counters (ref reprojector.cpp:200-216) --------------------
    succ_add = jnp.zeros((P,), jnp.int32).at[winner].add(
        success.astype(jnp.int32))
    fail_add = jnp.zeros((P,), jnp.int32).at[winner].add(
        (cell_has & ~success).astype(jnp.int32))
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

    # ---- current-frame feature table ---------------------------------------
    f_cur = cam.cam2world(px_cur)
    feats = {
        "px": px_cur,
        "f": f_cur,
        "level": search_level,
        "point": jnp.where(success, winner, -1),
        "valid": success,
    }
    n_matches = jnp.sum(success).astype(jnp.int32)
    return feats, points_new, n_matches


def _kf_cam_pos(kfs: st.KeyframeArena, slots: jnp.ndarray) -> jnp.ndarray:
    """World position of keyframe cameras: T_kw stores world->kf, so the
    camera center is -R^T t (ref frame.h pos())."""
    T = SE3(q=kfs.q_kw[slots], t=kfs.t_kw[slots])
    return T.inverse().t


def _relative_pose(T_cw: SE3, kfs: st.KeyframeArena,
                   slots: jnp.ndarray) -> SE3:
    """T_cur_ref = T_cw o T_wk = T_cw o (T_kw)^-1, batched over slots."""
    T_kw = SE3(q=kfs.q_kw[slots], t=kfs.t_kw[slots])
    return T_cw.compose(T_kw.inverse())
