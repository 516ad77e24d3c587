"""The per-frame VO pipeline: one jitted step composing pyramid -> sparse
align -> map reprojection -> pose GN -> structure GN -> seed updates ->
keyframe policy — the TPU-native rebuild of
`FrameHandlerMono::processFrame` (`frame_handler_mono.cpp:171-312`) and the
depth-filter frame update (`depth_filter.cpp:237-340`).

The reference splits this across two threads (tracking + mapping) with
mutex-guarded queues (SURVEY.md §2c); here the depth-filter update is fused
into the same jitted step as batched arena math — the per-frame work the
mapper did asynchronously at 5 Hz fits synchronously at hundreds of Hz on
one chip.  Keyframe insertion (detection + seed spawning + arena writes)
runs under `lax.cond` so only the taken branch executes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import depth_filter as df
from android_svo_tpu.core import state as st
from android_svo_tpu.core.pose_opt import optimize_pose
from android_svo_tpu.core.point_opt import optimize_points, select_points_for_optim
from android_svo_tpu.core.reprojector import (reproject_map, _kf_cam_pos,
                                              keyframe_overlap)
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.geometry.triangulation import masked_median
from android_svo_tpu.ops import detect, interp, matcher
from android_svo_tpu.ops.pyramid import build_pyramid, stack_from_pyramid
from android_svo_tpu.ops.sparse_align import sparse_img_align

# result codes (ref frame_handler_base.h UpdateResult)
RES_FAILURE = 0
RES_NO_KEYFRAME = 1
RES_IS_KEYFRAME = 2


# ---------------------------------------------------------------------------
# depth-filter frame update (ref depth_filter.cpp:237-340 updateSeeds)
# ---------------------------------------------------------------------------

def update_seeds(vo: st.VOState, cur_stack, T_cw: SE3, cam,
                 cfg: SVOConfig):
    """One batched Bayesian update of every live seed against the current
    frame: visibility gate -> epipolar ZMSSD match -> tau -> posterior."""
    seeds = vo.seeds
    dtype = seeds.mu.dtype

    # pose of cur in each seed's keyframe: T_cur_ref = T_cw o T_wk —
    # composed once per KEYFRAME (K of them), gathered per seed
    T_cur_ref_k = T_cw.compose(
        SE3(q=vo.kfs.q_kw, t=vo.kfs.t_kw).inverse())
    T_cur_ref = SE3(q=T_cur_ref_k.q[seeds.kf], t=T_cur_ref_k.t[seeds.kf])

    # age-out (ref :258: seed batch older than `seed_max_kf_age` keyframes)
    too_old = (vo.kf_batch.astype(jnp.int32) - seeds.batch_id
               ) > cfg.seed_max_kf_age
    alive = seeds.valid & ~too_old & vo.kfs.valid[seeds.kf]

    # visibility of the current mean-depth point (ref :263-274)
    z_mean = 1.0 / jnp.maximum(seeds.mu, 1e-6)
    xyz_cur = T_cur_ref.apply(seeds.f * z_mean[:, None])
    in_front = xyz_cur[..., 2] > 1e-3
    zs = jnp.where(in_front, xyz_cur[..., 2], 1.0)
    px_mean = cam.world2cam(xyz_cur.at[..., 2].set(zs))
    visible = alive & in_front & interp.in_bounds(
        px_mean, cam.height, cam.width, cfg.patch_halfsize + 2)

    # epipolar search range mu +- sqrt(sigma2) in inverse depth (ref :279-281)
    sig = jnp.sqrt(seeds.sigma2)
    d_min = 1.0 / jnp.maximum(seeds.mu + sig, 1e-7)
    d_max = 1.0 / jnp.maximum(seeds.mu - sig, 1e-7)
    d_max = jnp.minimum(d_max, 1e4)

    # seed-patch cache refresh (budget, stalest visible first): re-warp the
    # reference patch from the birth keyframe as the baseline grows (the
    # amortized form of the per-update warp in findEpipolarMatchDirect,
    # matcher.cpp:250-256)
    S = seeds.valid.shape[0]
    mode = "drop"
    never_s = visible & (seeds.patch_frame < 0)
    age_s = jnp.where(never_s, jnp.iinfo(jnp.int32).min + 1,
                      seeds.patch_frame)
    age_s = jnp.where(visible, age_s, jnp.iinfo(jnp.int32).max)
    Bs = min(cfg.seed_warp_refresh_budget, S)
    ridx = jnp.argsort(age_s)[:Bs]
    rok = visible[ridx]
    patch_r, slv_r, _, ok_r = matcher.compute_warp_batch(
        vo.kfs.stack, seeds.kf[ridx], cam, seeds.px[ridx], seeds.f[ridx],
        z_mean[ridx], seeds.level[ridx],
        SE3(q=T_cur_ref.q[ridx], t=T_cur_ref.t[ridx]), rok, cfg)
    rscat = jnp.where(ok_r, ridx, S)
    seeds = seeds.replace(
        patch=seeds.patch.at[rscat].set(patch_r, mode=mode),
        patch_level=seeds.patch_level.at[rscat].set(slv_r, mode=mode),
        patch_frame=seeds.patch_frame.at[rscat].set(vo.frame_id, mode=mode))

    # COMPACT the visible seeds into a fixed budget before the expensive
    # epi-scan + align path: the arena is mostly dead slots, and the
    # scan/align cost is O(batch) regardless of masks.  When more seeds are
    # visible than the budget, a frame-rotating offset round-robins which
    # ones update this frame (every seed still ages and converges; it just
    # may skip a frame, like the reference's mapper dropping frames when
    # the queue backs up, depth_filter.cpp:92-96).
    budget = min(cfg.seed_update_budget, S)
    offset = (vo.frame_id * jnp.asarray(257, jnp.int32)) % S
    rot_vis = jnp.roll(visible, -offset)
    idx = jnp.nonzero(rot_vis, size=budget, fill_value=-1)[0]
    sel = idx >= 0
    idx = (jnp.maximum(idx, 0) + offset) % S
    sel = sel & (seeds.patch_frame[idx] >= 0)    # cache-cold seeds wait
    take = lambda a: a[idx]  # noqa: E731

    z_b, px_cur_b, found_b = matcher.find_epipolar_match(
        cur_stack, vo.kfs.stack, take(seeds.kf), cam, take(seeds.px),
        take(seeds.f), take(seeds.level),
        SE3(q=T_cur_ref.q[idx], t=T_cur_ref.t[idx]),
        take(z_mean), take(d_min), take(d_max), sel, cfg,
        cached=(seeds.patch[idx], seeds.patch_level[idx]))

    # scatter back to arena layout (untouched slots: no match this frame)
    mode = "drop"
    scat = jnp.where(sel, idx, S)
    z = jnp.ones((S,), dtype).at[scat].set(z_b, mode=mode)
    found = jnp.zeros((S,), bool).at[scat].set(found_b, mode=mode)
    attempted = jnp.zeros((S,), bool).at[scat].set(True, mode=mode)

    # measurement variance from 1-px angular error (ref :291-300)
    ang = df.px_error_angle(cam.fx, cfg.d_filter_px_noise)
    T_ref_cur = T_cur_ref.inverse()
    tau = df.compute_tau(T_ref_cur.t, seeds.f, z, ang)
    tau_inv = df.tau_inverse(z, tau)

    a2, b2, mu2, s22 = df.update_seed(
        1.0 / jnp.maximum(z, 1e-7), tau_inv * tau_inv,
        seeds.a, seeds.b, seeds.mu, seeds.sigma2, seeds.z_range)
    upd = found
    seeds2 = seeds.replace(
        a=jnp.where(upd, a2, seeds.a),
        b=jnp.where(upd, b2, seeds.b),
        mu=jnp.where(upd, mu2, seeds.mu),
        sigma2=jnp.where(upd, s22, seeds.sigma2),
        valid=alive,
    )

    # failed visible matches count as outlier evidence (ref :303-306: b += 1)
    # — only for seeds that actually got a match attempt this frame (a seed
    # skipped by the update budget is not evidence of an outlier)
    failed = attempted & ~found
    seeds2 = seeds2.replace(b=jnp.where(failed, seeds2.b + 1.0, seeds2.b))

    # convergence -> promote to candidate landmarks (ref :310-331)
    conv = seeds2.valid & df.is_converged(seeds2.sigma2, seeds2.z_range, cfg)
    vo = promote_converged_seeds(vo.replace(seeds=seeds2), conv, cam, cfg)
    return vo


def promote_converged_seeds(vo: st.VOState, conv: jnp.ndarray, cam,
                            cfg: SVOConfig, max_new: int = 256):
    """Move converged seeds into the landmark arena as TYPE_CANDIDATE
    (the reference's MapPointCandidates handoff, map.cpp:226-231).
    Allocation is a fixed-size compaction: up to `max_new` per frame."""
    pts = vo.points
    seeds = vo.seeds
    P = pts.pos.shape[0]

    conv_idx = jnp.nonzero(conv, size=max_new, fill_value=-1)[0]
    free = pts.ptype == st.TYPE_DELETED
    free_idx = jnp.nonzero(free, size=max_new, fill_value=-1)[0]
    take = (conv_idx >= 0) & (free_idx >= 0)
    src = jnp.where(take, conv_idx, 0)
    dst = jnp.where(take, free_idx, P)       # P = out-of-range drop

    # world position: kf pose^-1 applied to f * z
    T_kw = SE3(q=vo.kfs.q_kw[seeds.kf[src]], t=vo.kfs.t_kw[seeds.kf[src]])
    z = 1.0 / jnp.maximum(seeds.mu[src], 1e-7)
    pos_w = T_kw.inverse().apply(seeds.f[src] * z[:, None])

    mode = "drop"
    pts2 = pts.replace(
        pos=pts.pos.at[dst].set(pos_w, mode=mode),
        ptype=pts.ptype.at[dst].set(
            jnp.where(take, st.TYPE_CANDIDATE, 0), mode=mode),
        n_succ=pts.n_succ.at[dst].set(0, mode=mode),
        n_fail=pts.n_fail.at[dst].set(0, mode=mode),
        last_optim=pts.last_optim.at[dst].set(0, mode=mode),
        ref_kf=pts.ref_kf.at[dst].set(seeds.kf[src], mode=mode),
        ref_px=pts.ref_px.at[dst].set(seeds.px[src], mode=mode),
        ref_level=pts.ref_level.at[dst].set(seeds.level[src], mode=mode),
        ref_f=pts.ref_f.at[dst].set(seeds.f[src], mode=mode),
        ref_type=pts.ref_type.at[dst].set(seeds.ftype[src], mode=mode),
        ref_grad=pts.ref_grad.at[dst].set(seeds.grad[src], mode=mode),
        obs_kf=pts.obs_kf.at[dst].set(-1, mode=mode),
        obs_count=pts.obs_count.at[dst].set(0, mode=mode),
        # the promoted landmark inherits the seed's warped-patch cache (the
        # seed's birth-KF patch IS the new candidate's reference patch);
        # warp_grad starts as the ref-frame direction and is corrected at
        # the first cache refresh
        warp_patch=pts.warp_patch.at[dst].set(seeds.patch[src], mode=mode),
        warp_level=pts.warp_level.at[dst].set(seeds.patch_level[src],
                                              mode=mode),
        warp_frame=pts.warp_frame.at[dst].set(seeds.patch_frame[src],
                                              mode=mode),
        warp_grad=pts.warp_grad.at[dst].set(seeds.grad[src], mode=mode),
    )
    # retire the promoted seeds
    seeds2 = seeds.replace(
        valid=seeds.valid & ~(conv & jnp.zeros_like(conv).at[src].set(
            take, mode=mode)))
    return vo.replace(points=pts2, seeds=seeds2)


# ---------------------------------------------------------------------------
# keyframe insertion (ref frame_handler_mono.cpp:262-312 + depth_filter
# initializeSeeds :129-151)
# ---------------------------------------------------------------------------

def select_kf_slot(vo: st.VOState, T_cw: SE3):
    """First free slot, else evict the keyframe furthest from the camera
    (ref Map::getFurthestKeyframe + frame_handler_mono.cpp:303-308)."""
    kfs = vo.kfs
    any_free = jnp.any(~kfs.valid)
    first_free = jnp.argmin(kfs.valid.astype(jnp.int32))
    cam_pos = T_cw.inverse().t
    kf_pos = SE3(q=kfs.q_kw, t=kfs.t_kw).inverse().t     # (K,3)
    dist = jnp.linalg.norm(kf_pos - cam_pos, axis=-1)
    dist = jnp.where(kfs.valid, dist, -1.0)
    furthest = jnp.argmax(dist)
    return jnp.where(any_free, first_free, furthest).astype(jnp.int32)


def insert_keyframe(vo: st.VOState, cur_pyr, cur_stack, T_cw: SE3, feats,
                    cam, cfg: SVOConfig, dims) -> st.VOState:
    """Write the current frame into the keyframe arena: adopt candidate
    points, record observations, detect new corners, spawn seeds."""
    dtype = cur_stack.dtype
    C = dims["C"]
    slot = select_kf_slot(vo, T_cw)
    evicting = vo.kfs.valid[slot]

    # ---- scrub state tied to an evicted keyframe ---------------------------
    seeds = vo.seeds
    seeds = seeds.replace(valid=seeds.valid & (seeds.kf != slot) | ~evicting
                          & seeds.valid)
    pts = vo.points
    evict_obs = (pts.obs_kf == slot) & evicting
    obs_kf = jnp.where(evict_obs, -1, pts.obs_kf)
    # points anchored (for patches) in the evicted KF re-anchor to another
    # surviving observation (the reference's deleteFrameRef keeps the point
    # alive as long as observations remain, map.cpp:66-99); only points with
    # no other observation are dropped.
    obs_alive = (obs_kf >= 0) & vo.kfs.valid[jnp.clip(obs_kf, 0,
                                                      vo.kfs.valid.shape[0]
                                                      - 1)]
    alt = jnp.argmax(obs_alive, axis=-1)                     # (P,)
    has_alt = jnp.any(obs_alive, axis=-1)
    need = (pts.ref_kf == slot) & evicting & pts.valid
    take = lambda a: jnp.take_along_axis(  # noqa: E731
        a, alt.reshape((alt.shape[0],) + (1,) * (a.ndim - 1)), axis=1)[:, 0]
    ref_kf = jnp.where(need & has_alt, take(obs_kf), pts.ref_kf)
    ref_px = jnp.where((need & has_alt)[:, None], take(pts.obs_px),
                       pts.ref_px)
    ref_level = jnp.where(need & has_alt, take(pts.obs_level),
                          pts.ref_level)
    ref_f = jnp.where((need & has_alt)[:, None], take(pts.obs_f), pts.ref_f)
    # the obs table stores no gradient direction: a re-anchored edgelet's
    # direction would be stale in the new frame, so demote it to CORNER
    ref_type = jnp.where(need & has_alt, detect.FTYPE_CORNER, pts.ref_type)
    ptype = jnp.where(need & ~has_alt, st.TYPE_DELETED, pts.ptype)
    pts = pts.replace(obs_kf=obs_kf, ptype=ptype, ref_kf=ref_kf,
                      ref_px=ref_px, ref_level=ref_level, ref_f=ref_f,
                      ref_type=ref_type)

    # ---- scene depth of current frame --------------------------------------
    p_w = pts.pos[feats["point"]]
    xyz_cur = T_cw.apply(p_w)
    ok = feats["valid"] & (feats["point"] >= 0)
    depth_med = masked_median(xyz_cur[..., 2], ok)
    depth_min = jnp.min(jnp.where(ok, xyz_cur[..., 2], jnp.inf))
    depth_med = jnp.where(jnp.isfinite(depth_med), depth_med,
                          jnp.asarray(1.0, dtype))
    depth_min = jnp.where(jnp.isfinite(depth_min), depth_min,
                          jnp.asarray(0.5, dtype))

    # ---- candidate adoption (ref map.cpp:236-254) ---------------------------
    adopted = ok & (pts.ptype[feats["point"]] == st.TYPE_CANDIDATE)
    pid = jnp.where(ok, feats["point"], 0)
    new_type = pts.ptype.at[pid].set(
        jnp.where(adopted, st.TYPE_UNKNOWN, pts.ptype[pid]), mode="drop")
    pts = pts.replace(ptype=new_type)

    # ---- observation records for all matched features ----------------------
    o_idx = jnp.minimum(pts.obs_count[pid], pts.obs_kf.shape[1] - 1)
    obs_kf = pts.obs_kf.at[pid, o_idx].set(
        jnp.where(ok, slot, pts.obs_kf[pid, o_idx]), mode="drop")
    obs_f = pts.obs_f.at[pid, o_idx].set(
        jnp.where(ok[:, None], feats["f"], pts.obs_f[pid, o_idx]),
        mode="drop")
    obs_px = pts.obs_px.at[pid, o_idx].set(
        jnp.where(ok[:, None], feats["px"], pts.obs_px[pid, o_idx]),
        mode="drop")
    obs_level = pts.obs_level.at[pid, o_idx].set(
        jnp.where(ok, feats["level"], pts.obs_level[pid, o_idx]),
        mode="drop")
    obs_count = pts.obs_count.at[pid].add(ok.astype(jnp.int32), mode="drop")
    pts = pts.replace(obs_kf=obs_kf, obs_f=obs_f, obs_px=obs_px,
                      obs_level=obs_level, obs_count=obs_count)

    # ---- write the keyframe -------------------------------------------------
    kfs = vo.kfs
    kfs = kfs.replace(
        stack=kfs.stack.at[slot].set(cur_stack),
        q_kw=kfs.q_kw.at[slot].set(T_cw.q),
        t_kw=kfs.t_kw.at[slot].set(T_cw.t),
        valid=kfs.valid.at[slot].set(True),
        frame_id=kfs.frame_id.at[slot].set(vo.frame_id),
        scene_depth=kfs.scene_depth.at[slot].set(depth_med),
        ftr_px=kfs.ftr_px.at[slot].set(feats["px"]),
        ftr_f=kfs.ftr_f.at[slot].set(feats["f"]),
        ftr_level=kfs.ftr_level.at[slot].set(feats["level"]),
        ftr_point=kfs.ftr_point.at[slot].set(
            jnp.where(feats["valid"], feats["point"], -1)),
        ftr_valid=kfs.ftr_valid.at[slot].set(feats["valid"]),
    )

    # ---- detect new corners in unoccupied cells, spawn seeds ----------------
    # (ref DepthFilter::initializeSeeds, depth_filter.cpp:129-151)
    occupied = feats["valid"]
    det = detect.detect_features(cur_pyr[:cfg.n_pyr_levels], occupied, cfg)
    new_mask = det["valid"]
    f_new = cam.cam2world(det["px"])
    a0, b0, mu0, s20, zr0 = df.seed_init(
        jnp.full((C,), 1.0, dtype) * depth_med,
        jnp.full((C,), 1.0, dtype) * (0.5 * depth_min))

    # allocate seed slots by compaction
    S = seeds.valid.shape[0]
    new_idx = jnp.nonzero(new_mask, size=C, fill_value=-1)[0]
    free_idx = jnp.nonzero(~seeds.valid, size=C, fill_value=-1)[0]
    take = (new_idx >= 0) & (free_idx >= 0)
    src = jnp.where(take, new_idx, 0)
    dst = jnp.where(take, free_idx, S)
    mode = "drop"
    batch = vo.kf_batch + 1
    seeds = seeds.replace(
        kf=seeds.kf.at[dst].set(slot, mode=mode),
        px=seeds.px.at[dst].set(det["px"][src], mode=mode),
        f=seeds.f.at[dst].set(f_new[src], mode=mode),
        level=seeds.level.at[dst].set(det["level"][src], mode=mode),
        ftype=seeds.ftype.at[dst].set(det["ftype"][src], mode=mode),
        grad=seeds.grad.at[dst].set(det["grad"][src], mode=mode),
        a=seeds.a.at[dst].set(a0[src], mode=mode),
        b=seeds.b.at[dst].set(b0[src], mode=mode),
        mu=seeds.mu.at[dst].set(mu0[src], mode=mode),
        sigma2=seeds.sigma2.at[dst].set(s20[src], mode=mode),
        z_range=seeds.z_range.at[dst].set(zr0[src], mode=mode),
        batch_id=seeds.batch_id.at[dst].set(batch, mode=mode),
        valid=seeds.valid.at[dst].set(take, mode=mode),
    )

    # spawn-time patch-cache fill: the zero-baseline (identity) warp from
    # the just-written keyframe — what getWarpMatrixAffine produces for a
    # feature born in the current frame (matcher.cpp:36-62 with
    # T_cur_ref ~ I); refreshed on-budget as the baseline grows
    patch_new, slv_new, _ = matcher.identity_warp_patches(
        kfs.stack, jnp.full((C,), slot, jnp.int32), det["px"],
        det["level"], new_mask, cfg, cam.height, cam.width)
    seeds = seeds.replace(
        patch=seeds.patch.at[dst].set(patch_new[src], mode=mode),
        patch_level=seeds.patch_level.at[dst].set(slv_new[src], mode=mode),
        patch_frame=seeds.patch_frame.at[dst].set(vo.frame_id, mode=mode))

    return vo.replace(kfs=kfs, points=pts, seeds=seeds, kf_batch=batch)


def need_new_keyframe(vo: st.VOState, T_cw: SE3, scene_depth, cam,
                      cfg: SVOConfig):
    """Keyframe policy (ref needNewKf, frame_handler_mono.cpp:391-403):
    new KF iff no existing keyframe is within `kfselect_mindist` x scene
    depth of the current camera.

    The reference iterates `overlap_kfs` — the COVISIBLE keyframes from
    getCloseKeyframes (map.cpp:109-154) — not all keyframes; with
    `cfg.kf_select_covisibility` we match that: a nearby keyframe looking
    away must not suppress a new keyframe (rotation-heavy motion)."""
    cam_pos = T_cw.inverse().t
    kf_pos = SE3(q=vo.kfs.q_kw, t=vo.kfs.t_kw).inverse().t
    rel = jnp.linalg.norm(kf_pos - cam_pos, axis=-1) / jnp.maximum(
        scene_depth, 1e-6)
    usable = vo.kfs.valid
    if cfg.kf_select_covisibility:
        overlap = keyframe_overlap(vo, T_cw, cam, cfg)
        usable = usable & (overlap >= cfg.kf_overlap_min_fts)
    rel = jnp.where(usable, rel, jnp.inf)
    return jnp.all(rel > cfg.kfselect_mindist)


# ---------------------------------------------------------------------------
# the fused tracking step (ref processFrame, frame_handler_mono.cpp:171-312)
# ---------------------------------------------------------------------------

def make_track_frame(cfg: SVOConfig, cam, dims):
    """Build the jitted `track_frame(vo, img) -> (vo, out)` closure."""

    def track_frame(vo: st.VOState, img: jnp.ndarray):
        # jax.named_scope = the reference's SVO_START/STOP_TIMER points
        # (frame_handler_base.cpp:46-55): stage attribution in device traces
        dtype = img.dtype
        with jax.named_scope("pyramid_creation"):
            cur_pyr = build_pyramid(img, cfg.total_pyr_levels)
            cur_stack = stack_from_pyramid(cur_pyr)

        # STEP 0: motion model = last frame pose (ref :175)
        T_cw0 = vo.last.T_fw

        # STEP 1: sparse image alignment vs last frame (ref :186-188)
        last = vo.last
        p_w = vo.points.pos[last.ftr_point]
        last_cam_pos = last.T_fw.inverse().t
        depth_last = jnp.linalg.norm(p_w - last_cam_pos, axis=-1)
        has_pt = last.ftr_valid & (last.ftr_point >= 0) & (
            vo.points.valid[last.ftr_point])
        with jax.named_scope("sparse_img_align"):
            T_cur_last, n_tracked, _ = sparse_img_align(
                last.stack, cur_stack, cam, SE3.identity(dtype=dtype),
                last.ftr_px, last.ftr_f, depth_last, has_pt, cfg)
            T_cw = T_cur_last.compose(last.T_fw)

        # STEP 2: map reprojection + feature alignment (ref :203-216)
        with jax.named_scope("reproject"):
            feats, points2, n_matches = reproject_map(
                vo, cur_stack, T_cw, cam, cfg, dims)
            vo = vo.replace(points=points2)

        # STEP 3: pose optimization (ref :226-233)
        p_w = vo.points.pos[jnp.maximum(feats["point"], 0)]
        with jax.named_scope("pose_optimizer"):
            T_cw_opt, inlier, n_edges, cov, _, _ = optimize_pose(
                T_cw, p_w, feats["f"], feats["level"], feats["valid"],
                cam.errorMultiplier2(), cfg)
        feats["valid"] = feats["valid"] & inlier
        feats["point"] = jnp.where(feats["valid"], feats["point"], -1)

        # STEP 4: structure optimization (ref :243)
        slots, sel = select_points_for_optim(
            vo.points.last_optim, vo.points.valid
            & (vo.points.obs_count >= 2), cfg.structureoptim_max_pts)
        obs_kf = vo.points.obs_kf[slots]
        obs_ok = (obs_kf >= 0) & vo.kfs.valid[jnp.maximum(obs_kf, 0)]
        ks = jnp.maximum(obs_kf, 0)
        with jax.named_scope("point_optimizer"):
            pos_new, _ = optimize_points(
                vo.points.pos[slots], vo.kfs.q_kw[ks], vo.kfs.t_kw[ks],
                vo.points.obs_f[slots], obs_ok, sel,
                cfg.structureoptim_n_iter, method=cfg.structureoptim_method)
        pts = vo.points
        pts = pts.replace(
            pos=pts.pos.at[slots].set(
                jnp.where(sel[:, None], pos_new, pts.pos[slots])),
            last_optim=pts.last_optim.at[slots].set(
                jnp.where(sel, vo.frame_id, pts.last_optim[slots])))
        vo = vo.replace(points=pts)

        # quality gate (ref setTrackingQuality, frame_handler_base.cpp:165)
        n_last = jnp.sum(vo.last.ftr_valid).astype(jnp.int32)
        tracking_bad = (n_edges < cfg.quality_min_fts) | (
            (n_last - n_edges) > cfg.quality_max_drop_fts)
        failure = tracking_bad | (n_matches < cfg.min_reproj_matches)
        # on failure keep the previous pose (ref :209-216 reset to last)
        T_final = SE3(
            q=jnp.where(failure, vo.last.q_fw, T_cw_opt.q),
            t=jnp.where(failure, vo.last.t_fw, T_cw_opt.t))

        # STEP 5: depth-filter update with this frame (mapping-thread work)
        with jax.named_scope("depth_filter"):
            vo = update_seeds(vo, cur_stack, T_final, cam, cfg)

        # STEP 6: keyframe decision + insertion (ref :258-312)
        xyz_cur = T_final.apply(vo.points.pos[jnp.maximum(feats["point"], 0)])
        okd = feats["valid"]
        scene_depth = masked_median(xyz_cur[..., 2], okd)
        scene_depth = jnp.where(jnp.isfinite(scene_depth), scene_depth, 1.0)
        make_kf = (~failure) & need_new_keyframe(vo, T_final, scene_depth,
                                                 cam, cfg)

        vo = jax.lax.cond(
            make_kf,
            lambda v: insert_keyframe(v, cur_pyr, cur_stack, T_final, feats,
                                      cam, cfg, dims),
            lambda v: v,
            vo)

        # commit the new "last frame"
        last_new = st.FrameState(
            stack=cur_stack, q_fw=T_final.q, t_fw=T_final.t,
            ftr_px=feats["px"], ftr_f=feats["f"], ftr_level=feats["level"],
            ftr_point=feats["point"], ftr_valid=feats["valid"])
        vo = vo.replace(last=last_new, frame_id=vo.frame_id + 1,
                        pose_cov=cov)

        result = jnp.where(failure, RES_FAILURE,
                           jnp.where(make_kf, RES_IS_KEYFRAME,
                                     RES_NO_KEYFRAME))
        out = {
            "T_cw": T_final,
            "t_wc": T_final.inverse().t,      # camera center (for eval logs)
            "result": result,
            "n_tracked": n_tracked,
            "n_matches": n_matches,
            "n_edges": n_edges,
            "n_seeds": jnp.sum(vo.seeds.valid).astype(jnp.int32),
            "n_points": jnp.sum(vo.points.valid).astype(jnp.int32),
        }
        return vo, out

    return track_frame


def make_track_scan(cfg: SVOConfig, cam, dims):
    """Whole-sequence tracking as ONE device program:
    `track_scan(vo, imgs) -> (vo, outs)` scans `track_frame` over a stacked
    (N,H,W) image batch with zero host round-trips between frames.

    This is the TPU-native throughput mode for offline/dataset runs (EuRoC
    evaluation, mapping jobs): the reference's camera-callback -> queue ->
    tracking-thread loop (`svo_system.cpp:33-73`) is a latency pipeline; on
    TPU the same steady-state tracking is a `lax.scan`, so frames/s measures
    device compute, not host<->device dispatch latency.  The host stage
    machine (`core/frame_handler.py`) still owns bootstrap/relocalization;
    the scan covers the DEFAULT_FRAME steady state (keyframe insertion
    included — it is inside `track_frame` under `lax.cond`).  Local BA is
    excluded, as in the reference where it ran on the mapping thread
    (`depth_filter.cpp:63-67`), to be dispatched between scans.
    """
    track = make_track_frame(cfg, cam, dims)

    def track_scan(vo: st.VOState, imgs: jnp.ndarray):
        def body(v, img):
            v, out = track(v, img)
            return v, {"t_wc": out["t_wc"], "result": out["result"],
                       "n_matches": out["n_matches"],
                       "n_edges": out["n_edges"]}
        return jax.lax.scan(body, vo, imgs)

    return track_scan
