"""Frame handler: the stage machine driving the jitted pipeline — TPU-native
rebuild of `FrameHandlerMono` / `FrameHandlerBase`
(`frame_handler_mono.cpp:61-386`, `frame_handler_base.cpp:87-179`).

Stages (ref frame_handler_base.h:41-57): FIRST_FRAME -> SECOND_FRAME ->
DEFAULT_FRAME, with RELOCALIZING on tracking failure.  The stage machine is
the only host-side control flow; each stage body is a single jitted program
(SURVEY.md §7 L4: "state machine as a small host-side driver around the
jitted kernels").  Per-frame host<->device traffic is one image upload and a
handful of scalars down.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import pipeline, state as st
from android_svo_tpu.core.initialization import bootstrap_pair
from android_svo_tpu.parallel.ba import local_ba, select_core_keyframes
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.ops import detect
from android_svo_tpu.ops.detect import cell_index
from android_svo_tpu.ops.pyramid import build_pyramid, stack_from_pyramid

STAGE_PAUSED = 0
STAGE_FIRST_FRAME = 1
STAGE_SECOND_FRAME = 2
STAGE_DEFAULT_FRAME = 3
STAGE_RELOCALIZING = 4


@dataclass
class TrackResult:
    T_cw: SE3                    # world->camera pose of this frame
    stage: int
    result: int                  # pipeline.RES_*
    n_matches: int = 0
    n_edges: int = 0
    n_seeds: int = 0
    n_points: int = 0
    t_wc: object = None          # camera center in world (device array)


def _scatter_to_cells(px, f, level, point, valid, cfg, dims, w):
    """Scatter arbitrary features into the per-cell table layout used by the
    keyframe arena (one feature per cell, collisions: last write wins)."""
    C = dims["C"]
    cid = jnp.clip(cell_index(px, w, cfg.grid_size, dims["n_cols"]), 0, C - 1)
    cid = jnp.where(valid, cid, C)          # invalid -> dropped
    mode = "drop"
    out_px = jnp.zeros((C, 2), px.dtype).at[cid].set(px, mode=mode)
    out_f = jnp.zeros((C, 3), f.dtype).at[cid].set(f, mode=mode)
    out_level = jnp.zeros((C,), jnp.int32).at[cid].set(level, mode=mode)
    out_point = jnp.full((C,), -1, jnp.int32).at[cid].set(point, mode=mode)
    out_valid = jnp.zeros((C,), bool).at[cid].set(valid, mode=mode)
    return {"px": out_px, "f": out_f, "level": out_level,
            "point": out_point, "valid": out_valid}


def init_map_from_bootstrap(vo: st.VOState, boot, ref_pyr, cur_pyr,
                            T_ref_w: SE3, det_level, cam, cfg: SVOConfig,
                            dims) -> st.VOState:
    """Populate the arenas from a successful two-frame bootstrap
    (ref initialization.cpp:117-138 + processSecondFrame
    frame_handler_mono.cpp:132-165)."""
    C = dims["C"]
    dtype = boot["xyz_ref"].dtype
    good = boot["inlier"]
    slots = jnp.arange(C, dtype=jnp.int32)
    ref_stack = stack_from_pyramid(ref_pyr)
    cur_stack = stack_from_pyramid(cur_pyr)
    px_ref = (jnp.stack([boot["px_ref_x"], boot["px_ref_y"]], axis=-1)
              if "px_ref_x" in boot else boot["px_ref"])

    # landmarks in world frame (slot i = correspondence i)
    T_w_ref = T_ref_w.inverse()
    pos_w = T_w_ref.apply(boot["xyz_ref"])
    pts = vo.points
    pts = pts.replace(
        pos=pts.pos.at[slots].set(pos_w),
        ptype=pts.ptype.at[slots].set(
            jnp.where(good, st.TYPE_UNKNOWN, st.TYPE_DELETED)),
        n_succ=pts.n_succ.at[slots].set(0),
        n_fail=pts.n_fail.at[slots].set(0),
        ref_kf=pts.ref_kf.at[slots].set(0),
        ref_px=pts.ref_px.at[slots].set(px_ref),
        ref_level=pts.ref_level.at[slots].set(det_level),
        ref_f=pts.ref_f.at[slots].set(boot["f_ref"]),
        obs_kf=pts.obs_kf.at[slots, 0].set(jnp.where(good, 0, -1)),
        obs_f=pts.obs_f.at[slots, 0].set(boot["f_ref"]),
        obs_px=pts.obs_px.at[slots, 0].set(px_ref),
        obs_level=pts.obs_level.at[slots, 0].set(det_level),
        obs_count=pts.obs_count.at[slots].set(good.astype(jnp.int32)),
    )
    vo = vo.replace(points=pts)

    # keyframe 0 = first frame
    point_ids = jnp.where(good, slots, -1)
    kfs = vo.kfs
    kfs = kfs.replace(
        stack=kfs.stack.at[0].set(ref_stack),
        q_kw=kfs.q_kw.at[0].set(T_ref_w.q),
        t_kw=kfs.t_kw.at[0].set(T_ref_w.t),
        valid=kfs.valid.at[0].set(True),
        frame_id=kfs.frame_id.at[0].set(0),
        scene_depth=kfs.scene_depth.at[0].set(
            jnp.asarray(cfg.map_scale, dtype)),
        ftr_px=kfs.ftr_px.at[0].set(boot["px_ref"]),
        ftr_f=kfs.ftr_f.at[0].set(boot["f_ref"]),
        ftr_level=kfs.ftr_level.at[0].set(det_level),
        ftr_point=kfs.ftr_point.at[0].set(point_ids),
        ftr_valid=kfs.ftr_valid.at[0].set(good),
    )
    vo = vo.replace(kfs=kfs, kf_batch=jnp.asarray(1, jnp.int32),
                    frame_id=jnp.asarray(1, jnp.int32))

    # fill the warped-patch cache for the bootstrap landmarks (identity
    # warp from keyframe 0) so they are matchable from the first tracked
    # frame — without this the post-bootstrap frames would have to warm the
    # cache through the per-frame refresh budget
    from android_svo_tpu.ops import matcher as _matcher
    patch0, slv0, ok0 = _matcher.identity_warp_patches(
        kfs.stack, jnp.zeros((C,), jnp.int32), px_ref,
        jnp.full((C,), det_level, jnp.int32) if jnp.ndim(det_level) == 0
        else det_level, good, cfg, cam.height, cam.width)
    pscat = jnp.where(ok0, slots, pts.pos.shape[0])
    pts = vo.points
    pts = pts.replace(
        warp_patch=pts.warp_patch.at[pscat].set(patch0, mode="drop"),
        warp_level=pts.warp_level.at[pscat].set(slv0, mode="drop"),
        warp_frame=pts.warp_frame.at[pscat].set(1, mode="drop"))
    vo = vo.replace(points=pts)

    # keyframe 1 = second frame via the standard insertion path
    T_cw2 = boot["T_cur_ref"].compose(T_ref_w)
    feats2 = _scatter_to_cells(boot["px_cur"], boot["f_cur"],
                               jnp.zeros((C,), jnp.int32), point_ids, good,
                               cfg, dims, cam.width)
    vo = pipeline.insert_keyframe(vo, cur_pyr, cur_stack, T_cw2, feats2,
                                  cam, cfg, dims)

    last = st.FrameState(
        stack=cur_stack, q_fw=T_cw2.q, t_fw=T_cw2.t,
        ftr_px=feats2["px"], ftr_f=feats2["f"], ftr_level=feats2["level"],
        ftr_point=feats2["point"], ftr_valid=feats2["valid"])
    return vo.replace(last=last, frame_id=jnp.asarray(2, jnp.int32))


class FrameHandler:
    """Host-side VO driver (the reference's `SvoSystem` + `FrameHandlerMono`
    without threads: one `add_image` call = one tracked frame)."""

    def __init__(self, cam, cfg: SVOConfig = SVOConfig(),
                 init_T_cw: Optional[SE3] = None, seed: int = 0,
                 perf_mon=None):
        self.cam = cam
        self.cfg = cfg
        self.dims = st.arena_dims(cfg, cam.width, cam.height)
        self.stage = STAGE_FIRST_FRAME
        self.vo = st.init_state(cfg, cam.width, cam.height)
        self.init_T_cw = init_T_cw or SE3.identity()
        self._key = jax.random.PRNGKey(seed)
        self._first = None          # (pyr, det) of the first frame
        self._n_fail = 0
        self._n_kf_since_ba = 0
        # per-stage timing + per-frame trace (ref SVO_START/STOP_TIMER,
        # frame_handler_base.cpp:43-70,126-132); None = no instrumentation
        self.perf_mon = perf_mon

        self._jit_track = jax.jit(pipeline.make_track_frame(cfg, cam,
                                                            self.dims))
        self._jit_pyr_det = jax.jit(self._pyr_det)
        self._jit_boot = jax.jit(partial(bootstrap_pair, cam=cam, cfg=cfg))
        self._jit_init_map = jax.jit(partial(
            init_map_from_bootstrap, cam=cam, cfg=cfg, dims=self.dims))
        self._jit_ba = jax.jit(self._run_local_ba)

    def reset(self):
        """Restart from scratch keeping the compiled programs (ref
        FrameHandlerBase::reset + resetAll, frame_handler_base.cpp:87-108)."""
        self.stage = STAGE_FIRST_FRAME
        self.vo = st.init_state(self.cfg, self.cam.width, self.cam.height)
        self._first = None
        self._n_fail = 0
        self._n_kf_since_ba = 0

    # -- stage bodies ---------------------------------------------------------
    def _pyr_det(self, img):
        pyr = build_pyramid(img, self.cfg.total_pyr_levels)
        det = detect.detect_features(pyr[:self.cfg.n_pyr_levels], None,
                                     self.cfg)
        return pyr, det

    def add_image(self, img, timestamp: float = 0.0) -> TrackResult:
        if self.perf_mon is None:
            return self._add_image(img)
        with self.perf_mon.timer("tot_time"):
            res = self._add_image(img)
        self.perf_mon.log("frame_id", int(self.vo.frame_id))
        self.perf_mon.log("stage", self.stage)
        self.perf_mon.log("result", res.result)
        self.perf_mon.log("n_matches", res.n_matches)
        self.perf_mon.log("n_edges", res.n_edges)
        self.perf_mon.log("n_seeds", res.n_seeds)
        self.perf_mon.log("n_points", res.n_points)
        self.perf_mon.write_frame()
        return res

    def _add_image(self, img) -> TrackResult:
        img = jnp.asarray(img, jnp.float32)
        if self.stage == STAGE_FIRST_FRAME:
            return self._process_first(img)
        if self.stage == STAGE_SECOND_FRAME:
            return self._process_second(img)
        if self.stage in (STAGE_DEFAULT_FRAME, STAGE_RELOCALIZING):
            return self._process_default(img)
        return TrackResult(T_cw=self.init_T_cw, stage=self.stage,
                           result=pipeline.RES_NO_KEYFRAME)

    def _timer(self, name):
        import contextlib
        if self.perf_mon is None:
            return contextlib.nullcontext()
        return self.perf_mon.timer(name)

    def _process_first(self, img) -> TrackResult:
        with self._timer("pyramid_creation"):
            pyr, det = self._jit_pyr_det(img)
            jax.block_until_ready(det["px"])
        n = int(det["valid"].sum())
        if n >= self.cfg.init_min_kps:
            self._first = (pyr, det)
            self.stage = STAGE_SECOND_FRAME
        return TrackResult(T_cw=self.init_T_cw, stage=self.stage,
                           result=pipeline.RES_IS_KEYFRAME
                           if self._first else pipeline.RES_FAILURE)

    def _process_second(self, img) -> TrackResult:
        ref_pyr, det = self._first
        cur_pyr = build_pyramid(img, self.cfg.total_pyr_levels)
        self._key, sub = jax.random.split(self._key)
        boot = self._jit_boot(ref_pyr, cur_pyr, px_ref=det["px"],
                              valid=det["valid"], key=sub)
        n_tracked = int(boot["n_tracked"])
        if n_tracked < self.cfg.init_min_tracked:
            # lost the first frame -> restart (ref initialization.cpp:65-69)
            self.stage = STAGE_FIRST_FRAME
            self._first = None
            return TrackResult(T_cw=self.init_T_cw, stage=self.stage,
                               result=pipeline.RES_FAILURE)
        if float(boot["disparity"]) < self.cfg.init_min_disparity:
            # not enough parallax yet -> wait (ref :72-75)
            return TrackResult(T_cw=self.init_T_cw, stage=self.stage,
                               result=pipeline.RES_NO_KEYFRAME)
        if int(boot["n_inliers"]) < self.cfg.init_min_inliers:
            return TrackResult(T_cw=self.init_T_cw, stage=self.stage,
                               result=pipeline.RES_NO_KEYFRAME)
        boot = dict(boot)
        boot["px_ref"] = det["px"]
        self.vo = self._jit_init_map(self.vo, boot, ref_pyr, cur_pyr,
                                     self.init_T_cw, det["level"])
        self.stage = STAGE_DEFAULT_FRAME
        T_cw = boot["T_cur_ref"].compose(self.init_T_cw)
        return TrackResult(T_cw=T_cw, stage=self.stage,
                           result=pipeline.RES_IS_KEYFRAME)

    def _run_local_ba(self, vo: st.VOState) -> st.VOState:
        """Local BA over the core keyframe window after keyframe insertion
        (the reference's compiled-out local BA hook,
        frame_handler_mono.cpp:280-295)."""
        cfg = self.cfg
        T_cw = vo.last.T_fw
        n_core = min(cfg.loba_num_kfs + 1, cfg.max_n_kfs)
        core, fixed = select_core_keyframes(
            vo.kfs.q_kw, vo.kfs.t_kw, vo.kfs.valid, T_cw, n_core)
        pvalid = vo.points.valid & (vo.points.obs_count >= 2)
        # compact the (mostly dead) landmark arena to a fixed budget before
        # the Schur einsums — they are O(arena) regardless of masks; points
        # beyond the budget keep their positions this round.  A
        # frame-rotating offset round-robins WHICH live landmarks get
        # BA-refined (like the seed-update budget, pipeline.py:101-114):
        # without it, the lowest-index slots would be re-optimized every
        # round while high-slot landmarks drift relative to the BA-updated
        # keyframe poses forever (ADVICE r4 #1).
        P = pvalid.shape[0]
        Bba = min(cfg.loba_point_budget, P)
        offset = (vo.frame_id * jnp.asarray(263, jnp.int32)) % P
        rot_valid = jnp.roll(pvalid, -offset)
        idx = jnp.nonzero(rot_valid, size=Bba, fill_value=-1)[0]
        sel = idx >= 0
        idxc = (jnp.maximum(idx, 0) + offset) % P
        q2, t2, pos2_b, _ = local_ba(
            vo.points.pos[idxc], sel, vo.points.obs_kf[idxc],
            vo.points.obs_f[idxc], vo.kfs.q_kw, vo.kfs.t_kw, core, fixed,
            self.cam.errorMultiplier2(), cfg)
        pos2 = vo.points.pos.at[jnp.where(sel, idxc, P)].set(
            pos2_b, mode="drop")
        kfs = vo.kfs.replace(q_kw=q2, t_kw=t2)
        pts = vo.points.replace(pos=pos2)
        # the newest keyframe IS the current frame: propagate its BA-adjusted
        # pose into the tracked last-frame state
        newest = jnp.argmax(jnp.where(kfs.valid, kfs.frame_id, -1))
        is_cur = kfs.frame_id[newest] == (vo.frame_id - 1)
        last = vo.last.replace(
            q_fw=jnp.where(is_cur, q2[newest], vo.last.q_fw),
            t_fw=jnp.where(is_cur, t2[newest], vo.last.t_fw))
        return vo.replace(kfs=kfs, points=pts, last=last)

    def _process_default(self, img) -> TrackResult:
        was_reloc = self.stage == STAGE_RELOCALIZING
        if was_reloc:
            self._prepare_relocalization()
        # the fused step covers pyramid_creation / sparse_img_align /
        # reproject / feature_align / pose_optimizer / point_optimizer;
        # host-side it is ONE dispatch (stage attribution inside it comes
        # from the jax.named_scope annotations + device traces)
        with self._timer("fused_track_dispatch"):
            self.vo, out = self._jit_track(self.vo, img)
            # ONE host<->device sync for every scalar the stage machine
            # needs (separate int() casts each cost a round-trip)
            host = jax.device_get({k: out[k] for k in (
                "result", "n_tracked", "n_matches", "n_edges", "n_seeds",
                "n_points")})
            result = int(host["result"])
        if was_reloc and int(host["n_tracked"]) <= self.cfg.reloc_min_tracked:
            # relocalization accept gate: sparse alignment against the
            # closest keyframe must track >30 features before resuming
            # (ref relocalizeFrame, frame_handler_mono.cpp:331-347)
            result = pipeline.RES_FAILURE
        if result == pipeline.RES_IS_KEYFRAME and self.cfg.loba_n_iter > 0:
            self._n_kf_since_ba += 1
            if self._n_kf_since_ba >= self.cfg.loba_every_n_kfs:
                self._n_kf_since_ba = 0
                # dispatch only — NO device sync.  The reference ran BA on
                # the mapping thread so tracking never blocked on it
                # (depth_filter.cpp:63-67 thread split); the single-chip
                # analog is an async dispatch that the device pipeline
                # absorbs between frames (the next track step consumes the
                # BA-updated state, serialized on-device, off the host
                # latency path).
                with self._timer("local_ba"):
                    self.vo = self._jit_ba(self.vo)
        if result == pipeline.RES_FAILURE:
            self._n_fail += 1
            if was_reloc or self._n_fail >= 2:
                self.stage = STAGE_RELOCALIZING
        else:
            self._n_fail = 0
            self.stage = STAGE_DEFAULT_FRAME
        return TrackResult(
            T_cw=out["T_cw"], stage=self.stage, result=result,
            n_matches=int(host["n_matches"]), n_edges=int(host["n_edges"]),
            n_seeds=int(host["n_seeds"]), n_points=int(host["n_points"]),
            t_wc=out["t_wc"])

    def relocalize_frame_at_pose(self, kf_frame_id: int, T_cw_guess: SE3,
                                 img, timestamp: float = 0.0) -> TrackResult:
        """External relocalization hook (ref relocalizeFrameAtPose,
        frame_handler_mono.cpp:351-367): a place-recognition module hands us
        a keyframe id + pose guess; we seat the tracker on that keyframe and
        track the provided image against it.  The seated reference keeps the
        keyframe's own stored pose (the jitted step reconstructs reference
        structure from `last.T_fw`, so the guess serves only as the fallback
        pose reported on failure — the alignment recovers the relative pose
        itself, as in relocalizeFrame, frame_handler_mono.cpp:331-333)."""
        vo = self.vo
        ids = np.asarray(vo.kfs.frame_id)
        valid = np.asarray(vo.kfs.valid)
        match = np.nonzero(valid & (ids == kf_frame_id))[0]
        if match.size == 0:
            return TrackResult(T_cw=T_cw_guess, stage=self.stage,
                               result=pipeline.RES_FAILURE)
        k = int(match[0])
        last = st.FrameState(
            stack=vo.kfs.stack[k],
            q_fw=vo.kfs.q_kw[k], t_fw=vo.kfs.t_kw[k],
            ftr_px=vo.kfs.ftr_px[k], ftr_f=vo.kfs.ftr_f[k],
            ftr_level=vo.kfs.ftr_level[k], ftr_point=vo.kfs.ftr_point[k],
            ftr_valid=vo.kfs.ftr_valid[k])
        self.vo = vo.replace(last=last)
        self.stage = STAGE_DEFAULT_FRAME
        return self._process_default(jnp.asarray(img, jnp.float32))

    def _prepare_relocalization(self):
        """Replace the lost last-frame with the closest keyframe so the next
        track aligns against it (ref relocalizeFrame,
        frame_handler_mono.cpp:317-347)."""
        vo = self.vo
        kf_pos = SE3(q=vo.kfs.q_kw, t=vo.kfs.t_kw).inverse().t
        cam_pos = np.asarray(vo.last.T_fw.inverse().t)
        dist = np.linalg.norm(np.asarray(kf_pos) - cam_pos, axis=-1)
        dist[~np.asarray(vo.kfs.valid)] = np.inf
        k = int(np.argmin(dist))
        last = st.FrameState(
            stack=vo.kfs.stack[k],
            q_fw=vo.kfs.q_kw[k], t_fw=vo.kfs.t_kw[k],
            ftr_px=vo.kfs.ftr_px[k], ftr_f=vo.kfs.ftr_f[k],
            ftr_level=vo.kfs.ftr_level[k], ftr_point=vo.kfs.ftr_point[k],
            ftr_valid=vo.kfs.ftr_valid[k])
        self.vo = vo.replace(last=last)
