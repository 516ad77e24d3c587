"""End-to-end pipeline tests: bootstrap + tracking on a synthetic sequence
with known trajectory (SURVEY.md §4 items 3-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import frame_handler as fh
from android_svo_tpu.core import pipeline, initialization
from android_svo_tpu.data import synthetic
from android_svo_tpu.evals.trajectory import ate_rmse
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.ops import pyramid, detect

KEY = jax.random.PRNGKey(11)

# small test configuration to keep CPU compile/runtime in check
CFG = SVOConfig(max_n_kfs=8, max_points=2048, max_seeds=1024,
                ransac_n_trials=128, img_align_n_iter=15,
                init_min_disparity=20.0)
W, H = 320, 240


def make_sequence(n_frames, step=0.04, tilt=0.45):
    """Render a tracked sweep over the textured plane.

    `tilt` pitches the camera away from fronto-parallel so scene depth
    varies across the image.  An exactly fronto-parallel plane at constant
    depth is DEGENERATE for monocular VO: translation flow is exactly
    uniform and a compensating rotation reproduces it to ~0.5 px at the
    image corners, so the estimated trajectory scale silently collapses
    (the keyframe policy then never fires).  Real scenes have depth
    variation; the tilt restores it.
    """
    cam = synthetic.default_camera(W, H)
    tex = synthetic.make_texture(KEY, 2048)
    poses = []
    for i in range(n_frames):
        x = step * i
        y = 0.3 * step * i
        rot = (tilt + 0.002 * i, -0.002 * i, 0.004 * i)
        poses.append(synthetic.lookdown_pose(x, y, -3.0, rot))
    imgs = [synthetic.render(tex, cam, p) for p in poses]
    return cam, imgs, poses


class TestBootstrapKLT:
    def test_klt_tracks_known_shift(self):
        cam, imgs, poses = make_sequence(2, step=0.12, tilt=0.0)
        pyr0 = pyramid.build_pyramid(imgs[0], CFG.total_pyr_levels)
        pyr1 = pyramid.build_pyramid(imgs[1], CFG.total_pyr_levels)
        det = detect.detect_features(pyr0[:CFG.n_pyr_levels], None, CFG)
        px_cur, tracked = initialization.track_klt(
            pyr0, pyr1, det["px"], det["valid"], CFG)
        assert int(tracked.sum()) > 0.6 * int(det["valid"].sum())
        # ground truth: project the plane point into frame 2
        d = synthetic.true_depth(cam, poses[0], det["px"])
        f = cam.cam2world(det["px"])
        T_10 = poses[1].inverse().compose(poses[0])
        px_gt = cam.world2cam(T_10.apply(f * d[:, None]))
        err = jnp.linalg.norm(px_cur - px_gt, axis=-1)
        med = float(jnp.median(err[tracked]))
        assert med < 0.3, med

    def test_ransac_recovers_relpose(self):
        cam, imgs, poses = make_sequence(2, step=0.15, tilt=0.0)
        pyr0 = pyramid.build_pyramid(imgs[0], CFG.total_pyr_levels)
        pyr1 = pyramid.build_pyramid(imgs[1], CFG.total_pyr_levels)
        det = detect.detect_features(pyr0[:CFG.n_pyr_levels], None, CFG)
        boot = initialization.bootstrap_pair(
            pyr0, pyr1, cam, det["px"], det["valid"], CFG, KEY)
        T_gt = poses[1].inverse().compose(poses[0])
        # direction of translation (scale is free)
        t_est = boot["T_cur_ref"].t
        t_gt = T_gt.t
        cos = float(jnp.dot(t_est, t_gt)
                    / (jnp.linalg.norm(t_est) * jnp.linalg.norm(t_gt)))
        assert cos > 0.995, cos
        # rotation error
        r_err = float(jnp.linalg.norm(
            boot["T_cur_ref"].inverse().compose(
                SE3(q=T_gt.q, t=t_est)).log()[3:]))
        assert r_err < 0.01, r_err
        assert int(boot["n_inliers"]) > 50


class TestEndToEnd:
    @pytest.mark.slow
    def test_tracks_sequence(self):
        n = 12
        cam, imgs, poses = make_sequence(n, step=0.05)
        handler = fh.FrameHandler(cam, CFG)
        est_pos = []
        gt_pos = []
        n_fail = 0
        for i, (img, pose_gt) in enumerate(zip(imgs, poses)):
            res = handler.add_image(img, i * 0.1)
            if handler.stage == fh.STAGE_DEFAULT_FRAME:
                est_pos.append(np.asarray(res.T_cw.inverse().t))
                gt_pos.append(np.asarray(pose_gt.t))
                if res.result == pipeline.RES_FAILURE:
                    n_fail += 1
        assert handler.stage == fh.STAGE_DEFAULT_FRAME
        assert len(est_pos) >= n - 4        # bootstrap takes a few frames
        assert n_fail == 0
        ate = ate_rmse(np.array(est_pos), np.array(gt_pos))
        # camera moves ~0.05/frame at 3.0 scene depth; demand ~3%-of-depth
        # ATE after Sim3 alignment.  NOTE: closest-view patch sourcing
        # (ref getCloseViewObs, point.cpp:101-125) trades a little drift on
        # this benign synthetic sweep (0.038 with birth-anchor patches) for
        # viewpoint robustness on real sequences — we keep the reference's
        # behavior and budget for it here.
        assert ate < 0.09, ate

    @pytest.mark.slow
    def test_tracks_sequence_lm(self):
        """Full pipeline with the Levenberg-Marquardt solver strategy on
        the pose and structure optimizers (ref nlls_solver_impl.hpp:103-229
        — the template's second strategy): live-path mileage for
        `method="lm"` beyond unit level, same accuracy bar as GN."""
        n = 12
        cfg = CFG.replace(poseoptim_method="lm", structureoptim_method="lm")
        cam, imgs, poses = make_sequence(n, step=0.05)
        handler = fh.FrameHandler(cam, cfg)
        est_pos, gt_pos = [], []
        n_fail = 0
        for i, (img, pose_gt) in enumerate(zip(imgs, poses)):
            res = handler.add_image(img, i * 0.1)
            if handler.stage == fh.STAGE_DEFAULT_FRAME:
                est_pos.append(np.asarray(res.T_cw.inverse().t))
                gt_pos.append(np.asarray(pose_gt.t))
                if res.result == pipeline.RES_FAILURE:
                    n_fail += 1
        assert handler.stage == fh.STAGE_DEFAULT_FRAME
        assert n_fail == 0
        ate = ate_rmse(np.array(est_pos), np.array(gt_pos))
        assert ate < 0.09, ate

    @pytest.mark.slow
    def test_relocalization_after_occlusion(self):
        """Adversarial sequence: a mid-sequence occlusion (blank frames)
        forces tracking failure -> STAGE_RELOCALIZING; when texture returns
        near the last tracked pose the tracker must re-acquire via
        sparse-align against the closest keyframe and return to
        STAGE_DEFAULT_FRAME with bounded error (ref §3.5 semantics,
        frame_handler_mono.cpp:317-347, frame_handler_base.cpp:134-139)."""
        n = 32
        occluded = set(range(18, 22))
        cam, imgs, poses = make_sequence(n, step=0.03)
        handler = fh.FrameHandler(cam, CFG)
        saw_reloc = False
        recovered_at = None
        est_pos, gt_pos = [], []
        for i, (img, pose_gt) in enumerate(zip(imgs, poses)):
            if i in occluded:
                img = jnp.zeros_like(img)
            res = handler.add_image(img, i * 0.1)
            if handler.stage == fh.STAGE_RELOCALIZING:
                saw_reloc = True
            if (saw_reloc and recovered_at is None
                    and handler.stage == fh.STAGE_DEFAULT_FRAME):
                recovered_at = i
            if (handler.stage == fh.STAGE_DEFAULT_FRAME
                    and i not in occluded
                    and res.result != pipeline.RES_FAILURE):
                est_pos.append(np.asarray(res.T_cw.inverse().t))
                gt_pos.append(np.asarray(pose_gt.t))
        assert saw_reloc, "occlusion must trip the failure path"
        assert recovered_at is not None, "tracker never recovered"
        assert handler.stage == fh.STAGE_DEFAULT_FRAME
        # bounded ATE including the post-recovery segment
        ate = ate_rmse(np.array(est_pos), np.array(gt_pos))
        assert ate < 0.12, ate

    @pytest.mark.slow
    def test_long_horizon_with_eviction(self):
        """60-frame sweep with a small keyframe arena so furthest-KF
        eviction + landmark re-anchoring (pipeline.insert_keyframe's
        evicted-slot scrub) runs several times mid-sequence — the code path
        the reference exercises via `max_n_kfs` pruning
        (frame_handler_mono.cpp:303-308, map.cpp:66-99)."""
        n = 60
        cfg = CFG.replace(max_n_kfs=6, kfselect_mindist=0.03)
        cam, imgs, poses = make_sequence(n, step=0.03)
        handler = fh.FrameHandler(cam, cfg)
        est_pos, gt_pos = [], []
        n_fail = 0
        n_kf = 0
        for i, (img, pose_gt) in enumerate(zip(imgs, poses)):
            res = handler.add_image(img, i * 0.1)
            if handler.stage == fh.STAGE_DEFAULT_FRAME:
                est_pos.append(np.asarray(res.T_cw.inverse().t))
                gt_pos.append(np.asarray(pose_gt.t))
                if res.result == pipeline.RES_FAILURE:
                    n_fail += 1
                if res.result == pipeline.RES_IS_KEYFRAME:
                    n_kf += 1
        assert handler.stage == fh.STAGE_DEFAULT_FRAME
        assert n_fail == 0
        # eviction must actually have happened (bootstrap adds 2 KFs)
        assert n_kf + 2 > cfg.max_n_kfs, n_kf
        # the arena must stay exactly full once eviction starts
        assert int(np.asarray(handler.vo.kfs.valid).sum()) == cfg.max_n_kfs
        ate = ate_rmse(np.array(est_pos), np.array(gt_pos))
        assert ate < 0.09, ate
