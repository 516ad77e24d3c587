"""Edgelet features: detection fallback in cornerless cells, gradient
direction storage, and 1D alignment routing (ref feature.h:31 CORNER/EDGELET,
matcher.cpp:192-200 — latent in the reference, enabled via config here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.ops import detect, matcher
from android_svo_tpu.ops.pyramid import build_pyramid, build_stack

CFG = SVOConfig(edgelet_detection=True)
H, W = 240, 320


def edge_image():
    """Horizontal intensity step (a pure edge: no corners anywhere)."""
    img = jnp.zeros((H, W), jnp.float32)
    ramp = jax.nn.sigmoid((jnp.arange(H) - H / 2) / 1.5) * 200.0
    return img + ramp[:, None]


class TestEdgeletDetection:
    def test_edge_image_yields_edgelets_not_corners(self):
        pyr = build_pyramid(edge_image(), CFG.total_pyr_levels)
        det = detect.detect_features(pyr[:CFG.n_pyr_levels], None, CFG)
        valid = np.asarray(det["valid"])
        ftype = np.asarray(det["ftype"])
        assert valid.sum() > 10
        # every detection on a pure edge must be an EDGELET
        assert (ftype[valid] == detect.FTYPE_EDGELET).all()
        # gradient of a horizontal edge points along +/-y
        grad = np.asarray(det["grad"])[valid]
        assert (np.abs(grad[:, 1]) > 0.95).all(), grad[:5]
        # detections sit on the edge (y ~ H/2), at any level
        ys = np.asarray(det["px"])[valid, 1]
        assert (np.abs(ys - H / 2) < 6).all(), ys

    def test_corners_still_win_when_present(self):
        key = jax.random.PRNGKey(3)
        img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
        pyr = build_pyramid(img, CFG.total_pyr_levels)
        det = detect.detect_features(pyr[:CFG.n_pyr_levels], None, CFG)
        valid = np.asarray(det["valid"])
        ftype = np.asarray(det["ftype"])
        # noise is corner-rich: overwhelmingly CORNER type
        assert (ftype[valid] == detect.FTYPE_CORNER).mean() > 0.9

    def test_off_by_default_output_shape_stable(self):
        cfg = SVOConfig()
        pyr = build_pyramid(edge_image(), cfg.total_pyr_levels)
        det = detect.detect_features(pyr[:cfg.n_pyr_levels], None, cfg)
        assert "ftype" in det and "grad" in det
        # without the fallback a pure edge yields (almost) nothing
        assert int(det["valid"].sum()) <= 2


class TestEdgeletMatching:
    def test_align1d_recovers_shift_along_gradient(self):
        """An edgelet can only be localized along its gradient; the 1D
        routing must recover a shift in that direction."""
        cfg = CFG
        img = edge_image()
        stack = build_stack(img, cfg.total_pyr_levels)
        n = 8
        x = jnp.linspace(40, W - 40, n)
        y_true = jnp.full((n,), H / 2 + 0.3)
        uv_true = jnp.stack([x, y_true], -1)
        from android_svo_tpu.ops import patch_pallas as pp
        refp, gx, gy = pp.sample_patches(
            stack, jnp.zeros((n,), jnp.int32), uv_true, cfg.patch_halfsize + 1,
            grad=True, use_pallas=False)
        refp, gx, gy = refp[:, 1:-1, 1:-1], gx[:, 1:-1, 1:-1], gy[:, 1:-1, 1:-1]
        direction = jnp.tile(jnp.array([[0.0, 1.0]], jnp.float32), (n, 1))
        # start displaced along the gradient (the recoverable axis)
        uv0 = uv_true + jnp.array([0.0, 1.5], jnp.float32)
        uv, conv, _ = matcher.align1d_stack(
            stack, jnp.zeros((n,), jnp.int32), refp, gx, gy, direction,
            uv0, jnp.ones((n,), bool), 10, H, W, use_pallas=False)
        err = np.abs(np.asarray(uv[:, 1] - y_true))
        assert np.asarray(conv).all()
        assert np.median(err) < 0.05, err

    def test_find_match_direct_routes_edgelets(self):
        """With edgelet routing the matcher must still succeed on edge
        features between two identity-pose frames, and correct an
        along-gradient offset."""
        cfg = CFG
        img = edge_image()
        stack = build_stack(img, cfg.total_pyr_levels)
        kf_stack = stack[None]                               # (1, L, Hp, Wp)
        from android_svo_tpu.data import synthetic
        cam = synthetic.default_camera(W, H)
        n = 8
        x = jnp.linspace(40, W - 40, n)
        px_ref = jnp.stack([x, jnp.full((n,), H / 2 + 0.3)], -1)
        f_ref = cam.cam2world(px_ref)
        depth = jnp.full((n,), 3.0)
        grad = jnp.tile(jnp.array([[0.0, 1.0]], jnp.float32), (n, 1))
        ftype = jnp.full((n,), detect.FTYPE_EDGELET, jnp.int32)
        # initial guess displaced along the gradient
        px_init = px_ref + jnp.array([0.0, 2.0], jnp.float32)
        px_cur, lvl, ok = matcher.find_match_direct(
            stack, kf_stack, jnp.zeros((n,), jnp.int32), cam,
            px_ref, f_ref, depth, jnp.zeros((n,), jnp.int32),
            SE3.identity(), px_init, jnp.ones((n,), bool), cfg,
            ref_grad=grad, ref_type=ftype)
        ok = np.asarray(ok)
        err = np.abs(np.asarray(px_cur[:, 1] - px_ref[:, 1]))
        assert ok.sum() >= n - 1, ok
        assert np.median(err[ok]) < 0.2, err


class TestEdgeletEndToEnd:
    @pytest.mark.slow
    def test_tracks_edge_rich_scene(self):
        """Live-path mileage for edgelets: track a low-corner, edge-rich
        scene (concentric rings + a thin corner band for bootstrap) with
        `edgelet_detection=True` end-to-end.  Edgelet landmarks must exist
        in the live map and tracking must survive (the integrated version
        of the reference's latent edgelet path, feature.h:31 +
        matcher.cpp:192-200)."""
        from android_svo_tpu.core import frame_handler as fh
        from android_svo_tpu.core import state as st
        from android_svo_tpu.data import synthetic

        cfg = SVOConfig(
            edgelet_detection=True, max_n_kfs=8, max_points=2048,
            max_seeds=1024, ransac_n_trials=128, img_align_n_iter=15,
            init_min_disparity=15.0, init_min_kps=60, init_min_tracked=30,
            init_min_inliers=25, quality_min_fts=25, min_reproj_matches=20,
            min_pose_opt_edges=12, kfselect_mindist=0.03)
        cam = synthetic.default_camera(W, H)
        tex = synthetic.make_edge_texture(jax.random.PRNGKey(3), 2048)
        poses = []
        n = 20
        for i in range(n):
            poses.append(synthetic.lookdown_pose(
                0.04 * i, 0.012 * i, -3.0,
                (0.45 + 0.002 * i, -0.002 * i, 0.004 * i)))
        imgs = [synthetic.render(tex, cam, p) for p in poses]

        handler = fh.FrameHandler(cam, cfg)
        n_fail = 0
        for i, img in enumerate(imgs):
            res = handler.add_image(img, i * 0.1)
            if (handler.stage == fh.STAGE_DEFAULT_FRAME
                    and res.result == 0):
                n_fail += 1
        assert handler.stage == fh.STAGE_DEFAULT_FRAME
        assert n_fail == 0
        pts = handler.vo.points
        live_edgelets = int(np.asarray(
            pts.valid & (pts.ref_type == detect.FTYPE_EDGELET)).sum())
        assert live_edgelets > 0, "no edgelet landmarks in the live map"
        # edgelet seeds must also be flowing through the depth filter
        seeds = handler.vo.seeds
        edge_seeds = int(np.asarray(
            seeds.valid & (seeds.ftype == detect.FTYPE_EDGELET)).sum())
        assert edge_seeds > 0, "no edgelet seeds spawned"
