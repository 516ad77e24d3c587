"""Tests for map-level utilities (transform/validation/statistics —
map.cpp:183-382 analogs), the visualization overlay (GLRenderer analog),
YUV conversion (image_process analog), and the external relocalization hook
(frame_handler_mono.cpp:351-367)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import frame_handler as fh
from android_svo_tpu.core import map_tools, pipeline, state as st
from android_svo_tpu.data import synthetic
from android_svo_tpu.data.yuv import rgb_to_gray, yuv420_to_gray, yuv420_to_rgb
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.viz import (Visualizer, draw_cube, draw_features,
                                 gray_to_rgb, save_ppm)

KEY = jax.random.PRNGKey(11)
# small config: the fixture only needs a POPULATED map, not VGA fidelity
# (the full-size end-to-end path is covered by test_pipeline)
CFG = SVOConfig(max_n_kfs=8, max_points=512, max_seeds=512,
                ransac_n_trials=64, img_align_n_iter=8,
                init_min_kps=20, init_min_tracked=15,
                init_min_disparity=10.0, init_min_inliers=12,
                min_reproj_matches=10, quality_min_fts=10,
                min_pose_opt_edges=5)
W, H = 160, 120


@pytest.fixture(scope="module")
def tracked_handler():
    """A handler that has bootstrapped and tracked a few frames."""
    cam = synthetic.default_camera(W, H)
    tex = synthetic.make_texture(KEY, 1024)
    handler = fh.FrameHandler(cam, CFG)
    for i in range(8):
        pose = synthetic.lookdown_pose(0.04 * i, 0.013 * i, -3.0,
                                       (0.001 * i, -0.001 * i, 0.002 * i))
        img = synthetic.render(tex, cam, pose)
        handler.add_image(img, i * 0.1)
    assert handler.stage == fh.STAGE_DEFAULT_FRAME
    return handler


class TestMapTransform:
    def test_reprojection_invariant(self, tracked_handler):
        """Re-anchoring the whole map must leave every point's camera-frame
        coordinates unchanged (ref Map::transform semantics)."""
        vo = tracked_handler.vo
        # an arbitrary rigid+scale transform
        Rt = SE3.exp(jnp.array([0.1, -0.2, 0.3, 0.2, -0.1, 0.4],
                               jnp.float32))
        R, t, s = Rt.rotation_matrix(), Rt.t, 1.7
        vo2 = jax.jit(lambda v: map_tools.transform_map(v, R, t, s))(vo)

        pv = np.asarray(vo.points.valid)
        p_old = np.asarray(vo.points.pos)[pv]
        p_new = np.asarray(vo2.points.pos)[pv]
        for k in np.nonzero(np.asarray(vo.kfs.valid))[0][:3]:
            xc_old = np.asarray(vo.kfs.pose(int(k)).apply(p_old))
            xc_new = np.asarray(vo2.kfs.pose(int(k)).apply(p_new))
            # camera-frame geometry scales uniformly by s
            np.testing.assert_allclose(xc_new, s * xc_old, rtol=2e-3,
                                       atol=2e-3)

    def test_validation_clean(self, tracked_handler):
        errs = map_tools.map_validation(tracked_handler.vo,
                                        tracked_handler.dims)
        assert all(v == 0 for v in errs.values()), errs

    def test_validation_detects_corruption(self, tracked_handler):
        vo = tracked_handler.vo
        # point a valid feature at a deleted landmark slot
        kfs = vo.kfs
        k = int(np.nonzero(np.asarray(kfs.valid))[0][0])
        c = int(np.nonzero(np.asarray(kfs.ftr_valid[k]))[0][0])
        dead = int(np.nonzero(np.asarray(
            vo.points.ptype) == st.TYPE_DELETED)[0][0])
        bad = vo.replace(kfs=kfs.replace(
            ftr_point=kfs.ftr_point.at[k, c].set(dead)))
        errs = map_tools.map_validation(bad, tracked_handler.dims)
        assert errs["ftr_to_deleted_point"] >= 1

    def test_statistics(self, tracked_handler):
        stats = map_tools.map_statistics(tracked_handler.vo)
        assert stats["n_keyframes"] >= 2
        assert stats["n_points"] > 0
        assert stats["avg_fts_per_kf"] > 0

    def test_queries(self, tracked_handler):
        vo = tracked_handler.vo
        T_cw = vo.last.T_fw
        cam = tracked_handler.cam
        dist = map_tools.get_close_keyframes(vo, T_cw, cam)
        assert np.isfinite(np.asarray(dist)).any()
        k = int(map_tools.get_furthest_keyframe(vo, T_cw.inverse().t))
        assert bool(vo.kfs.valid[k])


class TestRelocalizeAtPose:
    def test_hook_recovers_pose(self, tracked_handler):
        """Seat the tracker on a keyframe and feed that keyframe's own image
        back: the hook must relocalize to (approximately) the keyframe pose.
        (The VO world is scale-normalized by the bootstrap, so re-rendering
        synthetic frames at estimated poses is not meaningful — the stored
        keyframe image is the ground-truth-consistent input.)"""
        import copy
        handler = copy.copy(tracked_handler)
        handler.vo = tracked_handler.vo
        vo = handler.vo
        k = int(np.argmax(np.asarray(vo.kfs.frame_id)
                          * np.asarray(vo.kfs.valid)))
        kf_id = int(vo.kfs.frame_id[k])
        T_kw = SE3(q=vo.kfs.q_kw[k], t=vo.kfs.t_kw[k])
        img = vo.kfs.stack[k, 0, :H, :W]
        res = handler.relocalize_frame_at_pose(kf_id, T_kw, img)
        assert res.result != pipeline.RES_FAILURE
        err = float(jnp.linalg.norm(res.T_cw.inverse().t
                                    - T_kw.inverse().t))
        assert err < 0.01, err

    def test_unknown_keyframe_fails(self, tracked_handler):
        res = tracked_handler.relocalize_frame_at_pose(
            99999, SE3.identity(), jnp.zeros((H, W), jnp.float32))
        assert res.result == pipeline.RES_FAILURE


class TestViz:
    def test_overlay_and_ppm(self, tmp_path, tracked_handler):
        cam = tracked_handler.cam
        img = np.random.default_rng(0).uniform(0, 255, (H, W)).astype(
            np.float32)
        rgb = gray_to_rgb(img)
        before = rgb.copy()
        px = np.array([[50.0, 60.0], [100.0, 120.0], [-5.0, 3.0]])
        draw_features(rgb, px, np.array([True, True, True]))
        assert (rgb != before).any()
        # cube in front of a camera looking down at the plane from z=-3
        T_cw = synthetic.lookdown_pose(0.0, 0.0, -3.0)
        out = draw_cube(rgb, cam, T_cw, center=(0.0, 0.0, 0.0), size=0.5)
        assert (out != before).any()
        path = os.path.join(tmp_path, "f.ppm")
        save_ppm(path, out)
        with open(path, "rb") as fh_:
            head = fh_.read(2)
        assert head == b"P6"
        assert os.path.getsize(path) > H * W

    def test_visualizer_writes_frames(self, tmp_path, tracked_handler):
        cam = tracked_handler.cam
        viz = Visualizer(str(tmp_path), cam)
        vo = tracked_handler.vo
        img = np.zeros((H, W), np.float32)
        viz(img, vo.last.T_fw, np.asarray(vo.last.ftr_px),
            np.asarray(vo.last.ftr_valid))
        assert os.path.exists(os.path.join(tmp_path, "frame_000000.ppm"))


class TestYUV:
    def test_gray_is_luma(self):
        y = np.random.default_rng(1).integers(0, 256, (64, 64))
        g = yuv420_to_gray(jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(g), y.astype(np.float32))

    def test_neutral_chroma_is_gray(self):
        y = np.full((8, 8), 128, np.uint8)
        u = np.full((4, 4), 128, np.uint8)
        v = np.full((4, 4), 128, np.uint8)
        rgb = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u),
                                       jnp.asarray(v)))
        # R == G == B for neutral chroma
        np.testing.assert_allclose(rgb[..., 0], rgb[..., 1], atol=1e-3)
        np.testing.assert_allclose(rgb[..., 1], rgb[..., 2], atol=1e-3)
        # limited-range scaling: y=128 -> ~130
        assert abs(float(rgb[0, 0, 0]) - (128 - 16) * 1192 / 1024) < 0.5

    def test_red_chroma(self):
        y = np.full((8, 8), 128, np.uint8)
        u = np.full((4, 4), 128, np.uint8)
        v = np.full((4, 4), 240, np.uint8)
        rgb = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u),
                                       jnp.asarray(v)))
        assert (rgb[..., 0] > rgb[..., 1]).all()
        assert (rgb[..., 0] > rgb[..., 2]).all()

    def test_rgb_to_gray(self):
        rgb = np.stack([np.full((4, 4), 100.0)] * 3, axis=-1)
        g = np.asarray(rgb_to_gray(jnp.asarray(rgb, jnp.float32)))
        np.testing.assert_allclose(g, 100.0, atol=1e-3)


class TestIMULoader:
    def test_load_imu(self, tmp_path):
        from android_svo_tpu.data.euroc import load_imu
        d = tmp_path / "mav0" / "imu0"
        d.mkdir(parents=True)
        with open(d / "data.csv", "w") as f:
            f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
            for i in range(5):
                f.write(f"{1000000000 + i * 5000000},0.01,0.02,0.03,"
                        f"0.1,0.2,9.8\n")
        imu = load_imu(str(tmp_path))
        assert imu is not None
        assert imu["stamps"].shape == (5,)
        assert imu["gyro"].shape == (5, 3)
        np.testing.assert_allclose(imu["accel"][:, 2], 9.8)
        assert load_imu(str(tmp_path / "nope")) is None
