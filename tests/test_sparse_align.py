"""Sparse image alignment recovers known relative pose on the synthetic
scene (SURVEY.md §4 item 3: synthetic-scene integration tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.data import synthetic
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.ops import pyramid, detect, sparse_align

KEY = jax.random.PRNGKey(7)


def setup_pair(dx=0.05, dy=0.02, drot=0.01, size=640):
    cfg = SVOConfig()
    cam = synthetic.default_camera(size, size * 3 // 4)
    tex = synthetic.make_texture(KEY, 2048)
    T_w_ref = synthetic.lookdown_pose(0.0, 0.0, -3.0)
    T_w_cur = synthetic.lookdown_pose(dx, dy, -3.0, rot_xyz=(drot, -drot, 0.0))
    img_ref = synthetic.render(tex, cam, T_w_ref)
    img_cur = synthetic.render(tex, cam, T_w_cur)
    n_lvls = cfg.total_pyr_levels
    ref_pyr = pyramid.build_pyramid(img_ref, n_lvls)
    cur_pyr = pyramid.build_pyramid(img_cur, n_lvls)
    ref_stack = pyramid.stack_from_pyramid(ref_pyr)
    cur_stack = pyramid.stack_from_pyramid(cur_pyr)

    feats = detect.detect_features(ref_pyr[:3], None, cfg)
    px = feats["px"]
    f = cam.cam2world(px)
    depth_z = synthetic.true_depth(cam, T_w_ref, px)   # z-depth along ray
    # range along bearing = z / f_z
    depth = depth_z                                     # true_depth is along ray
    T_cur_ref_gt = T_w_cur.inverse().compose(T_w_ref)
    return (cfg, cam, ref_stack, cur_stack, px, f, depth, feats["valid"],
            T_cur_ref_gt)


class TestSparseAlign:
    @pytest.mark.slow
    def test_recovers_small_motion(self):
        (cfg, cam, ref_stack, cur_stack, px, f, depth, valid,
         T_gt) = setup_pair(dx=0.05, dy=0.02, drot=0.01)
        T_est, n_tracked, chi2 = sparse_align.sparse_img_align(
            ref_stack, cur_stack, cam, SE3.identity(), px, f, depth, valid, cfg)
        t_err = float(jnp.linalg.norm(T_est.t - T_gt.t))
        r_err = float(jnp.linalg.norm(
            T_est.inverse().compose(T_gt).log()[3:]))
        assert int(n_tracked) > 100
        assert t_err < 0.01, (t_err, np.asarray(T_est.t), np.asarray(T_gt.t))
        assert r_err < 0.005, r_err

    def test_larger_motion_coarse_to_fine(self):
        (cfg, cam, ref_stack, cur_stack, px, f, depth, valid,
         T_gt) = setup_pair(dx=0.15, dy=-0.08, drot=0.02)
        T_est, n_tracked, _ = sparse_align.sparse_img_align(
            ref_stack, cur_stack, cam, SE3.identity(), px, f, depth, valid, cfg)
        t_err = float(jnp.linalg.norm(T_est.t - T_gt.t))
        assert t_err < 0.02, t_err

    def test_identity_motion_stays_identity(self):
        (cfg, cam, ref_stack, _, px, f, depth, valid, _) = setup_pair()
        T_est, _, chi2 = sparse_align.sparse_img_align(
            ref_stack, ref_stack, cam, SE3.identity(), px, f, depth, valid, cfg)
        assert float(jnp.linalg.norm(T_est.t)) < 1e-4
        assert float(chi2) < 1e-4

    def test_lm_mode_recovers_motion(self):
        """The Levenberg-Marquardt strategy (ref nlls_solver_impl.hpp:
        103-229, off the live path there and here) must also converge."""
        (cfg, cam, ref_stack, cur_stack, px, f, depth, valid,
         T_gt) = setup_pair(dx=0.05, dy=0.02, drot=0.01)
        T_est, n_tracked, _ = sparse_align.sparse_img_align(
            ref_stack, cur_stack, cam, SE3.identity(), px, f, depth, valid,
            cfg, method="lm")
        t_err = float(jnp.linalg.norm(T_est.t - T_gt.t))
        assert int(n_tracked) > 100
        assert t_err < 0.01, t_err

    def test_jit_compiles(self):
        (cfg, cam, ref_stack, cur_stack, px, f, depth, valid,
         T_gt) = setup_pair()
        fn = jax.jit(lambda T0: sparse_align.sparse_img_align(
            ref_stack, cur_stack, cam, T0, px, f, depth, valid, cfg)[0])
        T_est = fn(SE3.identity())
        assert float(jnp.linalg.norm(T_est.t - T_gt.t)) < 0.01
