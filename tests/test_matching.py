"""Tests for feature alignment (ICLK), affine warp matching, epipolar
search, and depth-filter Bayesian updates (SURVEY.md §4 kernel-level and
closed-form tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.data import synthetic
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.ops import pyramid, detect, interp, matcher, feature_align
from android_svo_tpu.core import depth_filter as df

KEY = jax.random.PRNGKey(3)
CFG = SVOConfig()


def make_pair(dx=0.08, dy=0.03, drot=0.015, size=512):
    cam = synthetic.default_camera(size, size * 3 // 4)
    tex = synthetic.make_texture(KEY, 2048)
    T_w_ref = synthetic.lookdown_pose(0.0, 0.0, -3.0)
    T_w_cur = synthetic.lookdown_pose(dx, dy, -3.0, rot_xyz=(drot, 0.0, 0.0))
    img_ref = synthetic.render(tex, cam, T_w_ref)
    img_cur = synthetic.render(tex, cam, T_w_cur)
    n = CFG.total_pyr_levels
    ref_pyr = pyramid.build_pyramid(img_ref, n)
    cur_pyr = pyramid.build_pyramid(img_cur, n)
    # stack layouts: cur frame as (L,Hp,Wp); ref frame as a 1-KF arena
    cur_stack = pyramid.stack_from_pyramid(cur_pyr)
    kf_stack = pyramid.stack_from_pyramid(ref_pyr)[None]
    feats = detect.detect_features(ref_pyr[:3], None, CFG)
    T_cur_ref = T_w_cur.inverse().compose(T_w_ref)
    return cam, cur_stack, kf_stack, feats, T_w_ref, T_w_cur, T_cur_ref


class TestAlign2D:
    def test_recovers_shift(self):
        img = synthetic.make_texture(KEY, 256)
        centers = jnp.array([[100.0, 80.0], [50.0, 120.0], [200.0, 64.0],
                             [150.0, 150.0]])
        pb = interp.extract_patches(img, centers, CFG.patch_halfsize + 1)
        ref, gx, gy = feature_align.patch_gradients(pb)
        true_shift = jnp.array([1.7, -1.2])
        init = centers + true_shift
        uv, conv, _ = feature_align.align2d(
            img, ref, gx, gy, init, jnp.ones(4, bool), n_iter=15)
        assert bool(conv.all()), np.asarray(conv)
        np.testing.assert_allclose(uv, centers, atol=0.05)

    def test_brightness_invariance(self):
        img = synthetic.make_texture(KEY, 256)
        img_bright = img + 25.0
        centers = jnp.array([[100.0, 80.0], [150.0, 150.0]])
        pb = interp.extract_patches(img, centers, CFG.patch_halfsize + 1)
        ref, gx, gy = feature_align.patch_gradients(pb)
        uv, conv, mean_diff = feature_align.align2d(
            img_bright, ref, gx, gy, centers + jnp.array([1.0, 0.5]),
            jnp.ones(2, bool), n_iter=15)
        assert bool(conv.all())
        np.testing.assert_allclose(uv, centers, atol=0.05)
        # mean_diff converges to ref - cur brightness offset
        np.testing.assert_allclose(mean_diff, -25.0, atol=1.0)

    def test_invalid_stays_put(self):
        img = synthetic.make_texture(KEY, 256)
        centers = jnp.array([[100.0, 80.0]])
        pb = interp.extract_patches(img, centers, CFG.patch_halfsize + 1)
        ref, gx, gy = feature_align.patch_gradients(pb)
        init = centers + 2.0
        uv, conv, _ = feature_align.align2d(
            img, ref, gx, gy, init, jnp.zeros(1, bool))
        np.testing.assert_allclose(uv, init)
        assert not bool(conv.any())


class TestAlign1D:
    def test_recovers_shift_along_direction(self):
        img = synthetic.make_texture(KEY, 256)
        centers = jnp.array([[100.0, 80.0], [150.0, 150.0]])
        pb = interp.extract_patches(img, centers, CFG.patch_halfsize + 1)
        ref, gx, gy = feature_align.patch_gradients(pb)
        direction = jnp.tile(jnp.array([[0.8, 0.6]]), (2, 1))
        init = centers + 1.5 * direction
        uv, conv, _ = feature_align.align1d(
            img, ref, gx, gy, direction, init, jnp.ones(2, bool), n_iter=15)
        assert bool(conv.all())
        np.testing.assert_allclose(uv, centers, atol=0.1)


class TestWarpAffine:
    def test_identity_warp_reproduces_patch(self):
        img = synthetic.make_texture(KEY, 256)
        kf_stack = pyramid.stack_from_pyramid((img,))[None]  # (1,1,Hp,Wp)
        px = jnp.array([[100.0, 80.0], [60.0, 150.0]])
        A = jnp.tile(jnp.eye(2)[None], (2, 1, 1))
        lvl = jnp.zeros(2, jnp.int32)
        slvl = jnp.zeros(2, jnp.int32)
        patch, ok = matcher.warp_affine_stack(
            kf_stack, jnp.zeros(2, jnp.int32), A, px, lvl, slvl,
            CFG.patch_halfsize, 256, 256)
        direct = interp.extract_patches(img, px, CFG.patch_halfsize)
        assert bool(ok.all())
        np.testing.assert_allclose(patch, direct, atol=1e-4)

    def test_search_level_from_scale(self):
        # a warp that doubles area twice -> level 2
        A = jnp.array([[[4.0, 0.0], [0.0, 4.0]],
                       [[1.0, 0.0], [0.0, 1.0]]])
        lvl = matcher.get_best_search_level(A, 4)
        assert int(lvl[0]) >= 1
        assert int(lvl[1]) == 0


class TestFindMatchDirect:
    @pytest.mark.slow
    def test_matches_projected_points(self):
        (cam, cur_stack, kf_stack, feats, T_w_ref, T_w_cur,
         T_cur_ref) = make_pair()
        valid = feats["valid"]
        px_ref = feats["px"]
        f_ref = cam.cam2world(px_ref)
        depth = synthetic.true_depth(cam, T_w_ref, px_ref)
        # ground-truth projection into cur
        xyz_cur = T_cur_ref.apply(f_ref * depth[:, None])
        px_gt = cam.world2cam(xyz_cur)
        inb = interp.in_bounds(px_gt, cam.height, cam.width, 10)
        valid = valid & inb & (xyz_cur[..., 2] > 0)
        # start from a perturbed projection (reprojection with pose error)
        init = px_gt + jax.random.normal(KEY, px_gt.shape) * 1.5
        kf_idx = jnp.zeros(px_ref.shape[0], jnp.int32)
        px_cur, slvl, ok = matcher.find_match_direct(
            cur_stack, kf_stack, kf_idx, cam, px_ref, f_ref, depth,
            feats["level"], T_cur_ref, init, valid, CFG)
        n_ok = int(jnp.sum(ok))
        assert n_ok > 0.6 * int(jnp.sum(valid)), (n_ok, int(jnp.sum(valid)))
        err = jnp.linalg.norm(px_cur - px_gt, axis=-1)
        med = float(jnp.median(err[ok]))
        assert med < 0.5, med


class TestEpipolarMatch:
    def test_recovers_depth(self):
        (cam, cur_stack, kf_stack, feats, T_w_ref, T_w_cur,
         T_cur_ref) = make_pair(dx=0.15, dy=0.0, drot=0.0)
        valid = feats["valid"] & (feats["level"] == 0)
        px_ref = feats["px"]
        f_ref = cam.cam2world(px_ref)
        depth_gt = synthetic.true_depth(cam, T_w_ref, px_ref)
        d_est = jnp.full_like(depth_gt, 3.4)
        d_min = jnp.full_like(depth_gt, 2.0)
        d_max = jnp.full_like(depth_gt, 6.0)
        kf_idx = jnp.zeros(px_ref.shape[0], jnp.int32)
        depth, px_cur, ok = matcher.find_epipolar_match(
            cur_stack, kf_stack, kf_idx, cam, px_ref, f_ref, feats["level"],
            T_cur_ref, d_est, d_min, d_max, valid, CFG)
        n_ok = int(jnp.sum(ok))
        assert n_ok > 0.5 * int(jnp.sum(valid)), (n_ok, int(jnp.sum(valid)))
        rel_err = jnp.abs(depth - depth_gt) / depth_gt
        med = float(jnp.median(rel_err[ok]))
        assert med < 0.02, med


class TestDepthFilterMath:
    def test_seed_init(self):
        a, b, mu, s2, zr = df.seed_init(jnp.asarray(2.0), jnp.asarray(0.5))
        assert float(a) == 10.0 and float(b) == 10.0
        np.testing.assert_allclose(mu, 0.5)
        np.testing.assert_allclose(zr, 2.0)
        np.testing.assert_allclose(s2, 4.0 / 36.0)

    def test_consistent_measurements_converge(self):
        cfg = SVOConfig()
        a, b, mu, s2, zr = df.seed_init(jnp.asarray(2.0), jnp.asarray(0.5))
        true_invd = 1.0 / 3.0
        tau2 = jnp.asarray(1e-4)
        key = KEY
        for i in range(30):
            key, sub = jax.random.split(key)
            x = true_invd + jax.random.normal(sub, ()) * 0.01
            a, b, mu, s2 = df.update_seed(x, tau2, a, b, mu, s2, zr)
        assert abs(float(mu) - true_invd) < 0.01
        assert bool(df.is_converged(s2, zr, cfg))
        # inlier evidence dominates
        assert float(a) / (float(a) + float(b)) > 0.6

    def test_outliers_grow_b(self):
        a0, b0, mu, s2, zr = df.seed_init(jnp.asarray(2.0), jnp.asarray(0.5))
        a, b = a0, b0
        key = KEY
        for i in range(20):
            key, sub = jax.random.split(key)
            x = jax.random.uniform(sub, (), minval=0.01, maxval=2.0)
            a, b, mu, s2 = df.update_seed(x, jnp.asarray(1e-4), a, b, mu,
                                          s2, zr)
        assert float(b) > float(a)        # classified as mostly outliers

    def test_compute_tau_shrinks_with_baseline(self):
        f = jnp.array([[0.0, 0.0, 1.0]])
        z = jnp.array([3.0])
        ang = df.px_error_angle(jnp.asarray(420.0))
        taus = []
        for bl in (0.05, 0.2, 0.5):
            t = jnp.array([bl, 0.0, 0.0])
            taus.append(float(df.compute_tau(t, f, z, ang)[0]))
        assert taus[0] > taus[1] > taus[2] > 0.0
