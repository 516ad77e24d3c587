"""Unit tests for L0 geometry: SE3/SO3, cameras, robust costs, triangulation.

Mirrors the test strategy derived in SURVEY.md §4: pure-function tests for the
math substrate the reference leaves untested (SE3.h, pinhole_camera.cpp,
robust_cost.cpp, math_utils.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from android_svo_tpu.geometry import SE3, SO3, PinholeCamera, ATANCamera
from android_svo_tpu.geometry import robust, triangulation
from android_svo_tpu.geometry.se3 import (
    quat_to_matrix, matrix_to_quat, quat_normalize, hat)

KEY = jax.random.PRNGKey(0)


def random_se3(key, batch=()):
    k1, k2 = jax.random.split(key)
    xi = jax.random.normal(k1, batch + (6,)) * 0.8
    return SE3.exp(xi)


class TestSO3:
    def test_exp_log_roundtrip(self):
        # roundtrip holds on the principal domain |phi| < pi
        k1, k2 = jax.random.split(KEY)
        direction = jax.random.normal(k1, (64, 3))
        direction /= jnp.linalg.norm(direction, axis=-1, keepdims=True)
        angle = jax.random.uniform(k2, (64, 1)) * 3.0
        phi = direction * angle
        q = SO3.exp(phi)
        phi2 = SO3.log(q)
        np.testing.assert_allclose(phi, phi2, atol=1e-5)

    def test_exp_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
        q = SO3.exp(phi)
        np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(SO3.log(q), phi, atol=1e-7)

    def test_matrix_roundtrip(self):
        q = quat_normalize(jax.random.normal(KEY, (128, 4)))
        m = quat_to_matrix(q)
        q2 = matrix_to_quat(m)
        # quaternions defined up to sign; matrices must match
        np.testing.assert_allclose(quat_to_matrix(q2), m, atol=1e-5)

    def test_rotation_matrix_orthonormal(self):
        m = quat_to_matrix(SO3.exp(jax.random.normal(KEY, (32, 3))))
        eye = jnp.eye(3)
        np.testing.assert_allclose(m @ jnp.swapaxes(m, -1, -2),
                                   jnp.broadcast_to(eye, m.shape), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(m), 1.0, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (64, 6))
        xi = xi.at[:, 3:].multiply(0.5)  # keep |phi| < pi
        T = SE3.exp(xi)
        np.testing.assert_allclose(T.log(), xi, atol=1e-4)

    def test_compose_inverse(self):
        T = random_se3(KEY, (16,))
        I = T.compose(T.inverse())
        np.testing.assert_allclose(I.t, 0.0, atol=1e-5)
        np.testing.assert_allclose(jnp.abs(I.q[:, 0]), 1.0, atol=1e-5)

    def test_apply_matches_matrix(self):
        T = random_se3(KEY)
        pts = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
        expected = (T.rotation_matrix() @ pts.T).T + T.t
        np.testing.assert_allclose(T.apply(pts), expected, atol=1e-5)

    def test_from_matrix_roundtrip(self):
        T = random_se3(KEY, (8,))
        T2 = SE3.from_matrix(T.as_matrix())
        np.testing.assert_allclose(T2.as_matrix(), T.as_matrix(), atol=1e-5)

    def test_compose_associative_with_points(self):
        ka, kb = jax.random.split(KEY)
        A, B = random_se3(ka), random_se3(kb)
        pts = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
        np.testing.assert_allclose(
            A.compose(B).apply(pts), A.apply(B.apply(pts)), atol=1e-5)

    def test_exp_matches_matrix_exponential(self):
        # validate against scipy-free matrix series via jax.scipy
        xi = jnp.array([0.3, -0.2, 0.5, 0.1, 0.4, -0.3])
        T = SE3.exp(xi)
        # build 4x4 twist matrix and exponentiate by series
        W = jnp.zeros((4, 4))
        W = W.at[:3, :3].set(hat(xi[3:]))
        W = W.at[:3, 3].set(xi[:3])
        M = jnp.eye(4)
        term = jnp.eye(4)
        for i in range(1, 20):
            term = term @ W / i
            M = M + term
        np.testing.assert_allclose(T.as_matrix(), M, atol=1e-5)


class TestPinholeCamera:
    def make_cam(self):
        return PinholeCamera.create(
            752, 480, 458.654, 457.296, 367.215, 248.375,
            k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05)

    def test_project_unproject_roundtrip(self):
        cam = self.make_cam()
        px = jax.random.uniform(KEY, (256, 2)) * jnp.array([700.0, 440.0]) + 20.0
        f = cam.cam2world(px)
        np.testing.assert_allclose(jnp.linalg.norm(f, axis=-1), 1.0, atol=1e-6)
        px2 = cam.world2cam(f)
        np.testing.assert_allclose(px2, px, atol=0.02)  # subpixel accurate

    def test_no_distortion_closed_form(self):
        cam = PinholeCamera.create(640, 480, 500.0, 500.0, 320.0, 240.0)
        xyz = jnp.array([[0.1, -0.2, 2.0]])
        px = cam.world2cam(xyz)
        np.testing.assert_allclose(
            px, [[320.0 + 500 * 0.05, 240.0 - 500 * 0.1]], atol=1e-4)

    def test_is_in_frame(self):
        cam = self.make_cam()
        assert bool(cam.is_in_frame(jnp.array([10.0, 10.0]), boundary=5))
        assert not bool(cam.is_in_frame(jnp.array([10.0, 10.0]), boundary=15))
        assert not bool(cam.is_in_frame(jnp.array([800.0, 10.0])))
        # level-1 bounds halve
        assert not bool(cam.is_in_frame(jnp.array([400.0, 10.0]), level=1))


class TestATANCamera:
    def test_roundtrip(self):
        cam = ATANCamera.create(752, 480, 400.0, 400.0, 376.0, 240.0, s=0.93)
        px = jax.random.uniform(KEY, (128, 2)) * jnp.array([700.0, 440.0]) + 20.0
        f = cam.cam2world(px)
        px2 = cam.world2cam(f)
        np.testing.assert_allclose(px2, px, atol=0.05)


class TestRobust:
    def test_masked_median(self):
        x = jnp.array([5.0, 1.0, 3.0, 100.0, 2.0, 4.0])
        mask = jnp.array([True, True, True, False, True, True])
        assert float(robust.masked_median(x, mask)) == 3.0

    def test_mad_scale_gaussian(self):
        x = jax.random.normal(KEY, (4096,)) * 2.5
        mask = jnp.ones_like(x, bool)
        s = float(robust.mad_scale(x, mask))
        assert abs(s - 2.5) < 0.2

    def test_tukey_weight(self):
        assert float(robust.tukey_weight(jnp.array(0.0))) == 1.0
        assert float(robust.tukey_weight(jnp.array(10.0))) == 0.0
        w = float(robust.tukey_weight(jnp.array(2.0)))
        assert 0.0 < w < 1.0

    def test_huber_weight(self):
        assert float(robust.huber_weight(jnp.array(0.5))) == 1.0
        np.testing.assert_allclose(
            float(robust.huber_weight(jnp.array(2.69))), 1.345 / 2.69, atol=1e-5)

    def test_tdist_scale(self):
        # generate genuinely t5-distributed residuals with scale 1.7:
        # t = z / sqrt(chi2_dof / dof)
        kz, kc = jax.random.split(KEY)
        z = jax.random.normal(kz, (8192,))
        chi2 = jnp.sum(jax.random.normal(kc, (8192, 5)) ** 2, axis=-1)
        x = 1.7 * z / jnp.sqrt(chi2 / 5.0)
        s = float(robust.tdist_scale(x, jnp.ones_like(x, bool)))
        assert abs(s - 1.7) < 0.2


class TestTriangulation:
    def test_midpoint_exact(self):
        # two cameras looking at a known point
        p_w = jnp.array([0.5, -0.3, 4.0])
        T_w_ref = SE3.identity()
        T_w_cur = SE3.exp(jnp.array([1.0, 0.0, 0.0, 0.0, 0.05, 0.0]))
        f_ref = p_w / jnp.linalg.norm(p_w)
        p_cur = T_w_cur.inverse().apply(p_w)
        f_cur = p_cur / jnp.linalg.norm(p_cur)
        est = triangulation.triangulate_midpoint(T_w_ref, T_w_cur, f_ref, f_cur)
        np.testing.assert_allclose(est, p_w, atol=1e-4)

    def test_depth_from_triangulation(self):
        p_ref = jnp.array([0.2, 0.1, 3.0])
        T_cur_ref = SE3.exp(jnp.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.1]))
        f_ref = p_ref / jnp.linalg.norm(p_ref)
        p_cur = T_cur_ref.apply(p_ref)
        f_cur = p_cur / jnp.linalg.norm(p_cur)
        depth, valid = triangulation.depth_from_triangulation(
            T_cur_ref, f_ref, f_cur)
        assert bool(valid)
        np.testing.assert_allclose(depth, jnp.linalg.norm(p_ref), atol=1e-3)

    def test_degenerate_zero_baseline(self):
        f = jnp.array([0.0, 0.0, 1.0])
        depth, valid = triangulation.depth_from_triangulation(
            SE3.identity(), f, f)
        assert not bool(valid)

    def test_compute_inliers(self):
        key1, key2 = jax.random.split(KEY)
        n = 100
        pts_ref = jnp.concatenate([
            jax.random.normal(key1, (n, 2)),
            jax.random.uniform(key2, (n, 1)) * 3 + 2.0], axis=-1)
        T_cur_ref = SE3.exp(jnp.array([0.3, 0.05, 0.0, 0.0, 0.02, 0.0]))
        pts_cur = T_cur_ref.apply(pts_ref)
        f_ref = pts_ref / jnp.linalg.norm(pts_ref, axis=-1, keepdims=True)
        f_cur = pts_cur / jnp.linalg.norm(pts_cur, axis=-1, keepdims=True)
        xyz, inl, _ = triangulation.compute_inliers(
            T_cur_ref, f_ref, f_cur, jnp.asarray(2.0), jnp.asarray(450.0))
        assert int(jnp.sum(inl)) >= n - 2
        np.testing.assert_allclose(xyz[inl], pts_cur[inl], atol=1e-2)

    def test_sampson_zero_for_exact(self):
        p_ref = jnp.array([[0.2, 0.1, 3.0], [-0.5, 0.4, 5.0]])
        T = SE3.exp(jnp.array([0.4, 0.1, 0.0, 0.0, 0.05, 0.0]))
        p_cur = T.apply(p_ref)
        f_ref = p_ref / jnp.linalg.norm(p_ref, axis=-1, keepdims=True)
        f_cur = p_cur / jnp.linalg.norm(p_cur, axis=-1, keepdims=True)
        E = triangulation.essential_from_pose(T)
        err = triangulation.sampson_error(E, f_ref, f_cur)
        np.testing.assert_allclose(err, 0.0, atol=1e-8)
