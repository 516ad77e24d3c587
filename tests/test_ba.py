"""Local bundle adjustment tests: synthetic window with known ground truth
(the reference ships no BA implementation — built from spec, SURVEY.md §7
hard part 6)."""

import jax
import jax.numpy as jnp
import numpy as np

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.parallel.ba import local_ba, select_core_keyframes

KEY = jax.random.PRNGKey(5)


def make_ba_problem(n_cams=4, n_pts=120, noise_pose=0.02, noise_pt=0.05):
    """Cameras looking at a 3D point cloud from ~3 units away."""
    k1, k2, k3, k4 = jax.random.split(KEY, 4)
    pts_w = jnp.concatenate([
        jax.random.uniform(k1, (n_pts, 2), minval=-1.5, maxval=1.5),
        jax.random.uniform(k2, (n_pts, 1), minval=-0.3, maxval=0.3)],
        axis=-1)
    # ground-truth camera poses: spread along x at z=-3, looking at +z
    T_kw_gt = []
    for i in range(n_cams):
        T_wc = SE3(q=jnp.array([1.0, 0, 0, 0]),
                   t=jnp.array([0.3 * i, 0.05 * i, -3.0]))
        T_kw_gt.append(T_wc.inverse())
    q_gt = jnp.stack([T.q for T in T_kw_gt])
    t_gt = jnp.stack([T.t for T in T_kw_gt])

    # observations: every camera sees every point
    O = n_cams
    obs_kf = jnp.tile(jnp.arange(n_cams, dtype=jnp.int32)[None], (n_pts, 1))
    T_all = SE3(q=q_gt[obs_kf.reshape(-1)], t=t_gt[obs_kf.reshape(-1)])
    xyz = T_all.apply(jnp.repeat(pts_w, O, axis=0)).reshape(n_pts, O, 3)
    f_obs = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)

    # perturb all but camera 0 (gauge) and all points
    dq = jax.random.normal(k3, (n_cams, 6)) * noise_pose
    dq = dq.at[0].set(0.0)
    T_pert = SE3.exp(dq).compose(SE3(q=q_gt, t=t_gt))
    pts_pert = pts_w + jax.random.normal(k4, (n_pts, 3)) * noise_pt
    return (pts_w, pts_pert, q_gt, t_gt, T_pert.q, T_pert.t, obs_kf, f_obs)


class TestLocalBA:
    def test_converges_to_ground_truth(self):
        cfg = SVOConfig(loba_n_iter=10)
        (pts_gt, pts0, q_gt, t_gt, q0, t0, obs_kf, f_obs) = make_ba_problem()
        n_pts, n_cams = obs_kf.shape
        core = jnp.arange(4, dtype=jnp.int32)
        fixed = jnp.array([True, False, False, False])
        pvalid = jnp.ones((n_pts,), bool)

        q2, t2, pts2, chi2 = local_ba(
            pts0, pvalid, obs_kf, f_obs, q0, t0, core, fixed,
            jnp.asarray(420.0), cfg)

        # residual chi2 ~ 0 on noise-free observations
        assert float(chi2) < 1e-6, float(chi2)
        # camera poses recover (gauge camera was kept at GT)
        t_err = float(jnp.abs(t2 - t_gt).max())
        assert t_err < 2e-3, t_err
        # residual error is the free monocular scale gauge (~0.1% at 3 units)
        p_err = float(jnp.median(jnp.linalg.norm(pts2 - pts_gt, axis=-1)))
        assert p_err < 5e-3, p_err

    def test_fixed_camera_untouched(self):
        cfg = SVOConfig(loba_n_iter=3)
        (pts_gt, pts0, q_gt, t_gt, q0, t0, obs_kf, f_obs) = make_ba_problem()
        core = jnp.arange(4, dtype=jnp.int32)
        fixed = jnp.array([True, False, False, False])
        pvalid = jnp.ones(obs_kf.shape[:1], bool)
        q2, t2, _, _ = local_ba(pts0, pvalid, obs_kf, f_obs, q0, t0, core,
                                fixed, jnp.asarray(420.0), cfg)
        np.testing.assert_allclose(q2[0], q0[0])
        np.testing.assert_allclose(t2[0], t0[0])

    def test_select_core_keyframes(self):
        q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (6, 1))
        t = jnp.stack([jnp.array([float(i), 0, 0]) for i in range(6)])
        valid = jnp.array([True, True, True, False, True, True])
        T_cw = SE3(q=jnp.array([1.0, 0, 0, 0]), t=jnp.array([-0.2, 0, 0]))
        core, fixed = select_core_keyframes(q, t, valid, T_cw, 3)
        # closest valid kfs to camera at x=0.2: slots 0,1,2
        assert set(np.asarray(core).tolist()) == {0, 1, 2}
        # farthest of the selected (slot 2) is the gauge
        assert bool(fixed[np.asarray(core).tolist().index(2)])
