"""Motion-only bundle adjustment (pose refinement) — TPU-native rebuild of
the reference's `pose_optimizer::optimizeGaussNewton`
(`pose_optimizer.cpp:31-181`).

Reference semantics reproduced:
  * residuals on the unit plane between the measured bearing and the
    reprojected landmark, scaled by 1/2^level (pyramid-level covariance
    weighting, pose_optimizer.cpp:45-49);
  * robust scale via MAD on the initial residuals (:51-64), Tukey weights;
  * fixed GN iteration count with per-step trust-region acceptance: the
    post-step chi2 is evaluated in-iteration and worsening steps are
    rejected (the reference's lagged `new_chi2 > chi2*1.2` rollback, :107,
    done one step earlier so the scale override at iteration 5 can never
    cause a cross-scale chi2 comparison);
  * final outlier classification against `reproj_thresh/focal` per level,
    returning an inlier mask instead of deleting features (:148-162);
  * pose covariance from the final normal equations (:142).

All features are processed as one batched computation; the 6x6 solve runs
on-chip.  Update convention: T_fw <- exp(dx) o T_fw (left-multiplicative,
matching `SE3::exp(dT) * T_old` in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry import robust
from android_svo_tpu.geometry.linsolve import inv_spd, solve_spd
from android_svo_tpu.geometry.camera import project2d
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.ops.sparse_align import _geo_jacobian


def optimize_pose(T_fw_init: SE3, p_w: jnp.ndarray, f_meas: jnp.ndarray,
                  level: jnp.ndarray, valid: jnp.ndarray, focal,
                  cfg: SVOConfig):
    """Refine a frame pose against its matched 3D points.

    Args:
      p_w: (C, 3) landmark world positions.
      f_meas: (C, 3) measured unit bearings in the frame.
      level: (C,) pyramid level of each match.
      valid: (C,) mask.
      focal: scalar focal length (error scaling, ref errorMultiplier2).

    Method: `cfg.poseoptim_method` — "gn" (reference live path) or "lm"
    (the template's second strategy, nlls_solver_impl.hpp:103-229: the
    normal-equation diagonal is scaled by (1+mu), mu growing on a failed
    step and relaxing on success).

    Returns (T_fw, inlier_mask, n_inliers, cov, chi2_init, chi2_final).
    """
    dtype = p_w.dtype
    lm = cfg.poseoptim_method == "lm"
    lvl_scale = 1.0 / (2.0 ** level.astype(dtype))          # (C,)
    uv_meas = project2d(f_meas)

    def residuals(T: SE3):
        xyz_f = T.apply(p_w)
        # 1e-2 not 1e-6: a point essentially AT the camera plane produces
        # 1/z^2-scale Jacobians that overflow the f32 normal equations on
        # TPU (see parallel/ba.py depth gate)
        ok = valid & (xyz_f[..., 2] > 1e-2)
        z_safe = jnp.where(ok, xyz_f[..., 2], 1.0)
        xyz_safe = xyz_f.at[..., 2].set(z_safe)
        e = (project2d(xyz_safe) - uv_meas) * lvl_scale[:, None]
        e = jnp.where(ok[:, None], e, 0.0)
        return e, xyz_safe, ok

    # robust scale from initial residual norms (ref :51-64)
    e0, _, ok0 = residuals(T_fw_init)
    enorm0 = jnp.linalg.norm(e0, axis=-1)
    scale = robust.mad_scale(enorm0, ok0)
    scale = jnp.maximum(scale, 1e-7)
    chi2_init = jnp.sum(enorm0 * enorm0)

    def weighted_chi2(T: SE3, it_scale):
        e, xyz_f, ok = residuals(T)
        enorm = jnp.linalg.norm(e, axis=-1)
        w = robust.tukey_weight(enorm / it_scale) * ok.astype(dtype)
        return jnp.sum(w * enorm * enorm), e, xyz_f, ok, w

    def body(it, carry):
        q, t, mu = carry
        # scale override at iteration 5 (ref pose_optimizer.cpp:74-75:
        # `if(iter == 5) scale = 0.85/errorMultiplier2()`) — re-seats the
        # Tukey scale at ~1px once the pose has roughly converged.  The
        # step-acceptance test below compares chi2 of the pre- and post-step
        # iterates under the SAME scale, so the switch never causes a bogus
        # rejection (the reference's `new_chi2 > chi2*1.2` rollback compares
        # across the switch, which silently discards post-switch progress
        # whenever MAD << 0.85px — a trap this trust-region form avoids).
        it_scale = jnp.where(it >= 5, jnp.asarray(0.85 / focal, dtype),
                             scale)
        T = SE3(q=q, t=t)
        chi2, e, xyz_f, ok, w = weighted_chi2(T, it_scale)
        J = _geo_jacobian(xyz_f) * lvl_scale[:, None, None]  # (C,2,6)
        Jw = J * w[:, None, None]
        H = jnp.einsum("cij,cik->jk", Jw, J)
        g = jnp.einsum("cij,ci->j", Jw, e)
        if lm:
            # LM: scale the diagonal by (1+mu) (ref nlls_solver_impl.hpp:150)
            H = H + mu * jnp.diag(jnp.diag(H))
        H = H + 1e-6 * jnp.eye(6, dtype=dtype) * (jnp.trace(H) / 6.0 + 1.0)
        dx = solve_spd(H, -g)
        T_new = SE3.exp(dx).compose(T).normalize()
        # trust-region acceptance: evaluate the post-step chi2 in-iteration
        # (cheap: reprojection residuals only, no image access) and reject
        # non-improving steps, restoring the previous iterate — the proper
        # form of the reference's roll-back (nlls_solver_impl.hpp:176-210)
        chi2_new, *_ = weighted_chi2(T_new, it_scale)
        accept = chi2_new < chi2
        q = jnp.where(accept, T_new.q, q)
        t = jnp.where(accept, T_new.t, t)
        if lm:
            # grow damping on failure, relax on success
            # (ref nlls_solver_impl.hpp:176-210)
            mu = jnp.where(accept, jnp.maximum(mu / 3.0, 1e-8), mu * 10.0)
        return (q, t, mu)

    init = (T_fw_init.q, T_fw_init.t, jnp.asarray(0.01, dtype))
    q, t, _ = jax.lax.fori_loop(0, cfg.poseoptim_n_iter, body, init)
    # every accepted step improved chi2 under its iteration's scale, so the
    # final iterate IS the best iterate (no post-hoc selection needed)
    scale = jnp.where(cfg.poseoptim_n_iter > 5,
                      jnp.asarray(0.85 / focal, dtype), scale)
    T_out = SE3(q=q, t=t)

    # final classification + covariance (ref :142-162)
    e, xyz_f, ok = residuals(T_out)
    enorm = jnp.linalg.norm(e, axis=-1)
    # threshold in unit-plane units: reproj_thresh px / focal (level-scaled
    # residuals already fold in 1/2^level)
    thresh = cfg.poseoptim_thresh / focal
    inlier = ok & (enorm < thresh)
    w = robust.tukey_weight(enorm / scale) * ok.astype(dtype)
    J = _geo_jacobian(xyz_f) * lvl_scale[:, None, None]
    Jw = J * w[:, None, None]
    H = jnp.einsum("cij,cik->jk", Jw, J)
    H = H + 1e-6 * jnp.eye(6, dtype=dtype) * (jnp.trace(H) / 6.0 + 1.0)
    cov = inv_spd(H)
    chi2_final = jnp.sum(enorm * enorm)
    return (T_out, inlier, jnp.sum(inlier).astype(jnp.int32), cov,
            chi2_init, chi2_final)
