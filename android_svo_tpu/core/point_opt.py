"""Structure-only optimization: refine 3D landmark positions against their
observations — TPU-native rebuild of `Point::optimize`
(`point.cpp:130-192`) and its round-robin scheduling
(`frame_handler_base.cpp:190-210`: the `structureoptim_max_pts` points whose
`last_optim` is oldest get `structureoptim_n_iter` GN iterations per frame).

The reference loops point-by-point and observation-by-observation; here a
batch of B points with up to O observations each is refined in one fused
computation: (B, O, 2, 3) Jacobians, (B, 3, 3) normal equations, batched
3x3 solves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.geometry.camera import project2d
from android_svo_tpu.geometry.linsolve import solve_spd
from android_svo_tpu.geometry.se3 import SE3


def optimize_points(pos: jnp.ndarray, obs_q_kw: jnp.ndarray,
                    obs_t_kw: jnp.ndarray, obs_f: jnp.ndarray,
                    obs_valid: jnp.ndarray, point_valid: jnp.ndarray,
                    n_iter: int, method: str = "gn"):
    """Gauss-Newton (or Levenberg-Marquardt) on landmark positions.

    Args:
      pos: (B, 3) world positions.
      obs_q_kw/obs_t_kw: (B, O, 4)/(B, O, 3) world->frame poses of the
        observing keyframes (already gathered from the arena).
      obs_f: (B, O, 3) measured unit bearings in those frames.
      obs_valid: (B, O) mask.
      point_valid: (B,) mask.
      method: "gn" (reference live path, point.cpp:130-192) or "lm"
        (per-point (1+mu) diagonal damping with grow-on-fail /
        relax-on-success schedule, nlls_solver_impl.hpp:103-229).

    Returns (pos_new, chi2).  Steps that fail to reduce a point's chi2 are
    rejected in-iteration (ref point.cpp:166-173: revert if chi2 increases),
    so the returned iterate is monotonically no worse than the input.
    """
    dtype = pos.dtype
    lm = method == "lm"
    uv_meas = project2d(obs_f)                              # (B, O, 2)
    T = SE3(q=obs_q_kw, t=obs_t_kw)

    def chi2_of(p):
        xyz = T.apply(p[:, None, :])                        # (B, O, 3)
        # 1e-2 not 1e-6: guards the f32 normal equations against 1/z^2
        # Jacobian blowup (see parallel/ba.py depth gate)
        ok = obs_valid & (xyz[..., 2] > 1e-2)
        z = jnp.where(ok, xyz[..., 2], 1.0)
        e = jnp.stack([xyz[..., 0] / z, xyz[..., 1] / z], axis=-1) - uv_meas
        e = jnp.where(ok[..., None], e, 0.0)
        return jnp.sum(e * e, axis=(-2, -1)), e, xyz, ok, z

    def body(it, carry):
        del it
        p, mu = carry
        chi2, e, xyz, ok, z = chi2_of(p)
        zi = 1.0 / z
        zi2 = zi * zi
        x, y = xyz[..., 0], xyz[..., 1]
        # d(uv)/d(p_frame) (B,O,2,3), then x world: @ R_kw
        dpi = jnp.stack([
            jnp.stack([zi, jnp.zeros_like(zi), -x * zi2], axis=-1),
            jnp.stack([jnp.zeros_like(zi), y * 0 + zi, -y * zi2], axis=-1),
        ], axis=-2)
        R = SE3(q=obs_q_kw, t=obs_t_kw).rotation_matrix()   # (B,O,3,3)
        J = dpi @ R                                          # (B,O,2,3)
        J = jnp.where(ok[..., None, None], J, 0.0)
        H = jnp.einsum("boij,boik->bjk", J, J)
        g = jnp.einsum("boij,boi->bj", J, e)
        if lm:
            # per-point LM damping: H(i,i) *= 1+mu (nlls_solver_impl:150)
            eye = jnp.eye(3, dtype=dtype)
            H = H + mu[:, None, None] * (H * eye)
        H = H + 1e-8 * jnp.eye(3, dtype=dtype)
        dx = solve_spd(H, -g)
        # trust-region acceptance: evaluate the post-step chi2 and reject
        # worsening steps per point (ref point.cpp:166-173 reverts and
        # breaks; LM additionally adapts mu, nlls_solver_impl.hpp:176-210)
        p_try = p + dx
        chi2_new, *_ = chi2_of(p_try)
        accept = point_valid & (chi2_new < chi2)
        p = jnp.where(accept[:, None], p_try, p)
        if lm:
            mu = jnp.where(accept, jnp.maximum(mu / 3.0, 1e-8), mu * 10.0)
        return (p, mu)

    init = (pos, jnp.full(pos.shape[:1], 0.01, dtype))
    p, _ = jax.lax.fori_loop(0, n_iter, body, init)
    chi2_out, *_ = chi2_of(p)
    return p, chi2_out


def select_points_for_optim(last_optim: jnp.ndarray, valid: jnp.ndarray,
                            n_select: int):
    """Round-robin scheduling: the n_select valid points with the oldest
    last_optim stamp (ref frame_handler_base.cpp:190-210 uses a map sorted
    by timestamp). Returns (slots, selected_mask_over_slots)."""
    key = jnp.where(valid, last_optim, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key)
    slots = order[:n_select]
    sel = valid[slots]
    return slots, sel
