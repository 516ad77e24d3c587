"""Sparse image alignment: direct frame-to-frame pose tracking by
coarse-to-fine inverse-compositional Gauss-Newton on photometric patch
residuals — the TPU-native rebuild of the reference's `SparseImgAlign`
(`sparse_img_align.cpp:51-307`) on top of `vk::NLLSSolver`
(`nlls_solver_impl.hpp:25-100`).

Reference semantics reproduced:
  * 4x4 patches around every feature with a 3D point, residuals on the pyramid
    from `img_align_max_level` down to `img_align_min_level`
    (`frame_handler_mono.cpp:186-188`);
  * per-feature geometric Jacobian evaluated once at the reference frame's 3D
    point, shared by all patch pixels (`sparse_img_align.cpp:105-178` — the
    inverse-compositional cache);
  * Gauss-Newton with rollback: an iteration that increases chi2 reverts and
    freezes the estimate (`nlls_solver_impl.hpp:62-74`), implemented here as a
    best-so-far register inside `lax.fori_loop` (fixed trip count, jit-safe);
  * optional Levenberg-Marquardt damping (`nlls_solver_impl.hpp:103-229`):
    `method="lm"` multiplies the normal-equation diagonal by (1+mu), growing
    mu by nu on a failed step and shrinking it on success — the reference's
    second solver strategy, off the live path there and here.

TPU-native design: all features are processed as one batched Pallas window
sample + einsum per iteration (N x 16 residuals, 6x6 normal equations
on-chip); no per-feature loops, no dynamic shapes.  Frames arrive as padded
`(L, Hp, Wp)` pyramid stacks (ops/pyramid.build_stack); patch reads go
through `ops/patch_pallas.sample_patches` (aligned VMEM window loads — the
replacement for the reference's scalar patch walk, sparse_img_align.cpp:
184-286) with the pure-JAX gather fallback on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry.linsolve import solve_spd
from android_svo_tpu.geometry.se3 import SE3, hat
from android_svo_tpu.ops import interp
from android_svo_tpu.ops import patch_pallas as pp


def _geo_jacobian(p: jnp.ndarray) -> jnp.ndarray:
    """d(unit-plane uv)/d(twist) for a right-perturbation p' = p + v + w x p.

    Returns (N, 2, 6); twist order (v, w) — translation first, like the
    reference's `Frame::jacobian_xyz2uv` (`frame.h:110-132`, up to overall
    sign which is fixed by the update convention below).
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    zi = 1.0 / z
    zi2 = zi * zi
    # dpi/dp (N,2,3)
    dpi = jnp.stack([
        jnp.stack([zi, jnp.zeros_like(zi), -x * zi2], axis=-1),
        jnp.stack([jnp.zeros_like(zi), zi, -y * zi2], axis=-1),
    ], axis=-2)
    # d(exp(dx) p)/d dx = [I | -hat(p)]   (N,3,6)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3))
    dp = jnp.concatenate([eye, -hat(p)], axis=-1)
    return dpi @ dp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def level_substack(stack: jnp.ndarray, level: int, h: int, w: int):
    """A (1, rows, cols) aligned slice of one pyramid level out of the padded
    stack — small enough to live in VMEM across a whole GN level, so the
    per-iteration Pallas call doesn't re-stream the full pyramid."""
    hl, wl = h >> level, w >> level
    rows = min(max(_round_up(hl, 8), 24), stack.shape[-2])
    cols = min(max(_round_up(wl, 128), 256), stack.shape[-1])
    return stack[level:level + 1, :rows, :cols]


def sparse_img_align(ref_stack, cur_stack, cam, T_cur_ref_init: SE3,
                     ref_px: jnp.ndarray, ref_f: jnp.ndarray,
                     ref_depth: jnp.ndarray, valid: jnp.ndarray,
                     cfg: SVOConfig, method: str = "gn"):
    """Estimate T_cur_ref by direct alignment.

    Args:
      ref_stack / cur_stack: (L, Hp, Wp) padded pyramid stacks.
      cam: camera model (shared by both frames, like the reference); its
        width/height give the TRUE level-0 dims inside the padded stacks.
      T_cur_ref_init: initial relative pose (last frame's motion model,
        ref frame_handler_mono.cpp:175).
      ref_px: (N, 2) feature pixels in the ref frame at level 0.
      ref_f: (N, 3) unit bearings of those features.
      ref_depth: (N,) range along the bearing to the 3D point
        (ref sparse_img_align.cpp:128: `(point->pos - ref_pos).norm()`).
      valid: (N,) features with a 3D point.
      method: "gn" (default) or "lm" (Levenberg-Marquardt damping).

    Returns (T_cur_ref, n_tracked, chi2) — n_tracked is the number of
    features contributing valid residuals at the finest aligned level.
    """
    dtype = ref_px.dtype
    half = cfg.img_align_patch_halfsize
    patch_area = cfg.img_align_patch_size ** 2
    use_pallas = pp.cfg_use_pallas(cfg)
    H_img, W_img = cam.height, cam.width
    xyz_ref = ref_f * ref_depth[..., None]                 # (N,3) in ref frame
    n = ref_px.shape[0]
    zeros_lvl = jnp.zeros((n,), jnp.int32)
    lm = method == "lm"

    T = T_cur_ref_init
    n_tracked = jnp.zeros((), jnp.int32)
    chi2_out = jnp.zeros((), dtype)

    for level in range(cfg.img_align_max_level,
                       cfg.img_align_min_level - 1, -1):
        scale = jnp.asarray(1.0 / 2 ** level, dtype)
        h, w = H_img >> level, W_img >> level
        ref_sub = level_substack(ref_stack, level, H_img, W_img)
        cur_sub = level_substack(cur_stack, level, H_img, W_img)

        # ---- precompute reference patches + jacobian cache (per level) ----
        uv_ref = cam.world2cam(xyz_ref) * scale            # level coords
        ok_ref = (valid & interp.in_bounds(uv_ref, h, w, half + 1)
                  & (xyz_ref[..., 2] > 1e-3))
        patch_ref, gx, gy = pp.sample_patches(
            ref_sub, zeros_lvl, uv_ref, half, grad=True, valid=ok_ref,
            use_pallas=use_pallas)                         # (N,P,P)
        patch_ref = patch_ref.reshape(n, patch_area)
        gx = gx.reshape(n, patch_area)
        gy = gy.reshape(n, patch_area)
        jgeo = _geo_jacobian(xyz_ref)                      # (N,2,6)
        # image gradient (pixel units at this level) x geometric jacobian,
        # focal scaling folded in (ref sparse_img_align.cpp:170-176)
        fx = cam.fx * scale
        fy = cam.fy * scale
        # J: (N, patch_area, 6)
        J = (gx[..., None] * (fx * jgeo[:, None, 0, :])
             + gy[..., None] * (fy * jgeo[:, None, 1, :]))

        def body(carry):
            it, T_q, T_t, best_q, best_t, best_chi2, stopped, mu = carry
            Tl = SE3(q=T_q, t=T_t)
            xyz_cur = Tl.apply(xyz_ref)
            uv_cur = cam.world2cam(xyz_cur) * scale
            ok = (ok_ref & (xyz_cur[..., 2] > 1e-3)
                  & interp.in_bounds(uv_cur, h, w, half + 1))
            patch_cur = pp.sample_patches(
                cur_sub, zeros_lvl, uv_cur, half, valid=ok,
                use_pallas=use_pallas).reshape(n, patch_area)
            r = patch_cur - patch_ref                      # (N, A)
            r = jnp.where(ok[:, None], r, 0.0)
            Jm = jnp.where(ok[:, None, None], J, 0.0)
            n_meas = jnp.maximum(jnp.sum(ok) * patch_area, 1)
            chi2 = jnp.sum(r * r) / n_meas.astype(dtype)
            H = jnp.einsum("nai,naj->ij", Jm, Jm)
            g = jnp.einsum("nai,na->i", Jm, r)
            # damped solve for safety in f32; LM scales the damping by mu
            # (ref nlls_solver_impl.hpp:150: H(i,i) *= 1 + mu)
            damp = 1e-4 + (mu if lm else 0.0)
            H = H + damp * jnp.eye(6, dtype=dtype) * jnp.trace(H) / 6.0
            dx = solve_spd(H, -g)
            improved = chi2 < best_chi2
            new_best_q = jnp.where(improved, T_q, best_q)
            new_best_t = jnp.where(improved, T_t, best_t)
            new_best_chi2 = jnp.where(improved, chi2, best_chi2)
            if lm:
                # grow damping on failure, relax on success and keep going
                # (ref nlls_solver_impl.hpp:176-210: mu *= nu / mu /= ~3)
                mu = jnp.where(improved, jnp.maximum(mu / 3.0, 1e-8),
                               mu * 10.0)
                stop_now = stopped
            else:
                # rollback semantics: once chi2 stops improving, freeze
                # (ref nlls_solver_impl.hpp:62-74)
                stop_now = stopped | (~improved)
            T_new = Tl.compose(SE3.exp(dx))
            T_new = T_new.normalize()
            upd = ~stop_now
            T_q2 = jnp.where(upd, T_new.q, T_q)
            T_t2 = jnp.where(upd, T_new.t, T_t)
            small = jnp.linalg.norm(dx) < cfg.img_align_eps
            return (it + 1, T_q2, T_t2, new_best_q, new_best_t,
                    new_best_chi2, stop_now | small, mu)

        # while_loop, not fori: GN typically converges (or rolls back) well
        # before the 30-iteration cap, and each skipped iteration skips a
        # whole sample-kernel dispatch — the latency-bound inner loop of the
        # tracker (ref nlls_solver_impl.hpp:62-74 breaks the same way)
        init = (jnp.zeros((), jnp.int32), T.q, T.t, T.q, T.t,
                jnp.asarray(jnp.inf, dtype), jnp.zeros((), bool),
                jnp.asarray(0.01, dtype))
        out = jax.lax.while_loop(
            lambda c: (c[0] < cfg.img_align_n_iter) & ~c[6], body, init)
        T = SE3(q=out[3], t=out[4])                        # best-so-far
        chi2_out = out[5]

        if level == cfg.img_align_min_level:
            # count tracked features at the finest aligned level
            xyz_cur = T.apply(xyz_ref)
            uv_cur = cam.world2cam(xyz_cur) * scale
            ok = (ok_ref & (xyz_cur[..., 2] > 1e-3)
                  & interp.in_bounds(uv_cur, h, w, half + 1))
            n_tracked = jnp.sum(ok).astype(jnp.int32)

    return T, n_tracked, chi2_out
