"""Inverse-compositional Lucas-Kanade feature alignment — the TPU-native
rebuild of the reference's SIMD alignment kernels
(`feature_alignment.cpp:35-133 align1D`, `:154-282 align2D`, SSE2/NEON
variants `:286-576`).

The reference aligns one 8x8 patch at a time with hand-written SSE2/NEON;
here ALL features align simultaneously as one batched computation: per
iteration one (N, 64) bilinear gather + (N, 3) solve on the VPU/MXU.  The
mean-brightness term (illumination offset) matches the reference's third
parameter (`feature_alignment.cpp:173,229`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.geometry.linsolve import inv_spd
from android_svo_tpu.ops import interp

# ref feature_alignment.cpp:276: min_update_squared = 0.03*0.03
MIN_UPDATE_SQUARED = 0.03 * 0.03


def patch_gradients(patch_with_border: jnp.ndarray):
    """Central-difference gradients of the interior of (N, P+2, P+2)
    patches -> (patch (N,P,P), dx, dy) (ref feature_alignment.cpp:180-200)."""
    inner = patch_with_border[:, 1:-1, 1:-1]
    dx = 0.5 * (patch_with_border[:, 1:-1, 2:] - patch_with_border[:, 1:-1, :-2])
    dy = 0.5 * (patch_with_border[:, 2:, 1:-1] - patch_with_border[:, :-2, 1:-1])
    return inner, dx, dy


def align2d(img: jnp.ndarray, ref_patch: jnp.ndarray, ref_dx: jnp.ndarray,
            ref_dy: jnp.ndarray, init_uv: jnp.ndarray, valid: jnp.ndarray,
            n_iter: int = 10):
    """Batched 2D ICLK with mean-brightness term.

    Args:
      img: (H, W) current image (one pyramid level).
      ref_patch/ref_dx/ref_dy: (N, P, P) reference patches and gradients.
      init_uv: (N, 2) starting positions (patch centers) in img coords.
      valid: (N,) mask.

    Returns (uv, converged, mean_diff): aligned positions, per-feature
    convergence flag (ref align2D return), brightness offset.
    """
    n, p, _ = ref_patch.shape
    half = p // 2
    h, w = img.shape
    area = p * p
    dtype = ref_patch.dtype

    T = ref_patch.reshape(n, area)
    gx = ref_dx.reshape(n, area)
    gy = ref_dy.reshape(n, area)

    # inverse-compositional Hessian: parameters (du, dv, d_mean)
    ones = jnp.ones_like(gx)
    J = jnp.stack([gx, gy, ones], axis=-1)                  # (N, A, 3)
    H = jnp.einsum("nai,naj->nij", J, J)
    H = H + 1e-6 * jnp.eye(3, dtype=dtype)
    Hinv = inv_spd(H)

    def body(it, carry):
        del it
        uv, mean_diff = carry
        ok = valid & interp.in_bounds(uv, h, w, half + 1)
        cur = interp.extract_patches(img, uv, half).reshape(n, area)
        r = cur - T + mean_diff[:, None]                    # (N, A)
        g = jnp.einsum("nai,na->ni", J, r)                  # (N, 3)
        upd = jnp.einsum("nij,nj->ni", Hinv, g)
        # inverse-compositional: subtract the update (converged features
        # produce near-zero updates, so no explicit freeze is needed)
        uv = jnp.where(ok[:, None], uv - upd[:, :2], uv)
        mean_diff = jnp.where(ok, mean_diff - upd[:, 2], mean_diff)
        return uv, mean_diff

    uv, mean_diff = jax.lax.fori_loop(
        0, n_iter, body, (init_uv, jnp.zeros((n,), dtype)))

    # converged = final update small AND still in bounds AND didn't drift far
    ok = valid & interp.in_bounds(uv, h, w, half + 1)
    cur = interp.extract_patches(img, uv, half).reshape(n, area)
    r = cur - T + mean_diff[:, None]
    g = jnp.einsum("nai,na->ni", J, r)
    upd = jnp.einsum("nij,nj->ni", Hinv, g)
    step2 = jnp.sum(upd[:, :2] ** 2, axis=-1)
    drift = jnp.linalg.norm(uv - init_uv, axis=-1)
    converged = ok & (step2 < 4.0 * MIN_UPDATE_SQUARED) & (drift < p)
    return uv, converged, mean_diff


def align1d(img: jnp.ndarray, ref_patch: jnp.ndarray, ref_dx: jnp.ndarray,
            ref_dy: jnp.ndarray, direction: jnp.ndarray, init_uv: jnp.ndarray,
            valid: jnp.ndarray, n_iter: int = 10):
    """Batched 1D ICLK along a unit direction (epipolar line / edgelet
    normal) with mean-brightness term (ref feature_alignment.cpp:35-133).

    Parameters per feature: (step_along_dir, d_mean).
    """
    n, p, _ = ref_patch.shape
    half = p // 2
    h, w = img.shape
    area = p * p
    dtype = ref_patch.dtype

    T = ref_patch.reshape(n, area)
    gdir = (direction[:, 0:1] * ref_dx.reshape(n, area)
            + direction[:, 1:2] * ref_dy.reshape(n, area))
    ones = jnp.ones_like(gdir)
    J = jnp.stack([gdir, ones], axis=-1)                    # (N, A, 2)
    H = jnp.einsum("nai,naj->nij", J, J) + 1e-6 * jnp.eye(2, dtype=dtype)
    Hinv = inv_spd(H)

    def body(it, carry):
        del it
        uv, mean_diff = carry
        ok = valid & interp.in_bounds(uv, h, w, half + 1)
        cur = interp.extract_patches(img, uv, half).reshape(n, area)
        r = cur - T + mean_diff[:, None]
        g = jnp.einsum("nai,na->ni", J, r)
        upd = jnp.einsum("nij,nj->ni", Hinv, g)
        uv_new = uv - upd[:, 0:1] * direction
        mean_new = mean_diff - upd[:, 1]
        uv = jnp.where(ok[:, None], uv_new, uv)
        mean_diff = jnp.where(ok, mean_new, mean_diff)
        return uv, mean_diff

    uv, mean_diff = jax.lax.fori_loop(
        0, n_iter, body, (init_uv, jnp.zeros((n,), dtype)))
    ok = valid & interp.in_bounds(uv, h, w, half + 1)
    drift = jnp.linalg.norm(uv - init_uv, axis=-1)
    converged = ok & (drift < p)
    return uv, converged, mean_diff
