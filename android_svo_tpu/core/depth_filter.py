"""Recursive Bayesian inverse-depth filter (Vogiatzis & Hernandez
Gaussian x Beta model) — TPU-native rebuild of the reference's `DepthFilter`
(`depth_filter.cpp:36-416`).

The reference runs a mapping thread walking a `std::list` of seeds
(`depth_filter.cpp:237-340`); here the seed population is a fixed-capacity
structure-of-arrays arena updated by one fused batched computation per frame
(visibility -> epipolar match -> tau -> Bayes update), the design called out
in SURVEY.md §2c.  Seed *allocation* (on keyframes) and *retirement*
(convergence / age-out) are mask writes handled by the pipeline.

State per seed (ref Seed struct, depth_filter.h:36-52):
  a, b      — Beta distribution inlier/outlier evidence
  mu        — mean of the Gaussian inverse-depth estimate
  sigma2    — variance of the inverse-depth estimate
  z_range   — 1/depth_min at birth; the uniform outlier support
"""

from __future__ import annotations

import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry.se3 import SE3


def seed_init(depth_mean: jnp.ndarray, depth_min: jnp.ndarray):
    """Initial (a, b, mu, sigma2, z_range) for new seeds
    (ref depth_filter.cpp:36-45)."""
    a = jnp.full_like(depth_mean, 10.0)
    b = jnp.full_like(depth_mean, 10.0)
    mu = 1.0 / depth_mean
    z_range = 1.0 / depth_min
    sigma2 = (z_range * z_range) / 36.0
    return a, b, mu, sigma2, z_range


def compute_tau(T_ref_cur_t: jnp.ndarray, f: jnp.ndarray, z: jnp.ndarray,
                px_error_angle: jnp.ndarray) -> jnp.ndarray:
    """Depth uncertainty from a one-pixel angular matching error
    (ref computeTau, depth_filter.cpp:396-416). Pure trigonometry on the
    triangulation triangle; batched over seeds.

    T_ref_cur_t: (N,3) or (3,) translation of cur camera in ref frame.
    f: (N,3) seed bearing in ref frame.  z: (N,) current depth estimate.
    """
    t = jnp.broadcast_to(T_ref_cur_t, f.shape)
    a_vec = f * z[..., None] - t
    t_norm = jnp.linalg.norm(t, axis=-1)
    a_norm = jnp.linalg.norm(a_vec, axis=-1)
    eps = 1e-12
    alpha = jnp.arccos(jnp.clip(
        jnp.sum(f * t, axis=-1) / jnp.maximum(t_norm, eps), -1.0, 1.0))
    beta = jnp.arccos(jnp.clip(
        jnp.sum(a_vec * -t, axis=-1)
        / jnp.maximum(a_norm * t_norm, eps), -1.0, 1.0))
    beta_plus = beta + px_error_angle
    gamma_plus = jnp.pi - alpha - beta_plus
    sin_g = jnp.sin(gamma_plus)
    z_plus = t_norm * jnp.sin(beta_plus) / jnp.where(
        jnp.abs(sin_g) < eps, eps, sin_g)
    return jnp.abs(z_plus - z)


def tau_inverse(z: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """Depth sigma -> inverse-depth sigma (ref depth_filter.cpp:299-300)."""
    return 0.5 * (1.0 / jnp.maximum(1e-7, z - tau) - 1.0 / (z + tau))


def update_seed(x: jnp.ndarray, tau2: jnp.ndarray, a: jnp.ndarray,
                b: jnp.ndarray, mu: jnp.ndarray, sigma2: jnp.ndarray,
                z_range: jnp.ndarray):
    """One Bayesian measurement update of the Gaussian x Beta posterior
    (ref updateSeed, depth_filter.cpp:368-391).

    x: measured inverse depth; tau2: its variance.  Returns updated
    (a, b, mu, sigma2).  Vectorized over seeds.
    """
    dtype = mu.dtype
    norm_scale = jnp.sqrt(sigma2 + tau2)
    norm_scale = jnp.maximum(norm_scale, 1e-12)
    s2 = 1.0 / (1.0 / sigma2 + 1.0 / tau2)
    m = s2 * (mu / sigma2 + x / tau2)
    inv_sqrt2pi = jnp.asarray(0.3989422804014327, dtype)
    pdf = (inv_sqrt2pi / norm_scale
           * jnp.exp(-0.5 * ((x - mu) / norm_scale) ** 2))
    C1 = a / (a + b) * pdf
    C2 = b / (a + b) * (1.0 / z_range)
    norm_const = jnp.maximum(C1 + C2, 1e-30)
    C1 = C1 / norm_const
    C2 = C2 / norm_const
    f = (C1 * (a + 1.0) / (a + b + 1.0)
         + C2 * a / (a + b + 1.0))
    e = (C1 * (a + 1.0) * (a + 2.0) / ((a + b + 1.0) * (a + b + 2.0))
         + C2 * a * (a + 1.0) / ((a + b + 1.0) * (a + b + 2.0)))
    mu_new = C1 * m + C2 * mu
    sigma2_new = (C1 * (s2 + m * m) + C2 * (sigma2 + mu * mu)
                  - mu_new * mu_new)
    denom = jnp.where(jnp.abs(f - e / f) < 1e-12, 1e-12, f - e / f)
    a_new = (e - f) / denom
    b_new = a_new * (1.0 - f) / jnp.maximum(f, 1e-12)
    # guard against numerical collapse
    a_new = jnp.clip(a_new, 1e-3, 1e6)
    b_new = jnp.clip(b_new, 1e-3, 1e6)
    sigma2_new = jnp.maximum(sigma2_new, 1e-14)
    return a_new, b_new, mu_new, sigma2_new


def is_converged(sigma2: jnp.ndarray, z_range: jnp.ndarray,
                 cfg: SVOConfig) -> jnp.ndarray:
    """Seed convergence test (ref depth_filter.cpp:310:
    sqrt(sigma2) < z_range/100)."""
    return jnp.sqrt(sigma2) < z_range / cfg.seed_convergence_sigma2_thresh


def px_error_angle(cam_fx: jnp.ndarray, noise_px: float = 1.0) -> jnp.ndarray:
    """One-pixel angular error (ref depth_filter.cpp:291-292)."""
    return jnp.arctan(noise_px / (2.0 * cam_fx)) * 2.0
