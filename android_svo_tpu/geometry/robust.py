"""Robust scale estimators and M-estimator weight functions — batched
replacements for the reference's `vk::robust_cost` (`robust_cost.cpp:29-157`).

All functions take/return arrays and an optional validity mask, so they can
run inside jitted GN loops over fixed-capacity residual arenas.
"""

from __future__ import annotations

import jax.numpy as jnp

# ref robust_cost.cpp:67 — 1.48 * MAD is a consistent sigma estimator
MAD_NORMALIZER = 1.48
# ref robust_cost.cpp:87: TukeyWeightFunction::DEFAULT_B = 8.6851f.  The
# textbook 95%-efficiency constant is 4.6851; the reference deliberately (or
# not) uses twice that, making its outlier rejection ~2x more permissive —
# we match the reference's behavior, not the textbook.
TUKEY_B = 8.6851
HUBER_K = 1.345
TDIST_DOF = 5.0


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over valid entries of a fixed-size arena.

    Invalid entries are pushed to +inf; the median index is computed from the
    true count so padding never contaminates the estimate.
    """
    n = jnp.sum(mask.astype(jnp.int32))
    big = jnp.asarray(jnp.inf, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big))
    idx = jnp.maximum(n - 1, 0) // 2
    return xs[idx]


def mad_scale(errors: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median absolute deviation scale (ref MADScaleEstimator::compute)."""
    return MAD_NORMALIZER * masked_median(jnp.abs(errors), mask)


def normal_scale(errors: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """RMS scale (ref NormalDistributionScaleEstimator)."""
    n = jnp.maximum(jnp.sum(mask.astype(errors.dtype)), 1.0)
    return jnp.sqrt(jnp.sum(jnp.where(mask, errors * errors, 0.0)) / n)


def tdist_scale(errors: jnp.ndarray, mask: jnp.ndarray,
                n_iter: int = 10) -> jnp.ndarray:
    """Student-t scale via fixed-point EM (ref TDistributionScaleEstimator)."""
    dof = TDIST_DOF
    n = jnp.maximum(jnp.sum(mask.astype(errors.dtype)), 1.0)
    e2 = jnp.where(mask, errors * errors, 0.0)
    sigma2 = jnp.maximum(jnp.sum(e2) / n, 1e-12)
    for _ in range(n_iter):
        w = (dof + 1.0) / (dof + e2 / sigma2)
        sigma2 = jnp.maximum(jnp.sum(w * e2) / n, 1e-12)
    return jnp.sqrt(sigma2)


def unit_weight(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.ones_like(x)


def tukey_weight(x_norm: jnp.ndarray, b: float = TUKEY_B) -> jnp.ndarray:
    """Tukey biweight of normalized residuals (ref TukeyWeightFunction)."""
    r = x_norm / b
    w = (1.0 - r * r)
    return jnp.where(jnp.abs(r) < 1.0, w * w, 0.0)


def huber_weight(x_norm: jnp.ndarray, k: float = HUBER_K) -> jnp.ndarray:
    """Huber weight (ref HuberWeightFunction)."""
    ax = jnp.abs(x_norm)
    return jnp.where(ax < k, 1.0, k / jnp.maximum(ax, 1e-12))


def tdist_weight(x_norm: jnp.ndarray, dof: float = TDIST_DOF) -> jnp.ndarray:
    """Student-t weight (ref TDistributionWeightFunction)."""
    return (dof + 1.0) / (dof + x_norm * x_norm)
