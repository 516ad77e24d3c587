"""Bilinear sampling and patch extraction — the gather substrate under every
alignment kernel (replaces the reference's `vk::interpolateMat_8u` in
`vision.h` and the per-pixel pointer walks inside `sparse_img_align.cpp`,
`feature_alignment.cpp`, `matcher.cpp:83-116`).

Coordinates are (x, y) pixels; integer coordinates hit pixel centers.
Out-of-bounds reads clamp to the border — validity must be masked by callers
(matching the reference, which bounds-checks before touching pixels).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W) at uv (..., 2) float pixel coords, bilinear."""
    h, w = img.shape
    x = uv[..., 0]
    y = uv[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def patch_offsets(halfsize: int, dtype=jnp.float32) -> jnp.ndarray:
    """(P*P, 2) offsets covering a (2*halfsize)^2 patch, top-left at
    -halfsize (matches the reference's patch walk order, e.g.
    feature_alignment.cpp:180-200: x from -half to half-1)."""
    p = 2 * halfsize
    r = jnp.arange(p, dtype=dtype) - halfsize
    ox, oy = jnp.meshgrid(r, r, indexing="xy")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)


def extract_patches(img: jnp.ndarray, centers: jnp.ndarray,
                    halfsize: int) -> jnp.ndarray:
    """Bilinear patches (N, P, P) at float centers (N, 2)."""
    p = 2 * halfsize
    offs = patch_offsets(halfsize, centers.dtype)          # (P*P, 2)
    coords = centers[:, None, :] + offs[None, :, :]        # (N, P*P, 2)
    vals = bilinear_sample(img, coords)
    return vals.reshape(centers.shape[0], p, p)


def extract_patches_with_grad(img: jnp.ndarray, centers: jnp.ndarray,
                              halfsize: int):
    """Patches plus central-difference image gradients at the same sample
    positions: returns (patch, dx, dy), each (N, P, P).

    Gradient convention matches the reference: 0.5*(I(x+1)-I(x-1))
    (sparse_img_align.cpp:150-170, feature_alignment.cpp:180-200).
    """
    p = 2 * halfsize
    offs = patch_offsets(halfsize, centers.dtype)
    coords = centers[:, None, :] + offs[None, :, :]        # (N, P*P, 2)
    ex = jnp.array([1.0, 0.0], centers.dtype)
    ey = jnp.array([0.0, 1.0], centers.dtype)
    val = bilinear_sample(img, coords)
    dx = 0.5 * (bilinear_sample(img, coords + ex) - bilinear_sample(img, coords - ex))
    dy = 0.5 * (bilinear_sample(img, coords + ey) - bilinear_sample(img, coords - ey))
    n = centers.shape[0]
    return (val.reshape(n, p, p), dx.reshape(n, p, p), dy.reshape(n, p, p))


def bilinear_sample_stack(imgs: jnp.ndarray, idx: jnp.ndarray,
                          uv: jnp.ndarray) -> jnp.ndarray:
    """Sample a stack of images (K, H, W) at per-item image index idx (N,)
    and coords uv (N, ..., 2) — the gather substrate for reading patches out
    of the keyframe arena (each feature references its own keyframe)."""
    k, h, w = imgs.shape
    x = uv[..., 0]
    y = uv[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    ii = idx.reshape(idx.shape + (1,) * (uv.ndim - 2))
    v00 = imgs[ii, y0, x0]
    v01 = imgs[ii, y0, x1]
    v10 = imgs[ii, y1, x0]
    v11 = imgs[ii, y1, x1]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def in_bounds(uv: jnp.ndarray, h: int, w: int, margin: float) -> jnp.ndarray:
    """Validity of sample centers with a border margin (ref isInFrame +
    patch-halfsize guards throughout the matcher/aligner)."""
    return ((uv[..., 0] >= margin) & (uv[..., 0] < w - 1 - margin)
            & (uv[..., 1] >= margin) & (uv[..., 1] < h - 1 - margin))
