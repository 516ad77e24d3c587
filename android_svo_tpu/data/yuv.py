"""YUV_420_888 -> RGB / grayscale conversion — the TPU-native rebuild of the
reference's `ImageProcess` (`image_process.cpp:97-186`: integer `YUV2RGB`
`:97-121`, plane walk in `GetCVImage` `:150-186`).

The reference converts on the CPU per pixel with fixed-point BT.601 math so a
phone camera frame can feed SVO; here the same conversion is a vectorized XLA
op so a live-camera deployment can run it on device, fused with the pyramid
build.  Dataset loaders (EuRoC/TUM) bypass this — they are already grayscale.

Layout: I420/YUV420p planes (Y: HxW, U,V: H/2 x W/2), the normalized form of
Android's YUV_420_888 after stride removal.
"""

from __future__ import annotations

import jax.numpy as jnp


def yuv420_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
                  ) -> jnp.ndarray:
    """(H,W), (H/2,W/2), (H/2,W/2) uint8/float -> (H,W,3) float32 RGB in
    [0,255].  Fixed-point BT.601 limited-range, matching the reference's
    integer kernel (image_process.cpp:97-121: 1192*(y-16) with 1634/833/400/
    2066 chroma terms, >>10)."""
    yf = jnp.asarray(y, jnp.float32)
    # upsample chroma 2x (nearest, as the reference's uv_row_start>>1 walk)
    uf = jnp.repeat(jnp.repeat(jnp.asarray(u, jnp.float32), 2, 0), 2, 1)
    vf = jnp.repeat(jnp.repeat(jnp.asarray(v, jnp.float32), 2, 0), 2, 1)
    uf = uf[: yf.shape[0], : yf.shape[1]] - 128.0
    vf = vf[: yf.shape[0], : yf.shape[1]] - 128.0
    yy = jnp.maximum(yf - 16.0, 0.0) * (1192.0 / 1024.0)
    r = yy + (1634.0 / 1024.0) * vf
    g = yy - (833.0 / 1024.0) * vf - (400.0 / 1024.0) * uf
    b = yy + (2066.0 / 1024.0) * uf
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def yuv420_to_gray(y: jnp.ndarray) -> jnp.ndarray:
    """Grayscale for the VO front end — the reference converts YUV->RGBA then
    RGBA->GRAY (svo_system.cpp:50); on TPU the luma plane IS the gray image
    (identical result up to the limited-range scaling, which the photometric
    alignment is invariant to)."""
    return jnp.asarray(y, jnp.float32)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """BT.601 luma from RGB (≡ cv::cvtColor COLOR_RGBA2GRAY coefficients)."""
    w = jnp.array([0.299, 0.587, 0.114], rgb.dtype if
                  jnp.issubdtype(rgb.dtype, jnp.floating) else jnp.float32)
    return jnp.asarray(rgb, w.dtype) @ w
