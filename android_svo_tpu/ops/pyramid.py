"""Image pyramid construction — TPU replacement for the reference's
SSE2/NEON `vk::halfSample` (`vision.cpp:20-110`) and
`frame_utils::createImgPyramid` (`frame.cpp:186-195`).

The reference's halfsample is a 2x2 block mean; on TPU this is a pure
reshape-reduce that XLA fuses into a single VPU pass — no Pallas needed
(memory-bound, already at speed of light).

Images are `(H, W)` float32 in [0, 255] (the reference keeps uint8; we keep
the 0-255 scale so intensity thresholds match reference semantics).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def half_sample(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 block mean; odd trailing row/col dropped (ref vision.cpp:71-110)."""
    h, w = img.shape[-2], img.shape[-1]
    h2, w2 = h // 2, w // 2
    x = img[..., : 2 * h2, : 2 * w2]
    x = x.reshape(x.shape[:-2] + (h2, 2, w2, 2))
    return x.mean(axis=(-3, -1))


def build_pyramid(img: jnp.ndarray, n_levels: int) -> tuple[jnp.ndarray, ...]:
    """Level 0 is the input; each level halves (ref frame.cpp:186-195)."""
    levels = [img]
    for _ in range(n_levels - 1):
        levels.append(half_sample(levels[-1]))
    return tuple(levels)


def pyramid_shapes(h: int, w: int, n_levels: int) -> Sequence[tuple[int, int]]:
    shapes = [(h, w)]
    for _ in range(n_levels - 1):
        h, w = h // 2, w // 2
        shapes.append((h, w))
    return shapes
