"""Image pyramid construction — TPU replacement for the reference's
SSE2/NEON `vk::halfSample` (`vision.cpp:20-110`) and
`frame_utils::createImgPyramid` (`frame.cpp:186-195`).

The reference's halfsample is a 2x2 block mean; on TPU this is a pure
reshape-reduce that XLA fuses into a single VPU pass — no Pallas needed
(memory-bound, already at speed of light).

Two representations:
  * `build_pyramid` — tuple of per-level `(H_l, W_l)` arrays (host-side /
    reference-shaped code paths).
  * `build_stack` — one zero-padded `(L, H, W)` array with level `l`
    occupying the top-left `(H>>l, W>>l)` corner.  This is the layout the
    Pallas sampling kernels index with a dynamic leading dimension, so one
    kernel call serves features living on different pyramid levels (the
    data-dependent-level gather of `matcher.cpp:156-204` without the masked
    per-level duplication).  Zero padding keeps masked out-of-level reads
    finite.

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


def build_stack(img: jnp.ndarray, n_levels: int) -> jnp.ndarray:
    """Padded pyramid stack (L, H, W); level l at [l, :H>>l, :W>>l]."""
    h, w = img.shape
    levels = build_pyramid(img, n_levels)
    stack = jnp.zeros((n_levels, h, w), img.dtype)
    for l, im in enumerate(levels):
        stack = stack.at[l, : im.shape[0], : im.shape[1]].set(im)
    return stack


def stack_from_pyramid(pyr: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Pack an existing per-level tuple into the padded (L, H, W) layout."""
    h, w = pyr[0].shape
    stack = jnp.zeros((len(pyr), h, w), pyr[0].dtype)
    for l, im in enumerate(pyr):
        stack = stack.at[l, : im.shape[0], : im.shape[1]].set(im)
    return stack


def level_view(stack: jnp.ndarray, level: int) -> jnp.ndarray:
    """The (H>>l, W>>l) image of a static level inside the padded stack."""
    h, w = stack.shape[-2], stack.shape[-1]
    return stack[..., level, : h >> level, : w >> level]


def pyramid_shapes(h: int, w: int, n_levels: int) -> Sequence[tuple[int, int]]:
    shapes = [(h, w)]
    for _ in range(n_levels - 1):
        h, w = h // 2, w // 2
        shapes.append((h, w))
    return shapes
