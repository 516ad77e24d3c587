"""Image pyramid construction — TPU replacement for the reference's
SSE2/NEON `vk::halfSample` (`vision.cpp:20-110`) and
`frame_utils::createImgPyramid` (`frame.cpp:186-195`).

The reference's halfsample is a 2x2 block mean; on TPU this is a pure
reshape-reduce that XLA fuses into a single VPU pass — no Pallas needed
(memory-bound, already at speed of light).

Two representations:
  * `build_pyramid` — tuple of per-level `(H_l, W_l)` arrays (host-side /
    reference-shaped code paths: detection, bootstrap KLT).
  * `build_stack` — one zero-padded `(L, Hp, Wp)` array with level `l`
    occupying the top-left `(H>>l, W>>l)` corner.  `Hp`/`Wp` are rounded up
    to the TPU tile grid (8, 128) with minimums (32, 256) so the Pallas
    window-sampling kernels (`ops/patch_pallas.py`) can do aligned
    `(24, 256)` loads anywhere.  One kernel call serves features living on
    different pyramid levels (the data-dependent-level gather of
    `matcher.cpp:156-204` without masked per-level duplication).  Zero
    padding keeps masked out-of-level reads finite; validity w.r.t. the
    TRUE level dims `(H>>l, W>>l)` is the caller's mask, exactly like the
    reference bounds-checks before touching pixels.

Images are `(H, W)` float32 in [0, 255] (the reference keeps uint8; we keep
the 0-255 scale so intensity thresholds match reference semantics).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

# minimum padded dims so the (24, 256)-window Pallas loads always fit
MIN_STACK_H = 32
MIN_STACK_W = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def stack_shape(h: int, w: int, n_levels: int) -> tuple[int, int, int]:
    """Padded (L, Hp, Wp) stack dims for a true (h, w) level-0 image."""
    return (n_levels, max(_round_up(h, 8), MIN_STACK_H),
            max(_round_up(w, 128), MIN_STACK_W))


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
    """Padded pyramid stack (L, Hp, Wp); level l at [l, :H>>l, :W>>l]."""
    return stack_from_pyramid(build_pyramid(img, n_levels))


def stack_from_pyramid(pyr: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Pack a per-level tuple into the padded (L, Hp, Wp) layout.

    Built as pad+stack (one fused concat) rather than dynamic-update-slices
    into a zeros buffer — the .at[].set form cost ~2.8 ms/frame at VGA on
    v5e; this form is a straight memory write."""
    h, w = pyr[0].shape
    _, hp, wp = stack_shape(h, w, len(pyr))
    planes = [jnp.pad(im, ((0, hp - im.shape[0]), (0, wp - im.shape[1])))
              for im in pyr]
    return jnp.stack(planes, axis=0)


def level_view(stack: jnp.ndarray, level: int, h: int, w: int) -> jnp.ndarray:
    """The true (h>>l, w>>l) image of a static level inside a padded stack.
    `h`, `w` are the TRUE level-0 dims (the stack itself is padded)."""
    return stack[..., level, : h >> level, : w >> level]


def stack_levels(stack: jnp.ndarray, h: int, w: int,
                 n_levels: int | None = None) -> tuple[jnp.ndarray, ...]:
    """Unpack a padded stack into the per-level tuple representation."""
    n = n_levels if n_levels is not None else stack.shape[-3]
    return tuple(level_view(stack, l, h, w) for l in range(n))


def pyramid_shapes(h: int, w: int, n_levels: int) -> Sequence[tuple[int, int]]:
    shapes = [(h, w)]
    for _ in range(n_levels - 1):
        h, w = h // 2, w // 2
        shapes.append((h, w))
    return shapes
