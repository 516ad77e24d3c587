"""Pallas TPU kernels for scattered bilinear patch sampling — the
speed-of-light replacement for the reference's SIMD patch kernels
(`feature_alignment.cpp:286/453`, `patch_score.h:87-196`) and for every
pointer-chasing patch read in `sparse_img_align.cpp`/`matcher.cpp`.

Why: XLA lowers scattered gathers on TPU to ~0.07 G loads/s (measured,
scripts/microbench_gather.py) — 3 orders of magnitude off the VPU.  These
kernels instead do per-feature *aligned* `(16, 256)` window loads from a
VMEM-resident padded pyramid stack, rotate the window into place with two
dynamic `pltpu.roll`s, and finish the bilinear/ZMSSD math on registers:
measured ~12 ns per 8x8 patch (~86 M patches/s, scripts/
probe_pallas_variants.py) — ~300x over the XLA gather path.

Layout contract (see ops/pyramid.build_stack): the pyramid is one
`(L, H, W)` array, level `l` in the top-left `(H>>l, W>>l)` corner, zero
padding elsewhere; `H >= 16`, `W >= 256`, both multiples of the (8, 128)
tile.  All `uv` coordinates are in *level* pixel units.  Out-of-level or
out-of-image samples return garbage-but-finite values — callers mask
validity exactly like the reference bounds-checks before touching pixels.

Every public function has a pure-JAX fallback (`use_pallas=False`) with
identical semantics away from image borders — that fallback is the spec,
runs on CPU for the test suite, and the Pallas path is checked against it
in interpret mode (tests/test_patch_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from android_svo_tpu.ops import interp

WIN_R = 24      # aligned window rows: 8-aligned start + <=7 remainder + 11
                # crop rows must fit (7 + 11 <= 24; 16 would wrap)
WIN_C = 256     # aligned window cols   (lane multiple x2: roll-safe)
CROP = 11       # static crop after rolls; supports sample grids <= 10 ints
BLK = 128       # features per pallas program


def _auto_backend(use_pallas) -> bool:
    if use_pallas is None:
        return jax.default_backend() == "tpu"
    return bool(use_pallas)


def _pad_rows(x: jnp.ndarray, n: int):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# patch sampling
# ---------------------------------------------------------------------------

def _load_window(stack_ref, l, yi, xi, h, w):
    """Aligned (WIN_R, WIN_C) window whose top-left maps to (yi, xi) after
    the two rolls.  Requires 0 <= yi <= h-12, 0 <= xi <= w-12."""
    ya = pl.multiple_of(jnp.minimum((yi // 8) * 8, h - WIN_R), 8)
    xa = pl.multiple_of(jnp.minimum((xi // 128) * 128, w - WIN_C), 128)
    win = stack_ref[l, pl.ds(ya, WIN_R), pl.ds(xa, WIN_C)]
    win = pltpu.roll(win, -(yi - ya), 0)
    win = pltpu.roll(win, -(xi - xa), 1)
    return win


def _bilinear_crop(win, wx, wy, s: int):
    """(s, s) bilinear samples from a rolled window whose [0,0] is the
    integer top-left sample."""
    v00 = win[:s, :s]
    v01 = win[:s, 1:s + 1]
    v10 = win[1:s + 1, :s]
    v11 = win[1:s + 1, 1:s + 1]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def _make_sample_kernel(half: int, grad: bool):
    p = 2 * half
    s = p + 2 if grad else p                 # sampled grid (incl. grad border)
    border = 1 if grad else 0

    def kernel(lvl_ref, uv_ref, stack_ref, *outs):
        _, h, w = stack_ref.shape

        def one(i, _):
            l = jnp.clip(lvl_ref[i, 0], 0, stack_ref.shape[0] - 1)
            x = uv_ref[i, 0]
            y = uv_ref[i, 1]
            x0f = jnp.floor(x)
            y0f = jnp.floor(y)
            wx = x - x0f
            wy = y - y0f
            xi = jnp.clip(x0f.astype(jnp.int32) - half - border, 0, w - 12)
            yi = jnp.clip(y0f.astype(jnp.int32) - half - border, 0, h - 12)
            win = _load_window(stack_ref, l, yi, xi, h, w)
            patch = _bilinear_crop(win, wx, wy, s)
            if grad:
                outs[0][i] = patch[1:-1, 1:-1]
                outs[1][i] = 0.5 * (patch[1:-1, 2:] - patch[1:-1, :-2])
                outs[2][i] = 0.5 * (patch[2:, 1:-1] - patch[:-2, 1:-1])
            else:
                outs[0][i] = patch
            return 0

        jax.lax.fori_loop(0, BLK, one, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("half", "grad"))
def _sample_pallas(stack, lvl, uv, half: int, grad: bool):
    n = uv.shape[0]
    npad = ((n + BLK - 1) // BLK) * BLK
    lvl_p = _pad_rows(lvl.astype(jnp.int32), npad)
    uv_p = _pad_rows(jnp.nan_to_num(uv, nan=0.0, posinf=0.0, neginf=0.0),
                     npad)
    p = 2 * half
    L, h, w = stack.shape
    n_out = 3 if grad else 1
    out_shapes = tuple(jax.ShapeDtypeStruct((npad, p, p), stack.dtype)
                       for _ in range(n_out))
    out_specs = tuple(pl.BlockSpec((BLK, p, p), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
                      for _ in range(n_out))
    outs = pl.pallas_call(
        _make_sample_kernel(half, grad),
        grid=(npad // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((L, h, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
    )(lvl_p[:, None], uv_p, stack)
    outs = tuple(o[:n] for o in outs)
    return outs if grad else outs[0]


def _sample_fallback(stack, lvl, uv, half: int, grad: bool):
    """Pure-JAX spec: bilinear patches from the padded stack, with the same
    centre/offset conventions as interp.extract_patches(_with_grad)."""
    p = 2 * half
    n = uv.shape[0]
    offs = interp.patch_offsets(half, uv.dtype)              # (p*p, 2)
    coords = uv[:, None, :] + offs[None, :, :]
    lvl = lvl.astype(jnp.int32)
    val = interp.bilinear_sample_stack(stack, lvl, coords)
    if not grad:
        return val.reshape(n, p, p)
    ex = jnp.array([1.0, 0.0], uv.dtype)
    ey = jnp.array([0.0, 1.0], uv.dtype)
    dx = 0.5 * (interp.bilinear_sample_stack(stack, lvl, coords + ex)
                - interp.bilinear_sample_stack(stack, lvl, coords - ex))
    dy = 0.5 * (interp.bilinear_sample_stack(stack, lvl, coords + ey)
                - interp.bilinear_sample_stack(stack, lvl, coords - ey))
    return (val.reshape(n, p, p), dx.reshape(n, p, p), dy.reshape(n, p, p))


def sample_patches(stack, lvl, uv, half: int, grad: bool = False,
                   use_pallas=None, interpret: bool = False):
    """Bilinear (2*half)^2 patches (optionally with central-difference
    gradients) at per-feature pyramid level `lvl` and level-coords `uv`.

    stack: (L, H, W) padded pyramid (ops/pyramid.build_stack).
    Returns (N, P, P) or a (patch, dx, dy) triple when grad=True.
    """
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return _sample_pallas(stack, lvl, uv, half, grad)
    if _auto_backend(use_pallas):
        return _sample_pallas(stack, lvl, uv, half, grad)
    return _sample_fallback(stack, lvl, uv, half, grad)


# ---------------------------------------------------------------------------
# fused epipolar ZMSSD scan (ref matcher.cpp:280-324 + patch_score.h:40-220)
# ---------------------------------------------------------------------------

def _make_scan_kernel(n_steps: int, half: int):
    p = 2 * half

    def kernel(lvl_ref, ab_ref, stack_ref, ref_ref, out_ref):
        _, h, w = stack_ref.shape

        def one(i, _):
            l = jnp.clip(lvl_ref[i, 0], 0, stack_ref.shape[0] - 1)
            wl = (w >> l).astype(jnp.float32)
            hl = (h >> l).astype(jnp.float32)
            ax = ab_ref[i, 0]
            ay = ab_ref[i, 1]
            bx = ab_ref[i, 2]
            by = ab_ref[i, 3]
            rp = ref_ref[i]                                  # (p, p) zero-mean
            inv_steps = 1.0 / (n_steps - 1)

            def step(k, carry):
                best_t, best_s = carry
                t = k.astype(jnp.float32) * inv_steps
                x = ax + t * (bx - ax)
                y = ay + t * (by - ay)
                x0f = jnp.floor(x)
                y0f = jnp.floor(y)
                wx = x - x0f
                wy = y - y0f
                xi = jnp.clip(x0f.astype(jnp.int32) - half, 0, w - 12)
                yi = jnp.clip(y0f.astype(jnp.int32) - half, 0, h - 12)
                win = _load_window(stack_ref, l, yi, xi, h, w)
                cur = _bilinear_crop(win, wx, wy, p)
                cm = jnp.sum(cur) * (1.0 / (p * p))
                d = (cur - cm) - rp
                score = jnp.sum(d * d)
                m = half + 2.0
                inb = ((x >= m) & (x < wl - 1 - m)
                       & (y >= m) & (y < hl - 1 - m))
                score = jnp.where(inb, score, jnp.inf)
                better = score < best_s
                return (jnp.where(better, t, best_t),
                        jnp.where(better, score, best_s))

            best_t, best_s = jax.lax.fori_loop(
                0, n_steps, step, (jnp.float32(0.0), jnp.float32(jnp.inf)))
            out_ref[i, 0] = best_t
            out_ref[i, 1] = best_s
            return 0

        jax.lax.fori_loop(0, BLK, one, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_steps", "half"))
def _scan_pallas(stack, lvl, uv_a, uv_b, ref_patch_zm, n_steps: int,
                 half: int):
    n = lvl.shape[0]
    npad = ((n + BLK - 1) // BLK) * BLK
    p = 2 * half
    L, h, w = stack.shape
    ab = jnp.concatenate([uv_a, uv_b], axis=-1)
    ab = jnp.nan_to_num(ab, nan=0.0, posinf=0.0, neginf=0.0)
    out = pl.pallas_call(
        _make_scan_kernel(n_steps, half),
        grid=(npad // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((L, h, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 2), jnp.float32),
    )(_pad_rows(lvl.astype(jnp.int32), npad)[:, None],
      _pad_rows(ab, npad), stack, _pad_rows(ref_patch_zm, npad))
    return out[:n, 0], out[:n, 1]


def _scan_fallback(stack, lvl, uv_a, uv_b, ref_patch_zm, n_steps: int,
                   half: int):
    p = 2 * half
    n = lvl.shape[0]
    dtype = uv_a.dtype
    ts = jnp.linspace(0.0, 1.0, n_steps, dtype=dtype)
    uvk = (uv_a[:, None, :] * (1 - ts[None, :, None])
           + uv_b[:, None, :] * ts[None, :, None])           # (N, K, 2)
    offs = interp.patch_offsets(half, dtype)
    coords = uvk[:, :, None, :] + offs[None, None, :, :]     # (N, K, A, 2)
    lvl = lvl.astype(jnp.int32)
    cur = interp.bilinear_sample_stack(
        stack, lvl[:, None].repeat(n_steps, 1).reshape(-1),
        coords.reshape(n * n_steps, -1, 2)).reshape(n, n_steps, p * p)
    cur = cur - cur.mean(axis=-1, keepdims=True)
    d = cur - ref_patch_zm.reshape(n, 1, p * p)
    score = jnp.sum(d * d, axis=-1)                          # (N, K)
    h, w = stack.shape[-2], stack.shape[-1]
    wl = (w >> lvl).astype(dtype)[:, None]
    hl = (h >> lvl).astype(dtype)[:, None]
    m = half + 2.0
    inb = ((uvk[..., 0] >= m) & (uvk[..., 0] < wl - 1 - m)
           & (uvk[..., 1] >= m) & (uvk[..., 1] < hl - 1 - m))
    score = jnp.where(inb, score, jnp.inf)
    best = jnp.argmin(score, axis=-1)
    best_t = ts[best]
    best_s = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]
    return best_t, best_s


def epi_scan(stack, lvl, uv_a, uv_b, ref_patch, n_steps: int, half: int = 4,
             use_pallas=None, interpret: bool = False):
    """Best ZMSSD match along each seed's epipolar segment.

    Scans `n_steps` uniform positions between level-coords `uv_a` and
    `uv_b` at per-seed level `lvl`, scoring the (2*half)^2 `ref_patch`
    (zero-meaned internally).  Returns (t_best in [0,1], score); positions
    outside the level (margin half+2) score +inf, so a fully-out segment
    returns score=inf (caller rejects, ref matcher.cpp:280-324 clips to the
    image instead).
    """
    rp = ref_patch.reshape(ref_patch.shape[0], -1)
    rp = (rp - rp.mean(axis=-1, keepdims=True)).reshape(ref_patch.shape)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return _scan_pallas(stack, lvl, uv_a, uv_b, rp, n_steps, half)
    if _auto_backend(use_pallas):
        return _scan_pallas(stack, lvl, uv_a, uv_b, rp, n_steps, half)
    return _scan_fallback(stack, lvl, uv_a, uv_b, rp, n_steps, half)
