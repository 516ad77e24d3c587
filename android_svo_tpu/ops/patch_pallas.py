"""Pallas TPU kernels for scattered bilinear patch work — the
speed-of-light replacement for the reference's SIMD patch kernels
(`feature_alignment.cpp:286/453`, `patch_score.h:87-196`) and for every
pointer-chasing patch read in `sparse_img_align.cpp`/`matcher.cpp`.

Why: XLA lowers scattered gathers on TPU to ~0.07 G loads/s (measured,
scripts/microbench_gather.py) — 3 orders of magnitude off the VPU.  These
kernels instead do per-feature *aligned* `(24, 256)` window loads from a
VMEM-resident padded pyramid stack, rotate the window into place with two
dynamic `pltpu.roll`s, and finish the bilinear/ZMSSD/ICLK math on
registers: measured ~12 ns per 8x8 patch (~86 M patches/s,
scripts/probe_pallas_variants.py) — ~300x over the XLA gather path.

Kernels:
  * `sample_patches` — batched bilinear patch (+gradient) extraction at
    per-feature pyramid level (the substrate for sparse-align residuals).
  * `epi_scan` — fused epipolar ZMSSD scan with per-seed dynamic step
    counts (ref `matcher.cpp:280-324` + `patch_score.h:40-220`).
  * `align_iclk` — fused inverse-compositional LK: the full n_iter
    alignment loop runs on-chip per feature, stack loaded into VMEM once
    (ref `feature_alignment.cpp:154-282 align2D` and its SSE2/NEON twins).

Layout contract (see ops/pyramid.build_stack): the pyramid is one
`(L, Hp, Wp)` array, level `l` in the top-left `(h>>l, w>>l)` corner of a
zero-padded plane; `Hp >= 32` mult of 8, `Wp >= 256` mult of 128.  All `uv`
coordinates are in *level* pixel units.  Out-of-level or out-of-image
samples return garbage-but-finite values — callers mask validity against
the TRUE level dims exactly like the reference bounds-checks before
touching pixels.

Every public function has a pure-JAX fallback (`use_pallas=False`) with
identical semantics away from image borders — that fallback is the spec,
runs on CPU for the test suite, and the Pallas path is checked against it
in interpret mode (tests/test_patch_pallas.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from android_svo_tpu.geometry.linsolve import inv_spd
from android_svo_tpu.ops import interp

# debug escape hatch: PALLAS_DISABLE=sample,scan,align forces the pure-JAX
# fallback for the named kernels (trace-time; used by scripts/probe_fault.py)
_DISABLED = frozenset(
    s for s in os.environ.get("PALLAS_DISABLE", "").split(",") if s)

WIN_R = 24      # aligned window rows: 8-aligned start + <=7 remainder + s+1
                # crop rows must fit; kernels use 16 when the sample grid
                # s <= 9 fits (7 + 9 <= 16) and 24 only for s = 10 (8x8+grad)
WIN_C = 256     # aligned window cols   (lane multiple x2: roll-safe)
CROP = 11       # static crop after rolls; supports sample grids <= 10 ints
BLK = 128       # features per pallas program


def _win_rows(s: int) -> int:
    """Smallest 8-multiple window that fits a <=7-row alignment remainder
    plus the (s+1)-row bilinear crop."""
    return 16 if s + 1 + 7 <= 16 else WIN_R


def _auto_backend(use_pallas) -> bool:
    if use_pallas is None:
        return jax.default_backend() == "tpu"
    return bool(use_pallas)


def cfg_use_pallas(cfg) -> bool | None:
    """Map the config knob to the dispatch argument: True-by-config means
    'auto' (Pallas on TPU, fallback elsewhere); False forces the spec path."""
    return None if cfg.use_pallas else False


def _pad_rows(x: jnp.ndarray, n: int):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# patch sampling
# ---------------------------------------------------------------------------

def _load_window(stack_ref, l, yi, xi, h, w, rows: int = WIN_R):
    """Aligned (rows, WIN_C) window whose top-left maps to (yi, xi) after
    the two rolls.  Requires 0 <= yi <= h-(s+1), 0 <= xi <= w-(s+1) for an
    (s+1)-row/col crop: the aligned start clamps to h-rows / w-WIN_C, and
    the roll then brings rows [yi, yi+s] into the window top — valid
    whenever the crop fits inside the plane.

    NOTE: the roll shifts are expressed as POSITIVE amounts mod the window
    size.  Mosaic's dynamic `pltpu.roll` with a *negative* shift on the
    sublane (row) axis is off by one sublane tile (8 rows) on real TPU
    hardware (verified v5e; the interpreter is correct either way) — the
    positive-mod form compiles correctly on both.
    """
    ya = pl.multiple_of(jnp.minimum((yi // 8) * 8, h - rows), 8)
    xa = pl.multiple_of(jnp.minimum((xi // 128) * 128, w - WIN_C), 128)
    win = stack_ref[l, pl.ds(ya, rows), pl.ds(xa, WIN_C)]
    win = pltpu.roll(win, (rows - (yi - ya)) % rows, 0)
    win = pltpu.roll(win, (WIN_C - (xi - xa)) % WIN_C, 1)
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
    rows = _win_rows(s)

    def kernel(lvl_ref, uv_ref, valid_ref, stack_ref, *outs):
        _, h, w = stack_ref.shape

        def one(i, _):
            # dead slots skip the window load entirely and emit zeros
            for o in outs:
                o[i] = jnp.zeros((p, p), o.dtype)

            @pl.when(valid_ref[i, 0] > 0)
            def _live():
                l = jnp.clip(lvl_ref[i, 0], 0, stack_ref.shape[0] - 1)
                x = uv_ref[i, 0]
                y = uv_ref[i, 1]
                x0f = jnp.floor(x)
                y0f = jnp.floor(y)
                wx = x - x0f
                wy = y - y0f
                # clamp so the (s+1)-point crop fits the plane; clamping
                # MUST NOT trigger for in-bounds samples or the patch
                # shifts (callers gate uv against the true level dims)
                xi = jnp.clip(x0f.astype(jnp.int32) - half - border, 0,
                              w - (s + 1))
                yi = jnp.clip(y0f.astype(jnp.int32) - half - border, 0,
                              h - (s + 1))
                win = _load_window(stack_ref, l, yi, xi, h, w, rows)
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
def _sample_pallas(stack, lvl, uv, valid, half: int, grad: bool):
    n = uv.shape[0]
    npad = ((n + BLK - 1) // BLK) * BLK
    lvl_p = _pad_rows(lvl.astype(jnp.int32), npad)
    uv_p = _pad_rows(jnp.nan_to_num(uv, nan=0.0, posinf=0.0, neginf=0.0),
                     npad)
    if valid is None:
        valid_p = jnp.concatenate(
            [jnp.ones((n,), jnp.int32), jnp.zeros((npad - n,), jnp.int32)])
    else:
        valid_p = _pad_rows(valid.astype(jnp.int32), npad)
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
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((L, h, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
    )(lvl_p[:, None], uv_p, valid_p[:, None], stack)
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
                   valid=None, use_pallas=None, interpret: bool = False):
    """Bilinear (2*half)^2 patches (optionally with central-difference
    gradients) at per-feature pyramid level `lvl` and level-coords `uv`.

    stack: (L, Hp, Wp) padded pyramid (ops/pyramid.build_stack).
    valid: optional (N,) bool — False slots skip the load on the Pallas
      path and emit zeros (callers mask their outputs anyway; the fallback
      still computes every slot, so compare only valid slots across paths).
    Returns (N, P, P) or a (patch, dx, dy) triple when grad=True.
    """
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return _sample_pallas(stack, lvl, uv, valid, half, grad)
    if _auto_backend(use_pallas) and "sample" not in _DISABLED:
        return _sample_pallas(stack, lvl, uv, valid, half, grad)
    return _sample_fallback(stack, lvl, uv, half, grad)


# ---------------------------------------------------------------------------
# fused epipolar ZMSSD scan (ref matcher.cpp:280-324 + patch_score.h:40-220)
# ---------------------------------------------------------------------------

def _make_scan_kernel(n_steps_max: int, half: int, h_true: int, w_true: int):
    p = 2 * half
    rows = _win_rows(p)

    def kernel(lvl_ref, ab_ref, ns_ref, stack_ref, ref_ref, out_ref):
        _, h, w = stack_ref.shape

        def one(i, _):
            l = jnp.clip(lvl_ref[i, 0], 0, stack_ref.shape[0] - 1)
            wl = (w_true >> l).astype(jnp.float32)
            hl = (h_true >> l).astype(jnp.float32)
            ax = ab_ref[i, 0]
            ay = ab_ref[i, 1]
            bx = ab_ref[i, 2]
            by = ab_ref[i, 3]
            # 0 steps = dead/skipped seed: the fori_loop below runs zero
            # iterations and the window loads never execute (the arena is
            # mostly dead slots in steady state — this is the difference
            # between scanning 2048 seeds and scanning the live few hundred)
            k = jnp.clip(ns_ref[i, 0], 0, n_steps_max)
            rp = ref_ref[i]                                  # (p, p) zero-mean
            inv_steps = 1.0 / jnp.maximum(k - 1, 1).astype(jnp.float32)

            def step(j, carry):
                best_t, best_s = carry
                t = j.astype(jnp.float32) * inv_steps
                x = ax + t * (bx - ax)
                y = ay + t * (by - ay)
                x0f = jnp.floor(x)
                y0f = jnp.floor(y)
                wx = x - x0f
                wy = y - y0f
                xi = jnp.clip(x0f.astype(jnp.int32) - half, 0, w - (p + 1))
                yi = jnp.clip(y0f.astype(jnp.int32) - half, 0, h - (p + 1))
                win = _load_window(stack_ref, l, yi, xi, h, w, rows)
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
                0, k, step, (jnp.float32(0.0), jnp.float32(jnp.inf)))
            out_ref[i, 0] = best_t
            out_ref[i, 1] = best_s
            return 0

        jax.lax.fori_loop(0, BLK, one, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_steps_max", "half", "h", "w"))
def _scan_pallas(stack, lvl, uv_a, uv_b, n_steps_each, ref_patch_zm,
                 n_steps_max: int, half: int, h: int, w: int):
    n = lvl.shape[0]
    npad = ((n + BLK - 1) // BLK) * BLK
    p = 2 * half
    L, hp, wp = stack.shape
    ab = jnp.concatenate([uv_a, uv_b], axis=-1)
    ab = jnp.nan_to_num(ab, nan=0.0, posinf=0.0, neginf=0.0)
    out = pl.pallas_call(
        _make_scan_kernel(n_steps_max, half, h, w),
        grid=(npad // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((L, hp, wp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 2), jnp.float32),
    )(_pad_rows(lvl.astype(jnp.int32), npad)[:, None],
      _pad_rows(ab, npad),
      _pad_rows(jnp.full_like(lvl, 2, jnp.int32)
                if n_steps_each is None
                else n_steps_each.astype(jnp.int32), npad)[:, None],
      stack, _pad_rows(ref_patch_zm, npad))
    return out[:n, 0], out[:n, 1]


def _scan_fallback(stack, lvl, uv_a, uv_b, n_steps_each, ref_patch_zm,
                   n_steps_max: int, half: int, h: int, w: int):
    p = 2 * half
    n = lvl.shape[0]
    dtype = uv_a.dtype
    k = jnp.clip(n_steps_each.astype(jnp.int32), 0, n_steps_max)  # (N,)
    js = jnp.arange(n_steps_max, dtype=dtype)                # (K,)
    ts = js[None, :] / jnp.maximum(k - 1, 1)[:, None].astype(dtype)
    live = js[None, :] < k[:, None].astype(dtype)            # (N, K)
    ts = jnp.minimum(ts, 1.0)
    uvk = (uv_a[:, None, :] * (1 - ts[..., None])
           + uv_b[:, None, :] * ts[..., None])               # (N, K, 2)
    offs = interp.patch_offsets(half, dtype)
    coords = uvk[:, :, None, :] + offs[None, None, :, :]     # (N, K, A, 2)
    lvl = lvl.astype(jnp.int32)
    cur = interp.bilinear_sample_stack(
        stack, lvl[:, None].repeat(n_steps_max, 1).reshape(-1),
        coords.reshape(n * n_steps_max, -1, 2)).reshape(n, n_steps_max,
                                                        p * p)
    cur = cur - cur.mean(axis=-1, keepdims=True)
    d = cur - ref_patch_zm.reshape(n, 1, p * p)
    score = jnp.sum(d * d, axis=-1)                          # (N, K)
    wl = (w >> lvl).astype(dtype)[:, None]
    hl = (h >> lvl).astype(dtype)[:, None]
    m = half + 2.0
    inb = ((uvk[..., 0] >= m) & (uvk[..., 0] < wl - 1 - m)
           & (uvk[..., 1] >= m) & (uvk[..., 1] < hl - 1 - m))
    score = jnp.where(inb & live, score, jnp.inf)
    best = jnp.argmin(score, axis=-1)
    best_t = jnp.take_along_axis(ts, best[:, None], axis=1)[:, 0]
    best_s = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]
    return best_t, best_s


def epi_scan(stack, lvl, uv_a, uv_b, ref_patch, n_steps_max: int,
             half: int = 4, n_steps_each=None, h: int | None = None,
             w: int | None = None, use_pallas=None,
             interpret: bool = False):
    """Best ZMSSD match along each seed's epipolar segment.

    Scans up to `n_steps_each[i]` (clipped to [2, n_steps_max]) uniform
    positions from level-coords `uv_a` toward `uv_b` at ~per-seed spacing
    |AB|/(n_i-1), scoring the (2*half)^2 `ref_patch` (zero-meaned
    internally).  This is the TPU shape of the reference's dynamic
    `n_steps = epi_length/0.7` loop (matcher.cpp:280-324) — short segments
    cost few iterations instead of the full cap.  Returns
    (t_best in [0,1], score); positions outside the TRUE level dims
    (h>>l, w>>l) with margin half+2 score +inf.

    h/w: true level-0 image dims (the stack itself is padded).
    """
    L, hp, wp = stack.shape
    h = hp if h is None else h
    w = wp if w is None else w
    if n_steps_each is None:
        n_steps_each = jnp.full(lvl.shape, n_steps_max, jnp.int32)
    rp = ref_patch.reshape(ref_patch.shape[0], -1)
    rp = (rp - rp.mean(axis=-1, keepdims=True)).reshape(ref_patch.shape)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return _scan_pallas(stack, lvl, uv_a, uv_b, n_steps_each, rp,
                                n_steps_max, half, h, w)
    if _auto_backend(use_pallas) and "scan" not in _DISABLED:
        return _scan_pallas(stack, lvl, uv_a, uv_b, n_steps_each, rp,
                            n_steps_max, half, h, w)
    return _scan_fallback(stack, lvl, uv_a, uv_b, n_steps_each, rp,
                          n_steps_max, half, h, w)


# ---------------------------------------------------------------------------
# fused inverse-compositional LK alignment
# (ref feature_alignment.cpp:154-282 align2D + SSE2/NEON variants :286-576)
# ---------------------------------------------------------------------------

def _make_align_kernel(n_iter: int, half: int, h_true: int, w_true: int):
    p = 2 * half
    rows = _win_rows(p)

    def kernel(lvl_ref, uv_ref, valid_ref, hinv_ref, T_ref, gx_ref, gy_ref,
               stack_ref, out_ref):

        def one(i, _):
            _, hs, ws = stack_ref.shape
            l = jnp.clip(lvl_ref[i, 0], 0, stack_ref.shape[0] - 1)
            wl = (w_true >> l).astype(jnp.float32)
            hl = (h_true >> l).astype(jnp.float32)
            ok0 = valid_ref[i, 0] > 0
            m = jnp.float32(half + 1)

            # dead slots skip the whole iteration loop (and every window
            # load with it) — steady-state arenas are mostly invalid
            out_ref[i, 0] = uv_ref[i, 0]
            out_ref[i, 1] = uv_ref[i, 1]
            out_ref[i, 2] = 0.0
            out_ref[i, 3] = jnp.float32(jnp.inf)

            @pl.when(ok0)
            def _live():
                T = T_ref[i]
                gx = gx_ref[i]
                gy = gy_ref[i]

                def inb(u, v):
                    return ((u >= m) & (u < wl - 1 - m)
                            & (v >= m) & (v < hl - 1 - m))

                def sample(u, v):
                    x0f = jnp.floor(u)
                    y0f = jnp.floor(v)
                    wx = u - x0f
                    wy = v - y0f
                    xi = jnp.clip(x0f.astype(jnp.int32) - half, 0,
                                  ws - (p + 1))
                    yi = jnp.clip(y0f.astype(jnp.int32) - half, 0,
                                  hs - (p + 1))
                    win = _load_window(stack_ref, l, yi, xi, hs, ws, rows)
                    return _bilinear_crop(win, wx, wy, p)

                def solve(r):
                    g0 = jnp.sum(gx * r)
                    g1 = jnp.sum(gy * r)
                    g2 = jnp.sum(r)
                    u0 = (hinv_ref[i, 0] * g0 + hinv_ref[i, 1] * g1
                          + hinv_ref[i, 2] * g2)
                    u1 = (hinv_ref[i, 3] * g0 + hinv_ref[i, 4] * g1
                          + hinv_ref[i, 5] * g2)
                    u2 = (hinv_ref[i, 6] * g0 + hinv_ref[i, 7] * g1
                          + hinv_ref[i, 8] * g2)
                    return u0, u1, u2

                def body(carry):
                    it, u, v, mean, done = carry
                    ok = inb(u, v)
                    cur = sample(u, v)
                    r = cur - T + mean
                    u0, u1, u2 = solve(r)
                    u = jnp.where(ok, u - u0, u)
                    v = jnp.where(ok, v - u1, v)
                    mean = jnp.where(ok, mean - u2, mean)
                    # early break on convergence (ref feature_alignment.cpp:
                    # 276 `update.dot(update) < min_update_squared`) — the
                    # loop is serial per feature, so skipped iterations skip
                    # whole window loads
                    step2 = u0 * u0 + u1 * u1
                    done = (~ok) | (step2 < jnp.float32(MIN_UPDATE_SQUARED))
                    return (it + 1, u, v, mean, done)

                _, u, v, mean, _ = jax.lax.while_loop(
                    lambda c: (c[0] < n_iter) & ~c[4], body,
                    (jnp.int32(0), uv_ref[i, 0], uv_ref[i, 1],
                     jnp.float32(0.0), False))

                # final step-size probe for the convergence flag (the extra
                # evaluation after the loop, matching feature_align.align2d)
                ok = inb(u, v)
                cur = sample(u, v)
                r = cur - T + mean
                u0, u1, _ = solve(r)
                step2 = jnp.where(ok, u0 * u0 + u1 * u1, jnp.inf)
                out_ref[i, 0] = u
                out_ref[i, 1] = v
                out_ref[i, 2] = mean
                out_ref[i, 3] = step2

            return 0

        jax.lax.fori_loop(0, BLK, one, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_iter", "half", "h", "w"))
def _align_pallas(stack, lvl, T, gx, gy, hinv, uv0, valid, n_iter: int,
                  half: int, h: int, w: int):
    n = lvl.shape[0]
    npad = ((n + BLK - 1) // BLK) * BLK
    p = 2 * half
    L, hp, wp = stack.shape
    uv0 = jnp.nan_to_num(uv0, nan=0.0, posinf=0.0, neginf=0.0)
    out = pl.pallas_call(
        _make_align_kernel(n_iter, half, h, w),
        grid=(npad // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 9), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, hp, wp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, 4), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 4), jnp.float32),
    )(_pad_rows(lvl.astype(jnp.int32), npad)[:, None],
      _pad_rows(uv0, npad),
      _pad_rows(valid.astype(jnp.int32), npad)[:, None],
      _pad_rows(hinv.reshape(n, 9), npad),
      _pad_rows(T, npad), _pad_rows(gx, npad), _pad_rows(gy, npad), stack)
    return out[:n, :2], out[:n, 2], out[:n, 3]


def _align_fallback(stack, lvl, T, gx, gy, hinv, uv0, valid, n_iter: int,
                    half: int, h: int, w: int):
    n = lvl.shape[0]
    p = 2 * half
    area = p * p
    dtype = uv0.dtype
    Tf = T.reshape(n, area)
    J = jnp.stack([gx.reshape(n, area), gy.reshape(n, area),
                   jnp.ones((n, area), dtype)], axis=-1)     # (N, A, 3)
    lvl = jnp.clip(lvl.astype(jnp.int32), 0, stack.shape[0] - 1)
    wl = (w >> lvl).astype(dtype)
    hl = (h >> lvl).astype(dtype)
    m = half + 1.0

    def inb(uv):
        return ((uv[..., 0] >= m) & (uv[..., 0] < wl - 1 - m)
                & (uv[..., 1] >= m) & (uv[..., 1] < hl - 1 - m))

    def step(uv, mean):
        cur = _sample_fallback(stack, lvl, uv, half, False).reshape(n, area)
        r = cur - Tf + mean[:, None]
        g = jnp.einsum("nai,na->ni", J, r)
        return jnp.einsum("nij,nj->ni", hinv, g)

    def body(carry):
        it, uv, mean, done = carry
        ok = valid & inb(uv) & ~done
        upd = step(uv, mean)
        uv = jnp.where(ok[:, None], uv - upd[:, :2], uv)
        mean = jnp.where(ok, mean - upd[:, 2], mean)
        # per-feature freeze on convergence, matching the Pallas kernel's
        # early break (ref feature_alignment.cpp:276)
        step2 = jnp.sum(upd[:, :2] ** 2, axis=-1)
        done = done | ~inb(uv) | (step2 < MIN_UPDATE_SQUARED)
        return it + 1, uv, mean, done

    _, uv, mean, _ = jax.lax.while_loop(
        lambda c: (c[0] < n_iter) & ~jnp.all(c[3]), body,
        (jnp.int32(0), uv0, jnp.zeros((n,), dtype),
         jnp.zeros((n,), bool)))
    ok = valid & inb(uv)
    upd = step(uv, mean)
    step2 = jnp.where(ok, jnp.sum(upd[:, :2] ** 2, axis=-1), jnp.inf)
    return uv, mean, step2


# ref feature_alignment.cpp:276: min_update_squared = 0.03*0.03
MIN_UPDATE_SQUARED = 0.03 * 0.03


def align_iclk(stack, lvl, ref_patch, ref_dx, ref_dy, init_uv, valid,
               n_iter: int, h: int | None = None, w: int | None = None,
               use_pallas=None, interpret: bool = False):
    """Batched 2D inverse-compositional LK with mean-brightness term at
    per-feature pyramid level — the stack-native `align2D`.

    Returns (uv, converged, mean_diff) like feature_align.align2d; the
    Hessian is built from the reference patch gradients (IC cache) and the
    full iteration loop runs inside one Pallas program per feature.
    """
    L, hp, wp = stack.shape
    h = hp if h is None else h
    w = wp if w is None else w
    n, p, _ = ref_patch.shape
    area = p * p
    dtype = ref_patch.dtype
    gxf = ref_dx.reshape(n, area)
    gyf = ref_dy.reshape(n, area)
    ones = jnp.ones_like(gxf)
    J = jnp.stack([gxf, gyf, ones], axis=-1)
    H = jnp.einsum("nai,naj->nij", J, J) + 1e-6 * jnp.eye(3, dtype=dtype)
    hinv = inv_spd(H)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            uv, mean, step2 = _align_pallas(
                stack, lvl, ref_patch, ref_dx, ref_dy, hinv, init_uv, valid,
                n_iter, p // 2, h, w)
    elif _auto_backend(use_pallas) and "align" not in _DISABLED:
        uv, mean, step2 = _align_pallas(
            stack, lvl, ref_patch, ref_dx, ref_dy, hinv, init_uv, valid,
            n_iter, p // 2, h, w)
    else:
        uv, mean, step2 = _align_fallback(
            stack, lvl, ref_patch, ref_dx, ref_dy, hinv, init_uv, valid,
            n_iter, p // 2, h, w)

    drift = jnp.linalg.norm(uv - init_uv, axis=-1)
    converged = valid & (step2 < 4.0 * MIN_UPDATE_SQUARED) & (drift < p)
    return uv, converged, mean


# ---------------------------------------------------------------------------
# window dump + MXU one-hot ICLK (the fast feature_align formulation)
# ---------------------------------------------------------------------------
# The serial Pallas align kernel pays one aligned window load per ITERATION
# per feature; reformulated, each feature's window is loaded ONCE (this
# dump kernel) and the 8x8 bilinear resampling inside every ICLK iteration
# becomes two one-hot batched matmuls on the MXU (probed at ~2.3 ms for 10
# iterations over 768 features vs ~7 ms for the serial loop,
# scripts/probe_winmxu.py).  The reference analog is still align2D
# (feature_alignment.cpp:154-282) — same math, TPU-shaped schedule.

DUMP_WR = 32     # window rows: ICLK wander +-(16 - half - 2) around init
DUMP_WC = 64     # window cols


def _make_dump_kernel(wr: int, wc: int):
    rows = wr + 8    # aligned start <= 7 rows above + wr-row crop

    def kernel(lvl_ref, org_ref, valid_ref, stack_ref, out_ref):
        _, hs, ws = stack_ref.shape

        def one(i, _):
            out_ref[i] = jnp.zeros((wr, wc), out_ref.dtype)

            @pl.when(valid_ref[i, 0] > 0)
            def _live():
                l = jnp.clip(lvl_ref[i, 0], 0, stack_ref.shape[0] - 1)
                xi = org_ref[i, 0]
                yi = org_ref[i, 1]
                win = _load_window(stack_ref, l, yi, xi, hs, ws, rows)
                out_ref[i] = win[:wr, :wc]

            return 0

        jax.lax.fori_loop(0, BLK, one, 0)

    return kernel


@jax.jit
def _dump_pallas(stack, lvl, org, valid):
    n = lvl.shape[0]
    npad = ((n + BLK - 1) // BLK) * BLK
    L, hp, wp = stack.shape
    out = pl.pallas_call(
        _make_dump_kernel(DUMP_WR, DUMP_WC),
        grid=(npad // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((L, hp, wp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, DUMP_WR, DUMP_WC),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, DUMP_WR, DUMP_WC),
                                       stack.dtype),
    )(_pad_rows(lvl.astype(jnp.int32), npad)[:, None],
      _pad_rows(org.astype(jnp.int32), npad),
      _pad_rows(valid.astype(jnp.int32), npad)[:, None], stack)
    return out[:n]


def dump_windows(stack, lvl, uv, valid, use_pallas=None,
                 interpret: bool = False):
    """One (DUMP_WR, DUMP_WC) window per feature around integer(uv), plus
    the window origin (xi, yi) in level-pixel coords.  Pallas on TPU; the
    fallback gathers the same window with XLA dynamic slices."""
    L, hp, wp = stack.shape
    uv = jnp.nan_to_num(uv, nan=0.0, posinf=0.0, neginf=0.0)
    xi = jnp.clip(jnp.floor(uv[:, 0]).astype(jnp.int32) - DUMP_WC // 2,
                  0, wp - (DUMP_WC + 1))
    yi = jnp.clip(jnp.floor(uv[:, 1]).astype(jnp.int32) - DUMP_WR // 2,
                  0, hp - (DUMP_WR + 1))
    org = jnp.stack([xi, yi], axis=-1)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return _dump_pallas(stack, lvl, org, valid), org
    if _auto_backend(use_pallas) and "dump" not in _DISABLED:
        return _dump_pallas(stack, lvl, org, valid), org

    lvl_c = jnp.clip(lvl.astype(jnp.int32), 0, stack.shape[0] - 1)

    def one(l, y, x):
        return jax.lax.dynamic_slice(stack, (l, y, x),
                                     (1, DUMP_WR, DUMP_WC))[0]

    wins = jax.vmap(one)(lvl_c, yi, xi)
    return wins, org


def _onehot_patch(wins, u, v, p: int):
    """(N, p, p) bilinear patches centered at window coords (u, v) via two
    one-hot batched matmuls (separable axis-aligned bilinear)."""
    dtype = wins.dtype
    half = p // 2
    offs = jnp.arange(p, dtype=dtype) - half
    ys = v[:, None] + offs[None, :]                           # (N, p)
    xs = u[:, None] + offs[None, :]
    yi = jnp.floor(ys)
    xi = jnp.floor(xs)
    wy = ys - yi
    wx = xs - xi
    rr = jnp.arange(DUMP_WR, dtype=dtype)
    cc = jnp.arange(DUMP_WC, dtype=dtype)
    Rm = (jnp.where(rr[None, None] == yi[..., None], 1 - wy[..., None], 0)
          + jnp.where(rr[None, None] == yi[..., None] + 1,
                      wy[..., None], 0))                      # (N, p, WR)
    Cm = (jnp.where(cc[None, None] == xi[..., None], 1 - wx[..., None], 0)
          + jnp.where(cc[None, None] == xi[..., None] + 1,
                      wx[..., None], 0))                      # (N, p, WC)
    # HIGHEST precision: the default bf16 MXU passthrough costs ~14% of
    # convergences (one-hot weights lose 3 decimal digits); measured on
    # v5e: 1.7 -> 2.5 ms per 768x10 iters, conv 645 -> 751, and accuracy
    # BEATS the XLA-gather fallback on TPU (med err 0.0045 vs 0.0110 px)
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("nrc,nbc->nbr", wins, Cm, precision=hi,
                   preferred_element_type=jnp.float32)        # (N, p, WR)
    return jnp.einsum("nbr,nar->nab", t, Rm, precision=hi,
                      preferred_element_type=jnp.float32)     # (N, p, p)


def align_iclk_mxu(stack, lvl, ref_patch, ref_dx, ref_dy, init_uv, valid,
                   n_iter: int, h: int | None = None, w: int | None = None,
                   use_pallas=None, interpret: bool = False,
                   zmssd_factor: float | None = None,
                   min_patch_std: float | None = None):
    """align_iclk via window dump + one-hot MXU einsums.

    Same semantics as align_iclk/_align_fallback away from borders, plus
    the direct-match appearance gate computed inline from the final
    resample (no extra sample_patches dispatch): returns
    (uv, converged, mean) where `converged` already folds in the ZMSSD
    threshold (`zmssd_factor * area`) and the information floor
    (`min_patch_std`) when given.
    """
    L, hp, wp = stack.shape
    h = hp if h is None else h
    w = wp if w is None else w
    n, p, _ = ref_patch.shape
    area = p * p
    dtype = ref_patch.dtype
    gxf = ref_dx.reshape(n, area)
    gyf = ref_dy.reshape(n, area)
    ones = jnp.ones_like(gxf)
    J = jnp.stack([gxf, gyf, ones], axis=-1)
    H = jnp.einsum("nai,naj->nij", J, J) + 1e-6 * jnp.eye(3, dtype=dtype)
    hinv = inv_spd(H)

    init_uv = jnp.nan_to_num(init_uv, nan=0.0, posinf=0.0, neginf=0.0)
    wins, org = dump_windows(stack, lvl, init_uv, valid,
                             use_pallas=use_pallas, interpret=interpret)
    orgf = org.astype(dtype)

    lvl_c = jnp.clip(lvl.astype(jnp.int32), 0, stack.shape[0] - 1)
    wl = (w >> lvl_c).astype(dtype)
    hl = (h >> lvl_c).astype(dtype)
    m = p // 2 + 1.0
    # wander limit inside the dumped window (bilinear needs idx+1)
    wb = p // 2 + 2.0

    def inb(u, v):
        lvl_ok = ((u >= m) & (u < wl - 1 - m)
                  & (v >= m) & (v < hl - 1 - m))
        win_ok = ((u - orgf[:, 0] >= wb)
                  & (u - orgf[:, 0] < DUMP_WC - 1 - wb)
                  & (v - orgf[:, 1] >= wb)
                  & (v - orgf[:, 1] < DUMP_WR - 1 - wb))
        return lvl_ok & win_ok

    Tf = ref_patch

    def step(u, v, mean):
        cur = _onehot_patch(wins, u - orgf[:, 0], v - orgf[:, 1], p)
        r = cur - Tf + mean[:, None, None]
        g = jnp.stack([jnp.sum(ref_dx * r, axis=(1, 2)),
                       jnp.sum(ref_dy * r, axis=(1, 2)),
                       jnp.sum(r, axis=(1, 2))], axis=-1)
        return jnp.einsum("nij,nj->ni", hinv, g), cur

    def body(carry):
        it, u, v, mean, done = carry
        ok = valid & inb(u, v) & ~done
        upd, _ = step(u, v, mean)
        u = jnp.where(ok, u - upd[:, 0], u)
        v = jnp.where(ok, v - upd[:, 1], v)
        mean = jnp.where(ok, mean - upd[:, 2], mean)
        step2 = upd[:, 0] ** 2 + upd[:, 1] ** 2
        done = done | ~inb(u, v) | (step2 < MIN_UPDATE_SQUARED)
        return it + 1, u, v, mean, done

    u0 = init_uv[:, 0]
    v0 = init_uv[:, 1]
    _, u, v, mean, _ = jax.lax.while_loop(
        lambda c: (c[0] < n_iter) & ~jnp.all(c[4]), body,
        (jnp.int32(0), u0, v0, jnp.zeros((n,), dtype),
         jnp.zeros((n,), bool)))

    ok = valid & inb(u, v)
    upd, cur = step(u, v, mean)
    step2 = jnp.where(ok, upd[:, 0] ** 2 + upd[:, 1] ** 2, jnp.inf)
    uv = jnp.stack([u, v], axis=-1)
    drift = jnp.linalg.norm(uv - init_uv, axis=-1)
    converged = valid & (step2 < 4.0 * MIN_UPDATE_SQUARED) & (drift < p)

    # inline appearance gate (ops/matcher._zmssd_accept semantics) from
    # the final resample — free relative to a separate sample dispatch
    if zmssd_factor is not None or min_patch_std is not None:
        curf = cur.reshape(n, area)
        if zmssd_factor is not None:
            rz = Tf.reshape(n, area)
            rz = rz - rz.mean(axis=-1, keepdims=True)
            cz = curf - curf.mean(axis=-1, keepdims=True)
            score = jnp.sum((cz - rz) ** 2, axis=-1)
            converged = converged & (score < zmssd_factor * area)
        if min_patch_std is not None:
            converged = converged & (curf.std(axis=-1) >= min_patch_std)
    return uv, converged, mean
