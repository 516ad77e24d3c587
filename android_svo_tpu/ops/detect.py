"""Feature detection: whole-image Shi-Tomasi + vectorized FAST with
grid-cell non-max selection — TPU replacement for the reference's
`FastDetector::detect` (`feature_detection.cpp:77-122`, which delegates to
`cv::FAST` at :91 and scores with `vk::shiTomasiScore` at :107) and the
occupancy masking of existing features (`feature_detection.cpp:47-64`).

Design: instead of per-corner scalar loops, compute dense per-level score
maps with elementwise VPU math, then reduce each grid cell to its best corner
with reshape-max (one feature per cell → uniform coverage, exactly the
reference's grid policy). Detection runs once per keyframe, so dense compute
is cheap and XLA-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig

# radius-3 Bresenham circle used by FAST, (x, y) offsets in ring order
FAST_RING = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
EDGE_MARGIN = 8  # keep-out border so patches around corners stay in-bounds
                 # (ref feature_detection.cpp uses border given by patch needs)


def _box_sum(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable box filter via cumulative sums (same-size output, zero pad)."""
    half = size // 2
    for axis in (-2, -1):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (half + 1, half)
        xp = jnp.pad(x, pad)
        c = jnp.cumsum(xp, axis=axis)
        hi = jnp.take(c, jnp.arange(size, size + x.shape[axis]), axis=axis)
        lo = jnp.take(c, jnp.arange(0, x.shape[axis]), axis=axis)
        x = hi - lo
    return x


def shi_tomasi_score_map(img: jnp.ndarray) -> jnp.ndarray:
    """Dense min-eigenvalue corner score, same constants as
    `vk::shiTomasiScore` (`vision.cpp:113-154`): dx = I(x+1)-I(x-1),
    8x8 box window, normalization 1/(2*box_area)."""
    dx = jnp.zeros_like(img).at[:, 1:-1].set(img[:, 2:] - img[:, :-2])
    dy = jnp.zeros_like(img).at[1:-1, :].set(img[2:, :] - img[:-2, :])
    box = 8
    dxx = _box_sum(dx * dx, box) / (2.0 * box * box)
    dyy = _box_sum(dy * dy, box) / (2.0 * box * box)
    dxy = _box_sum(dx * dy, box) / (2.0 * box * box)
    tr = dxx + dyy
    det_term = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * (dxx * dyy - dxy * dxy),
                                    0.0))
    return 0.5 * (tr - det_term)


def fast_corner_mask(img: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """FAST-9/16 segment test, fully vectorized: 16 ring-shifted copies,
    circular run-length-9 detection by shift-AND reduction.

    Replaces `cv::FAST` (ref feature_detection.cpp:91). Borders (3 px) are
    invalid (circular shifts wrap) and masked off.
    """
    center = img
    ring = jnp.stack(
        [jnp.roll(img, shift=(-dy, -dx), axis=(0, 1)) for dx, dy in FAST_RING],
        axis=0)                                            # (16, H, W)
    bright = ring > center[None] + thresh
    dark = ring < center[None] - thresh

    def has_run9(m):
        r2 = m & jnp.roll(m, -1, axis=0)
        r4 = r2 & jnp.roll(r2, -2, axis=0)
        r8 = r4 & jnp.roll(r4, -4, axis=0)
        r9 = r8 & jnp.roll(m, -8, axis=0)
        return jnp.any(r9, axis=0)

    corner = has_run9(bright) | has_run9(dark)
    h, w = img.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    border_ok = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return corner & border_ok


def _mask_margin(score: jnp.ndarray, margin: int) -> jnp.ndarray:
    h, w = score.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    ok = (yy >= margin) & (yy < h - margin) & (xx >= margin) & (xx < w - margin)
    return jnp.where(ok, score, 0.0)


def grid_shape(h: int, w: int, cell: int) -> tuple[int, int]:
    return (h + cell - 1) // cell, (w + cell - 1) // cell


# feature types (ref feature.h:31 FeatureType {CORNER, EDGELET})
FTYPE_CORNER = 0
FTYPE_EDGELET = 1


def _cell_reduce(score_map, n_rows, n_cols, gl):
    """Per-cell (max, argmax-y, argmax-x) of a level score map padded to the
    cell grid."""
    cells = score_map.reshape(n_rows, gl, n_cols, gl).transpose(0, 2, 1, 3)
    cells = cells.reshape(n_rows, n_cols, gl * gl)
    cmax = cells.max(axis=-1)
    carg = cells.argmax(axis=-1)
    return cmax, carg // gl, carg % gl


def detect_features(pyr, occupied_cells: jnp.ndarray | None,
                    cfg: SVOConfig, n_levels: int | None = None):
    """Best corner per grid cell across pyramid levels; optionally falls
    back to an EDGELET (strong-gradient pixel + direction) in cells with no
    corner (ref feature.h:31 CORNER/EDGELET — latent in the reference,
    which only ever creates corners; enabled here via
    `cfg.edgelet_detection`).

    Args:
      pyr: tuple of (H/2^l, W/2^l) images, level 0 first.
      occupied_cells: (n_cells,) bool — cells already holding a tracked
        feature are suppressed (ref setGridOccpuancy/setExistingFeatures).
      cfg: static config (grid_size must be divisible by 2^(n_levels-1)).

    Returns dict with per-cell arrays (n_cells = n_rows * n_cols):
      px (n_cells, 2) level-0 float pixel coords, level (n_cells,) int32,
      score (n_cells,) f32, valid (n_cells,) bool,
      ftype (n_cells,) int32 FTYPE_*, grad (n_cells, 2) unit gradient
      direction (meaningful for edgelets; zeros otherwise).
    """
    n_levels = n_levels if n_levels is not None else cfg.n_pyr_levels
    h, w = pyr[0].shape
    g = cfg.grid_size
    assert g % (2 ** (n_levels - 1)) == 0, (
        "grid_size must be divisible by 2^(n_levels-1) for reshape NMS")
    n_rows, n_cols = grid_shape(h, w, g)
    n_cells = n_rows * n_cols
    dtype = pyr[0].dtype

    best_score = jnp.full((n_levels, n_rows, n_cols), -1.0, dtype)
    best_xy = jnp.zeros((n_levels, n_rows, n_cols, 2), dtype)
    eg_score = jnp.full((n_levels, n_rows, n_cols), -1.0, dtype)
    eg_xy = jnp.zeros((n_levels, n_rows, n_cols, 2), dtype)
    eg_dir = jnp.zeros((n_levels, n_rows, n_cols, 2), dtype)

    for level in range(n_levels):
        img = pyr[level]
        hl, wl = img.shape
        gl = g // (2 ** level)
        ph, pw = n_rows * gl, n_cols * gl
        scale = float(2 ** level)

        score = shi_tomasi_score_map(img)
        score = jnp.where(fast_corner_mask(img, cfg.fast_threshold), score, 0.0)
        score = _mask_margin(score, EDGE_MARGIN)
        score = jnp.pad(score, ((0, ph - hl), (0, pw - wl)),
                        constant_values=0.0)
        cmax, yl, xl = _cell_reduce(score, n_rows, n_cols, gl)
        cy = jnp.arange(n_rows)[:, None] * gl + yl
        cx = jnp.arange(n_cols)[None, :] * gl + xl
        best_score = best_score.at[level].set(cmax)
        best_xy = best_xy.at[level].set(
            jnp.stack([cx.astype(dtype) * scale,
                       cy.astype(dtype) * scale], axis=-1))

        if cfg.edgelet_detection:
            # strong-gradient fallback (upstream SVO's edge detector: max
            # |grad| pixel per cell, direction = image gradient normal)
            dx = jnp.zeros_like(img).at[:, 1:-1].set(img[:, 2:] - img[:, :-2])
            dy = jnp.zeros_like(img).at[1:-1, :].set(img[2:, :] - img[:-2, :])
            # central differences span 2 px: x0.5 so the squared magnitude
            # is in true per-pixel gradient units and `edgelet_grad_min`
            # thresholds |grad|, not |grad|/2
            gmag = _mask_margin(0.25 * (dx * dx + dy * dy), EDGE_MARGIN)
            gmag = jnp.pad(gmag, ((0, ph - hl), (0, pw - wl)),
                           constant_values=0.0)
            emax, eyl, exl = _cell_reduce(gmag, n_rows, n_cols, gl)
            ey = jnp.arange(n_rows)[:, None] * gl + eyl
            ex = jnp.arange(n_cols)[None, :] * gl + exl
            eyc = jnp.clip(ey, 0, hl - 1)
            exc = jnp.clip(ex, 0, wl - 1)
            gdx = dx[eyc, exc]
            gdy = dy[eyc, exc]
            norm = jnp.sqrt(jnp.maximum(gdx * gdx + gdy * gdy, 1e-12))
            eg_score = eg_score.at[level].set(emax)
            eg_xy = eg_xy.at[level].set(
                jnp.stack([ex.astype(dtype) * scale,
                           ey.astype(dtype) * scale], axis=-1))
            eg_dir = eg_dir.at[level].set(
                jnp.stack([gdx / norm, gdy / norm], axis=-1))

    lvl = jnp.argmax(best_score, axis=0)                    # (n_rows, n_cols)
    score = jnp.max(best_score, axis=0)
    xy = jnp.take_along_axis(
        best_xy, jnp.broadcast_to(lvl[None, :, :, None],
                                  (1, n_rows, n_cols, 2)), axis=0)[0]

    score = score.reshape(n_cells)
    xy = xy.reshape(n_cells, 2)
    lvl = lvl.reshape(n_cells).astype(jnp.int32)
    valid = score > cfg.triang_min_corner_score
    ftype = jnp.zeros((n_cells,), jnp.int32)
    grad = jnp.zeros((n_cells, 2), dtype)

    if cfg.edgelet_detection:
        elvl = jnp.argmax(eg_score, axis=0)
        escore = jnp.max(eg_score, axis=0)
        take = lambda a: jnp.take_along_axis(  # noqa: E731
            a, jnp.broadcast_to(elvl[None, :, :, None],
                                (1,) + a.shape[1:]), axis=0)[0]
        exy = take(eg_xy).reshape(n_cells, 2)
        edir = take(eg_dir).reshape(n_cells, 2)
        escore = escore.reshape(n_cells)
        elvl = elvl.reshape(n_cells).astype(jnp.int32)
        # edgelet only where no corner qualifies (corner wins, ref upstream
        # detector ordering) and the gradient is strong enough
        is_edge = ~valid & (escore > cfg.edgelet_grad_min ** 2)
        xy = jnp.where(is_edge[:, None], exy, xy)
        lvl = jnp.where(is_edge, elvl, lvl)
        score = jnp.where(is_edge, escore, score)
        ftype = jnp.where(is_edge, FTYPE_EDGELET, ftype)
        grad = jnp.where(is_edge[:, None], edir, grad)
        valid = valid | is_edge

    if occupied_cells is not None:
        valid = valid & ~occupied_cells
    if n_cells > cfg.max_fts:
        # feature budget (ref config.cpp:82 max_fts): keep only the
        # best-scoring max_fts cells when the grid offers more.  Corner and
        # edgelet scores are incommensurate units (Shi-Tomasi eigenvalue vs
        # squared gradient), so corners rank strictly above edgelets —
        # edgelets only consume budget corners left unused.  Lexicographic
        # argsort (valid > corner > score, index as final tiebreak) keeps
        # EXACTLY max_fts cells — a float class-bias key (score + 1e9)
        # quantized scores to 64 ulp and kept whole tie bands (ADVICE r4
        # #2).
        corner = (ftype == FTYPE_CORNER).astype(jnp.int32)
        order = jnp.lexsort((-score, -corner, ~valid))
        keep = jnp.zeros((n_cells,), bool).at[order[:cfg.max_fts]].set(True)
        valid = valid & keep
    return {"px": xy, "level": lvl, "score": score, "valid": valid,
            "ftype": ftype, "grad": grad}


def cell_index(px: jnp.ndarray, w: int, cell: int, n_cols: int) -> jnp.ndarray:
    """Grid-cell id of level-0 pixel coords (ref reprojector grid addressing)."""
    cx = (px[..., 0] // cell).astype(jnp.int32)
    cy = (px[..., 1] // cell).astype(jnp.int32)
    return cy * n_cols + cx
