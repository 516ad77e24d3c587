"""Small dense SPD solves without `jnp.linalg` — Cholesky factorizations
written directly in elementwise jnp ops.

Why this module exists: every normal-equation solve in the tracker is a
tiny SPD system (2x2 ICLK Hessians, 3x3 point/alignment Hessians, 6x6 pose
Hessians, ~30x30 reduced camera systems in local BA — the same systems the
reference hands to Eigen's LDLT, `sparse_img_align.cpp:291`,
`pose_optimizer.cpp:105`, `point.cpp:159`).  `jnp.linalg.solve/inv` lower
through LAPACK-style LU custom lowerings that (a) are overkill for d<=6
SPD systems on a batch axis and (b) cost ~13 s of backend lowering PER
DISTINCT SHAPE on the axon TPU plugin (measured: `lower solve6 = 13.3 s`,
explicit Cholesky = milliseconds) — with ~20 such shapes in the fused
tracking step that was ~5 minutes of per-process startup.  An unrolled
Cholesky is also the faster *runtime* choice: pure VPU elementwise math,
no general pivoting.

All functions operate on the LAST TWO axes and broadcast over leading batch
axes.  `d` must be static.  Inputs are assumed symmetric positive
(semi-)definite — exactly what J^T J + damping produces; a tiny floor on
the pivots makes singular systems return finite (if meaningless) results,
which callers mask exactly like they already mask invalid slots.
"""

from __future__ import annotations

import jax.numpy as jnp

_PIVOT_FLOOR = 1e-20


def _chol_unrolled(H: jnp.ndarray):
    """Lower-triangular Cholesky factor components of (..., d, d) SPD H.

    Returns a d x d list-of-lists `L` with L[i][j] (i >= j) as (...)-shaped
    arrays; upper entries are None.  Fully unrolled at trace time (d <= ~8).
    """
    d = H.shape[-1]
    L = [[None] * d for _ in range(d)]
    for j in range(d):
        s = H[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, _PIVOT_FLOOR))
        inv_ljj = 1.0 / L[j][j]
        for i in range(j + 1, d):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_ljj
    return L


def _chol_solve_cols(L, b_cols):
    """Solve L L^T x = b for a list of column vectors, each a list of d
    (...)-shaped arrays.  Returns same structure."""
    d = len(L)
    outs = []
    for b in b_cols:
        # forward: L y = b
        y = [None] * d
        for i in range(d):
            s = b[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        # backward: L^T x = y
        x = [None] * d
        for i in reversed(range(d)):
            s = y[i]
            for k in range(i + 1, d):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        outs.append(x)
    return outs


def solve_spd(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """x with H x = g for SPD H: (..., d, d) @ (..., d) -> (..., d).

    Drop-in for `jnp.linalg.solve` on normal equations (d static, <= ~8:
    fully unrolled elementwise Cholesky)."""
    d = H.shape[-1]
    L = _chol_unrolled(H)
    (x,) = _chol_solve_cols(L, [[g[..., i] for i in range(d)]])
    return jnp.stack(x, axis=-1)


def inv_spd(H: jnp.ndarray) -> jnp.ndarray:
    """Inverse of SPD (..., d, d) via Cholesky column solves — drop-in for
    `jnp.linalg.inv` on Hessians/covariances."""
    d = H.shape[-1]
    L = _chol_unrolled(H)
    shape = H.shape[:-2]
    dtype = H.dtype
    one = jnp.ones(shape, dtype)
    zero = jnp.zeros(shape, dtype)
    cols = [[one if i == j else zero for i in range(d)] for j in range(d)]
    xs = _chol_solve_cols(L, cols)
    # xs[j][i] = (H^-1)[i, j]
    return jnp.stack([jnp.stack(col, axis=-1) for col in xs], axis=-1)


def det2x2(A: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., 2, 2)."""
    return (A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0])


def inv2x2(A: jnp.ndarray, det=None) -> jnp.ndarray:
    """Closed-form inverse of (..., 2, 2) (general, not just SPD)."""
    if det is None:
        det = det2x2(A)
    inv_det = 1.0 / det
    row0 = jnp.stack([A[..., 1, 1] * inv_det, -A[..., 0, 1] * inv_det],
                     axis=-1)
    row1 = jnp.stack([-A[..., 1, 0] * inv_det, A[..., 0, 0] * inv_det],
                     axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def solve_spd_loop(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Cholesky solve for a single larger SPD system (d up to ~100) with an
    O(d)-size graph: masked right-looking factorization + substitution,
    one `fori_loop` each.  Used by local BA's reduced camera system
    (NC*6 x NC*6) where full unrolling would bloat the trace."""
    import jax

    d = H.shape[-1]
    dtype = H.dtype
    idx = jnp.arange(d)

    # Jacobi preconditioning: factor D^-1/2 H D^-1/2 instead of H.  Schur
    # systems mix wildly different row scales when a near-degenerate
    # landmark leaks huge J^T J contributions into one camera block; in f32
    # on TPU the raw factorization then NaNs (inf - inf in the rank-1
    # updates).  Normalizing to a unit diagonal keeps every pivot O(1).
    diag = jnp.diagonal(H)
    dinv = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(diag), _PIVOT_FLOOR))
    H = H * dinv[:, None] * dinv[None, :]
    g = g * dinv

    def chol_body(j, M):
        pivot = jnp.sqrt(jnp.maximum(M[j, j], _PIVOT_FLOOR))
        col = M[:, j] / pivot
        col = jnp.where(idx >= j, col, 0.0)        # L column j (diag incl.)
        # rank-1 update of the trailing submatrix rows/cols > j
        outer = col[:, None] * col[None, :]
        trail = (idx[:, None] > j) & (idx[None, :] > j)
        M = jnp.where(trail, M - outer, M)
        # write the finished column into place (strictly j-th column)
        M = M.at[:, j].set(jnp.where(idx >= j, col, M[:, j]))
        return M

    L = jax.lax.fori_loop(0, d, chol_body, H.astype(dtype))

    def fwd_body(i, y):
        # y holds solved entries below i, zeros elsewhere
        li = jnp.where(idx < i, L[i, :], 0.0)
        yi = (g[i] - jnp.dot(li, y)) / L[i, i]
        return y.at[i].set(yi)

    y = jax.lax.fori_loop(0, d, fwd_body, jnp.zeros((d,), dtype))

    def bwd_body(k, x):
        i = d - 1 - k
        ci = jnp.where(idx > i, L[:, i], 0.0)      # L^T row i = L column i
        xi = (y[i] - jnp.dot(ci, x)) / L[i, i]
        return x.at[i].set(xi)

    x = jax.lax.fori_loop(0, d, bwd_body, jnp.zeros((d,), dtype))
    return x * dinv                                # undo preconditioning
