"""Probe: can the affine patch warp and ICLK alignment be reformulated as
window extraction + one-hot bilinear einsums (MXU) faster than the current
XLA pointwise gather / serial Pallas loops?

  (a) current warp_affine_stack(C=768) from the (K,L,Hp,Wp) arena
  (b) window dump (768,24,32) via vmap(dynamic_slice) from the merged arena
  (c) one-hot bilinear einsum warp given windows
  (d) b+c fused end-to-end
  (e) 10-iteration ICLK on one-hot einsums over dumped windows
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from android_svo_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(jax.tree_util.tree_leaves(outs[-1])[0])
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms", flush=True)


def main():
    from android_svo_tpu.config import SVOConfig
    from android_svo_tpu.geometry.se3 import SE3
    from android_svo_tpu.geometry.camera import PinholeCamera
    from android_svo_tpu.ops import matcher

    cfg = SVOConfig()
    W, H = 640, 480
    K, L = cfg.max_n_kfs, cfg.total_pyr_levels
    Hp, Wp = 480, 640
    C = 768
    key = jax.random.PRNGKey(0)
    kf_stack = jax.random.uniform(key, (K, L, Hp, Wp), jnp.float32) * 255
    merged = kf_stack.reshape(K * L, Hp, Wp)
    cam = PinholeCamera.create(W, H, 420.0, 420.0, W / 2 - 0.5, H / 2 - 0.5)
    half = cfg.patch_halfsize

    k1, k2, k3 = jax.random.split(key, 3)
    px = jnp.stack([jax.random.uniform(k1, (C,), jnp.float32, 40, W - 40),
                    jax.random.uniform(k2, (C,), jnp.float32, 40, H - 40)],
                   -1)
    f = cam.cam2world(px)
    depth = jax.random.uniform(k3, (C,), jnp.float32, 0.4, 0.7)
    lvl = jnp.zeros((C,), jnp.int32)
    kf = jax.random.randint(k1, (C,), 0, K)
    T = SE3(q=jnp.array([1.0, 0, 0.002, 0.001]),
            t=jnp.array([0.004, 0.001, 0.0])).normalize()
    A = matcher.get_warp_matrix_affine(cam, px, f, depth, T, lvl, half)
    slevel = matcher.get_best_search_level(A, 2)

    # (a) current
    wa = jax.jit(lambda A, px, lv, sl: matcher.warp_affine_stack(
        kf_stack, kf, A, px, lv, sl, half + 1, H, W))
    timeit("(a) warp_affine_stack gather", wa, A, px, lvl, slevel)

    WR, WC = 24, 32

    def dump(plane_idx, y0, x0):
        def one(p, y, x):
            return jax.lax.dynamic_slice(merged[p], (y, x), (WR, WC))
        return jax.vmap(one)(plane_idx, y0, x0)

    plane = kf * L + lvl
    y0 = jnp.clip(px[:, 1].astype(jnp.int32) - WR // 2, 0, Hp - WR)
    x0 = jnp.clip(px[:, 0].astype(jnp.int32) - WC // 2, 0, Wp - WC)
    dj = jax.jit(dump)
    timeit("(b) window dump vmap-dynslice", dj, plane, y0, x0)

    # (c) one-hot einsum warp: 100 arbitrary bilinear samples per feature
    P2 = (2 * (half + 1)) ** 2  # 100 samples

    def onehot_warp(wins, ys, xs):
        # ys, xs: (C, P2) fractional positions inside the window
        yi = jnp.floor(ys)
        xi = jnp.floor(xs)
        wy = ys - yi
        wx = xs - xi
        rr = jnp.arange(WR, dtype=jnp.float32)
        cc = jnp.arange(WC, dtype=jnp.float32)
        Rm = (jnp.where(rr[None, None] == yi[..., None], 1 - wy[..., None], 0)
              + jnp.where(rr[None, None] == yi[..., None] + 1,
                          wy[..., None], 0))                      # (C,P2,WR)
        Cm = (jnp.where(cc[None, None] == xi[..., None], 1 - wx[..., None], 0)
              + jnp.where(cc[None, None] == xi[..., None] + 1,
                          wx[..., None], 0))                      # (C,P2,WC)
        t = jnp.einsum("nrc,nac->nar", wins, Cm,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("nar,nar->na", t, Rm)

    ys = jax.random.uniform(k1, (C, P2), jnp.float32, 2, WR - 3)
    xs = jax.random.uniform(k2, (C, P2), jnp.float32, 2, WC - 3)
    oj = jax.jit(onehot_warp)
    wins = dj(plane, y0, x0)
    timeit("(c) one-hot einsum warp", oj, wins, ys, xs)

    both = jax.jit(lambda p, y, x, ys, xs: onehot_warp(dump(p, y, x), ys, xs))
    timeit("(d) dump+warp fused", both, plane, y0, x0, ys, xs)

    # (e) 10-iteration ICLK via one-hot einsums on dumped windows
    p = 2 * half
    A2 = p * p

    def iclk(wins, uv0, Tref, gx, gy, hinv):
        offs_y = jnp.arange(p, dtype=jnp.float32) - half
        offs_x = jnp.arange(p, dtype=jnp.float32) - half

        def body(it, carry):
            u, v, mean = carry
            ys = v[:, None] + offs_y[None, :]                    # (C,p)
            xs = u[:, None] + offs_x[None, :]
            yi = jnp.floor(ys); wyf = ys - yi
            xi = jnp.floor(xs); wxf = xs - xi
            rr = jnp.arange(WR, dtype=jnp.float32)
            cc = jnp.arange(WC, dtype=jnp.float32)
            Rm = (jnp.where(rr[None, None] == yi[..., None],
                            1 - wyf[..., None], 0)
                  + jnp.where(rr[None, None] == yi[..., None] + 1,
                              wyf[..., None], 0))                # (C,p,WR)
            Cm = (jnp.where(cc[None, None] == xi[..., None],
                            1 - wxf[..., None], 0)
                  + jnp.where(cc[None, None] == xi[..., None] + 1,
                              wxf[..., None], 0))                # (C,p,WC)
            # separable axis-aligned grid: rows x cols tensor product
            t = jnp.einsum("nrc,nbc->nbr", wins, Cm,
                           preferred_element_type=jnp.float32)   # (C,p,WR)
            cur = jnp.einsum("nbr,nar->nab", t, Rm,
                             preferred_element_type=jnp.float32) # (C,p,p)
            r = cur - Tref + mean[:, None, None]
            g0 = jnp.sum(gx * r, axis=(1, 2))
            g1 = jnp.sum(gy * r, axis=(1, 2))
            g2 = jnp.sum(r, axis=(1, 2))
            g = jnp.stack([g0, g1, g2], -1)
            upd = jnp.einsum("nij,nj->ni", hinv, g)
            return (u - upd[:, 0], v - upd[:, 1], mean - upd[:, 2])

        u, v, mean = jax.lax.fori_loop(
            0, 10, body, (uv0[:, 0], uv0[:, 1], jnp.zeros((C,))))
        return u, v, mean

    uv0 = jnp.stack([jnp.full((C,), WC / 2.0), jnp.full((C,), WR / 2.0)], -1)
    Tref = jax.random.uniform(k1, (C, p, p))
    gxr = jax.random.uniform(k2, (C, p, p))
    gyr = jax.random.uniform(k3, (C, p, p))
    hinv = jnp.tile(jnp.eye(3) * 0.01, (C, 1, 1))
    ij = jax.jit(iclk)
    timeit("(e) 10-iter einsum ICLK", ij, wins, uv0, Tref, gxr, gyr, hinv)

    # (f) align end to end: dump from cur stack + iclk
    cur_merged = merged[:L]
    def align_e2e(p_, y, x, uv0, Tref, gx, gy, hinv):
        def one(pp, yy, xx):
            return jax.lax.dynamic_slice(cur_merged[pp], (yy, xx), (WR, WC))
        wins = jax.vmap(one)(p_, y, x)
        return iclk(wins, uv0, Tref, gx, gy, hinv)
    fj = jax.jit(align_e2e)
    timeit("(f) dump+ICLK fused", fj, lvl, y0, x0, uv0, Tref, gxr, gyr,
           hinv)


if __name__ == "__main__":
    main()
