"""Microbench the matcher sub-pieces that dominate the stage table
(reproject 12.8 ms, depth_filter 13.9 ms on v5e): affine warp from the
keyframe arena, batched ICLK, epipolar scan, patch sampling.

Run on the real TPU:  python scripts/microbench_matcher.py
"""
from __future__ import annotations

import os
import sys
import time

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
    q = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {q:.3f} ms", flush=True)
    return q


def main():
    from android_svo_tpu.config import SVOConfig
    from android_svo_tpu.geometry.se3 import SE3
    from android_svo_tpu.ops import matcher
    from android_svo_tpu.ops import patch_pallas as pp
    from android_svo_tpu.ops.feature_align import patch_gradients

    cfg = SVOConfig()
    W, H = 640, 480
    K = cfg.max_n_kfs
    L = cfg.total_pyr_levels
    Hp, Wp = 480, 640
    C = (W // cfg.grid_size) * (H // cfg.grid_size)     # 768 cells
    S = cfg.max_seeds                                    # 2048 seeds
    key = jax.random.PRNGKey(0)
    kf_stack = jax.random.uniform(key, (K, L, Hp, Wp), jnp.float32) * 255
    cur_stack = jax.random.uniform(key, (L, Hp, Wp), jnp.float32) * 255

    from android_svo_tpu.geometry.camera import PinholeCamera
    cam = PinholeCamera.create(W, H, 420.0, 420.0, W / 2 - 0.5, H / 2 - 0.5)

    half = cfg.patch_halfsize
    print(f"# C={C} cells, S={S} seeds, K={K} kfs, stack {Hp}x{Wp}")

    def mk_feats(n):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        px = jnp.stack([
            jax.random.uniform(k1, (n,), jnp.float32, 40, W - 40),
            jax.random.uniform(k2, (n,), jnp.float32, 40, H - 40)], -1)
        f = cam.cam2world(px)
        depth = jax.random.uniform(k3, (n,), jnp.float32, 0.4, 0.7)
        lvl = jnp.zeros((n,), jnp.int32)
        kf = jax.random.randint(k1, (n,), 0, K)
        valid = jnp.ones((n,), bool)
        return px, f, depth, lvl, kf, valid

    T = SE3(q=jnp.array([1.0, 0, 0.002, 0.001]),
            t=jnp.array([0.004, 0.001, 0.0])).normalize()

    # ---- find_match_direct pieces at C=768 -------------------------------
    px, f, depth, lvl, kf, valid = mk_feats(C)

    warp_j = jax.jit(lambda px, f, d, lv: matcher.get_warp_matrix_affine(
        cam, px, f, d, T, lv, half))
    timeit("get_warp_matrix_affine(C)", warp_j, px, f, depth, lvl)
    A = warp_j(px, f, depth, lvl)
    slevel = matcher.get_best_search_level(A, 2)

    warp_stack_j = jax.jit(
        lambda A, px, lv, sl: matcher.warp_affine_stack(
            kf_stack, kf, A, px, lv, sl, half + 1, H, W))
    timeit("warp_affine_stack(C)", warp_stack_j, A, px, lvl, slevel)

    patch_b, okw = warp_stack_j(A, px, lvl, slevel)
    ref_patch, gx, gy = patch_gradients(patch_b)
    uv0 = px / (2.0 ** slevel.astype(jnp.float32))[:, None]

    align_j = jax.jit(lambda sl, rp, gx, gy, uv, v: pp.align_iclk(
        cur_stack[:3], sl, rp, gx, gy, uv, v, cfg.align_max_iter, H, W))
    timeit("align_iclk(C, 10 iters)", align_j, slevel, ref_patch, gx, gy,
           uv0, valid)

    full_j = jax.jit(lambda px, f, d, lv, v: matcher.find_match_direct(
        cur_stack, kf_stack, kf, cam, px, f, d, lv, T, px, v, cfg))
    timeit("find_match_direct(C)", full_j, px, f, depth, lvl, valid)

    # ---- depth-filter pieces at S=2048, ~64 live --------------------------
    pxs, fs, depths, lvls, kfs, _ = mk_feats(S)
    live = jnp.arange(S) < 64
    d_min = depths * 0.8
    d_max = depths * 1.25

    epi_j = jax.jit(lambda px, f, d, dn, dx, lv, v:
                    matcher.find_epipolar_match(
                        cur_stack, kf_stack, kfs, cam, px, f, lv, T,
                        d, dn, dx, v, cfg))
    timeit("find_epipolar_match(S, 64 live)", epi_j, pxs, fs, depths,
           d_min, d_max, lvls, live)
    timeit("find_epipolar_match(S, all live)", epi_j, pxs, fs, depths,
           d_min, d_max, lvls, jnp.ones((S,), bool))

    # sub-pieces of the epi path
    warp_stack_S = jax.jit(
        lambda A, px, lv, sl: matcher.warp_affine_stack(
            kf_stack, kfs, A, px, lv, sl, half + 1, H, W))
    A_S = jax.jit(lambda px, f, d, lv: matcher.get_warp_matrix_affine(
        cam, px, f, d, T, lv, half))(pxs, fs, depths, lvls)
    sl_S = matcher.get_best_search_level(A_S, 2)
    timeit("warp_affine_stack(S)", warp_stack_S, A_S, pxs, lvls, sl_S)

    n_steps = jnp.where(live, 20, 0).astype(jnp.int32)
    rp_S, _ = warp_stack_S(A_S, pxs, lvls, sl_S)
    rp_S = rp_S[:, 1:-1, 1:-1]
    uv_a = pxs / 2.0
    uv_b = uv_a + 7.0
    scan_j = jax.jit(lambda ua, ub, rp, ns: pp.epi_scan(
        cur_stack[:3], sl_S, ua, ub, rp,
        n_steps_max=cfg.max_epi_search_steps, half=half, n_steps_each=ns,
        h=H, w=W))
    timeit("epi_scan(S, 64 live x20 steps)", scan_j, uv_a, uv_b, rp_S,
           n_steps)

    # raw sampling for reference
    samp_j = jax.jit(lambda uv, v: pp.sample_patches(
        cur_stack[:3], jnp.zeros((C,), jnp.int32), uv, half, valid=v))
    timeit("sample_patches(C)", samp_j, px, valid)


if __name__ == "__main__":
    main()
