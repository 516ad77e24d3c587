"""Microbenchmark of patch-gather strategies on the TPU.

The whole VO pipeline is built on bilinear patch sampling at scattered
coordinates (SURVEY.md §7 'hard parts' #3).  This script measures, on the
real device, the cost of each candidate primitive so the kernel design is
driven by data:

  1. per-dispatch overhead (tunneled TPU RPC + runtime)
  2. XLA advanced-indexing gather (what ops/interp.py does today)
  3. flattened 1-D take
  4. one-hot row/col matmul extraction (MXU-based gather)
  5. Pallas kernel: per-feature dynamic-slice window reads

Run:  python scripts/microbench_gather.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    H, W = 480, 640
    N = 2048          # seeds
    P = 8             # patch size
    A = P * P

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W), jnp.float32)
    uv = jnp.stack([
        jax.random.uniform(key, (N,), minval=10, maxval=W - 10),
        jax.random.uniform(key, (N,), minval=10, maxval=H - 10),
    ], axis=-1)

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    # 1. dispatch overhead
    @jax.jit
    def trivial(x):
        return x + 1.0

    t = timed(trivial, jnp.zeros((8,), jnp.float32), n=50)
    print(f"dispatch overhead (trivial jit call): {t*1e3:.3f} ms")

    # also: dispatch with a scalar device->host pull each call
    xdev = jnp.zeros((), jnp.float32)
    for _ in range(3):
        float(trivial(xdev))
    t0 = time.perf_counter()
    for _ in range(50):
        float(trivial(xdev))
    t = (time.perf_counter() - t0) / 50
    print(f"dispatch + scalar host pull:          {t*1e3:.3f} ms")

    # 2. advanced-indexing bilinear gather (current implementation)
    from android_svo_tpu.ops import interp

    @jax.jit
    def adv_gather(img, uv):
        return interp.extract_patches(img, uv, P // 2)

    t = timed(adv_gather, img, uv)
    print(f"XLA bilinear gather  (N={N}, {P}x{P}): {t*1e3:.3f} ms "
          f"-> {N*A*4/t/1e9:.2f} G loads/s")

    # 2b. the epi-scan shape: N x K candidate patches
    K = 100
    ts = jnp.linspace(0, 30, K)
    uvk = uv[:, None, :] + ts[None, :, None]

    @jax.jit
    def adv_gather_k(img, uvk):
        offs = interp.patch_offsets(P // 2)
        coords = uvk[:, :, None, :] + offs[None, None, :, :]
        return interp.bilinear_sample(img, coords)

    t = timed(adv_gather_k, img, uvk, n=5)
    print(f"XLA bilinear gather  (N={N}, K={K}, {P}x{P}): {t*1e3:.3f} ms "
          f"-> {N*K*A*4/t/1e9:.2f} G loads/s")

    # 3. flattened 1-D take (nearest neighbour, lower bound for 1-gather cost)
    flat = img.reshape(-1)

    @jax.jit
    def take1d(flat, uv):
        xi = uv[..., 0].astype(jnp.int32)
        yi = uv[..., 1].astype(jnp.int32)
        offs = interp.patch_offsets(P // 2)
        ox = offs[:, 0].astype(jnp.int32)
        oy = offs[:, 1].astype(jnp.int32)
        idx = (yi[:, None] + oy[None, :]) * W + (xi[:, None] + ox[None, :])
        return jnp.take(flat, idx)

    t = timed(take1d, flat, uv)
    print(f"1-D take, nearest    (N={N}, {P}x{P}): {t*1e3:.3f} ms "
          f"-> {N*A/t/1e9:.2f} G loads/s")

    # 4. one-hot matmul row extraction: rows (N*(P+1), H) @ img
    @jax.jit
    def onehot_rows(img, uv):
        y0 = jnp.floor(uv[..., 1]).astype(jnp.int32) - P // 2   # (N,)
        rows = y0[:, None] + jnp.arange(P + 1)[None, :]          # (N, P+1)
        oh = jax.nn.one_hot(rows.reshape(-1), H, dtype=jnp.float32)
        strips = oh @ img                                        # (N*(P+1), W)
        return strips

    t = timed(onehot_rows, img, uv, n=5)
    print(f"one-hot row matmul   (N={N}, {P+1} rows): {t*1e3:.3f} ms "
          f"-> {N*(P+1)*H*W*2/t/1e12:.2f} TFLOP/s")

    # 5. Pallas: per-feature dynamic-slice window + bilinear
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BLK = 8  # features per program

    def patch_kernel(uv_ref, img_ref, out_ref):
        def one(i, _):
            x = uv_ref[i, 0]
            y = uv_ref[i, 1]
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            wx = x - x0
            wy = y - y0
            xi = x0.astype(jnp.int32) - P // 2
            yi = y0.astype(jnp.int32) - P // 2
            win = img_ref[pl.ds(yi, P + 1), pl.ds(xi, P + 1)]   # (P+1,P+1)
            v00 = win[:P, :P]
            v01 = win[:P, 1:]
            v10 = win[1:, :P]
            v11 = win[1:, 1:]
            out_ref[i] = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
                          + wy * ((1 - wx) * v10 + wx * v11))
            return 0

        jax.lax.fori_loop(0, BLK, one, 0)

    @jax.jit
    def pallas_patches(img, uv):
        grid = (N // BLK,)
        return pl.pallas_call(
            patch_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, P, P), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, P, P), jnp.float32),
        )(uv, img)

    try:
        t = timed(pallas_patches, img, uv)
        print(f"Pallas window slice  (N={N}, {P}x{P}): {t*1e3:.3f} ms "
              f"-> {N/t/1e6:.2f} M patches/s")
        # correctness spot check
        a = np.asarray(adv_gather(img, uv))
        b = np.asarray(pallas_patches(img, uv))
        print(f"  max |err| vs XLA gather: {np.abs(a-b).max():.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"Pallas kernel failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
