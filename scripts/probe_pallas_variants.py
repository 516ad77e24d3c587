"""Probe cost structure of the Pallas patch kernel: which part is slow?

Variants:
  A. baseline: (16,256) load + row roll + col roll   (from probe_pallas_patch)
  B. unaligned lane offset: (16,128) load at (ya, xi) with xi arbitrary
  C. row-roll only: (16,256) aligned load, col crop via dynamic lane slice
  D. no rolls at all (wrong result, pure load+math cost floor)
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 8
BLK = 128


def make_kernel(variant: str):
    def kern(uv_ref, img_ref, out_ref):
        h, w = img_ref.shape

        def one(i, _):
            x = uv_ref[i, 0]
            y = uv_ref[i, 1]
            x0f = jnp.floor(x)
            y0f = jnp.floor(y)
            wx = x - x0f
            wy = y - y0f
            xi = x0f.astype(jnp.int32) - P // 2
            yi = y0f.astype(jnp.int32) - P // 2
            ya = pl.multiple_of(jnp.clip((yi // 8) * 8, 0, h - 16), 8)
            ry = yi - ya
            if variant == "B":
                xc = jnp.clip(xi, 0, w - 128)
                win = img_ref[pl.ds(ya, 16), pl.ds(xc, 128)]
                win = pltpu.roll(win, -ry, 0)
            elif variant == "C":
                xa = pl.multiple_of(jnp.clip((xi // 128) * 128, 0, w - 256),
                                    128)
                win = img_ref[pl.ds(ya, 16), pl.ds(xa, 256)]
                win = pltpu.roll(win, -ry, 0)
                win = win[:, : P + 1]  # wrong cols; cost probe only
            elif variant == "D":
                ya2 = pl.multiple_of(jnp.clip((yi // 8) * 8, 0, h - 16), 8)
                win = img_ref[pl.ds(ya2, 16), pl.ds(0, 128)]
            else:  # A
                xa = pl.multiple_of(jnp.clip((xi // 128) * 128, 0, w - 256),
                                    128)
                win = img_ref[pl.ds(ya, 16), pl.ds(xa, 256)]
                win = pltpu.roll(win, -ry, 0)
                win = pltpu.roll(win, -(xi - xa), 1)
            v00 = win[:P, :P]
            v01 = win[:P, 1:P + 1]
            v10 = win[1:P + 1, :P]
            v11 = win[1:P + 1, 1:P + 1]
            patch = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
                     + wy * ((1 - wx) * v10 + wx * v11))
            out_ref[i] = patch
            return 0

        jax.lax.fori_loop(0, BLK, one, 0)

    return kern


def build(variant, n, h, w):
    @jax.jit
    def fn(img, uv):
        return pl.pallas_call(
            make_kernel(variant),
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((h, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, P, P), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, P, P), jnp.float32),
        )(uv, img)

    return fn


def main():
    H, W = 480, 640
    N = 2048
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W), jnp.float32)
    k1, k2 = jax.random.split(key)
    uv = jnp.stack([
        jax.random.uniform(k1, (N,), minval=5.5, maxval=W - 6.5),
        jax.random.uniform(k2, (N,), minval=5.5, maxval=H - 6.5),
    ], axis=-1)

    for v in ["A", "B", "C", "D"]:
        try:
            fn = build(v, N, H, W)
            for _ in range(3):
                jax.block_until_ready(fn(img, uv))
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(img, uv)
            jax.block_until_ready(out)
            t = (time.perf_counter() - t0) / 20
            print(f"variant {v}: {t*1e3:.3f} ms "
                  f"({t/N*1e9:.0f} ns/patch, {N/t/1e6:.2f} M patches/s)")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:120]
            print(f"variant {v}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
