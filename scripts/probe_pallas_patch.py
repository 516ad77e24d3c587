"""Probe: Pallas patch extraction via aligned window loads + dynamic rolls.

Mosaic requires vector.load indices aligned to the (8, 128) tile, so we load
an aligned (16, 256) window around each patch and rotate it into place with
pltpu.roll (dynamic shift), then crop + bilinear.  This probes correctness
and throughput of the primitive underlying every VO kernel.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 8            # patch size
WIN_R = 16       # aligned window rows
WIN_C = 256      # aligned window cols
BLK = 128        # features per program


def _kernel(uv_ref, img_ref, out_ref):
    h, w = img_ref.shape

    def one(i, _):
        x = uv_ref[i, 0]
        y = uv_ref[i, 1]
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        wx = x - x0f
        wy = y - y0f
        xi = x0f.astype(jnp.int32) - P // 2        # top-left of (P+1)^2 patch
        yi = y0f.astype(jnp.int32) - P // 2
        xa = pl.multiple_of(jnp.clip((xi // 128) * 128, 0, w - WIN_C), 128)
        ya = pl.multiple_of(jnp.clip((yi // 8) * 8, 0, h - WIN_R), 8)
        win = img_ref[pl.ds(ya, WIN_R), pl.ds(xa, WIN_C)]
        win = pltpu.roll(win, -(yi - ya), 0)
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


@partial(jax.jit, static_argnames=())
def pallas_patches(img, uv):
    n = uv.shape[0]
    h, w = img.shape
    return pl.pallas_call(
        _kernel,
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

    import sys
    sys.path.insert(0, "/root/repo")
    from android_svo_tpu.ops import interp

    ref = jax.jit(lambda im, u: interp.extract_patches(im, u, P // 2))

    a = np.asarray(ref(img, uv)).reshape(N, P * P)
    b = np.asarray(pallas_patches(img, uv)).reshape(N, P * P)
    err = np.abs(a - b).max()
    print(f"max |err| vs XLA gather: {err:.2e}")

    for fn, name in [(pallas_patches, "pallas"), (ref, "xla-gather")]:
        for _ in range(3):
            jax.block_until_ready(fn(img, uv))
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(img, uv)
        jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / 20
        print(f"{name}: {t*1e3:.3f} ms -> {N/t/1e6:.2f} M patches/s")


if __name__ == "__main__":
    main()
