"""Time the production Pallas kernels on the real TPU."""

import time

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from android_svo_tpu.ops import patch_pallas as pp
from android_svo_tpu.ops.pyramid import build_stack


def timed(fn, *args, n=20):
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    H, W, L = 480, 640, 5
    img = jax.random.uniform(jax.random.PRNGKey(0), (H, W), jnp.float32)
    stack = build_stack(img, L)

    for n, half, grad in [(2048, 4, False), (2048, 4, True), (768, 4, True),
                          (1200, 2, True)]:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(n), 3)
        lvl = jax.random.randint(k3, (n,), 0, 3)
        uv = jnp.stack([
            jax.random.uniform(k1, (n,), minval=8, maxval=100),
            jax.random.uniform(k2, (n,), minval=8, maxval=50),
        ], axis=-1)
        fn = jax.jit(lambda s, l, u: pp.sample_patches(
            s, l, u, half, grad, use_pallas=True))
        t = timed(fn, stack, lvl, uv)
        print(f"sample_patches n={n} half={half} grad={grad}: "
              f"{t*1e3:.3f} ms ({t/n*1e9:.0f} ns/patch)")

    for n, k in [(2048, 32), (2048, 16), (512, 32)]:
        k1, k2 = jax.random.split(jax.random.PRNGKey(7), 2)
        lvl = jnp.zeros((n,), jnp.int32)
        uv_a = jnp.stack([
            jax.random.uniform(k1, (n,), minval=20, maxval=600),
            jax.random.uniform(k2, (n,), minval=20, maxval=440),
        ], axis=-1)
        uv_b = uv_a + 24.0
        ref = jax.random.uniform(jax.random.PRNGKey(9), (n, 8, 8))
        fn = jax.jit(lambda s, l, a, b, r: pp.epi_scan(
            s, l, a, b, r, n_steps=k, half=4, use_pallas=True))
        t = timed(fn, stack, lvl, uv_a, uv_b, ref)
        print(f"epi_scan n={n} K={k}: {t*1e3:.3f} ms "
              f"({t/(n*k)*1e9:.0f} ns/candidate)")


if __name__ == "__main__":
    main()
