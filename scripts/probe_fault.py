"""Isolate which Pallas kernel faults the TPU at VGA scale.

Usage: python scripts/probe_fault.py <case>
Cases run one kernel each at the exact shapes the VGA pipeline uses; a
kernel fault kills the process, identifying the culprit.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from android_svo_tpu.ops import patch_pallas as pp
from android_svo_tpu.ops.pyramid import build_stack
from android_svo_tpu.ops.sparse_align import level_substack

W, H = 640, 480
L = 5

key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
stack = build_stack(img, L)
print("stack", stack.shape, flush=True)

case = sys.argv[1]

if case == "sample_sub":
    # sparse_align: per-level substacks, N=768, grad=True
    for level in (4, 3, 2):
        sub = level_substack(stack, level, H, W)
        h, w = H >> level, W >> level
        uv = jax.random.uniform(key, (768, 2), jnp.float32) * jnp.array(
            [w - 8.0, h - 8.0]) + 4.0
        lvl = jnp.zeros((768,), jnp.int32)
        out = pp.sample_patches(sub, lvl, uv, 2, grad=True, use_pallas=True)
        jax.block_until_ready(out)
        print(f"sample_sub level={level} sub={sub.shape} OK", flush=True)

elif case == "sample_full":
    # full-stack patch sampling at mixed levels
    uv = jax.random.uniform(key, (768, 2), jnp.float32) * 200.0 + 8.0
    lvl = jax.random.randint(key, (768,), 0, 3)
    out = pp.sample_patches(stack, lvl, uv, 4, grad=True, use_pallas=True)
    jax.block_until_ready(out)
    print("sample_full OK", flush=True)

elif case == "align":
    # find_match_direct / update_seeds align_iclk: full stack, N in {768, 2048}
    for n in (768, 2048):
        uv = jax.random.uniform(key, (n, 2), jnp.float32) * 200.0 + 8.0
        lvl = jax.random.randint(key, (n,), 0, 3)
        ref = jax.random.uniform(key, (n, 8, 8), jnp.float32)
        gx = jax.random.uniform(key, (n, 8, 8), jnp.float32)
        gy = jax.random.uniform(key, (n, 8, 8), jnp.float32)
        valid = jnp.ones((n,), bool)
        out = pp.align_iclk(stack, lvl, ref, gx, gy, uv, valid, 10, H, W,
                            use_pallas=True)
        jax.block_until_ready(out)
        print(f"align n={n} OK", flush=True)

elif case == "scan":
    # epi_scan: full stack, N=2048, Kmax=100
    n = 2048
    uv_a = jax.random.uniform(key, (n, 2), jnp.float32) * 200.0 + 8.0
    uv_b = uv_a + jax.random.uniform(key, (n, 2), jnp.float32) * 30.0
    lvl = jax.random.randint(key, (n,), 0, 3)
    ref = jax.random.uniform(key, (n, 8, 8), jnp.float32)
    ns = jax.random.randint(key, (n,), 2, 100)
    out = pp.epi_scan(stack, lvl, uv_a, uv_b, ref, n_steps_max=100, half=4,
                      n_steps_each=ns, h=H, w=W, use_pallas=True)
    jax.block_until_ready(out)
    print("scan OK", flush=True)

else:
    raise SystemExit(f"unknown case {case}")
print("DONE", flush=True)
