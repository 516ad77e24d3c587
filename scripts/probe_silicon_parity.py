"""Silicon parity probe: run the three Pallas kernels vs their pure-JAX
fallbacks on the REAL TPU with realistic data and report max deviations.

This is the r4-verdict #1 diagnostic: align_iclk was silently wrong on v5e
while every interpret-mode test passed.  Run variants with --variant to
bisect (see VARIANTS below).

Usage:  python scripts/probe_silicon_parity.py [--n 512] [--variant base]
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def probe_dispatch_ms(n=20):
    x = jnp.ones((256, 256), jnp.float32)
    noop = jax.jit(lambda v: v * 2.0)
    jax.block_until_ready(noop(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(noop(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2] * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kernels", default="sample,scan,align")
    args = ap.parse_args()

    print(f"# backend={jax.default_backend()} dev={jax.devices()[0]}",
          flush=True)
    d = probe_dispatch_ms()
    print(f"# dispatch_ms={d:.3f} {'HEALTHY' if d < 0.3 else 'DEGRADED'}",
          flush=True)

    from android_svo_tpu.data import synthetic
    from android_svo_tpu.ops import patch_pallas as pp
    from android_svo_tpu.ops import pyramid

    h, w = 480, 640
    cam = synthetic.default_camera(w, h)
    tex = synthetic.make_texture(jax.random.PRNGKey(7), 2048)
    img = synthetic.render(tex, cam, synthetic.lookdown_pose(0.0, 0.0, -3.0,
                                                            (0.45, 0, 0)))
    stack = pyramid.build_stack(img, 5)
    stack = jax.device_put(stack)

    key = jax.random.PRNGKey(args.seed)
    n = args.n
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lvl = jax.random.randint(k1, (n,), 0, 3)
    wl = (w >> lvl).astype(jnp.float32)
    hl = (h >> lvl).astype(jnp.float32)
    # uv well inside the level
    u01 = jax.random.uniform(k2, (n, 2))
    uv = jnp.stack([12 + u01[:, 0] * (wl - 24), 12 + u01[:, 1] * (hl - 24)],
                   axis=-1)
    valid = jnp.ones((n,), bool)

    def cmp(name, a, b, mask=None, tol=1e-2):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        if mask is not None:
            m = np.asarray(mask, bool)
            a = a[m]
            b = b[m]
        d = np.abs(a - b)
        bad = d > tol
        print(f"  {name}: max|d|={d.max():.5f} n_bad={bad.sum()}/{d.size} "
              f"{'OK' if not bad.any() else 'MISMATCH'}", flush=True)
        return not bad.any()

    ok_all = True
    kernels = args.kernels.split(",")

    if "sample" in kernels:
        print("== sample_patches (grad=True, half=4) ==", flush=True)
        outs_p = pp.sample_patches(stack, lvl, uv, 4, grad=True,
                                   valid=valid, use_pallas=True)
        outs_f = pp.sample_patches(stack, lvl, uv, 4, grad=True,
                                   use_pallas=False)
        for nm, a, b in zip(("patch", "dx", "dy"), outs_p, outs_f):
            ok_all &= cmp(nm, a, b)
        print("== sample_patches (grad=False, half=2) ==", flush=True)
        a = pp.sample_patches(stack, lvl, uv, 2, valid=valid,
                              use_pallas=True)
        b = pp.sample_patches(stack, lvl, uv, 2, use_pallas=False)
        ok_all &= cmp("patch", a, b)

    if "scan" in kernels:
        print("== epi_scan ==", flush=True)
        # epipolar segments: random direction, length ~20 px
        ang = jax.random.uniform(k3, (n,)) * 2 * np.pi
        seg = jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1) * 10.0
        uv_a = uv - seg
        uv_b = uv + seg
        ref = pp.sample_patches(stack, lvl, uv, 4, use_pallas=False)
        nsteps = jax.random.randint(k4, (n,), 2, 30)
        tb_p, s_p = pp.epi_scan(stack, lvl, uv_a, uv_b, ref, 30, half=4,
                                n_steps_each=nsteps, h=h, w=w,
                                use_pallas=True)
        tb_f, s_f = pp.epi_scan(stack, lvl, uv_a, uv_b, ref, 30, half=4,
                                n_steps_each=nsteps, h=h, w=w,
                                use_pallas=False)
        fin = np.isfinite(np.asarray(s_f)) & np.isfinite(np.asarray(s_p))
        ok_all &= cmp("best_t", tb_p, tb_f, mask=fin, tol=1e-3)
        ok_all &= cmp("score", s_p, s_f, mask=fin, tol=1.0)
        both_inf = (~np.isfinite(np.asarray(s_f))) == \
            (~np.isfinite(np.asarray(s_p)))
        print(f"  inf-agreement: {both_inf.sum()}/{n}", flush=True)

    if "align" in kernels:
        print("== align_iclk ==", flush=True)
        ref, dx, dy = pp.sample_patches(stack, lvl, uv, 4, grad=True,
                                        use_pallas=False)
        # start 1-2 px off the true position
        off = jax.random.uniform(k3, (n, 2), minval=-2.0, maxval=2.0)
        init_uv = uv + off
        uv_p, cv_p, m_p = pp.align_iclk(stack, lvl, ref, dx, dy, init_uv,
                                        valid, 10, h=h, w=w,
                                        use_pallas=True)
        uv_f, cv_f, m_f = pp.align_iclk(stack, lvl, ref, dx, dy, init_uv,
                                        valid, 10, h=h, w=w,
                                        use_pallas=False)
        cv_p = np.asarray(cv_p)
        cv_f = np.asarray(cv_f)
        agree = cv_p == cv_f
        print(f"  converged: pallas={cv_p.sum()} fallback={cv_f.sum()} "
              f"agree={agree.sum()}/{n}", flush=True)
        both = cv_p & cv_f
        ok_all &= cmp("uv(conv both)", uv_p, uv_f,
                      mask=np.repeat(both[:, None], 2, 1), tol=0.05)
        ok_all &= cmp("mean(conv both)", m_p, m_f, mask=both, tol=0.5)
        # how close do converged estimates land to truth?
        err_p = np.linalg.norm(np.asarray(uv_p) - np.asarray(uv), axis=-1)
        err_f = np.linalg.norm(np.asarray(uv_f) - np.asarray(uv), axis=-1)
        print(f"  med err->truth: pallas={np.median(err_p[cv_p]):.4f} "
              f"fallback={np.median(err_f[cv_f]):.4f}", flush=True)
        if agree.sum() < 0.98 * n:
            ok_all = False

    d = probe_dispatch_ms()
    print(f"# end dispatch_ms={d:.3f}", flush=True)
    print(f"PARITY {'PASS' if ok_all else 'FAIL'}", flush=True)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
