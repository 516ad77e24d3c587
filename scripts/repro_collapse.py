"""Reproduce the r4 on-silicon tracking collapse: run the exact bench
warmup (same poses/config/seeds, 640x480) as a host loop and print
per-frame stage + match counts.  A/B with PALLAS_DISABLE=align.

Usage: python scripts/repro_collapse.py [--frames 28]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from android_svo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=28)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--step", type=float, default=0.02)
    args = ap.parse_args()

    from bench import make_poses, probe_dispatch_ms
    from android_svo_tpu.config import SVOConfig
    from android_svo_tpu.core import frame_handler as fh
    from android_svo_tpu.core import pipeline
    from android_svo_tpu.data import synthetic
    from android_svo_tpu.geometry.se3 import SE3

    print(f"# dev={jax.devices()[0]} dispatch_ms={probe_dispatch_ms(jax):.3f}"
          f" PALLAS_DISABLE={os.environ.get('PALLAS_DISABLE', '')}",
          flush=True)

    cfg = SVOConfig(init_min_disparity=20.0, max_n_kfs=8)
    cam = synthetic.default_camera(args.width, args.height)
    tex = synthetic.make_texture(jax.random.PRNGKey(0), 2048)
    poses = make_poses(synthetic, args.frames, args.step, False)
    rj = jax.jit(lambda q, t: synthetic.render(tex, cam, SE3(q=q, t=t)))
    imgs = [rj(p.q, p.t) for p in poses]
    jax.block_until_ready(imgs[-1])

    handler = fh.FrameHandler(cam, cfg)
    for i in range(args.frames):
        t0 = time.perf_counter()
        res = handler.add_image(imgs[i], i * 0.05)
        dt = (time.perf_counter() - t0) * 1e3
        err = ""
        if res.t_wc is not None and handler.stage == fh.STAGE_DEFAULT_FRAME:
            t_est = np.asarray(res.t_wc)
            t_gt = np.asarray(poses[i].t)
            err = f" |t-gt|={np.linalg.norm(t_est - t_gt):.4f}"
        n_kfs = int(np.asarray(handler.vo.kfs.valid).sum())
        print(f"frame {i:3d} stage={handler.stage} res={res.result} "
              f"matches={res.n_matches} edges={res.n_edges}"
              f" kfs={n_kfs} {dt:7.1f}ms{err}", flush=True)
    print(f"# end dispatch_ms={probe_dispatch_ms(jax):.3f}", flush=True)


if __name__ == "__main__":
    main()
