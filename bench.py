"""Benchmark: frames/s of the full tracking pipeline on one chip, plus ATE
on a synthetic ground-truth sequence.

Run on the real TPU (default backend).  Prints ONE JSON line:
  {"metric": "frames_per_second", "value": N, "unit": "fps",
   "vs_baseline": N/200, ...}

Baseline (BASELINE.md): >= 200 frames/s on a single chip with EuRoC-class
ATE.  Real EuRoC data is not available in this environment (zero egress), so
the bench renders a textured-plane sequence with exact ground truth — same
resolution class (VGA), same pipeline path as a dataset run.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--step", type=float, default=0.02)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny/fast config for plumbing checks")
    args = ap.parse_args()

    if args.smoke:
        args.frames = 12
        args.width, args.height = 320, 240
        args.step = 0.05

    from android_svo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from android_svo_tpu.config import SVOConfig
    from android_svo_tpu.core import frame_handler as fh
    from android_svo_tpu.core import pipeline
    from android_svo_tpu.data import synthetic
    from android_svo_tpu.evals.trajectory import ate_rmse

    cfg = SVOConfig(init_min_disparity=20.0)
    if args.smoke:
        cfg = cfg.replace(max_n_kfs=8, max_points=2048, max_seeds=1024,
                          ransac_n_trials=128, img_align_n_iter=15)

    cam = synthetic.default_camera(args.width, args.height)
    tex = synthetic.make_texture(jax.random.PRNGKey(0), 2048)

    # pre-render the sequence on device (not timed)
    from android_svo_tpu.geometry.se3 import SE3

    poses = []
    for i in range(args.frames):
        poses.append(synthetic.lookdown_pose(
            args.step * i, 0.3 * args.step * i, -3.0,
            (0.002 * i, -0.002 * i, 0.003 * i)))
    imgs = []
    rj = jax.jit(lambda q, t: synthetic.render(tex, cam, SE3(q=q, t=t)))
    for p in poses:
        imgs.append(rj(p.q, p.t))
    jax.block_until_ready(imgs[-1])

    handler = fh.FrameHandler(cam, cfg)

    est, gt = [], []
    n_fail = 0
    t_track = 0.0
    n_timed = 0
    for i, (img, pose_gt) in enumerate(zip(imgs, poses)):
        timed = handler.stage == fh.STAGE_DEFAULT_FRAME and i > 8
        t0 = time.perf_counter()
        res = handler.add_image(img, i * 0.05)
        if timed:
            t_track += time.perf_counter() - t0
            n_timed += 1
        if handler.stage == fh.STAGE_DEFAULT_FRAME:
            est.append(np.asarray(res.T_cw.inverse().t))
            gt.append(np.asarray(pose_gt.t))
            if res.result == pipeline.RES_FAILURE:
                n_fail += 1

    fps = n_timed / t_track if t_track > 0 else 0.0
    ate = ate_rmse(np.array(est), np.array(gt)) if len(est) >= 4 else -1.0
    print(json.dumps({
        "metric": "frames_per_second",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 200.0, 3),
        "ate_sim3": round(float(ate), 5),
        "frames_timed": n_timed,
        "failures": n_fail,
        "device": str(jax.devices()[0]),
        "resolution": f"{args.width}x{args.height}",
    }))


if __name__ == "__main__":
    main()
