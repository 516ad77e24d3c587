"""Benchmark: frames/s of the full tracking pipeline on one chip, plus ATE
on a synthetic ground-truth sequence.

Run on the real TPU (default backend).  Prints ONE JSON line:
  {"metric": "frames_per_second", "value": N, "unit": "fps",
   "vs_baseline": N/200, ...}

Baseline (BASELINE.md): >= 200 frames/s on a single chip with EuRoC-class
ATE — stated for TPU v5p; this environment exposes one v5e (TPU v5 lite)
chip, reported in the output.  Real EuRoC data is not available here (zero
egress), so the bench renders a textured-plane sequence with exact ground
truth — same resolution class (VGA), same pipeline path as a dataset run.

Reporting (ref frame_handler split, depth_filter.cpp:63-67): `value` is
steady-state tracking fps over ALL frames including keyframe insertion and
the (asynchronously dispatched) local BA — the honest end-to-end number;
`fps_track_only` excludes keyframe frames, isolating the per-frame tracking
cost the reference's 10-timer table measures.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--step", type=float, default=0.02)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny/fast config for plumbing checks")
    ap.add_argument("--inner", action="store_true",
                    help="run the bench in THIS process (no retry wrapper)")
    args = ap.parse_args()

    if not args.inner:
        # The axon TPU worker is flaky around crashes/long compiles: a
        # session can come back DEGRADED (identical dispatches 10-25x
        # slower) or the worker can die mid-run.  Isolate attempts in
        # subprocesses; a degraded session is detected BEFORE the timed
        # pass (rc=3) so attempts are cheap, and its result is published
        # only as a last resort.
        degraded_line = None
        last_err = ""
        for attempt in range(6):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"]
                + sys.argv[1:],
                capture_output=True, text=True)
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("{")), None)
            if line and proc.returncode == 0:
                print(line)
                return
            if line:
                degraded_line = line
            print(f"# bench attempt {attempt + 1}: rc={proc.returncode} "
                  f"{'(degraded session)' if line else '(crashed)'}",
                  file=sys.stderr, flush=True)
            last_err = proc.stderr[-2000:]
            if proc.returncode == 3:
                # degraded worker: immediate reconnects land on the same
                # sick session; idle for a bit before retrying
                time.sleep(60)
        if degraded_line:
            print(degraded_line)
            return
        print(last_err, file=sys.stderr)
        sys.exit(1)

    run_bench(args)


def probe_dispatch_ms(jax, n=20):
    """Median dispatch+sync latency of a trivial program — the session
    health signal (healthy axon ~0.1 ms; degraded 10-25x worse)."""
    x = jax.numpy.ones((256, 256), jax.numpy.float32)
    noop = jax.jit(lambda v: v * 2.0)
    jax.block_until_ready(noop(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(noop(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2] * 1e3


def run_bench(args):
    import jax
    import numpy as np

    if args.smoke:
        args.frames = 12
        args.width, args.height = 320, 240
        args.step = 0.05

    from android_svo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # session-health gate BEFORE any expensive work: a degraded session
    # poisons every measurement; fail fast so the wrapper retries
    dispatch_ms = probe_dispatch_ms(jax)
    if dispatch_ms > 0.3:
        print(json.dumps({"metric": "frames_per_second", "value": 0.0,
                          "unit": "fps", "vs_baseline": 0.0,
                          "dispatch_ms": round(dispatch_ms, 3),
                          "degraded_session": True}))
        sys.exit(3)

    from android_svo_tpu.config import SVOConfig
    from android_svo_tpu.core import frame_handler as fh
    from android_svo_tpu.core import pipeline
    from android_svo_tpu.data import synthetic
    from android_svo_tpu.evals.trajectory import ate_rmse

    cfg = SVOConfig(init_min_disparity=20.0)
    if args.smoke:
        cfg = cfg.replace(max_n_kfs=8, max_points=2048, max_seeds=1024,
                          ransac_n_trials=128, img_align_n_iter=15)

    from android_svo_tpu.utils.profiling import PerformanceMonitor

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

    # per-frame trace with the reference's timer names
    # (frame_handler_base.cpp:43-70,126-132)
    pm = PerformanceMonitor(trace_path="TRACE_bench.jsonl")
    handler = fh.FrameHandler(cam, cfg)

    def run_sequence():
        est, gt = [], []
        n_fail = 0
        t_all = 0.0          # all steady-state frames (incl. KF + BA)
        t_track = 0.0        # non-keyframe frames only
        n_all = 0
        n_track = 0
        for i, (img, pose_gt) in enumerate(zip(imgs, poses)):
            timed = handler.stage == fh.STAGE_DEFAULT_FRAME and i > 8
            t0 = time.perf_counter()
            res = handler.add_image(img, i * 0.05)
            dt = time.perf_counter() - t0
            if timed:
                t_all += dt
                n_all += 1
                if res.result != pipeline.RES_IS_KEYFRAME:
                    t_track += dt
                    n_track += 1
            if handler.stage == fh.STAGE_DEFAULT_FRAME:
                t = np.asarray(res.t_wc) if res.t_wc is not None \
                    else np.asarray(res.T_cw.inverse().t)
                if np.isfinite(t).all():
                    est.append(t)
                    gt.append(np.asarray(pose_gt.t))
                else:
                    n_fail += 1
                if res.result == pipeline.RES_FAILURE:
                    n_fail += 1
        return est, gt, n_fail, t_all, n_all, t_track, n_track

    # warmup pass: compiles every program (track step, detection, BA);
    # the timed pass below then measures steady-state throughput
    run_sequence()
    handler.reset()
    handler.perf_mon = pm
    est, gt, n_fail, t_all, n_all, t_track, n_track = run_sequence()

    fps = n_all / t_all if t_all > 0 else 0.0
    fps_track = n_track / t_track if t_track > 0 else 0.0
    est, gt = np.array(est), np.array(gt)
    ate = ate_rmse(est, gt) if len(est) >= 4 else -1.0

    # BA iterations/s (BASELINE.md primary metric): time the jitted local-BA
    # program over the populated keyframe window
    ba_iter_per_s = 0.0
    if bool(jax.device_get(handler.vo.kfs.valid.any())):
        ba = handler._jit_ba
        out = ba(handler.vo)
        jax.block_until_ready(out.kfs.q_kw)
        n_rep = 5
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = ba(handler.vo)
        jax.block_until_ready(out.kfs.q_kw)
        dt = (time.perf_counter() - t0) / n_rep
        ba_iter_per_s = max(cfg.loba_n_iter, 1) / dt

    # re-probe: if the session degraded DURING the run, the numbers are
    # suspect — report honestly and let the wrapper retry
    dispatch_ms = probe_dispatch_ms(jax)
    degraded = dispatch_ms > 0.3

    pm.close()
    summary = pm.summary()
    print(json.dumps({
        "metric": "frames_per_second",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 200.0, 3),
        "fps_track_only": round(fps_track, 2),
        "ate_sim3": round(float(ate), 5),
        "ba_iter_per_s": round(ba_iter_per_s, 1),
        "frames_timed": n_all,
        "failures": n_fail,
        "track_ms": {k: round(v["mean_ms"], 2)
                     for k, v in summary.items() if v["count"] > 0},
        "dispatch_ms": round(dispatch_ms, 3),
        "degraded_session": degraded,
        "device": str(jax.devices()[0]),
        "resolution": f"{args.width}x{args.height}",
    }))
    if degraded:
        sys.exit(3)


if __name__ == "__main__":
    main()
