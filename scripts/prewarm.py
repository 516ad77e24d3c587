"""Compile-only prewarm of every program the bench executes.

The axon TPU worker tends to crash during heavy-compile phases of long
host loops; with the persistent compilation cache (utils/cache.py) the
compiles survive the crash, so the cheapest way through is to pay ALL
compiles in a dedicated (crash-tolerated, retried) process that never
executes anything, then run the measured bench fully cached.

Uses jit.lower(...).compile() on ShapeDtypeStructs via the SAME
FrameHandler jit wrappers as the bench so cache keys match exactly.

Usage: python scripts/prewarm.py [--width 640 --height 480 --chunk 24
                                  --frames 120] [--smoke]
Prints PREWARM OK and per-program times.
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
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--warm-frames", type=int, default=28)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.width, args.height, args.chunk = 320, 240, 8
        args.frames = 16
        args.warm_frames = 14

    from android_svo_tpu.config import SVOConfig
    from android_svo_tpu.core import frame_handler as fh
    from android_svo_tpu.core import pipeline
    from android_svo_tpu.data import synthetic
    from android_svo_tpu.geometry.se3 import SE3

    W, H = args.width, args.height
    cfg = SVOConfig(init_min_disparity=20.0, max_n_kfs=8)
    if args.smoke:
        cfg = cfg.replace(max_points=2048, max_seeds=1024,
                          ransac_n_trials=128, img_align_n_iter=15,
                          min_reproj_matches=15, quality_min_fts=15,
                          min_pose_opt_edges=8)
    cam = synthetic.default_camera(W, H)
    handler = fh.FrameHandler(cam, cfg)

    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    img_s = sds((H, W), f32)
    vo_s = jax.tree.map(lambda x: sds(x.shape, x.dtype), handler.vo)

    def timed(name, thunk):
        t0 = time.perf_counter()
        thunk()
        print(f"# prewarm {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    # render (the pre-render loop's program)
    tex_s = sds((2048, 2048), f32)
    rj = jax.jit(lambda tex, q, t: synthetic.render(
        tex, cam, SE3(q=q, t=t)))
    timed("render", lambda: rj.lower(
        tex_s, sds((4,), f32), sds((3,), f32)).compile())

    timed("pyr_det", lambda: handler._jit_pyr_det.lower(img_s).compile())
    pyr_s, det_s = jax.eval_shape(handler._pyr_det, img_s)

    key_s = sds((2,), jnp.uint32)
    timed("boot", lambda: handler._jit_boot.lower(
        pyr_s, pyr_s, px_ref=det_s["px"], valid=det_s["valid"],
        key=key_s).compile())
    boot_s = jax.eval_shape(
        lambda *a, **k: dict(handler._jit_boot(*a, **k), px_ref=det_s["px"]),
        pyr_s, pyr_s, px_ref=det_s["px"], valid=det_s["valid"], key=key_s)

    T_s = jax.tree.map(lambda x: sds(x.shape, x.dtype), handler.init_T_cw)
    timed("init_map", lambda: handler._jit_init_map.lower(
        vo_s, boot_s, pyr_s, pyr_s, T_s, det_s["level"]).compile())

    timed("track", lambda: handler._jit_track.lower(vo_s, img_s).compile())
    timed("ba", lambda: handler._jit_ba.lower(vo_s).compile())

    n_scan = args.frames
    chunk = max(1, min(args.chunk, n_scan))
    scan = jax.jit(pipeline.make_track_scan(cfg, cam, handler.dims))
    timed("scan", lambda: scan.lower(
        vo_s, sds((chunk, H, W), f32)).compile())

    # batched-render programs (bench renders 16 frames per dispatch)
    rjv = jax.jit(jax.vmap(lambda tex, q, t: synthetic.render(
        tex, cam, SE3(q=q, t=t)), in_axes=(None, 0, 0)))
    batches = {16, args.warm_frames % 16 or 16, args.frames % 16 or 16}
    for b in sorted(batches):
        timed(f"render_batch{b}", lambda b=b: rjv.lower(
            tex_s, sds((b, 4), f32), sds((b, 3), f32)).compile())

    # silicon kernel-parity gate (bench.py's pre-publish check): run it
    # HERE in the sacrificial session — executing it inside the warm phase
    # ages that session past the axon worker's tolerance before the first
    # big program runs.  rc=4 tells the wrapper to publish the diagnosis
    # and stop retrying (a miscompile is a bug, not a flaky session).
    if jax.default_backend() == "tpu":
        from android_svo_tpu.ops.silicon_gate import run_gate
        t0 = time.perf_counter()
        gate = run_gate(n=256, h=H, w=W)
        print(f"# prewarm gate: {time.perf_counter() - t0:.1f}s "
              f"ok={gate.ok}", flush=True)
        if not gate.ok:
            import json
            print("GATE FAIL " + json.dumps(gate.as_dict()), flush=True)
            sys.exit(4)

    print("PREWARM OK", flush=True)


if __name__ == "__main__":
    main()
