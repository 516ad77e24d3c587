"""Per-stage device-time table under the reference's 10 timer names
(`frame_handler_base.cpp:46-55`).

The live pipeline fuses all stages into ONE jitted program, so host timers
can't attribute time inside it.  This harness times each stage as its own
jitted program on REAL steady-state inputs (arenas populated by actually
tracking a synthetic sequence), `block_until_ready` around a timed loop.
The per-stage sum exceeds the fused `tot_time` (fusion wins back overlap),
so the table is an upper bound per stage and `tot_time` is the truth.

Writes STAGE_TABLE.json at the repo root:
  {"pyramid_creation": ms, ..., "tot_time": ms, "device": ..., "note": ...}

Run on the real TPU:  python scripts/stage_bench.py [--frames 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from android_svo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def probe_dispatch_ms(n=10):
    """Median dispatch+sync latency of a trivial program (healthy axon
    ~0.1 ms; a degraded session is 10-300x worse and poisons every stage
    measurement)."""
    x = jnp.ones((256, 256), jnp.float32)
    noop = jax.jit(lambda v: v * 2.0)
    jax.block_until_ready(noop(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(noop(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2] * 1e3


def time_jitted(name, fn, *args, n_rep: int = 20, n_warm: int = 2):
    """Median wall ms of a jitted callable (compiles on first call).

    Reports both the blocking latency (host sync per call) and the queued
    per-call time (n_rep dispatches, one sync — the device-pipeline cost a
    deployment actually pays); the table records the queued number with the
    blocking one alongside.
    """
    t_start = time.perf_counter()
    out = None
    for _ in range(n_warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t_start
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    med = 1e3 * sorted(ts)[len(ts) // 2]
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n_rep)]
    jax.block_until_ready(jax.tree_util.tree_leaves(outs[-1])[0])
    queued = (time.perf_counter() - t0) / n_rep * 1e3
    print(f"# {name or 'stage'}: queued {queued:.3f} ms, blocking {med:.3f} "
          f"ms (warm+compile {t_compile:.1f}s, probe "
          f"{probe_dispatch_ms():.3f} ms)", file=sys.stderr, flush=True)
    return queued, med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--out", default="STAGE_TABLE.json")
    ap.add_argument("--trace", action="store_true",
                    help="also write a ~20-frame jax.profiler device trace")
    args = ap.parse_args()

    from android_svo_tpu.config import SVOConfig
    from android_svo_tpu.core import frame_handler as fh
    from android_svo_tpu.core import pipeline, state as st
    from android_svo_tpu.core.pose_opt import optimize_pose
    from android_svo_tpu.core.point_opt import (optimize_points,
                                                select_points_for_optim)
    from android_svo_tpu.core.reprojector import reproject_map
    from android_svo_tpu.data import synthetic
    from android_svo_tpu.geometry.se3 import SE3
    from android_svo_tpu.ops import matcher
    from android_svo_tpu.ops.pyramid import build_pyramid, stack_from_pyramid
    from android_svo_tpu.ops.sparse_align import sparse_img_align

    cfg = SVOConfig(init_min_disparity=20.0)
    if os.environ.get("NO_MXU"):
        cfg = cfg.replace(align_mxu=False)
    cam = synthetic.default_camera(args.width, args.height)
    dims = st.arena_dims(cfg, cam.width, cam.height)
    tex = synthetic.make_texture(jax.random.PRNGKey(0), 2048)

    # ---- drive the real pipeline to a populated steady state ---------------
    handler = fh.FrameHandler(cam, cfg)
    rj = jax.jit(lambda q, t: synthetic.render(tex, cam, SE3(q=q, t=t)))
    import math
    imgs = []
    for i in range(args.frames):
        # same slow pitched orbit as bench.py: stays on the texture
        # indefinitely; the 0.45 rad pitch keeps the scene depth-varying
        # (fronto-parallel planes are degenerate for monocular VO)
        ph = 2.0 * math.pi * i / 120
        p = synthetic.lookdown_pose(
            25 * 0.02 * math.sin(ph), 8 * 0.02 * math.cos(ph) - 8 * 0.02,
            -3.0, (0.45 + 0.0008 * i, -0.0008 * i, 0.001 * i))
        imgs.append(rj(p.q, p.t))
    for i, img in enumerate(imgs):
        handler.add_image(img, i * 0.05)
    assert handler.stage == fh.STAGE_DEFAULT_FRAME, handler.stage
    vo = handler.vo
    img = imgs[-1]
    print(f"# populated: {int(np.asarray(vo.points.valid).sum())} points, "
          f"{int(np.asarray(vo.seeds.valid).sum())} seeds, "
          f"{int(np.asarray(vo.kfs.valid).sum())} kfs", file=sys.stderr)

    # ---- steady-state inputs for each stage ---------------------------------
    dtype = jnp.float32
    cur_stack = stack_from_pyramid(build_pyramid(img, cfg.total_pyr_levels))
    T_cw = vo.last.T_fw
    last = vo.last
    p_w = vo.points.pos[last.ftr_point]
    depth_last = jnp.linalg.norm(p_w - last.T_fw.inverse().t, axis=-1)
    has_pt = last.ftr_valid & (last.ftr_point >= 0)

    table = {}
    blocking = {}

    def record(name, *a, **kw):
        q, b = time_jitted(name, *a, **kw)
        table[name] = q
        blocking[name] = b

    record("pyramid_creation",
        jax.jit(lambda im: stack_from_pyramid(
            build_pyramid(im, cfg.total_pyr_levels))), img)

    record("sparse_img_align",
        jax.jit(lambda ls, cs, px, f, d, v: sparse_img_align(
            ls, cs, cam, SE3.identity(dtype=dtype), px, f, d, v, cfg)),
        last.stack, cur_stack, last.ftr_px, last.ftr_f, depth_last, has_pt)

    # reproject = whole map-to-frame stage (projection + cell select +
    # matcher); reproject_kfs / reproject_candidates are its reference
    # sub-steps — here candidates are projected in the same batched op, so
    # the split is reproject_kfs ~= reproject - feature_align and
    # reproject_candidates = 0 (fused; same working set).
    record("reproject",
        jax.jit(lambda v, cs: reproject_map(v, cs, T_cw, cam, cfg, dims)),
        vo, cur_stack)

    # feature_align: the batched ICLK the reprojector drives (one round)
    feats, _, _ = jax.jit(
        lambda v, cs: reproject_map(v, cs, T_cw, cam, cfg, dims))(vo,
                                                                  cur_stack)
    pts = vo.points
    winner = jnp.maximum(feats["point"], 0)
    kf_centers = SE3(q=vo.kfs.q_kw, t=vo.kfs.t_kw).inverse().t
    w_kf = pts.ref_kf[winner]
    depth_ref = jnp.linalg.norm(
        pts.pos[winner] - kf_centers[w_kf], axis=-1)
    T_cur_ref_all = T_cw.compose(SE3(q=vo.kfs.q_kw, t=vo.kfs.t_kw).inverse())
    T_cur_ref = SE3(q=T_cur_ref_all.q[w_kf], t=T_cur_ref_all.t[w_kf])
    record("feature_align",
        jax.jit(lambda cs, px, f, d, lv, pxi, v: matcher.find_match_direct(
            cs, vo.kfs.stack, w_kf, cam, px, f, d, lv, T_cur_ref, pxi, v,
            cfg)),
        cur_stack, pts.ref_px[winner], pts.ref_f[winner], depth_ref,
        pts.ref_level[winner], feats["px"], feats["valid"])
    table["reproject_kfs"] = max(table["reproject"]
                                 - 2 * table["feature_align"], 0.0)
    blocking["reproject_kfs"] = 0.0
    table["reproject_candidates"] = 0.0   # fused into reproject (see above)
    blocking["reproject_candidates"] = 0.0

    record("pose_optimizer",
        jax.jit(lambda p, f, lv, v: optimize_pose(
            T_cw, p, f, lv, v, cam.errorMultiplier2(), cfg)),
        pts.pos[winner], feats["f"], feats["level"], feats["valid"])

    slots, sel = select_points_for_optim(
        pts.last_optim, pts.valid & (pts.obs_count >= 2),
        cfg.structureoptim_max_pts)
    obs_kf = pts.obs_kf[slots]
    obs_ok = (obs_kf >= 0) & vo.kfs.valid[jnp.maximum(obs_kf, 0)]
    ks = jnp.maximum(obs_kf, 0)
    record("point_optimizer",
        jax.jit(lambda p, q, t, f, ok, s: optimize_points(
            p, q, t, f, ok, s, cfg.structureoptim_n_iter)),
        pts.pos[slots], vo.kfs.q_kw[ks], vo.kfs.t_kw[ks],
        pts.obs_f[slots], obs_ok, sel)

    record("depth_filter",
        jax.jit(lambda v, cs: pipeline.update_seeds(v, cs, T_cw, cam, cfg)),
        vo, cur_stack)

    record("local_ba", handler._jit_ba, vo, n_rep=5)

    record("tot_time",
        lambda v, im: handler._jit_track(v, im), vo, img)

    if args.trace:
        # one committed device trace of ~20 steady frames (jax.profiler):
        # the in-program stage attribution comes from the jax.named_scope
        # annotations in pipeline.make_track_frame
        trace_dir = os.path.join(os.path.dirname(args.out), "device_trace")
        with jax.profiler.trace(trace_dir):
            v = vo
            for _ in range(20):
                v, _o = handler._jit_track(v, img)
            jax.block_until_ready(_o["result"])
        print(f"# device trace written to {trace_dir}", file=sys.stderr)

    table = {k: round(v, 3) for k, v in table.items()}
    out = {
        **table,
        "blocking_ms": {k: round(v, 3) for k, v in blocking.items()},
        "dispatch_ms": round(probe_dispatch_ms(), 3),
        "device": str(jax.devices()[0]),
        "resolution": f"{args.width}x{args.height}",
        "note": ("per-stage programs timed standalone on populated state, "
                 "queued dispatch (device-pipeline cost); blocking_ms adds "
                 "the per-call host sync; sum > tot_time because the live "
                 "step fuses them"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
