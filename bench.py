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

Headline semantics: `value` is the FORWARD device-scan throughput from the
post-bootstrap state over frames the tracker has never seen — keyframe
insertion (detection, seed spawning, arena writes, furthest-KF eviction)
fires INSIDE the timed scan (`n_kf_scan`/`n_evict_scan` in the output prove
it), and the async local-BA dispatch is interleaved between scan chunks at
its keyframe cadence, inside the timed region.  `fps_host_loop` is the
latency-mode number (one host dispatch per frame, paying 2 tunnel
round-trips of `dispatch_ms` each); `fps_track_only` is its
non-keyframe-frame median, the per-frame tracking cost the reference's
10-timer table measures.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

# total wrapper wall-clock budget (s): the driver's own budget is finite —
# a bench that can't finish inside it publishes NOTHING (the r4 failure).
WALL_BUDGET_S = float(os.environ.get("BENCH_WALL_BUDGET_S", "1100"))


def _result_rank(r: dict | None) -> int:
    """Order candidate results: a healthy forward-scan number beats a
    healthy host-loop-only number beats a degraded-session number beats a
    kernel-parity failure beats nothing."""
    if not r:
        return -1
    if r.get("kernel_parity_fail"):
        return 0
    if r.get("fps_forward_scan", 0) > 0:
        # a completed forward scan is a QUEUED measurement — honest device
        # time even when the session's blocking dispatches carry the
        # degraded +28 ms tax — so EITHER flavor outranks every host-only
        # partial (whose per-frame numbers eat that tax twice per frame)
        return 3 if r.get("degraded_session") else 4
    if r.get("value", 0) > 0:
        return 1 if r.get("degraded_session") else 2
    return 1 if r.get("degraded_session") else 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120,
                    help="frames in the timed forward scan")
    ap.add_argument("--warm-frames", type=int, default=28,
                    help="host-loop frames before the scan (bootstrap + "
                         "steady state)")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--step", type=float, default=0.02)
    ap.add_argument("--chunk", type=int, default=24,
                    help="scan chunk length; local BA is dispatched between "
                         "chunks (async-BA cadence)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny/fast config for plumbing checks")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (debug; the axon plugin "
                         "ignores JAX_PLATFORMS=cpu, this flag does not)")
    ap.add_argument("--inner", action="store_true",
                    help="run the bench in THIS process (no retry wrapper)")
    ap.add_argument("--phase", choices=["all", "warm", "scan"],
                    default="all",
                    help="warm: host loop only, checkpoint the state; "
                         "scan: resume the checkpoint, run the timed scan. "
                         "Splitting phases across processes keeps each TPU "
                         "session short (the axon worker dies on long ones) "
                         "and lets a scan crash retry without repaying the "
                         "host loop.")
    ap.add_argument("--state-dir", default=None,
                    help="handler checkpoint dir for --phase warm/scan")
    args = ap.parse_args()
    if args.state_dir is None:
        args.state_dir = os.path.join(
            tempfile.gettempdir(),
            f"svo_bench_state_{args.width}x{args.height}"
            f"{'_smoke' if args.smoke else ''}")

    if not args.inner:
        # The axon TPU worker is flaky around crashes/long compiles: a
        # session can come back DEGRADED (identical dispatches 10-25x
        # slower) or the worker can die mid-run.  Isolate attempts in
        # subprocesses under a HARD wall-clock budget; every attempt
        # persists its best partial JSON to a side file so even a crash or
        # wrapper timeout still publishes best-so-far (r4 published
        # nothing because all-or-nothing attempts ate the driver budget).
        # The persistent XLA compilation cache (utils/cache.py) accumulates
        # across attempts, so a crashed first attempt still pays forward
        # its compiles.
        t_start = time.monotonic()
        best: dict | None = None
        last_err = ""
        # compile-only prewarm first: the worker crashes preferentially
        # during heavy-compile phases, and compiles persist in the cache
        # across a crash — pay them in a sacrificial process so the
        # measured attempts run fully cached (crash exposure ~minutes ->
        # ~seconds of compile per attempt)
        prewarm = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "scripts", "prewarm.py")
        for i in range(2 if not args.cpu else 0):
            budget_left = WALL_BUDGET_S - (time.monotonic() - t_start)
            if budget_left < 120:
                break
            pargs = [sys.executable, prewarm,
                     "--width", str(args.width), "--height",
                     str(args.height), "--chunk", str(args.chunk),
                     "--frames", str(args.frames),
                     "--warm-frames", str(args.warm_frames)]
            if args.smoke:
                pargs.append("--smoke")
            try:
                pw = subprocess.run(
                    pargs, capture_output=True, text=True,
                    timeout=min(420.0, budget_left - 60.0))
            except subprocess.TimeoutExpired:
                print("# prewarm: timeout", file=sys.stderr, flush=True)
                break
            print(f"# prewarm: rc={pw.returncode}", file=sys.stderr,
                  flush=True)
            if pw.returncode == 4:
                # the silicon kernel-parity gate failed: publish the
                # diagnosis, don't burn the budget retrying a real bug
                gl = next((ln for ln in pw.stdout.splitlines()
                           if ln.startswith("GATE FAIL ")), "GATE FAIL {}")
                print(json.dumps({
                    "metric": "frames_per_second", "value": 0.0,
                    "unit": "fps", "vs_baseline": 0.0,
                    "kernel_parity_fail": True,
                    "kernel_parity": json.loads(gl[10:])}))
                sys.exit(4)
            if pw.returncode == 0:
                break
            time.sleep(60)              # worker crashed mid-compile: retry
        state_dir = args.state_dir
        host_json = os.path.join(state_dir, "host.json")

        def run_phase(phase):
            """One subprocess attempt of a bench phase.  Returns (rc, cand)
            where cand is the attempt's best JSON (stdout line or persisted
            partial)."""
            nonlocal last_err
            budget_left = WALL_BUDGET_S - (time.monotonic() - t_start)
            if budget_left < 60:
                return 125, None
            partial = tempfile.mktemp(prefix="bench_partial_",
                                      suffix=".json")
            env = dict(os.environ, BENCH_PARTIAL=partial)
            argv, skip = [], False
            for a in sys.argv[1:]:
                if skip:
                    skip = False
                    continue
                if a in ("--phase", "--state-dir"):
                    skip = True
                    continue
                argv.append(a)
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--inner",
                     "--phase", phase, "--state-dir", state_dir] + argv,
                    capture_output=True, text=True,
                    timeout=max(60.0, budget_left - 15.0), env=env)
                rc = proc.returncode
                stdout = proc.stdout
                last_err = proc.stderr[-2000:]
                tail = [ln for ln in proc.stderr.splitlines()
                        if ln.startswith("# phase:")][-1:]
            except subprocess.TimeoutExpired as e:
                rc = 124
                stdout = (e.stdout or b"").decode() \
                    if isinstance(e.stdout, bytes) else (e.stdout or "")
                tail = []
            line = next((ln for ln in stdout.splitlines()
                         if ln.startswith("{")), None)
            cand = None
            if line:
                try:
                    cand = json.loads(line)
                except json.JSONDecodeError:
                    cand = None
            if cand is None and os.path.exists(partial):
                try:
                    with open(partial) as f:
                        cand = json.load(f)
                except (json.JSONDecodeError, OSError):
                    cand = None
            if os.path.exists(partial):
                os.unlink(partial)
            print(f"# bench {phase}: rc={rc} rank={_result_rank(cand)}"
                  + (f" last={tail[0][9:]}" if tail else ""),
                  file=sys.stderr, flush=True)
            return rc, cand

        def scan_series(n):
            nonlocal best
            for _ in range(n):
                rc, cand = run_phase("scan")
                if _result_rank(cand) > _result_rank(best):
                    best = cand
                if rc == 0 and _result_rank(best) >= 4:
                    return                  # healthy full number: done
                if rc in (4, 125):
                    return
                time.sleep(60 if rc not in (0, 3) else 45)

        # a checkpoint from an earlier run of the same config skips the
        # crash-prone warm phase entirely — try it first
        if os.path.exists(host_json):
            print("# bench: reusing existing warm checkpoint",
                  file=sys.stderr, flush=True)
            scan_series(2)

        # -- warm phase: host loop + checkpoint (retry until state exists)
        rc4 = False
        if _result_rank(best) < 3:
            for _ in range(4):
                rc, cand = run_phase("warm")
                if _result_rank(cand) > _result_rank(best):
                    best = cand
                if rc == 4:
                    rc4 = True
                    break
                if rc in (0, 3) and os.path.exists(host_json):
                    break                   # state checkpointed (3 =
                                            # degraded host numbers; the
                                            # scan re-probes its own
                                            # session anyway)
                if rc == 125:
                    break
                time.sleep(60)

            # -- scan phase: resume checkpoint, timed scan (cheap retries)
            if not rc4 and os.path.exists(host_json):
                scan_series(5)

        if best is not None:
            print(json.dumps(best))
            sys.exit(4 if best.get("kernel_parity_fail") else 0)
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


N_PREROLL = 4


def make_poses(synthetic, n, step, smoke):
    """Fast bootstrap pre-roll, then a slow orbit over the textured plane,
    pitched off fronto-parallel.

    The pre-roll (4 frames of brisk diagonal motion ending at the orbit
    start) gives the two-frame bootstrap its 20 px disparity by frame ~2
    instead of frame ~10: the axon worker dies preferentially in aged
    sessions, and the first execution of the big init/track programs must
    happen as early as possible.  The orbit keeps every frame trackable
    while exercising keyframe creation/eviction and parallax in both axes;
    the 0.45 rad pitch gives the scene real depth variation — an exactly
    fronto-parallel plane is DEGENERATE for monocular VO (translation flow
    is uniform, so a compensating rotation absorbs it and trajectory scale
    collapses).
    """
    import math
    poses = []
    n_orbit = max(n - N_PREROLL, 1)
    period = 120 if smoke else n_orbit
    for i in range(min(N_PREROLL, n)):
        k = N_PREROLL - i
        poses.append(synthetic.lookdown_pose(
            -3.0 * step * k, -0.9 * step * k, -3.0, (0.45, 0.0, 0.0)))
    for i in range(max(n - N_PREROLL, 0)):
        ph = 2.0 * math.pi * i / period
        poses.append(synthetic.lookdown_pose(
            25 * step * math.sin(ph),
            8 * step * math.cos(ph) - 8 * step, -3.0,
            (0.45 + 0.0008 * i, -0.0008 * i, 0.001 * i)))
    return poses


def _phase(msg):
    print(f"# phase: {msg}", file=sys.stderr, flush=True)


def _save_partial(d: dict):
    """Persist the best-so-far result so a crash mid-run (the axon worker's
    specialty) still leaves the wrapper something to publish."""
    path = os.environ.get("BENCH_PARTIAL")
    if not path:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f)
    os.replace(tmp, path)


def run_bench(args):
    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.smoke:
        args.frames = 16
        args.warm_frames = 14
        args.chunk = 8
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

    # silicon kernel-parity gate (r4 postmortem: align_iclk was silently
    # wrong on the v5e and the bench measured garbage).  A mismatch is a
    # BUG, not a flaky session: publish the diagnosis with rc=4 so the
    # wrapper stops retrying.  In the phased flow the gate runs inside
    # scripts/prewarm.py (its own sacrificial session — executing it in
    # the warm phase aged that session past the worker's tolerance before
    # the first big program ran); "--phase all" standalone runs keep it.
    if jax.default_backend() == "tpu" and args.phase == "all":
        _phase("kernel parity gate")
        from android_svo_tpu.ops.silicon_gate import run_gate
        gate = run_gate(n=256, h=args.height, w=args.width)
        if not gate.ok:
            print(json.dumps({"metric": "frames_per_second", "value": 0.0,
                              "unit": "fps", "vs_baseline": 0.0,
                              "kernel_parity_fail": True,
                              "kernel_parity": gate.as_dict(),
                              "dispatch_ms": round(dispatch_ms, 3)}))
            sys.exit(4)

    from android_svo_tpu.config import SVOConfig
    from android_svo_tpu.core import frame_handler as fh
    from android_svo_tpu.core import pipeline
    from android_svo_tpu.data import synthetic
    from android_svo_tpu.evals.trajectory import ate_rmse

    # max_n_kfs=8: the orbit creates more keyframes than slots, so
    # furthest-KF eviction + landmark re-anchoring run INSIDE the timed
    # scan (ref frame_handler_mono.cpp:303-308)
    cfg = SVOConfig(init_min_disparity=20.0, max_n_kfs=8)
    if args.smoke:
        # plumbing check: small arenas + gates relaxed so the 16-frame
        # fraction-of-an-orbit stays tracked through the scan path
        cfg = cfg.replace(max_points=2048, max_seeds=1024,
                          ransac_n_trials=128, img_align_n_iter=15,
                          min_reproj_matches=15, quality_min_fts=15,
                          min_pose_opt_edges=8)

    from android_svo_tpu.utils.profiling import PerformanceMonitor
    from android_svo_tpu.geometry.se3 import SE3

    cam = synthetic.default_camera(args.width, args.height)
    tex = synthetic.make_texture(jax.random.PRNGKey(0), 2048)

    n_total = args.warm_frames + args.frames
    poses = make_poses(synthetic, n_total, args.step, args.smoke)

    # batched renderer: one dispatch per 16 frames instead of one per frame
    # (the long per-frame dispatch trains are what ages axon sessions).
    # tex is an ARGUMENT (not a closure constant) so the program matches
    # scripts/prewarm.py's lowering and hits the compilation cache.
    import jax.numpy as jnp
    rjv = jax.jit(jax.vmap(
        lambda tx, q, t: synthetic.render(tx, cam, SE3(q=q, t=t)),
        in_axes=(None, 0, 0)))

    def render_range(a, b):
        out = []
        for j in range(a, b, 16):
            ps = poses[j:min(j + 16, b)]
            qs = jnp.stack([p.q for p in ps])
            ts = jnp.stack([p.t for p in ps])
            out.append(rjv(tex, qs, ts))
        imgs = jnp.concatenate(out) if out else jnp.zeros((0,))
        jax.block_until_ready(imgs)
        return list(imgs)

    handler = fh.FrameHandler(cam, cfg)
    from android_svo_tpu.utils import checkpoint as ckpt

    if args.phase in ("all", "warm"):
        _phase("render warm")
        imgs = render_range(0, args.warm_frames)
        # per-frame trace with the reference's timer names
        # (frame_handler_base.cpp:43-70,126-132)
        pm = PerformanceMonitor(trace_path="TRACE_bench.jsonl")

        # ---- host-loop pass (latency mode + warmup) -----------------------
        # bootstraps the map and measures per-frame host-dispatch latency
        _phase("host loop")
        handler.perf_mon = pm
        est_h, gt_h = [], []
        n_fail = 0
        frame_ms = []                       # (ms, was_keyframe)
        for i in range(args.warm_frames):
            timed = handler.stage == fh.STAGE_DEFAULT_FRAME and i > 8
            t0 = time.perf_counter()
            res = handler.add_image(imgs[i], i * 0.05)
            dt = time.perf_counter() - t0
            if i % 8 == 0:
                _phase(f"host frame {i} stage={handler.stage}")
            if timed:
                frame_ms.append((dt * 1e3,
                                 res.result == pipeline.RES_IS_KEYFRAME))
            if handler.stage == fh.STAGE_DEFAULT_FRAME:
                t = np.asarray(res.t_wc) if res.t_wc is not None \
                    else np.asarray(res.T_cw.inverse().t)
                if np.isfinite(t).all():
                    est_h.append(t)
                    gt_h.append(np.asarray(poses[i].t))
                else:
                    n_fail += 1
                if res.result == pipeline.RES_FAILURE:
                    n_fail += 1
        pm.close()
        pm_summary = pm.summary()
        handler.perf_mon = None

        # host-loop stats.  Health thresholds are computed separately for
        # keyframe and plain tracking frames — keyframe frames are
        # legitimately several times slower and must not trip the
        # degradation heuristic.
        all_ms = np.array([m for m, _ in frame_ms])
        kf_mask = np.array([k for _, k in frame_ms], bool)
        n_all = len(all_ms)
        if n_all:
            track_ms_arr = all_ms[~kf_mask]
            med_t = np.median(track_ms_arr) if len(track_ms_arr) else np.inf
            healthy = np.where(kf_mask, True, all_ms < 3.0 * med_t)
            n_healthy = int(healthy.sum())
            fps_host = 1e3 / np.median(all_ms[healthy]) if n_healthy else 0.0
            track_only = all_ms[healthy & ~kf_mask]
            fps_track = (1e3 / np.median(track_only)) if len(track_only) \
                else fps_host
            degraded_tail = n_healthy < 0.9 * n_all
        else:
            fps_host = fps_track = 0.0
            n_healthy = 0
            degraded_tail = True

        ate_host = (ate_rmse(np.array(est_h), np.array(gt_h))
                    if len(est_h) >= 4 else -1.0)
        host = {
            "fps_host_loop": round(float(fps_host), 2),
            "fps_track_only": round(float(fps_track), 2),
            "ate_host": round(float(ate_host), 5),
            "failures": n_fail,
            "frames_timed": n_all,
            "frames_healthy": n_healthy,
            "host_degraded_tail": bool(degraded_tail),
            "stage": int(handler.stage),
            "track_ms": {k: round(v["mean_ms"], 2)
                         for k, v in pm_summary.items() if v["count"] > 0},
        }
        host_partial = {
            "metric": "frames_per_second",
            "value": round(float(fps_host), 2),
            "unit": "fps", "vs_baseline": round(float(fps_host) / 200.0, 3),
            "fps_forward_scan": 0.0, "n_kf_scan": 0,
            "partial": "host_loop",
            "degraded_session": bool(degraded_tail),
            "device": str(jax.devices()[0]),
            "resolution": f"{args.width}x{args.height}", **host}
        _save_partial(host_partial)
        if args.phase == "warm":
            # checkpoint the tracked state for the scan phase and stop:
            # short sessions survive; the measured scan gets its own
            _phase("checkpoint")
            ckpt.save_handler(args.state_dir, handler)
            with open(os.path.join(args.state_dir, "host.json"), "w") as f:
                json.dump(host, f)
            dispatch_ms = probe_dispatch_ms(jax)
            host_partial["dispatch_ms"] = round(dispatch_ms, 3)
            print(json.dumps(host_partial))
            sys.exit(3 if (degraded_tail or dispatch_ms > 0.3
                           or handler.stage != fh.STAGE_DEFAULT_FRAME)
                     else 0)
    else:
        # scan phase: resume the warm phase's checkpointed tracker
        _phase("resume checkpoint")
        with open(os.path.join(args.state_dir, "host.json")) as f:
            host = json.load(f)
        ckpt.load_handler(args.state_dir, handler)
        fps_host = host["fps_host_loop"]
        fps_track = host["fps_track_only"]
        ate_host = host["ate_host"]
        n_fail = host["failures"]
        n_all = host["frames_timed"]
        n_healthy = host["frames_healthy"]
        degraded_tail = bool(host["host_degraded_tail"])

    # ---- timed FORWARD device scan ----------------------------------------
    # The deployment/throughput mode: the remaining frames (never seen by
    # the tracker) as chunked lax.scan dispatches, local BA dispatched
    # between chunks (the reference ran BA on the mapping thread so
    # tracking never blocked on it, depth_filter.cpp:63-67; here the device
    # pipeline absorbs it between chunks).  Keyframe insertion fires inside
    # the scan — `n_kf_scan` must be > 0 for the headline to be valid.
    fps_scan = 0.0
    ate_scan = -1.0
    scan_failures = -1
    n_kf_scan = 0
    n_evict_scan = 0
    if handler.stage == fh.STAGE_DEFAULT_FRAME:
        _phase("render scan")
        scan_imgs = jnp.stack(render_range(args.warm_frames, n_total))
        _phase("scan compile")
        scan = jax.jit(pipeline.make_track_scan(cfg, cam, handler.dims))
        n_scan = scan_imgs.shape[0]
        chunk = max(1, min(args.chunk, n_scan))
        n_chunks = n_scan // chunk
        chunks = [scan_imgs[j * chunk:(j + 1) * chunk]
                  for j in range(n_chunks)]

        def run_scan(vo):
            outs_all = []
            for c in chunks:
                vo, outs = scan(vo, c)
                vo = handler._jit_ba(vo)
                outs_all.append(outs)
            jax.block_until_ready(vo.kfs.q_kw)
            return vo, outs_all

        vo0 = handler.vo
        kf_before = int(np.asarray(vo0.kfs.valid).sum())
        kfid_before = set(np.asarray(vo0.kfs.frame_id)[
            np.asarray(vo0.kfs.valid)].tolist())
        vo1, outs_all = run_scan(vo0)    # compile + warm
        _phase("scan timed pass")
        t0 = time.perf_counter()
        vo1, outs_all = run_scan(vo0)
        dt_scan = time.perf_counter() - t0
        fps_scan = (n_chunks * chunk) / dt_scan
        outs = {k: np.concatenate([np.asarray(o[k]) for o in outs_all])
                for k in outs_all[0]}
        res_arr = outs["result"]
        scan_failures = int((res_arr == pipeline.RES_FAILURE).sum())
        n_kf_scan = int((res_arr == pipeline.RES_IS_KEYFRAME).sum())
        kfid_after = set(np.asarray(vo1.kfs.frame_id)[
            np.asarray(vo1.kfs.valid)].tolist())
        n_evict_scan = len(kfid_before - kfid_after)
        t_scan = outs["t_wc"]
        gt_scan = np.array([np.asarray(p.t) for p in
                            poses[args.warm_frames:
                                  args.warm_frames + n_chunks * chunk]])
        okf = np.isfinite(t_scan).all(axis=1) & \
            (res_arr != pipeline.RES_FAILURE)
        if okf.sum() >= 4:
            ate_scan = ate_rmse(t_scan[okf], gt_scan[okf])

    if fps_scan > 0:
        _save_partial({
            "metric": "frames_per_second", "value": round(float(fps_scan), 2),
            "unit": "fps", "vs_baseline": round(float(fps_scan) / 200.0, 3),
            "fps_forward_scan": round(float(fps_scan), 2),
            "n_kf_scan": n_kf_scan, "n_evict_scan": n_evict_scan,
            "fps_host_loop": round(float(fps_host), 2),
            "fps_track_only": round(float(fps_track), 2),
            "ate_scan": round(float(ate_scan), 5),
            "ate_host": round(float(ate_host), 5),
            "scan_failures": scan_failures,
            "partial": "scan", "failures": n_fail,
            "degraded_session": bool(degraded_tail),
            "device": str(jax.devices()[0]),
            "resolution": f"{args.width}x{args.height}"})

    # BA iterations/s (BASELINE.md primary metric): time the jitted local-BA
    # program over the populated keyframe window
    _phase("ba timing")
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
    # suspect — do not publish, let the wrapper retry (VERDICT r3 #5: a
    # degraded END probe retries rather than publishing)
    dispatch_ms = probe_dispatch_ms(jax)
    degraded = dispatch_ms > 0.3

    # headline = forward-scan throughput with keyframe work included; the
    # host-loop number is the fallback when the scan could not run
    fps_headline = fps_scan if fps_scan > 0 else fps_host
    final = {
        "metric": "frames_per_second",
        "value": round(float(fps_headline), 2),
        "unit": "fps",
        "vs_baseline": round(float(fps_headline) / 200.0, 3),
        "fps_forward_scan": round(float(fps_scan), 2),
        "n_kf_scan": n_kf_scan,
        "n_evict_scan": n_evict_scan,
        "fps_host_loop": round(float(fps_host), 2),
        "fps_track_only": round(float(fps_track), 2),
        "ate_scan": round(float(ate_scan), 5),
        "ate_host": round(float(ate_host), 5),
        "scan_failures": scan_failures,
        "ba_iter_per_s": round(ba_iter_per_s, 1),
        "frames_timed": n_all,
        "frames_healthy": n_healthy,
        "failures": n_fail,
        "track_ms": host.get("track_ms", {}),
        "dispatch_ms": round(dispatch_ms, 3),
        "degraded_session": bool(degraded or degraded_tail),
        "device": str(jax.devices()[0]),
        "resolution": f"{args.width}x{args.height}",
    }
    _save_partial(final)
    print(json.dumps(final))
    if degraded or degraded_tail:
        sys.exit(3)


if __name__ == "__main__":
    main()
