"""Marginal cost of each stage INSIDE the fused track step: time the
jitted step queued under config ablations.  Standalone stage timings
overstate what fusion actually pays (XLA overlaps/fuses across stages);
the marginal deltas here are the honest optimization targets.

Usage: python scripts/ablate_fused.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from android_svo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from android_svo_tpu.config import SVOConfig
    from android_svo_tpu.core import frame_handler as fh
    from android_svo_tpu.core import pipeline
    from android_svo_tpu.data import synthetic
    from android_svo_tpu.geometry.se3 import SE3
    from bench import make_poses, probe_dispatch_ms

    print(f"# dispatch={probe_dispatch_ms(jax):.3f} ms", flush=True)
    W, H = 640, 480
    base = SVOConfig(init_min_disparity=20.0, max_n_kfs=8)
    cam = synthetic.default_camera(W, H)
    tex = synthetic.make_texture(jax.random.PRNGKey(0), 2048)
    poses = make_poses(synthetic, 20, 0.02, False)
    rj = jax.jit(lambda q, t: synthetic.render(tex, cam, SE3(q=q, t=t)))
    imgs = [rj(p.q, p.t) for p in poses]

    handler = fh.FrameHandler(cam, base)
    for i, img in enumerate(imgs):
        handler.add_image(img, i * 0.05)
    assert handler.stage == fh.STAGE_DEFAULT_FRAME
    vo = handler.vo
    img = imgs[-1]
    print(f"# populated: {int(np.asarray(vo.points.valid).sum())} pts "
          f"{int(np.asarray(vo.seeds.valid).sum())} seeds "
          f"{int(np.asarray(vo.kfs.valid).sum())} kfs", flush=True)

    ablations = [
        ("full", {}),
        ("serial_align", {"align_mxu": False}),
        ("no_zmssd_gate", {"direct_match_zmssd": False}),
        ("no_sparse_align", {"img_align_n_iter": 0}),
        ("no_reproj_retry", {"reproject_n_retries": 0}),
        ("no_warp_refresh", {"warp_refresh_budget": 0,
                             "seed_warp_refresh_budget": 0}),
        ("no_pose_opt", {"poseoptim_n_iter": 0}),
        ("no_point_opt", {"structureoptim_n_iter": 0}),
        ("small_seed_budget", {"seed_update_budget": 64}),
        ("small_align_iter", {"align_max_iter": 3}),
    ]
    t_full = None
    for name, kv in ablations:
        cfg = base.replace(**kv)
        fn = jax.jit(pipeline.make_track_frame(cfg, cam, handler.dims))
        out = fn(vo, img)
        jax.block_until_ready(out[1]["result"])
        n = 30
        t0 = time.perf_counter()
        outs = [fn(vo, img) for _ in range(n)]
        jax.block_until_ready(outs[-1][1]["result"])
        dt = (time.perf_counter() - t0) / n * 1e3
        if name == "full":
            t_full = dt
        delta = "" if t_full is None or name == "full" else \
            f"  (marginal {t_full - dt:+.2f} ms)"
        print(f"{name:>18}: {dt:6.2f} ms{delta}", flush=True)
    print(f"# end dispatch={probe_dispatch_ms(jax):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
