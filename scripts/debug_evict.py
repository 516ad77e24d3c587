"""Debug harness for the long-horizon eviction failure
(tests/test_pipeline.py::TestEndToEnd::test_long_horizon_with_eviction).

Replays the exact test sequence with per-frame diagnostics so the failure
frame and its cause (match starvation vs pose blowup vs bad re-anchor) are
visible.  Not a test; run manually:  python scripts/debug_evict.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import frame_handler as fh
from android_svo_tpu.core import pipeline
from android_svo_tpu.data import synthetic
from android_svo_tpu.geometry.se3 import SE3

KEY = jax.random.PRNGKey(11)
CFG = SVOConfig(max_n_kfs=8, max_points=2048, max_seeds=1024,
                ransac_n_trials=128, img_align_n_iter=15,
                init_min_disparity=20.0)
W, H = 320, 240


def make_sequence(n_frames, step=0.04):
    cam = synthetic.default_camera(W, H)
    tex = synthetic.make_texture(KEY, 2048)
    poses = []
    for i in range(n_frames):
        x = step * i
        y = 0.3 * step * i
        rot = (0.002 * i, -0.002 * i, 0.004 * i)
        poses.append(synthetic.lookdown_pose(x, y, -3.0, rot))
    imgs = [synthetic.render(tex, cam, p) for p in poses]
    return cam, imgs, poses


def main():
    n = 60
    cfg = CFG.replace(max_n_kfs=6, kfselect_mindist=0.03)
    cam, imgs, poses = make_sequence(n, step=0.03)
    handler = fh.FrameHandler(cam, cfg)
    prev_kf_ids = None
    for i, (img, pose_gt) in enumerate(zip(imgs, poses)):
        res = handler.add_image(img, i * 0.1)
        vo = handler.vo
        kf_valid = np.asarray(vo.kfs.valid)
        kf_ids = np.asarray(vo.kfs.frame_id)
        cur_ids = sorted(kf_ids[kf_valid].tolist())
        evicted = ""
        if prev_kf_ids is not None:
            gone = set(prev_kf_ids) - set(cur_ids)
            if gone:
                evicted = f" EVICTED frame_ids {sorted(gone)}"
        prev_kf_ids = cur_ids
        pos_err = ""
        if handler.stage == fh.STAGE_DEFAULT_FRAME and res.t_wc is not None:
            est = np.asarray(res.t_wc)
            pos_err = f" pos_err={np.linalg.norm(est - np.asarray(pose_gt.t)):.4f}"
        npts = int(np.asarray(vo.points.valid).sum())
        nseeds = int(np.asarray(vo.seeds.valid).sum())
        print(f"[{i:3d}] stage={handler.stage} res={res.result} "
              f"match={res.n_matches:4d} edges={res.n_edges:4d} "
              f"pts={npts:4d} seeds={nseeds:4d} "
              f"kfs={cur_ids}{pos_err}{evicted}", flush=True)


if __name__ == "__main__":
    main()
