"""Bisect the per-frame tracking step: time each stage as its own jitted
program at the full bench config on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from android_svo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import frame_handler as fh
from android_svo_tpu.core import pipeline, state as st
from android_svo_tpu.core.pose_opt import optimize_pose
from android_svo_tpu.core.reprojector import reproject_map
from android_svo_tpu.data import synthetic
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.ops.pyramid import build_pyramid, stack_from_pyramid
from android_svo_tpu.ops.sparse_align import sparse_img_align

W, H = 640, 480
cfg = SVOConfig(init_min_disparity=20.0)
if os.environ.get("NO_PALLAS"):
    cfg = cfg.replace(use_pallas=False)
cam = synthetic.default_camera(W, H)
dims = st.arena_dims(cfg, W, H)
tex = synthetic.make_texture(jax.random.PRNGKey(11), 2048)

handler = fh.FrameHandler(cam, cfg)
imgs = []
for i in range(10):
    pose = synthetic.lookdown_pose(0.05 * i, 0.015 * i, -3.0,
                                   (0.002 * i, -0.002 * i, 0.004 * i))
    imgs.append(synthetic.render(tex, cam, pose))
for i, img in enumerate(imgs):
    handler.add_image(img, 0.1 * i)
print("stage:", handler.stage, flush=True)
vo = handler.vo
img = imgs[-1]


def timed(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1e3


cur_pyr = build_pyramid(img, cfg.total_pyr_levels)
cur_stack = stack_from_pyramid(cur_pyr)
T_cw = vo.last.T_fw

t = timed(jax.jit(lambda im: stack_from_pyramid(
    build_pyramid(im, cfg.total_pyr_levels))), img)
print(f"pyramid+stack: {t:.1f} ms", flush=True)


@jax.jit
def stage_align(vo, cur_stack):
    last = vo.last
    p_w = vo.points.pos[last.ftr_point]
    depth_last = jnp.linalg.norm(p_w - last.T_fw.inverse().t, axis=-1)
    has_pt = last.ftr_valid & (last.ftr_point >= 0) & (
        vo.points.valid[last.ftr_point])
    T, n, x = sparse_img_align(last.stack, cur_stack, cam,
                               SE3.identity(dtype=jnp.float32),
                               last.ftr_px, last.ftr_f, depth_last, has_pt,
                               cfg)
    return T.t, n

print(f"sparse_align: {timed(stage_align, vo, cur_stack):.1f} ms", flush=True)


@jax.jit
def stage_reproject(vo, cur_stack):
    feats, pts2, n = reproject_map(vo, cur_stack, vo.last.T_fw, cam, cfg,
                                   dims)
    return feats["px"], n

print(f"reproject+align: {timed(stage_reproject, vo, cur_stack):.1f} ms",
      flush=True)


@jax.jit
def stage_pose(vo):
    feats_valid = vo.last.ftr_valid
    p_w = vo.points.pos[jnp.maximum(vo.last.ftr_point, 0)]
    T, inl, n, cov, _, _ = optimize_pose(
        vo.last.T_fw, p_w, vo.last.ftr_f, vo.last.ftr_level, feats_valid,
        cam.errorMultiplier2(), cfg)
    return T.t, n

print(f"pose_opt: {timed(stage_pose, vo):.1f} ms", flush=True)


@jax.jit
def stage_seeds(vo, cur_stack):
    vo2 = pipeline.update_seeds(vo, cur_stack, vo.last.T_fw, cam, cfg)
    return vo2.seeds.mu

print(f"update_seeds: {timed(stage_seeds, vo, cur_stack):.1f} ms", flush=True)


@jax.jit
def stage_insert(vo, cur_pyr, cur_stack):
    feats = {"px": vo.last.ftr_px, "f": vo.last.ftr_f,
             "level": vo.last.ftr_level, "point": vo.last.ftr_point,
             "valid": vo.last.ftr_valid}
    vo2 = pipeline.insert_keyframe(vo, cur_pyr, cur_stack, vo.last.T_fw,
                                   feats, cam, cfg, dims)
    return vo2.kf_batch

print(f"insert_keyframe: {timed(stage_insert, vo, cur_pyr, cur_stack):.1f} ms",
      flush=True)

print(f"full track: {timed(handler._jit_track, vo, img):.1f} ms", flush=True)
