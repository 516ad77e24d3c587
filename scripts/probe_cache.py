"""Probe: does the persistent compilation cache give cross-process hits
for the big TPU programs?  Lower+compile the bench-config track program
(no execution) and print wall time; run twice back-to-back."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from android_svo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

jax.config.update("jax_explain_cache_misses", True)

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import pipeline, state as st
from android_svo_tpu.data import synthetic

W, H = 640, 480
cfg = SVOConfig(init_min_disparity=20.0, max_n_kfs=8)
cam = synthetic.default_camera(W, H)
dims = st.arena_dims(cfg, W, H)
vo = st.init_state(cfg, W, H)
img = jnp.zeros((H, W), jnp.float32)

t0 = time.perf_counter()
fn = jax.jit(pipeline.make_track_frame(cfg, cam, dims))
lowered = fn.lower(vo, img)
t1 = time.perf_counter()
compiled = lowered.compile()
t2 = time.perf_counter()
print(f"lower={t1 - t0:.1f}s compile={t2 - t1:.1f}s "
      f"backend={jax.default_backend()}", flush=True)
