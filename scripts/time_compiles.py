"""Time compilation of each jitted program at the full bench config."""
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
from android_svo_tpu.data import synthetic

W, H = 640, 480
cfg = SVOConfig(init_min_disparity=20.0)
cam = synthetic.default_camera(W, H)

t0 = time.time()
handler = fh.FrameHandler(cam, cfg)
print(f"handler ctor: {time.time()-t0:.1f}s", flush=True)

img = jnp.zeros((H, W), jnp.float32)

t0 = time.time()
pyr, det = handler._jit_pyr_det(img)
jax.block_until_ready(det["px"])
print(f"pyr_det compile+run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
key = jax.random.PRNGKey(0)
boot = handler._jit_boot(pyr, pyr, px_ref=det["px"], valid=det["valid"],
                         key=key)
jax.block_until_ready(boot["n_tracked"])
print(f"boot compile+run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
vo, out = handler._jit_track(handler.vo, img)
jax.block_until_ready(out["result"])
print(f"track compile+run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
vo2 = handler._jit_ba(vo)
jax.block_until_ready(vo2.kfs.q_kw)
print(f"ba compile+run: {time.time()-t0:.1f}s", flush=True)

# steady-state timing
for name, f in [("track", lambda: handler._jit_track(handler.vo, img))]:
    ts = []
    for _ in range(20):
        t0 = time.time()
        vo, out = f()
        jax.block_until_ready(out["result"])
        ts.append(time.time() - t0)
    ts = sorted(ts)
    print(f"{name} steady: median {ts[len(ts)//2]*1e3:.2f} ms "
          f"min {ts[0]*1e3:.2f} ms -> {1.0/ts[len(ts)//2]:.1f} fps",
          flush=True)
