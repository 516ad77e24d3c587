"""Scaling-efficiency harness: frames/s and BA iterations/s vs device count.

BASELINE.md asks for >=0.8 scaling efficiency at 4 hosts on the sharded
map/BA configurations.  Real multi-host hardware isn't available in this
environment, so this harness measures the same sharded programs over
sub-meshes of the virtual CPU device set (the standard
`--xla_force_host_platform_device_count` stand-in; the mesh/sharding layout
is identical to the multi-host one from `parallel.mesh.make_multihost_mesh`
— "data" spans the would-be hosts).

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/scaling_bench.py

Prints one JSON line per (config, n_devices) plus an efficiency table.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon TPU plugin overrides the JAX_PLATFORMS env var; force CPU via the
# config API (same dance as __graft_entry__.dryrun_multichip)
os.environ.pop("JAX_PLATFORMS", None)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import state as st
from android_svo_tpu.data.synthetic import default_camera
from android_svo_tpu.parallel import mesh as mesh_lib
from android_svo_tpu.parallel.ba import make_sharded_ba
from android_svo_tpu.parallel.multi_seq import (init_batched_state,
                                                make_sharded_track)


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def bench_tracking(n_devices: int, seq_per_device: int = 2):
    """Batched multi-sequence tracking sharded over n devices (WEAK scaling
    — sequences per device fixed, like adding hosts each tracking their own
    sequences; efficiency = throughput / (n * single-device throughput))."""
    batch = seq_per_device * n_devices
    cfg = SVOConfig(max_n_kfs=4, max_points=512, max_seeds=512,
                    img_align_n_iter=5, poseoptim_n_iter=3,
                    structureoptim_n_iter=2, max_epi_search_steps=16,
                    ransac_n_trials=8)
    cam = default_camera(128, 96)
    dims = st.arena_dims(cfg, cam.width, cam.height)
    mesh = mesh_lib.make_mesh(n_devices, data=n_devices)
    fn, vo_shard = make_sharded_track(cfg, cam, dims, mesh, batch)
    vo = jax.device_put(init_batched_state(cfg, cam.width, cam.height,
                                           batch), vo_shard)
    imgs = jax.random.uniform(jax.random.PRNGKey(0),
                              (batch, cam.height, cam.width)) * 255.0

    # fn donates the state: thread each call's output state into the next
    # (the natural sequential-tracking usage)
    vo, out = fn(vo, imgs)
    jax.block_until_ready(out["T_cw"].t)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        vo, out = fn(vo, imgs)
    jax.block_until_ready(out["T_cw"].t)
    t = (time.perf_counter() - t0) / n
    return batch / t                              # frames (sequences)/s


def bench_ba(n_devices: int, P: int = 16384, O: int = 6, NC: int = 5):
    """Distributed local BA, landmark axis sharded over `map`."""
    cfg = SVOConfig(loba_n_iter=5)
    mesh = mesh_lib.make_mesh(n_devices, data=1)
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (P, 3), jnp.float32, -1.0, 1.0)
    pos = pos.at[:, 2].add(4.0)
    K = 8
    q_kw = jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (K, 1))
    t_kw = jnp.stack([jnp.linspace(-0.5, 0.5, K), jnp.zeros(K),
                      jnp.zeros(K)], -1)
    obs_kf = jnp.tile(jnp.arange(O, dtype=jnp.int32), (P, 1))
    xyz = pos[:, None, :] - t_kw[None, :O, :]
    obs_f = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    valid = jnp.ones((P,), bool)
    core = jnp.arange(NC, dtype=jnp.int32)
    fixed = jnp.zeros((NC,), bool).at[0].set(True)
    fn = make_sharded_ba(cfg, 100.0, mesh)
    t = timed(lambda: fn(pos, valid, obs_kf, obs_f, q_kw, t_kw, core,
                         fixed)[3])
    return cfg.loba_n_iter / t                   # BA iterations/s


def main():
    counts = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    rows = []
    for metric, bench in (("track_seq_per_s", bench_tracking),
                          ("ba_iter_per_s", bench_ba)):
        base = None
        for n in counts:
            v = bench(n)
            if base is None:
                base = v
            eff = (v / base) / n
            rows.append({"metric": metric, "n_devices": n,
                         "value": round(v, 2), "efficiency": round(eff, 3)})
            print(json.dumps(rows[-1]), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
