"""Worker for scripts/ba_2proc_bench.py — one JAX process, one CPU device.

Two modes:
  single <P> <iters>                    : 1-process 1-device baseline
  dist <coord> <nproc> <pid> <P> <iters>: member of an N-process group,
                                          landmark axis sharded across
                                          the processes' devices

Each process owns ONE virtual CPU device and (launched under `taskset`)
one pinned host core with its own XLA intra-op thread pool — unlike the
in-process virtual mesh of scripts/scaling_bench.py, where every virtual
device contends for one shared thread pool.  This is the faithful stand-in
for N TPU chips (each chip has private compute; only the collectives are
shared), so the efficiency measured here is the honest 2-device number
for SCALING.json, with the localhost TCP collective as a *pessimistic*
stand-in for ICI.

Prints one line: TIME <sec_per_step> <chi2>
"""
from __future__ import annotations

import os
import sys
import time

os.environ.pop("JAX_PLATFORMS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=1").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from android_svo_tpu.config import SVOConfig  # noqa: E402
from android_svo_tpu.geometry.se3 import SE3  # noqa: E402
from android_svo_tpu.parallel.ba import make_sharded_ba  # noqa: E402
from android_svo_tpu.parallel.mesh import DATA_AXIS, MAP_AXIS  # noqa: E402

O, K, NC = 6, 8, 5


def ba_problem(Pn):
    """Same generator as scripts/profile_ba_scaling.py (numpy, seed 7)."""
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    pos_gt = np.array(jax.random.uniform(
        k1, (Pn, 3), minval=-1.0, maxval=1.0))
    pos_gt[:, 2] += 4.0
    q_kw = np.tile(np.array([0, 0, 0, 1.0], np.float32), (K, 1))
    t_kw = np.stack([np.linspace(-0.5, 0.5, K), np.zeros(K),
                     np.zeros(K)], axis=-1).astype(np.float32)
    obs_f = []
    for k in range(K):
        xyz = np.asarray(SE3(q=q_kw[k], t=t_kw[k]).apply(pos_gt))
        obs_f.append(xyz / np.linalg.norm(xyz, axis=-1, keepdims=True))
    obs_f = np.stack(obs_f, axis=1)[:, :O].astype(np.float32)
    obs_kf = np.tile(np.arange(O, dtype=np.int32), (Pn, 1))
    drop = np.asarray(jax.random.uniform(k3, (Pn, O))) < 0.3
    obs_kf = np.where(drop, -1, obs_kf).astype(np.int32)
    pos0 = (pos_gt + 0.02 * np.asarray(
        jax.random.normal(k2, (Pn, 3)))).astype(np.float32)
    valid = np.ones((Pn,), bool)
    core = np.arange(NC, dtype=np.int32)
    fixed = np.zeros((NC,), bool)
    fixed[0] = True
    return (pos0, valid, obs_kf, obs_f, q_kw, t_kw, core, fixed)


def run(mesh, Pn, iters):
    cfg = SVOConfig(loba_n_iter=5)
    fn = make_sharded_ba(cfg, 100.0, mesh)
    args = ba_problem(Pn)

    def place(a, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx, a=a: a[idx])

    def shard_p(a):
        return place(a, P(MAP_AXIS, *([None] * (a.ndim - 1))))

    placed = (shard_p(args[0]), shard_p(args[1]), shard_p(args[2]),
              shard_p(args[3]), place(args[4], P()), place(args[5], P()),
              place(args[6], P()), place(args[7], P()))

    out = fn(*placed)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*placed)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    chi2 = float(np.asarray(jax.device_get(out[3])))
    return dt, chi2


def run_psum(mesh, iters):
    """Price ONE BA-shaped fused all-reduce: the tuple XLA emits per GN
    iteration (S_red (NC,NC,6,6) + Hcc (NC,6,6) + bc/rhs (NC,6) x2,
    ~4.6 KB f32).  Calls are chained (output feeds input) so reps cannot
    pipeline; psum/n keeps values finite."""
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map

    n = mesh.devices.size
    shapes = ((NC, NC, 6, 6), (NC, 6, 6), (NC, 6), (NC, 6))
    x = tuple(jnp.ones(s, jnp.float32) for s in shapes)

    def f(*ts):
        return tuple(jax.lax.psum(t, MAP_AXIS) / n for t in ts)

    fm = jax.jit(shard_map(f, mesh=mesh,
                           in_specs=(P(),) * 4, out_specs=(P(),) * 4))
    x = fm(*x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fm(*x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def main():
    mode = sys.argv[1]
    if mode == "single":
        Pn, iters = int(sys.argv[2]), int(sys.argv[3])
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                    (DATA_AXIS, MAP_AXIS))
        dt, chi2 = run(mesh, Pn, iters)
        print(f"TIME {dt:.6f} {chi2:.4f}", flush=True)
        return
    coord, nproc, pid = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert len(jax.devices()) == nproc
    mesh = Mesh(np.array(jax.devices()).reshape(1, nproc),
                (DATA_AXIS, MAP_AXIS))
    if mode == "psum":
        iters = int(sys.argv[5])
        dt = run_psum(mesh, iters)
        if pid == 0:
            print(f"TIME {dt:.6f} 0.0", flush=True)
    else:
        Pn, iters = int(sys.argv[5]), int(sys.argv[6])
        dt, chi2 = run(mesh, Pn, iters)
        if pid == 0:
            print(f"TIME {dt:.6f} {chi2:.4f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
