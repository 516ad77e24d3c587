"""Decompose the 2-device sharded-BA inefficiency (VERDICT r4 #4).

SCALING.json's honest 2-device point showed efficiency 0.685 with a 46%
model residual.  This script separates the step time into:

  * per-landmark work (scales with the "map" shards): slope of t(P)
  * replicated/serial work (dense reduced solve, camera-block assembly):
    intercept of t(P) + direct ablation (solve_spd_loop -> diagonal solve)
  * partitioning/collective overhead: (2-dev time) - (1-dev time at the
    same per-device P) with the above accounted

Run on CPU with 2 virtual devices pinned to 2 host cores (the
oversubscription-free configuration of scripts/scaling_bench.py).

Usage: python scripts/profile_ba_scaling.py
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.pop("JAX_PLATFORMS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=2").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.parallel import mesh as mesh_lib
from android_svo_tpu.parallel.ba import local_ba, make_sharded_ba

O, K, NC = 6, 8, 5


def ba_problem(P):
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    pos_gt = jax.random.uniform(k1, (P, 3), jnp.float32, minval=-1.0,
                                maxval=1.0).at[:, 2].add(4.0)
    q_kw = jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (K, 1))
    t_kw = jnp.stack([jnp.linspace(-0.5, 0.5, K), jnp.zeros((K,)),
                      jnp.zeros((K,))], axis=-1)
    obs_f = []
    for k in range(K):
        xyz = SE3(q=q_kw[k], t=t_kw[k]).apply(pos_gt)
        obs_f.append(xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True))
    obs_f = jnp.stack(obs_f, axis=1)[:, :O]
    # sparse observation pattern like the live map (not all KFs see all)
    obs_kf = jnp.tile(jnp.arange(O, dtype=jnp.int32), (P, 1))
    obs_kf = jnp.where(jax.random.uniform(k3, (P, O)) < 0.3, -1, obs_kf)
    pos0 = pos_gt + 0.02 * jax.random.normal(k2, (P, 3), jnp.float32)
    valid = jnp.ones((P,), bool)
    core = jnp.arange(NC, dtype=jnp.int32)
    fixed = jnp.zeros((NC,), bool).at[0].set(True)
    return (pos0, valid, obs_kf, obs_f, q_kw, t_kw, core, fixed)


def timeit(fn, args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    cfg = SVOConfig(loba_n_iter=5)
    focal = 100.0
    results = {"P_grid_1dev": [], "P_grid_2dev": []}

    mesh1 = mesh_lib.make_mesh(1, data=1)
    mesh2 = mesh_lib.make_mesh(2, data=1)

    for P in (2048, 4096, 8192, 16384):
        args = ba_problem(P)
        fn1 = make_sharded_ba(cfg, focal, mesh1)
        t1 = timeit(fn1, args)
        fn2 = make_sharded_ba(cfg, focal, mesh2)
        t2 = timeit(fn2, args)
        results["P_grid_1dev"].append({"P": P, "sec": round(t1, 5)})
        results["P_grid_2dev"].append({"P": P, "sec": round(t2, 5)})
        print(f"P={P}: 1dev={t1 * 1e3:.2f}ms 2dev={t2 * 1e3:.2f}ms "
              f"speedup={t1 / t2:.3f}", flush=True)

    # linear fit on the 1-device grid: t = a + b*P
    Ps = np.array([r["P"] for r in results["P_grid_1dev"]], float)
    ts = np.array([r["sec"] for r in results["P_grid_1dev"]], float)
    b, a = np.polyfit(Ps, ts, 1)
    results["fit_1dev"] = {"intercept_ms": round(a * 1e3, 3),
                           "slope_us_per_landmark": round(b * 1e6, 4)}
    print(f"1dev fit: intercept={a * 1e3:.2f}ms "
          f"slope={b * 1e6:.3f}us/landmark", flush=True)

    # ablation: replace the serial reduced solve with a diagonal solve to
    # price the non-scaling solve_spd_loop directly
    from android_svo_tpu.parallel import ba as ba_mod
    real_solve = ba_mod.solve_spd_loop

    def diag_solve(H, g):
        return g / jnp.maximum(jnp.diagonal(H), 1e-6)

    ba_mod.solve_spd_loop = diag_solve
    try:
        P = 8192
        args = ba_problem(P)
        fn2d = make_sharded_ba(cfg, focal, mesh2)
        t2_diag = timeit(fn2d, args)
    finally:
        ba_mod.solve_spd_loop = real_solve
    args = ba_problem(8192)
    fn2 = make_sharded_ba(cfg, focal, mesh2)
    t2_real = timeit(fn2, args)
    results["solve_ablation_2dev_P8192"] = {
        "real_ms": round(t2_real * 1e3, 3),
        "diag_ms": round(t2_diag * 1e3, 3),
        "serial_solve_ms": round((t2_real - t2_diag) * 1e3, 3)}
    print(f"solve ablation @2dev/P=8192: real={t2_real * 1e3:.2f}ms "
          f"diag={t2_diag * 1e3:.2f}ms "
          f"-> serial solve ~{(t2_real - t2_diag) * 1e3:.2f}ms", flush=True)

    # weak-scaling accounting at the honest point (P/dev = 4096)
    t1_4096 = dict((r["P"], r["sec"]) for r in results["P_grid_1dev"])[4096]
    t2_8192 = dict((r["P"], r["sec"]) for r in results["P_grid_2dev"])[8192]
    overhead = t2_8192 - t1_4096
    results["weak_point"] = {
        "t_1dev_P4096_ms": round(t1_4096 * 1e3, 3),
        "t_2dev_P8192_ms": round(t2_8192 * 1e3, 3),
        "efficiency": round(t1_4096 / t2_8192, 3),
        "overhead_ms": round(overhead * 1e3, 3),
        "intercept_share_of_overhead": round(
            a / max(overhead, 1e-9), 3) if overhead > 0 else None,
    }
    print(json.dumps(results["weak_point"]), flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BA_PROFILE.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote BA_PROFILE.json", flush=True)


if __name__ == "__main__":
    main()
