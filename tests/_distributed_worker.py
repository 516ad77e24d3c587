"""Worker process for tests/test_distributed.py: one JAX process in a
2-process localhost CPU "multi-host" group.

Exercises the real multi-process code path the multi-host BASELINE configs
depend on (SURVEY.md §2c / §7 L6): `jax.distributed.initialize` over a
localhost coordinator (the DCN stand-in), `make_multihost_mesh`, a psum
across the full mesh, and one sharded local-BA step with landmark shards
built per-process via `jax.make_array_from_callback`.

Usage: python _distributed_worker.py <coordinator> <num_procs> <proc_id>
Prints one line: OK <chi2> <psum> on success.
"""

import os
import sys

os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    coordinator, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]))
    from android_svo_tpu.parallel import mesh as mesh_lib

    did_init = mesh_lib.initialize_distributed(
        coordinator_address=coordinator, num_processes=num_procs,
        process_id=proc_id)
    assert did_init, "initialize_distributed returned False"
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 2 * num_procs, jax.devices()

    mesh = mesh_lib.make_multihost_mesh()          # (data=hosts, map=local)
    assert mesh.shape == {"data": num_procs, "map": 2}, mesh.shape
    # the "map" axis must stay within this process's devices (the ICI
    # domain in the real deployment) — check against the mesh layout
    local = set(jax.local_devices())
    rows_local = [all(d in local for d in row) or
                  all(d not in local for d in row)
                  for row in mesh.devices]
    assert all(rows_local), "map axis crosses a process boundary"

    # -- collective over the full mesh (both axes: ICI psum + DCN psum) ---
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data", "map"))
    n_dev = num_procs * 2
    global_shape = (n_dev, 8)

    def cb(index):
        # global array value: row i = i, sharded over (data, map)
        rows = np.arange(global_shape[0], dtype=np.float32)[index[0]]
        full = np.broadcast_to(rows[:, None],
                               (rows.shape[0], global_shape[1]))
        return full[:, index[1]]

    x = jax.make_array_from_callback(global_shape, sh, cb)
    total = jax.jit(lambda v: jnp.sum(v),
                    out_shardings=NamedSharding(mesh, P()))(x)
    expect = 8 * sum(range(n_dev))
    got = float(jax.device_get(total))
    assert got == expect, (got, expect)

    # -- one sharded local-BA step over the multi-process mesh ------------
    from android_svo_tpu.config import SVOConfig
    from android_svo_tpu.geometry.se3 import SE3
    from android_svo_tpu.parallel.ba import local_ba, make_sharded_ba

    cfg = SVOConfig(loba_n_iter=3)
    focal = 120.0
    Pn, K, O = 64, 4, 4
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    pos_gt = jax.random.uniform(k1, (Pn, 3), jnp.float32, minval=-1.0,
                                maxval=1.0).at[:, 2].add(4.0)
    q_kw = jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (K, 1))
    t_kw = jnp.stack([jnp.linspace(-0.5, 0.5, K), jnp.zeros((K,)),
                      jnp.zeros((K,))], axis=-1)
    obs_f = []
    for k in range(K):
        xyz = SE3(q=q_kw[k], t=t_kw[k]).apply(pos_gt)
        obs_f.append(xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True))
    obs_f = jnp.stack(obs_f, axis=1)[:, :O]
    obs_kf = jnp.tile(jnp.arange(K, dtype=jnp.int32), (Pn, 1))
    pos0 = pos_gt + 0.02 * jax.random.normal(k2, (Pn, 3), jnp.float32)
    valid = jnp.ones((Pn,), bool)
    core = jnp.arange(K, dtype=jnp.int32)
    fixed = jnp.zeros((K,), bool).at[0].set(True)

    # single-process reference (every process computes it independently)
    q_r, t_r, pos_r, chi_r = jax.jit(
        lambda *a: local_ba(*a, focal=focal, cfg=cfg))(
        pos0, valid, obs_kf, obs_f, q_kw, t_kw, core, fixed)

    # global sharded inputs: landmark axis over "map", rest replicated
    def shard_p(a):
        a = np.asarray(a)
        sh = NamedSharding(mesh, P("map", *([None] * (a.ndim - 1))))
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx: a[idx])

    def repl(a):
        a = np.asarray(a)
        sh = NamedSharding(mesh, P())
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    fn = make_sharded_ba(cfg, focal, mesh)
    q_s, t_s, pos_s, chi_s = fn(shard_p(pos0), shard_p(valid),
                                shard_p(obs_kf), shard_p(obs_f),
                                repl(q_kw), repl(t_kw), repl(core),
                                repl(fixed))
    np.testing.assert_allclose(np.asarray(jax.device_get(q_s)),
                               np.asarray(q_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.device_get(t_s)),
                               np.asarray(t_r), atol=1e-5)
    chi_s = float(jax.device_get(chi_s))
    assert abs(chi_s - float(chi_r)) < 1e-4 * max(1.0, float(chi_r))

    print(f"OK {chi_s:.6f} {got:.1f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
