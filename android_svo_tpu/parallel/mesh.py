"""Device mesh and sharding layout for the VO engine.

The reference's concurrency is 4 intra-process threads with mutex queues
(SURVEY.md §2c); the TPU-native equivalent is a 2D device mesh:

  * axis "data": independent sequences tracked in parallel (the batched
    multi-sequence configuration in BASELINE.json — the only classic data
    parallelism the domain admits, since frame t depends on frame t-1);
  * axis "map": the map-scale arenas (depth-filter seeds, landmarks,
    local-BA landmark blocks) sharded across chips — the counterpart of the
    reference's mapping-thread/queue split, with XLA-inserted collectives
    over ICI replacing the queues.

Sharding is expressed with NamedSharding/PartitionSpec and applied via jit
in_shardings/out_shardings; XLA inserts the all-gathers/psums.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from android_svo_tpu.core import state as st

DATA_AXIS = "data"
MAP_AXIS = "map"


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host process-group wiring (`jax.distributed.initialize`).

    The reference is single-process (SURVEY.md §2c); the TPU-native
    multi-host story is one JAX process per host, meshed over ICI within a
    slice and DCN across hosts.  Args fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on TPU
    pods all three are auto-detected and may stay None.  Returns True when
    a multi-process group was initialized, False for the single-process
    no-op (so callers can run the same script on one host).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # No explicit wiring: the only auto-detectable multi-process setup
        # is a TPU pod, detected from its launcher env (NOT via
        # `jax.default_backend()` — that initializes the XLA backend, after
        # which `jax.distributed.initialize` is forbidden; the explicit
        # path below used to die on exactly that, caught by
        # tests/test_distributed.py).
        if not any(v in os.environ for v in (
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                "CLOUD_TPU_TASK_ID")):
            return False
        jax.distributed.initialize()
        return True
    if coordinator_address is None or (num_processes or 1) <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_multihost_mesh(data: int | None = None) -> Mesh:
    """(data, map) mesh over ALL processes' devices, host-major.

    Layout policy: the "data" axis (independent sequences — no collectives
    between its shards) spans hosts, so DCN carries nothing hot; the "map"
    axis (seed/landmark/BA-landmark collectives: psum/all_gather) stays
    within a host's ICI domain.  With one host this degenerates to
    `make_mesh`.
    """
    n_hosts = jax.process_count()
    per_host = jax.local_device_count()
    if data is None:
        data = n_hosts
    # global device order from jax.devices() is process-major already;
    # reshape host-major so "map" never crosses a host boundary
    assert (n_hosts * per_host) % data == 0
    arr = np.array(jax.devices()).reshape(data,
                                          (n_hosts * per_host) // data)
    return Mesh(arr, (DATA_AXIS, MAP_AXIS))


def make_mesh(n_devices: int | None = None, data: int | None = None,
              devices=None) -> Mesh:
    """2D (data, map) mesh over the first n devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if data is None:
        data = 2 if n % 2 == 0 and n >= 4 else 1
    assert n % data == 0
    arr = np.array(devices).reshape(data, n // data)
    return Mesh(arr, (DATA_AXIS, MAP_AXIS))


def vo_sharding_tree(mesh: Mesh, vo: st.VOState, batched: bool):
    """Build a NamedSharding pytree matching `vo` (optionally with a leading
    batch axis on every leaf)."""
    d = (DATA_AXIS,) if batched else ()

    def leaf_spec(path: str, ndim: int):
        # arena-dim leaves: shard dim after the (optional) batch dim on "map"
        if (".seeds." in path) or (".points." in path):
            rest = (MAP_AXIS,) + (None,) * (ndim - len(d) - 1)
            return P(*(d + rest))
        return P(*(d + (None,) * (ndim - len(d))))

    flat, treedef = jax.tree_util.tree_flatten_with_path(vo)
    specs = []
    for path, leaf in flat:
        pstr = jax.tree_util.keystr(path)
        specs.append(NamedSharding(mesh, leaf_spec(pstr, leaf.ndim)))
    return jax.tree_util.tree_unflatten(treedef, specs)
