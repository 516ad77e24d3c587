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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from android_svo_tpu.core import state as st

DATA_AXIS = "data"
MAP_AXIS = "map"


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
