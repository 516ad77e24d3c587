"""Batched multi-sequence tracking: the throughput configuration.

Frame-to-frame tracking is inherently sequential per sequence (SURVEY.md §7
hard part 2: each frame's prior is the previous frame's pose), so throughput
scales by tracking B independent sequences at once: `vmap(track_frame)` over
a batched VOState, with the batch axis sharded over the mesh "data" axis and
the seed/landmark arenas sharded over "map".  This is BASELINE.json's
"batched multi-sequence run: all 11 EuRoC sequences sharded ... on one host".

Under vmap, the keyframe-insertion `lax.cond` becomes a select (both branches
execute for the whole batch) — the throughput mode trades that overhead for
batch parallelism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import pipeline, state as st
from android_svo_tpu.parallel import mesh as mesh_lib


def make_batched_track(cfg: SVOConfig, cam, dims):
    """vmapped track_frame: (VOState[B], imgs (B,H,W)) -> (VOState[B], out[B])."""
    step = pipeline.make_track_frame(cfg, cam, dims)
    return jax.vmap(step)


def init_batched_state(cfg: SVOConfig, width: int, height: int,
                       batch: int) -> st.VOState:
    one = st.init_state(cfg, width, height)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
                        one)


def make_sharded_track(cfg: SVOConfig, cam, dims, mesh, batch: int):
    """Batched track step jitted over the mesh with real shardings.

    Returns (fn, state_shardings): fn(vo_b, imgs) with the batch axis on
    "data" and arena axes on "map"; XLA inserts the collectives (the seed and
    landmark gathers become all-gathers over ICI).
    """
    track_b = make_batched_track(cfg, cam, dims)
    vo_proto = init_batched_state(cfg, cam.width, cam.height, batch)
    vo_shard = mesh_lib.vo_sharding_tree(mesh, vo_proto, batched=True)
    from jax.sharding import NamedSharding, PartitionSpec as P
    img_shard = NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None, None))

    fn = jax.jit(track_b,
                 in_shardings=(vo_shard, img_shard),
                 out_shardings=(vo_shard, None),
                 donate_argnums=(0,))
    return fn, vo_shard
