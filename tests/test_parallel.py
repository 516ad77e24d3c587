"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import state as st
from android_svo_tpu.data.synthetic import default_camera
from android_svo_tpu.parallel import mesh as mesh_lib
from android_svo_tpu.parallel.multi_seq import (
    init_batched_state, make_batched_track, make_sharded_track)

TINY = SVOConfig(max_n_kfs=4, max_points=256, max_seeds=256,
                 img_align_n_iter=3, poseoptim_n_iter=2,
                 structureoptim_n_iter=2, max_epi_search_steps=16,
                 ransac_n_trials=8)


class TestMesh:
    def test_make_mesh_shapes(self):
        m = mesh_lib.make_mesh(8)
        assert m.shape == {"data": 2, "map": 4}
        m1 = mesh_lib.make_mesh(2)
        assert m1.shape == {"data": 1, "map": 2}

    def test_sharding_tree_specs(self):
        cfg = TINY
        cam = default_camera(128, 96)
        vo = init_batched_state(cfg, cam.width, cam.height, 4)
        mesh = mesh_lib.make_mesh(8)
        tree = mesh_lib.vo_sharding_tree(mesh, vo, batched=True)
        # seeds shard over (data, map); keyframe pyramids only over data
        assert tree.seeds.mu.spec == jax.sharding.PartitionSpec(
            "data", "map")
        assert tree.kfs.stack.spec == jax.sharding.PartitionSpec(
            "data", None, None, None, None)


class TestShardedStep:
    @pytest.mark.slow
    def test_sharded_matches_unsharded(self):
        """The mesh-sharded batched step must produce the same poses as the
        plain vmapped step (collectives are layout, not semantics)."""
        cfg = TINY
        cam = default_camera(128, 96)
        dims = st.arena_dims(cfg, cam.width, cam.height)
        batch = 4
        key = jax.random.PRNGKey(0)
        imgs = jax.random.uniform(key, (batch, 96, 128)) * 255.0

        vo = init_batched_state(cfg, cam.width, cam.height, batch)
        plain = jax.jit(make_batched_track(cfg, cam, dims))
        vo_p, out_p = plain(vo, imgs)

        mesh = mesh_lib.make_mesh(8)
        fn, vo_shard = make_sharded_track(cfg, cam, dims, mesh, batch)
        vo2 = jax.device_put(init_batched_state(cfg, cam.width, cam.height,
                                                batch), vo_shard)
        vo_s, out_s = fn(vo2, imgs)

        np.testing.assert_allclose(np.asarray(out_p["T_cw"].t),
                                   np.asarray(out_s["T_cw"].t), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_p["result"]),
                                   np.asarray(out_s["result"]))
        np.testing.assert_allclose(np.asarray(vo_p.seeds.mu),
                                   np.asarray(vo_s.seeds.mu), atol=1e-5)
