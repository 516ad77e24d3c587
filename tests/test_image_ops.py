"""Tests for L1 image ops: pyramid, bilinear interp, Shi-Tomasi, FAST,
grid feature selection, synthetic renderer (SURVEY.md §4 kernel-level
golden tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.ops import pyramid, interp, detect
from android_svo_tpu.data import synthetic

KEY = jax.random.PRNGKey(42)


class TestPyramid:
    def test_half_sample_mean(self):
        img = jnp.arange(16.0).reshape(4, 4)
        out = pyramid.half_sample(img)
        expected = np.array([[2.5, 4.5], [10.5, 12.5]])
        np.testing.assert_allclose(out, expected)

    def test_odd_size_drop(self):
        img = jnp.ones((5, 7))
        assert pyramid.half_sample(img).shape == (2, 3)

    def test_build_pyramid_levels(self):
        img = jax.random.uniform(KEY, (480, 640))
        pyr = pyramid.build_pyramid(img, 5)
        assert len(pyr) == 5
        assert pyr[4].shape == (30, 40)
        # energy preserved under mean pooling
        np.testing.assert_allclose(pyr[1].mean(), img.mean(), atol=1e-3)


class TestInterp:
    def test_integer_coords_exact(self):
        img = jax.random.uniform(KEY, (32, 32)) * 255
        uv = jnp.array([[3.0, 5.0], [10.0, 20.0]])
        vals = interp.bilinear_sample(img, uv)
        np.testing.assert_allclose(vals, [img[5, 3], img[20, 10]], rtol=1e-6)

    def test_halfway_mean(self):
        img = jnp.array([[0.0, 10.0], [20.0, 30.0]])
        v = interp.bilinear_sample(img, jnp.array([0.5, 0.5]))
        np.testing.assert_allclose(v, 15.0)

    def test_linear_ramp_gradient(self):
        # on I(x,y) = 3x + 7y the sampled gradient is exact
        xx, yy = jnp.meshgrid(jnp.arange(32.0), jnp.arange(32.0), indexing="xy")
        img = 3.0 * xx + 7.0 * yy
        centers = jnp.array([[10.3, 12.7], [5.5, 20.1]])
        patch, dx, dy = interp.extract_patches_with_grad(img, centers, 2)
        assert patch.shape == (2, 4, 4)
        np.testing.assert_allclose(dx, 3.0, atol=1e-4)
        np.testing.assert_allclose(dy, 7.0, atol=1e-4)

    def test_patch_offsets_layout(self):
        offs = interp.patch_offsets(2)
        assert offs.shape == (16, 2)
        np.testing.assert_allclose(offs[0], [-2.0, -2.0])
        np.testing.assert_allclose(offs[-1], [1.0, 1.0])

    def test_subpixel_shift_consistency(self):
        img = synthetic.make_texture(KEY, 128)
        c = jnp.array([[64.0, 64.0]])
        p0 = interp.extract_patches(img, c, 4)
        p1 = interp.extract_patches(img, c + jnp.array([0.25, 0.0]), 4)
        # shifted patch differs but stays close on smooth texture
        assert 0 < float(jnp.abs(p1 - p0).mean()) < 20.0


class TestDetect:
    def test_shi_tomasi_corner_vs_flat(self):
        # white square on black: corners of square score high, flat areas zero
        img = jnp.zeros((64, 64)).at[20:44, 20:44].set(255.0)
        s = detect.shi_tomasi_score_map(img)
        assert float(s[20, 20]) > 100.0        # corner
        assert float(s[32, 32]) == 0.0          # flat interior
        assert float(s[20, 32]) < float(s[20, 20])  # edge < corner

    def test_fast_detects_corner_not_edge(self):
        img = jnp.zeros((64, 64)).at[20:44, 20:44].set(255.0)
        m = detect.fast_corner_mask(img, 20.0)
        assert bool(m[20, 20]) or bool(m[21, 21])   # square corner fires
        assert not bool(m[32, 32])                   # flat interior
        assert not bool(m[5, 5])                     # flat exterior
        # long straight edge midpoint: FAST-9 should NOT fire
        assert not bool(m[20, 32])

    def test_detect_features_on_texture(self):
        cfg = SVOConfig()
        img = synthetic.make_texture(KEY, 256)
        pyr = pyramid.build_pyramid(img, 3)
        feats = detect.detect_features(pyr, None, cfg)
        n_valid = int(feats["valid"].sum())
        assert n_valid > 50                          # rich texture => many corners
        px = feats["px"][feats["valid"]]
        assert float(px[:, 0].max()) < 256 and float(px[:, 0].min()) >= 0
        # one feature per cell: all cell ids unique
        cid = detect.cell_index(px, 256, cfg.grid_size, 13)
        assert len(np.unique(np.asarray(cid))) == n_valid

    def test_occupancy_suppression(self):
        cfg = SVOConfig()
        img = synthetic.make_texture(KEY, 256)
        pyr = pyramid.build_pyramid(img, 3)
        feats = detect.detect_features(pyr, None, cfg)
        occupied = jnp.ones_like(feats["valid"])
        feats2 = detect.detect_features(pyr, occupied, cfg)
        assert int(feats2["valid"].sum()) == 0


class TestSynthetic:
    def test_render_shapes_and_range(self):
        cam = synthetic.default_camera(128, 96)
        tex = synthetic.make_texture(KEY, 512)
        img = synthetic.render(tex, cam, synthetic.lookdown_pose(0, 0, -3.0))
        assert img.shape == (96, 128)
        assert 0.0 <= float(img.min()) and float(img.max()) <= 255.0
        assert float(img.std()) > 10.0               # actual texture, not flat

    def test_translation_shifts_image(self):
        """Camera translation parallel to the plane shifts the image by
        fx * dx / depth pixels — validates the renderer geometry."""
        cam = synthetic.default_camera(128, 96)
        tex = synthetic.make_texture(KEY, 1024)
        z = -3.0
        dx_world = 0.1
        img0 = synthetic.render(tex, cam, synthetic.lookdown_pose(0, 0, z))
        img1 = synthetic.render(tex, cam, synthetic.lookdown_pose(dx_world, 0, z))
        shift_px = 420.0 * dx_world / 3.0            # = 14 px
        s = int(round(shift_px))
        # camera moving +x shifts image content towards -x:
        # img1(x) == img0(x + s)
        a = img0[:, s:]
        b = img1[:, : 128 - s]
        err = float(jnp.abs(a - b).mean())
        assert err < 0.1, err

    def test_true_depth(self):
        cam = synthetic.default_camera(128, 96)
        pose = synthetic.lookdown_pose(0, 0, -2.5)
        d = synthetic.true_depth(cam, pose, jnp.array([[63.5, 47.5]]))
        np.testing.assert_allclose(d, 2.5, atol=1e-4)  # principal ray
