"""Pallas patch kernels vs the pure-JAX spec (interpret mode on CPU).

The fallback implementations in ops/patch_pallas.py are the semantic spec
(matching interp.extract_patches* conventions); the Pallas kernels must agree
for interior samples.  Border/out-of-level behaviour is don't-care by the
masking contract (module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from android_svo_tpu.ops import patch_pallas as pp
from android_svo_tpu.ops.pyramid import build_stack

H, W, L = 64, 256, 3


@pytest.fixture(scope="module")
def stack():
    img = jax.random.uniform(jax.random.PRNGKey(1), (H, W), jnp.float32,
                             minval=0.0, maxval=255.0)
    return build_stack(img, L)


def _interior_uv(key, n, lvl, margin):
    wl = W >> lvl
    hl = H >> lvl
    k1, k2 = jax.random.split(key)
    return jnp.stack([
        jax.random.uniform(k1, (n,), minval=margin, maxval=wl - margin),
        jax.random.uniform(k2, (n,), minval=margin, maxval=hl - margin),
    ], axis=-1)


class TestSamplePatches:
    @pytest.mark.parametrize("half,grad", [(4, False), (4, True), (2, True)])
    def test_matches_fallback(self, stack, half, grad):
        n = 6
        parts = []
        lvls = []
        for lvl in range(L):
            uv = _interior_uv(jax.random.PRNGKey(10 + lvl), n, lvl,
                              half + 3)
            parts.append(uv)
            lvls.append(jnp.full((n,), lvl, jnp.int32))
        uv = jnp.concatenate(parts)
        lvl = jnp.concatenate(lvls)
        ref = pp.sample_patches(stack, lvl, uv, half, grad,
                                use_pallas=False)
        out = pp.sample_patches(stack, lvl, uv, half, grad, interpret=True)
        if grad:
            for a, b, name in zip(ref, out, ["patch", "dx", "dy"]):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-3, err_msg=name)
        else:
            np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                       atol=1e-3)

    def test_integer_coords_exact(self, stack):
        uv = jnp.array([[20.0, 17.0], [100.0, 40.0]], jnp.float32)
        lvl = jnp.zeros((2,), jnp.int32)
        out = pp.sample_patches(stack, lvl, uv, 4, interpret=True)
        img = np.asarray(stack[0])
        for i, (x, y) in enumerate([(20, 17), (100, 40)]):
            np.testing.assert_allclose(
                np.asarray(out[i]), img[y - 4:y + 4, x - 4:x + 4], atol=1e-4)

    def test_bottom_edge_not_shifted(self, stack):
        """Regression: samples whose window origin lands within 12 px of the
        plane's bottom/right used to be clamped harder than the crop
        accounted for, shifting the patch by up to several rows (the r2 TPU
        accuracy bug — corrupt sparse-align patches at the bottom of level
        substacks).  The clamp must only bind for out-of-plane crops."""
        for half, grad in ((2, True), (4, False)):
            margin = half + (2 if grad else 1)
            # deepest valid positions on the level-0 plane (H x W exactly)
            uv = jnp.array([[W - 1.0 - margin, H - 1.0 - margin],
                            [W * 0.5, H - 1.0 - margin],
                            [W - 1.0 - margin, H * 0.5]], jnp.float32)
            lvl = jnp.zeros((3,), jnp.int32)
            ref = pp.sample_patches(stack, lvl, uv, half, grad,
                                    use_pallas=False)
            out = pp.sample_patches(stack, lvl, uv, half, grad,
                                    interpret=True)
            ref = ref if isinstance(ref, tuple) else (ref,)
            out = out if isinstance(out, tuple) else (out,)
            for a, b in zip(ref, out):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-3)

    def test_garbage_inputs_are_finite(self, stack):
        uv = jnp.array([[jnp.nan, 1e9], [-50.0, -50.0], [1e9, jnp.nan]],
                       jnp.float32)
        lvl = jnp.array([0, 7, -3], jnp.int32)
        out = pp.sample_patches(stack, lvl, uv, 4, interpret=True)
        assert np.isfinite(np.asarray(out)).all()


class TestEpiScan:
    def test_finds_planted_patch(self, stack):
        # take a real patch from the image, scan a segment through it
        img = stack[0]
        cx, cy = 120.0, 30.0
        ref = pp.sample_patches(stack, jnp.zeros((1,), jnp.int32),
                                jnp.array([[cx, cy]], jnp.float32), 4,
                                use_pallas=False)
        uv_a = jnp.array([[cx - 8.0, cy - 4.0]], jnp.float32)
        uv_b = jnp.array([[cx + 8.0, cy + 4.0]], jnp.float32)
        lvl = jnp.zeros((1,), jnp.int32)
        for kwargs in [dict(use_pallas=False), dict(interpret=True)]:
            t, s = pp.epi_scan(stack, lvl, uv_a, uv_b, ref, n_steps_max=33,
                               half=4, h=H, w=W, **kwargs)
            assert abs(float(t[0]) - 0.5) < 0.04, kwargs
            assert float(s[0]) < 1.0, kwargs

    def test_matches_fallback(self, stack):
        n = 5
        key = jax.random.PRNGKey(3)
        uv_a = _interior_uv(key, n, 0, 12)
        uv_b = uv_a + 10.0
        lvl = jnp.zeros((n,), jnp.int32)
        ref = pp.sample_patches(stack, lvl, uv_a, 4, use_pallas=False)
        # per-seed dynamic step counts must agree between spec and kernel
        ns = jnp.array([17, 9, 3, 17, 5], jnp.int32)
        t0, s0 = pp.epi_scan(stack, lvl, uv_a, uv_b, ref, n_steps_max=17,
                             half=4, n_steps_each=ns, h=H, w=W,
                             use_pallas=False)
        t1, s1 = pp.epi_scan(stack, lvl, uv_a, uv_b, ref, n_steps_max=17,
                             half=4, n_steps_each=ns, h=H, w=W,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-3, atol=1e-2)

    def test_short_count_scans_fewer_positions(self, stack):
        # with k=2 only the endpoints are scored -> best t is 0 or 1
        uv_a = _interior_uv(jax.random.PRNGKey(5), 1, 0, 12)
        uv_b = uv_a + 8.0
        lvl = jnp.zeros((1,), jnp.int32)
        ref = pp.sample_patches(stack, lvl, uv_a + 4.0, 4, use_pallas=False)
        ns = jnp.array([2], jnp.int32)
        for kwargs in [dict(use_pallas=False), dict(interpret=True)]:
            t, _ = pp.epi_scan(stack, lvl, uv_a, uv_b, ref, n_steps_max=33,
                               half=4, n_steps_each=ns, h=H, w=W, **kwargs)
            assert float(t[0]) in (0.0, 1.0), kwargs

    def test_out_of_image_segment_scores_inf(self, stack):
        uv_a = jnp.array([[-100.0, -100.0]], jnp.float32)
        uv_b = jnp.array([[-80.0, -100.0]], jnp.float32)
        lvl = jnp.zeros((1,), jnp.int32)
        ref = jnp.ones((1, 8, 8), jnp.float32)
        for kwargs in [dict(use_pallas=False), dict(interpret=True)]:
            _, s = pp.epi_scan(stack, lvl, uv_a, uv_b, ref, n_steps_max=9,
                               half=4, h=H, w=W, **kwargs)
            assert not np.isfinite(float(s[0])), kwargs


@pytest.fixture(scope="module")
def smooth_stack():
    """White noise has no alignment basin beyond ~1px; smooth it so ICLK
    has gradients to follow (like a real image)."""
    img = jax.random.uniform(jax.random.PRNGKey(2), (H, W), jnp.float32,
                             minval=0.0, maxval=255.0)
    k = jnp.ones((5, 5), jnp.float32) / 25.0
    img = jax.scipy.signal.convolve2d(img, k, mode="same")
    return build_stack(img, L)


class TestAlignICLK:
    def _setup(self, stack, n=5, lvl_val=0, shift=(1.3, -0.9)):
        key = jax.random.PRNGKey(21)
        uv_gt = _interior_uv(key, n, lvl_val, 14)
        lvl = jnp.full((n,), lvl_val, jnp.int32)
        ref, gx, gy = pp.sample_patches(stack, lvl, uv_gt, 4, grad=True,
                                        use_pallas=False)
        init = uv_gt + jnp.array(shift, jnp.float32)
        return lvl, ref, gx, gy, uv_gt, init

    def test_recovers_shift_both_paths(self, smooth_stack):
        stack = smooth_stack
        lvl, ref, gx, gy, uv_gt, init = self._setup(stack)
        for kwargs in [dict(use_pallas=False), dict(interpret=True)]:
            uv, conv, _ = pp.align_iclk(
                stack, lvl, ref, gx, gy, init, jnp.ones(5, bool),
                n_iter=12, h=H, w=W, **kwargs)
            assert bool(conv.all()), (kwargs, np.asarray(conv))
            np.testing.assert_allclose(np.asarray(uv), np.asarray(uv_gt),
                                       atol=0.05, err_msg=str(kwargs))

    def test_kernel_matches_fallback(self, smooth_stack):
        stack = smooth_stack
        lvl, ref, gx, gy, uv_gt, init = self._setup(stack, lvl_val=1,
                                                    shift=(0.8, 0.5))
        uv0, c0, m0 = pp.align_iclk(stack, lvl, ref, gx, gy, init,
                                    jnp.ones(5, bool), n_iter=6, h=H, w=W,
                                    use_pallas=False)
        uv1, c1, m1 = pp.align_iclk(stack, lvl, ref, gx, gy, init,
                                    jnp.ones(5, bool), n_iter=6, h=H, w=W,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(uv0), np.asarray(uv1),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(c0), np.asarray(c1))

    def test_invalid_stays_put(self, smooth_stack):
        stack = smooth_stack
        lvl, ref, gx, gy, uv_gt, init = self._setup(stack, n=5)
        for kwargs in [dict(use_pallas=False), dict(interpret=True)]:
            uv, conv, _ = pp.align_iclk(
                stack, lvl, ref, gx, gy, init, jnp.zeros(5, bool),
                n_iter=6, h=H, w=W, **kwargs)
            np.testing.assert_allclose(np.asarray(uv), np.asarray(init))
            assert not bool(conv.any())


class TestStack:
    def test_levels_placed_top_left(self):
        img = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
        st = build_stack(img, 3)
        assert st.shape == (3, H, W)
        np.testing.assert_allclose(np.asarray(st[0]), np.asarray(img))
        assert float(jnp.abs(st[1, H // 2:, :]).max()) == 0.0
        assert float(jnp.abs(st[1, :, W // 2:]).max()) == 0.0


class TestSiliconGate:
    """The bench's pre-publish kernel gate (silicon_gate.run_gate).

    On CPU we exercise it in interpret mode; on a real TPU run (manual:
    `python scripts/probe_silicon_parity.py`) the same comparisons run
    against compiled Mosaic kernels — the r4 failure mode this gate exists
    to catch (VERDICT r4 #8).
    """

    def test_gate_passes_interpret(self):
        from android_svo_tpu.ops.silicon_gate import run_gate
        rep = run_gate(n=64, h=240, w=320, interpret=True)
        assert rep.ok, rep.failures
        assert rep.detail["align.med_err_px"] < 0.2

    def test_gate_catches_broken_align(self, monkeypatch):
        """Sabotage the Pallas align path the way the r4 miscompile did
        (garbage positions) and check the gate refuses."""
        from android_svo_tpu.ops import silicon_gate

        real = pp.align_iclk

        def broken(stack, lvl, ref, dx, dy, init_uv, valid, n_iter,
                   h=None, w=None, use_pallas=None, interpret=False):
            uv, conv, mean = real(stack, lvl, ref, dx, dy, init_uv, valid,
                                  n_iter, h=h, w=w, use_pallas=False)
            if interpret or use_pallas:    # "pallas" side only
                uv = uv + 7.0              # patch landed a window off
            return uv, conv, mean

        monkeypatch.setattr(pp, "align_iclk", broken)
        monkeypatch.setattr(silicon_gate, "pp", pp, raising=False)
        rep = silicon_gate.run_gate(n=64, h=240, w=320, interpret=True)
        assert not rep.ok
        assert any("align" in f for f in rep.failures)


class TestAlignMxu:
    """Window-dump + one-hot-einsum ICLK (`align_iclk_mxu`) vs the
    fallback spec — the cfg.align_mxu live path."""

    @pytest.fixture(scope="class")
    def smooth(self):
        from android_svo_tpu.data import synthetic
        cam = synthetic.default_camera(320, 240)
        tex = synthetic.make_texture(jax.random.PRNGKey(7), 1024)
        img = synthetic.render(tex, cam, synthetic.lookdown_pose(
            0.0, 0.0, -3.0, (0.45, 0.0, 0.0)))
        return build_stack(img, 3)

    def _problem(self, stack, n=48):
        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        lvl = jax.random.randint(k1, (n,), 0, 3)
        wl = (320 >> lvl).astype(jnp.float32)
        hl = (240 >> lvl).astype(jnp.float32)
        u01 = jax.random.uniform(k2, (n, 2))
        uv = jnp.stack([12 + u01[:, 0] * (wl - 24),
                        12 + u01[:, 1] * (hl - 24)], -1)
        ref, dx, dy = pp.sample_patches(stack, lvl, uv, 4, grad=True,
                                        use_pallas=False)
        off = jax.random.uniform(k3, (n, 2), minval=-2.0, maxval=2.0)
        return lvl, uv, ref, dx, dy, off

    def test_matches_fallback(self, smooth):
        n = 48
        lvl, uv, ref, dx, dy, off = self._problem(smooth, n)
        valid = jnp.ones((n,), bool)
        uv_m, cv_m, m_m = pp.align_iclk_mxu(
            smooth, lvl, ref, dx, dy, uv + off, valid, 10, h=240, w=320,
            use_pallas=False)
        uv_f, cv_f, m_f = pp.align_iclk(
            smooth, lvl, ref, dx, dy, uv + off, valid, 10, h=240, w=320,
            use_pallas=False)
        cv_m = np.asarray(cv_m)
        cv_f = np.asarray(cv_f)
        assert (cv_m == cv_f).mean() > 0.95
        both = cv_m & cv_f
        np.testing.assert_allclose(np.asarray(uv_m)[both],
                                   np.asarray(uv_f)[both], atol=0.05)
        err = np.linalg.norm(np.asarray(uv_m) - np.asarray(uv), axis=-1)
        assert np.median(err[cv_m]) < 0.1

    def test_dump_kernel_interpret_matches_fallback(self, smooth):
        n = 32
        lvl, uv, ref, dx, dy, off = self._problem(smooth, n)
        valid = jnp.ones((n,), bool)
        w_i, org_i = pp.dump_windows(smooth, lvl, uv, valid,
                                     interpret=True)
        w_f, org_f = pp.dump_windows(smooth, lvl, uv, valid,
                                     use_pallas=False)
        np.testing.assert_array_equal(np.asarray(org_i), np.asarray(org_f))
        np.testing.assert_allclose(np.asarray(w_i), np.asarray(w_f),
                                   atol=1e-5)

    def test_inline_gate_rejects_flat_and_mismatched(self, smooth):
        n = 32
        lvl, uv, ref, dx, dy, off = self._problem(smooth, n)
        valid = jnp.ones((n,), bool)
        # flat stack: information floor must reject everything
        flat = jnp.full_like(smooth, 100.0)
        _, cv, _ = pp.align_iclk_mxu(
            flat, lvl, ref, dx, dy, uv + off, valid, 10, h=240, w=320,
            use_pallas=False, zmssd_factor=2000.0, min_patch_std=5.0)
        assert not bool(np.asarray(cv).any())
        # matching stack with the gate on: most must still converge
        _, cv2, _ = pp.align_iclk_mxu(
            smooth, lvl, ref, dx, dy, uv + off, valid, 10, h=240, w=320,
            use_pallas=False, zmssd_factor=2000.0, min_patch_std=5.0)
        assert np.asarray(cv2).mean() > 0.8
