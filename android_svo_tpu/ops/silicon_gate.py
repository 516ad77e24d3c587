"""Silicon kernel-parity gate: verify the three Pallas kernels against
their pure-JAX fallbacks ON THE CURRENT BACKEND before trusting any
measurement.

Round-4 postmortem: `align_iclk` was silently wrong on the real v5e (a
Mosaic miscompile class the interpret-mode tests cannot see — cf. the
`pltpu.roll` negative-shift quirk documented at patch_pallas.py:99-110)
and the tracker collapsed after the first keyframe insertion while every
CPU test stayed green.  The reference never had this failure mode because
its SIMD kernels ran on the same silicon they shipped on
(feature_alignment.cpp:286,453).  This gate is the TPU equivalent of
"ships on the hardware": one small batch through each kernel, Pallas vs
fallback, run by `bench.py` before the timed pass (rc=4 on mismatch) and
by tests/test_patch_pallas.py on real TPU when one is attached.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class GateReport:
    ok: bool
    failures: list = field(default_factory=list)   # list[str]
    detail: dict = field(default_factory=dict)     # name -> max abs dev

    def as_dict(self):
        return {"ok": self.ok, "failures": self.failures,
                "detail": {k: round(float(v), 6)
                           for k, v in self.detail.items()}}


def _gate_stack(h: int, w: int, n_levels: int = 5):
    """Deterministic smooth-textured test pyramid (realistic gradients —
    pure noise would make ICLK trivially non-convergent and hide bugs)."""
    from android_svo_tpu.data import synthetic
    from android_svo_tpu.ops import pyramid

    cam = synthetic.default_camera(w, h)
    tex = synthetic.make_texture(jax.random.PRNGKey(7), 1024)
    img = synthetic.render(
        tex, cam, synthetic.lookdown_pose(0.0, 0.0, -3.0, (0.45, 0.0, 0.0)))
    return pyramid.build_stack(img, n_levels)


def run_gate(n: int = 256, h: int = 480, w: int = 640,
             seed: int = 0, interpret: bool = False) -> GateReport:
    """Compare sample/scan/align Pallas kernels to their fallbacks on the
    default backend.  Cheap (~1 s warm, a few s of kernel compiles cold).

    Tolerances are loose enough for f32 reassociation differences and
    tight enough that the r4 failure (tracking-destroying patch garbage)
    cannot pass.  `interpret=True` runs the Pallas side in interpret mode
    (CPU test path; on real hardware leave it False — interpret mode is
    exactly what the r4 miscompile hid behind).
    """
    from android_svo_tpu.ops import patch_pallas as pp

    pk = ({"interpret": True} if interpret else {"use_pallas": True})

    stack = jax.device_put(_gate_stack(h, w))
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lvl = jax.random.randint(k1, (n,), 0, 3)
    wl = (w >> lvl).astype(jnp.float32)
    hl = (h >> lvl).astype(jnp.float32)
    u01 = jax.random.uniform(k2, (n, 2))
    uv = jnp.stack([12 + u01[:, 0] * (wl - 24),
                    12 + u01[:, 1] * (hl - 24)], axis=-1)
    valid = jnp.ones((n,), bool)

    failures: list[str] = []
    detail: dict[str, float] = {}

    def check(name, a, b, tol, mask=None):
        a = np.asarray(jax.device_get(a), np.float64)
        b = np.asarray(jax.device_get(b), np.float64)
        if mask is not None:
            m = np.asarray(mask, bool)
            a, b = a[m], b[m]
        dev = float(np.abs(a - b).max()) if a.size else 0.0
        detail[name] = dev
        if dev > tol:
            failures.append(f"{name}: max|d|={dev:.4f} > {tol}")

    # -- sample_patches (both the grad path reproject uses and the plain one)
    pch_p, dx_p, dy_p = pp.sample_patches(stack, lvl, uv, 4, grad=True,
                                          valid=valid, **pk)
    pch_f, dx_f, dy_f = pp.sample_patches(stack, lvl, uv, 4, grad=True,
                                          use_pallas=False)
    check("sample.patch", pch_p, pch_f, 0.02)
    check("sample.dx", dx_p, dx_f, 0.02)
    check("sample.dy", dy_p, dy_f, 0.02)

    # -- epi_scan
    ang = jax.random.uniform(k3, (n,)) * (2 * np.pi)
    seg = jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1) * 10.0
    ref = pp.sample_patches(stack, lvl, uv, 4, use_pallas=False)
    nsteps = jax.random.randint(k4, (n,), 2, 30)
    tb_p, s_p = pp.epi_scan(stack, lvl, uv - seg, uv + seg, ref, 30, half=4,
                            n_steps_each=nsteps, h=h, w=w, **pk)
    tb_f, s_f = pp.epi_scan(stack, lvl, uv - seg, uv + seg, ref, 30, half=4,
                            n_steps_each=nsteps, h=h, w=w, use_pallas=False)
    fin = (np.isfinite(np.asarray(s_f)) & np.isfinite(np.asarray(s_p)))
    if int(fin.sum()) < 0.8 * n:
        failures.append(f"epi_scan: only {int(fin.sum())}/{n} finite")
    check("scan.best_t", tb_p, tb_f, 1e-3, mask=fin)
    check("scan.score", s_p, s_f, 2.0, mask=fin)

    # -- align_iclk (the r4 culprit): converge from a 1-2 px offset
    refp, rdx, rdy = pp.sample_patches(stack, lvl, uv, 4, grad=True,
                                       use_pallas=False)
    off = jax.random.uniform(k3, (n, 2), minval=-2.0, maxval=2.0)
    uv_p, cv_p, m_p = pp.align_iclk(stack, lvl, refp, rdx, rdy, uv + off,
                                    valid, 10, h=h, w=w, **pk)
    uv_f, cv_f, m_f = pp.align_iclk(stack, lvl, refp, rdx, rdy, uv + off,
                                    valid, 10, h=h, w=w, use_pallas=False)
    cv_p = np.asarray(cv_p)
    cv_f = np.asarray(cv_f)
    n_agree = int((cv_p == cv_f).sum())
    detail["align.conv_agree_frac"] = n_agree / n
    if n_agree < 0.95 * n:
        failures.append(f"align: convergence agrees {n_agree}/{n}")
    if cv_f.sum() and cv_p.sum() < 0.8 * cv_f.sum():
        failures.append(
            f"align: pallas converges {int(cv_p.sum())} vs "
            f"fallback {int(cv_f.sum())}")
    both = cv_p & cv_f
    check("align.uv", uv_p, uv_f, 0.05, mask=np.repeat(both[:, None], 2, 1))
    # converged estimates must land on the true position (catches a kernel
    # that "converges" to garbage consistently on both paths)
    err_p = np.linalg.norm(np.asarray(uv_p) - np.asarray(uv), axis=-1)
    if cv_p.sum():
        med = float(np.median(err_p[cv_p]))
        detail["align.med_err_px"] = med
        if med > 0.5:
            failures.append(f"align: median converged error {med:.3f} px")

    # -- align_iclk_mxu (window dump kernel + one-hot MXU einsums): the
    # live feature_align path when cfg.align_mxu (default).  Compared to
    # the same fallback spec.
    uv_m, cv_m, m_m = pp.align_iclk_mxu(stack, lvl, refp, rdx, rdy,
                                        uv + off, valid, 10, h=h, w=w,
                                        **pk)
    cv_m = np.asarray(cv_m)
    n_agree = int((cv_m == cv_f).sum())
    detail["align_mxu.conv_agree_frac"] = n_agree / n
    if n_agree < 0.95 * n:
        failures.append(f"align_mxu: convergence agrees {n_agree}/{n}")
    if cv_f.sum() and cv_m.sum() < 0.8 * cv_f.sum():
        failures.append(
            f"align_mxu: converges {int(cv_m.sum())} vs "
            f"fallback {int(cv_f.sum())}")
    # deviation vs fallback is quantile-gated: on TPU the XLA-gather
    # fallback itself carries ~0.1 px p99 noise (the MXU path is the more
    # accurate of the two — measured err-to-truth p99 0.022 vs 0.124 px),
    # so a max-deviation bound punishes the wrong side; the 0.5 px cap
    # still catches the window-offset/miscompile class cold
    bothm = cv_m & cv_f
    if bothm.sum():
        dm = np.linalg.norm(np.asarray(uv_m)[bothm]
                            - np.asarray(uv_f)[bothm], axis=-1)
        detail["align_mxu.uv_p90"] = float(np.percentile(dm, 90))
        detail["align_mxu.uv_max"] = float(dm.max())
        if np.percentile(dm, 90) > 0.05 or dm.max() > 0.5:
            failures.append(
                f"align_mxu: uv dev p90={np.percentile(dm, 90):.4f} "
                f"max={dm.max():.4f}")
    err_m = np.linalg.norm(np.asarray(uv_m) - np.asarray(uv), axis=-1)
    if cv_m.sum():
        med = float(np.median(err_m[cv_m]))
        detail["align_mxu.med_err_px"] = med
        if med > 0.5:
            failures.append(f"align_mxu: median converged error {med:.3f}")

    return GateReport(ok=not failures, failures=failures, detail=detail)
