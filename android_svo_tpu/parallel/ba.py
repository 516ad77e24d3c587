"""Local bundle adjustment via Schur complement — landmark blocks eliminated
on-chip, reduced camera system assembled by a sum over the (shardable)
landmark axis.

The reference gates `ba::localBA` behind USE_BUNDLE_ADJUSTMENT and never
ships the implementation (`frame_handler_mono.cpp:280-295`, SURVEY.md §5) —
this is built from the spec: GN over the core keyframe window
(`Config::lobaNumIter/loba_robust_huber_width`, config.h:88-91) with Huber
weights on unit-plane reprojection residuals.

Distribution (SURVEY.md §2c "TPU-native equivalents"): every per-landmark
quantity (U_p, its Cholesky, the G_pc cross blocks) is computed
independently per landmark, so sharding the landmark axis over the mesh
"map" axis turns the reduced-camera-system contraction `einsum("p...")`
into an XLA psum over ICI.  The dense (6*NC)^2 reduced solve is replicated
(NC <= ~5 keyframes -> 30x30).

Math (standard Schur):
    [H_cc  H_cp] [dx_c]   [-b_c]
    [H_pc  H_pp] [dx_p] = [-b_p]
    S = H_cc - H_cp H_pp^-1 H_pc;   rhs = -b_c + H_cp H_pp^-1 b_p
    S dx_c = rhs;   dx_p = -H_pp^-1 (b_p + H_pc dx_c)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry import robust
from android_svo_tpu.geometry.camera import project2d
from android_svo_tpu.geometry.linsolve import inv_spd, solve_spd_loop
from android_svo_tpu.geometry.se3 import SE3, hat


def local_ba(pos: jnp.ndarray, point_valid: jnp.ndarray,
             obs_kf: jnp.ndarray, obs_f: jnp.ndarray,
             q_kw: jnp.ndarray, t_kw: jnp.ndarray,
             core_slots: jnp.ndarray, fixed: jnp.ndarray,
             focal, cfg: SVOConfig):
    """Jointly refine core keyframe poses and landmark positions.

    Args:
      pos: (P, 3) landmark positions (world).
      point_valid: (P,) landmarks to include.
      obs_kf: (P, O) keyframe slot of each observation (-1 = empty).
      obs_f: (P, O, 3) measured unit bearings.
      q_kw/t_kw: (K, 4)/(K, 3) keyframe poses (world->kf).
      core_slots: (NC,) keyframe slots being optimized (static size).
      fixed: (NC,) gauge mask — fixed cameras receive no update.
      focal: focal length for the Huber width conversion.

    Returns (q_kw', t_kw', pos', chi2) — poses updated at core_slots only.
    """
    dtype = pos.dtype
    P, O = obs_kf.shape
    NC = core_slots.shape[0]
    huber_width = cfg.loba_robust_huber_width / focal

    # observation -> core-camera index (or -1)
    is_core = obs_kf[:, :, None] == core_slots[None, None, :]   # (P,O,NC)
    core_idx = jnp.argmax(is_core, axis=-1)
    in_core = jnp.any(is_core, axis=-1) & (obs_kf >= 0)
    obs_ok = in_core & point_valid[:, None]
    Ehot = is_core.astype(dtype)                                # (P,O,NC)

    for _ in range(cfg.loba_n_iter):
        q_kw, t_kw, pos, chi2 = _ba_iteration(
            pos, obs_f, obs_ok, Ehot, q_kw, t_kw, core_slots, fixed,
            obs_kf, huber_width, point_valid, cfg)
    return q_kw, t_kw, pos, chi2


def _ba_iteration(pos, obs_f, obs_ok, Ehot, q_kw, t_kw, core_slots, fixed,
                  obs_kf, huber_width, point_valid, cfg):
    dtype = pos.dtype
    P, O = obs_kf.shape
    NC = core_slots.shape[0]

    kf_idx = jnp.maximum(obs_kf, 0)
    T = SE3(q=q_kw[kf_idx], t=t_kw[kf_idx])                 # (P,O) poses
    xyz = T.apply(pos[:, None, :])                          # (P,O,3)
    # depth gate: a landmark almost AT a camera plane produces zi^2-scale
    # Jacobians (1e12+) that overflow the f32 Schur algebra on TPU — such
    # an observation is geometric garbage anyway, so exclude it outright
    # (1e-2 is ~2% of the map scale; the reference never optimizes points
    # this close because its matcher gates them out first)
    ok = obs_ok & (xyz[..., 2] > 1e-2)
    z = jnp.where(ok, xyz[..., 2], 1.0)
    x, y = xyz[..., 0], xyz[..., 1]
    uv_meas = project2d(obs_f)
    e = jnp.stack([x / z, y / z], axis=-1) - uv_meas        # (P,O,2)
    e = jnp.where(ok[..., None], e, 0.0)
    enorm = jnp.linalg.norm(e, axis=-1)
    w = robust.huber_weight(enorm / jnp.maximum(huber_width, 1e-12))
    w = w * ok.astype(dtype)
    chi2 = jnp.sum(w * enorm * enorm)

    zi = 1.0 / z
    zi2 = zi * zi
    dpi = jnp.stack([
        jnp.stack([zi, jnp.zeros_like(zi), -x * zi2], axis=-1),
        jnp.stack([jnp.zeros_like(zi), zi, -y * zi2], axis=-1),
    ], axis=-2)                                             # (P,O,2,3)
    R = T.rotation_matrix()                                 # (P,O,3,3)
    Jp = dpi @ R                                            # (P,O,2,3) d/dpos
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), xyz.shape + (3,))
    Jc = dpi @ jnp.concatenate([eye, -hat(xyz)], axis=-1)   # (P,O,2,6)
    Jp = jnp.where(ok[..., None, None], Jp, 0.0)
    Jc = jnp.where(ok[..., None, None], Jc, 0.0)
    wJp = w[..., None, None] * Jp
    wJc = w[..., None, None] * Jc

    # landmark blocks
    Upp = jnp.einsum("poij,poik->pjk", wJp, Jp)             # (P,3,3)
    Upp = Upp + 1e-5 * jnp.eye(3, dtype=dtype)
    bp = jnp.einsum("poij,poi->pj", wJp, e)                 # (P,3)
    Upp_inv = inv_spd(Upp)

    # camera blocks (scattered to core index via one-hot)
    Hcc = jnp.einsum("poc,poij,poik->cjk", Ehot, wJc, Jc)   # (NC,6,6)
    bc = jnp.einsum("poc,poij,poi->cj", Ehot, wJc, e)       # (NC,6)

    # cross terms: Y_po = Jc^T W Jp (6,3); G_pc = sum_o E Y
    Y = jnp.einsum("poij,poik->pojk", wJc, Jp)              # (P,O,6,3)
    G = jnp.einsum("poc,pojk->pcjk", Ehot, Y)               # (P,NC,6,3)

    # Schur reduction over the landmark axis (this einsum is the psum when
    # the p axis is sharded over the mesh)
    GU = jnp.einsum("pcjk,pkl->pcjl", G, Upp_inv)           # (P,NC,6,3)
    S_red = jnp.einsum("pcjl,pdml->cdjm", GU, G)            # (NC,NC,6,6)
    rhs_red = jnp.einsum("pcjl,pl->cj", GU, bp)             # (NC,6)

    S = _to_dense(Hcc, NC, dtype) - _cross_to_dense(S_red, NC)
    rhs = (-bc + rhs_red).reshape(NC * 6)

    # gauge fixing: zero rows/cols of fixed cameras, unit diagonal
    fix = jnp.repeat(fixed, 6)
    S = jnp.where(fix[:, None] | fix[None, :], 0.0, S)
    S = S + jnp.diag(jnp.where(fix, 1.0, 1e-6 * (jnp.trace(S) /
                                                 (6 * NC) + 1.0)))
    dxc = solve_spd_loop(S, rhs)                          # (NC*6,)
    dxc = jnp.where(fix, 0.0, dxc).reshape(NC, 6)
    # f32 safety net: a badly-conditioned reduced system (possible when an
    # outlier landmark survives the gates) must degrade to "no update", not
    # poison the keyframe arena — the NLLS-solver-template rollback analog
    # (nlls_solver_impl.hpp:62-74) for a solver with no chi2 re-check
    cam_ok = (jnp.all(jnp.isfinite(dxc), axis=-1)
              & (jnp.linalg.norm(dxc, axis=-1) < 10.0))
    dxc = jnp.where(cam_ok[:, None], dxc, 0.0)

    # back-substitute landmarks: dx_p = -Upp^-1 (bp + H_pc dx_c)
    Hpc_dxc = jnp.einsum("pcjk,cj->pk", G, dxc)             # (P,3)
    dxp = -jnp.einsum("pkl,pl->pk", Upp_inv, bp + Hpc_dxc)
    has_obs = jnp.any(ok, axis=1)
    step_ok = (jnp.all(jnp.isfinite(dxp), axis=-1)
               & (jnp.linalg.norm(dxp, axis=-1)
                  < 1.0 + jnp.linalg.norm(pos, axis=-1)))
    pos_new = jnp.where((point_valid & has_obs & step_ok)[:, None],
                        pos + dxp, pos)

    # apply camera updates: T_kw <- exp(dx) o T_kw
    T_core = SE3(q=q_kw[core_slots], t=t_kw[core_slots])
    T_new = SE3.exp(dxc).compose(T_core).normalize()
    q_out = q_kw.at[core_slots].set(T_new.q)
    t_out = t_kw.at[core_slots].set(T_new.t)
    return q_out, t_out, pos_new, chi2


def _to_dense(Hcc, NC, dtype):
    """Block-diagonal (NC,6,6) -> (NC*6, NC*6)."""
    S = jnp.zeros((NC, 6, NC, 6), dtype)
    idx = jnp.arange(NC)
    S = S.at[idx, :, idx, :].set(Hcc)
    return S.reshape(NC * 6, NC * 6)


def _cross_to_dense(S_red, NC):
    """(NC,NC,6,6) -> (NC*6, NC*6)."""
    return jnp.transpose(S_red, (0, 2, 1, 3)).reshape(NC * 6, NC * 6)


def make_sharded_ba(cfg: SVOConfig, focal, mesh):
    """`local_ba` jitted over a mesh with the landmark axis sharded on "map".

    Every per-landmark input (pos, point_valid, obs_kf, obs_f) is split
    across the MAP axis; keyframe poses and the core-window selection are
    replicated.  Under these shardings XLA turns the Schur reductions
    (`S_red`/`rhs_red` einsums over `p`, ba.py:116-127) into per-shard
    partial contractions + a psum over ICI — the distributed local BA of
    SURVEY.md §7 L6.  Returns fn(pos, valid, obs_kf, obs_f, q_kw, t_kw,
    core, fixed) -> (q', t', pos', chi2) with pos' sharded like pos.
    """
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from android_svo_tpu.parallel.mesh import MAP_AXIS

    def shard_p(ndim):
        return NamedSharding(mesh, P(MAP_AXIS, *([None] * (ndim - 1))))

    rep = NamedSharding(mesh, P())
    in_sh = (shard_p(2), shard_p(1), shard_p(2), shard_p(3),
             rep, rep, rep, rep)
    out_sh = (rep, rep, shard_p(2), rep)
    fn = functools.partial(local_ba, focal=focal, cfg=cfg)
    return jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh)


def select_core_keyframes(q_kw, t_kw, kf_valid, T_cw: SE3, n_core: int):
    """The n_core closest valid keyframes to the current camera
    (ref Map::getCloseKeyframes + overlap sort, reprojector.cpp:82-87).
    Returns (core_slots (n_core,), fixed (n_core,)) — the farthest selected
    keyframe is the gauge anchor."""
    cam_pos = T_cw.inverse().t
    kf_pos = SE3(q=q_kw, t=t_kw).inverse().t
    dist = jnp.linalg.norm(kf_pos - cam_pos, axis=-1)
    dist = jnp.where(kf_valid, dist, jnp.inf)
    order = jnp.argsort(dist)
    core = order[:n_core]
    valid_core = jnp.isfinite(dist[core])
    # fix the farthest valid core keyframe (gauge); invalid slots also fixed
    far_rank = jnp.max(jnp.where(valid_core, jnp.arange(n_core), -1))
    fixed = (jnp.arange(n_core) == far_rank) | ~valid_core
    return core, fixed
