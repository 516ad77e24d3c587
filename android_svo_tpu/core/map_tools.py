"""Map-level utilities: whole-map re-anchoring, invariant validation, and
statistics — the TPU-native rebuild of the reference's `Map::transform`
(`map.cpp:183-202`), `map_debug::mapValidation / frameValidation /
pointValidation` (`map.cpp:314-355`) and `map_debug::mapStatistics`
(`map.cpp:357-382`), plus the covisibility queries `getCloseKeyframes`
(`map.cpp:109-131`) and `getFurthestKeyframe` (`map.cpp:156-170`).

In the reference these walk the keyframe list and per-frame feature pointer
graphs; here they are masked batched array ops over the arenas, usable both
inside jit (transform, queries) and on host (validation/statistics return
plain dicts of scalars).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.core import state as st
from android_svo_tpu.geometry.se3 import SE3


def transform_map(vo: st.VOState, R: jnp.ndarray, t: jnp.ndarray,
                  s: jnp.ndarray | float = 1.0) -> st.VOState:
    """Re-anchor the whole map by a similarity (R, t, s): every landmark
    position p -> s*R@p + t and every camera pose T_fw -> T_fw . T_wnew_wold
    (ref Map::transform, map.cpp:183-202, extended with the Sim(3) scale the
    reference applies implicitly through its map_scale convention).

    R: (3,3) rotation, t: (3,) translation, s: scalar scale — the transform
    maps OLD world coords into NEW world coords.
    """
    # geometry matmuls need full f32 (TPU defaults matmuls to bf16 inputs)
    hi = jax.lax.Precision.HIGHEST
    s = jnp.asarray(s, vo.points.pos.dtype)
    pts = vo.points
    pts = pts.replace(
        pos=s * jnp.matmul(pts.pos, R.T, precision=hi) + t)

    # T_f_wnew = T_f_wold . T_wold_wnew ;  T_wold_wnew: x_old = R^T (x_new-t)/s
    T_old_new = SE3.from_rt(R.T, -(R.T @ t) / s)

    def remap_pose(q, tt):
        T = SE3(q=q, t=tt)
        # rotation composes; translation picks up the scale on the lever arm:
        # x_f = R_fo (R^T (x_n - t)/s) + t_fo  =>  t_f_new = t_fo scaled
        Tn = T.compose(T_old_new)
        return Tn.q, Tn.t * 1.0

    q_kw, t_kw = jax.vmap(remap_pose)(vo.kfs.q_kw, vo.kfs.t_kw)
    # camera centers must satisfy c_new = s*R@c_old + t: with pose composed
    # above, c_new = -R_f_w^T t_f; enforce the scale on translation directly.
    # t_f_w' = -R_f_wnew @ c_new where c_new = s*R@c_old + t.
    R_f_wnew = jax.vmap(lambda q: SE3(q=q, t=jnp.zeros(3, q.dtype)).rotation_matrix())(q_kw)
    c_old = jax.vmap(lambda q, tt: SE3(q=q, t=tt).inverse().t)(
        vo.kfs.q_kw, vo.kfs.t_kw)
    c_new = s * jnp.matmul(c_old, R.T, precision=hi) + t
    t_kw = -jnp.einsum("kij,kj->ki", R_f_wnew, c_new, precision=hi)
    kfs = vo.kfs.replace(q_kw=q_kw, t_kw=t_kw)

    lq, lt = remap_pose(vo.last.q_fw, vo.last.t_fw)
    R_l = SE3(q=lq, t=jnp.zeros(3, lq.dtype)).rotation_matrix()
    c_l = s * (R @ SE3(q=vo.last.q_fw, t=vo.last.t_fw).inverse().t) + t
    last = vo.last.replace(q_fw=lq, t_fw=-(R_l @ c_l))

    # depth-filter state is metric: inverse-depth means/ranges shrink by s
    seeds = vo.seeds.replace(mu=vo.seeds.mu / s,
                             sigma2=vo.seeds.sigma2 / (s * s),
                             z_range=vo.seeds.z_range * s)
    kfs = kfs.replace(scene_depth=kfs.scene_depth * s)
    return vo.replace(points=pts, kfs=kfs, last=last, seeds=seeds)


def get_close_keyframes(vo: st.VOState, T_cw: SE3, cam) -> jnp.ndarray:
    """Distances (K,) from the current camera to each keyframe with shared
    field of view, +inf for invalid/non-overlapping keyframes (ref
    Map::getCloseKeyframes, map.cpp:109-131: a KF is 'close' if any of its 5
    key points projects into the current frame; here we test the KF's tracked
    feature bearings in batch — a denser, mask-friendly equivalent)."""
    cur_pos = T_cw.inverse().t
    kf_pos = vo.kfs.T_kw.inverse().t                      # (K, 3)
    dist = jnp.linalg.norm(kf_pos - cur_pos, axis=-1)

    def kf_overlaps(k):
        # unproject the KF's features at its scene depth -> world -> current
        T_kw = vo.kfs.pose(k)
        depth = vo.kfs.scene_depth[k]
        p_w = T_kw.inverse().apply(vo.kfs.ftr_f[k] * depth)
        p_c = T_cw.apply(p_w)
        uv = cam.world2cam(p_c)
        inside = ((p_c[:, 2] > 0) & (uv[:, 0] >= 0) & (uv[:, 1] >= 0)
                  & (uv[:, 0] < cam.width) & (uv[:, 1] < cam.height))
        return jnp.any(inside & vo.kfs.ftr_valid[k])

    overlaps = jax.vmap(kf_overlaps)(jnp.arange(vo.kfs.q_kw.shape[0]))
    return jnp.where(vo.kfs.valid & overlaps, dist, jnp.inf)


def get_furthest_keyframe(vo: st.VOState, pos: jnp.ndarray) -> jnp.ndarray:
    """Slot of the valid keyframe furthest from `pos` (ref
    Map::getFurthestKeyframe, map.cpp:156-170); -1 if no valid keyframe."""
    kf_pos = vo.kfs.T_kw.inverse().t
    dist = jnp.linalg.norm(kf_pos - pos, axis=-1)
    dist = jnp.where(vo.kfs.valid, dist, -jnp.inf)
    k = jnp.argmax(dist)
    return jnp.where(jnp.any(vo.kfs.valid), k, -1)


def map_validation(vo: st.VOState, dims) -> dict:
    """Arena invariant checks — the mask-world analog of
    map_debug::mapValidation/frameValidation/pointValidation
    (map.cpp:314-355).  Returns {name: count_of_violations}; all zeros on a
    healthy state.  Host-side (concrete values)."""
    import numpy as np

    kfs, pts = vo.kfs, vo.points
    K = kfs.valid.shape[0]
    P = pts.pos.shape[0]
    kf_valid = np.asarray(kfs.valid)
    ftr_valid = np.asarray(kfs.ftr_valid)
    ftr_point = np.asarray(kfs.ftr_point)
    ptype = np.asarray(pts.ptype)
    obs_kf = np.asarray(pts.obs_kf)
    obs_count = np.asarray(pts.obs_count)
    pt_valid = ptype != st.TYPE_DELETED

    errs = {}
    # features on invalid keyframes must be masked out
    errs["ftr_on_invalid_kf"] = int((ftr_valid & ~kf_valid[:, None]).sum())
    # a feature's landmark id must reference a live point
    # (ref frameValidation: "errors: Frame has invalid point")
    linked = ftr_valid & (ftr_point >= 0)
    ok = np.zeros_like(linked)
    ok[linked] = pt_valid[np.clip(ftr_point[linked], 0, P - 1)]
    errs["ftr_to_deleted_point"] = int((linked & ~ok).sum())
    # observation table: every obs_kf slot < obs_count must be a live KF
    # (ref pointValidation: point->frame back-references)
    O = obs_kf.shape[1]
    live_obs = np.arange(O)[None, :] < obs_count[:, None]
    live_obs &= pt_valid[:, None]
    bad = np.zeros_like(live_obs)
    sel = live_obs & (obs_kf >= 0)
    bad[sel] = ~kf_valid[np.clip(obs_kf[sel], 0, K - 1)]
    errs["obs_on_invalid_kf"] = int(bad.sum())
    errs["obs_negative_slot"] = int((live_obs & (obs_kf < 0)).sum())
    # seeds must belong to live keyframes
    seed_valid = np.asarray(vo.seeds.valid)
    seed_kf = np.asarray(vo.seeds.kf)
    errs["seed_on_invalid_kf"] = int(
        (seed_valid & ~kf_valid[np.clip(seed_kf, 0, K - 1)]).sum())
    errs["nonfinite_point_pos"] = int(
        (~np.isfinite(np.asarray(pts.pos)).all(axis=-1) & pt_valid).sum())
    return errs


def map_statistics(vo: st.VOState) -> dict:
    """Aggregate map stats (ref map_debug::mapStatistics, map.cpp:357-382:
    'avg. grid size', observations per point / points per frame)."""
    import numpy as np

    kf_valid = np.asarray(vo.kfs.valid)
    ftr_valid = np.asarray(vo.kfs.ftr_valid)
    ptype = np.asarray(vo.points.ptype)
    obs_count = np.asarray(vo.points.obs_count)
    pt_valid = ptype != st.TYPE_DELETED
    n_kf = int(kf_valid.sum())
    n_pts = int(pt_valid.sum())
    return {
        "n_keyframes": n_kf,
        "n_points": n_pts,
        "n_candidates": int((ptype == st.TYPE_CANDIDATE).sum()),
        "n_good": int((ptype == st.TYPE_GOOD).sum()),
        "n_seeds": int(np.asarray(vo.seeds.valid).sum()),
        "avg_fts_per_kf": float(ftr_valid[kf_valid].sum(axis=-1).mean())
        if n_kf else 0.0,
        "avg_obs_per_point": float(obs_count[pt_valid].mean())
        if n_pts else 0.0,
    }
