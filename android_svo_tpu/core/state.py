"""Fixed-capacity structure-of-arrays state — the TPU-native replacement for
the reference's pointer-graph map (`map.h:71-123`, `frame.h:34-133`,
`point.h:29-98`, `feature.h:25-72`, `depth_filter.h:36-52`).

Every dynamic list in the reference (feature lists, observation lists, the
seed list, the keyframe list) becomes a preallocated arena with a validity
mask; insert/delete become mask writes and slot reuse; per-item loops become
batched math (SURVEY.md §7 design stance).  The whole VO state is one pytree
threaded through jitted step functions — no mutexes, no threads, no
trash-deferred deletion (`map.cpp:204` collapses into mask clears).

Point quality life cycle (ref point.h:34-42, reprojector.cpp:200-216):
  TYPE_DELETED(0) -> slot free;  TYPE_CANDIDATE(1) -> converged seed awaiting
  keyframe adoption;  TYPE_UNKNOWN(2) -> adopted, unproven;  TYPE_GOOD(3) ->
  >= point_min_succ_good successful reprojections.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.geometry.se3 import SE3
from android_svo_tpu.ops.detect import grid_shape
from android_svo_tpu.ops.pyramid import stack_shape

TYPE_DELETED = 0
TYPE_CANDIDATE = 1
TYPE_UNKNOWN = 2
TYPE_GOOD = 3


@struct.dataclass
class KeyframeArena:
    """Ring of keyframes: pyramids + poses + per-KF feature tables.

    stack: (K, L, Hp, Wp) padded pyramid stacks (ops/pyramid.build_stack
    layout: level l in the top-left (H>>l, W>>l) corner) — the layout the
    Pallas patch kernels index with a dynamic level, and a single merged
    (K*L)-plane gather serves affine warps across keyframes AND levels.
    T_kw: world->keyframe pose (the reference's T_f_w, frame.h:45).
    Features live per-(kf, cell): px at level 0, unit bearing, pyramid level,
    landmark id (-1 = none).
    """
    stack: jnp.ndarray         # (K, L, Hp, Wp)
    q_kw: jnp.ndarray          # (K, 4)
    t_kw: jnp.ndarray          # (K, 3)
    valid: jnp.ndarray         # (K,)
    frame_id: jnp.ndarray      # (K,) int32
    scene_depth: jnp.ndarray   # (K,) median scene depth at creation
    ftr_px: jnp.ndarray        # (K, C, 2)
    ftr_f: jnp.ndarray         # (K, C, 3)
    ftr_level: jnp.ndarray     # (K, C) int32
    ftr_point: jnp.ndarray     # (K, C) int32 landmark id, -1 none
    ftr_valid: jnp.ndarray     # (K, C) bool

    @property
    def T_kw(self) -> SE3:
        return SE3(q=self.q_kw, t=self.t_kw)

    def pose(self, k) -> SE3:
        return SE3(q=self.q_kw[k], t=self.t_kw[k])


@struct.dataclass
class PointArena:
    """Landmark arena (ref point.h). Observations are kept as a fixed-width
    table of (kf slot, bearing) pairs for structure-only GN and local BA."""
    pos: jnp.ndarray           # (P, 3) world position
    ptype: jnp.ndarray         # (P,) int32 quality type
    n_succ: jnp.ndarray        # (P,) int32 successful reprojections
    n_fail: jnp.ndarray        # (P,) int32 failed reprojections
    last_optim: jnp.ndarray    # (P,) int32 frame id of last structure optim
    # patch reference (for warps): owning keyframe + feature cell
    ref_kf: jnp.ndarray        # (P,) int32 kf slot
    ref_px: jnp.ndarray        # (P, 2) level-0 px in ref kf
    ref_level: jnp.ndarray     # (P,) int32
    ref_f: jnp.ndarray         # (P, 3) unit bearing in ref kf frame
    ref_type: jnp.ndarray      # (P,) int32 FTYPE_* of the birth feature
    ref_grad: jnp.ndarray      # (P, 2) unit gradient dir in ref kf (edgelets)
    # observation table (ref Point::obs_; px/level added so the matcher can
    # source the patch from the closest-view observation, point.cpp:101-125)
    obs_kf: jnp.ndarray        # (P, O) int32 kf slot, -1 empty
    obs_f: jnp.ndarray         # (P, O, 3) unit bearing in that kf
    obs_px: jnp.ndarray        # (P, O, 2) level-0 px in that kf
    obs_level: jnp.ndarray     # (P, O) int32 pyramid level of the feature
    obs_count: jnp.ndarray     # (P,) int32
    # warped-patch cache: the affine warp out of the keyframe arena
    # (ref warpAffine, matcher.cpp:83-121) is the single most expensive
    # per-frame gather; the warp changes slowly (relative pose drifts ~1%%
    # per frame), so it is AMORTIZED: a per-frame budget of points
    # refreshes the cache (oldest first), and matching reads the cache
    # (border patch incl. the +1 gradient ring)
    warp_patch: jnp.ndarray    # (P, PB, PB) f32, PB = 2*(patch_halfsize+1)
    warp_level: jnp.ndarray    # (P,) int32 search level of the cached warp
    warp_frame: jnp.ndarray    # (P,) int32 frame id of last refresh, -1=never
    warp_grad: jnp.ndarray     # (P, 2) warped unit gradient dir (edgelets)

    @property
    def valid(self) -> jnp.ndarray:
        return self.ptype != TYPE_DELETED


@struct.dataclass
class SeedArena:
    """Depth-filter seeds (ref Seed, depth_filter.h:36-52) as SoA."""
    kf: jnp.ndarray            # (S,) int32 owning keyframe slot
    px: jnp.ndarray            # (S, 2) level-0 px in that kf
    f: jnp.ndarray             # (S, 3) unit bearing in kf frame
    level: jnp.ndarray         # (S,) int32 detection level
    ftype: jnp.ndarray         # (S,) int32 FTYPE_* (ref feature.h:31)
    grad: jnp.ndarray          # (S, 2) unit gradient dir (edgelets)
    a: jnp.ndarray             # (S,)
    b: jnp.ndarray             # (S,)
    mu: jnp.ndarray            # (S,) inverse depth mean
    sigma2: jnp.ndarray        # (S,)
    z_range: jnp.ndarray       # (S,)
    batch_id: jnp.ndarray      # (S,) int32 keyframe batch at birth (age-out)
    valid: jnp.ndarray         # (S,) bool
    # cached warped reference patch (same amortization as PointArena's
    # warp_* fields): seeded with the identity patch at spawn, re-warped on
    # a per-frame budget as the baseline to the birth keyframe grows
    patch: jnp.ndarray         # (S, PB, PB) f32
    patch_level: jnp.ndarray   # (S,) int32 search level of the cache
    patch_frame: jnp.ndarray   # (S,) int32 frame id of last refresh


@struct.dataclass
class FrameState:
    """The tracked "last frame" (ref frame_handler_mono last_frame_):
    pyramid stack + pose + per-cell matched features (landmark links)."""
    stack: jnp.ndarray         # (L, Hp, Wp) padded pyramid stack
    q_fw: jnp.ndarray          # (4,) world->frame
    t_fw: jnp.ndarray          # (3,)
    ftr_px: jnp.ndarray        # (C, 2)
    ftr_f: jnp.ndarray         # (C, 3)
    ftr_level: jnp.ndarray     # (C,) int32
    ftr_point: jnp.ndarray     # (C,) int32
    ftr_valid: jnp.ndarray     # (C,) bool

    @property
    def T_fw(self) -> SE3:
        return SE3(q=self.q_fw, t=self.t_fw)


@struct.dataclass
class VOState:
    """Everything the jitted tracking step threads through."""
    kfs: KeyframeArena
    points: PointArena
    seeds: SeedArena
    last: FrameState
    frame_id: jnp.ndarray      # (,) int32
    kf_batch: jnp.ndarray      # (,) int32 number of keyframes so far
    next_point_slot: jnp.ndarray  # (,) int32 round-robin allocator hint
    pose_cov: jnp.ndarray      # (6, 6) last pose covariance


def arena_dims(cfg: SVOConfig, width: int, height: int):
    n_rows, n_cols = grid_shape(height, width, cfg.grid_size)
    return {
        "K": cfg.max_n_kfs,
        "C": n_rows * n_cols,
        "P": cfg.max_points,
        "O": cfg.max_obs_per_point,
        "S": cfg.max_seeds,
        "PB": 2 * (cfg.patch_halfsize + 1),
        "n_rows": n_rows,
        "n_cols": n_cols,
    }


def init_state(cfg: SVOConfig, width: int, height: int,
               dtype=jnp.float32) -> VOState:
    d = arena_dims(cfg, width, height)
    K, C, P, O, S = d["K"], d["C"], d["P"], d["O"], d["S"]
    PB = d["PB"]
    n_levels = cfg.total_pyr_levels
    sshape = stack_shape(height, width, n_levels)
    ident_q = jnp.array([1.0, 0, 0, 0], dtype)

    kfs = KeyframeArena(
        stack=jnp.zeros((K,) + sshape, dtype),
        q_kw=jnp.tile(ident_q, (K, 1)),
        t_kw=jnp.zeros((K, 3), dtype),
        valid=jnp.zeros((K,), bool),
        frame_id=jnp.full((K,), -1, jnp.int32),
        scene_depth=jnp.ones((K,), dtype),
        ftr_px=jnp.zeros((K, C, 2), dtype),
        ftr_f=jnp.zeros((K, C, 3), dtype),
        ftr_level=jnp.zeros((K, C), jnp.int32),
        ftr_point=jnp.full((K, C), -1, jnp.int32),
        ftr_valid=jnp.zeros((K, C), bool),
    )
    points = PointArena(
        pos=jnp.zeros((P, 3), dtype),
        ptype=jnp.zeros((P,), jnp.int32),
        n_succ=jnp.zeros((P,), jnp.int32),
        n_fail=jnp.zeros((P,), jnp.int32),
        last_optim=jnp.zeros((P,), jnp.int32),
        ref_kf=jnp.zeros((P,), jnp.int32),
        ref_px=jnp.zeros((P, 2), dtype),
        ref_level=jnp.zeros((P,), jnp.int32),
        ref_f=jnp.zeros((P, 3), dtype),
        ref_type=jnp.zeros((P,), jnp.int32),
        ref_grad=jnp.zeros((P, 2), dtype),
        obs_kf=jnp.full((P, O), -1, jnp.int32),
        obs_f=jnp.zeros((P, O, 3), dtype),
        obs_px=jnp.zeros((P, O, 2), dtype),
        obs_level=jnp.zeros((P, O), jnp.int32),
        obs_count=jnp.zeros((P,), jnp.int32),
        warp_patch=jnp.zeros((P, PB, PB), dtype),
        warp_level=jnp.zeros((P,), jnp.int32),
        warp_frame=jnp.full((P,), -1, jnp.int32),
        warp_grad=jnp.zeros((P, 2), dtype),
    )
    seeds = SeedArena(
        kf=jnp.zeros((S,), jnp.int32),
        px=jnp.zeros((S, 2), dtype),
        f=jnp.zeros((S, 3), dtype),
        level=jnp.zeros((S,), jnp.int32),
        ftype=jnp.zeros((S,), jnp.int32),
        grad=jnp.zeros((S, 2), dtype),
        a=jnp.ones((S,), dtype),
        b=jnp.ones((S,), dtype),
        mu=jnp.ones((S,), dtype),
        sigma2=jnp.ones((S,), dtype),
        z_range=jnp.ones((S,), dtype),
        batch_id=jnp.zeros((S,), jnp.int32),
        valid=jnp.zeros((S,), bool),
        patch=jnp.zeros((S, PB, PB), dtype),
        patch_level=jnp.zeros((S,), jnp.int32),
        patch_frame=jnp.full((S,), -1, jnp.int32),
    )
    last = FrameState(
        stack=jnp.zeros(sshape, dtype),
        q_fw=ident_q,
        t_fw=jnp.zeros((3,), dtype),
        ftr_px=jnp.zeros((C, 2), dtype),
        ftr_f=jnp.zeros((C, 3), dtype),
        ftr_level=jnp.zeros((C,), jnp.int32),
        ftr_point=jnp.full((C,), -1, jnp.int32),
        ftr_valid=jnp.zeros((C,), bool),
    )
    return VOState(
        kfs=kfs, points=points, seeds=seeds, last=last,
        frame_id=jnp.zeros((), jnp.int32),
        kf_batch=jnp.zeros((), jnp.int32),
        next_point_slot=jnp.zeros((), jnp.int32),
        pose_cov=jnp.eye(6, dtype=dtype),
    )
