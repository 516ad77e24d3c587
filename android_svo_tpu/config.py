"""Typed configuration tree for the TPU SVO engine.

Unifies everything the reference scatters across its `svo::Config` Meyers
singleton (reference `app/src/main/cpp/svo/config.h:31-155`,
`config.cpp:56-84` — Android-tuned defaults) and the hardcoded knobs outside
it catalogued in SURVEY.md §5: sparse-align patch size / iterations
(`sparse_img_align.h:35-37`, `frame_handler_mono.cpp:187`), matcher patch size
and alignment iterations (`matcher.h:70-71,86`), ZMSSD acceptance threshold
(`patch_score.h:46`), depth-seed convergence factor (`depth_filter.h:85`),
the 60° closest-view-angle gate (`point.cpp:122`), and the KLT bootstrap
window (`initialization.cpp:189-201`).

The config is a frozen (hashable) plain-Python dataclass so it can be closed
over / passed as a static argument to `jax.jit` — all fields are compile-time
constants shaping the fixed-capacity arenas and kernel grids.  Runtime state
lives in `core.state`, never here.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class SVOConfig:
    # ---- image pyramid ----------------------------------------------------
    n_pyr_levels: int = 3          # ref config.cpp: pyramid levels used by detector
    img_align_max_level: int = 4   # coarse-to-fine start (ref frame_handler_mono.cpp:187)
    img_align_min_level: int = 2   # coarse-to-fine stop
    # total pyramid levels allocated = max(n_pyr_levels, img_align_max_level+1)

    # ---- sparse image alignment (direct frame-to-frame) --------------------
    img_align_patch_halfsize: int = 2   # 4x4 patch (ref sparse_img_align.h:35-37)
    img_align_n_iter: int = 30          # GN iterations per level
    img_align_eps: float = 1e-7         # convergence threshold on |dx|

    # ---- feature detection --------------------------------------------------
    grid_size: int = 20                 # cell size px (android default; upstream 30)
    triang_min_corner_score: float = 10.0
    fast_threshold: float = 20.0        # FAST intensity threshold (cv::FAST default-ish)
    max_fts: int = 1200                 # feature budget per frame (ref config.cpp:82)
    edgelet_detection: bool = False     # EDGELET fallback in cornerless cells
                                        # (ref feature.h:31 — latent in the reference)
    edgelet_grad_min: float = 30.0      # min |grad| for an edgelet (0-255 intensity units)

    # ---- matcher / feature alignment ---------------------------------------
    patch_halfsize: int = 4             # 8x8 matcher patch (ref matcher.h:70-71)
    align_max_iter: int = 10            # ICLK iterations (ref matcher.h:86)
    max_epi_search_steps: int = 100     # cap on epipolar scan (ref matcher.cpp:288)
    max_search_level: int = 2           # cap on matcher search level (graph size)
    zmssd_threshold_factor: float = 2000.0  # accept if < factor*area (ref patch_score.h:46)
    align_mxu: bool = True              # feature-align schedule: window dump
                                        # (one Pallas pass) + one-hot bilinear
                                        # einsums on the MXU per ICLK iteration,
                                        # instead of the serial per-feature
                                        # Pallas loop (2.3 vs 7 ms / 768 fts /
                                        # 10 iters measured on v5e); same
                                        # align2D math (feature_alignment.cpp:
                                        # 154-282), TPU-shaped schedule
    match_min_patch_std: float = 5.0    # min current-patch intensity std for a
                                        # direct match to count: a flat patch
                                        # (occlusion, underexposure, off-texture)
                                        # carries no alignment information — the
                                        # ICLK mean-brightness term absorbs it and
                                        # "converges" wherever it started, so the
                                        # tracker coasts at zero innovation
                                        # instead of failing into relocalization
    direct_match_zmssd: bool = True     # appearance gate on direct matches: the
                                        # reference accepts any converged align2D
                                        # (matcher.cpp:179-200), which fabricates
                                        # zero-innovation "matches" on occluded /
                                        # unknown scenery (ICLK converges wherever
                                        # it starts); scoring the matched patch
                                        # with the SAME ZMSSD threshold the epi
                                        # path uses makes occlusion fail tracking
                                        # (-> relocalization) instead of silently
                                        # poisoning the map
    max_view_angle_cos: float = 0.5     # cos(60°) closest-view gate (ref point.cpp:122)
    subpix_n_iter: int = 10             # subpixel refinement iterations
    epi_search_1d: bool = False         # 1D along-epipolar align (ref matcher feature_alignment align1D)

    # ---- reprojector ---------------------------------------------------------
    max_n_kfs_reproject: int = 10       # project points from N closest KFs (ref reprojector.cpp:94)
    warp_refresh_budget: int = 64       # landmark warped-patch cache refreshes
                                        # per frame (oldest visible first; the
                                        # affine warp out of the keyframe
                                        # arena is the dominant per-frame
                                        # gather at ~6 us/warp, and the warp
                                        # drifts ~1%/frame — amortizing it is
                                        # the TPU-native answer to
                                        # matcher.cpp:83-121 running per point
                                        # per frame.  r5 sweep on v5e: 192+192
                                        # budgets cost 2.3 ms/frame of the
                                        # 8.5 ms fused step; 64+64 tracks the
                                        # bench orbit identically (511 matches,
                                        # 0 failures over 40 frames) at 7.3 ms)
    seed_warp_refresh_budget: int = 64  # same, for depth-filter seed patches
    reproject_n_retries: int = 1        # extra per-cell candidate tries after a failed
                                        # match (ref reprojectCell quality-ordered chain,
                                        # reprojector.cpp:181-241); 0 = single try
    reproject_retry_budget: int = 192   # retry rounds run on a compacted batch
                                        # of at most this many unmatched cells
                                        # (steady state has few failures; dense
                                        # rounds would re-pay the full-grid
                                        # warp+align for every retry)
    quality_min_fts: int = 40           # tracking insufficient below (ref config.cpp)
    quality_max_drop_fts: int = 500     # one-frame drop => failure
    min_reproj_matches: int = 40        # ref frame_handler_mono.cpp:209
    point_max_reproj_fail_unknown: int = 15  # delete CANDIDATE/UNKNOWN (ref reprojector.cpp:205)
    point_max_reproj_fail_good: int = 30     # demote/delete GOOD (ref reprojector.cpp:208)
    point_min_succ_good: int = 10            # UNKNOWN -> GOOD (ref point.h quality policy)

    # ---- pose / structure optimization --------------------------------------
    poseoptim_n_iter: int = 10
    poseoptim_thresh: float = 2.0       # reprojection outlier threshold px (ref config)
    poseoptim_method: str = "gn"        # "gn" | "lm" (ref nlls_solver strategies)
    min_pose_opt_edges: int = 20        # ref frame_handler_mono.cpp:233
    structureoptim_max_pts: int = 20    # points refined per frame (ref frame_handler_base.cpp:190)
    structureoptim_n_iter: int = 5
    structureoptim_method: str = "gn"   # "gn" | "lm"

    # ---- relocalization --------------------------------------------------------
    reloc_min_tracked: int = 30         # accept gate: sparse-align tracked count
                                        # (ref frame_handler_mono.cpp:334)

    # ---- keyframe policy ------------------------------------------------------
    kf_select_covisibility: bool = True  # overlap-gated keyframe queries: the
                                        # reproject working set and the new-KF
                                        # test only consider keyframes with
                                        # >= kf_overlap_min_fts landmarks
                                        # visible in the current frame (ref
                                        # getCloseKeyframes map.cpp:109-154 +
                                        # key-point checks frame.cpp:84-146;
                                        # pure camera distance admits KFs
                                        # looking away).  False = distance-only
                                        # (this Android port's needNewKf).
    kf_overlap_min_fts: int = 1         # visible-landmark count for "overlap"
    kfselect_mindist: float = 0.06      # relative to scene depth (android default)
    max_n_kfs: int = 16                 # keyframe arena capacity (0=unbounded in ref; we
                                        # need a fixed arena — furthest-KF eviction beyond)
    core_n_kfs: int = 5                 # closest KFs forming the "core" (ref config)

    # ---- depth filter ----------------------------------------------------------
    seed_convergence_sigma2_thresh: float = 100.0  # converged if sqrt(s2) < z_range/thresh
                                                   # (ref depth_filter.h:85: /100)
    seed_max_kf_age: int = 3            # age-out after 3 KF batches (ref depth_filter.cpp:258)
    max_seeds: int = 2048               # seed arena capacity (new: fixed SoA arena)
    seed_update_budget: int = 768       # visible seeds updated per frame: the
                                        # epi-match path (arena warp + scan +
                                        # align) runs on a COMPACTED fixed-size
                                        # batch, not the whole arena — dead
                                        # slots cost nothing, and when live >
                                        # budget the update round-robins by
                                        # frame (ref updateSeeds visits every
                                        # seed serially, depth_filter.cpp:250;
                                        # on TPU dense masked work would pay
                                        # for all max_seeds slots every frame)
    d_filter_px_noise: float = 1.0      # 1-px angular error for tau (ref computeTau)

    # ---- initialization (two-frame bootstrap) ----------------------------------
    init_min_kps: int = 100             # ref initialization.cpp:44
    init_min_tracked: int = 50          # ref initialization.cpp:68
    init_min_disparity: float = 50.0    # median px disparity gate (ref :72-75)
    init_min_inliers: int = 40          # post-RANSAC inlier gate
    klt_win_halfsize: int = 15          # 30x30 window (ref initialization.cpp:189)
    klt_max_level: int = 4              # pyramid levels for bootstrap KLT
    klt_n_iter: int = 30
    ransac_n_trials: int = 256          # vectorized fixed-trial RANSAC (replaces cv RANSAC)
    ransac_thresh_px: float = 2.0
    map_scale: float = 0.5              # median scene depth after bootstrap (android default)

    # ---- map ---------------------------------------------------------------------
    max_points: int = 8192              # landmark arena capacity
    max_obs_per_point: int = 8          # observation table width
    reproj_thresh: float = 4.0          # px (android default; upstream 2.0)

    # ---- local bundle adjustment ---------------------------------------------------
    loba_n_iter: int = 5                # GN iterations (upstream default; android=0/off)
    loba_point_budget: int = 2048       # landmarks entering local BA, compacted
                                        # from the (mostly dead) arena — the
                                        # Schur einsums are O(arena) otherwise
    loba_num_kfs: int = 4               # core keyframes in local BA window
    loba_every_n_kfs: int = 1           # amortization: run BA every Nth keyframe
    loba_robust_huber_width: float = 1.0
    loba_thresh: float = 2.0

    # ---- numerics / batching ---------------------------------------------------------
    dtype: str = "float32"
    use_pallas: bool = True             # dispatch hot kernels to Pallas on TPU

    def replace(self, **kw) -> "SVOConfig":
        return dataclasses.replace(self, **kw)

    @property
    def total_pyr_levels(self) -> int:
        # ref frame_handler_mono.cpp:74 / frame.cpp:51-64: max(3, align_max+1)
        return max(self.n_pyr_levels, self.img_align_max_level + 1)

    @property
    def patch_size(self) -> int:
        return 2 * self.patch_halfsize

    @property
    def img_align_patch_size(self) -> int:
        return 2 * self.img_align_patch_halfsize

    @classmethod
    def android_defaults(cls) -> "SVOConfig":
        """The reference's phone-tuned defaults (config.cpp:56-84)."""
        return cls()

    @classmethod
    def upstream_defaults(cls) -> "SVOConfig":
        """Upstream rpg_svo desktop defaults (ref config.cpp:26-54)."""
        return cls(
            grid_size=30,
            map_scale=1.0,
            reproj_thresh=2.0,
            max_fts=120,
            quality_max_drop_fts=40,
            kfselect_mindist=0.12,
            triang_min_corner_score=20.0,
            max_n_kfs=10,
        )
