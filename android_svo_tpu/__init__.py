"""android_svo_tpu — a TPU-native semi-direct visual odometry engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Android SVO system (JohnGDAC/Android_SVO, itself an NDK port of Forster,
Pizzoli, Scaramuzza — "SVO: Fast Semi-Direct Monocular Visual Odometry",
ICRA 2014).  Not a port: the reference's pointer-graph + thread architecture
becomes fixed-capacity structure-of-arrays state threaded through jitted step
functions, per-item loops become vmapped / Pallas-grid batched math, and the
map/seed scale axis is sharded over a `jax.sharding.Mesh`.

Layer map (see SURVEY.md §7):
  geometry/  — SE3/SO3, camera models, robust costs, triangulation   (ref L0)
  ops/       — pyramid, interpolation, FAST, alignment kernels       (ref L1/SIMD)
  core/      — state arenas, depth filter, reprojector, pose/point GN,
               bootstrap, frame-handler stage machine                (ref L1)
  parallel/  — mesh/sharding helpers, distributed local BA           (new)
  data/      — synthetic scene renderer, EuRoC/TUM loaders           (ref L2 analog)
  evals/     — trajectory alignment, ATE/RPE                         (new)
  utils/     — profiling timers, checkpointing                       (ref §5 aux)
"""

__version__ = "0.1.0"
