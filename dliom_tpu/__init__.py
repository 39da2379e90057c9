"""dliom_tpu — a TPU-native LiDAR-inertial odometry & mapping engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of D-LIOM
(tightly-coupled Direct LiDAR-Inertial Odometry and Mapping): IMU
preintegration pose prediction, motion-compensated deskew, voxel
downsampling, scan-to-submap Gauss-Newton matching against HBM-resident
probability grids, ray-cast grid insertion, sliding-window factor-graph
fusion, loop closure via multi-resolution correlative search, and sparse
pose-graph optimization — all as batched, statically-shaped device
computations.

Package layout:
  transform/   rigid transforms (quaternion + translation) under vmap
  mapping/     probability grids, submaps, insertion, interpolation
  ops/         compute kernels (GN scan matcher, raycast, voxel filter)
  imu/         preintegration, sliding-window optimizer, initializers
  frontend/    local trajectory builder (the per-scan hot loop)
  backend/     pose graph, constraint builder, loop closure, SPA
  sensor/      sensor data types + host-side collation
  parallel/    multi-sequence batching and device-mesh sharding
  io/          state serialization, dataset loaders, trajectory export
  evaluation/  ATE/RPE metrics
  runner/      offline deterministic replay CLI
"""

__version__ = "0.1.0"

import jax as _jax

# The reference solves in float64 (Ceres/GTSAM). Every matmul in this engine
# is SMALL dense algebra (15x15 preintegration blocks, 90-var window GN,
# 6-col matcher Jacobians, CG products) — latency-bound, so full-f32 MXU
# passes cost nothing measurable, while default (bf16-input) passes cost
# real solver precision. Grids/gathers/scatters are unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")
