"""ltm — TPU-native lifelong LiDAR mapping engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
gisbi-kim/lt-mapper (ICRA 2022): multi-session anchor-node pose-graph
SLAM (LT-SLAM), range-image visibility based dynamic-point removal and
low-dynamic change detection (LT-removert), and delta-map composition
(LT-map).

Subpackages
-----------
core       SE(3) Lie ops, padded point-cloud containers, config.
kernels    dense compute primitives (polar binning, range images,
           voxel hashing, kNN) — XLA + Pallas TPU kernels.
retrieval  Scan Context descriptors and batched loop retrieval.
register   point-to-point ICP (batched, fixed-shape, MXU correspondence).
graph      pose-graph factors + matrix-free Levenberg-Marquardt solver.
slam       LT-SLAM driver (sessions, loop search, optimization, writers).
removert   high-dynamic removal and PD/ND change detection pipeline.
ltmap      updated-map / updated-scan composition.
io         reference-compatible file protocol (g2o, SCD, PCD, KITTI poses).
dist       device-mesh sharding of keyframe and map-block work.
cli        entry points mirroring the reference launch files.
"""

__version__ = "0.1.0"
