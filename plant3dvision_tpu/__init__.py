"""plant3dvision_tpu — a TPU-native plant reconstruction & phenotyping framework.

A ground-up re-design of the capabilities of `romi/plant-3d-vision`
(reference: /root/reference) for TPU hardware:

- compute path: JAX / XLA / Pallas (space carving, distance transforms,
  eikonal solvers, image ops, CNN segmentation) — fused, jitted, shardable
  over `jax.sharding.Mesh` device meshes;
- host path: filesystem database (plantdb-compatible on-disk format),
  config-wired task DAG (romitask-compatible semantics), COLMAP ingestion,
  graph/trait extraction;
- native path: C++ geometry module (marching cubes, mesh filtering) in the
  role the reference delegates to CGAL (`romicgal`).
"""

__version__ = "0.1.0"
