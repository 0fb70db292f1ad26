"""Multi-chip parallelism (SPMD over jax.sharding.Mesh).

The reference is single-GPU (SURVEY.md §2.4); the scaling axes here are:
- view batches (carving): shard views over 'dp', reduce killed/seen with
  OR-collectives over ICI (parallel/carving.py);
- the voxel grid: Z-slab sharding for grids too big for one chip;
- CNN training: dp over batch + tp over conv channels (parallel/train.py).
"""

from .mesh import make_mesh
from .carving import carve_sharded
from .train import make_train_step

__all__ = ["make_mesh", "carve_sharded", "make_train_step"]
