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


def _setup_compilation_cache():
    """Point JAX at a persistent on-disk compilation cache.

    The carve/segmentation programs cost minutes of (remote) compile per
    process; a persistent cache makes every process after the first start
    warm. Opt out with P3D_COMPILE_CACHE=off, or point it elsewhere with
    P3D_COMPILE_CACHE=<dir>. Set via env vars when JAX is not imported
    yet (picked up at import), via jax.config otherwise."""
    import os
    import sys

    cache = os.environ.get("P3D_COMPILE_CACHE")
    if cache is not None and cache.lower() in ("", "0", "off", "none"):
        return
    if not cache:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    knobs = {
        "JAX_COMPILATION_CACHE_DIR": cache,
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "2",
        "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES": "0",
    }
    for k, v in knobs.items():
        os.environ.setdefault(k, v)
    if "jax" in sys.modules:
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_COMPILATION_CACHE_DIR"])
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              int(os.environ[
                                  "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              int(os.environ[
                                  "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]))
        except Exception:  # pragma: no cover - never block import on cache
            pass


_setup_compilation_cache()
del _setup_compilation_cache
