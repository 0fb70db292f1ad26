"""One-off TPU timing: dense vs tile row-gather averaging (binary masks).

Workload: the bench.py carve workload re-used as an averaging job
(60 views 1440x1080, 301x301x561 = 50.9M voxels — the reference ML
pipeline's Voxels(type='averaging') shape class). Every timed call
forces the result pull (block_until_ready is unreliable on axon).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def timeit(f, n=3):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax.numpy as jnp
    from bench import build_workload
    from plant3dvision_tpu.ops.carving import EPS, average
    from plant3dvision_tpu.ops.averaging_tiled import average_tiled
    from plant3dvision_tpu.ops.carving_hier import pack_masks

    masks, cams, origin, voxel, shape = build_workload()
    V, H, W = masks.shape
    valid = np.ones(V, bool)
    tests = float(np.prod(shape)) * V

    packed = jnp.asarray(pack_masks(masks))
    cams_j = jnp.asarray(cams)
    valid_j = jnp.asarray(valid)

    import jax
    from plant3dvision_tpu.ops.averaging_tiled import _average_tiled

    v0, v1 = float(np.log(EPS)), float(np.log(EPS + 1.0))
    shape_t = tuple(int(s) for s in shape)
    origin_j = jnp.asarray(origin, jnp.float32)

    # scalar-forced timing (full-volume pulls would cost ~200 MB/6.5 s
    # on this relay and swamp the kernel comparison)
    tiled_sum = jax.jit(lambda: _average_tiled(
        packed, cams_j, valid_j, origin_j, jnp.float32(voxel),
        jnp.float32(v0), jnp.float32(v1), shape_t, H, W)[0].sum())

    def tiled():
        return float(tiled_sum())

    t0 = time.perf_counter()
    tiled()
    print(f"[tiled] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    dt = timeit(tiled)
    print(f"[tiled] {dt*1e3:.0f} ms = {tests/dt/1e9:.2f} Gvv/s", flush=True)

    fmasks = jnp.asarray(np.log(EPS + (masks > 0).astype(np.float32)))
    dense_sum = jax.jit(lambda: average(
        fmasks, cams_j, valid_j, origin_j, jnp.float32(voxel),
        shape_t).sum())

    def dense():
        return float(dense_sum())

    t0 = time.perf_counter()
    dense()
    print(f"[dense] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    dd = timeit(dense)
    print(f"[dense] {dd*1e3:.0f} ms = {tests/dd/1e9:.2f} Gvv/s", flush=True)

    # accuracy check on a scalar reduction + one full pull of each
    tv, over = _average_tiled(packed, cams_j, valid_j, origin_j,
                              jnp.float32(voxel), jnp.float32(v0),
                              jnp.float32(v1), shape_t, H, W)
    assert int(over) == 0
    dv = average(fmasks, cams_j, valid_j, origin_j, jnp.float32(voxel),
                 shape_t)
    err = float(jnp.abs(tv - dv).max())
    print(f"max |tiled - dense| = {err:.2e}  speedup {dd/dt:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
