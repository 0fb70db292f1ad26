"""One-off TPU timing: where does the fused-carve no-pull time go?

Components measured on the bench.py workload (60 views, 301x301x561):
  - _build_local_pyramids alone (jitted)
  - _build_tile_tables alone (jitted)
  - full fused carve (current bench engine), no-pull
  - fused carve with pyramids PASSED IN (build hoisted out)

Run on an idle-ish host; device timings (block_until_ready) are robust
to host contention, pulls are not.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from bench import build_workload


def timeit(f, n=5):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from plant3dvision_tpu.ops.carving_hier import pack_masks
    from plant3dvision_tpu.parallel import carving_mp as mp

    masks, cams, origin, voxel_size, shape = build_workload()
    V, H, W = masks.shape
    packed = jnp.asarray(pack_masks(masks))
    cams_j = jnp.asarray(cams)
    valid_j = jnp.asarray(np.ones(V, bool))
    origin_j = jnp.asarray(origin, jnp.float32)
    vs_j = jnp.float32(voxel_size)
    tests = float(np.prod(shape)) * V

    n_levels = 8
    build_pyr = jax.jit(lambda p: mp._build_local_pyramids(p, H, W, n_levels))
    build_tiles = jax.jit(lambda p: mp._build_tile_tables(p, H, W)[0])

    t0 = time.perf_counter()
    pyr = build_pyr(packed)
    pyr.block_until_ready()
    print(f"[pyr] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    dp = timeit(lambda: build_pyr(packed).block_until_ready())
    print(f"[pyr] build {dp*1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    tiles = build_tiles(packed)
    tiles.block_until_ready()
    print(f"[tiles] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    dt = timeit(lambda: build_tiles(packed).block_until_ready())
    print(f"[tiles] build {dt*1e3:.1f} ms "
          f"({tiles.nbytes/1e6:.0f} MB table)", flush=True)

    fn = mp.make_fused_carver(H, W, tuple(shape), caps=(8192, 16384),
                              packed_output=True, fine_tiles=True)

    def full():
        o, ct = fn(packed, cams_j, valid_j, origin_j, vs_j)
        o.block_until_ready()
        ct.block_until_ready()

    t0 = time.perf_counter()
    full()
    print(f"[full] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    df = timeit(full)
    print(f"[full] no-pull {df*1e3:.1f} ms = {tests/df/1e9:.2f} Gvv/s",
          flush=True)

    def hoisted():
        o, ct = fn(packed, cams_j, valid_j, origin_j, vs_j, pyr)
        o.block_until_ready()
        ct.block_until_ready()

    t0 = time.perf_counter()
    hoisted()
    print(f"[hoist-pyr] compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    dh = timeit(hoisted)
    print(f"[hoist-pyr] no-pull {dh*1e3:.1f} ms = {tests/dh/1e9:.2f} Gvv/s",
          flush=True)

    print(f"summary: pyr {dp*1e3:.0f} + tiles {dt*1e3:.0f} ms of builds "
          f"inside a {df*1e3:.0f} ms carve; classify+assembly "
          f"~{(df-dp-dt)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
