"""One-off TPU timing: where does the fused-carve no-pull time go?

Components measured on the bench.py workload (60 views, 301x301x561):
  - _build_local_pyramids alone (jitted, scalar-reduced)
  - _build_tile_tables alone (jitted, scalar-reduced)
  - full fused carve (current bench engine), counts-only pull
  - fused carve with pyramids PASSED IN (build hoisted out)

block_until_ready() is NOT reliable through the axon relay (returns
before compute finishes queueing — CLAUDE.md), so every timed call
forces a tiny scalar/counts pull; the measured null round-trip is
printed so it can be subtracted.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


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

    masks, cams, origin, voxel_size, shape = __import__("bench").build_workload()
    V, H, W = masks.shape
    packed = jnp.asarray(pack_masks(masks))
    cams_j = jnp.asarray(cams)
    valid_j = jnp.asarray(np.ones(V, bool))
    origin_j = jnp.asarray(origin, jnp.float32)
    vs_j = jnp.float32(voxel_size)
    tests = float(np.prod(shape)) * V

    # null round-trip: dispatch + scalar pull of a trivial program
    null = jax.jit(lambda p: p[0, 0].astype(jnp.int32))
    d0 = timeit(lambda: int(null(packed)))
    print(f"[null] dispatch+scalar pull {d0*1e3:.1f} ms", flush=True)

    n_levels = 8
    build_pyr = jax.jit(
        lambda p: mp._build_local_pyramids(p, H, W, n_levels))
    pyr_sum = jax.jit(
        lambda p: mp._build_local_pyramids(p, H, W, n_levels)
        .astype(jnp.uint32).sum())
    tiles_sum = jax.jit(
        lambda p: mp._build_tile_tables(p, H, W)[0]
        .astype(jnp.uint32).sum())

    dp = timeit(lambda: int(pyr_sum(packed)))
    print(f"[pyr] build+reduce {dp*1e3:.1f} ms (-null {max(dp-d0,0)*1e3:.1f})",
          flush=True)
    dt = timeit(lambda: int(tiles_sum(packed)))
    print(f"[tiles] build+reduce {dt*1e3:.1f} ms (-null {max(dt-d0,0)*1e3:.1f})",
          flush=True)

    fn = mp.make_fused_carver(H, W, tuple(shape), caps=(8192, 16384),
                              packed_output=True, fine_tiles=True)

    def full():
        o, ct = fn(packed, cams_j, valid_j, origin_j, vs_j)
        c = np.asarray(ct)
        assert c[-1] == 0

    t0 = time.perf_counter()
    full()
    print(f"[full] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    df = timeit(full)
    print(f"[full] counts-pull {df*1e3:.1f} ms = {tests/(df-d0)/1e9:.2f}"
          f" Gvv/s (-null)", flush=True)

    pyr = build_pyr(packed)

    def hoisted():
        o, ct = fn(packed, cams_j, valid_j, origin_j, vs_j, pyr)
        c = np.asarray(ct)
        assert c[-1] == 0

    t0 = time.perf_counter()
    hoisted()
    print(f"[hoist-pyr] compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    dh = timeit(hoisted)
    print(f"[hoist-pyr] counts-pull {dh*1e3:.1f} ms = "
          f"{tests/(dh-d0)/1e9:.2f} Gvv/s (-null)", flush=True)

    print(f"summary (null-subtracted): pyr {max(dp-d0,0)*1e3:.0f} ms, "
          f"tiles {max(dt-d0,0)*1e3:.0f} ms, full {max(df-d0,0)*1e3:.0f} ms, "
          f"hoist-pyr {max(dh-d0,0)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
