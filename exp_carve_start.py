"""One-off TPU timing: combined-pyramid carve at start_level 3 vs 4 vs 5.

Higher start levels shrink the dense top grid (38x38x71 -> 19x19x36 ->
10x10x18), trading top-level pyramid taps for an extra box refinement
level. Validity: undecided counts per level must stay under the caps
(printed). Bit-exactness vs the start_level=3 engine is asserted.
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
    import jax.numpy as jnp
    from plant3dvision_tpu.ops.carving_hier import pack_masks
    from plant3dvision_tpu.parallel.carving_mp import make_fused_carver

    masks, cams, origin, voxel_size, shape = build_workload()
    V, H, W = masks.shape
    packed = jnp.asarray(pack_masks(masks))
    cams_j = jnp.asarray(cams)
    valid_j = jnp.asarray(np.ones(V, bool))
    origin_j = jnp.asarray(origin, jnp.float32)
    vs_j = jnp.float32(voxel_size)
    tests = float(np.prod(shape)) * V

    ref_bits = None
    for sl, caps in [(3, (8192, 16384)),
                     (4, (4096, 8192, 16384)),
                     (5, (2048, 4096, 8192, 16384))]:
        fn = make_fused_carver(H, W, tuple(shape), start_level=sl,
                               caps=caps, packed_output=True,
                               fine_tiles=True)
        t0 = time.perf_counter()
        out, counts = fn(packed, cams_j, valid_j, origin_j, vs_j)
        c = np.asarray(counts)
        print(f"[sl{sl}] compile+first {time.perf_counter()-t0:.1f}s "
              f"counts={c.tolist()} caps={caps}", flush=True)
        und, over = c[:-1], int(c[-1])
        if not ((und <= np.asarray(caps)).all() and over == 0):
            print(f"[sl{sl}] INVALID (overflow) — skipping timings")
            continue
        bits = np.unpackbits(np.asarray(out))
        if ref_bits is None:
            ref_bits = bits
        else:
            assert (bits == ref_bits).all(), f"sl{sl} NOT bit-exact!"

        def nopull():
            o, ct = fn(packed, cams_j, valid_j, origin_j, vs_j)
            o.block_until_ready()
            ct.block_until_ready()

        def withpull():
            o, ct = fn(packed, cams_j, valid_j, origin_j, vs_j)
            cth = np.asarray(ct)
            assert cth[-1] == 0
            np.unpackbits(np.asarray(o))

        dn = timeit(nopull)
        dw = timeit(withpull)
        print(f"[sl{sl}] no-pull {dn*1e3:.0f} ms = {tests/dn/1e9:.2f} Gvv/s"
              f" | with-pull {dw*1e3:.0f} ms = {tests/dw/1e9:.2f} Gvv/s",
              flush=True)


if __name__ == "__main__":
    main()
