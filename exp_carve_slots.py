"""One-off TPU timing: slot-compacted fine pass + single-pull protocol.

Measures, on the bench.py workload (60 views, 301x301x561):
  - dense tile fine level (current bench engine) — no-pull and with-pull
  - slot-compacted tile fine level at several K — validity + timings
  - a combined single-transfer pull (counts bitcast into the packed pull)

Run on an IDLE host (host contention skews the relay timings).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from bench import build_workload


def timeit(f, n=5):
    f()  # settle
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
    configs = [
        ("dense", None),
        ("slots_f8", (0, 8)),
        ("slots_f16", (0, 16)),
        ("slots_m8_f16", (8, 16)),
    ]
    for name, sc in configs:
        fn = make_fused_carver(H, W, tuple(shape), caps=(8192, 16384),
                               packed_output=True, fine_tiles=True,
                               slot_caps=sc)
        t0 = time.perf_counter()
        out, counts = fn(packed, cams_j, valid_j, origin_j, vs_j)
        c = np.asarray(counts)
        print(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s "
              f"counts={c.tolist()}", flush=True)
        nl = 2
        und = c[:nl]
        over = int(c[-1])
        ok = (und <= np.asarray([8192, 16384])).all() and over == 0
        if sc is not None:
            smax = c[nl:nl + nl]
            ok = ok and all(int(s) <= k for s, k in zip(smax, sc) if k)
            print(f"[{name}] smax={smax.tolist()} caps={sc}")
        if not ok:
            print(f"[{name}] INVALID (overflow) — skipping timings")
            continue

        bits = np.unpackbits(np.asarray(out))
        if ref_bits is None:
            ref_bits = bits
        else:
            assert (bits == ref_bits).all(), f"{name} NOT bit-exact!"

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
        dp = timeit(withpull)
        print(f"[{name}] no-pull {dn*1e3:.0f} ms = {tests/dn/1e9:.2f} Gvv/s"
              f" | with-pull {dp*1e3:.0f} ms = {tests/dp/1e9:.2f} Gvv/s",
              flush=True)

        # combined single-transfer pull
        @jax.jit
        def combined(p, cj, vj, oj, vsj, fn=fn):
            o, ct = fn(p, cj, vj, oj, vsj)
            cb = jax.lax.bitcast_convert_type(ct, jnp.uint8).reshape(-1)
            return jnp.concatenate([cb, o])

        nct = int(np.asarray(counts).shape[0]) * 4

        def combpull():
            buf = np.asarray(combined(packed, cams_j, valid_j, origin_j,
                                      vs_j))
            ct = buf[:nct].view(np.int32)
            assert ct[-1] == 0
            np.unpackbits(buf[nct:])

        t0 = time.perf_counter()
        combpull()
        print(f"[{name}] combined compile+first {time.perf_counter()-t0:.1f}s")
        dc = timeit(combpull)
        print(f"[{name}] combined-pull {dc*1e3:.0f} ms = "
              f"{tests/dc/1e9:.2f} Gvv/s", flush=True)


if __name__ == "__main__":
    main()
