"""Probe: Mosaic/Pallas in-VMEM gather primitives on the real TPU.

The carve engine is compute/assembly-bound at ~5-6x its memory floor
(docs/CARVE_CEILING.md round 4); the one unattempted restructure is a
Pallas kernel fusing the per-view box test in VMEM (VERDICT r4 #1).
That kernel needs a fast in-VMEM random lookup. This probe measures the
candidate formulations Mosaic is known/suspected to lower:

1. axis-1 take_along_axis with a REAL replicated (8, L) i32 table
   (round-2 finding: broadcast tables are rejected; per-row tables
   needed) — the pyramid-tap candidate;
2. axis-0 row gather from an (R, 32) i32 tile table with the row index
   broadcast across columns — the fine-level tile-fetch candidate;
3. same as (1) for a small table via the _pick32-style select tree
   (guaranteed to lower; baseline for tiny tables).

Each kernel loops the lookup in-kernel over many index tiles so the
rate is not launch-bound. Run on the real TPU (not the CPU mesh — the
backends lower gathers differently and CPU numbers are meaningless
here).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, n=5):
    fn(*args).block_until_ready()
    # relay caveat: force a scalar pull every rep
    outs = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)[:1, :1]))
        outs.append(time.perf_counter() - t0)
    return min(outs)


def probe_axis1(L, N=8 * 1024, reps=64, dtype=jnp.int32):
    """take_along_axis(table (8, L), idx (8, N), axis=1), repeated
    `reps` times in-kernel with a rolling index perturbation."""

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            idx = (idx_ref[:] + i) % L
            got = jnp.take_along_axis(tab_ref[:], idx, axis=1)
            return acc + got
        out_ref[:] = jax.lax.fori_loop(0, reps, body,
                                       jnp.zeros_like(out_ref))

    tab = jnp.asarray(
        np.random.randint(0, 3, (8, L)).astype(np.int32)).astype(dtype)
    idx = jnp.asarray(np.random.randint(0, L, (8, N)).astype(np.int32))

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, N), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    dt = timed(run, tab, idx)
    return 8 * N * reps / dt / 1e6


def probe_axis0_rows(R, P=4096, reps=64):
    """Row gather: out[p, :] = table[rows[p], :] via take_along_axis
    axis=0 with the row index broadcast across the 32 columns."""

    def kernel(tab_ref, rows_ref, out_ref):
        def body(i, acc):
            rows = (rows_ref[:] + i) % R          # (P, 32)
            got = jnp.take_along_axis(tab_ref[:], rows, axis=0)
            return acc + got
        out_ref[:] = jax.lax.fori_loop(0, reps, body,
                                       jnp.zeros_like(out_ref))

    tab = jnp.asarray(np.random.randint(0, 1 << 20, (R, 32)).astype(np.int32))
    rows = np.random.randint(0, R, (P, 1)).astype(np.int32)
    rows = jnp.asarray(np.broadcast_to(rows, (P, 32)).copy())

    @jax.jit
    def run(tab, rows):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, 32), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, rows)

    dt = timed(run, tab, rows)
    return P * reps / dt / 1e6


def probe_select32(P=4096, reps=64):
    """_pick32-style 5-level select tree from a (P, 32) tile row —
    guaranteed-lowering baseline for 32-wide tables."""

    def kernel(tab_ref, dy_ref, out_ref):
        T = tab_ref[:]

        def body(i, acc):
            dy = (dy_ref[:] + i) % 32
            cur = [T[:, j:j + 1] for j in range(32)]
            for bit in (16, 8, 4, 2, 1):
                half = len(cur) // 2
                b = (dy & bit) != 0
                cur = [jnp.where(b, cur[j + half], cur[j])
                       for j in range(half)]
            return acc + cur[0]
        out_ref[:] = jax.lax.fori_loop(0, reps, body,
                                       jnp.zeros_like(out_ref))

    tab = jnp.asarray(np.random.randint(0, 1 << 20, (P, 32)).astype(np.int32))
    dy = jnp.asarray(np.random.randint(0, 32, (P, 1)).astype(np.int32))

    @jax.jit
    def run(tab, dy):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, dy)

    dt = timed(run, tab, dy)
    return P * reps / dt / 1e6


def main():
    print(f"device: {jax.devices()[0]}")
    for name, fn, args in [
        ("axis1 L=8K", probe_axis1, (8 * 1024,)),
        ("axis1 L=32K", probe_axis1, (32 * 1024,)),
        ("axis1 L=128K", probe_axis1, (128 * 1024,)),
        ("axis0 rows R=4K", probe_axis0_rows, (4096,)),
        ("axis0 rows R=32K", probe_axis0_rows, (32768,)),
        ("select32", probe_select32, ()),
    ]:
        try:
            rate = fn(*args)
            print(f"{name}: {rate:.1f} M lookups/s")
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{name}: FAILED — {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
