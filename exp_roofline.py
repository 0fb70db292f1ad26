"""Roofline microbenchmarks for the carve ceiling analysis (VERDICT r3
#9): measure the v5e primitive rates the fused carve engine is built
from, so the ~10.7 Gvv/s device-only rate can be expressed as a % of a
modeled floor instead of an assertion.

Also the one-hot MXU gather probe (VERDICT r3 #3): effective lookup rate
of a gather formulated as a (N, B) x (B,) one-hot matmul, vs the native
gather unit, as a function of table size B. CARVE_CEILING.md item 2
refutes it arithmetically; this records the MEASURED crossover.

Run on the real TPU: python exp_roofline.py
Every timing forces a scalar pull (relay block_until_ready lies —
CLAUDE.md).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 256


def timed(fn, *args, reps=3):
    np.asarray(fn(*args))    # warm: compile + full pull
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        s = fn(*args)
        float(np.asarray(s).ravel()[0])   # scalar pull
        best = min(best, time.perf_counter() - t0)
    return best


def hbm_stream_bw():
    """x = a*x + b iterated in one program: 4 B read + 4 B write per
    element per step."""
    n = 128 * 1024 * 1024 // 4       # 128 MB array
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def run(x):
        def body(x, _):
            return x * jnp.float32(1.0000001) + jnp.float32(1e-7), None
        x, _ = jax.lax.scan(body, x, None, length=STEPS)
        return x[:1]

    dt = timed(run, x)
    bytes_moved = 2 * 4 * n * STEPS
    return bytes_moved / dt / 1e9     # GB/s


def mxu_bf16():
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def run(a):
        def body(x, _):
            return (x @ a) * jnp.bfloat16(1e-3), None
        x, _ = jax.lax.scan(body, a, None, length=STEPS)
        return x[:1, :1].astype(jnp.float32)

    dt = timed(run, a)
    flops = 2 * 4096**3 * STEPS
    return flops / dt / 1e12          # TFLOPS


def gather_rate(table_kb=194, n_lookups=8 * 1024 * 1024):
    """Flat random u8 gather from a packed-mask-sized table."""
    tb = int(table_kb * 1024)
    table = jnp.asarray(np.random.randint(0, 255, tb, dtype=np.uint8))
    idx = jnp.asarray(np.random.randint(0, tb, n_lookups, dtype=np.int32))

    @jax.jit
    def run(table, idx):
        def body(acc, _):
            v = jnp.take(table, idx, axis=0)
            return acc + v.astype(jnp.int32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=4)
        return acc

    dt = timed(run, table, idx)
    return 4 * n_lookups / dt / 1e6   # M lookups/s


def row_gather_rate(n_rows=1024 * 1024, row_words=32, table_rows=65536):
    """32-word (128 B) row gathers — the tile fine-level fetch."""
    table = jnp.asarray(
        np.random.randint(0, 2**31, (table_rows, row_words), dtype=np.int32))
    idx = jnp.asarray(np.random.randint(0, table_rows, n_rows, np.int32))

    @jax.jit
    def run(table, idx):
        def body(acc, _):
            rows = jnp.take(table, idx, axis=0)
            return acc + rows.sum(dtype=jnp.int64), None
        acc, _ = jax.lax.scan(body, jnp.int64(0), None, length=4)
        return acc

    dt = timed(run, table, idx)
    return 4 * n_rows / dt / 1e6      # M rows/s


def onehot_matmul_gather(B, n_lookups=1024 * 1024):
    """Gather as one-hot matmul: (N, B) bf16 one-hot x (B,) table values
    on the MXU. Effective lookups/s for table size B bytes."""
    if B > 8192:
        return None
    table = jnp.asarray(np.random.rand(B).astype(np.float32))
    idx = np.random.randint(0, B, n_lookups, np.int32)
    onehot = jnp.asarray(
        (idx[:, None] == np.arange(B)[None, :]).astype(np.dtype("bfloat16")))

    tb = table.astype(jnp.bfloat16)

    @jax.jit
    def run(onehot, tb):
        def body(acc, _):
            v = onehot @ tb
            return acc + v.sum(dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=4)
        return acc

    dt = timed(run, onehot, tb)
    return 4 * n_lookups / dt / 1e6


def main():
    out = {"device": str(jax.devices()[0])}
    out["hbm_stream_GBps"] = round(hbm_stream_bw(), 1)
    print("hbm", out["hbm_stream_GBps"], "GB/s", flush=True)
    out["mxu_bf16_TFLOPS"] = round(mxu_bf16(), 1)
    print("mxu", out["mxu_bf16_TFLOPS"], "TFLOPS", flush=True)
    out["gather_194KB_Mps"] = round(gather_rate(194), 1)
    print("gather 194KB", out["gather_194KB_Mps"], "M/s", flush=True)
    out["gather_4KB_Mps"] = round(gather_rate(4), 1)
    print("gather 4KB", out["gather_4KB_Mps"], "M/s", flush=True)
    out["row_gather_128B_Mps"] = round(row_gather_rate(), 1)
    print("row gather", out["row_gather_128B_Mps"], "Mrows/s", flush=True)
    for B in (1024, 4096):
        r = onehot_matmul_gather(B)
        if r is not None:
            out[f"onehot_B{B}_Mps"] = round(r, 1)
            print(f"one-hot B={B}", round(r, 1), "M/s", flush=True)
    with open("ROOFLINE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
