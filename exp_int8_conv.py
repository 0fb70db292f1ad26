"""Microbench: does an int8 conv beat bf16 on the v5e MXU through XLA?

Decides whether a quantized (PTQ) segmentation inference lane is worth
building. The axon relay has a ~30-35 ms blocking-pull latency floor
(measured: a 2.4 GFLOP matmul and a 470 GFLOP conv both "cost" ~36 ms
per call), so each timed program chains REPS dependent convs and makes
ONE scalar pull — device time per conv = (t_call - t_null) / REPS.

First capture (per-call, latency-dominated): bf16 45.1 ms, int8 36.2 ms
per call at 8x448x448x128->128 3x3 — suggestive but polluted.

Run on the real TPU: python -u exp_int8_conv.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))
REPS = 32


def conv_chain(dtype, acc_dtype):
    """REPS dependent convs (output feeds the next input, cast back to
    `dtype` each round) in ONE program; returns a scalar."""
    @jax.jit
    def f(x, w):
        wc = w.astype(dtype)

        def body(h, _):
            y = lax.conv_general_dilated(
                h, wc, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=acc_dtype)
            # rescale so int8 doesn't saturate / floats don't blow up
            if acc_dtype == jnp.int32:
                h2 = (y >> 10).astype(dtype)
            else:
                h2 = (y * 0.01).astype(dtype)
            return h2, ()
        h, _ = lax.scan(body, x.astype(dtype), None, length=REPS)
        return jnp.sum(h.astype(jnp.float32))
    return f


@jax.jit
def null_prog(x):
    return jnp.sum(x[:1, :1, :1, :1].astype(jnp.float32))


def timed(f, *args, iters=8):
    float(f(*args))
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(f(*args))
    return (time.perf_counter() - t0) / iters, s


def main():
    B, H, W, C = 8, 448, 448, 128
    K = 128
    rng = np.random.RandomState(0)
    x_f = rng.rand(B, H, W, C).astype(np.float32) - 0.5
    w_f = (rng.rand(3, 3, C, K).astype(np.float32) - 0.5) * 0.1
    x_i = rng.randint(-8, 9, (B, H, W, C)).astype(np.int8)
    w_i = rng.randint(-8, 9, (3, 3, C, K)).astype(np.int8)

    flops = 2.0 * B * H * W * C * K * 9
    print(f"conv {B}x{H}x{W}x{C}->{K} 3x3, {REPS} chained/program, "
          f"{flops/1e12:.3f} TFLOP each", flush=True)

    xd = jax.device_put(x_f)
    t_null, _ = timed(null_prog, xd)
    print(f"null dispatch+pull: {t_null*1e3:.1f} ms", flush=True)

    for name, dt_, acc, x, w in [
        ("bf16", jnp.bfloat16, jnp.float32, x_f, w_f),
        ("int8/int32", jnp.int8, jnp.int32, x_i, w_i),
    ]:
        f = conv_chain(dt_, acc)
        xd, wd = jax.device_put(x), jax.device_put(w)
        t, s = timed(f, xd, wd)
        per = (t - t_null) / REPS
        print(f"{name}: {t*1e3:8.2f} ms/call -> {per*1e3:6.2f} ms/conv "
              f"{flops/per/1e12:7.2f} TOP/s  (chk {s:.3e})", flush=True)


if __name__ == "__main__":
    main()
