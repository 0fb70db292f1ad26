"""Probe: would STATIC-scale int8 PTQ beat bf16 end-to-end?

The dynamic int8 lane (models/quant.py) measured SLOWER than bf16 on
both nets (ResUNet 148 vs 198 img/s @896^2 b64, TPUSegNet 333 vs 379
@b96) despite the 2x per-conv MXU rate (exp_int8_conv.py): each conv
pays an unfusible full-activation absmax reduce plus quantize/dequant
passes, and at 896^2 the nets are HBM-bound, not MXU-bound.

This experiment times the STATIC-scale formulation — activation scale
is a compile-time constant, so the quantize cast fuses into the
preceding GroupNorm/ReLU epilogue and the only extra cost is the
dequant multiply fused into the conv epilogue. Numerics are wrong (the
constant scale is arbitrary); this measures the static-PTQ performance
CEILING to decide whether calibration infrastructure is worth building.

Run on the real TPU: python -u exp_int8_static.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def static_int8_conv(lhs, rhs, window_strides, padding,
                     lhs_dilation=None, rhs_dilation=None,
                     dimension_numbers=None, feature_group_count=1,
                     precision=None, preferred_element_type=None):
    # compile-time activation scale — the point of the experiment
    sx = jnp.float32(0.05)
    xq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    w = rhs.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True),
                     1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))


def bench(model, params, batch, size, steps=5):
    @jax.jit
    def fwd(p, x):
        logits = model.apply(p, x.astype(jnp.bfloat16) / 255.0)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs.mean()

    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (batch, size, size, 3), dtype=np.uint8))
    t0 = time.perf_counter(); float(fwd(params, x))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(steps):
        t0 = time.perf_counter(); float(fwd(params, x))
        ts.append(time.perf_counter() - t0)
    return batch / min(ts), compile_s


def main():
    from pathlib import Path
    from plant3dvision_tpu.models.checkpoint import (
        _upcast_f16, model_from_config, params_from_npz_bytes)

    for ckpt, batch in [("checkpoints/tpusegnet_seg.npz", 96),
                        ("checkpoints/unet_seg.npz", 64)]:
        params, config = params_from_npz_bytes(Path(ckpt).read_bytes())
        params = jax.device_put(_upcast_f16(params))
        base = model_from_config(config)
        for name, m in [("bf16", base),
                        ("int8-static", base.clone(conv_impl=static_int8_conv))]:
            img_s, cs = bench(m, params, batch, 896)
            print(f"{ckpt} b{batch} {name}: {img_s:7.1f} img/s "
                  f"(compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
