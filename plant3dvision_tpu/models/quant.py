"""Dynamic int8 quantized conv lane for segmentation serving.

The v5e MXU executes int8 x int8 -> int32 contractions at ~2x its bf16
rate; for the conv-dominated segmentation nets (models/unet.py,
models/segnet.py — the romiseg role, reference tasks/proc2d.py:328-393)
that halves the serving cost per image once the net is big enough to be
MXU-bound. This lane is POST-TRAINING and DYNAMIC:

- weights: symmetric per-output-channel int8 (scale = absmax/127 over
  (kh, kw, cin)), quantized inside the jitted program from the same
  float checkpoint params — no new checkpoint format, every shipped
  NPZ works unchanged;
- activations: symmetric per-tensor int8, scale computed on the fly
  (one absmax reduce per conv — a single extra VPU pass over an
  activation that the 9 x Cin-MAC conv dwarfs);
- accumulation in int32 (`preferred_element_type`), dequantized to
  float32 before bias/GroupNorm, so the normalization/softmax math is
  untouched.

Wired through flax's `nn.Conv(conv_general_dilated=...)` hook, so the
module tree — and therefore the checkpoint param tree — is IDENTICAL
to the float lane ("Conv_0" names and shapes unchanged).

Accuracy: dynamic symmetric PTQ on ReLU/GroupNorm activations; the
committed-checkpoint agreement guard lives in
tests/unit/test_models.py (argmax agreement vs the bf16 lane).

MEASURED VERDICT (v5e, 896^2, SEG_BENCH.json): the lane is an opt-in
that does NOT pay on these nets — ResUNet b64 148 vs 198 img/s,
TPUSegNet b96 333 vs 379. The per-conv absmax reduce is an unfusible
extra HBM pass and the nets are bandwidth-bound at this resolution.
The static-scale ceiling probe (exp_int8_static.py — activation scale
as a compile-time constant, i.e. zero calibration overhead) measured
422.9 vs 418.4 (wash) on TPUSegNet and 169.8 vs 197.7 (loss) on
ResUNet, so calibration infrastructure would not recoup it either:
XLA's int8 conv path only reaches its ~2x MXU rate (227 vs 124 TOP/s,
exp_int8_conv.py) on long chains of same-shape convs, not through the
GroupNorm/resize-laden UNet graph. bf16 stays the default serving
dtype; the lane remains for int8-friendly deployments (conv_mode
param on Segmentation2D).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def int8_conv_general_dilated(lhs, rhs, window_strides, padding,
                              lhs_dilation=None, rhs_dilation=None,
                              dimension_numbers=None,
                              feature_group_count=1, precision=None,
                              preferred_element_type=None):
    """Drop-in `lax.conv_general_dilated` with dynamic int8 quantization.

    lhs: (B, H, W, Cin) activations (any float dtype); rhs:
    (kh, kw, Cin, K) kernel. Returns float32 (dequantized int32
    accumulate). Assumes NHWC/HWIO dimension numbers (what nn.Conv
    emits for 2D convs).
    """
    x = lhs.astype(jnp.float32)
    w = rhs.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True),
                     1e-12) / 127.0                       # (1,1,1,K)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))
