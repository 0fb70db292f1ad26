"""TPUSegNet: the organ-segmentation CNN re-shaped for the TPU.

Covers the same role as models/unet.ResUNet (the reference romiseg CNN,
reference plant3dvision/tasks/proc2d.py:328-393) but is designed against
the hardware instead of translated from torch:

- The TPU vector unit is (8, 128) lanes and the MXU is a 128x128
  systolic array: every tensor whose channel count is below 128 is
  padded up to 128 lanes, so a 24-channel conv costs the SAME wall time
  as a 128-channel one (measured on this chip: 26.2 ms vs 28.0 ms for
  3x3 convs at 448^2 = 0.63 vs 16.94 TFLOPS). ResUNet's romiseg-parity
  widths (24..192, and a 12-channel 896^2 tail) therefore waste >90% of
  the machine.
- TPUSegNet moves ALL compute to channel counts >= 128: the input is
  space-to-depth packed (4x4 patches -> 48 channels at 224^2), the
  stem lifts straight to 128, and the head predicts n_classes * 16
  subpixel logits at 224^2 that a depth-to-space reshape expands to the
  full 896^2 grid (zero FLOPs at full resolution).
- bfloat16 convs with float32 params; GroupNorm in float32 (tensors at
  >=128 channels pad perfectly, so the f32 passes are pure-bandwidth
  and cheap).

Same functional surface as ResUNet: __call__(x: (B, H, W, 3) in [0,1])
-> (B, H, W, n_classes) float32 logits, H and W multiples of patch*8.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .unet import SEGMENTATION_LABELS


def _gn(features: int) -> int:
    return math.gcd(features, 32)


def space_to_depth(x, p: int):
    """(B, H, W, C) -> (B, H/p, W/p, C*p*p); fixed (ph, pw, c) ordering."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // p, W // p, p * p * C)


def depth_to_space(x, p: int):
    """(B, h, w, C*p*p) -> (B, h*p, w*p, C); inverse ordering of above."""
    B, h, w, Cpp = x.shape
    C = Cpp // (p * p)
    x = x.reshape(B, h, w, p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h * p, w * p, C)


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    #: optional conv replacement (models/quant.py int8 serving lane)
    conv_impl: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    dtype=self.dtype, padding="SAME",
                    conv_general_dilated=self.conv_impl)(x)
        h = nn.GroupNorm(num_groups=_gn(self.features), dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                    padding="SAME", conv_general_dilated=self.conv_impl)(h)
        h = nn.GroupNorm(num_groups=_gn(self.features), dtype=jnp.float32)(h)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        dtype=self.dtype,
                        conv_general_dilated=self.conv_impl)(x)
        return nn.relu(h + x)


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    conv_impl: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                    padding="SAME", conv_general_dilated=self.conv_impl)(x)
        h = nn.GroupNorm(num_groups=_gn(self.features), dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                    padding="SAME", conv_general_dilated=self.conv_impl)(h)
        h = nn.GroupNorm(num_groups=_gn(self.features), dtype=jnp.float32)(h)
        return nn.relu(h)


class TPUSegNet(nn.Module):
    n_classes: int = len(SEGMENTATION_LABELS)
    widths: Sequence[int] = (128, 256, 256)
    blocks_per_stage: int = 2
    patch: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    #: optional conv replacement for every compute conv (the dynamic
    #: int8 PTQ serving lane, models/quant.py); the float32 subpixel
    #: head stays exact. Same param tree either way.
    conv_impl: Any = None

    @nn.compact
    def __call__(self, x):
        p = self.patch
        B, H, W, _ = x.shape
        h = space_to_depth(x.astype(self.dtype), p)      # (B, H/p, W/p, 48)
        h = nn.Conv(self.widths[0], (3, 3), dtype=self.dtype,
                    padding="SAME", conv_general_dilated=self.conv_impl)(h)
        h = nn.GroupNorm(num_groups=_gn(self.widths[0]),
                         dtype=jnp.float32)(h)
        h = nn.relu(h)

        skips = []
        for i, w in enumerate(self.widths):
            stride = 2 if i > 0 else 1
            h = ResBlock(w, stride=stride, dtype=self.dtype,
                         conv_impl=self.conv_impl)(h)
            for _ in range(self.blocks_per_stage - 1):
                h = ResBlock(w, dtype=self.dtype,
                             conv_impl=self.conv_impl)(h)
            skips.append(h)

        h = skips[-1]
        for skip in reversed(skips[:-1]):
            t = skip.shape
            h = jax.image.resize(h, (B, t[1], t[2], h.shape[3]),
                                 method="bilinear").astype(self.dtype)
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvBlock(t[3], dtype=self.dtype, conv_impl=self.conv_impl)(h)

        # subpixel head: n_classes logits per pixel of the p x p patch,
        # expanded by a reshape — no conv ever runs at full resolution
        h = nn.Conv(self.n_classes * p * p, (1, 1), dtype=jnp.float32)(h)
        return depth_to_space(h.astype(jnp.float32), p)  # (B, H, W, n)


def create_segnet(rng, input_shape=(1, 896, 896, 3), n_classes=None,
                  widths=(128, 256, 256), blocks_per_stage=2, patch=4):
    """Init a TPUSegNet; returns (model, params)."""
    model = TPUSegNet(n_classes=n_classes or len(SEGMENTATION_LABELS),
                      widths=tuple(widths),
                      blocks_per_stage=blocks_per_stage, patch=patch)
    params = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    return model, params
