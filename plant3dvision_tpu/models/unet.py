"""ResNet-backbone UNet for plant organ segmentation (Flax linen).

TPU design notes:
- convs in bfloat16 with float32 params/accumulation (MXU-friendly);
- GroupNorm instead of BatchNorm: no cross-device batch stats, so the
  training step shards cleanly over a ('dp','tp') mesh;
- static 2^k feature map sizes; inputs are center-cropped/padded to a
  multiple of 32 (the reference crops to 896x896, tasks/proc2d.py:351).
"""

from __future__ import annotations

from typing import Sequence

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def _gn(features: int) -> int:
    """GroupNorm group count that always divides the channel count."""
    return math.gcd(features, 32)

SEGMENTATION_LABELS = ["background", "flower", "fruit", "leaf", "pedicel", "stem"]


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, padding="SAME")(x)
        h = nn.GroupNorm(num_groups=_gn(self.features), dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, padding="SAME")(h)
        h = nn.GroupNorm(num_groups=_gn(self.features), dtype=jnp.float32)(h)
        return nn.relu(h)


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    dtype=self.dtype, padding="SAME")(x)
        h = nn.GroupNorm(num_groups=_gn(self.features), dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, padding="SAME")(h)
        h = nn.GroupNorm(num_groups=_gn(self.features), dtype=jnp.float32)(h)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, padding="SAME")(x)
        return nn.relu(h + x)


class ResUNet(nn.Module):
    """Encoder: ResNet stages; decoder: bilinear upsample + skip concat."""

    n_classes: int = len(SEGMENTATION_LABELS)
    widths: Sequence[int] = (64, 128, 256, 512)
    blocks_per_stage: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3) float32 in [0,1]; H, W multiples of 32
        h = x.astype(self.dtype)
        h = nn.Conv(self.widths[0], (7, 7), strides=(2, 2), dtype=self.dtype,
                    padding="SAME")(h)
        h = nn.GroupNorm(num_groups=_gn(self.widths[0]), dtype=jnp.float32)(h)
        h = nn.relu(h)

        skips = [h]
        for i, w in enumerate(self.widths):
            stride = 2 if i > 0 else 1
            h = ResBlock(w, stride=stride, dtype=self.dtype)(h)
            for _ in range(self.blocks_per_stage - 1):
                h = ResBlock(w, dtype=self.dtype)(h)
            skips.append(h)

        # decoder
        h = skips[-1]
        for skip in reversed(skips[:-1]):
            target = skip.shape
            h = jax.image.resize(h, (h.shape[0], target[1], target[2], h.shape[3]),
                                 method="bilinear").astype(self.dtype)
            h = jnp.concatenate([h, skip.astype(self.dtype)], axis=-1)
            h = ConvBlock(target[3], dtype=self.dtype)(h)

        # final upsample to input resolution
        h = jax.image.resize(h, (x.shape[0], x.shape[1], x.shape[2], h.shape[3]),
                             method="bilinear").astype(self.dtype)
        h = ConvBlock(self.widths[0] // 2, dtype=self.dtype)(h)
        logits = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32)(h)
        return logits.astype(jnp.float32)


def create_unet(rng, input_shape=(1, 896, 896, 3), n_classes=None,
                widths=(64, 128, 256, 512), blocks_per_stage=2):
    """Init a ResUNet; returns (model, params)."""
    model = ResUNet(n_classes=n_classes or len(SEGMENTATION_LABELS),
                    widths=tuple(widths), blocks_per_stage=blocks_per_stage)
    params = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    return model, params


def pad_to_multiple(img, multiple=32):
    """Zero-pad (H, W[, C]) up to the next multiple; returns (img, (H, W))."""
    H, W = img.shape[0], img.shape[1]
    ph = (-H) % multiple
    pw = (-W) % multiple
    pad = ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2)
    return jnp.pad(img, pad), (H, W)


def segmentation_inference(model, params, images, batch_size=4):
    """Batched softmax inference over (N, H, W, 3) uint8/float images.

    Returns (N, n_classes, H, W) float32 probabilities — the reference's
    romiseg output layout (tasks/proc2d.py:351-359).
    """
    import numpy as np

    imgs = np.asarray(images)
    if imgs.dtype == np.uint8:
        imgs = imgs.astype(np.float32) / 255.0
    N, H, W, _ = imgs.shape
    ph, pw = (-H) % 32, (-W) % 32

    @jax.jit
    def fwd(batch):
        batch = jnp.pad(batch, ((0, 0), (0, ph), (0, pw), (0, 0)))
        logits = model.apply(params, batch)
        probs = jax.nn.softmax(logits, axis=-1)
        return probs[:, :H, :W, :]

    outs = []
    for i in range(0, N, batch_size):
        chunk = imgs[i: i + batch_size]
        pad_n = batch_size - len(chunk)
        if pad_n:
            chunk = np.concatenate([chunk, np.zeros((pad_n, H, W, 3), np.float32)])
        probs = np.asarray(fwd(jnp.asarray(chunk)))
        outs.append(probs[: batch_size - pad_n if pad_n else batch_size])
    probs = np.concatenate(outs)
    return np.moveaxis(probs, -1, 1)  # (N, C, H, W)
