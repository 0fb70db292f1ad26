"""ResNet-backbone UNet for plant organ segmentation (Flax linen).

TPU design notes:
- convs in bfloat16 with float32 params/accumulation (MXU-friendly);
- GroupNorm instead of BatchNorm: no cross-device batch stats, so the
  training step shards cleanly over a ('dp','tp') mesh;
- static 2^k feature map sizes; inputs are center-cropped/padded to a
  multiple of 32 (the reference crops to 896x896, tasks/proc2d.py:351).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def _gn(features: int) -> int:
    """GroupNorm group count that always divides the channel count."""
    return math.gcd(features, 32)

SEGMENTATION_LABELS = ["background", "flower", "fruit", "leaf", "pedicel", "stem"]


class ChannelAffine(nn.Module):
    """Per-channel y = x * scale + bias — the inference-time form of a
    folded BatchNorm (gamma/sqrt(var+eps), beta - mean*that). Same param
    names/shapes as GroupNorm (scale, bias) so checkpoints share one
    layout; only the apply semantics differ (no statistics are taken).
    Used by `norm="affine"` models that ingest torch BatchNorm
    checkpoints (reference romiseg loads Resnet_896_896_epoch50.pt,
    tasks/proc2d.py:336-351; see models/checkpoint.fold_batchnorm)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return x.astype(jnp.float32) * scale + bias


def _make_norm(norm: str, features: int):
    if norm == "affine":
        return ChannelAffine(features)
    return nn.GroupNorm(num_groups=_gn(features), dtype=jnp.float32)


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "group"
    #: optional lax.conv_general_dilated replacement for the compute
    #: convs (models/quant.int8_conv_general_dilated for the int8 lane)
    conv_impl: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, padding="SAME",
                    conv_general_dilated=self.conv_impl)(x)
        h = _make_norm(self.norm, self.features)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, padding="SAME",
                    conv_general_dilated=self.conv_impl)(h)
        h = _make_norm(self.norm, self.features)(h)
        return nn.relu(h)


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "group"
    conv_impl: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    dtype=self.dtype, padding="SAME",
                    conv_general_dilated=self.conv_impl)(x)
        h = _make_norm(self.norm, self.features)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, padding="SAME",
                    conv_general_dilated=self.conv_impl)(h)
        h = _make_norm(self.norm, self.features)(h)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, padding="SAME",
                        conv_general_dilated=self.conv_impl)(x)
        return nn.relu(h + x)


class ResUNet(nn.Module):
    """Encoder: ResNet stages; decoder: bilinear upsample + skip concat."""

    n_classes: int = len(SEGMENTATION_LABELS)
    widths: Sequence[int] = (64, 128, 256, 512)
    blocks_per_stage: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    #: "group" (default, trainable/shardable) or "affine" (pure
    #: per-channel scale+bias — the landing slot for folded torch
    #: BatchNorm checkpoints, models/checkpoint.fold_batchnorm)
    norm: str = "group"
    #: optional conv replacement for every compute conv (the int8
    #: serving lane, models/quant.py); the float32 logits head is
    #: always exact. None = stock lax conv. Not a checkpointed value —
    #: the param tree is identical either way.
    conv_impl: Any = None

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3) float32 in [0,1]; H, W multiples of 32
        h = x.astype(self.dtype)
        h = nn.Conv(self.widths[0], (7, 7), strides=(2, 2), dtype=self.dtype,
                    padding="SAME", conv_general_dilated=self.conv_impl)(h)
        h = _make_norm(self.norm, self.widths[0])(h)
        h = nn.relu(h)

        skips = [h]
        for i, w in enumerate(self.widths):
            stride = 2 if i > 0 else 1
            h = ResBlock(w, stride=stride, dtype=self.dtype,
                         norm=self.norm, conv_impl=self.conv_impl)(h)
            for _ in range(self.blocks_per_stage - 1):
                h = ResBlock(w, dtype=self.dtype, norm=self.norm,
                             conv_impl=self.conv_impl)(h)
            skips.append(h)

        # decoder
        h = skips[-1]
        for skip in reversed(skips[:-1]):
            target = skip.shape
            h = jax.image.resize(h, (h.shape[0], target[1], target[2], h.shape[3]),
                                 method="bilinear").astype(self.dtype)
            h = jnp.concatenate([h, skip.astype(self.dtype)], axis=-1)
            h = ConvBlock(target[3], dtype=self.dtype, norm=self.norm,
                          conv_impl=self.conv_impl)(h)

        # final upsample to input resolution
        h = jax.image.resize(h, (x.shape[0], x.shape[1], x.shape[2], h.shape[3]),
                             method="bilinear").astype(self.dtype)
        h = ConvBlock(self.widths[0] // 2, dtype=self.dtype, norm=self.norm,
                      conv_impl=self.conv_impl)(h)
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


@functools.lru_cache(maxsize=16)
def _fwd_program(model, H, W, cdt_str, is_uint8, quantize, tta=False):
    cdt = jnp.dtype(cdt_str)
    ph, pw = (-H) % 32, (-W) % 32

    @jax.jit
    def fwd(params, batch):
        x = batch.astype(cdt)
        if is_uint8:
            x = x / jnp.asarray(255.0, cdt)

        def apply(xu):
            xp = jnp.pad(xu, ((0, 0), (0, ph), (0, pw), (0, 0)))
            logits = model.apply(params, xp)
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return p[:, :H, :W, :]   # crop BEFORE any un-flip: the zero
            #                          padding is always bottom/right

        probs = apply(x)
        if tta:
            # flip-averaged test-time augmentation: plants are upright so
            # only the horizontal flip is domain-valid; measured on the
            # fixture renders it lifts fruit IoU .733 -> .752 and pedicel
            # soft-recall .886 -> .906 for 2x (cheap, MXU-bound) compute
            probs = 0.5 * (probs + apply(x[:, :, ::-1])[:, :, ::-1])
        # transpose to (B, C, H, W) ON DEVICE — the API's output layout,
        # and the only TPU-friendly one: NHWC's 6-channel minor dim pads
        # to the 128 vector lanes (a 21x-inflated output buffer; measured
        # 0.4 s/batch extra just materializing it), while NCHW's minor
        # dim W tiles exactly. XLA fuses the softmax into the transpose.
        probs = probs.transpose(0, 3, 1, 2)
        if quantize:
            # device->host links can be the bottleneck (remote TPU relay
            # here; PCIe elsewhere): ship probabilities as uint8/255 —
            # the consumers binarize or write 8-bit PNGs anyway
            probs = (probs * 255.0 + 0.5).astype(jnp.uint8)
        return probs

    return fwd


def segmentation_inference(model, params, images, batch_size=8,
                           compute_dtype="bfloat16",
                           output_dtype="uint8", tta=False,
                           data_parallel="auto", conv_mode="bf16"):
    """Batched softmax inference over (N, H, W, 3) uint8/float images.

    Returns (N, n_classes, H, W) probabilities in `output_dtype` — the
    reference's romiseg output layout (tasks/proc2d.py:351-359); uint8
    means probs * 255 (default: 4x less device->host traffic, lossless
    for the 8-bit PNG / binarize consumers). Pass "float32" for [0, 1].

    TPU shaping: the whole conv stack runs in bfloat16 (MXU-native; the
    softmax is taken in float32), raw uint8 batches are shipped to the
    device and normalized there (4x less PCIe/ICI traffic than f32), and
    dispatch is DOUBLE-BUFFERED — batch i+1 is enqueued before batch i's
    result is pulled, hiding host decode + transfer under device compute.

    `data_parallel` shards each batch over ALL visible devices (batch
    axis over a flat "dp" mesh; params replicated, no collectives in the
    forward pass — the serving half of SURVEY §2.4's TPU mapping).
    "auto" enables it on any multi-device non-CPU backend; the CPU
    backend stays single-device by default because the 8-device mesh in
    this repo's test harness is virtual (one physical core). The
    effective batch is rounded up to a multiple of the device count.

    `conv_mode="int8"` swaps every compute conv for the dynamic int8
    PTQ lane (models/quant.py): the v5e MXU runs int8 contractions at
    ~2x its bf16 rate (measured 227 vs 124 TOP/s on 3x3 128ch convs,
    exp_int8_conv.py), same checkpoint, float32 logits head untouched.
    """
    import numpy as np

    if conv_mode not in ("bf16", "float", "int8"):
        raise ValueError(f"conv_mode must be bf16|int8, got {conv_mode!r}")
    if conv_mode == "int8":
        from .quant import int8_conv_general_dilated
        model = model.clone(conv_impl=int8_conv_general_dilated)

    imgs = np.asarray(images)
    N, H, W, _ = imgs.shape
    cdt = jnp.dtype(compute_dtype)
    params_c = jax.tree.map(
        lambda x: x.astype(cdt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, params)

    devices = jax.devices()
    if data_parallel == "auto":
        data_parallel = len(devices) > 1 and devices[0].platform != "cpu"
    batch_sharding = None
    if data_parallel and len(devices) > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        batch_size = int(-(-batch_size // len(devices)) * len(devices))
        mesh = Mesh(np.array(devices), ("dp",))
        batch_sharding = NamedSharding(mesh, P("dp"))
        params_c = jax.device_put(params_c, NamedSharding(mesh, P()))
    # checkpoint-loaded params are host numpy arrays: without an explicit
    # device_put they would re-cross the host->device link on EVERY jit
    # call (measured +300 ms/batch for 14 MB of params on this relay)
    if batch_sharding is None:
        params_c = jax.device_put(params_c)
    # the compiled program is cached across calls (a fresh closure per
    # call would recompile the full CNN every time — tens of seconds of
    # remote XLA compile per Segmentation2D task invocation)
    quantize = jnp.dtype(output_dtype) == jnp.uint8
    fwd = _fwd_program(model, H, W, str(cdt), imgs.dtype == np.uint8,
                       quantize, bool(tta))

    pending = []   # (device result, n_valid) — depth-2 pipeline
    outs = []
    for i in range(0, N, batch_size):
        chunk = imgs[i: i + batch_size]
        pad_n = batch_size - len(chunk)
        if pad_n:
            chunk = np.concatenate(
                [chunk, np.zeros((pad_n, H, W, 3), chunk.dtype)])
        batch_dev = (jax.device_put(chunk, batch_sharding)
                     if batch_sharding is not None else jnp.asarray(chunk))
        pending.append((fwd(params_c, batch_dev), batch_size - pad_n))
        if len(pending) > 1:
            res, n_valid = pending.pop(0)
            outs.append(np.asarray(res)[:n_valid])
    for res, n_valid in pending:
        outs.append(np.asarray(res)[:n_valid])
    return np.concatenate(outs)       # (N, C, H, W), transposed on device
