"""2D mask computation: vegetation filters, thresholding, binary dilation.

Replaces reference proc2d.py (linear :69, excess_green :118, dilation :172)
with batched jittable TPU ops — the whole mask fileset is computed in ONE
vmapped program instead of a per-image python loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rescale01(image):
    """uint images -> [0,1] floats (role of skimage img_as_float32 +
    rescale_intensity in reference proc2d)."""
    image = jnp.asarray(image)
    if image.dtype == jnp.uint8:
        return image.astype(jnp.float32) / 255.0
    if image.dtype == jnp.uint16:
        return image.astype(jnp.float32) / 65535.0
    image = image.astype(jnp.float32)
    lo = jnp.min(image)
    hi = jnp.max(image)
    return (image - lo) / jnp.maximum(hi - lo, 1e-12)


def linear_filter(image, coefs):
    """Per-channel linear combination on [0,1] image (proc2d.py:69-115)."""
    img = rescale01(image)
    coefs = jnp.asarray(coefs, dtype=jnp.float32)
    return jnp.tensordot(img[..., : coefs.shape[0]], coefs, axes=([-1], [0]))


def excess_green(image):
    """EG = 2g - r - b on chromatic coordinates (proc2d.py:118-169)."""
    img = rescale01(image)
    s = jnp.sum(img[..., :3], axis=-1, keepdims=True)
    chroma = img[..., :3] / jnp.maximum(s, 1e-12)
    r, g, b = chroma[..., 0], chroma[..., 1], chroma[..., 2]
    return 2.0 * g - r - b


def _disk_offsets(radius: int) -> np.ndarray:
    """Euclidean disk footprint offsets (skimage.morphology.disk semantics)."""
    r = int(radius)
    dy, dx = np.mgrid[-r: r + 1, -r: r + 1]
    keep = dy ** 2 + dx ** 2 <= r ** 2
    return np.stack([dy[keep], dx[keep]], axis=1)


@functools.partial(jax.jit, static_argnames=("radius",))
def binary_dilation(mask, radius: int):
    """Binary dilation with an exact Euclidean disk footprint
    (reference proc2d.py:172-219 decomposed-disk dilation).

    mask: (..., H, W) bool/0-1. Dense branch-free formulation: max over
    rolled copies for every offset in the disk — VPU-friendly, fuses.
    """
    if radius <= 0:
        return mask
    m = jnp.asarray(mask).astype(jnp.float32)
    out = m
    for dy, dx in _disk_offsets(radius):
        if dy == 0 and dx == 0:
            continue
        shifted = jnp.roll(m, (int(dy), int(dx)), axis=(-2, -1))
        # zero out wrap-around rows/cols
        H, W = m.shape[-2], m.shape[-1]
        yidx = jax.lax.broadcasted_iota(jnp.int32, m.shape, m.ndim - 2)
        xidx = jax.lax.broadcasted_iota(jnp.int32, m.shape, m.ndim - 1)
        valid_y = jnp.logical_and(yidx - dy >= 0, yidx - dy < H)
        valid_x = jnp.logical_and(xidx - dx >= 0, xidx - dx < W)
        shifted = jnp.where(jnp.logical_and(valid_y, valid_x), shifted, 0.0)
        out = jnp.maximum(out, shifted)
    return out > 0.5


@functools.partial(jax.jit, static_argnames=("filter_type", "dilation_radius", "binarize"))
def compute_mask(image, filter_type: str = "linear", coefs=(0.0, 1.0, 0.0),
                 threshold: float = 0.3, dilation_radius: int = 0, binarize: bool = True):
    """Full Masks-task pixel pipeline, fused: filter -> threshold -> dilate.

    Returns float32 in [0,1] (binarized: {0,1}) matching the reference's
    uint8-png-scaled output semantics (tasks/proc2d.py:224-249).
    """
    if filter_type in ("linear",):
        x = linear_filter(image, jnp.asarray(coefs))
    elif filter_type in ("excess_green",):
        x = excess_green(image)
    else:
        raise ValueError(f"Unknown mask filter type: {filter_type}")
    if binarize:
        m = x > threshold
        if dilation_radius > 0:
            m = binary_dilation(m, dilation_radius)
        return m.astype(jnp.float32)
    return jnp.clip(x, 0.0, 1.0)


def compute_masks_batch(images, **kwargs):
    """vmapped compute_mask over a stacked (N, H, W, C) image batch."""
    fn = functools.partial(compute_mask, **kwargs)
    return jax.vmap(fn)(images)


def compute_mask_numpy(image, filter_type="linear", coefs=(0.0, 1.0, 0.0),
                       threshold=0.3, dilation_radius=0, binarize=True,
                       as_bool=False):
    """Pure-numpy compute_mask (identical semantics).

    The standalone Masks task uses this path: thresholding a uint8 image is
    memory-bound host work living between two PNG codecs — shipping the
    bytes to the accelerator per file costs more than the op. The jitted
    version exists for the fused on-device pipeline (tasks.fused).

    as_bool=True (requires binarize) returns the bool mask directly —
    skips a 4-bytes/px float32 materialization for consumers that
    bit-pack or compare anyway (tasks/fused.py decodes 300 such masks
    on one host core; the float copies were ~20% of its decode phase).
    """
    img = np.asarray(image)
    if as_bool and not binarize:
        raise ValueError("as_bool requires binarize=True")

    # fast lane: uint8 + linear + binarize with a single positive coef
    # reduces to one integer comparison (no float copies; GIL-friendly)
    if (binarize and filter_type == "linear" and img.dtype == np.uint8):
        c = np.asarray(coefs, np.float32)
        nz = np.nonzero(c)[0]
        if len(nz) == 1 and c[nz[0]] > 0:
            ch = img if img.ndim == 2 else img[..., nz[0]]
            m = ch > (threshold * 255.0 / c[nz[0]])
            if dilation_radius > 0:
                m = _dilate_np(m, dilation_radius)
            return m if as_bool else m.astype(np.float32)

    if img.ndim == 2:
        img = img[..., None]
    if img.dtype == np.uint8:
        x = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        x = img.astype(np.float32) / 65535.0
    else:
        x = img.astype(np.float32)
        lo, hi = x.min(), x.max()
        x = (x - lo) / max(hi - lo, 1e-12)
    if filter_type == "linear":
        c = np.asarray(coefs, np.float32)
        n = min(x.shape[-1], len(c))
        out = x[..., :n] @ c[:n]
    elif filter_type == "excess_green":
        s = np.maximum(x[..., :3].sum(axis=-1, keepdims=True), 1e-12)
        chroma = x[..., :3] / s
        out = 2 * chroma[..., 1] - chroma[..., 0] - chroma[..., 2]
    else:
        raise ValueError(f"Unknown mask filter type: {filter_type}")
    if not binarize:
        return np.clip(out, 0.0, 1.0)
    m = out > threshold
    if dilation_radius > 0:
        m = _dilate_np(m, dilation_radius)
    return m if as_bool else m.astype(np.float32)


def _dilate_np(m, radius):
    from scipy.ndimage import binary_dilation as nd_dilation
    r = int(radius)
    size = 2 * r + 1
    fp = np.zeros((size, size), bool)
    for dy, dx in _disk_offsets(r):
        fp[dy + r, dx + r] = True
    return nd_dilation(m, structure=fp)
