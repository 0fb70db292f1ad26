"""Lens undistortion on TPU.

Replaces cv2.undistort (reference proc2d.py:25-65, tasks/proc2d.py:120-143)
with a jittable inverse-mapping bilinear remap: for each undistorted output
pixel, apply the forward OPENCV distortion model to find its source position
in the distorted input, then bilinearly sample.

Supports the camera models the reference handles (camera.py:14-138):
OPENCV (k1,k2,p1,p2), RADIAL (k1,k2), SIMPLE_RADIAL (k).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def distort_normalized(x, y, dist):
    """Forward OPENCV distortion of normalized coords. dist = (k1,k2,p1,p2[,k3])."""
    dx, dy = distort_delta(x, y, dist)
    return x + dx, y + dy


def distort_delta(x, y, dist):
    """Distortion DISPLACEMENT (x_d - x, y_d - y) of normalized coords.

    Computed directly (radial-1 = r2*(k1 + r2*(k2 + r2*k3))) so it has
    full float32 precision relative to the displacement itself: forming
    x_d then subtracting x would round at the magnitude of x and, with
    zero distortion, leave the identity map off by an ulp — enough to
    push border pixels outside the `inside` test and to blend
    neighbouring pixels at fx ~ 1e-4 everywhere else."""
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    k3 = dist[4] if len(dist) > 4 else 0.0
    r2 = x * x + y * y
    radial_m1 = r2 * (k1 + r2 * (k2 + r2 * k3))
    dx = x * radial_m1 + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = y * radial_m1 + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return dx, dy


def bilinear_sample(image, px, py):
    """Bilinear sample of (H, W[, C]) image at float pixel coords (px, py).
    Out-of-bounds clamps to the border (cv2.BORDER_CONSTANT differs only on
    the outermost ring; the valid undistorted region matches)."""
    H, W = image.shape[0], image.shape[1]
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(px - x0, 0.0, 1.0)
    fy = jnp.clip(py - y0, 0.0, 1.0)
    if image.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    i00 = image[y0, x0]
    i01 = image[y0, x0 + 1]
    i10 = image[y0 + 1, x0]
    i11 = image[y0 + 1, x0 + 1]
    top = i00 * (1 - fx) + i01 * fx
    bot = i10 * (1 - fx) + i11 * fx
    return top * (1 - fy) + bot * fy


@jax.jit
def undistort(image, K, dist):
    """Undistort one (H, W[, C]) image. K: 3x3 intrinsics; dist: length>=4.

    Same output grid convention as cv2.undistort with newCameraMatrix=K.
    """
    image = jnp.asarray(image)
    f32 = image.astype(jnp.float32)
    H, W = image.shape[0], image.shape[1]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = (u - cx) / fx
    y = (v - cy) / fy
    x = jnp.broadcast_to(x, (H, W))
    y = jnp.broadcast_to(y, (H, W))
    # pixel position as source-pixel + scaled displacement: exact for
    # zero distortion (see distort_delta)
    dx, dy = distort_delta(x, y, jnp.asarray(dist, jnp.float32))
    px = jnp.broadcast_to(u, (H, W)) + dx * fx
    py = jnp.broadcast_to(v, (H, W)) + dy * fy
    out = bilinear_sample(f32, px, py)
    # zero outside the source image (cv2 fills with 0)
    inside = (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
    if image.ndim == 3:
        inside = inside[..., None]
    out = jnp.where(inside, out, 0.0)
    if jnp.issubdtype(image.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(image.dtype)
    return out


def undistort_batch(images, K, dist):
    """vmapped undistort over (N, H, W[, C]) with shared camera."""
    return jax.vmap(lambda im: undistort(im, K, dist))(images)
