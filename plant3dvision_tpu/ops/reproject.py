"""Batched point->mask reprojection scoring.

Replaces the reference SegmentedPointCloud inner loop — a python loop over
every point of every mask (tasks/proc3d.py:203-231, the worst CPU hotspot
in the ML pipeline) — with one jitted scan over mask files.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_labels",))
def score_points_by_masks(points, masks, cameras, label_idx, n_labels: int):
    """Accumulate per-label mask votes for each 3D point.

    points: (N, 3) float32 world coords.
    masks: (F, H, W) float32 in [0,1] (one file per image x label).
    cameras: (F, 16) packed [fx,fy,cx,cy,R(9),t(3)].
    label_idx: (F,) int32 label index per mask file.
    Returns scores (N, n_labels) float32.
    """
    F, H, W = masks.shape
    N = points.shape[0]
    masks_flat = masks.reshape(F, H * W)

    def body(scores, xs):
        mask_flat, cam, lab = xs
        fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
        R = cam[4:13].reshape(3, 3)
        t = cam[13:16]
        p = points @ R.T + t
        pz = jnp.maximum(p[:, 2], 1e-9)
        px = (p[:, 0] / pz * fx + cx).astype(jnp.int32)
        py = (p[:, 1] / pz * fy + cy).astype(jnp.int32)
        in_img = (p[:, 2] > 0) & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
        lin = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
        vals = jnp.where(in_img, jnp.take(mask_flat, lin, axis=0), 0.0)
        onehot = jax.nn.one_hot(lab, n_labels, dtype=vals.dtype)
        return scores + vals[:, None] * onehot[None, :], None

    scores0 = jnp.zeros((N, n_labels), jnp.float32)
    scores, _ = jax.lax.scan(body, scores0, (masks_flat, cameras, label_idx))
    return scores
