"""Separable filters on volumes/images, scipy.ndimage-compatible.

Replaces the reference's scipy gaussian_filter / np.gradient usage inside
vol2pcd (proc3d.py:533-555) with jittable TPU code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Identical to scipy.ndimage._gaussian_kernel1d (order 0)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x ** 2)
    return phi / phi.sum()


def _conv1d_along(x, kernel, axis):
    """'reflect' (scipy) boundary = symmetric padding, then valid conv."""
    r = (len(kernel) - 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode="symmetric")
    xp = jnp.moveaxis(xp, axis, -1)
    shape = xp.shape
    flat = xp.reshape(-1, 1, shape[-1])
    k = jnp.asarray(kernel, dtype=x.dtype)[::-1].reshape(1, 1, -1)
    out = jax.lax.conv_general_dilated(flat, k, window_strides=(1,), padding="VALID")
    out = out.reshape(shape[:-1] + (shape[-1] - 2 * r,))
    return jnp.moveaxis(out, -1, axis)


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_filter(x, sigma: float = 1.0, truncate: float = 4.0):
    """scipy.ndimage.gaussian_filter equivalent (mode='reflect')."""
    kernel = gaussian_kernel1d(sigma, truncate)
    for axis in range(x.ndim):
        x = _conv1d_along(x, kernel, axis)
    return x


def gradient(x):
    """np.gradient equivalent: central differences interior, one-sided edges.

    Returns a list of arrays, one per axis.
    """
    outs = []
    for axis in range(x.ndim):
        xm = jnp.moveaxis(x, axis, 0)
        interior = (xm[2:] - xm[:-2]) * 0.5
        first = (xm[1] - xm[0])[None]
        last = (xm[-1] - xm[-2])[None]
        g = jnp.concatenate([first, interior, last], axis=0)
        outs.append(jnp.moveaxis(g, 0, axis))
    return outs
