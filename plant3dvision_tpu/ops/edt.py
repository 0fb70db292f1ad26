"""Euclidean distance transforms on TPU.

Replaces scipy.ndimage.distance_transform_edt as used by the reference's
vol2pcd (proc3d.py:518-522). Two strategies:

- `squared_edt(x)` — exact separable squared EDT via the Felzenszwalb
  1-D lower-envelope decomposition, where each 1-D pass is expressed as a
  *windowed min-plus* over parabola shifts. With a window (cap) R, the result
  is exact for every voxel whose true distance is <= R, and >= R elsewhere.
  The dense shift formulation is branch-free, vectorizes onto the VPU, and
  is exactly what vol2pcd needs: only a thin band around the surface is ever
  read (band half-width ~ level_set_value + sqrt(3) + gaussian radius).
- `edt(x, cap=None)` — sqrt of the above; cap=None uses the full axis length
  (exact everywhere, O(n) shifts per axis — still dense and jittable).

The separable decomposition: D²(p) = min_q (||p-q||² s.t. x[q]=0) is computed
axis by axis: F0 = 0 where x==0 else INF; then for each axis
F_{k}[.., i, ..] = min_s ( F_{k-1}[.., i+s, ..] + s² ).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = 1e12


def _minplus_pass(f, axis: int, cap: int):
    """One 1-D windowed min-plus parabola pass along `axis`.

    Uses lax.scan over shift magnitude with rolled adds — O(cap) dense ops.
    """
    n = f.shape[axis]
    cap = min(cap, n - 1)

    def body(carry, s):
        # shift by +s and -s along axis; out-of-range filled with INF
        up = _shift_fill(f, s, axis)
        down = _shift_fill(f, -s, axis)
        cand = jnp.minimum(up, down) + jnp.asarray(s, f.dtype) ** 2
        return jnp.minimum(carry, cand), None

    shifts = jnp.arange(1, cap + 1)
    out, _ = jax.lax.scan(body, f, shifts)
    return out


def _shift_fill(x, s, axis):
    """Shift x by s along axis, filling vacated entries with INF."""
    return jnp.where(
        _valid_mask(x.shape, s, axis),
        jnp.roll(x, -s, axis=axis),
        jnp.asarray(_INF, x.dtype),
    )


def _valid_mask(shape, s, axis):
    n = shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return jnp.logical_and(idx + s >= 0, idx + s <= n - 1)


@functools.partial(jax.jit, static_argnames=("cap",))
def squared_edt(x, cap: int | None = None):
    """Squared Euclidean distance to the nearest zero of `x`.

    Matches scipy.ndimage.distance_transform_edt(x)**2 wherever the true
    distance <= cap (exact separable transform within the window).
    """
    x = jnp.asarray(x)
    f = jnp.where(x != 0, jnp.asarray(_INF, jnp.float32), 0.0).astype(jnp.float32)
    for axis in range(x.ndim):
        c = x.shape[axis] - 1 if cap is None else cap
        f = _minplus_pass(f, axis, c)
    return f


def edt(x, cap: int | None = None):
    return jnp.sqrt(jnp.minimum(squared_edt(x, cap), _INF))


def signed_distance(volume, cap: int | None = 16):
    """The reference's signed-distance recipe (proc3d.py:518-522):

        dist  = edt(binary)          # inside distance
        mdist = edt(1 - binary)      # outside distance
        sd    = dist - 0.5  where dist > 0.5, else 0.5 - mdist

    `volume` may be float scores; binarized at > 0.5 as in the reference.
    """
    binary = (jnp.asarray(volume) > 0.5)
    dist = edt(binary.astype(jnp.float32), cap)
    mdist = edt(jnp.logical_not(binary).astype(jnp.float32), cap)
    return jnp.where(dist > 0.5, dist - 0.5, -mdist + 0.5)
