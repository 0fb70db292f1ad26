"""Eikonal solver (geodesic distance in a voxel mask) on TPU.

Replaces the reference's OpenCL Fast Iterative Method with atomic
active-list compaction (cl.py:362-472 + kernels/fim.c) by dense Jacobi
iterations of the Godunov upwind update under lax.while_loop — TPUs prefer
full-grid vectorized sweeps over irregular worklists (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = 1e10


def _axis_min_neighbor(u, axis):
    """min(u[i-1], u[i+1]) along axis with INF boundaries."""
    lo = jnp.roll(u, 1, axis=axis)
    hi = jnp.roll(u, -1, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, u.shape, axis)
    n = u.shape[axis]
    lo = jnp.where(idx == 0, _INF, lo)
    hi = jnp.where(idx == n - 1, _INF, hi)
    return jnp.minimum(lo, hi)


def _godunov_update(u, speed_inv, mask):
    """One Jacobi sweep of the 3D Godunov upwind discretization
    (same quadratic solve as kernels/fim.c:14-41, h=1)."""
    a = _axis_min_neighbor(u, 0)
    b = _axis_min_neighbor(u, 1)
    c = _axis_min_neighbor(u, 2)
    # sort (a, b, c) ascending
    lo = jnp.minimum(jnp.minimum(a, b), c)
    hi = jnp.maximum(jnp.maximum(a, b), c)
    mid = a + b + c - lo - hi
    f = speed_inv

    # 1-neighbor solution
    u1 = lo + f
    # 2-neighbor solution: solve (u-lo)^2 + (u-mid)^2 = f^2
    s2 = lo + mid
    d2 = 2.0 * f * f - (lo - mid) ** 2
    u2 = jnp.where(d2 > 0, 0.5 * (s2 + jnp.sqrt(jnp.maximum(d2, 0.0))), _INF)
    # 3-neighbor solution
    s3 = lo + mid + hi
    d3 = s3 * s3 - 3.0 * (lo * lo + mid * mid + hi * hi - f * f)
    u3 = jnp.where(d3 > 0, (s3 + jnp.sqrt(jnp.maximum(d3, 0.0))) / 3.0, _INF)

    cand = jnp.where(u1 <= mid, u1, jnp.where(u2 <= hi, u2, u3))
    new_u = jnp.minimum(u, cand)
    return jnp.where(mask, new_u, _INF)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def geodesic_distance(mask, seeds, speed=None, max_iters=10000, tol=1e-3):
    """Geodesic distance from seed voxels through the mask.

    mask: (nx,ny,nz) bool — the domain (e.g. occupied voxels).
    seeds: (nx,ny,nz) bool — distance-zero set (e.g. the root slice).
    speed: optional (nx,ny,nz) float speeds (default 1).
    Returns float32 distances (INF outside mask / unreachable).
    """
    mask = jnp.asarray(mask, bool)
    seeds = jnp.asarray(seeds, bool)
    speed_inv = (1.0 / jnp.maximum(jnp.asarray(
        speed if speed is not None else jnp.ones(mask.shape)), 1e-6)
                 ).astype(jnp.float32)
    u0 = jnp.where(seeds & mask, 0.0, _INF).astype(jnp.float32)

    def cond(state):
        it, u, delta = state
        return jnp.logical_and(it < max_iters, delta > tol)

    def body(state):
        it, u, _ = state
        new_u = _godunov_update(u, speed_inv, mask)
        new_u = jnp.where(seeds & mask, 0.0, new_u)
        finite = new_u < _INF / 2
        delta = jnp.max(jnp.where(finite, jnp.abs(u - new_u), 0.0))
        return it + 1, new_u, delta

    _, u, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), u0, jnp.float32(2 * tol)))
    return u


@jax.jit
def gradient_flow(distance, mask):
    """Normalized gradient of the distance map — the descent field used for
    geodesic tracing (reference cl.py:464-472 get_gradient_flow).

    Differences are mask-aware: only in-mask neighbor pairs contribute, so
    wall voxels don't pick up spurious cross-tube components.
    """
    mask = jnp.asarray(mask, bool)
    d = jnp.where(mask, distance, 0.0)
    comps = []
    for axis in range(3):
        fwd_d = jnp.roll(d, -1, axis=axis) - d
        bwd_d = d - jnp.roll(d, 1, axis=axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, axis)
        n = d.shape[axis]
        fwd_ok = mask & jnp.roll(mask, -1, axis=axis) & (idx < n - 1)
        bwd_ok = mask & jnp.roll(mask, 1, axis=axis) & (idx > 0)
        num = jnp.where(fwd_ok, fwd_d, 0.0) + jnp.where(bwd_ok, bwd_d, 0.0)
        den = fwd_ok.astype(d.dtype) + bwd_ok.astype(d.dtype)
        comps.append(num / jnp.maximum(den, 1.0))
    g = jnp.stack(comps, axis=-1)
    n = jnp.linalg.norm(g, axis=-1, keepdims=True)
    return jnp.where(mask[..., None], g / jnp.maximum(n, 1e-9), 0.0)
