"""Geodesic particle tracing with vote accumulation on TPU.

Replaces the reference's per-tip OpenCL kernel with atomic votes
(cl.py:314-359 + kernels/geodesics.c): vmapped trilinear descent stepping
over a lax.scan, with votes scatter-added per step — no atomics needed,
scatter-add is deterministic under XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _trilinear(vol, pts):
    """Trilinear sample of (nx,ny,nz[,C]) volume at (N,3) float points."""
    nx, ny, nz = vol.shape[:3]
    p0 = jnp.floor(pts).astype(jnp.int32)
    f = pts - p0
    p0 = jnp.clip(p0, 0, jnp.array([nx - 2, ny - 2, nz - 2]))

    def g(dx, dy, dz):
        idx = p0 + jnp.array([dx, dy, dz])
        return vol[idx[:, 0], idx[:, 1], idx[:, 2]]

    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]
    if vol.ndim == 3:
        fx, fy, fz = fx[:, 0], fy[:, 0], fz[:, 0]
    return (g(0, 0, 0) * (1 - fx) * (1 - fy) * (1 - fz)
            + g(1, 0, 0) * fx * (1 - fy) * (1 - fz)
            + g(0, 1, 0) * (1 - fx) * fy * (1 - fz)
            + g(0, 0, 1) * (1 - fx) * (1 - fy) * fz
            + g(1, 1, 0) * fx * fy * (1 - fz)
            + g(1, 0, 1) * fx * (1 - fy) * fz
            + g(0, 1, 1) * (1 - fx) * fy * fz
            + g(1, 1, 1) * fx * fy * fz)


@functools.partial(jax.jit, static_argnames=("n_steps",))
def trace_geodesics(flow, values, tips, step=0.5, n_steps=2000):
    """Trace particles from `tips` down the `flow` field, voting along the
    way (reference kernels/geodesics.c semantics: stop when the distance
    value stops decreasing or drops below `step`).

    flow: (nx,ny,nz,3) descent field; values: (nx,ny,nz) distance map;
    tips: (N,3) float start points (index coords).
    Returns votes (nx,ny,nz) int32.
    """
    shape = values.shape
    N = tips.shape[0]

    def body(carry, _):
        pos, alive, prev_val, votes = carry
        g = _trilinear(flow, pos)
        new_pos = pos - step * g
        new_pos = jnp.clip(new_pos, 0.0,
                           jnp.array(shape, jnp.float32) - 1.001)
        val = _trilinear(values, new_pos)
        still = alive & (val < prev_val) & (val > step)
        vote_idx = jnp.round(new_pos).astype(jnp.int32)
        lin = (vote_idx[:, 0] * shape[1] * shape[2]
               + vote_idx[:, 1] * shape[2] + vote_idx[:, 2])
        lin = jnp.where(still, lin, votes.size)  # dropped when dead
        votes = votes.at[lin].add(1, mode="drop")
        pos = jnp.where(still[:, None], new_pos, pos)
        return (pos, still, val, votes), None

    votes0 = jnp.zeros(shape[0] * shape[1] * shape[2], jnp.int32)
    init = (tips.astype(jnp.float32), jnp.ones(N, bool),
            jnp.full(N, 1e10, jnp.float32), votes0)
    (pos, alive, _, votes), _ = jax.lax.scan(body, init, None, length=n_steps)
    return votes.reshape(shape)
