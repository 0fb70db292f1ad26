"""Multi-chip space carving.

Two shardings, chosen by what dominates:
- view-sharded ('dp' over the view axis): every chip carves the full grid
  over its view shard; killed/seen flags are OR-reduced across chips.
  One small collective (2 x grid int8) rides ICI at the end.
- grid-sharded (Z-slabs over 'dp'): each chip holds a grid slab and loops
  over ALL views; no collective on the grid at all (views are broadcast).
  Use when the grid exceeds one chip's HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.carving import _project


def carve_sharded(masks, cameras, valid, origin, voxel_size, shape,
                  mesh: Mesh, axis: str = "dp"):
    """View-sharded carve: masks/cameras sharded over `axis`, OR-reduced.

    masks: (V, H, W) with V divisible by mesh.shape[axis] (pad + valid=False
    for the remainder).
    """
    from jax import shard_map

    V, H, W = masks.shape
    n = mesh.shape[axis]
    assert V % n == 0, f"pad views to a multiple of {n}"

    origin = jnp.asarray(origin, jnp.float32)
    vs = jnp.float32(voxel_size)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    def _carve_shard(masks_l, cams_l, valid_l):
        masks_flat = (masks_l.reshape(masks_l.shape[0], H * W) != 0)

        def body(carry, inputs):
            killed, seen = carry
            mask_flat, cam, ok = inputs
            _, _, pxi, pyi, in_img = _project(cam, origin, vs, shape, W, H)
            lin = jnp.clip(pyi, 0, H - 1) * W + jnp.clip(pxi, 0, W - 1)
            hit = jnp.take(mask_flat, lin.reshape(-1), axis=0).reshape(shape)
            in_img = jnp.logical_and(in_img, ok)
            return (killed | (in_img & ~hit), seen | (in_img & hit)), None

        # carry must be marked device-varying over the shard axis (vma rules)
        init = jax.lax.pcast((jnp.zeros(shape, bool), jnp.zeros(shape, bool)),
                             (axis,), to="varying")
        (killed, seen), _ = jax.lax.scan(body, init,
                                         (masks_flat, cams_l, valid_l))
        # OR-reduce across view shards (max over int8 == logical OR)
        killed = jax.lax.pmax(killed.astype(jnp.int8), axis)
        seen = jax.lax.pmax(seen.astype(jnp.int8), axis)
        return jnp.where(killed == 1, jnp.int8(-1),
                         jnp.where(seen == 1, jnp.int8(1), jnp.int8(0)))

    return jax.jit(_carve_shard)(masks, cameras, valid)


def carve_grid_sharded(masks, cameras, valid, origin, voxel_size, shape,
                       mesh: Mesh, axis: str = "dp"):
    """Z-slab-sharded carve: the grid's X axis is sharded over `axis`; views
    are replicated. No grid collective — the output stays sharded.

    shape[0] must be divisible by the mesh axis size.
    """
    n = mesh.shape[axis]
    nx, ny, nz = shape
    assert nx % n == 0, f"pad grid x-dim to a multiple of {n}"
    V, H, W = masks.shape

    vs = jnp.float32(voxel_size)
    local_shape = (nx // n, ny, nz)

    from jax import shard_map
    from functools import partial

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P()),
             out_specs=P(axis))
    def _carve_slab(masks_g, cams_g, valid_g):
        slab = jax.lax.axis_index(axis)
        slab_origin = jnp.asarray(origin, jnp.float32) + jnp.array(
            [slab.astype(jnp.float32) * (nx // n) * vs, 0.0, 0.0])
        masks_flat = (masks_g.reshape(V, H * W) != 0)

        def body(carry, inputs):
            killed, seen = carry
            mask_flat, cam, ok = inputs
            _, _, pxi, pyi, in_img = _project(cam, slab_origin, vs,
                                              local_shape, W, H)
            lin = jnp.clip(pyi, 0, H - 1) * W + jnp.clip(pxi, 0, W - 1)
            hit = jnp.take(mask_flat, lin.reshape(-1), axis=0).reshape(local_shape)
            in_img = jnp.logical_and(in_img, ok)
            return (killed | (in_img & ~hit), seen | (in_img & hit)), None

        init = jax.lax.pcast(
            (jnp.zeros(local_shape, bool), jnp.zeros(local_shape, bool)),
            (axis,), to="varying")
        (killed, seen), _ = jax.lax.scan(body, init, (masks_flat, cams_g, valid_g))
        return jnp.where(killed, jnp.int8(-1),
                         jnp.where(seen, jnp.int8(1), jnp.int8(0)))

    return jax.jit(_carve_slab)(masks, cameras, valid)
