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
        x_off = jax.lax.axis_index(axis) * (nx // n)
        origin_j = jnp.asarray(origin, jnp.float32)
        masks_flat = (masks_g.reshape(V, H * W) != 0)

        def body(carry, inputs):
            killed, seen = carry
            mask_flat, cam, ok = inputs
            _, _, pxi, pyi, in_img = _project(cam, origin_j, vs,
                                              local_shape, W, H,
                                              x_off=x_off)
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


def carve_2d_sharded(masks, cameras, valid, origin, voxel_size, shape,
                     mesh: Mesh, view_axis: str = "vp",
                     grid_axis: str = "gp"):
    """2D-mesh carve: views sharded over `view_axis` AND grid X-slabs
    over `grid_axis` — the full SPMD recipe for scans that outgrow one
    chip in BOTH dimensions (a view set too large to keep HBM-resident
    per chip, and a grid finer than one chip holds; reference hot loop
    cl.py:190-227 is one-chip only). Each of the nv x ng devices carves
    its (view shard x grid slab) block over its local views; the ONLY
    collective is the kill/seen OR-join (pmax over int8) across the
    view axis — 2 x slab-sized int8 riding ICI; nothing ever moves
    across the grid axis. Voxels are indexed by GLOBAL x index
    (_project x_off) so the result is bit-identical to the dense
    engine.

    masks: (V, H, W), V divisible by mesh.shape[view_axis] (pad +
    valid=False); shape[0] divisible by mesh.shape[grid_axis].
    Returns int8: -1 killed / 1 alive-and-seen / 0 unobserved.
    """
    from functools import partial

    from jax import shard_map

    nv = mesh.shape[view_axis]
    ng = mesh.shape[grid_axis]
    V, H, W = masks.shape
    nx, ny, nz = shape
    assert V % nv == 0, f"pad views to a multiple of {nv}"
    assert nx % ng == 0, f"pad grid x-dim to a multiple of {ng}"

    vs = jnp.float32(voxel_size)
    local_shape = (nx // ng, ny, nz)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(view_axis), P(view_axis), P(view_axis)),
             out_specs=P(grid_axis))
    def _carve_block(masks_l, cams_l, valid_l):
        x_off = jax.lax.axis_index(grid_axis) * (nx // ng)
        origin_j = jnp.asarray(origin, jnp.float32)
        masks_flat = (masks_l.reshape(masks_l.shape[0], H * W) != 0)

        def body(carry, inputs):
            killed, seen = carry
            mask_flat, cam, ok = inputs
            _, _, pxi, pyi, in_img = _project(cam, origin_j, vs,
                                              local_shape, W, H,
                                              x_off=x_off)
            lin = jnp.clip(pyi, 0, H - 1) * W + jnp.clip(pxi, 0, W - 1)
            hit = jnp.take(mask_flat, lin.reshape(-1),
                           axis=0).reshape(local_shape)
            in_img = jnp.logical_and(in_img, ok)
            return (killed | (in_img & ~hit), seen | (in_img & hit)), None

        init = jax.lax.pcast(
            (jnp.zeros(local_shape, bool), jnp.zeros(local_shape, bool)),
            (view_axis, grid_axis), to="varying")
        (killed, seen), _ = jax.lax.scan(body, init,
                                         (masks_flat, cams_l, valid_l))
        killed = jax.lax.pmax(killed.astype(jnp.int8), view_axis)
        seen = jax.lax.pmax(seen.astype(jnp.int8), view_axis)
        return jnp.where(killed == 1, jnp.int8(-1),
                         jnp.where(seen == 1, jnp.int8(1), jnp.int8(0)))

    return jax.jit(_carve_block)(masks, cameras, valid)


def average_grid_sharded(masks, cameras, valid, origin, voxel_size, shape,
                         mesh: Mesh, axis: str = "dp"):
    """X-slab-sharded multi-label AVERAGING volume (the ML route's
    Voxels(type="averaging") hot op, reference kernels/backprojection.c:36-55
    semantics): each device accumulates bilinear samples for its grid slab
    over ALL views. No collective touches the volume, and every slab sums
    views in the same order as the dense engine (and indexes voxels by
    GLOBAL index, see _project x_off) — the result matches
    ops.carving.average to FMA-level float noise (~1e-6 relative; XLA
    may fuse the bilinear multiply-adds differently per compiled
    program, so cross-program float bit-exactness is not guaranteed —
    the discrete-label carve engines ARE bit-exact). This is the
    memory-scaling lane: the averaging grid is float32 (4x the carve
    labels) and is what OOMs first on fine ML voxels (a 0.5 mm
    real-scan averaging volume exceeds one v5e's HBM — CLAUDE.md
    round-3 session-5 note).

    shape[0] must be divisible by the mesh axis size (pad the bbox).
    """
    from functools import partial

    from jax import shard_map

    n = mesh.shape[axis]
    nx, ny, nz = shape
    assert nx % n == 0, f"pad grid x-dim to a multiple of {n}"
    V, H, W = masks.shape

    vs = jnp.float32(voxel_size)
    local_shape = (nx // n, ny, nz)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P()),
             out_specs=P(axis))
    def _avg_slab(masks_g, cams_g, valid_g):
        x_off = jax.lax.axis_index(axis) * (nx // n)
        origin_j = jnp.asarray(origin, jnp.float32)
        masks_flat = masks_g.reshape(V, H * W).astype(jnp.float32)

        def body(acc, inputs):
            mask_flat, cam, ok = inputs
            px, py, pxi, pyi, in_img = _project(cam, origin_j, vs,
                                                local_shape, W, H,
                                                x_off=x_off)
            x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, W - 2)
            y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, H - 2)
            fx = jnp.clip(px - x0.astype(jnp.float32), 0.0, 1.0)
            fy = jnp.clip(py - y0.astype(jnp.float32), 0.0, 1.0)

            def g(yy, xx):
                return jnp.take(mask_flat, (yy * W + xx).reshape(-1),
                                axis=0).reshape(local_shape)

            val = (g(y0, x0) * (1 - fx) * (1 - fy)
                   + g(y0, x0 + 1) * fx * (1 - fy)
                   + g(y0 + 1, x0) * (1 - fx) * fy
                   + g(y0 + 1, x0 + 1) * fx * fy)
            in_img = jnp.logical_and(in_img, ok)
            return acc + jnp.where(in_img, val, 0.0), None

        init = jax.lax.pcast(jnp.zeros(local_shape, jnp.float32),
                             (axis,), to="varying")
        acc, _ = jax.lax.scan(body, init, (masks_flat, cams_g, valid_g))
        return acc

    return jax.jit(_avg_slab)(masks, cameras, valid)
