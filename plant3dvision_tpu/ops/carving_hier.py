"""Hierarchical (octree-style) space carving.

The dense carve (ops.carving) does n_voxels x n_views random gathers — the
TPU's weakest operation. This module cuts the gather count ~10-30x while
producing EXACTLY the same volume:

1. Build per-view min/max mask pyramids; a 2x2 cell cover at the right
   level conservatively bounds the mask over any projected cell footprint
   (4 gathers instead of footprint-size gathers).
2. Evaluate the grid coarse-to-fine. A cell's 8 projected corners bound its
   children's projections (perspective image of a convex cube = hull of its
   projected corners), so one dilated-max gather proves "every child killed"
   and one eroded-min gather proves "every child alive & seen". Only
   boundary cells refine.
3. Surviving voxels get the exact single-pixel reference test
   (kernels/backprojection.c semantics) at full resolution.

Decisions are only taken when provable, so the output is bit-identical to
the dense carve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# status codes
KILLED = -1
UNSEEN = 0
ALIVE = 1
UNDECIDED = 2

_EPS_Z = 1e-6


def _pad_to(x, h, w, value):
    return np.pad(x, ((0, h - x.shape[0]), (0, w - x.shape[1])),
                  constant_values=value)


def build_pyramids(masks, n_levels: int):
    """Packed max/min pyramids.

    Returns (packed_max (V, TOT) uint8, packed_min (V, TOT) uint8,
    level_off (L+1,), level_w (L+1,), Hp, Wp). Padding is 0 for max and 1
    for min, so pyramid queries that straddle the image edge stay
    conservative.
    """
    V, H, W = masks.shape
    m = 1 << n_levels
    Hp = -(-H // m) * m
    Wp = -(-W // m) * m

    level_shapes = [(Hp >> l, Wp >> l) for l in range(n_levels + 1)]
    level_off = np.zeros(n_levels + 1, dtype=np.int32)
    for l in range(1, n_levels + 1):
        level_off[l] = level_off[l - 1] + level_shapes[l - 1][0] * level_shapes[l - 1][1]
    level_w = np.array([s[1] for s in level_shapes], dtype=np.int32)

    @jax.jit
    def _build(masks_v):
        base = (masks_v != 0).astype(jnp.uint8)
        base_max = jnp.pad(base, ((0, 0), (0, Hp - H), (0, Wp - W)),
                           constant_values=0)
        base_min = jnp.pad(base, ((0, 0), (0, Hp - H), (0, Wp - W)),
                           constant_values=1)
        outs_max, outs_min = [], []
        cur_max, cur_min = base_max, base_min
        for l in range(n_levels + 1):
            h, w = level_shapes[l]
            outs_max.append(cur_max.reshape(V, h * w))
            outs_min.append(cur_min.reshape(V, h * w))
            if l < n_levels:
                cur_max = cur_max.reshape(V, h // 2, 2, w // 2, 2).max(axis=(2, 4))
                cur_min = cur_min.reshape(V, h // 2, 2, w // 2, 2).min(axis=(2, 4))
        return (jnp.concatenate(outs_max, axis=1),
                jnp.concatenate(outs_min, axis=1))

    packed_max, packed_min = _build(jnp.asarray(masks))
    return packed_max, packed_min, jnp.asarray(level_off), jnp.asarray(level_w), Hp, Wp


_CUBE_OFFS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                       [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
                      dtype=np.float32)


@functools.partial(jax.jit, static_argnames=("cell_vox", "H", "W", "n_levels"))
def eval_cells(cells, cams, valid, packed_max, packed_min, level_off, level_w,
               origin, voxel_size, cell_vox: int, H: int, W: int,
               n_levels: int):
    """Classify cells of size cell_vox^3 voxels: KILLED/ALIVE/UNSEEN/UNDECIDED.

    cells: (M, 3) int32 cell coords (units of cell_vox voxels); rows with
    cells[:, 0] < 0 are padding and return UNDECIDED=never (status KILLED
    is fine for padding; caller masks).
    """
    M = cells.shape[0]
    s_world = voxel_size * cell_vox
    corners = (origin[None, None, :]
               + (cells[:, None, :].astype(jnp.float32)
                  + _CUBE_OFFS[None, :, :]) * s_world)  # (M, 8, 3)

    def body(carry, xs):
        any_kill, all_ok, any_hit = carry
        cam, ok_view, pmax_v, pmin_v = xs
        fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
        R = cam[4:13].reshape(3, 3)
        t = cam[13:16]
        p = jnp.einsum("mkj,ij->mki", corners, R) + t  # (M, 8, 3)
        pz = p[..., 2]
        behind = jnp.any(pz <= _EPS_Z, axis=1)
        pzs = jnp.maximum(pz, _EPS_Z)
        px = p[..., 0] / pzs * fx + cx
        py = p[..., 1] / pzs * fy + cy
        pxmin = jnp.min(px, axis=1); pxmax = jnp.max(px, axis=1)
        pymin = jnp.min(py, axis=1); pymax = jnp.max(py, axis=1)

        fully_out = ((pxmax <= -1.0) | (pxmin >= W) | (pymax <= -1.0)
                     | (pymin >= H)) & ~behind
        fully_in = ((pxmin >= 0.0) & (pxmax < W) & (pymin >= 0.0)
                    & (pymax < H) & ~behind)

        # integer pixel extents of the children (truncating casts)
        ax = jnp.clip(jnp.floor(pxmin), 0.0, W - 1.0).astype(jnp.int32)
        bx = jnp.clip(jnp.floor(pxmax), 0.0, W - 1.0).astype(jnp.int32)
        ay = jnp.clip(jnp.floor(pymin), 0.0, H - 1.0).astype(jnp.int32)
        by = jnp.clip(jnp.floor(pymax), 0.0, H - 1.0).astype(jnp.int32)
        span = jnp.maximum(bx - ax, by - ay) + 1
        # smallest level whose cell size >= span: the pixel box then covers
        # at most 2x2 cells
        lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(
            span.astype(jnp.float32), 1.0))), 0, n_levels).astype(jnp.int32)
        wl = jnp.take(level_w, lvl)
        offl = jnp.take(level_off, lvl)
        cx0 = jnp.right_shift(ax, lvl)
        cx1 = jnp.right_shift(bx, lvl)
        cy0 = jnp.right_shift(ay, lvl)
        cy1 = jnp.right_shift(by, lvl)

        def q(pyr, cy, cx):
            return jnp.take(pyr, offl + cy * wl + cx, axis=0)

        vmax = jnp.maximum(
            jnp.maximum(q(pmax_v, cy0, cx0), q(pmax_v, cy0, cx1)),
            jnp.maximum(q(pmax_v, cy1, cx0), q(pmax_v, cy1, cx1)))
        vmin = jnp.minimum(
            jnp.minimum(q(pmin_v, cy0, cx0), q(pmin_v, cy0, cx1)),
            jnp.minimum(q(pmin_v, cy1, cx0), q(pmin_v, cy1, cx1)))

        kill_v = fully_in & (vmax == 0) & ok_view
        hit_v = fully_in & (vmin > 0) & ok_view
        no_eff = fully_out | ~ok_view
        ok_v = hit_v | no_eff

        any_kill = any_kill | kill_v
        all_ok = all_ok & ok_v
        any_hit = any_hit | hit_v
        return (any_kill, all_ok, any_hit), None

    init = (jnp.zeros(M, bool), jnp.ones(M, bool), jnp.zeros(M, bool))
    (any_kill, all_ok, any_hit), _ = jax.lax.scan(
        body, init, (cams, valid, packed_max, packed_min))

    status = jnp.where(
        any_kill, jnp.int8(KILLED),
        jnp.where(all_ok & any_hit, jnp.int8(ALIVE),
                  jnp.where(all_ok, jnp.int8(UNSEEN), jnp.int8(UNDECIDED))))
    return jnp.where(cells[:, 0] < 0, jnp.int8(KILLED), status)


@functools.partial(jax.jit, static_argnames=("H", "W"))
def eval_voxels_exact(voxels, cams, valid, masks_flat, origin, voxel_size,
                      H: int, W: int):
    """Exact reference-semantics test for a list of voxels (M, 3)."""
    pts = origin[None, :] + voxels.astype(jnp.float32) * voxel_size

    def body(carry, xs):
        killed, seen = carry
        cam, ok_view, mask_flat = xs
        fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
        R = cam[4:13].reshape(3, 3)
        t = cam[13:16]
        p = pts @ R.T + t
        pz = p[:, 2]
        px = (p[:, 0] / pz * fx + cx).astype(jnp.int32)
        py = (p[:, 1] / pz * fy + cy).astype(jnp.int32)
        in_img = (pz > 0) & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
        in_img = in_img & ok_view
        lin = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
        hit = jnp.take(mask_flat, lin, axis=0) != 0
        return (killed | (in_img & ~hit), seen | (in_img & hit)), None

    init = (jnp.zeros(len(pts), bool), jnp.zeros(len(pts), bool))
    (killed, seen), _ = jax.lax.scan(body, init, (cams, valid, masks_flat))
    return jnp.where(killed, jnp.int8(KILLED),
                     jnp.where(seen, jnp.int8(ALIVE), jnp.int8(UNSEEN)))


def _bucket(n: int) -> int:
    """Round a list length up to a power-of-two bucket (compile caching)."""
    b = 1024
    while b < n:
        b <<= 1
    return b


def carve_hierarchical(masks, cameras, valid, origin, voxel_size, shape,
                       start_level: int = 3, pyramid_levels: int = 8):
    """Drop-in replacement for ops.carving.carve — identical output.

    Host-orchestrated coarse-to-fine refinement; each stage is one jitted
    TPU program over a compacted cell list.
    """
    masks = np.asarray(masks)
    V, H, W = masks.shape
    nx, ny, nz = shape
    origin_j = jnp.asarray(origin, jnp.float32)
    vs = jnp.float32(voxel_size)

    pmax, pmin, level_off, level_w, Hp, Wp = build_pyramids(masks, pyramid_levels)
    cams_j = jnp.asarray(cameras)
    valid_j = jnp.asarray(valid)
    masks_flat = jnp.asarray((masks.reshape(V, H * W) != 0).astype(np.uint8))

    # dense top-level cell list over the padded grid
    m = 1 << start_level
    gx, gy, gz = -(-nx // m), -(-ny // m), -(-nz // m)
    cc = np.stack(np.meshgrid(np.arange(gx), np.arange(gy), np.arange(gz),
                              indexing="ij"), axis=-1).reshape(-1, 3).astype(np.int32)

    out = np.zeros((gx * m, gy * m, gz * m), dtype=np.int8)
    cells = cc
    for g in range(start_level, 0, -1):
        cell_vox = 1 << g
        cap = _bucket(len(cells))
        padded = np.full((cap, 3), -1, dtype=np.int32)
        padded[: len(cells)] = cells
        status = np.asarray(eval_cells(
            jnp.asarray(padded), cams_j, valid_j, pmax, pmin, level_off,
            level_w, origin_j, vs, cell_vox, H, W, pyramid_levels))[: len(cells)]

        # write decided cells into the dense output
        for code in (KILLED, ALIVE, UNSEEN):
            sel = cells[status == code]
            if len(sel):
                _fill_blocks(out, sel, cell_vox, code)

        undec = cells[status == UNDECIDED]
        if len(undec) == 0:
            cells = undec
            break
        # children at the next level
        children = (undec[:, None, :] * 2
                    + _CUBE_OFFS.astype(np.int32)[None, :, :]).reshape(-1, 3)
        cells = children

    if len(cells):
        # final exact pass at voxel resolution
        keep = ((cells[:, 0] < nx) & (cells[:, 1] < ny) & (cells[:, 2] < nz))
        cells = cells[keep]
        cap = _bucket(len(cells))
        padded = np.full((cap, 3), 0, dtype=np.int32)
        padded[: len(cells)] = cells
        status = np.asarray(eval_voxels_exact(
            jnp.asarray(padded), cams_j, valid_j, masks_flat, origin_j, vs,
            H, W))[: len(cells)]
        out[cells[:, 0], cells[:, 1], cells[:, 2]] = status

    return out[:nx, :ny, :nz]


def _fill_blocks(out, cells, cell_vox, value):
    """Fill out[cell*s:(cell+1)*s, ...] = value for each cell (vectorized
    per-offset: s^3 scatter ops of len(cells) writes each)."""
    s = cell_vox
    base = cells * s
    # write via slicing per offset (s^3 assignments, vectorized over cells)
    for dx in range(s):
        for dy in range(s):
            for dz in range(s):
                out[base[:, 0] + dx, base[:, 1] + dy, base[:, 2] + dz] = value
