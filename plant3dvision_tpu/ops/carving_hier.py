"""Hierarchical (octree-style) space carving — device-resident.

The dense carve (ops.carving) does n_voxels x n_views random gathers — the
TPU's weakest operation (~124M random gathers/s on v5e regardless of table
locality). This module cuts the gather count 10-30x while producing EXACTLY
the same volume:

1. Per-view min/max mask pyramids (packed into one buffer per view); a 2x2
   cell cover at the right level conservatively bounds the mask over any
   projected cell footprint (4 gathers).
2. Coarse-to-fine refinement. A cell's 8 projected corners bound its
   children's projections (the perspective image of a convex cube is the
   hull of its projected corners), so the pyramid cover proves either
   "every child killed" or "every child alive & seen"; only boundary cells
   refine. Levels: 8-voxel cells -> 4-voxel cells -> individual voxels
   (the 2-voxel level costs more gathers than it saves).
3. Surviving voxels get the exact single-pixel reference test
   (kernels/backprojection.c semantics).

Everything stays on device: cell lists are compacted with jnp.nonzero
(static caps, bucketed), statuses live in dense per-level volumes, and the
host only pulls one scalar per level to pick the next cap bucket. Output is
bit-identical to the dense carve (tests/unit/test_carving_hier.py).
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


def pack_masks(masks) -> np.ndarray:
    """Host-side bit-packing of binary masks: (V, H, W) -> (V, ceil(HW/8))
    uint8, flat row-major, MSB-first. 8x less host->device traffic and HBM
    churn (carve setup is transfer/alloc bound at 300+ views)."""
    V, H, W = masks.shape
    flat = np.asarray(masks).reshape(V, H * W) != 0
    return np.packbits(flat, axis=1)


def unpack_masks_device(packed, H: int, W: int):
    """Device-side unpack back to (V, H, W) uint8."""
    V = packed.shape[0]
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    return bits.reshape(V, -1)[:, : H * W].reshape(V, H, W)


def packed_lookup(packed_v, lin):
    """Gather mask bits from a packed (ceil(HW/8),) row at flat pixel
    indices `lin` (one gather + bit extraction)."""
    byte = jnp.take(packed_v, jnp.right_shift(lin, 3), axis=0)
    bit = (7 - (lin & 7)).astype(jnp.uint8)
    return ((byte >> bit) & 1) != 0


def _pyramid_shapes(H, W, n_levels):
    m = 1 << n_levels
    Hp = -(-H // m) * m
    Wp = -(-W // m) * m
    level_shapes = [(Hp >> l, Wp >> l) for l in range(n_levels + 1)]
    level_off = np.zeros(n_levels + 1, dtype=np.int32)
    for l in range(1, n_levels + 1):
        level_off[l] = (level_off[l - 1]
                        + level_shapes[l - 1][0] * level_shapes[l - 1][1])
    level_w = np.array([s[1] for s in level_shapes], dtype=np.int32)
    return Hp, Wp, level_shapes, level_off, level_w


def _dilate2x2(x, neutral):
    """max/min over the (y..y+1, x..x+1) window per cell (edge-padded
    with the reduction's neutral element)."""
    V, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1)), constant_values=neutral)
    op = jnp.maximum if neutral == 0 else jnp.minimum
    return op(op(xp[:, :h, :w], xp[:, :h, 1:w + 1]),
              op(xp[:, 1:h + 1, :w], xp[:, 1:h + 1, 1:w + 1]))


def _dilated_pyramids_core(packed, H, W, n_levels):
    """DILATED 2x2 min/max mask pyramids, COMBINED into one uint8 plane:
    bit0 = window max, bit1 = window min.  Level-l entry (y, x) holds the
    reduction over cells (y..y+1, x..x+1) at that level.  The standard
    `_box_cover` picks the level so a projected box spans <= 2 cells per
    axis, so ONE tap at its (cy0, cx0) corner covers the whole box —
    replacing the 4-tap quad fetch over two pyramids (8 random gathers
    per cell-view box test, the dominant carve cost at ~84M lookups/s on
    a v5e) with a single gather.  Dilation only ever widens the window
    (when a box fits in a single cell row/column), i.e. the box test is
    conservative: fewer coarse kills/hits, never a wrong one — the exact
    fine level resolves the extra undecided cells, so the FINAL volume
    is bit-identical (tests/unit/test_carving_hier.py,
    tests/unit/test_parallel_carve.py)."""
    V = packed.shape[0]
    Hp, Wp, level_shapes, _, _ = _pyramid_shapes(H, W, n_levels)
    base = unpack_masks_device(packed, H, W)
    base_max = jnp.pad(base, ((0, 0), (0, Hp - H), (0, Wp - W)),
                       constant_values=0)
    base_min = jnp.pad(base, ((0, 0), (0, Hp - H), (0, Wp - W)),
                       constant_values=1)
    outs = []
    cur_max, cur_min = base_max, base_min
    for l in range(n_levels + 1):
        h, w = level_shapes[l]
        outs.append((_dilate2x2(cur_max, 0)
                     | (_dilate2x2(cur_min, 1) << 1)).reshape(V, h * w))
        if l < n_levels:
            cur_max = cur_max.reshape(V, h // 2, 2, w // 2, 2).max(axis=(2, 4))
            cur_min = cur_min.reshape(V, h // 2, 2, w // 2, 2).min(axis=(2, 4))
    return jnp.concatenate(outs, axis=1)


_build_dilated_from_packed = jax.jit(
    _dilated_pyramids_core, static_argnames=("H", "W", "n_levels"))


def build_pyramids_dilated(masks, n_levels: int, packed=None):
    """Combined dilated pyramid (V, TOT) uint8 (bit0 = window max, bit1 =
    window min) + (level_off, level_w) tables — the single-tap variant of
    `build_pyramids` (see `_dilated_pyramids_core`)."""
    V, H, W = masks.shape if packed is None else masks
    if packed is None:
        packed = pack_masks(masks)
    _, _, _, level_off, level_w = _pyramid_shapes(H, W, n_levels)
    pyr = _build_dilated_from_packed(jnp.asarray(packed), H=H, W=W,
                                     n_levels=n_levels)
    m = 1 << n_levels
    Hp = -(-H // m) * m
    Wp = -(-W // m) * m
    return pyr, jnp.asarray(level_off), jnp.asarray(level_w), Hp, Wp


_CUBE_OFFS_F = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                         [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
                        dtype=np.float32)
_CUBE_OFFS_I = _CUBE_OFFS_F.astype(np.int32)


def _build_tile_tables(packed, H, W):
    """Overlapping 32x32-px bit-tile table for row-gather mask tests.

    Random flat gathers run at ~84M lookups/s on a v5e REGARDLESS of
    element width, but axis-0 ROW gathers fetch a whole row at ~50M
    rows/s — 10x the bytes/s (measured, docs/CARVE_CEILING.md).  The
    fine carve level and the tiled averager exploit this: all 64
    children of one 4-voxel parent cell project into a small pixel
    window, so ONE row-gather of a 32x32-px tile (32 x i32) anchored at
    the window min serves every child; the per-child bit is then picked
    by an in-register select tree (`_pick32`, no further gathers).

    Tiles are anchored every 8 px in y and x (16x memory over the packed
    masks — ~190MB for 60 views at 1440x1080), so any window with span
    <= 25 px fits a single tile.  Word layout: tiles[v, ty, tx, dy] bit
    b (LSB-first) = mask pixel (y = ty*8 + dy, x = tx*8 + b).

    Returns (tiles (V * Ht * Wt, 32) int32, Ht, Wt).
    """
    V = packed.shape[0]
    base = unpack_masks_device(packed, H, W).astype(jnp.uint32)  # (V,H,W)
    Ht, Wt = -(-H // 8), -(-W // 8)
    Hp = (Ht - 1) * 8 + 32 + 8   # +8 so the q-shifted slices stay in range
    Wp = (Wt + 3) * 8
    base = jnp.pad(base, ((0, 0), (0, Hp - H), (0, Wp - W)))
    # non-overlapping byte packing along x (LSB-first)
    wts = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint32)
    bytes_ = (base.reshape(V, Hp, Wp // 8, 8) * wts).sum(axis=3)  # (V,Hp,Wb)
    # overlapping 32-col words anchored every 8 px
    cw = (bytes_[:, :, :Wt]
          | (bytes_[:, :, 1:Wt + 1] << 8)
          | (bytes_[:, :, 2:Wt + 2] << 16)
          | (bytes_[:, :, 3:Wt + 3] << 24))            # (V, Hp, Wt)
    # overlapping 32-row windows anchored every 8 px: dy = 8q + r picks
    # colword row (ty + q)*8 + r
    cw8 = cw.reshape(V, Hp // 8, 8, Wt)
    tiles = jnp.stack([cw8[:, q:q + Ht] for q in range(4)],
                      axis=3)                          # (V, Ht, 8->r, 4->q, ... )
    # current dims: (V, Ht, 8, 4, Wt) with (r at axis2, q at axis3)
    tiles = tiles.transpose(0, 1, 4, 3, 2)             # (V, Ht, Wt, q, r)
    tiles = tiles.reshape(V * Ht * Wt, 32).astype(jnp.int32)
    return tiles, Ht, Wt


def _pick32(T, dy):
    """Select T[p, dy[p, k]] without a gather: 5-level register select
    tree (T: (P, 32) i32, dy: (P, k) int32 in [0, 32)) -> (P, k)."""
    cur = [T[:, j:j + 1] for j in range(32)]
    for bit in (16, 8, 4, 2, 1):
        half = len(cur) // 2
        b = (dy & bit) != 0
        cur = [jnp.where(b, cur[j + half], cur[j]) for j in range(half)]
    return cur[0]


def _classify_cells(cells, cell_valid, cams, valid, pyr,
                    level_off, level_w, origin, voxel_size, cell_vox, H, W,
                    n_levels):
    """Core conservative classification for a (M, 3) list of cells.
    `pyr` is the combined dilated pyramid from `build_pyramids_dilated`
    (bit0 = window max, bit1 = window min): one tap per box test."""
    M = cells.shape[0]
    s_world = voxel_size * cell_vox
    corners = (origin[None, None, :]
               + (cells[:, None, :].astype(jnp.float32)
                  + _CUBE_OFFS_F[None, :, :]) * s_world)  # (M, 8, 3)

    def body(carry, xs):
        any_kill, all_ok, any_hit = carry
        cam, ok_view, pyr_v = xs
        fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
        R = cam[4:13].reshape(3, 3)
        t = cam[13:16]
        p = jnp.einsum("mkj,ij->mki", corners, R) + t
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

        ax = jnp.clip(jnp.floor(pxmin), 0.0, W - 1.0).astype(jnp.int32)
        bx = jnp.clip(jnp.floor(pxmax), 0.0, W - 1.0).astype(jnp.int32)
        ay = jnp.clip(jnp.floor(pymin), 0.0, H - 1.0).astype(jnp.int32)
        by = jnp.clip(jnp.floor(pymax), 0.0, H - 1.0).astype(jnp.int32)
        span = jnp.maximum(bx - ax, by - ay) + 1
        lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(
            span.astype(jnp.float32), 1.0))), 0, n_levels).astype(jnp.int32)
        wl = jnp.take(level_w, lvl)
        offl = jnp.take(level_off, lvl)
        cx0 = jnp.right_shift(ax, lvl)
        cy0 = jnp.right_shift(ay, lvl)

        # dilated pyramid: the single (cy0, cx0) tap covers the whole
        # <= 2x2-cell box cover (see _dilated_pyramids_core)
        c = jnp.take(pyr_v, offl + cy0 * wl + cx0, axis=0)

        kill_v = fully_in & ((c & 1) == 0) & ok_view
        hit_v = fully_in & (c >= 2) & ok_view
        no_eff = fully_out | ~ok_view
        ok_v = hit_v | no_eff

        return (any_kill | kill_v, all_ok & ok_v, any_hit | hit_v), None

    init = (jnp.zeros(M, bool), jnp.ones(M, bool), jnp.zeros(M, bool))
    (any_kill, all_ok, any_hit), _ = jax.lax.scan(
        body, init, (cams, valid, pyr))

    status = jnp.where(
        any_kill, jnp.int8(KILLED),
        jnp.where(all_ok & any_hit, jnp.int8(ALIVE),
                  jnp.where(all_ok, jnp.int8(UNSEEN), jnp.int8(UNDECIDED))))
    return jnp.where(cell_valid, status, jnp.int8(KILLED))


def _exact_voxels(voxels, cams, valid, masks_packed, origin, voxel_size, H, W):
    """Exact reference-semantics test for a list of voxels (M, 3).
    masks_packed: (V, ceil(HW/8)) bit-packed masks (see pack_masks)."""
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
        hit = packed_lookup(mask_flat, lin)
        return (killed | (in_img & ~hit), seen | (in_img & hit)), None

    init = (jnp.zeros(len(pts), bool), jnp.zeros(len(pts), bool))
    (killed, seen), _ = jax.lax.scan(body, init, (cams, valid, masks_packed))
    return jnp.where(killed, jnp.int8(KILLED),
                     jnp.where(seen, jnp.int8(ALIVE), jnp.int8(UNSEEN)))


def _bucket(n: int) -> int:
    b = 4096
    while b < n:
        b <<= 1
    return b


@functools.partial(jax.jit,
                   static_argnames=("grid", "cell_vox", "H", "W", "n_levels"))
def _stage_top(cams, valid, pyr, level_off, level_w, origin,
               voxel_size, grid, cell_vox, H, W, n_levels):
    """Dense top level: classify every cell of the (padded) grid."""
    ii = jax.lax.broadcasted_iota(jnp.int32, grid, 0).reshape(-1)
    jj = jax.lax.broadcasted_iota(jnp.int32, grid, 1).reshape(-1)
    kk = jax.lax.broadcasted_iota(jnp.int32, grid, 2).reshape(-1)
    cells = jnp.stack([ii, jj, kk], axis=1)
    status = _classify_cells(cells, jnp.ones(len(cells), bool), cams, valid,
                             pyr, level_off, level_w, origin,
                             voxel_size, cell_vox, H, W, n_levels)
    return status.reshape(grid)


@functools.partial(jax.jit,
                   static_argnames=("cap", "cell_vox", "factor", "H", "W",
                                    "n_levels"))
def _stage_refine(status_prev, cams, valid, pyr, masks_flat,
                  level_off, level_w, origin, voxel_size, cap, cell_vox,
                  factor, H, W, n_levels):
    """Expand undecided cells of the previous level by `factor` per axis
    and classify the children at `cell_vox` cell size. Returns the dense
    next-level status volume."""
    gx, gy, gz = status_prev.shape
    undec = (status_prev == UNDECIDED)
    flat_idx = jnp.nonzero(undec.reshape(-1), size=cap, fill_value=0)[0]
    cell_valid = undec.reshape(-1)[flat_idx]
    pi = flat_idx // (gy * gz)
    pj = (flat_idx // gz) % gy
    pk = flat_idx % gz
    parents = jnp.stack([pi, pj, pk], axis=1)

    f3 = factor ** 3
    offs = np.stack(np.meshgrid(np.arange(factor), np.arange(factor),
                                np.arange(factor), indexing="ij"),
                    axis=-1).reshape(-1, 3).astype(np.int32)
    children = (parents[:, None, :] * factor + offs[None, :, :]
                ).reshape(cap * f3, 3)
    child_valid = jnp.repeat(cell_valid, f3)

    if cell_vox > 1:
        status_c = _classify_cells(children, child_valid, cams, valid, pyr,
                                   level_off, level_w, origin,
                                   voxel_size, cell_vox, H, W, n_levels)
    else:
        status_c = _exact_voxels(children, cams, valid, masks_flat, origin,
                                 voxel_size, H, W)

    # dense next level: inherit parent statuses, overwrite evaluated kids
    nxt = jnp.repeat(jnp.repeat(jnp.repeat(status_prev, factor, axis=0),
                                factor, axis=1), factor, axis=2)
    lin = (children[:, 0] * (gy * factor * gz * factor)
           + children[:, 1] * (gz * factor) + children[:, 2])
    nxt = nxt.reshape(-1)
    safe_lin = jnp.where(child_valid, lin, nxt.size)  # OOB -> dropped
    nxt = nxt.at[safe_lin].set(status_c, mode="drop")
    return nxt.reshape(gx * factor, gy * factor, gz * factor)


class HierarchicalCarver:
    """Reusable carver: holds device-resident pyramids/masks for one mask
    set and carves any grid bit-identically to ops.carving.carve."""

    def __init__(self, masks, cameras, valid, pyramid_levels: int = 8):
        masks = np.asarray(masks)
        self.V, self.H, self.W = masks.shape
        self.n_levels = pyramid_levels
        # one small upload: bit-packed masks feed both the pyramid build
        # and the exact fine pass
        self.masks_flat = jnp.asarray(pack_masks(masks))
        (self.pyr, self.level_off, self.level_w,
         _, _) = build_pyramids_dilated((self.V, self.H, self.W),
                                        pyramid_levels,
                                        packed=self.masks_flat)
        self.cams = jnp.asarray(cameras)
        self.valid = jnp.asarray(valid)

    def carve(self, origin, voxel_size, shape, start_level: int = 3):
        """Returns the int8 volume (-1 killed / 1 alive&seen / 0 unseen)."""
        nx, ny, nz = shape
        m = 1 << start_level
        grid = (-(-nx // m), -(-ny // m), -(-nz // m))
        origin_j = jnp.asarray(origin, jnp.float32)
        vs = jnp.float32(voxel_size)

        status = _stage_top(self.cams, self.valid, self.pyr,
                            self.level_off, self.level_w, origin_j, vs,
                            grid, m, self.H, self.W, self.n_levels)
        # refinement schedule: 8 -> 4 (x2), then 4 -> 1 (x4 straight to
        # voxels: testing 2-voxel cells costs as many gathers as testing
        # their children exactly)
        plan = [(2, m // 2)]
        if m // 2 > 1:
            plan.append((m // 2, 1))
        for factor, cell_vox in plan:
            n_undec = int(jnp.sum(status == UNDECIDED))
            if n_undec == 0:
                status = jnp.repeat(
                    jnp.repeat(jnp.repeat(status, factor, axis=0),
                               factor, axis=1), factor, axis=2)
                continue
            cap = _bucket(n_undec)
            status = _stage_refine(status, self.cams, self.valid, self.pyr,
                                   self.masks_flat, self.level_off,
                                   self.level_w, origin_j, vs, cap, cell_vox,
                                   factor, self.H, self.W, self.n_levels)

        vol = np.asarray(status[:nx, :ny, :nz])
        # any leftover UNDECIDED would be a logic error
        return vol


def carve_hierarchical(masks, cameras, valid, origin, voxel_size, shape,
                       start_level: int = 3, pyramid_levels: int = 8):
    """One-shot wrapper (drop-in replacement for ops.carving.carve)."""
    carver = HierarchicalCarver(masks, cameras, valid, pyramid_levels)
    return carver.carve(origin, voxel_size, shape, start_level)
