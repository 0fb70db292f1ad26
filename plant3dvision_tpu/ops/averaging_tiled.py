"""Tile-accelerated dense multi-view averaging for TWO-VALUED masks.

The ML pipeline's Voxels(type="averaging") accumulates a bilinearly
sampled mask value over all in-frustum views (ops.carving.average — the
reference's kernels/backprojection.c `average`, driven per view by
cl.py:190-233). The dense op pays 4 random gathers per (voxel, view);
random gathers are the v5e's scarcest resource (~84-124M lookups/s,
docs/CARVE_CEILING.md), so at production scale (300 views x 1.3M voxels
x 4 taps ~ 1.5G gathers) the dense scan runs tens of seconds.

For BINARY masks (the Segmentation2D default, reference
tasks/proc2d.py:359-393 binarizes its output; log mode only relabels the
two values to log(EPS)/log(1+EPS)) the same trick that made the carve
fine level fast applies: the 64 voxels of a 4x4x4 parent cell project
into a small shared pixel window, so ONE 32x32-px bit-tile row-gather
(ops.carving_hier._build_tile_tables) serves ALL FOUR bilinear taps of
all 64 voxels — the per-tap bits come from an in-register select tree
(`_pick32`), no further gathers. Gather count drops 256x (one row per
(parent, view) instead of 4 taps x 64 voxels).

Semantics: identical float expression to ops.carving.average on a mask
image holding {v0, v1} — each tap value is `where(bit, v1, v0)` and the
bilinear combination uses the same formula, so results match the dense
op to float-associativity ulps (same per-view accumulation order;
verified in tests/unit/test_averaging_tiled.py).

Windows wider than the 32x32 tile guarantee (span > 24 px incl. the +1
tap extent — cameras very close to the grid) are counted in the returned
`overflow`; a nonzero overflow means the volume is INVALID and the
caller must fall back to the dense op (ops.carving.Backprojection does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .carving_hier import _build_tile_tables, _pick32, pack_masks


@functools.partial(jax.jit, static_argnames=("shape", "H", "W"))
def _average_tiled(packed, cams, valid, origin, voxel_size, v0, v1,
                   shape, H, W, poff=0, nx_total=0):
    """`poff`/`nx_total`: grid-slab chunking support. `poff` shifts the
    parent x index by a GLOBAL parent offset (voxel x = 4*(pi + poff) + dx,
    exact in f32 since parent indices are small ints — bit-identical to
    the full-grid program); `nx_total` (0 = whole grid) gates the
    overflow count to parents whose voxels exist in the real grid, so
    slab x-padding can't raise a spurious dense-fallback."""
    nx, ny, nz = shape
    gx, gy, gz = -(-nx // 4), -(-ny // 4), -(-nz // 4)
    P = gx * gy * gz

    tiles, Ht, Wt = _build_tile_tables(packed, H, W)

    # voxel centers grouped by 4x4x4 parent: pts[p, c] with c in raster
    # (dx, dy, dz) order — de-grouped by the inverse transpose at the end
    pi = jax.lax.broadcasted_iota(jnp.int32, (gx, gy, gz), 0).reshape(-1)
    pj = jax.lax.broadcasted_iota(jnp.int32, (gx, gy, gz), 1).reshape(-1)
    pk = jax.lax.broadcasted_iota(jnp.int32, (gx, gy, gz), 2).reshape(-1)
    pi = pi + jnp.int32(poff)
    nxt = jnp.where(jnp.int32(nx_total) > 0, jnp.int32(nx_total),
                    jnp.int32(poff) * 4 + jnp.int32(nx))
    par_real = pi * 4 < nxt                                    # (P,)
    offs = np.stack(np.meshgrid(*([np.arange(4)] * 3), indexing="ij"),
                    axis=-1).reshape(-1, 3).astype(np.float32)
    par = jnp.stack([pi, pj, pk], 1).astype(jnp.float32)       # (P, 3)
    pts = (origin[None, None, :]
           + (par[:, None, :] * 4.0 + jnp.asarray(offs)[None, :, :])
           * voxel_size)                                       # (P, 64, 3)
    pts = pts.reshape(P * 64, 3)
    voffs = jnp.arange(cams.shape[0], dtype=jnp.int32) * (Ht * Wt)

    def body(carry, xs):
        acc, over_tot = carry
        cam, ok, voff = xs
        R = cam[4:13].reshape(3, 3)
        t = cam[13:16]
        p = pts @ R.T + t
        pz = p[:, 2]
        px = p[:, 0] / pz * cam[0] + cam[2]
        py = p[:, 1] / pz * cam[1] + cam[3]
        # same in-frustum semantics as ops.carving._project (truncating
        # int cast, inclusive borders, pz > 0)
        pxi = px.astype(jnp.int32)
        pyi = py.astype(jnp.int32)
        in_img = ((pz > 0) & (pxi >= 0) & (pxi <= W - 1)
                  & (pyi >= 0) & (pyi <= H - 1)) & ok
        # same tap coords/weights as ops.carving.average
        x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, H - 2)
        fxw = jnp.clip(px - x0.astype(jnp.float32), 0.0, 1.0)
        fyw = jnp.clip(py - y0.astype(jnp.float32), 0.0, 1.0)

        x0p = x0.reshape(P, 64)
        y0p = y0.reshape(P, 64)
        ax = x0p.min(axis=1)
        ay = y0p.min(axis=1)
        # 24-px window guarantee incl. the +1 tap: the 8-px tile anchor
        # can sit up to 7 px before the window min and dx/dy must stay
        # < 32 for the shifts — only parents with in-image voxels count
        over = (((x0p.max(axis=1) + 1 - ax > 24)
                 | (y0p.max(axis=1) + 1 - ay > 24))
                & in_img.reshape(P, 64).any(axis=1) & par_real)
        tx = jnp.right_shift(ax, 3)
        ty = jnp.right_shift(ay, 3)
        T = jnp.take(tiles, voff + ty * Wt + tx, axis=0)       # (P, 32)
        dy0 = jnp.clip(y0p - ty[:, None] * 8, 0, 31)
        dx0 = jnp.clip(x0p - tx[:, None] * 8, 0, 30)
        w0 = _pick32(T, dy0)
        w1 = _pick32(T, jnp.minimum(dy0 + 1, 31))
        # exact {v0, v1} tap values (a select, not arithmetic, so the
        # bilinear expression sees the same floats as the dense op)
        def tap(w, dx):
            b = ((w >> dx) & 1).reshape(-1) != 0
            return jnp.where(b, v1, v0)

        val = (tap(w0, dx0) * (1 - fxw) * (1 - fyw)
               + tap(w0, dx0 + 1) * fxw * (1 - fyw)
               + tap(w1, dx0) * (1 - fxw) * fyw
               + tap(w1, dx0 + 1) * fxw * fyw)
        acc = acc + jnp.where(in_img, val, 0.0)
        return (acc, over_tot + jnp.sum(over, dtype=jnp.int32)), None

    acc0 = jnp.zeros(P * 64, jnp.float32)
    (acc, over), _ = jax.lax.scan(body, (acc0, jnp.int32(0)),
                                  (cams, valid, voffs))
    # de-group (P, 4, 4, 4) -> padded dense grid -> crop
    vol = acc.reshape(gx, gy, gz, 4, 4, 4)
    vol = vol.transpose(0, 3, 1, 4, 2, 5).reshape(gx * 4, gy * 4, gz * 4)
    return vol[:nx, :ny, :nz], over


def average_tiled(masks, cameras, valid, origin, voxel_size, shape,
                  v0=0.0, v1=1.0, packed=None, hw=None):
    """Drop-in for ops.carving.average on a two-valued {v0, v1} mask set.

    `masks`: (V, H, W) binary (any dtype, nonzero = v1) — or pass
    `packed` (from pack_masks) with hw=(H, W). Returns (volume float32,
    overflow int) — a NONZERO overflow means cameras project 4-voxel
    cells wider than the 24-px tile window and the result is invalid;
    fall back to ops.carving.average.
    """
    if packed is None:
        masks = np.asarray(masks)
        V, H, W = masks.shape
        packed = pack_masks(masks != 0)
    else:
        H, W = hw
    vol, over = _average_tiled(
        jnp.asarray(packed), jnp.asarray(cameras), jnp.asarray(valid),
        jnp.asarray(origin, jnp.float32), jnp.float32(voxel_size),
        jnp.float32(v0), jnp.float32(v1), tuple(int(s) for s in shape),
        H, W)
    return vol, int(over)


def average_tiled_chunked(masks, cameras, valid, origin, voxel_size, shape,
                          v0=0.0, v1=1.0, max_slab_voxels=16 << 20):
    """Grid-slab variant of `average_tiled` for volumes too large to
    process as one program (VERDICT r3 #2: a 0.5 mm ML-route averaging
    volume killed the TPU worker — the per-view temporaries scale with
    the grid, ~15 voxel-sized f32 arrays live inside the scan body).

    Slabs the x axis into 4-voxel-aligned chunks of <= `max_slab_voxels`
    voxels, all served by ONE compiled program (equal static slab shape;
    the last slab is x-padded and cropped on host). Each voxel's value
    is bit-identical to the unchunked program: the slab computes
    x = 4*(pi + poff) + dx exactly, per-view accumulation order is
    unchanged, and only whole x-rows are partitioned. Returns
    (volume float32, total overflow) like `average_tiled`.
    """
    masks = np.asarray(masks)
    V, H, W = masks.shape
    packed = jnp.asarray(pack_masks(masks != 0))
    nx, ny, nz = (int(s) for s in shape)
    per_x = ny * nz
    sx = max(4, (max(int(max_slab_voxels), per_x) // per_x) // 4 * 4)
    sx = min(sx, -(-nx // 4) * 4)
    n_slabs = -(-nx // sx)

    cams_j = jnp.asarray(cameras)
    valid_j = jnp.asarray(valid)
    origin_j = jnp.asarray(origin, jnp.float32)
    vs_j = jnp.float32(voxel_size)
    out = np.empty((nx, ny, nz), np.float32)
    over_tot = 0
    for i in range(n_slabs):
        xs = i * sx
        vol, over = _average_tiled(
            packed, cams_j, valid_j, origin_j, vs_j,
            jnp.float32(v0), jnp.float32(v1), (sx, ny, nz), H, W,
            poff=xs // 4, nx_total=nx)
        take = min(sx, nx - xs)
        out[xs:xs + take] = np.asarray(vol)[:take]
        over_tot += int(over)
    return out, over_tot
