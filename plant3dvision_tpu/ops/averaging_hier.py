"""Hierarchical multi-view averaging for BINARY masks.

The ML pipeline's Voxels(type="averaging") sums a bilinearly-sampled mask
value over all in-frustum views (ops.carving.average) — V x n_voxels x 4
gathers, the dominant cost at production scale. With binarized masks
(the Segmentation2D default, reference tasks/proc2d.py:359-393) the sum
decomposes exactly:

- a view whose (tap-extended) cell footprint lies fully inside the mask
  contributes exactly v1 per voxel (all four bilinear taps are 1);
- fully outside the mask: exactly v0 (log mode: log(EPS); else 0);
- fully out of frustum: nothing;
- only views straddling the mask boundary need per-voxel bilinear taps.

So the hierarchy tracks two COUNTERS per cell (full-one views, full-zero
views) plus the straddle set, and evaluates exact bilinear samples only for
(voxel, straddling-view) pairs. log-mode is handled by an affine map:
bilinear(log-mask) = v0 + (v1 - v0) * bilinear(binary mask), because the
log transform is applied to a two-valued image and interpolation is linear.

Matches ops.carving.average within float tolerance (summation order
differs); verified in tests/unit/test_averaging_hier.py. On TPU the two
implementations' f32 projections can diverge by ulps, which flips an
occasional bilinear tap across the mask boundary: isolated voxels may
differ by up to |log(EPS)| * w per straddling view (bounded, boundary-only;
immaterial after the exp/argmax downstream).

WHEN IT WINS: the savings come from cells fully inside/outside every mask.
For THIN structures at fine voxel sizes (the typical 1 mm plant scan) most
plant-adjacent cells straddle most views and the pair list approaches the
dense work — dense averaging is then faster. Backprojection therefore
defaults to the dense op; use this for thick/filled objects or coarse
grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .carving import EPS
from .carving_hier import (_CUBE_OFFS_F, _EPS_Z, _pyramid_shapes, _bucket,
                           build_pyramids_dilated, pack_masks)
from .carving_pv import _CHUNK

# classification outcome per (cell, view): encoded in counters + bits


def _classify_avg(cells_f, cams, valid, pyr, level_off, level_w,
                  origin, s_world, H, W, n_levels):
    """(ones, zeros, partial) over (V, M): footprint-extended conservative
    classification for averaging (tap box extends +1 pixel).  `pyr` is the
    combined dilated pyramid (ops.carving_hier._dilated_pyramids_core):
    one tap serves both the all-ones and all-zeros tests."""
    corners = (origin[None, None, :]
               + (cells_f[:, None, :] + _CUBE_OFFS_F[None, :, :]) * s_world)

    def one_view(cam, pyr_v):
        R = cam[4:13].reshape(3, 3)
        t = cam[13:16]
        p = jnp.einsum("mkj,ij->mki", corners, R) + t
        pz = p[..., 2]
        behind = jnp.any(pz <= _EPS_Z, axis=1)
        pzs = jnp.maximum(pz, _EPS_Z)
        px = p[..., 0] / pzs * cam[0] + cam[2]
        py = p[..., 1] / pzs * cam[1] + cam[3]
        pxmin = jnp.min(px, axis=1); pxmax = jnp.max(px, axis=1)
        pymin = jnp.min(py, axis=1); pymax = jnp.max(py, axis=1)
        # the reference in-frustum test is the truncating int cast of the
        # CENTER sample; voxels of a cell may mix in/out near borders ->
        # treat border-straddling cells as partial
        out = ((pxmax <= -1.0) | (pxmin >= W) | (pymax <= -1.0)
               | (pymin >= H)) & ~behind
        fin = ((pxmin >= 0.0) & (pxmax < W) & (pymin >= 0.0)
               & (pymax < H) & ~behind)
        # bilinear taps cover [floor(p), floor(p)+1]: extend the box by +1
        # plus an epsilon margin (the dense op computes projections with a
        # different f32 expression; certainty must survive ulp divergence)
        eps_px = 1e-3
        ax = jnp.clip(jnp.floor(pxmin - eps_px), 0.0, W - 1.0).astype(jnp.int32)
        bx = jnp.clip(jnp.floor(pxmax + eps_px) + 1, 0.0, W - 1.0).astype(jnp.int32)
        ay = jnp.clip(jnp.floor(pymin - eps_px), 0.0, H - 1.0).astype(jnp.int32)
        by = jnp.clip(jnp.floor(pymax + eps_px) + 1, 0.0, H - 1.0).astype(jnp.int32)
        span = jnp.maximum(bx - ax, by - ay) + 1
        lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(
            span.astype(jnp.float32), 1.0))), 0, n_levels).astype(jnp.int32)
        wl = jnp.take(level_w, lvl)
        offl = jnp.take(level_off, lvl)
        cx0 = jnp.right_shift(ax, lvl)
        cy0 = jnp.right_shift(ay, lvl)

        c = jnp.take(pyr_v, offl + cy0 * wl + cx0, axis=0)
        ones = fin & (c >= 2)
        zeros = fin & ((c & 1) == 0)
        partial = ~ones & ~zeros & ~out
        return ones, zeros, partial

    ones, zeros, partial = jax.vmap(one_view)(cams, pyr)
    ok = valid[:, None]
    return ones & ok, zeros & ok, partial & ok


@functools.partial(jax.jit, static_argnames=("grid", "cell_vox", "H", "W",
                                             "n_levels", "n_words"))
def _avg_top(cams, valid, pyr, level_off, level_w, origin,
             voxel_size, grid, cell_vox, H, W, n_levels, n_words):
    ii = jax.lax.broadcasted_iota(jnp.int32, grid, 0).reshape(-1)
    jj = jax.lax.broadcasted_iota(jnp.int32, grid, 1).reshape(-1)
    kk = jax.lax.broadcasted_iota(jnp.int32, grid, 2).reshape(-1)
    cells_f = jnp.stack([ii, jj, kk], axis=1).astype(jnp.float32)
    M = cells_f.shape[0]
    V = cams.shape[0]
    ones, zeros, partial = _classify_avg(
        cells_f, cams, valid, pyr, level_off, level_w, origin,
        voxel_size * cell_vox, H, W, n_levels)
    n1 = jnp.sum(ones, axis=0).astype(jnp.int32)
    n0 = jnp.sum(zeros, axis=0).astype(jnp.int32)
    pad = n_words * 32 - V
    part_p = jnp.pad(partial, ((0, pad), (0, 0)))
    part_p = part_p.reshape(n_words, 32, M).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    bits = jnp.sum(part_p * weights[None, :, None], axis=1, dtype=jnp.uint32)
    return n1, n0, bits


@functools.partial(jax.jit, static_argnames=("grid_prev", "cap", "capt",
                                             "factor", "cell_vox", "H", "W",
                                             "n_levels", "n_words", "V"))
def _avg_refine(n1_prev, n0_prev, bits_prev, grid_prev, cams, valid, pyr,
                masks_packed, level_off, level_w, origin, voxel_size,
                cap, capt, factor, cell_vox, H, W, n_levels, n_words, V):
    """One averaging refinement level over (parent, view) straddle pairs.

    grid_prev: static-shape dense marker (int8 zeros of the previous grid)
    used only for its shape. Returns (n1, n0, bits, exact) at factor x
    resolution; `exact` is the accumulated float contribution (fine level
    only, else zeros).
    """
    gx, gy, gz = grid_prev
    P_dense = gx * gy * gz
    has_partial = jnp.zeros(P_dense, bool)
    for w in range(n_words):
        has_partial = has_partial | (bits_prev[w] != 0)
    pidx = jnp.nonzero(has_partial, size=cap, fill_value=P_dense)[0]
    pvalid = pidx < P_dense
    pidx_safe = jnp.minimum(pidx, P_dense - 1)
    parents = jnp.stack([pidx_safe // (gy * gz), (pidx_safe // gz) % gy,
                         pidx_safe % gz], axis=1).astype(jnp.float32)

    pbits = bits_prev[:, pidx_safe]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    expanded = ((pbits.T[:, :, None] >> shifts[None, None, :]) & 1).astype(bool)
    U = expanded.reshape(cap, n_words * 32)[:, :V]
    U = U & pvalid[:, None] & valid[None, :]
    pair_idx = jnp.nonzero(U.reshape(-1), size=capt, fill_value=cap * V)[0]
    pair_ok = pair_idx < cap * V
    pair_idx_safe = jnp.minimum(pair_idx, cap * V - 1)
    pair_p = pair_idx_safe // V
    pair_v = pair_idx_safe % V

    f3 = factor ** 3
    offs = np.stack(np.meshgrid(*([np.arange(factor)] * 3), indexing="ij"),
                    axis=-1).reshape(-1, 3).astype(np.float32)
    offs_j = jnp.asarray(offs)
    N = cap * f3
    s_world = voxel_size * cell_vox
    TOT = pyr.shape[1]
    B = masks_packed.shape[1]
    pyr_flat = pyr.reshape(-1)
    masks_flat = masks_packed.reshape(-1)
    n_chunks = capt // _CHUNK

    def chunk_body(carry, xs):
        d1, d0, dk, bits_acc, exact = carry
        cp, cv, cok = xs
        cam = cams[cv]
        par = parents[cp]
        children = par[:, None, :] * factor + offs_j[None, :, :]
        R = cam[:, 4:13].reshape(-1, 3, 3)
        t = cam[:, 13:16]
        fx, fy, cx, cy = cam[:, 0], cam[:, 1], cam[:, 2], cam[:, 3]

        if cell_vox > 1:
            pts = (origin[None, None, None, :]
                   + (children[:, :, None, :] + _CUBE_OFFS_F[None, None, :, :])
                   * s_world).reshape(_CHUNK, f3 * 8, 3)
            p = jnp.einsum("cij,ckj->cki", R, pts) + t[:, None, :]
            p = p.reshape(_CHUNK, f3, 8, 3)
            pz = p[..., 2]
            behind = jnp.any(pz <= _EPS_Z, axis=-1)
            pzs = jnp.maximum(pz, _EPS_Z)
            px = p[..., 0] / pzs * fx[:, None, None] + cx[:, None, None]
            py = p[..., 1] / pzs * fy[:, None, None] + cy[:, None, None]
            pxmin = jnp.min(px, axis=-1); pxmax = jnp.max(px, axis=-1)
            pymin = jnp.min(py, axis=-1); pymax = jnp.max(py, axis=-1)
            out = ((pxmax <= -1.0) | (pxmin >= W) | (pymax <= -1.0)
                   | (pymin >= H)) & ~behind
            fin = ((pxmin >= 0.0) & (pxmax < W) & (pymin >= 0.0)
                   & (pymax < H) & ~behind)
            ax = jnp.clip(jnp.floor(pxmin), 0.0, W - 1.0).astype(jnp.int32)
            bx = jnp.clip(jnp.floor(pxmax) + 1, 0.0, W - 1.0).astype(jnp.int32)
            ay = jnp.clip(jnp.floor(pymin), 0.0, H - 1.0).astype(jnp.int32)
            by = jnp.clip(jnp.floor(pymax) + 1, 0.0, H - 1.0).astype(jnp.int32)
            span = jnp.maximum(bx - ax, by - ay) + 1
            lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(
                span.astype(jnp.float32), 1.0))), 0, n_levels).astype(jnp.int32)
            wl = jnp.take(level_w, lvl)
            offl = jnp.take(level_off, lvl)
            cx0 = jnp.right_shift(ax, lvl)
            cy0 = jnp.right_shift(ay, lvl)
            voff = (cv * TOT)[:, None]
            # dilated combined pyramid: ONE tap serves both tests
            i00 = offl + cy0 * wl + cx0
            c = jnp.take(pyr_flat, (i00 + voff).reshape(-1),
                         axis=0).reshape(_CHUNK, f3)
            ones = fin & (c >= 2)
            zeros = fin & ((c & 1) == 0)
            partialc = ~ones & ~zeros & ~out
            contrib = jnp.zeros_like(pxmin)
            straddle_k = jnp.zeros_like(ones)
        else:
            pts = origin[None, None, :] + children * voxel_size
            p = jnp.einsum("cij,ckj->cki", R, pts) + t[:, None, :]
            pz = p[..., 2]
            pxf = p[..., 0] / pz * fx[:, None] + cx[:, None]
            pyf = p[..., 1] / pz * fy[:, None] + cy[:, None]
            pxi = pxf.astype(jnp.int32)
            pyi = pyf.astype(jnp.int32)
            in_img = ((pz > 0) & (pxi >= 0) & (pxi <= W - 1)
                      & (pyi >= 0) & (pyi <= H - 1))
            # true bilinear from the packed binary mask (4 taps)
            x0 = jnp.clip(jnp.floor(pxf).astype(jnp.int32), 0, W - 2)
            y0 = jnp.clip(jnp.floor(pyf).astype(jnp.int32), 0, H - 2)
            fxw = jnp.clip(pxf - x0.astype(jnp.float32), 0.0, 1.0)
            fyw = jnp.clip(pyf - y0.astype(jnp.float32), 0.0, 1.0)
            voffb = (cv * B)[:, None]

            def tap(yy, xx):
                lin = yy * W + xx
                byte = jnp.take(masks_flat,
                                (jnp.right_shift(lin, 3) + voffb).reshape(-1),
                                axis=0).reshape(_CHUNK, f3)
                bit = (7 - (lin & 7)).astype(jnp.uint8)
                return (((byte >> bit) & 1) != 0).astype(jnp.float32)

            bil = (tap(y0, x0) * (1 - fxw) * (1 - fyw)
                   + tap(y0, x0 + 1) * fxw * (1 - fyw)
                   + tap(y0 + 1, x0) * (1 - fxw) * fyw
                   + tap(y0 + 1, x0 + 1) * fxw * fyw)
            contrib = jnp.where(in_img, bil, 0.0)
            straddle_k = in_img  # in-frustum straddling view count
            ones = jnp.zeros_like(in_img)
            zeros = jnp.zeros_like(in_img)
            partialc = jnp.zeros_like(in_img)

        okc = cok[:, None]
        child_gidx = (cp[:, None] * f3
                      + jnp.arange(f3, dtype=jnp.int32)[None, :])
        tgt = jnp.where(okc, child_gidx, N).reshape(-1)
        d1 = d1.at[tgt].add((ones & okc).reshape(-1).astype(jnp.int32),
                            mode="drop")
        d0 = d0.at[tgt].add((zeros & okc).reshape(-1).astype(jnp.int32),
                            mode="drop")
        dk = dk.at[tgt].add((straddle_k & okc).reshape(-1).astype(jnp.int32),
                            mode="drop")
        exact = exact.at[tgt].add(jnp.where(okc, contrib, 0.0).reshape(-1),
                                  mode="drop")
        if cell_vox > 1:
            word = jnp.right_shift(cv, 5)
            bitv = jnp.uint32(1) << (cv & 31).astype(jnp.uint32)
            vals = jnp.where(partialc & okc, bitv[:, None],
                             jnp.uint32(0)).reshape(-1)
            wr = jnp.repeat(word, f3)
            bits_acc = bits_acc.at[wr, tgt].add(vals, mode="drop")
        return (d1, d0, dk, bits_acc, exact), None

    bits_acc0 = (jnp.zeros((n_words, N + 1), jnp.uint32) if cell_vox > 1
                 else jnp.zeros((n_words, 1), jnp.uint32))
    init = (jnp.zeros(N + 1, jnp.int32), jnp.zeros(N + 1, jnp.int32),
            jnp.zeros(N + 1, jnp.int32), bits_acc0,
            jnp.zeros(N + 1, jnp.float32))
    xs = (pair_p.reshape(n_chunks, _CHUNK), pair_v.reshape(n_chunks, _CHUNK),
          pair_ok.reshape(n_chunks, _CHUNK))
    (d1, d0, dk, bits_acc, exact), _ = jax.lax.scan(chunk_body, init, xs)

    # assemble dense next level: inherit parent counters, add child deltas
    n1_dense = jnp.repeat(jnp.repeat(jnp.repeat(
        n1_prev.reshape(gx, gy, gz), factor, axis=0), factor, axis=1),
        factor, axis=2).reshape(-1)
    n0_dense = jnp.repeat(jnp.repeat(jnp.repeat(
        n0_prev.reshape(gx, gy, gz), factor, axis=0), factor, axis=1),
        factor, axis=2).reshape(-1)
    exact_dense = jnp.zeros(n1_dense.size, jnp.float32)
    bits_dense = (jnp.zeros((n_words, n1_dense.size), jnp.uint32)
                  if cell_vox > 1 else jnp.zeros((n_words, 1), jnp.uint32))

    child_valid = jnp.repeat(pvalid, f3)
    children_int = (jnp.repeat(jnp.stack(
        [pidx_safe // (gy * gz), (pidx_safe // gz) % gy, pidx_safe % gz],
        axis=1), f3, axis=0) * factor
        + jnp.tile(jnp.asarray(offs.astype(np.int32)), (cap, 1)))
    lin = (children_int[:, 0] * (gy * factor * gz * factor)
           + children_int[:, 1] * (gz * factor) + children_int[:, 2])
    safe_lin = jnp.where(child_valid, lin, n1_dense.size)
    k_dense = jnp.zeros(n1_dense.size, jnp.int32)
    n1_dense = n1_dense.at[safe_lin].add(d1[:N], mode="drop")
    n0_dense = n0_dense.at[safe_lin].add(d0[:N], mode="drop")
    k_dense = k_dense.at[safe_lin].add(dk[:N], mode="drop")
    exact_dense = exact_dense.at[safe_lin].add(exact[:N], mode="drop")
    if cell_vox > 1:
        bits_dense = bits_dense.at[:, safe_lin].max(bits_acc[:, :N],
                                                    mode="drop")
    return n1_dense, n0_dense, bits_dense, exact_dense, k_dense


class HierarchicalAverager:
    """Averaging counterpart of PerViewCarver for binarized masks."""

    def __init__(self, masks, cameras, valid, pyramid_levels: int = 8):
        masks = np.asarray(masks)
        self.binary_ok = bool(np.isin(np.unique(masks), (0, 1, 255)).all())
        self.V, self.H, self.W = masks.shape
        self.n_levels = pyramid_levels
        self.n_words = -(-self.V // 32)
        self.masks_flat = jnp.asarray(pack_masks(masks))
        (self.pyr, self.level_off, self.level_w,
         _, _) = build_pyramids_dilated((self.V, self.H, self.W),
                                        pyramid_levels,
                                        packed=self.masks_flat)
        self.cams = jnp.asarray(cameras)
        self.valid = jnp.asarray(valid)

    def average(self, origin, voxel_size, shape, log=False,
                start_level: int = 3):
        """float32 volume = sum over in-frustum views of (log-)bilinear
        samples, identical semantics to ops.carving.average on the
        binarized masks."""
        nx, ny, nz = shape
        m = 1 << start_level
        grid = (-(-nx // m), -(-ny // m), -(-nz // m))
        origin_j = jnp.asarray(origin, jnp.float32)
        vs = jnp.float32(voxel_size)

        n1, n0, bits = _avg_top(self.cams, self.valid, self.pyr,
                                self.level_off, self.level_w, origin_j, vs,
                                grid, m, self.H, self.W, self.n_levels,
                                self.n_words)
        gx, gy, gz = grid
        exact_total = None
        k_total = None
        plan = [(2, m // 2)]
        if m // 2 > 1:
            plan.append((m // 2, 1))
        for factor, cell_vox in plan:
            has_partial = np.asarray(
                jnp.any(jnp.stack([bits[w] != 0
                                   for w in range(self.n_words)]), axis=0))
            n_ref = int(has_partial.sum())
            if n_ref == 0:
                f3 = factor ** 3
                rep = lambda a: jnp.repeat(jnp.repeat(jnp.repeat(
                    a.reshape(gx, gy, gz), factor, axis=0), factor, axis=1),
                    factor, axis=2).reshape(-1)
                n1, n0 = rep(n1), rep(n0)
                if exact_total is not None:
                    exact_total = rep(exact_total)
                gx, gy, gz = gx * factor, gy * factor, gz * factor
                bits = jnp.zeros_like(bits[:, :1])
                continue
            cap = _bucket(n_ref)
            from .carving_pv import _pair_count
            n_pairs = int(_pair_count(bits, jnp.asarray(has_partial)))
            capt = _CHUNK
            while capt < n_pairs:
                capt += _CHUNK
            n1, n0, bits, exact, k_add = _avg_refine(
                n1, n0, bits, (gx, gy, gz), self.cams, self.valid, self.pyr,
                self.masks_flat, self.level_off, self.level_w,
                origin_j, vs, cap, capt, factor, cell_vox, self.H, self.W,
                self.n_levels, self.n_words, self.V)
            rep3 = lambda a: jnp.repeat(jnp.repeat(jnp.repeat(
                a.reshape(gx, gy, gz), factor, axis=0),
                factor, axis=1), factor, axis=2).reshape(-1)
            if exact_total is None:
                exact_total, k_total = exact, k_add
            else:
                exact_total = rep3(exact_total) + exact
                k_total = rep3(k_total) + k_add
            gx, gy, gz = gx * factor, gy * factor, gz * factor

        v1 = float(np.log(EPS + 1.0)) if log else 1.0
        v0 = float(np.log(EPS)) if log else 0.0
        total = (n1.astype(jnp.float32) * v1 + n0.astype(jnp.float32) * v0)
        if exact_total is not None:
            # each in-frustum straddling view contributes
            # bilinear(log-mask) = v0 + (v1-v0)*bilinear(binary); the fine
            # pass accumulated S = sum(bilinear) and k = straddle count, so
            # the exact part is k*v0 + (v1-v0)*S
            total = (total + k_total.astype(jnp.float32) * v0
                     + (v1 - v0) * exact_total)
        vol = np.asarray(total).reshape(gx, gy, gz)[:nx, :ny, :nz]
        return vol


def average_hierarchical(masks, cameras, valid, origin, voxel_size, shape,
                         log=False):
    """Drop-in for ops.carving.average on BINARY masks (values {0,1} or
    {0,255}); raises ValueError otherwise so callers can fall back."""
    avg = HierarchicalAverager(masks, cameras, valid)
    if not avg.binary_ok:
        raise ValueError("average_hierarchical requires binary masks")
    return avg.average(origin, voxel_size, shape, log=log)
