"""Per-view-compacted hierarchical space carving (incidence-pair engine).

Refinement of ops.carving_hier: a cell inherits most view decisions from
its parent —

- a view that fully-hit the parent also fully-hits every child (the child's
  projected footprint is contained in the parent's);
- a view fully outside for the parent is fully outside for every child;
- a killing view is impossible below a surviving parent.

Only the parent's *straddling* (undecided) views — typically 2-6 of
hundreds for a turntable scan — need evaluation per child. The refinement
work is therefore the flat list of (parent, view) STRADDLE PAIRS: instead
of scanning views (hundreds of small dispatches), the engine compacts the
pair list on device and evaluates it in a handful of dense chunks. Gather
count drops from O(cells x views) to O(straddle incidences) while staying
bit-identical to the dense carve (tests/unit/test_carving_hier.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .carving_hier import (ALIVE, KILLED, UNDECIDED, UNSEEN, _CUBE_OFFS_F,
                           _EPS_Z, build_pyramids_dilated, _bucket,
                           pack_masks)

_CHUNK = 8192  # pairs per evaluation chunk


def _box_cover(pxmin, pxmax, pymin, pymax, H, W, n_levels, level_off,
               level_w):
    """2x2 pyramid cover indices for projected pixel boxes."""
    ax = jnp.clip(jnp.floor(pxmin), 0.0, W - 1.0).astype(jnp.int32)
    bx = jnp.clip(jnp.floor(pxmax), 0.0, W - 1.0).astype(jnp.int32)
    ay = jnp.clip(jnp.floor(pymin), 0.0, H - 1.0).astype(jnp.int32)
    by = jnp.clip(jnp.floor(pymax), 0.0, H - 1.0).astype(jnp.int32)
    span = jnp.maximum(bx - ax, by - ay) + 1
    lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(
        span.astype(jnp.float32), 1.0))), 0, n_levels).astype(jnp.int32)
    wl = jnp.take(level_w, lvl)
    offl = jnp.take(level_off, lvl)
    cx0 = jnp.right_shift(ax, lvl); cx1 = jnp.right_shift(bx, lvl)
    cy0 = jnp.right_shift(ay, lvl); cy1 = jnp.right_shift(by, lvl)
    return (offl + cy0 * wl + cx0, offl + cy0 * wl + cx1,
            offl + cy1 * wl + cx0, offl + cy1 * wl + cx1)


@functools.partial(jax.jit, static_argnames=("grid", "cell_vox", "H", "W",
                                             "n_levels", "n_words"))
def _top_dense(cams, valid, pyr, level_off, level_w, origin,
               voxel_size, grid, cell_vox, H, W, n_levels, n_words):
    """Dense top level, vectorized over ALL views at once (no scan).
    Returns (status (grid,), undec_bits (n_words, M), any_hit (M,))."""
    ii = jax.lax.broadcasted_iota(jnp.int32, grid, 0).reshape(-1)
    jj = jax.lax.broadcasted_iota(jnp.int32, grid, 1).reshape(-1)
    kk = jax.lax.broadcasted_iota(jnp.int32, grid, 2).reshape(-1)
    cells_f = jnp.stack([ii, jj, kk], axis=1).astype(jnp.float32)
    M = cells_f.shape[0]
    V = cams.shape[0]
    s_world = voxel_size * cell_vox
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
        out = ((pxmax <= -1.0) | (pxmin >= W) | (pymax <= -1.0)
               | (pymin >= H)) & ~behind
        fin = ((pxmin >= 0.0) & (pxmax < W) & (pymin >= 0.0)
               & (pymax < H) & ~behind)
        # dilated combined pyramid: ONE tap serves both box tests
        # (ops.carving_hier._dilated_pyramids_core)
        i00, _, _, _ = _box_cover(pxmin, pxmax, pymin, pymax, H, W,
                                  n_levels, level_off, level_w)
        c = jnp.take(pyr_v, i00)
        return fin & ((c & 1) == 0), fin & (c >= 2), out

    # lax.map: per-view temporaries stay O(M); a vmap over hundreds of
    # views materializes (V, M, 8, 3) floats (OOM at 300-view scans)
    kill, hit, out = jax.lax.map(
        lambda xs: one_view(*xs), (cams, pyr))              # (V, M) each
    kill = kill & valid[:, None]
    hit = hit & valid[:, None]
    no_eff = out | ~valid[:, None]
    undec = ~kill & ~hit & ~no_eff                           # (V, M)

    any_kill = jnp.any(kill, axis=0)
    any_hit = jnp.any(hit, axis=0)
    any_undec = jnp.any(undec, axis=0)

    # pack the (V, M) straddle matrix into (n_words, M) uint32
    pad = n_words * 32 - V
    undec_p = jnp.pad(undec, ((0, pad), (0, 0)))
    undec_p = undec_p.reshape(n_words, 32, M).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    bits = jnp.sum(undec_p * weights[None, :, None], axis=1,
                   dtype=jnp.uint32)

    status = jnp.where(
        any_kill, jnp.int8(KILLED),
        jnp.where(any_undec, jnp.int8(UNDECIDED),
                  jnp.where(any_hit, jnp.int8(ALIVE), jnp.int8(UNSEEN))))
    return status.reshape(grid), bits, any_hit


@functools.partial(jax.jit, static_argnames=("cap", "capt", "factor",
                                             "cell_vox", "H", "W",
                                             "n_levels", "n_words", "V",
                                             "chunk"))
def _refine_pairs(status_prev, bits_prev, hit_prev, cams, valid, pyr,
                  masks_packed, level_off, level_w, origin, voxel_size,
                  cap, capt, factor, cell_vox, H, W, n_levels, n_words, V,
                  chunk=_CHUNK):
    """One refinement level over the flat (parent, view) straddle-pair list.

    status_prev: dense (gx,gy,gz) int8; bits_prev: (n_words, prod(grid));
    hit_prev: (prod(grid),). Returns (status_next, bits_next, hit_next) at
    factor x resolution (bits/hit dummies at the final level).
    """
    gx, gy, gz = status_prev.shape
    P_dense = gx * gy * gz
    flat_prev = status_prev.reshape(-1)
    undec = flat_prev == UNDECIDED
    pidx = jnp.nonzero(undec, size=cap, fill_value=P_dense)[0]
    pvalid = pidx < P_dense
    pidx_safe = jnp.minimum(pidx, P_dense - 1)
    parents = jnp.stack([pidx_safe // (gy * gz),
                         (pidx_safe // gz) % gy,
                         pidx_safe % gz], axis=1).astype(jnp.float32)

    # (cap, V) straddle matrix from the packed parent bits
    pbits = bits_prev[:, pidx_safe]                     # (n_words, cap)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    expanded = ((pbits.T[:, :, None] >> shifts[None, None, :]) & 1).astype(bool)
    U = expanded.reshape(cap, n_words * 32)[:, :V]      # (cap, V)
    U = U & pvalid[:, None] & valid[None, :]

    # flat pair list
    pair_idx = jnp.nonzero(U.reshape(-1), size=capt, fill_value=cap * V)[0]
    pair_ok = pair_idx < cap * V
    pair_idx_safe = jnp.minimum(pair_idx, cap * V - 1)
    pair_p = pair_idx_safe // V
    pair_v = pair_idx_safe % V

    f3 = factor ** 3
    offs = np.stack(np.meshgrid(np.arange(factor), np.arange(factor),
                                np.arange(factor), indexing="ij"),
                    axis=-1).reshape(-1, 3).astype(np.float32)
    offs_j = jnp.asarray(offs)

    N = cap * f3
    s_world = voxel_size * cell_vox
    TOT = pyr.shape[1]
    B = masks_packed.shape[1]
    pyr_flat = pyr.reshape(-1)
    masks_flat = masks_packed.reshape(-1)

    n_chunks = capt // chunk

    def chunk_body(carry, xs):
        any_kill, any_hit, any_undec, bits_acc = carry
        cp, cv, cok = xs                                # (chunk,) each
        cam = cams[cv]                                  # (_CHUNK, 16)
        par = parents[cp]                               # (_CHUNK, 3)
        children = par[:, None, :] * factor + offs_j[None, :, :]  # (C, f3, 3)

        R = cam[:, 4:13].reshape(-1, 3, 3)
        t = cam[:, 13:16]
        fx, fy, cx, cy = cam[:, 0], cam[:, 1], cam[:, 2], cam[:, 3]

        if cell_vox > 1:
            pts = (origin[None, None, None, :]
                   + (children[:, :, None, :] + _CUBE_OFFS_F[None, None, :, :])
                   * s_world)                            # (C, f3, 8, 3)
            pts = pts.reshape(chunk, f3 * 8, 3)
            p = jnp.einsum("cij,ckj->cki", R, pts) + t[:, None, :]
            p = p.reshape(chunk, f3, 8, 3)
            pz = p[..., 2]
            behind = jnp.any(pz <= _EPS_Z, axis=-1)      # (C, f3)
            pzs = jnp.maximum(pz, _EPS_Z)
            px = p[..., 0] / pzs * fx[:, None, None] + cx[:, None, None]
            py = p[..., 1] / pzs * fy[:, None, None] + cy[:, None, None]
            pxmin = jnp.min(px, axis=-1); pxmax = jnp.max(px, axis=-1)
            pymin = jnp.min(py, axis=-1); pymax = jnp.max(py, axis=-1)
            out = ((pxmax <= -1.0) | (pxmin >= W) | (pymax <= -1.0)
                   | (pymin >= H)) & ~behind
            fin = ((pxmin >= 0.0) & (pxmax < W) & (pymin >= 0.0)
                   & (pymax < H) & ~behind)
            i00, _, _, _ = _box_cover(pxmin, pxmax, pymin, pymax, H, W,
                                      n_levels, level_off, level_w)
            voff = (cv * TOT)[:, None]
            # dilated combined pyramid: ONE tap serves both box tests
            c = jnp.take(pyr_flat, (i00 + voff).reshape(-1),
                         axis=0).reshape(chunk, f3)
            kill = fin & ((c & 1) == 0)
            hit = fin & (c >= 2)
            undec_c = ~kill & ~hit & ~out
        else:
            pts = origin[None, None, :] + children * voxel_size  # (C, f3, 3)
            p = jnp.einsum("cij,ckj->cki", R, pts) + t[:, None, :]
            pz = p[..., 2]
            px = (p[..., 0] / pz * fx[:, None] + cx[:, None]).astype(jnp.int32)
            py = (p[..., 1] / pz * fy[:, None] + cy[:, None]).astype(jnp.int32)
            in_img = ((pz > 0) & (px >= 0) & (px <= W - 1)
                      & (py >= 0) & (py <= H - 1))
            lin = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
            # packed lookup with per-pair view offset (byte units)
            byte_idx = (jnp.right_shift(lin, 3) + (cv * B)[:, None]).reshape(-1)
            byte = jnp.take(masks_flat, byte_idx, axis=0).reshape(chunk, f3)
            bit = (7 - (lin & 7)).astype(jnp.uint8)
            m = ((byte >> bit) & 1) != 0
            kill = in_img & ~m
            hit = in_img & m
            undec_c = jnp.zeros_like(kill)

        okc = cok[:, None]
        kill = kill & okc
        hit = hit & okc
        undec_c = undec_c & okc

        child_gidx = (cp[:, None] * f3
                      + jnp.arange(f3, dtype=jnp.int32)[None, :])
        tgt = jnp.where(okc, child_gidx, N).reshape(-1)
        any_kill = any_kill.at[tgt].max(kill.reshape(-1), mode="drop")
        any_hit = any_hit.at[tgt].max(hit.reshape(-1), mode="drop")
        any_undec = any_undec.at[tgt].max(undec_c.reshape(-1), mode="drop")
        if cell_vox > 1:
            word = jnp.right_shift(cv, 5)
            bitv = (jnp.uint32(1)
                    << (cv & 31).astype(jnp.uint32))     # (_CHUNK,)
            vals = jnp.where(undec_c, bitv[:, None], jnp.uint32(0)).reshape(-1)
            wr = jnp.repeat(word, f3)
            # disjoint powers of two per (child, word): add == bitwise or
            bits_acc = bits_acc.at[wr, tgt].add(vals, mode="drop")
        return (any_kill, any_hit, any_undec, bits_acc), None

    child_hit0 = jnp.repeat(hit_prev[pidx_safe] & pvalid, f3)
    bits_acc0 = (jnp.zeros((n_words, N + 1), jnp.uint32) if cell_vox > 1
                 else jnp.zeros((n_words, 1), jnp.uint32))
    init = (jnp.zeros(N + 1, bool), jnp.pad(child_hit0, (0, 1)),
            jnp.zeros(N + 1, bool), bits_acc0)
    xs = (pair_p.reshape(n_chunks, chunk), pair_v.reshape(n_chunks, chunk),
          pair_ok.reshape(n_chunks, chunk))
    (any_kill, any_hit, any_undec, bits_acc), _ = jax.lax.scan(
        chunk_body, init, xs)
    any_kill = any_kill[:N]
    any_hit = any_hit[:N]
    any_undec = any_undec[:N]

    status_c = jnp.where(
        any_kill, jnp.int8(KILLED),
        jnp.where(any_undec, jnp.int8(UNDECIDED),
                  jnp.where(any_hit, jnp.int8(ALIVE), jnp.int8(UNSEEN))))

    # assemble dense next level
    child_valid = jnp.repeat(pvalid, f3)
    children_int = (jnp.repeat(
        jnp.stack([pidx_safe // (gy * gz), (pidx_safe // gz) % gy,
                   pidx_safe % gz], axis=1), f3, axis=0) * factor
        + jnp.tile(jnp.asarray(offs.astype(np.int32)), (cap, 1)))
    nxt = jnp.repeat(jnp.repeat(jnp.repeat(status_prev, factor, axis=0),
                                factor, axis=1), factor, axis=2)
    lin = (children_int[:, 0] * (gy * factor * gz * factor)
           + children_int[:, 1] * (gz * factor) + children_int[:, 2])
    nxt = nxt.reshape(-1)
    safe_lin = jnp.where(child_valid, lin, nxt.size)
    nxt = nxt.at[safe_lin].set(status_c, mode="drop")

    if cell_vox == 1:
        return (nxt.reshape(gx * factor, gy * factor, gz * factor),
                jnp.zeros((n_words, 1), jnp.uint32), jnp.zeros(1, bool))

    bits_next = jnp.zeros((n_words, nxt.size), jnp.uint32)
    bits_next = bits_next.at[:, safe_lin].max(bits_acc[:, :N], mode="drop")
    hit_next = jnp.zeros(nxt.size, bool)
    hit_next = hit_next.at[safe_lin].max(any_hit, mode="drop")
    return (nxt.reshape(gx * factor, gy * factor, gz * factor),
            bits_next, hit_next)


@jax.jit
def _pair_count(bits, undec, valid=None):
    """Total straddle incidences among undecided cells (for capt sizing).
    Branch-free popcount over the packed bit matrix."""
    x = jnp.where(undec[None, :], bits, jnp.uint32(0))
    cnt = x - ((x >> 1) & jnp.uint32(0x55555555))
    cnt = (cnt & jnp.uint32(0x33333333)) + ((cnt >> 2) & jnp.uint32(0x33333333))
    cnt = (cnt + (cnt >> 4)) & jnp.uint32(0x0F0F0F0F)
    cnt = (cnt * jnp.uint32(0x01010101)) >> 24
    return jnp.sum(cnt)


class PerViewCarver:
    """Bit-identical, incidence-pair-compacted hierarchical carver."""

    def __init__(self, masks, cameras, valid, pyramid_levels: int = 8,
                 packed=None):
        if packed is None:
            masks = np.asarray(masks)
            self.V, self.H, self.W = masks.shape
            packed = pack_masks(masks)
        else:
            self.V, self.H, self.W = masks  # masks given as a shape tuple
        self.n_levels = pyramid_levels
        self.n_words = -(-self.V // 32)
        self.masks_flat = jnp.asarray(packed)
        (self.pyr, self.level_off, self.level_w,
         _, _) = build_pyramids_dilated((self.V, self.H, self.W),
                                        pyramid_levels,
                                        packed=self.masks_flat)
        self.cams = jnp.asarray(cameras)
        self.valid = jnp.asarray(valid)

    def carve(self, origin, voxel_size, shape, start_level: int = 3):
        nx, ny, nz = shape
        m = 1 << start_level
        grid = (-(-nx // m), -(-ny // m), -(-nz // m))
        origin_j = jnp.asarray(origin, jnp.float32)
        vs = jnp.float32(voxel_size)

        status, bits, hit = _top_dense(
            self.cams, self.valid, self.pyr, self.level_off,
            self.level_w, origin_j, vs, grid, m, self.H, self.W,
            self.n_levels, self.n_words)

        plan = [(2, m // 2)]
        if m // 2 > 1:
            plan.append((m // 2, 1))
        for factor, cell_vox in plan:
            flat = status.reshape(-1)
            undec = flat == UNDECIDED
            n_undec = int(jnp.sum(undec))
            if n_undec == 0:
                status = jnp.repeat(
                    jnp.repeat(jnp.repeat(status, factor, axis=0),
                               factor, axis=1), factor, axis=2)
                continue
            cap = _bucket(n_undec)
            n_pairs = int(_pair_count(bits, undec, self.valid))
            capt = _CHUNK
            while capt < n_pairs:
                capt += _CHUNK
            status, bits, hit = _refine_pairs(
                status, bits, hit, self.cams, self.valid, self.pyr,
                self.masks_flat, self.level_off, self.level_w,
                origin_j, vs, cap, capt, factor, cell_vox, self.H, self.W,
                self.n_levels, self.n_words, self.V)

        return np.asarray(status[:nx, :ny, :nz])


def carve_perview(masks, cameras, valid, origin, voxel_size, shape,
                  start_level: int = 3, pyramid_levels: int = 8):
    carver = PerViewCarver(masks, cameras, valid, pyramid_levels)
    return carver.carve(origin, voxel_size, shape, start_level)
