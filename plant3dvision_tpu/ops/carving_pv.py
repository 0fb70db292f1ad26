"""Per-view-compacted hierarchical space carving.

Refinement of ops.carving_hier: a cell inherits most view decisions from
its parent —

- a view that fully-hit the parent also fully-hits every child (the child's
  projected footprint is contained in the parent's);
- a view fully outside for the parent is fully outside for every child;
- a killing view is impossible below a surviving parent.

Only the parent's *straddling* (undecided) views — typically 2-6 of
hundreds for a turntable scan — need evaluation per child. Each refinement
level therefore scans over views, gathering ONLY the cells that list that
view as undecided (device-side nonzero compaction with static caps). The
gather count drops from O(cells x views) to O(straddle incidences), while
remaining bit-identical to the dense carve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .carving_hier import (ALIVE, KILLED, UNDECIDED, UNSEEN, _CUBE_OFFS_F,
                           _EPS_Z, build_pyramids, _bucket, pack_masks,
                           packed_lookup)


def _project_corners(cells_f, cam, origin, s_world, H, W):
    """Project the 8 cube corners of (M,3) float cells for ONE camera.
    Returns (pxmin, pxmax, pymin, pymax, behind)."""
    corners = (origin[None, None, :]
               + (cells_f[:, None, :] + _CUBE_OFFS_F[None, :, :]) * s_world)
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
    R = cam[4:13].reshape(3, 3)
    t = cam[13:16]
    p = jnp.einsum("mkj,ij->mki", corners, R) + t
    pz = p[..., 2]
    behind = jnp.any(pz <= _EPS_Z, axis=1)
    pzs = jnp.maximum(pz, _EPS_Z)
    px = p[..., 0] / pzs * fx + cx
    py = p[..., 1] / pzs * fy + cy
    return (jnp.min(px, axis=1), jnp.max(px, axis=1),
            jnp.min(py, axis=1), jnp.max(py, axis=1), behind)


def _pyramid_probe(pxmin, pxmax, pymin, pymax, behind, pmax_v, pmin_v,
                   level_off, level_w, H, W, n_levels):
    """Per-view conservative classification of projected boxes.
    Returns (kill, hit, out) bools."""
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
    cx0 = jnp.right_shift(ax, lvl); cx1 = jnp.right_shift(bx, lvl)
    cy0 = jnp.right_shift(ay, lvl); cy1 = jnp.right_shift(by, lvl)

    def q(pyr, cy, cx):
        return jnp.take(pyr, offl + cy * wl + cx, axis=0)

    vmax = jnp.maximum(jnp.maximum(q(pmax_v, cy0, cx0), q(pmax_v, cy0, cx1)),
                       jnp.maximum(q(pmax_v, cy1, cx0), q(pmax_v, cy1, cx1)))
    vmin = jnp.minimum(jnp.minimum(q(pmin_v, cy0, cx0), q(pmin_v, cy0, cx1)),
                       jnp.minimum(q(pmin_v, cy1, cx0), q(pmin_v, cy1, cx1)))
    kill = fully_in & (vmax == 0)
    hit = fully_in & (vmin > 0)
    return kill, hit, fully_out


@functools.partial(jax.jit, static_argnames=("grid", "cell_vox", "H", "W",
                                             "n_levels", "n_words"))
def _top_dense(cams, valid, pmax, pmin, level_off, level_w, origin,
               voxel_size, grid, cell_vox, H, W, n_levels, n_words):
    """Dense top level over all views. Returns (status (grid,), undec_bits
    (n_words, M) uint32, any_hit (M,))."""
    ii = jax.lax.broadcasted_iota(jnp.int32, grid, 0).reshape(-1)
    jj = jax.lax.broadcasted_iota(jnp.int32, grid, 1).reshape(-1)
    kk = jax.lax.broadcasted_iota(jnp.int32, grid, 2).reshape(-1)
    cells_f = jnp.stack([ii, jj, kk], axis=1).astype(jnp.float32)
    M = cells_f.shape[0]
    s_world = voxel_size * cell_vox

    def body(carry, xs):
        any_kill, any_undec, any_hit, bits, v = carry
        cam, ok_view, pmax_v, pmin_v = xs
        pr = _project_corners(cells_f, cam, origin, s_world, H, W)
        kill, hit, out = _pyramid_probe(*pr, pmax_v, pmin_v, level_off,
                                        level_w, H, W, n_levels)
        kill = kill & ok_view
        hit = hit & ok_view
        no_eff = out | ~ok_view
        undec = ~kill & ~hit & ~no_eff
        word = v >> 5
        bit = jnp.uint32(1) << (v & 31).astype(jnp.uint32)
        # OR the new bit into the word row (max would drop sibling bits)
        bits = bits.at[word].set(bits[word]
                                 | jnp.where(undec, bit, jnp.uint32(0)))
        return (any_kill | kill, any_undec | undec, any_hit | hit,
                bits, v + 1), None

    init = (jnp.zeros(M, bool), jnp.zeros(M, bool), jnp.zeros(M, bool),
            jnp.zeros((n_words, M), jnp.uint32), jnp.int32(0))
    (any_kill, any_undec, any_hit, bits, _), _ = jax.lax.scan(
        body, init, (cams, valid, pmax, pmin))

    status = jnp.where(
        any_kill, jnp.int8(KILLED),
        jnp.where(any_undec, jnp.int8(UNDECIDED),
                  jnp.where(any_hit, jnp.int8(ALIVE), jnp.int8(UNSEEN))))
    return status.reshape(grid), bits, any_hit


@functools.partial(jax.jit, static_argnames=("cap", "capv", "factor",
                                             "cell_vox", "H", "W",
                                             "n_levels", "n_words", "V"))
def _refine_perview(status_prev, bits_prev, hit_prev, cams, valid, pmax,
                    pmin, masks_flat, level_off, level_w, origin, voxel_size,
                    cap, capv, factor, cell_vox, H, W, n_levels, n_words, V):
    """One per-view-compacted refinement level.

    status_prev: dense (gx,gy,gz) int8 of the previous level.
    bits_prev: (n_words, gx*gy*gz) straddling-view bitmasks.
    hit_prev: (gx*gy*gz,) parent any-hit flags.
    Returns (status_next dense, bits_next, hit_next) at factor x resolution.
    """
    gx, gy, gz = status_prev.shape
    flat_prev = status_prev.reshape(-1)
    undec = flat_prev == UNDECIDED
    pidx = jnp.nonzero(undec, size=cap, fill_value=gx * gy * gz)[0]
    pvalid = pidx < gx * gy * gz
    pidx_safe = jnp.minimum(pidx, gx * gy * gz - 1)
    pi = pidx_safe // (gy * gz)
    pj = (pidx_safe // gz) % gy
    pk = pidx_safe % gz

    f3 = factor ** 3
    offs = np.stack(np.meshgrid(np.arange(factor), np.arange(factor),
                                np.arange(factor), indexing="ij"),
                    axis=-1).reshape(-1, 3).astype(np.float32)
    parents = jnp.stack([pi, pj, pk], axis=1).astype(jnp.float32)
    children = (parents[:, None, :] * factor
                + offs[None, :, :]).reshape(cap * f3, 3)  # float cells
    child_valid = jnp.repeat(pvalid, f3)
    # per-child inherited state
    pbits = bits_prev[:, pidx_safe]                      # (n_words, cap)
    phit = hit_prev[pidx_safe]                            # (cap,)
    child_hit0 = jnp.repeat(phit & pvalid, f3)

    s_world = voxel_size * cell_vox
    N = cap * f3

    def body(carry, xs):
        any_kill, any_undec, any_hit, bits, v = carry
        cam, ok_view, pmax_v, pmin_v, mask_flat = xs
        word = v >> 5
        bit = jnp.uint32(1) << (v & 31).astype(jnp.uint32)
        # parents listing view v as straddling
        pmask = ((pbits[word] & bit) != 0) & pvalid & ok_view
        sel = jnp.nonzero(pmask, size=capv, fill_value=cap)[0]
        sel_ok = sel < cap
        sel_safe = jnp.minimum(sel, cap - 1)
        # the f3 children of each selected parent
        cidx = (sel_safe[:, None] * f3
                + jnp.arange(f3)[None, :]).reshape(-1)     # (capv*f3,)
        ccells = children[cidx]
        cok = jnp.repeat(sel_ok, f3)

        if cell_vox > 1:
            pr = _project_corners(ccells, cam, origin, s_world, H, W)
            kill, hit, out = _pyramid_probe(*pr, pmax_v, pmin_v, level_off,
                                            level_w, H, W, n_levels)
            undec_c = ~kill & ~hit & ~out
        else:
            # exact single-pixel reference test
            fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
            R = cam[4:13].reshape(3, 3)
            t = cam[13:16]
            pts = origin[None, :] + ccells * voxel_size
            p = pts @ R.T + t
            pz = p[:, 2]
            px = (p[:, 0] / pz * fx + cx).astype(jnp.int32)
            py = (p[:, 1] / pz * fy + cy).astype(jnp.int32)
            in_img = (pz > 0) & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
            lin = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
            m = packed_lookup(mask_flat, lin)
            kill = in_img & ~m
            hit = in_img & m
            undec_c = jnp.zeros_like(kill)

        kill = kill & cok
        hit = hit & cok
        undec_c = undec_c & cok
        tgt = jnp.where(cok, cidx, N)
        any_kill = any_kill.at[tgt].max(kill, mode="drop")
        any_hit = any_hit.at[tgt].max(hit, mode="drop")
        any_undec = any_undec.at[tgt].max(undec_c, mode="drop")
        # OR the view bit in (targets are unique within a step, so a
        # gather-or-scatter round trip is race-free)
        tgt_safe = jnp.minimum(tgt, N - 1)
        cur = bits[word, tgt_safe]
        bits = bits.at[word, tgt].set(
            cur | jnp.where(undec_c, bit, jnp.uint32(0)), mode="drop")
        return (any_kill, any_undec, any_hit, bits, v + 1), None

    init = (jnp.zeros(N, bool), jnp.zeros(N, bool), child_hit0,
            jnp.zeros((n_words, N), jnp.uint32), jnp.int32(0))
    (any_kill, any_undec, any_hit, bits, _), _ = jax.lax.scan(
        body, init, (cams, valid, pmax, pmin, masks_flat))

    status_c = jnp.where(
        any_kill, jnp.int8(KILLED),
        jnp.where(any_undec, jnp.int8(UNDECIDED),
                  jnp.where(any_hit, jnp.int8(ALIVE), jnp.int8(UNSEEN))))

    # assemble dense next level
    nxt = jnp.repeat(jnp.repeat(jnp.repeat(status_prev, factor, axis=0),
                                factor, axis=1), factor, axis=2)
    lin = (children[:, 0].astype(jnp.int32) * (gy * factor * gz * factor)
           + children[:, 1].astype(jnp.int32) * (gz * factor)
           + children[:, 2].astype(jnp.int32))
    nxt = nxt.reshape(-1)
    safe_lin = jnp.where(child_valid, lin, nxt.size)
    nxt = nxt.at[safe_lin].set(status_c, mode="drop")

    if cell_vox == 1:
        # final level: no further refinement, skip the (huge) bit arrays
        return (nxt.reshape(gx * factor, gy * factor, gz * factor),
                jnp.zeros((n_words, 1), jnp.uint32), jnp.zeros(1, bool))

    # scatter child bits/hit into dense-level arrays for the next level
    bits_next = jnp.zeros((n_words, nxt.size), jnp.uint32)
    bits_next = bits_next.at[:, safe_lin].max(bits, mode="drop")
    hit_next = jnp.zeros(nxt.size, bool)
    hit_next = hit_next.at[safe_lin].max(any_hit, mode="drop")
    return (nxt.reshape(gx * factor, gy * factor, gz * factor),
            bits_next, hit_next)


@jax.jit
def _max_per_view_count(bits, undec):
    """Max over views of the straddling-cell count (for capv sizing)."""
    masked = jnp.where(undec[None, :], bits, jnp.uint32(0))
    counts = jnp.stack([jnp.sum((masked >> b) & 1, axis=1)
                        for b in range(32)])  # (32, n_words)
    return jnp.max(counts)


class PerViewCarver:
    """Bit-identical, per-view-compacted hierarchical carver."""

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
        (self.pmax, self.pmin, self.level_off, self.level_w,
         _, _) = build_pyramids((self.V, self.H, self.W), pyramid_levels,
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
            self.cams, self.valid, self.pmax, self.pmin, self.level_off,
            self.level_w, origin_j, vs, grid, m, self.H, self.W,
            self.n_levels, self.n_words)
        hit = jnp.asarray(hit)

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
                bits = None
                break
            cap = _bucket(n_undec)
            max_pv = int(_max_per_view_count(bits, undec))
            capv = _bucket(max(max_pv, 1))
            status, bits, hit = _refine_perview(
                status, bits, hit, self.cams, self.valid, self.pmax,
                self.pmin, self.masks_flat, self.level_off, self.level_w,
                origin_j, vs, cap, capv, factor, cell_vox, self.H, self.W,
                self.n_levels, self.n_words, self.V)

        return np.asarray(status[:nx, :ny, :nz])


def carve_perview(masks, cameras, valid, origin, voxel_size, shape,
                  start_level: int = 3, pyramid_levels: int = 8):
    carver = PerViewCarver(masks, cameras, valid, pyramid_levels)
    return carver.carve(origin, voxel_size, shape, start_level)
