"""Multi-chip hierarchical carving: views sharded over a Mesh axis.

The hierarchy (ops.carving_pv) is view-separable: kill/hit/straddle are
per-view facts and every level decision is an associative reduction over
views (ANY kill, ANY straddle, ANY hit). So each chip:

- holds pyramids + packed masks for ITS view shard,
- classifies cells against its own views only,
- joins one tiny collective per level (pmax over int8 arrays of the
  level's cell count) to agree on global statuses.

Straddle matrices never cross chips. The whole carve is ONE jitted SPMD
program (static caps, no host syncs). Output matches the single-chip carve
bit-for-bit (tests/unit/test_parallel_carve.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.carving_hier import (ALIVE, KILLED, UNDECIDED, UNSEEN,
                                _CUBE_OFFS_F, _EPS_Z, _build_tile_tables,
                                _dilated_pyramids_core, _pick32,
                                _pyramid_shapes, pack_masks)
from ..ops.carving_pv import _box_cover
from ..runtime.log import configure_logger

logger = configure_logger(__name__)


# combined (bit0 = window max, bit1 = window min) DILATED pyramid —
# shared with the single-chip engines (see
# ops.carving_hier._dilated_pyramids_core for the full derivation)
_build_local_pyramids = _dilated_pyramids_core


def _classify_local(cells_f, cams, valid, pyr, level_off, level_w,
                    origin, s_world, H, W, n_levels):
    """(kill, hit, undec) over (V_local, M) for float cell coords.
    `pyr` is the combined (V, L) pyramid from `_build_local_pyramids`
    (bit0 = window max, bit1 = window min)."""
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
        # dilated pyramids: the single (cy0, cx0) tap covers the whole
        # 2x2 box cover (see _build_local_pyramids); one gather serves
        # both the max (bit0) and min (bit1) tests
        i00, _, _, _ = _box_cover(pxmin, pxmax, pymin, pymax, H, W,
                                  n_levels, level_off, level_w)
        c = jnp.take(pyr_v, i00)
        return fin & ((c & 1) == 0), fin & (c >= 2), out

    # lax.map (not vmap): per-view temporaries are O(M) — a vmap over
    # hundreds of views materializes (V, M, 8, 3) floats and OOMs at
    # north-star scale (300 views x 4M fine-pass points = 14 GB)
    kill, hit, out = jax.lax.map(
        lambda xs: one_view(*xs), (cams, pyr))
    kill = kill & valid[:, None]
    hit = hit & valid[:, None]
    no_eff = out | ~valid[:, None]
    undec = ~kill & ~hit & ~no_eff
    return kill, hit, undec


def _topk_slots(cand, K):
    """Per-parent view compaction of the straddle matrix.

    A refinement-level child only needs testing against the views that
    STRADDLE its parent cell (typically 2-6 of 60 — the same fact the
    pair-compacted engine exploits, docs/CARVE_CEILING.md) — but instead
    of a dense `nonzero` over the full status volume (the fp engine's
    overhead), this compacts per-parent with one `top_k` over the
    (P, V) straddle matrix the fused carve already carries.

    cand: (V, P) bool  ->  (vsel (P, K) int32 view ids, vvalid (P, K)
    bool, smax scalar int32 = max straddling views over parents).
    Exactness: callers must check smax <= K and re-jit with a bigger K
    otherwise (same contract as the undecided-cell caps).
    """
    candT = cand.T.astype(jnp.int32)            # (P, V)
    smax = jnp.max(jnp.sum(candT, axis=1)).astype(jnp.int32)
    vals, vsel = jax.lax.top_k(candT, K)        # ties -> lowest view idx
    return vsel, vals > 0, smax


def _classify_slots(corners_p, vsel, vvalid, cams, pyr_flat,
                    Lflat, level_off, level_w, H, W, n_levels):
    """Slot-compacted box classification: each parent's children are
    tested only against the parent's (<= K) straddling views.

    corners_p: (P, f3, 8, 3) world-space child-cell corners.
    Returns (kill, hit, undec) each (P, f3) = OR over slots, plus the
    per-slot undec (K, P, f3) for the next level's straddle carry.
    Same box test as `_classify_local`, with per-parent cameras.
    """
    P_, f3 = corners_p.shape[0], corners_p.shape[1]
    corners_flat = corners_p.reshape(P_, f3 * 8, 3)

    def one_slot(xs):
        vk, okk = xs                             # (P,), (P,)
        cam = jnp.take(cams, vk, axis=0)         # (P, 16)
        R = cam[:, 4:13].reshape(P_, 3, 3)
        t = cam[:, 13:16]
        p = jnp.einsum("pcj,pij->pci", corners_flat, R) + t[:, None, :]
        pz = p[..., 2].reshape(P_, f3, 8)
        behind = jnp.any(pz <= _EPS_Z, axis=2)
        pzs = jnp.maximum(pz, _EPS_Z)
        px = (p[..., 0].reshape(P_, f3, 8) / pzs * cam[:, 0, None, None]
              + cam[:, 2, None, None])
        py = (p[..., 1].reshape(P_, f3, 8) / pzs * cam[:, 1, None, None]
              + cam[:, 3, None, None])
        pxmin = px.min(2); pxmax = px.max(2)
        pymin = py.min(2); pymax = py.max(2)
        out = ((pxmax <= -1.0) | (pxmin >= W) | (pymax <= -1.0)
               | (pymin >= H)) & ~behind
        fin = ((pxmin >= 0.0) & (pxmax < W) & (pymin >= 0.0)
               & (pymax < H) & ~behind)
        i00, _, _, _ = _box_cover(pxmin, pxmax, pymin, pymax, H, W,
                                  n_levels, level_off, level_w)
        base = vk[:, None] * Lflat
        c = jnp.take(pyr_flat, base + i00)
        kill = fin & ((c & 1) == 0)
        hit = fin & (c >= 2)
        undec = ~kill & ~hit & ~out
        okm = okk[:, None]
        return kill & okm, hit & okm, undec & okm

    kill_s, hit_s, und_s = jax.lax.map(one_slot, (vsel.T, vvalid.T))
    return kill_s.any(0), hit_s.any(0), und_s.any(0), und_s


def _exact_slots(pts_p, vsel, vvalid, cams, packed_flat, B, H, W):
    """Slot-compacted exact-pixel test (the fine carve level).

    pts_p: (P, f3, 3) voxel centers.  Same single-pixel semantics as
    `_exact_local` — a view only contributes where it straddles the
    parent, which is exactly the dense path's `& cand_c` masking.
    Returns (kill, hit) each (P, f3) = OR over slots.
    """
    P_, f3 = pts_p.shape[0], pts_p.shape[1]

    def one_slot(xs):
        vk, okk = xs
        cam = jnp.take(cams, vk, axis=0)
        R = cam[:, 4:13].reshape(P_, 3, 3)
        t = cam[:, 13:16]
        p = jnp.einsum("pcj,pij->pci", pts_p, R) + t[:, None, :]
        pz = p[..., 2]
        px = (p[..., 0] / pz * cam[:, 0, None] + cam[:, 2, None]).astype(jnp.int32)
        py = (p[..., 1] / pz * cam[:, 1, None] + cam[:, 3, None]).astype(jnp.int32)
        in_img = (pz > 0) & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
        in_img = in_img & okk[:, None]
        lin = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
        idx = vk[:, None] * B + jnp.right_shift(lin, 3)
        byte = jnp.take(packed_flat, idx)
        m = ((byte >> (7 - (lin & 7)).astype(jnp.uint8)) & 1) != 0
        return in_img & ~m, in_img & m

    kill_s, hit_s = jax.lax.map(one_slot, (vsel.T, vvalid.T))
    return kill_s.any(0), hit_s.any(0)


def _exact_tiles(pts_p, cams, valid, tiles, Ht, Wt, H, W):
    """Exact single-pixel fine-level test via tile row-gathers.

    pts_p: (P, f3, 3) voxel centers grouped by parent.  Returns
    (kill (V, P*f3), hit (V, P*f3), overflow (V,) int32) — overflow
    counts parents whose in-image pixel window exceeds the 25-px tile
    guarantee (callers must fall back to the byte-gather path when any
    overflow is nonzero; same retry contract as the caps).
    Bit semantics identical to `_exact_local` (same projection rounding,
    same clipped-pixel addressing).
    """
    P_, f3 = pts_p.shape[0], pts_p.shape[1]

    def one_view(xs):
        cam, ok_view, voff = xs
        R = cam[4:13].reshape(3, 3)
        t = cam[13:16]
        p = pts_p.reshape(P_ * f3, 3) @ R.T + t
        pz = p[:, 2]
        px = (p[:, 0] / pz * cam[0] + cam[2]).astype(jnp.int32)
        py = (p[:, 1] / pz * cam[1] + cam[3]).astype(jnp.int32)
        in_img = (pz > 0) & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
        in_img = in_img & ok_view
        cx = jnp.clip(px, 0, W - 1).reshape(P_, f3)
        cy = jnp.clip(py, 0, H - 1).reshape(P_, f3)
        x0 = cx.min(axis=1)
        y0 = cy.min(axis=1)
        # 24 (not 25): the anchor can sit up to 7 px before the window
        # min, and dx/dy must stay < 32 for the shifts.  Only parents
        # with in-image children count — a parent whose children are all
        # outside (or behind) projects garbage that the in_img mask
        # discards anyway; a MIXED parent (some in, some clipped) can
        # pull the anchor away from its in-image children, and then this
        # span check is what catches the bad window.
        over = (((cx.max(axis=1) - x0 > 24) | (cy.max(axis=1) - y0 > 24))
                & in_img.reshape(P_, f3).any(axis=1))
        tx = jnp.right_shift(x0, 3)
        ty = jnp.right_shift(y0, 3)
        rows = voff + ty * Wt + tx                      # (P,)
        T = jnp.take(tiles, rows, axis=0)               # (P, 32) row-gather
        dy = jnp.clip(cy - ty[:, None] * 8, 0, 31)
        dx = jnp.clip(cx - tx[:, None] * 8, 0, 31)
        word = _pick32(T, dy)
        m = ((word >> dx) & 1) != 0
        m = m.reshape(P_ * f3)
        return in_img & ~m, in_img & m, jnp.sum(over, dtype=jnp.int32)

    voffs = jnp.arange(cams.shape[0], dtype=jnp.int32) * (Ht * Wt)
    kill, hit, over = jax.lax.map(
        lambda xs: one_view(xs), (cams, valid, voffs))
    return kill, hit, over


def _exact_tiles_slots(pts_p, vsel, vvalid, cams, tiles, Ht, Wt, H, W):
    """Slot-compacted tile row-gather fine level: _exact_tiles semantics,
    but each parent's children test only the parent's (<= K) straddling
    views (vsel/vvalid from `_topk_slots`) instead of all V — K x P
    row-gathers instead of V x P, and the `_pick32` select tree runs K
    times instead of V times.  Bit-identical to the dense tile path
    because the dense path masks non-straddling views out anyway
    (`killc & cand_c`).  Returns (kill (P, f3), hit (P, f3),
    overflow int32) — same 24-px window contract as `_exact_tiles`."""
    P_, f3 = pts_p.shape[0], pts_p.shape[1]

    def one_slot(xs):
        vk, okk = xs                                    # (P,), (P,)
        cam = jnp.take(cams, vk, axis=0)                # (P, 16)
        R = cam[:, 4:13].reshape(P_, 3, 3)
        t = cam[:, 13:16]
        p = jnp.einsum("pcj,pij->pci", pts_p, R) + t[:, None, :]
        pz = p[..., 2]
        px = (p[..., 0] / pz * cam[:, 0, None] + cam[:, 2, None]).astype(jnp.int32)
        py = (p[..., 1] / pz * cam[:, 1, None] + cam[:, 3, None]).astype(jnp.int32)
        in_img = (pz > 0) & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
        in_img = in_img & okk[:, None]
        cx = jnp.clip(px, 0, W - 1)                     # (P, f3)
        cy = jnp.clip(py, 0, H - 1)
        x0 = cx.min(axis=1)
        y0 = cy.min(axis=1)
        over = (((cx.max(axis=1) - x0 > 24) | (cy.max(axis=1) - y0 > 24))
                & in_img.any(axis=1))
        tx = jnp.right_shift(x0, 3)
        ty = jnp.right_shift(y0, 3)
        rows = vk * (Ht * Wt) + ty * Wt + tx            # (P,)
        T = jnp.take(tiles, rows, axis=0)               # (P, 32) row-gather
        dy = jnp.clip(cy - ty[:, None] * 8, 0, 31)
        dx = jnp.clip(cx - tx[:, None] * 8, 0, 31)
        word = _pick32(T, dy)
        m = ((word >> dx) & 1) != 0
        return in_img & ~m, in_img & m, jnp.sum(over, dtype=jnp.int32)

    kill_s, hit_s, over_s = jax.lax.map(one_slot, (vsel.T, vvalid.T))
    return kill_s.any(0), hit_s.any(0), jnp.sum(over_s, dtype=jnp.int32)


def _exact_local(pts, cams, valid, masks_packed, H, W):
    """(kill, hit) over (V_local, M): exact single-pixel reference test."""

    def one_view(cam, ok_view, packed_v):
        R = cam[4:13].reshape(3, 3)
        t = cam[13:16]
        p = pts @ R.T + t
        pz = p[:, 2]
        px = (p[:, 0] / pz * cam[0] + cam[2]).astype(jnp.int32)
        py = (p[:, 1] / pz * cam[1] + cam[3]).astype(jnp.int32)
        in_img = (pz > 0) & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
        in_img = in_img & ok_view
        lin = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
        byte = jnp.take(packed_v, jnp.right_shift(lin, 3), axis=0)
        m = ((byte >> (7 - (lin & 7)).astype(jnp.uint8)) & 1) != 0
        return in_img & ~m, in_img & m

    kill, hit = jax.lax.map(
        lambda xs: one_view(*xs), (cams, valid, masks_packed))
    return kill, hit


def _gor(x, axis):
    """Global OR across the mesh axis for a bool array (no-op when the
    body runs unsharded, axis=None — the fused single-chip path)."""
    if axis is None:
        return x
    return jax.lax.pmax(x.astype(jnp.int8), axis) == 1


def _next_cap(n: int) -> int:
    b = 4096
    while b < n:
        b <<= 1
    return b


def _make_carve_body(axis, H, W, shape,
                     start_level, pyramid_levels, caps,
                     packed_output=False, slot_caps=None,
                     fine_tiles=False, min_seen=1):
    """The fused hierarchical carve: top level + all refinements in ONE
    traced program with static per-level caps. Returns (volume int8,
    undecided counts per level int32) — callers MUST check counts <= caps
    (the result is invalid otherwise; wrappers re-jit with bigger caps).
    `axis=None` runs unsharded (single chip); otherwise collectives join
    per-level statuses across the view shard. Pass `pyr_l` (the combined
    pyramid from `_build_local_pyramids`) to reuse a device-resident
    pyramid across carves (skips the in-program build);
    origin and voxel_size are runtime arguments, so one compiled program
    serves any grid placement of the same `shape`.

    `slot_caps` (tuple per refinement level, or None) enables the
    slot-compacted refinement: each parent's children test only the
    parent's <= K straddling views (docs/CARVE_CEILING.md lever) instead
    of all V — ~6x fewer mask/pyramid gathers at the fine level. When
    enabled the returned counts are [undecided per level..., max
    straddling views per level...]; callers must ALSO check the second
    half <= slot_caps (the wrappers retry with bigger K).

    `fine_tiles` switches the exact fine level to 32x32-px tile
    row-gathers (_exact_tiles; ~6x fewer gather lookups).  It appends
    ONE more counts entry: the window-overflow total, which must be 0
    (wrappers rebuild with fine_tiles=False otherwise)."""
    m = 1 << start_level
    grid = (-(-shape[0] // m), -(-shape[1] // m), -(-shape[2] // m))
    n_levels = pyramid_levels
    nx, ny, nz = shape
    if min_seen > 1 and slot_caps is not None:
        raise NotImplementedError("min_seen needs the dense refinement "
                                  "paths (slot_caps unsupported)")

    # halve down to 4-voxel cells, then one factor-4 exact fine level —
    # the fine tile path's 24-px window guarantee needs fine parents no
    # coarser than 4 voxels at carve-scale camera geometry, so higher
    # start_levels insert extra box levels instead of widening the last
    f = m
    plan = []
    while f > 4:
        plan.append((2, f // 2))
        f //= 2
    if f > 1:
        plan.append((f, 1))
    assert len(caps) >= len(plan), "one cap per refinement level"

    def body(packed_l, cams_l, valid_l, origin_in, vs_in, pyr_l=None):
        vs = jnp.float32(vs_in)
        if pyr_l is None:
            pyr_l = _build_local_pyramids(packed_l, H, W, n_levels)
        _, _, _, level_off, level_w = _pyramid_shapes(H, W, n_levels)
        level_off = jnp.asarray(level_off)
        level_w = jnp.asarray(level_w)
        origin_j = jnp.asarray(origin_in, jnp.float32)

        # ---- top level ------------------------------------------------
        gx, gy, gz = grid
        ii = jax.lax.broadcasted_iota(jnp.int32, grid, 0).reshape(-1)
        jj = jax.lax.broadcasted_iota(jnp.int32, grid, 1).reshape(-1)
        kk = jax.lax.broadcasted_iota(jnp.int32, grid, 2).reshape(-1)
        cells_f = jnp.stack([ii, jj, kk], axis=1).astype(jnp.float32)
        kill, hit, undec = _classify_local(
            cells_f, cams_l, valid_l, pyr_l, level_off, level_w,
            origin_j, vs * m, H, W, n_levels)
        any_kill = _gor(jnp.any(kill, axis=0), axis)
        hit_carry = _gor(jnp.any(hit, axis=0), axis)        # dense (M,)
        any_und = _gor(jnp.any(undec, axis=0), axis)
        if min_seen > 1:
            # seen-count carry (opt-in min_seen cleanup, VERDICT r4 #3):
            # views that fully cover a cell are counted here; straddling
            # views of a refining parent are counted at the children
            # (an ALIVE cell has no straddlers, so its count is final)
            seen_count = jnp.sum(hit, axis=0, dtype=jnp.int32)
            if axis is not None:
                seen_count = jax.lax.psum(seen_count, axis)
            seen_count = jnp.minimum(seen_count, 255).astype(jnp.uint8)
        status = jnp.where(
            any_kill, jnp.int8(KILLED),
            jnp.where(any_und, jnp.int8(UNDECIDED),
                      jnp.where(hit_carry, jnp.int8(ALIVE),
                                jnp.int8(UNSEEN))))
        local_undec = undec                                  # (V_l, M)
        status = status.reshape(-1)

        # ---- refinement -------------------------------------------------
        counts = []
        smaxes = []
        overflow = None
        tiles = None
        if fine_tiles:
            tiles, Ht_t, Wt_t = _build_tile_tables(packed_l, H, W)
        V_l = packed_l.shape[0]
        for li, (factor, cell_vox) in enumerate(plan):
            cap = caps[li]
            K = None
            if slot_caps is not None and slot_caps[li]:
                K = min(int(slot_caps[li]), V_l)
            P_dense = gx * gy * gz
            undec_mask = status.reshape(-1) == UNDECIDED
            counts.append(jnp.sum(undec_mask, dtype=jnp.int32))
            pidx = jnp.nonzero(undec_mask, size=cap, fill_value=P_dense)[0]
            pvalid = pidx < P_dense
            pidx_safe = jnp.minimum(pidx, P_dense - 1)
            parents = jnp.stack([pidx_safe // (gy * gz),
                                 (pidx_safe // gz) % gy,
                                 pidx_safe % gz],
                                axis=1).astype(jnp.float32)

            f3 = factor ** 3
            offs = np.stack(np.meshgrid(*([np.arange(factor)] * 3),
                                        indexing="ij"),
                            axis=-1).reshape(-1, 3).astype(np.float32)
            children = (parents[:, None, :] * factor
                        + jnp.asarray(offs)[None, :, :]).reshape(cap * f3, 3)
            child_valid = jnp.repeat(pvalid, f3)
            cand = local_undec[:, pidx_safe] & pvalid[None, :]
            hit_inherit = jnp.repeat(hit_carry[pidx_safe] & pvalid, f3)

            if K is not None:
                vsel, vvalid_s, smax = _topk_slots(cand, K)
                if axis is not None:
                    smax = jax.lax.pmax(smax, axis)
                smaxes.append(smax)
                und_s = None
                if cell_vox > 1:
                    corners_p = (origin_j[None, None, None, :]
                                 + (children.reshape(cap, f3, 1, 3)
                                    + _CUBE_OFFS_F[None, None, :, :])
                                 * (vs * cell_vox))
                    Lflat = pyr_l.shape[1]
                    kill_a, hit_a, und_a, und_s = _classify_slots(
                        corners_p, vsel, vvalid_s, cams_l,
                        pyr_l.reshape(-1), Lflat,
                        level_off, level_w, H, W, n_levels)
                elif fine_tiles:
                    pts_p = (origin_j[None, None, :]
                             + children.reshape(cap, f3, 3) * vs)
                    kill_a, hit_a, over_s = _exact_tiles_slots(
                        pts_p, vsel, vvalid_s, cams_l, tiles, Ht_t, Wt_t,
                        H, W)
                    if axis is not None:
                        over_s = jax.lax.psum(over_s, axis)
                    overflow = over_s
                    und_a = jnp.zeros_like(kill_a)
                else:
                    pts_p = (origin_j[None, None, :]
                             + children.reshape(cap, f3, 3) * vs)
                    kill_a, hit_a = _exact_slots(
                        pts_p, vsel, vvalid_s, cams_l,
                        packed_l.reshape(-1), packed_l.shape[1], H, W)
                    und_a = jnp.zeros_like(kill_a)
                loc_kill = kill_a.reshape(-1)
                loc_hit = hit_a.reshape(-1)
                loc_und = und_a.reshape(-1)
            else:
                smaxes.append(jnp.int32(0))
                cand_c = jnp.repeat(cand, f3, axis=1)        # (V_l, cap*f3)
                if cell_vox > 1:
                    killc, hitc, undc = _classify_local(
                        children, cams_l, valid_l, pyr_l, level_off,
                        level_w, origin_j, vs * cell_vox, H, W, n_levels)
                    undc = undc & cand_c
                elif fine_tiles:
                    pts_p = (origin_j[None, None, :]
                             + children.reshape(cap, f3, 3) * vs)
                    killc, hitc, over_v = _exact_tiles(
                        pts_p, cams_l, valid_l, tiles, Ht_t, Wt_t, H, W)
                    overflow = jnp.sum(over_v, dtype=jnp.int32)
                    if axis is not None:
                        overflow = jax.lax.psum(overflow, axis)
                    undc = jnp.zeros_like(killc)
                else:
                    pts = origin_j[None, :] + children * vs
                    killc, hitc = _exact_local(pts, cams_l, valid_l,
                                               packed_l, H, W)
                    undc = jnp.zeros_like(killc)
                killc = killc & cand_c
                hitc = hitc & cand_c
                loc_kill = jnp.any(killc, axis=0)
                loc_hit = jnp.any(hitc, axis=0)
                loc_und = jnp.any(undc, axis=0)
                if min_seen > 1:
                    hn = jnp.sum(hitc, axis=0, dtype=jnp.int32)
                    if axis is not None:
                        hn = jax.lax.psum(hn, axis)
                    count_c = (jnp.repeat(
                        seen_count[pidx_safe].astype(jnp.int32)
                        * pvalid.astype(jnp.int32), f3) + hn)

            any_kill_c = _gor(loc_kill, axis)
            any_hit_c = _gor(loc_hit, axis) | hit_inherit
            any_und_c = _gor(loc_und, axis)
            status_c = jnp.where(
                any_kill_c, jnp.int8(KILLED),
                jnp.where(any_und_c, jnp.int8(UNDECIDED),
                          jnp.where(any_hit_c, jnp.int8(ALIVE),
                                    jnp.int8(UNSEEN))))
            status_c = jnp.where(child_valid, status_c, jnp.int8(KILLED))

            # dense next level
            nxt = jnp.repeat(jnp.repeat(jnp.repeat(
                status.reshape(gx, gy, gz),
                factor, axis=0), factor, axis=1), factor, axis=2)
            gx, gy, gz = gx * factor, gy * factor, gz * factor
            lin = (children[:, 0].astype(jnp.int32) * (gy * gz)
                   + children[:, 1].astype(jnp.int32) * gz
                   + children[:, 2].astype(jnp.int32))
            nxt = nxt.reshape(-1)
            safe_lin = jnp.where(child_valid, lin, nxt.size)
            status = nxt.at[safe_lin].set(status_c, mode="drop")  # flat
            if min_seen > 1:
                cnx = jnp.repeat(jnp.repeat(jnp.repeat(
                    seen_count.reshape(gx // factor, gy // factor,
                                       gz // factor),
                    factor, axis=0), factor, axis=1), factor,
                    axis=2).reshape(-1)
                seen_count = cnx.at[safe_lin].set(
                    jnp.minimum(count_c, 255).astype(jnp.uint8),
                    mode="drop")

            if cell_vox > 1:
                # carry dense straddle matrix + hit flags to the next level
                if K is not None:
                    tot = V_l * nxt.size
                    idx_s = (vsel.T[:, :, None] * nxt.size
                             + safe_lin.reshape(1, cap, f3))
                    # only true straddle entries land; everything else
                    # (masked slots, invalid children) routes out of range
                    idx_s = jnp.where(und_s, idx_s, tot)
                    lu = jnp.zeros((tot,), bool)
                    local_undec = lu.at[idx_s.reshape(-1)].max(
                        und_s.reshape(-1),
                        mode="drop").reshape(V_l, nxt.size)
                else:
                    lu = jnp.zeros((V_l, nxt.size), bool)
                    local_undec = lu.at[:, safe_lin].max(undc, mode="drop")
                hc = jnp.zeros(nxt.size, bool)
                hit_carry = hc.at[safe_lin].max(any_hit_c, mode="drop")

        if slot_caps is not None:
            counts = counts + smaxes
        if fine_tiles:
            counts = counts + [overflow if overflow is not None
                               else jnp.int32(0)]
        vol = status.reshape(gx, gy, gz)[:nx, :ny, :nz]
        if min_seen > 1:
            # demote background-fuzz ALIVE voxels (seen by < min_seen
            # views) to UNSEEN — validated against a per-view counting
            # oracle in tests/unit/test_carving_vb.py (same semantics as
            # ops/carving_vb.py min_seen)
            cnt = seen_count.reshape(gx, gy, gz)[:nx, :ny, :nz]
            vol = jnp.where((vol == ALIVE) & (cnt < min_seen),
                            jnp.int8(UNSEEN), vol)
        if packed_output:
            # bit-pack the alive mask on device: the volume pull is often
            # link-bound (remote relay here, PCIe elsewhere) and the
            # pipeline consumers binarize at alive==1 anyway — 8x less
            # transfer than int8
            alive = (vol == ALIVE).reshape(-1)
            n = alive.shape[0]
            pad = (-n) % 8
            alive = jnp.pad(alive, (0, pad))
            weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
            packed = (alive.reshape(-1, 8).astype(jnp.uint8)
                      * weights[None, :]).sum(axis=1).astype(jnp.uint8)
            return packed, jnp.stack(counts)
        return vol, jnp.stack(counts)

    return body


def make_sharded_carver(mesh: Mesh, axis: str, H: int, W: int, V_total: int,
                        shape, start_level: int = 3, pyramid_levels: int = 8,
                        cap: int = 8192, caps=None, fine_tiles=False):
    """Builds a jitted SPMD carve for a fixed geometry.

    Returns fn(packed (V, B) view-sharded, cams (V, 16), valid (V,),
    origin (3,), voxel_size) -> (replicated int8 volume of `shape`,
    per-level undecided counts). `caps` bounds undecided cells per
    refinement level (static); check counts <= caps or use
    carve_sharded_hierarchical, which retries. `fine_tiles` enables the
    tile row-gather fine level (each shard builds tile tables from its
    LOCAL views; the window-overflow count is psum'd and appended to
    counts — it must be 0, same contract as the single-chip engine)."""
    from jax import shard_map

    n_shards = mesh.shape[axis]
    assert V_total % n_shards == 0, "pad views to a multiple of the mesh axis"
    if caps is None:
        caps = (cap, cap)
    body = _make_carve_body(axis, H, W, tuple(shape),
                            start_level, pyramid_levels, tuple(caps),
                            fine_tiles=fine_tiles)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(), P()),
                   out_specs=(P(), P()))
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def make_fused_carver(H: int, W: int, shape,
                      start_level: int = 3, pyramid_levels: int = 8,
                      caps=(8192, 32768), packed_output=False,
                      slot_caps=None, fine_tiles=False, min_seen=1):
    """Single-chip FUSED hierarchical carve: the whole level loop is one
    jitted program (no host syncs between levels — the round-1 carver,
    ops/carving_hier.py:310-342, pays one dispatch + one scalar pull per
    level). Same bit-exact semantics; same body as the sharded carver.

    Returns fn(packed (V, B), cams (V, 16), valid (V,), origin (3,),
    voxel_size[, pyr]) -> (volume int8, per-level undecided
    counts). Check counts <= caps. lru-cached per geometry so repeated
    carves reuse the compiled program.  With `slot_caps` (tuple per
    refinement level) the refinement is slot-compacted and counts is
    [undecided..., max-straddling-views...] — check BOTH halves.  With
    `fine_tiles` the last counts entry is the tile-window overflow total
    (must be 0; rebuild with fine_tiles=False otherwise)."""
    body = _make_carve_body(None, H, W, tuple(shape),
                            start_level, pyramid_levels, tuple(caps),
                            packed_output=packed_output,
                            slot_caps=slot_caps, fine_tiles=fine_tiles,
                            min_seen=min_seen)
    return jax.jit(body)


#: per-geometry memory of the last cap set that carved without overflow:
#: every carve_fused call otherwise restarts from the default caps and —
#: when the workload needs bigger ones — pays a WASTED full carve per
#: call before the retry (measured 2x warm cost on the 300-view
#: overlapped northstar). Keyed by everything that shapes the program.
_GOOD_CAPS: dict = {}


def carve_fused(masks, cameras, valid, origin, voxel_size, shape,
                caps=(8192, 32768), packed=None, hw=None, out="int8",
                slot_caps=None, fine_tiles=True, min_seen=1):
    """One-shot fused single-chip carve with automatic cap retry.

    Drop-in replacement for ops.carving_hier.carve_hierarchical (verified
    bit-identical in tests/unit/test_parallel_carve.py). Pass `packed`
    (from ops.carving_hier.pack_masks) + hw=(H, W) to skip the big mask
    upload when reusing mask sets. out="alive" pulls a device-side
    bit-packed alive mask (8x less transfer) and returns a bool volume
    (alive == int8 volume's ==1 plane, verified in the same test)."""
    if packed is None:
        masks = np.asarray(masks)
        V, H, W = masks.shape
        packed = pack_masks(masks)
    else:
        H, W = hw
    packed = jnp.asarray(packed)
    cameras = jnp.asarray(cameras)
    valid = jnp.asarray(valid)
    origin = jnp.asarray(origin, jnp.float32)
    caps = list(caps)
    slots = list(slot_caps) if slot_caps else None
    tiles_on = bool(fine_tiles)
    key = (int(packed.shape[0]), H, W, tuple(shape), out,
           tuple(caps), tuple(slots) if slots else None, tiles_on,
           min_seen)
    good = _GOOD_CAPS.get(key)
    if good is not None:
        caps, slots, tiles_on = list(good[0]), (
            list(good[1]) if good[1] else None), good[2]
    while True:
        fn = make_fused_carver(H, W, tuple(shape), caps=tuple(caps),
                               packed_output=(out == "alive"),
                               slot_caps=tuple(slots) if slots else None,
                               fine_tiles=tiles_on, min_seen=min_seen)
        vol, counts = fn(packed, cameras, valid, origin,
                         jnp.float32(voxel_size))
        counts = np.asarray(counts)
        over = int(counts[-1]) if tiles_on else 0
        body_counts = counts[:-1] if tiles_on else counts
        nl = len(body_counts) // 2 if slots else len(body_counts)
        und, smax = body_counts[:nl], body_counts[nl:]
        ok = (und <= np.asarray(caps[:nl])).all() and over == 0
        if slots is not None:
            ok = ok and all(int(s) <= k for s, k in zip(smax, slots[:nl]))
        if ok:
            _GOOD_CAPS[key] = (tuple(caps),
                               tuple(slots) if slots else None, tiles_on)
            if out == "alive":
                n = int(np.prod(shape))
                bits = np.unpackbits(np.asarray(vol))[:n]
                return bits.astype(bool).reshape(tuple(shape))
            return np.asarray(vol)
        # a level overflowed: its result is invalid — re-jit with the next
        # power-of-two cap (counts from the overflowed run are exact,
        # they're computed on the dense status volume before compaction)
        logger.info(f"carve_fused: cap overflow (undecided {und.tolist()} "
                    f"vs caps {caps[:len(und)]}, slots {smax.tolist()} vs "
                    f"{slots}, tile-over {over}) — recarving with bigger "
                    "caps")
        caps = [_next_cap(int(n)) if n > c else c
                for c, n in zip(caps, und)]
        if slots is not None:
            slots = [(-(-int(s) // 4) * 4) if int(s) > k else k
                     for k, s in zip(slots, smax)]
        if over > 0:
            # a parent's pixel window exceeded the 32x32 tile: the scene
            # projects cells wider than ~24 px — use byte gathers
            tiles_on = False


def carve_sharded_hierarchical(masks, cameras, valid, origin, voxel_size,
                               shape, mesh: Mesh, axis: str = "dp",
                               cap: int = 8192, fine_tiles=True,
                               packed=None, hw=None):
    """Convenience wrapper: pad views to the mesh axis, pack, carve.

    Uses the tile row-gather fine level by default (same bit-exact
    semantics; ~6x fewer fine-level gathers per shard) and falls back to
    the byte-gather path if a parent's pixel window overflows the 32x32
    tile guarantee (scene closer to the cameras than the fine cell
    size). Pass bit-packed masks via `packed` (V, H*W/8) + `hw`=(H, W)
    to skip the host pack (the FusedCarving ingest path) — a
    device-resident jax array is accepted and stays on device (padding
    via jnp, distribution via an explicit sharded device_put), so the
    FusedCarving 'sharded' engine never round-trips the mask stack
    through the host."""
    from jax.sharding import NamedSharding

    if packed is not None:
        H, W = hw
        dev_resident = isinstance(packed, jax.Array)
        if not dev_resident:
            packed = np.asarray(packed)
        V = packed.shape[0]
    else:
        masks = np.asarray(masks)
        V, H, W = masks.shape
        dev_resident = False
    n = mesh.shape[axis]
    pad = (-V) % n
    if packed is None:
        if pad:
            masks = np.concatenate(
                [masks, np.zeros((pad, H, W), masks.dtype)])
        packed = pack_masks(masks)
    elif pad:
        xp = jnp if dev_resident else np
        packed = xp.concatenate(
            [packed, xp.zeros((pad, packed.shape[1]), packed.dtype)])
    if pad:
        cameras = np.concatenate(
            [cameras, np.tile(cameras[-1:], (pad, 1))])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
    # explicit view-axis distribution: device-to-device (ICI) when the
    # source is already on a device, one host upload otherwise
    packed = jax.device_put(packed, NamedSharding(mesh, P(axis)))
    caps = [cap, cap]
    tiles_on = bool(fine_tiles)
    while True:
        fn = make_sharded_carver(mesh, axis, H, W, V + pad, tuple(shape),
                                 caps=tuple(caps), fine_tiles=tiles_on)
        with mesh:
            vol, counts = fn(packed, jnp.asarray(cameras),
                             jnp.asarray(valid),
                             jnp.asarray(origin, jnp.float32),
                             jnp.float32(voxel_size))
        counts = np.asarray(counts)
        over = int(counts[-1]) if tiles_on else 0
        und = counts[:-1] if tiles_on else counts
        if over > 0:
            tiles_on = False
            continue
        if (und <= np.asarray(caps[:len(und)])).all():
            return np.asarray(vol)
        caps = [_next_cap(int(c_n)) if c_n > c else c
                for c, c_n in zip(caps, und)]
