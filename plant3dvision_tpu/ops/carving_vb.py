"""View-CHUNKED fused carve: few fat kernels instead of a per-view chain.

Why (VERDICT r4 #1, docs/CARVE_CEILING.md): the fused XLA engine runs the
60-view bench carve at ~285 ms device-only vs a ~45-55 ms memory floor;
the residual is the serial dependency chain of the per-view `lax.map`
steps (hundreds of small dependent fusions), not memory traffic. Two
prior attacks failed and are documented dead ends:

- view-batched `lax.map(batch_size=...)` (round 4): vmapping the carve
  body turns its per-view `jnp.take` into BATCHED-gather ops that lower
  badly on this backend (slower, and a silent miscompile at batch 10);
- a Pallas VMEM-table kernel (round 5): Mosaic's only gathers are
  single-tile hardware shuffles — `tpu.dynamic_gather` along sublanes
  is limited to 8 rows and along lanes to 128 columns (probed on-device,
  exp_pallas_gather.py; jax lowering rule asserts these) — so no mask
  or pyramid table fits an in-kernel gather on this toolchain.

This engine takes the third route: batch views EXPLICITLY. All per-view
math becomes arrays with a leading view-chunk axis (plain elementwise
XLA ops — nothing vmapped), and every mask/pyramid lookup is a FLAT
1-D `jnp.take` with hand-computed indices into the concatenated
per-view tables — exactly the primitive the roofline measured at
349 M lookups/s (byte taps) and 64.8 M rows/s (tile rows). A carve
level is then ~10 fat ops instead of ~60 x 10 small ones. Views are
processed in chunks of `view_chunk` (a `lax.scan` when V exceeds it) so
temporaries stay O(chunk x cells) at any scan size.

Semantics are IDENTICAL to the sequential engine (same per-view
formulas, same single-tap dilated pyramids, same tile row-gather fine
level, same caps/overflow contracts); equality vs `carve_fused` is
asserted in tests/unit/test_carving_vb.py and was verified on the real
TPU (identical counts and volume). Reference semantics:
kernels/backprojection.c:57-84 via ops/carving_hier.py.

MEASURED VERDICT (v5e, 60-view bench workload, docs/CARVE_CEILING.md
dead end #8): this engine is bit-exact but SLOWER than the sequential
chain — 476 ms vs 374 ms per carve at view_chunk=64 (634 ms at 16; the
first formulation with (N, C)-layout transposes read 449 ms). Inside
one fused TPU program the per-view steps are cheap sequencer work,
while the fat batched ops materialize grid-scale intermediates. The
sequential engine stays the default everywhere; this module remains as
the A/B reference (`FusedCarving.engine="vb"`, `bench.py --engine vb`)
and as the first implementation of the `min_seen` cleanup (since ported
to the sequential engine, parallel/carving_mp.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .carving_hier import (ALIVE, KILLED, UNDECIDED, UNSEEN, _CUBE_OFFS_F,
                           _EPS_Z, _build_tile_tables,
                           _dilated_pyramids_core, _pick32, _pyramid_shapes,
                           pack_masks)
from ..runtime.log import configure_logger

logger = configure_logger(__name__)


def _classify_chunk(cells_f, cams_c, valid_c, pyr_flat, L, v0,
                    level_off, level_w, origin, s_world, H, W, n_levels):
    """Box-classify all cells against a CHUNK of views at once.

    cells_f: (M, 3) float cell coords; cams_c: (C, 16); valid_c: (C,);
    pyr_flat: (V*L,) the concatenated combined dilated pyramids; v0:
    first view id of the chunk (flat-index base).
    Returns (kill, hit, undec) each (C, M) — same per-view values as
    carving_mp._classify_local's lax.map body, computed in one shot.
    """
    C = cams_c.shape[0]
    M = cells_f.shape[0]
    corners = (origin[None, None, :]
               + (cells_f[:, None, :] + _CUBE_OFFS_F[None, :, :])
               * s_world)                                    # (M, 8, 3)

    R = cams_c[:, 4:13].reshape(C, 3, 3)
    t = cams_c[:, 13:16]
    # (C, M, 8) per camera row — avoids a (C, M, 8, 3) intermediate
    px_n = jnp.einsum("mkj,cj->cmk", corners, R[:, 0, :]) + t[:, 0, None, None]
    py_n = jnp.einsum("mkj,cj->cmk", corners, R[:, 1, :]) + t[:, 1, None, None]
    pz = jnp.einsum("mkj,cj->cmk", corners, R[:, 2, :]) + t[:, 2, None, None]
    behind = jnp.any(pz <= _EPS_Z, axis=2)                   # (C, M)
    pzs = jnp.maximum(pz, _EPS_Z)
    px = px_n / pzs * cams_c[:, 0, None, None] + cams_c[:, 2, None, None]
    py = py_n / pzs * cams_c[:, 1, None, None] + cams_c[:, 3, None, None]
    pxmin = jnp.min(px, axis=2); pxmax = jnp.max(px, axis=2)
    pymin = jnp.min(py, axis=2); pymax = jnp.max(py, axis=2)

    out = ((pxmax <= -1.0) | (pxmin >= W) | (pymax <= -1.0)
           | (pymin >= H)) & ~behind
    fin = ((pxmin >= 0.0) & (pxmax < W) & (pymin >= 0.0)
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

    # the ONE flat tap per (cell, view): single-tap dilated pyramid
    # (bit0 = window max, bit1 = window min; ops/carving_hier.py)
    vbase = (v0 + jnp.arange(C, dtype=jnp.int32)) * L        # (C,)
    tap = vbase[:, None] + offl + cy0 * wl + cx0             # (C, M)
    c = jnp.take(pyr_flat, tap.reshape(-1)).reshape(C, M)

    kill = fin & ((c & 1) == 0) & valid_c[:, None]
    hit = fin & (c >= 2) & valid_c[:, None]
    no_eff = out | ~valid_c[:, None]
    undec = ~kill & ~hit & ~no_eff
    return kill, hit, undec


def _exact_tiles_chunk(pts_p, cams_c, valid_c, tiles_flat, Rrows, v0,
                       Ht, Wt, H, W):
    """Tile row-gather fine level for a chunk of views at once.

    pts_p: (P, f3, 3) voxel centers grouped by parent; tiles_flat:
    (V*Ht*Wt, 32) i32; returns (kill, hit) each (C, P*f3) and overflow
    (C,) int32 — identical per-view values to
    carving_mp._exact_tiles's map body."""
    C = cams_c.shape[0]
    P_, f3 = pts_p.shape[0], pts_p.shape[1]
    pts = pts_p.reshape(P_ * f3, 3)

    R = cams_c[:, 4:13].reshape(C, 3, 3)
    t = cams_c[:, 13:16]
    # chunk-major (C, N) layout end to end — a (N, C) formulation needs
    # 250 MB transposes at bench scale, which do not fuse
    px_n = jnp.einsum("cj,nj->cn", R[:, 0, :], pts) + t[:, 0][:, None]
    py_n = jnp.einsum("cj,nj->cn", R[:, 1, :], pts) + t[:, 1][:, None]
    pz = jnp.einsum("cj,nj->cn", R[:, 2, :], pts) + t[:, 2][:, None]
    px = (px_n / pz * cams_c[:, 0][:, None]
          + cams_c[:, 2][:, None]).astype(jnp.int32)         # (C, N)
    py = (py_n / pz * cams_c[:, 1][:, None]
          + cams_c[:, 3][:, None]).astype(jnp.int32)
    in_img = ((pz > 0) & (px >= 0) & (px <= W - 1)
              & (py >= 0) & (py <= H - 1))
    in_img = in_img & valid_c[:, None]

    cx = jnp.clip(px, 0, W - 1).reshape(C, P_, f3)
    cy = jnp.clip(py, 0, H - 1).reshape(C, P_, f3)
    x0 = cx.min(axis=2)
    y0 = cy.min(axis=2)
    over = (((cx.max(axis=2) - x0 > 24) | (cy.max(axis=2) - y0 > 24))
            & in_img.reshape(C, P_, f3).any(axis=2))         # (C, P)
    tx = jnp.right_shift(x0, 3)
    ty = jnp.right_shift(y0, 3)
    vbase = (v0 + jnp.arange(C, dtype=jnp.int32)) * (Ht * Wt)
    rows = vbase[:, None] + ty * Wt + tx                     # (C, P)
    T = jnp.take(tiles_flat, rows.reshape(-1), axis=0)       # (C*P, 32)
    dy = jnp.clip(cy - ty[:, :, None] * 8, 0, 31).reshape(C * P_, f3)
    dx = jnp.clip(cx - tx[:, :, None] * 8, 0, 31).reshape(C * P_, f3)
    word = _pick32(T, dy)                                    # (C*P, f3)
    m = ((word >> dx) & 1) != 0
    m = m.reshape(C, P_ * f3)
    in_img = in_img.reshape(C, P_ * f3)
    return in_img & ~m, in_img & m, jnp.sum(over, axis=1, dtype=jnp.int32)


def _make_carve_body_vb(H, W, shape, start_level, pyramid_levels, caps,
                        view_chunk=64, packed_output=False, min_seen=1):
    """The view-chunked fused carve body (same level plan / cap contract
    as carving_mp._make_carve_body; counts = [undecided per level...,
    tile-window overflow])."""
    m = 1 << start_level
    grid0 = (-(-shape[0] // m), -(-shape[1] // m), -(-shape[2] // m))
    n_levels = pyramid_levels
    nx, ny, nz = shape

    f = m
    plan = []
    while f > 4:
        plan.append((2, f // 2))
        f //= 2
    if f > 1:
        plan.append((f, 1))
    assert len(caps) >= len(plan)

    def body(packed_l, cams_l, valid_l, origin_in, vs_in):
        vs = jnp.float32(vs_in)
        origin_j = jnp.asarray(origin_in, jnp.float32)
        V = packed_l.shape[0]
        C = min(view_chunk, V)
        G = -(-V // C)
        Vp = G * C
        # pad the VIEW axis so chunks are equal (valid=False rows kill
        # nothing: every test is masked by valid)
        cams_p = jnp.pad(cams_l, ((0, Vp - V), (0, 0)))
        valid_p = jnp.pad(valid_l, (0, Vp - V))

        pyr = _dilated_pyramids_core(packed_l, H, W, n_levels)
        L = pyr.shape[1]
        pyr_flat = jnp.pad(pyr, ((0, Vp - V), (0, 0))).reshape(-1)
        tiles, Ht, Wt = _build_tile_tables(packed_l, H, W)
        Rrows = Ht * Wt
        tiles_flat = jnp.pad(tiles.reshape(V, Rrows, 32),
                             ((0, Vp - V), (0, 0), (0, 0))).reshape(-1, 32)
        _, _, _, level_off, level_w = _pyramid_shapes(H, W, n_levels)
        level_off = jnp.asarray(level_off)
        level_w = jnp.asarray(level_w)

        cams_g = cams_p.reshape(G, C, 16)
        valid_g = valid_p.reshape(G, C)
        v0_g = jnp.arange(G, dtype=jnp.int32) * C

        def classify_all(cells_f, s_world, cand=None):
            """(kill_any (M,), hit_any (M,), undec (Vp, M)) over chunks.
            `cand` (Vp, M) masks per-view results (the refinement levels
            only test a child against views straddling its parent — the
            dense engine's `& cand_c`); None = no mask (top level)."""
            M = cells_f.shape[0]
            cand_g = (None if cand is None
                      else cand.reshape(G, C, M))

            def one(cams_c, valid_c, v0, cand_c):
                k, h, u = _classify_chunk(
                    cells_f, cams_c, valid_c, pyr_flat, L, v0,
                    level_off, level_w, origin_j, s_world, H, W, n_levels)
                if cand_c is not None:
                    k = k & cand_c
                    h = h & cand_c
                    u = u & cand_c
                return k, h, u

            if G == 1:
                k, h, u = one(cams_g[0], valid_g[0], jnp.int32(0),
                              None if cand_g is None else cand_g[0])
                return (jnp.any(k, 0), jnp.any(h, 0), u,
                        jnp.sum(h, 0, dtype=jnp.int32))

            def step(carry, xs):
                ka, ha, hn = carry
                if cand_g is None:
                    cams_c, valid_c, v0 = xs
                    cand_c = None
                else:
                    cams_c, valid_c, v0, cand_c = xs
                k, h, u = one(cams_c, valid_c, v0, cand_c)
                return (ka | jnp.any(k, 0), ha | jnp.any(h, 0),
                        hn + jnp.sum(h, 0, dtype=jnp.int32)), u

            xs = ((cams_g, valid_g, v0_g) if cand_g is None
                  else (cams_g, valid_g, v0_g, cand_g))
            (ka, ha, hn), us = jax.lax.scan(
                step, (jnp.zeros(M, bool), jnp.zeros(M, bool),
                       jnp.zeros(M, jnp.int32)), xs)
            return ka, ha, us.reshape(Vp, M), hn

        def exact_all(pts_p, cand):
            """(kill_any, hit_any (P*f3,), overflow int32); cand (Vp, P)."""
            P_, f3 = pts_p.shape[0], pts_p.shape[1]
            cand_g = cand.reshape(G, C, P_)

            def step(carry, xs):
                ka, ha, ov, hn = carry
                cams_c, valid_c, v0, cand_c = xs
                k, h, o = _exact_tiles_chunk(
                    pts_p, cams_c, valid_c, tiles_flat, Rrows, v0,
                    Ht, Wt, H, W)
                cc = jnp.repeat(cand_c, f3, axis=1)
                hm = h & cc
                return (ka | jnp.any(k & cc, 0), ha | jnp.any(hm, 0),
                        ov + jnp.sum(o),
                        hn + jnp.sum(hm, 0, dtype=jnp.int32)), None

            init = (jnp.zeros(P_ * f3, bool), jnp.zeros(P_ * f3, bool),
                    jnp.int32(0), jnp.zeros(P_ * f3, jnp.int32))
            if G == 1:
                k, h, o = _exact_tiles_chunk(
                    pts_p, cams_g[0], valid_g[0], tiles_flat, Rrows,
                    jnp.int32(0), Ht, Wt, H, W)
                cc = jnp.repeat(cand_g[0], f3, axis=1)
                hm = h & cc
                return (jnp.any(k & cc, 0), jnp.any(hm, 0), jnp.sum(o),
                        jnp.sum(hm, 0, dtype=jnp.int32))
            (ka, ha, ov, hn), _ = jax.lax.scan(
                step, init, (cams_g, valid_g, v0_g, cand_g))
            return ka, ha, ov, hn

        # ---- top level ------------------------------------------------
        gx, gy, gz = grid0
        ii = jax.lax.broadcasted_iota(jnp.int32, grid0, 0).reshape(-1)
        jj = jax.lax.broadcasted_iota(jnp.int32, grid0, 1).reshape(-1)
        kk = jax.lax.broadcasted_iota(jnp.int32, grid0, 2).reshape(-1)
        cells_f = jnp.stack([ii, jj, kk], axis=1).astype(jnp.float32)
        ak, ah, undec, seen_n = classify_all(cells_f, vs * m)
        any_und = jnp.any(undec, axis=0)
        status = jnp.where(
            ak, jnp.int8(KILLED),
            jnp.where(any_und, jnp.int8(UNDECIDED),
                      jnp.where(ah, jnp.int8(ALIVE), jnp.int8(UNSEEN))))
        hit_carry = ah
        local_undec = undec
        seen_count = jnp.minimum(seen_n, 255).astype(jnp.uint8)

        # ---- refinement ----------------------------------------------
        counts = []
        overflow = jnp.int32(0)
        for li, (factor, cell_vox) in enumerate(plan):
            cap = caps[li]
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
            cand = local_undec[:, pidx_safe] & pvalid[None, :]   # (Vp, cap)
            hit_inherit = jnp.repeat(hit_carry[pidx_safe] & pvalid, f3)

            if cell_vox > 1:
                cand_c = jnp.repeat(cand, f3, axis=1)        # (Vp, cap*f3)
                loc_kill, loc_hit, undc, hn = classify_all(
                    children, vs * cell_vox, cand=cand_c)
                loc_und = jnp.any(undc, axis=0)
            else:
                pts_p = (origin_j[None, None, :]
                         + children.reshape(cap, f3, 3) * vs)
                loc_kill, loc_hit, over_v, hn = exact_all(pts_p, cand)
                overflow = overflow + over_v
                loc_und = jnp.zeros_like(loc_kill)
                undc = None
            # seen count: parent's fully-covering views were counted at
            # the parent (a refining parent is never killed and a
            # view either hits it there, is out/invalid, or straddles —
            # straddlers are exactly the cand set evaluated here)
            count_c = (jnp.repeat(seen_count[pidx_safe].astype(jnp.int32)
                                  * pvalid.astype(jnp.int32), f3) + hn)

            any_kill_c = loc_kill
            any_hit_c = loc_hit | hit_inherit
            any_und_c = loc_und
            status_c = jnp.where(
                any_kill_c, jnp.int8(KILLED),
                jnp.where(any_und_c, jnp.int8(UNDECIDED),
                          jnp.where(any_hit_c, jnp.int8(ALIVE),
                                    jnp.int8(UNSEEN))))
            status_c = jnp.where(child_valid, status_c, jnp.int8(KILLED))

            nxt = jnp.repeat(jnp.repeat(jnp.repeat(
                status.reshape(gx, gy, gz),
                factor, axis=0), factor, axis=1), factor, axis=2)
            gx, gy, gz = gx * factor, gy * factor, gz * factor
            lin = (children[:, 0].astype(jnp.int32) * (gy * gz)
                   + children[:, 1].astype(jnp.int32) * gz
                   + children[:, 2].astype(jnp.int32))
            nxt = nxt.reshape(-1)
            safe_lin = jnp.where(child_valid, lin, nxt.size)
            status = nxt.at[safe_lin].set(status_c, mode="drop")
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
                lu = jnp.zeros((Vp, nxt.size), bool)
                local_undec = lu.at[:, safe_lin].max(undc, mode="drop")
                hc = jnp.zeros(nxt.size, bool)
                hit_carry = hc.at[safe_lin].max(any_hit_c, mode="drop")

        counts = counts + [overflow]
        vol = status.reshape(gx, gy, gz)[:nx, :ny, :nz]
        if min_seen > 1:
            # opt-in cleanup (VERDICT r4 #3): an ALIVE voxel seen by
            # fewer than `min_seen` views is background fuzz (isolated
            # mask-noise rays); demote to UNSEEN. ALIVE cells decided at
            # coarse levels have complete counts: a cell with any
            # straddling view is UNDECIDED, so ALIVE implies every view
            # either fully covered it (counted) or had no effect.
            cnt = seen_count.reshape(gx, gy, gz)[:nx, :ny, :nz]
            vol = jnp.where((vol == ALIVE) & (cnt < min_seen),
                            jnp.int8(UNSEEN), vol)
        if packed_output:
            alive = (vol == ALIVE).reshape(-1)
            pad = (-alive.shape[0]) % 8
            alive = jnp.pad(alive, (0, pad))
            weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
            packed_out = (alive.reshape(-1, 8).astype(jnp.uint8)
                          * weights[None, :]).sum(axis=1).astype(jnp.uint8)
            return packed_out, jnp.stack(counts)
        return vol, jnp.stack(counts)

    return body


@functools.lru_cache(maxsize=32)
def make_vb_carver(H, W, shape, start_level=3, pyramid_levels=8,
                   caps=(8192, 32768), view_chunk=64, packed_output=False,
                   min_seen=1):
    """Jitted view-chunked carver for a fixed geometry (lru-cached).
    `min_seen` > 1 demotes ALIVE voxels seen by fewer views to UNSEEN
    (opt-in background-fuzz cleanup; validated vs a per-view counting
    oracle in tests/unit/test_carving_vb.py)."""
    body = _make_carve_body_vb(H, W, tuple(shape), start_level,
                               pyramid_levels, tuple(caps),
                               view_chunk=view_chunk,
                               packed_output=packed_output,
                               min_seen=min_seen)
    return jax.jit(body)


_GOOD_CAPS: dict = {}


def carve_fused_vb(masks, cameras, valid, origin, voxel_size, shape,
                   caps=(8192, 32768), packed=None, hw=None, out="int8",
                   view_chunk=64, min_seen=1):
    """One-shot view-chunked carve with automatic cap retry; API mirror
    of parallel.carving_mp.carve_fused (bit-equality asserted in
    tests/unit/test_carving_vb.py). A fine tile-window overflow falls
    back to the sequential engine (same geometry contract)."""
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
    key = (int(packed.shape[0]), H, W, tuple(shape), out, tuple(caps),
           view_chunk, min_seen)
    good = _GOOD_CAPS.get(key)
    if good is not None:
        caps = list(good)
    while True:
        fn = make_vb_carver(H, W, tuple(shape), caps=tuple(caps),
                            view_chunk=view_chunk,
                            packed_output=(out == "alive"),
                            min_seen=min_seen)
        vol, counts = fn(packed, cameras, valid, origin,
                         jnp.float32(voxel_size))
        counts = np.asarray(counts)
        over = int(counts[-1])
        und = counts[:-1]
        if over > 0:
            logger.warning("carve_fused_vb: fine tile-window overflow "
                           f"({over}) — falling back to the sequential "
                           "engine")
            from ..parallel.carving_mp import carve_fused
            return carve_fused(masks, cameras, valid, origin, voxel_size,
                               shape, packed=packed, hw=(H, W), out=out,
                               fine_tiles=False, min_seen=min_seen)
        if (und <= np.asarray(caps[:len(und)])).all():
            _GOOD_CAPS[key] = tuple(caps)
            if out == "alive":
                n = int(np.prod(shape))
                bits = np.unpackbits(np.asarray(vol))[:n]
                return bits.astype(bool).reshape(tuple(shape))
            return np.asarray(vol)
        logger.info(f"carve_fused_vb: cap overflow (undecided "
                    f"{und.tolist()} vs {caps[:len(und)]}) — recarving")
        nc = []
        for c, n in zip(caps, und):
            b = 4096
            while b < int(n):
                b <<= 1
            nc.append(max(c, b))
        caps = nc
