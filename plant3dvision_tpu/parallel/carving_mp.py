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
                                _CUBE_OFFS_F, _EPS_Z, _pyramid_shapes,
                                pack_masks, unpack_masks_device)
from ..ops.carving_pv import _box_cover


def _build_local_pyramids(packed, H, W, n_levels):
    V = packed.shape[0]
    Hp, Wp, level_shapes, _, _ = _pyramid_shapes(H, W, n_levels)
    base = unpack_masks_device(packed, H, W)
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
    return jnp.concatenate(outs_max, axis=1), jnp.concatenate(outs_min, axis=1)


def _classify_local(cells_f, cams, valid, pmax, pmin, level_off, level_w,
                    origin, s_world, H, W, n_levels):
    """(kill, hit, undec) over (V_local, M) for float cell coords."""
    corners = (origin[None, None, :]
               + (cells_f[:, None, :] + _CUBE_OFFS_F[None, :, :]) * s_world)

    def one_view(cam, pmax_v, pmin_v):
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
        i00, i01, i10, i11 = _box_cover(pxmin, pxmax, pymin, pymax, H, W,
                                        n_levels, level_off, level_w)
        vmax = jnp.maximum(jnp.maximum(jnp.take(pmax_v, i00),
                                       jnp.take(pmax_v, i01)),
                           jnp.maximum(jnp.take(pmax_v, i10),
                                       jnp.take(pmax_v, i11)))
        vmin = jnp.minimum(jnp.minimum(jnp.take(pmin_v, i00),
                                       jnp.take(pmin_v, i01)),
                           jnp.minimum(jnp.take(pmin_v, i10),
                                       jnp.take(pmin_v, i11)))
        return fin & (vmax == 0), fin & (vmin > 0), out

    # lax.map (not vmap): per-view temporaries are O(M) — a vmap over
    # hundreds of views materializes (V, M, 8, 3) floats and OOMs at
    # north-star scale (300 views x 4M fine-pass points = 14 GB)
    kill, hit, out = jax.lax.map(
        lambda xs: one_view(*xs), (cams, pmax, pmin))
    kill = kill & valid[:, None]
    hit = hit & valid[:, None]
    no_eff = out | ~valid[:, None]
    undec = ~kill & ~hit & ~no_eff
    return kill, hit, undec


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
                     packed_output=False):
    """The fused hierarchical carve: top level + all refinements in ONE
    traced program with static per-level caps. Returns (volume int8,
    undecided counts per level int32) — callers MUST check counts <= caps
    (the result is invalid otherwise; wrappers re-jit with bigger caps).
    `axis=None` runs unsharded (single chip); otherwise collectives join
    per-level statuses across the view shard. Pass pmax/pmin to reuse
    device-resident pyramids across carves (skips the in-program build);
    origin and voxel_size are runtime arguments, so one compiled program
    serves any grid placement of the same `shape`."""
    m = 1 << start_level
    grid = (-(-shape[0] // m), -(-shape[1] // m), -(-shape[2] // m))
    n_levels = pyramid_levels
    nx, ny, nz = shape

    plan = [(2, m // 2)]
    if m // 2 > 1:
        plan.append((m // 2, 1))
    assert len(caps) >= len(plan), "one cap per refinement level"

    def body(packed_l, cams_l, valid_l, origin_in, vs_in,
             pmax_l=None, pmin_l=None):
        vs = jnp.float32(vs_in)
        if pmax_l is None:
            pmax_l, pmin_l = _build_local_pyramids(packed_l, H, W, n_levels)
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
            cells_f, cams_l, valid_l, pmax_l, pmin_l, level_off, level_w,
            origin_j, vs * m, H, W, n_levels)
        any_kill = _gor(jnp.any(kill, axis=0), axis)
        hit_carry = _gor(jnp.any(hit, axis=0), axis)        # dense (M,)
        any_und = _gor(jnp.any(undec, axis=0), axis)
        status = jnp.where(
            any_kill, jnp.int8(KILLED),
            jnp.where(any_und, jnp.int8(UNDECIDED),
                      jnp.where(hit_carry, jnp.int8(ALIVE),
                                jnp.int8(UNSEEN))))
        local_undec = undec                                  # (V_l, M)
        status = status.reshape(-1)

        # ---- refinement -------------------------------------------------
        counts = []
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
            cand = local_undec[:, pidx_safe] & pvalid[None, :]
            cand_c = jnp.repeat(cand, f3, axis=1)            # (V_l, cap*f3)
            hit_inherit = jnp.repeat(hit_carry[pidx_safe] & pvalid, f3)

            if cell_vox > 1:
                killc, hitc, undc = _classify_local(
                    children, cams_l, valid_l, pmax_l, pmin_l, level_off,
                    level_w, origin_j, vs * cell_vox, H, W, n_levels)
                undc = undc & cand_c
            else:
                pts = origin_j[None, :] + children * vs
                killc, hitc = _exact_local(pts, cams_l, valid_l, packed_l,
                                           H, W)
                undc = jnp.zeros_like(killc)
            killc = killc & cand_c
            hitc = hitc & cand_c

            any_kill_c = _gor(jnp.any(killc, axis=0), axis)
            any_hit_c = _gor(jnp.any(hitc, axis=0), axis) | hit_inherit
            any_und_c = _gor(jnp.any(undc, axis=0), axis)
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

            if cell_vox > 1:
                # carry dense straddle matrix + hit flags to the next level
                lu = jnp.zeros((packed_l.shape[0], nxt.size), bool)
                local_undec = lu.at[:, safe_lin].max(undc, mode="drop")
                hc = jnp.zeros(nxt.size, bool)
                hit_carry = hc.at[safe_lin].max(any_hit_c, mode="drop")

        vol = status.reshape(gx, gy, gz)[:nx, :ny, :nz]
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
                        cap: int = 8192, caps=None):
    """Builds a jitted SPMD carve for a fixed geometry.

    Returns fn(packed (V, B) view-sharded, cams (V, 16), valid (V,),
    origin (3,), voxel_size) -> (replicated int8 volume of `shape`,
    per-level undecided counts). `caps` bounds undecided cells per
    refinement level (static); check counts <= caps or use
    carve_sharded_hierarchical, which retries."""
    from jax import shard_map

    n_shards = mesh.shape[axis]
    assert V_total % n_shards == 0, "pad views to a multiple of the mesh axis"
    if caps is None:
        caps = (cap, cap)
    body = _make_carve_body(axis, H, W, tuple(shape),
                            start_level, pyramid_levels, tuple(caps))
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(), P()),
                   out_specs=(P(), P()))
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def make_fused_carver(H: int, W: int, shape,
                      start_level: int = 3, pyramid_levels: int = 8,
                      caps=(8192, 32768), packed_output=False):
    """Single-chip FUSED hierarchical carve: the whole level loop is one
    jitted program (no host syncs between levels — the round-1 carver,
    ops/carving_hier.py:310-342, pays one dispatch + one scalar pull per
    level). Same bit-exact semantics; same body as the sharded carver.

    Returns fn(packed (V, B), cams (V, 16), valid (V,), origin (3,),
    voxel_size[, pmax, pmin]) -> (volume int8, per-level undecided
    counts). Check counts <= caps. lru-cached per geometry so repeated
    carves reuse the compiled program."""
    body = _make_carve_body(None, H, W, tuple(shape),
                            start_level, pyramid_levels, tuple(caps),
                            packed_output=packed_output)
    return jax.jit(body)


def carve_fused(masks, cameras, valid, origin, voxel_size, shape,
                caps=(8192, 32768), packed=None, hw=None, out="int8"):
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
    while True:
        fn = make_fused_carver(H, W, tuple(shape), caps=tuple(caps),
                               packed_output=(out == "alive"))
        vol, counts = fn(packed, cameras, valid, origin,
                         jnp.float32(voxel_size))
        counts = np.asarray(counts)
        if (counts <= np.asarray(caps[:len(counts)])).all():
            if out == "alive":
                n = int(np.prod(shape))
                bits = np.unpackbits(np.asarray(vol))[:n]
                return bits.astype(bool).reshape(tuple(shape))
            return np.asarray(vol)
        # a level overflowed: its result is invalid — re-jit with the next
        # power-of-two cap (counts from the overflowed run are exact,
        # they're computed on the dense status volume before compaction)
        caps = [_next_cap(int(n)) if n > c else c
                for c, n in zip(caps, counts)]


def carve_sharded_hierarchical(masks, cameras, valid, origin, voxel_size,
                               shape, mesh: Mesh, axis: str = "dp",
                               cap: int = 8192):
    """Convenience wrapper: pad views to the mesh axis, pack, carve."""
    masks = np.asarray(masks)
    V, H, W = masks.shape
    n = mesh.shape[axis]
    pad = (-V) % n
    if pad:
        masks = np.concatenate([masks, np.zeros((pad, H, W), masks.dtype)])
        cameras = np.concatenate(
            [cameras, np.tile(cameras[-1:], (pad, 1))])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
    packed = pack_masks(masks)
    caps = [cap, cap]
    while True:
        fn = make_sharded_carver(mesh, axis, H, W, len(masks), tuple(shape),
                                 caps=tuple(caps))
        with mesh:
            vol, counts = fn(jnp.asarray(packed), jnp.asarray(cameras),
                             jnp.asarray(valid),
                             jnp.asarray(origin, jnp.float32),
                             jnp.float32(voxel_size))
        counts = np.asarray(counts)
        if (counts <= np.asarray(caps[:len(counts)])).all():
            return np.asarray(vol)
        caps = [_next_cap(int(n)) if n > c else c
                for c, n in zip(caps, counts)]
