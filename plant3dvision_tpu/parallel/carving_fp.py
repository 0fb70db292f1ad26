"""Fused pair-compacted hierarchical carve (single program, no host syncs).

Combines the two existing engines' strengths:

- parallel/carving_mp.py fuses the whole level loop into ONE jitted
  program, but evaluates every refinement level densely over ALL views —
  at the final (exact, 1-voxel) level that is |children| x V gathers even
  though only the parent's 2-6 straddling views can change a child's
  status (60 views => ~94% of the gathers are provably no-ops);
- ops/carving_pv.py evaluates only the (parent, view) STRADDLE PAIRS,
  but sizes its compaction buffers with per-level host round-trips.

Here the pair compaction runs with STATIC caps inside the fused program:
top dense level + a factor-2 refinement cascade of carving_pv's
_refine_pairs, returning per-level cell/pair counts so callers can
verify caps (and re-jit bigger on overflow, same retry contract as
carve_fused). Bit-identical to the dense carve (the pair engine is
verified bit-exact in tests/unit/test_carving_hier.py; this wrapper is
covered by tests/unit/test_parallel_carve.py).

Role of the reference's hot loop kernels/backprojection.c:57-84 +
cl.py:190-227 (one kernel launch per view over prod(shape) ids).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.carving_hier import (ALIVE, UNDECIDED, _pyramid_shapes,
                                build_pyramids_dilated, pack_masks)
from ..ops.carving_pv import _CHUNK, _pair_count, _refine_pairs, _top_dense


def _plan(start_level: int):
    """Factor-2 cascade: cell sizes m/2, m/4, ..., 1."""
    m = 1 << start_level
    return [(2, m >> (i + 1)) for i in range(start_level)]


@functools.lru_cache(maxsize=64)
def make_fused_pair_carver(H: int, W: int, shape, start_level: int = 4,
                           pyramid_levels: int = 8, cell_caps=None,
                           pair_caps=None, packed_output=False,
                           n_words: int = 2, chunk: int = 65536):
    """Build the jitted fused pair-compacted carver for a fixed geometry.

    Returns fn(packed (V, B), cams (V, 16), valid (V,), origin (3,),
    voxel_size) -> (volume int8 | packed alive u8, cell_counts (L,),
    pair_counts (L,)). Results are valid only when every
    cell_counts[i] <= cell_caps[i] AND pair_counts[i] <= pair_caps[i].
    """
    plan = _plan(start_level)
    L = len(plan)
    if cell_caps is None:
        cell_caps = tuple(4096 << (2 * i) for i in range(L))
    if pair_caps is None:
        pair_caps = tuple(8 * c for c in cell_caps)
    pair_caps = tuple(-(-c // chunk) * chunk for c in pair_caps)
    assert len(cell_caps) == L and len(pair_caps) == L
    m = 1 << start_level
    nx, ny, nz = shape
    grid = (-(-nx // m), -(-ny // m), -(-nz // m))
    n_levels = pyramid_levels

    def body(packed, cams, valid, origin_in, vs_in):
        V = cams.shape[0]
        vs = jnp.float32(vs_in)
        origin_j = jnp.asarray(origin_in, jnp.float32)
        pyr, level_off, level_w, _, _ = build_pyramids_dilated(
            (V, H, W), n_levels, packed=packed)
        status, bits, hit = _top_dense(
            cams, valid, pyr, level_off, level_w, origin_j, vs,
            grid, m, H, W, n_levels, n_words)

        cell_counts, pair_counts = [], []
        for li, (factor, cell_vox) in enumerate(plan):
            undec = status.reshape(-1) == UNDECIDED
            cell_counts.append(jnp.sum(undec, dtype=jnp.int32))
            pair_counts.append(_pair_count(bits, undec).astype(jnp.int32))
            status, bits, hit = _refine_pairs(
                status, bits, hit, cams, valid, pyr, packed,
                level_off, level_w, origin_j, vs, cell_caps[li],
                pair_caps[li], factor, cell_vox, H, W, n_levels,
                n_words, V, chunk=min(chunk, pair_caps[li]))

        vol = status[:nx, :ny, :nz]
        counts = (jnp.stack(cell_counts), jnp.stack(pair_counts))
        if packed_output:
            alive = (vol == ALIVE).reshape(-1)
            pad = (-alive.shape[0]) % 8
            alive = jnp.pad(alive, (0, pad))
            weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
            out = (alive.reshape(-1, 8).astype(jnp.uint8)
                   * weights[None, :]).sum(axis=1).astype(jnp.uint8)
            return out, *counts
        return vol, *counts

    return jax.jit(body)


def _next_cap(n: int, base: int = 4096) -> int:
    b = base
    while b < n:
        b <<= 1
    return b


def carve_fused_pairs(masks, cameras, valid, origin, voxel_size, shape,
                      start_level: int = 4, packed=None, hw=None,
                      out="int8", cell_caps=None, pair_caps=None,
                      chunk: int = 65536):
    """One-shot fused pair-compacted carve with automatic cap retry.

    Drop-in for carving_mp.carve_fused (same bit-exact semantics)."""
    if packed is None:
        masks = np.asarray(masks)
        V, H, W = masks.shape
        packed = pack_masks(masks)
    else:
        H, W = hw
        V = np.asarray(cameras).shape[0]
    packed = jnp.asarray(packed)
    cameras = jnp.asarray(cameras)
    valid_j = jnp.asarray(valid)
    origin_j = jnp.asarray(origin, jnp.float32)
    n_words = -(-V // 32)
    plan = _plan(start_level)
    L = len(plan)
    cell_caps = list(cell_caps or (4096 << (2 * i) for i in range(L)))
    pair_caps = list(pair_caps or (8 * c for c in cell_caps))
    while True:
        fn = make_fused_pair_carver(
            H, W, tuple(shape), start_level=start_level,
            cell_caps=tuple(cell_caps), pair_caps=tuple(pair_caps),
            packed_output=(out == "alive"), n_words=n_words, chunk=chunk)
        vol, ccnt, pcnt = fn(packed, cameras, valid_j, origin_j,
                             jnp.float32(voxel_size))
        ccnt = np.asarray(ccnt)
        pcnt = np.asarray(pcnt)
        if ((ccnt <= np.asarray(cell_caps)).all()
                and (pcnt <= np.asarray(pair_caps)).all()):
            if out == "alive":
                n = int(np.prod(shape))
                bits = np.unpackbits(np.asarray(vol))[:n]
                return bits.astype(bool).reshape(tuple(shape))
            return np.asarray(vol)
        cell_caps = [_next_cap(int(n)) if n > c else c
                     for c, n in zip(cell_caps, ccnt)]
        pair_caps = [_next_cap(int(n), base=chunk) if n > c else c
                     for c, n in zip(pair_caps, pcnt)]
