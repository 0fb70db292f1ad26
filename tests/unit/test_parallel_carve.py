"""Multi-chip (view-sharded) hierarchical carve: bit-identical to the
single-device dense carve on a virtual device mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from plant3dvision_tpu.ops.carving import carve
from plant3dvision_tpu.parallel.carving_mp import carve_sharded_hierarchical
from plant3dvision_tpu.parallel.mesh import make_mesh

from .test_ops import _synthetic_views


def _dense(masks, cams, valid, origin, vs, shape):
    return np.asarray(carve(jnp.asarray(masks), jnp.asarray(cams),
                            jnp.asarray(valid), origin, vs, shape))


def test_sharded_hier_matches_dense_4dev():
    mesh = make_mesh({"dp": 4})
    masks, cams = _synthetic_views(n_views=12, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    valid = np.ones(12, bool)
    origin = np.array([-20.0, -20.0, -20.0], np.float32)
    shape = (40, 40, 40)
    d = _dense(masks, cams, valid, origin, 1.0, shape)
    h = carve_sharded_hierarchical(masks, cams, valid, origin, 1.0, shape,
                                   mesh)
    np.testing.assert_array_equal(d, h)


def test_average_grid_sharded_matches_dense_8dev():
    """X-slab-sharded AVERAGING (the ML Voxels hot op, the float grid
    that OOMs first at fine voxels) matches the dense engine: slabs are
    disjoint, every slab sums views in the same order and indexes voxels
    globally — the residual is XLA's per-program FMA-fusion noise
    (~1e-6 relative), not a reduction reorder."""
    from plant3dvision_tpu.ops.carving import average
    from plant3dvision_tpu.parallel.carving import average_grid_sharded

    mesh = make_mesh({"dp": 8})
    masks, cams = _synthetic_views(n_views=10, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    soft = masks.astype(np.float32) / 255.0 * 0.9 + 0.05  # soft-mask path
    valid = np.ones(10, bool)
    valid[-1] = False                                     # honors valid
    origin = np.array([-20.0, -20.0, -20.0], np.float32)
    shape = (40, 40, 40)
    d = np.asarray(average(jnp.asarray(soft), jnp.asarray(cams),
                           jnp.asarray(valid), origin, 1.0, shape))
    s = np.asarray(average_grid_sharded(soft, cams, valid, origin, 1.0,
                                        shape, mesh))
    np.testing.assert_allclose(d, s, rtol=3e-6, atol=1e-5)


def test_carve_2d_sharded_matches_dense():
    """2D-mesh carve (views x grid slabs) is bit-identical to the dense
    engine on both 2x4 and 4x2 meshes: global voxel indexing per slab +
    pmax OR-join over the view axis only."""
    from plant3dvision_tpu.parallel.carving import carve_2d_sharded

    masks, cams = _synthetic_views(n_views=12, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    valid = np.ones(12, bool)
    valid[3] = False                                     # honors valid
    origin = np.array([-20.0, -20.0, -20.0], np.float32)
    shape = (40, 40, 40)
    d = _dense(masks, cams, valid, origin, 1.0, shape)
    for vp, gp in ((2, 4), (4, 2)):
        mesh = make_mesh({"vp": vp, "gp": gp})
        s = np.asarray(carve_2d_sharded(masks, cams, valid, origin, 1.0,
                                        shape, mesh))
        np.testing.assert_array_equal(d, s)


def test_fused_single_chip_matches_dense():
    """The fused (one-jit, no host syncs) single-chip carve is bit-exact."""
    from plant3dvision_tpu.parallel.carving_mp import carve_fused
    masks, cams = _synthetic_views(n_views=12, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    valid = np.ones(12, bool)
    origin = np.array([-20.0, -20.0, -20.0], np.float32)
    shape = (40, 40, 40)
    d = _dense(masks, cams, valid, origin, 1.0, shape)
    f = carve_fused(masks, cams, valid, origin, 1.0, shape)
    np.testing.assert_array_equal(d, f)


def test_fused_cap_overflow_retries():
    """Deliberately tiny static caps: the wrapper must detect the
    overflow from the in-program counts and re-jit with bigger caps —
    never return a silently truncated volume."""
    from plant3dvision_tpu.parallel.carving_mp import carve_fused
    masks, cams = _synthetic_views(n_views=12, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    valid = np.ones(12, bool)
    origin = np.array([-20.0, -20.0, -20.0], np.float32)
    shape = (40, 40, 40)
    d = _dense(masks, cams, valid, origin, 1.0, shape)
    f = carve_fused(masks, cams, valid, origin, 1.0, shape, caps=(4, 4))
    np.testing.assert_array_equal(d, f)


def test_sharded_hier_view_padding_8dev():
    """Views not divisible by the mesh axis get padded with valid=False."""
    mesh = make_mesh({"dp": 8})
    masks, cams = _synthetic_views(n_views=10, H=96, W=160, radius=5.0,
                                   dist_cam=30.0)
    valid = np.ones(10, bool)
    origin = np.array([-9.0, -7.0, -25.0], np.float32)
    shape = (37, 29, 53)
    d = _dense(masks, cams, valid, origin, 0.5, shape)
    h = carve_sharded_hierarchical(masks, cams, valid, origin, 0.5, shape,
                                   mesh)
    np.testing.assert_array_equal(d, h)


def test_fused_packed_alive_output():
    """out='alive' (device-side bit-packed pull) equals the int8 alive
    plane exactly."""
    from plant3dvision_tpu.parallel.carving_mp import carve_fused
    masks, cams = _synthetic_views(n_views=10, H=96, W=160, radius=5.0,
                                   dist_cam=30.0)
    valid = np.ones(10, bool)
    origin = np.array([-9.0, -7.0, -25.0], np.float32)
    shape = (37, 29, 53)
    full = carve_fused(masks, cams, valid, origin, 0.5, shape)
    alive = carve_fused(masks, cams, valid, origin, 0.5, shape, out="alive")
    np.testing.assert_array_equal(alive, full == 1)


def test_fused_pairs_matches_dense():
    """The fused PAIR-COMPACTED carve (parallel/carving_fp.py: one jitted
    program, static cell+pair caps, factor-2 cascade) is bit-identical to
    the dense carve at several start levels, incl. packed-alive output
    and the cap-overflow retry path."""
    from plant3dvision_tpu.parallel.carving_fp import carve_fused_pairs
    masks, cams = _synthetic_views(n_views=10, H=96, W=160, radius=5.0,
                                   dist_cam=30.0)
    valid = np.ones(10, bool)
    origin = np.array([-9.0, -7.0, -25.0], np.float32)
    shape = (37, 29, 53)
    d = _dense(masks, cams, valid, origin, 0.5, shape)
    for sl in (3, 4):
        f = carve_fused_pairs(masks, cams, valid, origin, 0.5, shape,
                              start_level=sl)
        np.testing.assert_array_equal(d, f)
    # tiny caps force the overflow-retry loop
    f = carve_fused_pairs(masks, cams, valid, origin, 0.5, shape,
                          start_level=3, cell_caps=(4, 4, 4),
                          pair_caps=(8192, 8192, 8192))
    np.testing.assert_array_equal(d, f)
    alive = carve_fused_pairs(masks, cams, valid, origin, 0.5, shape,
                              start_level=4, out="alive")
    np.testing.assert_array_equal(alive, d == 1)


def test_fused_fine_tiles_and_slots_match_dense():
    """Round-3 fast paths are bit-identical to the byte-gather engine:

    - fine_tiles: 32x32-px tile row-gathers + in-register select tree at
      the exact level (plus the dilated single-tap pyramids);
    - slot_caps: per-parent straddling-view compaction (top_k over the
      carried straddle matrix) with the smax retry contract.
    """
    from plant3dvision_tpu.parallel.carving_mp import carve_fused
    masks, cams = _synthetic_views(n_views=10, H=96, W=160, radius=5.0,
                                   dist_cam=30.0)
    valid = np.ones(10, bool)
    origin = np.array([-9.0, -7.0, -25.0], np.float32)
    shape = (37, 29, 53)
    d = _dense(masks, cams, valid, origin, 0.5, shape)
    f_bytes = carve_fused(masks, cams, valid, origin, 0.5, shape,
                          fine_tiles=False)
    np.testing.assert_array_equal(d, f_bytes)
    f_tiles = carve_fused(masks, cams, valid, origin, 0.5, shape,
                          fine_tiles=True)
    np.testing.assert_array_equal(d, f_tiles)
    # slots start deliberately tiny so the smax retry path runs
    f_slots = carve_fused(masks, cams, valid, origin, 0.5, shape,
                          fine_tiles=False, slot_caps=(4, 4))
    np.testing.assert_array_equal(d, f_slots)
    # slots + tiles combined (slot-compacted tile row-gathers at the
    # exact level), incl. the packed-alive output lane
    f_both = carve_fused(masks, cams, valid, origin, 0.5, shape,
                         fine_tiles=True, slot_caps=(4, 4))
    np.testing.assert_array_equal(d, f_both)
    a_both = carve_fused(masks, cams, valid, origin, 0.5, shape,
                         fine_tiles=True, slot_caps=(4, 4), out="alive")
    np.testing.assert_array_equal(a_both, d == 1)


def test_fused_fine_tiles_window_overflow_falls_back():
    """A close-up camera projects fine cells wider than the 32x32 tile
    window: the in-program overflow count must trip and the wrapper must
    silently fall back to the byte-gather exact level — never return a
    volume computed from out-of-window bits."""
    from plant3dvision_tpu.parallel.carving_mp import (carve_fused,
                                                       make_fused_carver)
    import jax.numpy as jnp
    # dist 9 with radius 5: the sphere nearly fills the frame, cells
    # project far wider than 24 px
    masks, cams = _synthetic_views(n_views=6, H=128, W=128, radius=5.0,
                                   dist_cam=9.0)
    valid = np.ones(6, bool)
    origin = np.array([-8.0, -8.0, -8.0], np.float32)
    shape = (32, 32, 32)
    fn = make_fused_carver(128, 128, shape, fine_tiles=True)
    _, counts = fn(jnp.asarray(
        __import__("plant3dvision_tpu.ops.carving_hier",
                   fromlist=["pack_masks"]).pack_masks(masks)),
        jnp.asarray(cams), jnp.asarray(valid), jnp.asarray(origin),
        jnp.float32(0.5))
    assert int(np.asarray(counts)[-1]) > 0, "expected window overflow"
    d = _dense(masks, cams, valid, origin, 0.5, shape)
    f = carve_fused(masks, cams, valid, origin, 0.5, shape)
    np.testing.assert_array_equal(d, f)


def test_sharded_fine_tiles_matches_dense_and_falls_back():
    """Round-3: the tile row-gather fine level in the SHARDED carver —
    bit-exact vs the dense oracle with tiles on and off, and the
    close-up overflow case falls back to byte-gathers across shards
    (overflow counts are psum'd over the view shard)."""
    mesh = make_mesh({"dp": 4})
    masks, cams = _synthetic_views(n_views=12, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    valid = np.ones(12, bool)
    origin = np.array([-20.0, -20.0, -20.0], np.float32)
    shape = (40, 40, 40)
    d = _dense(masks, cams, valid, origin, 1.0, shape)
    t_on = carve_sharded_hierarchical(masks, cams, valid, origin, 1.0,
                                      shape, mesh, fine_tiles=True)
    t_off = carve_sharded_hierarchical(masks, cams, valid, origin, 1.0,
                                       shape, mesh, fine_tiles=False)
    np.testing.assert_array_equal(d, t_on)
    np.testing.assert_array_equal(d, t_off)

    # close-up: fine cells project wider than the 32x32 tile window
    masks2, cams2 = _synthetic_views(n_views=8, H=128, W=128, radius=5.0,
                                     dist_cam=9.0)
    valid2 = np.ones(8, bool)
    origin2 = np.array([-8.0, -8.0, -8.0], np.float32)
    shape2 = (32, 32, 32)
    d2 = _dense(masks2, cams2, valid2, origin2, 0.5, shape2)
    s2 = carve_sharded_hierarchical(masks2, cams2, valid2, origin2, 0.5,
                                    shape2, mesh, fine_tiles=True)
    np.testing.assert_array_equal(d2, s2)
