"""Hierarchical carve must be bit-identical to the dense carve."""

import numpy as np
import pytest

import jax.numpy as jnp

from plant3dvision_tpu.ops.carving import carve
from plant3dvision_tpu.ops.carving_hier import carve_hierarchical

from .test_ops import _synthetic_views


def _dense(masks, cams, valid, origin, vs, shape):
    return np.asarray(carve(jnp.asarray(masks), jnp.asarray(cams),
                            jnp.asarray(valid), origin, vs, shape))


def test_identical_basic():
    masks, cams = _synthetic_views(n_views=12, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    valid = np.ones(len(masks), bool)
    shape = (40, 40, 40)
    origin = np.array([-20.0, -20.0, -20.0], np.float32)
    d = _dense(masks, cams, valid, origin, 1.0, shape)
    h = carve_hierarchical(masks, cams, valid, origin, 1.0, shape)
    np.testing.assert_array_equal(d, h)
    assert (h == 1).sum() > 100  # there is an object


def test_identical_noncubic_halfvox_partial_frustum():
    # grid partly outside every view's frustum + non-pow2 dims + vs=0.5
    masks, cams = _synthetic_views(n_views=7, H=96, W=160, radius=5.0,
                                   dist_cam=30.0)
    valid = np.ones(7, bool)
    shape = (37, 29, 53)
    origin = np.array([-9.0, -7.0, -25.0], np.float32)
    d = _dense(masks, cams, valid, origin, 0.5, shape)
    h = carve_hierarchical(masks, cams, valid, origin, 0.5, shape)
    np.testing.assert_array_equal(d, h)


def test_identical_with_invalid_views():
    masks, cams = _synthetic_views(n_views=10, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    valid = np.ones(10, bool)
    valid[3] = False
    valid[7] = False
    # poison the invalid views so any leakage shows up
    masks[3] = 0
    masks[7] = 255
    shape = (32, 32, 32)
    origin = np.array([-16.0, -16.0, -16.0], np.float32)
    d = _dense(masks, cams, valid, origin, 1.0, shape)
    h = carve_hierarchical(masks, cams, valid, origin, 1.0, shape)
    np.testing.assert_array_equal(d, h)


def test_identical_random_masks():
    # worst case for the hierarchy: speckle masks leave everything undecided
    rng = np.random.default_rng(0)
    masks, cams = _synthetic_views(n_views=6, H=64, W=64, radius=6.0,
                                   dist_cam=40.0)
    masks = (rng.random(masks.shape) > 0.5).astype(np.uint8) * 255
    valid = np.ones(6, bool)
    shape = (24, 24, 24)
    origin = np.array([-12.0, -12.0, -12.0], np.float32)
    d = _dense(masks, cams, valid, origin, 1.0, shape)
    h = carve_hierarchical(masks, cams, valid, origin, 1.0, shape)
    np.testing.assert_array_equal(d, h)


def test_perview_identical_all_cases():
    """Per-view-compacted carver must match the dense carve bit-for-bit,
    including >32 views (multi-word bitmasks), invalid views, speckle."""
    from plant3dvision_tpu.ops.carving_pv import carve_perview
    rng = np.random.default_rng(1)

    cases = [
        dict(n_views=12, H=128, W=128, radius=8.0, dist_cam=50.0,
             shape=(40, 40, 40), origin=[-20, -20, -20], vs=1.0),
        dict(n_views=40, H=64, W=64, radius=6.0, dist_cam=40.0,
             shape=(24, 24, 24), origin=[-12, -12, -12], vs=1.0),
    ]
    for i, c in enumerate(cases):
        masks, cams = _synthetic_views(n_views=c["n_views"], H=c["H"],
                                       W=c["W"], radius=c["radius"],
                                       dist_cam=c["dist_cam"])
        valid = np.ones(c["n_views"], bool)
        if i == 1:
            valid[5] = False
            masks = (rng.random(masks.shape) > 0.4).astype(np.uint8) * 255
        origin = np.array(c["origin"], np.float32)
        d = _dense(masks, cams, valid, origin, c["vs"], c["shape"])
        h = carve_perview(masks, cams, valid, origin, c["vs"], c["shape"])
        np.testing.assert_array_equal(d, h)


def test_single_view_carve():
    """V=1 edge case through all three engines."""
    from plant3dvision_tpu.ops.carving_pv import carve_perview
    masks, cams = _synthetic_views(n_views=1, H=64, W=64, radius=6.0,
                                   dist_cam=40.0)
    valid = np.ones(1, bool)
    origin = np.array([-12.0, -12.0, -12.0], np.float32)
    shape = (24, 24, 24)
    d = _dense(masks, cams, valid, origin, 1.0, shape)
    np.testing.assert_array_equal(
        carve_hierarchical(masks, cams, valid, origin, 1.0, shape), d)
    np.testing.assert_array_equal(
        carve_perview(masks, cams, valid, origin, 1.0, shape), d)
    # a single view can only carve a cone; everything toward the camera
    # within the silhouette cone stays alive
    assert (d == 1).sum() > 0 and (d == -1).sum() > 0


def test_carve_tolerant_votes():
    """carve_tolerant == carve at max_kills 0; a single poisoned view is
    out-voted at max_kills 1 (ops/carving.carve_tolerant)."""
    import jax.numpy as jnp
    from plant3dvision_tpu.ops.carving import carve, carve_tolerant

    from .test_ops import _synthetic_views

    masks, cams = _synthetic_views(n_views=10, H=96, W=96, radius=7.0,
                                   dist_cam=40.0)
    valid = np.ones(10, bool)
    origin = np.array([-16.0, -16.0, -16.0], np.float32)
    shape = (33, 33, 33)

    strict = np.asarray(carve(jnp.asarray(masks), jnp.asarray(cams), valid,
                              origin, 1.0, shape))
    tol0 = np.asarray(carve_tolerant(jnp.asarray(masks), jnp.asarray(cams),
                                     valid, origin, 1.0, shape, 0))
    np.testing.assert_array_equal(strict, tol0)

    # poison one view (empty mask kills everything it sees)
    bad = masks.copy()
    bad[3] = 0
    tol1 = np.asarray(carve_tolerant(jnp.asarray(bad), jnp.asarray(cams),
                                     valid, origin, 1.0, shape, 1))
    strict_bad = np.asarray(carve(jnp.asarray(bad), jnp.asarray(cams), valid,
                                  origin, 1.0, shape))
    assert (strict_bad == 1).sum() == 0          # strict carve wiped out
    # the vote recovers at least the true hull (plus voxels whose only
    # dissenter is now out-voted — tolerance fattens, never starves)
    assert ((tol1 == 1) & (strict == 1)).sum() == (strict == 1).sum()
    assert (tol1 == 1).sum() <= 2.0 * (strict == 1).sum()


def test_backprojection_kill_tolerance_across_flushes():
    """The vote tolerance must count dissent ACROSS incremental flush
    batches — per-batch verdicts OR-merged would let a voxel with
    tolerance-exceeding total dissent survive."""
    import jax.numpy as jnp
    from plant3dvision_tpu.ops.carving import (Backprojection,
                                               carve_tolerant)

    from .test_ops import _synthetic_views

    masks, cams = _synthetic_views(n_views=10, H=96, W=96, radius=7.0,
                                   dist_cam=40.0)
    bad = masks.copy()
    bad[2] = 0
    bad[7] = 0        # one poisoned view in each flush batch
    origin = [-16.0, -16.0, -16.0]
    shape = (33, 33, 33)

    ref = np.asarray(carve_tolerant(
        jnp.asarray(bad), jnp.asarray(cams), jnp.ones(10, bool),
        jnp.asarray(origin, jnp.float32), 1.0, shape, 1))

    bp = Backprojection(shape=shape, origin=origin, voxel_size=1.0,
                        type="carving", kill_tolerance=1)
    for v in range(5):
        bp.process_view(cams[v, :4], cams[v, 4:13].reshape(3, 3),
                        cams[v, 13:16], bad[v])
    bp.get_values()                      # flush batch 1
    for v in range(5, 10):
        bp.process_view(cams[v, :4], cams[v, 4:13].reshape(3, 3),
                        cams[v, 13:16], bad[v])
    out = bp.get_values()                # flush batch 2

    np.testing.assert_array_equal(out, ref)
    # sanity: with per-batch tolerance this would differ — each batch
    # has only ONE poisoned view, i.e. <= tolerance per batch
    assert (ref == 1).sum() == 0        # 2 empty views > tolerance 1
