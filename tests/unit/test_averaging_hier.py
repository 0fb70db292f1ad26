"""Hierarchical averaging must match the dense averaging op on binary
masks (both plain and log mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plant3dvision_tpu.ops.carving import EPS, average
from plant3dvision_tpu.ops.averaging_hier import average_hierarchical

from .test_ops import _synthetic_views


def _dense_avg(masks, cams, valid, origin, vs, shape, log):
    m = masks.astype(np.float32) / 255.0
    if log:
        m = np.log(EPS + m)
    return np.asarray(average(jnp.asarray(m), jnp.asarray(cams),
                              jnp.asarray(valid), origin, vs, shape))


@pytest.mark.parametrize("log", [False, True])
def test_hier_average_matches_dense(log):
    masks, cams = _synthetic_views(n_views=12, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    valid = np.ones(12, bool)
    origin = np.array([-20.0, -20.0, -20.0], np.float32)
    shape = (40, 40, 40)
    ref = _dense_avg(masks, cams, valid, origin, 1.0, shape, log)
    ours = average_hierarchical(masks, cams, valid, origin, 1.0, shape,
                                log=log)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(ours, ref, atol=2e-4 * scale)


def test_hier_average_partial_frustum_and_invalid_views():
    masks, cams = _synthetic_views(n_views=9, H=96, W=160, radius=5.0,
                                   dist_cam=30.0)
    valid = np.ones(9, bool)
    valid[2] = False
    masks[2] = 255  # poisoned invalid view
    origin = np.array([-9.0, -7.0, -25.0], np.float32)
    shape = (37, 29, 53)
    ref = _dense_avg(masks, cams, valid, origin, 0.5, shape, False)
    ours = average_hierarchical(masks, cams, valid, origin, 0.5, shape)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_hier_average_rejects_soft_masks():
    masks, cams = _synthetic_views(n_views=4, H=64, W=64, radius=6.0,
                                   dist_cam=40.0)
    soft = masks.astype(np.float32) * 0.6
    with pytest.raises(ValueError):
        average_hierarchical(soft, cams, np.ones(4, bool),
                             np.zeros(3, np.float32), 1.0, (8, 8, 8))
