"""Streaming carving: incremental previews are exact, the final preview
is bit-identical to the batch carve of the same views."""

import numpy as np

import jax.numpy as jnp

from plant3dvision_tpu.ops.carving import carve
from plant3dvision_tpu.ops.streaming import StreamingCarver, _bucket

from .test_ops import _synthetic_views

ORIGIN = np.array([-20.0, -20.0, -20.0], np.float32)
SHAPE = (40, 40, 40)


def _dense(masks, cams, k):
    valid = np.ones(k, bool)
    return np.asarray(carve(jnp.asarray(masks[:k]), jnp.asarray(cams[:k]),
                            jnp.asarray(valid), ORIGIN, 1.0, SHAPE))


def test_streaming_matches_batch_at_every_preview():
    masks, cams = _synthetic_views(n_views=12, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    sc = StreamingCarver(SHAPE, ORIGIN, 1.0, hw=(128, 128), bucket_min=4)
    for k in range(12):
        sc.add_view(masks[k] != 0, cams[k])
        if k in (0, 4, 11):  # mid-scan previews AND the final one
            alive = sc.preview()
            want = _dense(masks, cams, k + 1) == 1
            np.testing.assert_array_equal(alive, want)
    assert sc.n_views == 12


def test_streaming_packed_rows_and_int8_out():
    """Pre-packed mask rows (the FusedCarving ingest format) and the raw
    -1/0/1 volume output."""
    masks, cams = _synthetic_views(n_views=6, H=128, W=128, radius=8.0,
                                   dist_cam=50.0)
    sc = StreamingCarver(SHAPE, ORIGIN, 1.0, hw=(128, 128), bucket_min=4)
    for k in range(6):
        sc.add_view(np.packbits((masks[k] != 0).reshape(-1)), cams[k])
    vol = sc.preview(out="int8")
    np.testing.assert_array_equal(vol, _dense(masks, cams, 6))


def test_bucket():
    assert [_bucket(n, 4) for n in (1, 3, 4, 5, 8, 9, 33)] == \
        [4, 4, 4, 8, 8, 16, 64]
