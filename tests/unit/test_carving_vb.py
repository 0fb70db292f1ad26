"""View-chunked carve engine (ops/carving_vb.py): bit-equality vs the
sequential fused engine and the numpy oracle, across chunking regimes."""

import numpy as np

import jax

from plant3dvision_tpu.camera import pose_to_extrinsics
from plant3dvision_tpu.ops.carving import pack_camera
from plant3dvision_tpu.ops.carving_vb import carve_fused_vb
from plant3dvision_tpu.parallel.carving_mp import carve_fused


def _workload(V=12, H=96, W=128, seed=0):
    rng = np.random.default_rng(seed)
    masks = np.zeros((V, H, W), np.uint8)
    cams = np.zeros((V, 16), np.float32)
    # blobby plant-ish masks + turntable cameras
    for v in range(V):
        a = 2 * np.pi * v / V
        R, t = pose_to_extrinsics(
            [60 * np.cos(a), 60 * np.sin(a), 10.0], (0, 0, 0))
        cams[v] = pack_camera([110.0, 110.0, W / 2, H / 2], R, t)
        yy, xx = np.mgrid[0:H, 0:W]
        m = np.zeros((H, W), bool)
        for _ in range(6):
            cy, cx = rng.integers(H // 4, 3 * H // 4), rng.integers(
                W // 4, 3 * W // 4)
            r = rng.integers(6, 16)
            m |= (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        masks[v] = m.astype(np.uint8) * 255
    valid = np.ones(V, bool)
    return masks, cams, valid


def test_vb_matches_sequential_single_chunk():
    masks, cams, valid = _workload()
    origin = np.array([-16.0, -16.0, -16.0], np.float32)
    shape = (32, 32, 32)
    ref = carve_fused(masks, cams, valid, origin, 1.0, shape)
    got = carve_fused_vb(masks, cams, valid, origin, 1.0, shape)
    np.testing.assert_array_equal(got, ref)


def test_vb_matches_sequential_multi_chunk():
    """V > view_chunk exercises the lax.scan path + view padding."""
    masks, cams, valid = _workload(V=12)
    origin = np.array([-16.0, -16.0, -16.0], np.float32)
    shape = (32, 32, 32)
    ref = carve_fused(masks, cams, valid, origin, 1.0, shape)
    got = carve_fused_vb(masks, cams, valid, origin, 1.0, shape,
                         view_chunk=5)  # 12 views -> 3 chunks, 3 pad rows
    np.testing.assert_array_equal(got, ref)


def test_vb_invalid_views_and_alive_output():
    masks, cams, valid = _workload(V=10)
    valid = valid.copy()
    valid[3] = False
    valid[7] = False
    origin = np.array([-16.0, -16.0, -16.0], np.float32)
    shape = (33, 31, 30)  # non-multiple-of-8 shape exercises padding
    ref = carve_fused(masks, cams, valid, origin, 1.0, shape)
    got = carve_fused_vb(masks, cams, valid, origin, 1.0, shape,
                         view_chunk=4)
    np.testing.assert_array_equal(got, ref)
    alive = carve_fused_vb(masks, cams, valid, origin, 1.0, shape,
                           view_chunk=4, out="alive")
    np.testing.assert_array_equal(alive, ref == 1)


def test_vb_cap_retry():
    """Tiny initial caps must retry to a fitting bucket, not mis-carve."""
    masks, cams, valid = _workload(V=8)
    origin = np.array([-16.0, -16.0, -16.0], np.float32)
    shape = (32, 32, 32)
    ref = carve_fused(masks, cams, valid, origin, 1.0, shape)
    got = carve_fused_vb(masks, cams, valid, origin, 1.0, shape,
                         caps=(64, 64))
    np.testing.assert_array_equal(got, ref)


def test_vb_min_seen_matches_counting_oracle():
    """min_seen cleanup (VERDICT r4 #3): ALIVE voxels seen by < T views
    demote to UNSEEN — exactly `exact_alive & (seen_count >= T)` where
    seen_count is the brute-force per-view mask-hit count."""
    masks, cams, valid = _workload(V=10, seed=3)
    valid = valid.copy()
    valid[2] = False
    origin = np.array([-16.0, -16.0, -16.0], np.float32)
    shape = (32, 32, 32)
    vs = 1.0
    ref = carve_fused(masks, cams, valid, origin, vs, shape)

    # numpy counting oracle (reference backprojection.c projection)
    H, W = masks.shape[1:]
    idx = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                               indexing="ij"), axis=-1).reshape(-1, 3)
    pts = origin + idx.astype(np.float32) * vs
    count = np.zeros(len(pts), np.int32)
    for v in range(len(masks)):
        if not valid[v]:
            continue
        fx, fy, cx, cy = cams[v, :4]
        R = cams[v, 4:13].reshape(3, 3)
        t = cams[v, 13:16]
        p = pts @ R.T + t
        pz = p[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            px = (p[:, 0] / pz * fx + cx).astype(np.int32)
            py = (p[:, 1] / pz * fy + cy).astype(np.int32)
        ok = (pz > 0) & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
        hit = np.zeros(len(pts), bool)
        hit[ok] = masks[v][py[ok], px[ok]] != 0
        count += hit

    count = count.reshape(shape)
    for T in (2, 4):
        got = carve_fused_vb(masks, cams, valid, origin, vs, shape,
                             min_seen=T)
        want = np.where((ref == 1) & (count < T), 0, ref)
        np.testing.assert_array_equal(got, want)


def test_sequential_engine_min_seen_matches_vb():
    """The sequential fused engine's min_seen port must agree with the
    vb engine (itself oracle-validated above)."""
    import jax.numpy as jnp
    from plant3dvision_tpu.parallel.carving_mp import make_fused_carver

    masks, cams, valid = _workload(V=10, seed=5)
    origin = np.array([-16.0, -16.0, -16.0], np.float32)
    shape = (32, 32, 32)
    from plant3dvision_tpu.ops.carving_hier import pack_masks
    packed = jnp.asarray(pack_masks(masks))
    for T in (1, 3):
        fn = make_fused_carver(masks.shape[1], masks.shape[2], shape,
                               caps=(4096, 8192), fine_tiles=True,
                               min_seen=T)
        vol, counts = fn(packed, jnp.asarray(cams), jnp.asarray(valid),
                         jnp.asarray(origin), jnp.float32(1.0))
        ref = carve_fused_vb(masks, cams, valid, origin, 1.0, shape,
                             min_seen=T)
        np.testing.assert_array_equal(np.asarray(vol), ref)
