"""Tile row-gather averaging vs the dense reference op.

The tiled engine must reproduce ops.carving.average on two-valued masks
to float tolerance (same per-view accumulation order, same bilinear
expression — only the tap fetch differs), detect too-wide projection
windows via its overflow counter, and be selected/fallen-back-from
transparently by the Backprojection averaging path."""

import numpy as np
import pytest

from plant3dvision_tpu.ops.carving import (EPS, Backprojection, average,
                                           pack_camera)
from plant3dvision_tpu.ops.averaging_tiled import average_tiled
from plant3dvision_tpu.synth import SyntheticPlant, render_mask, \
    turntable_cameras


def _workload(V=7, H=120, W=160, shape=(33, 30, 47), voxel=1.0):
    plant = SyntheticPlant(n_fruits=5, stem_radius=2.5, fruit_radius=2.0,
                           fruit_length=14.0, internode=7.0)
    origin = np.array([-16.0, -15.0, -2.0], np.float32)
    cams_krt = turntable_cameras(V, dist=150.0, z=45.0, target=(0, 0, 25.0),
                                 f=180.0, width=W, height=H)
    masks = np.zeros((V, H, W), np.uint8)
    cams = np.zeros((V, 16), np.float32)
    for v, (K, R, t) in enumerate(cams_krt):
        masks[v] = render_mask(plant, K, R, t, W, H, step=1.0)
        cams[v] = pack_camera([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], R, t)
    return masks, cams, origin, voxel, shape


@pytest.mark.parametrize("log", [False, True])
def test_matches_dense_average(log):
    # masks are uint8 {0, 255}; feed the dense op the normalized floats
    # the Backprojection averaging path builds, and the tiled op the
    # matching {v0, v1} relabeling
    masks, cams, origin, voxel, shape = _workload()
    valid = np.ones(len(masks), bool)

    fmasks = masks.astype(np.float32) / 255.0
    if log:
        fmasks = np.log(EPS + fmasks)
    dense = np.asarray(average(fmasks, cams, valid, origin, voxel, shape))

    v0, v1 = (np.log(EPS), np.log(EPS + 1.0)) if log else (0.0, 1.0)
    tiled, over = average_tiled(masks, cams, valid, origin, voxel, shape,
                                v0=float(v0), v1=float(v1))
    assert over == 0
    np.testing.assert_allclose(np.asarray(tiled), dense,
                               rtol=1e-5, atol=1e-4)


def test_unnormalized_values_match_dense():
    # raw {0, 255} values straight through the dense expression
    masks, cams, origin, voxel, shape = _workload(V=4)
    valid = np.ones(len(masks), bool)
    dense = np.asarray(average(masks.astype(np.float32), cams, valid,
                               origin, voxel, shape))
    tiled, over = average_tiled(masks, cams, valid, origin, voxel, shape,
                                v0=0.0, v1=255.0)
    assert over == 0
    np.testing.assert_allclose(np.asarray(tiled), dense,
                               rtol=1e-5, atol=2e-2)


def test_overflow_detected_for_close_camera():
    # a camera so close that a 4-voxel cell spans >24 px must be counted
    masks, cams, origin, voxel, shape = _workload(V=2)
    close = turntable_cameras(1, dist=28.0, z=25.0, target=(0, 0, 25.0),
                              f=300.0, width=160, height=120)
    K, R, t = close[0]
    cams[0] = pack_camera([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], R, t)
    _, over = average_tiled(masks, cams, np.ones(2, bool), origin, voxel,
                            shape)
    assert over > 0


@pytest.mark.parametrize("log", [False, True])
def test_backprojection_uses_tiled_path(log, monkeypatch):
    """The averaging Backprojection must produce the same volume whether
    the tiled engine or the dense scan serves it (uint8 0/255 masks,
    the Masks/Segmentation2D on-disk format)."""
    masks, cams, origin, voxel, shape = _workload(V=5)
    masks255 = masks * np.uint8(255)

    def run(force_dense):
        bp = Backprojection(shape, origin, voxel, type="averaging", log=log)
        if force_dense:
            # non-binarizable sentinel disables the tiled lane
            monkeypatch.setattr(
                "plant3dvision_tpu.ops.averaging_tiled.average_tiled",
                lambda *a, **k: (None, 1))
        for m, c in zip(masks255, cams):
            bp.process_view(c[:4], c[4:13].reshape(3, 3), c[13:16], m)
        bp._flush()
        out = bp._values
        monkeypatch.undo()
        return out

    tiled = run(False)
    dense = run(True)
    np.testing.assert_allclose(tiled, dense, rtol=1e-5, atol=1e-4)


def test_chunked_tiled_bit_identical():
    """Grid-slab tiled averaging (VERDICT r3 #2) must be BIT-identical to
    the unchunked program — the slab recomputes global x coords exactly
    and keeps the per-view accumulation order."""
    from plant3dvision_tpu.ops.averaging_tiled import average_tiled_chunked
    masks, cams, origin, voxel, shape = _workload()
    valid = np.ones(len(masks), bool)
    full, over_f = average_tiled(masks, cams, valid, origin, voxel, shape)
    # 8 x-rows (2 parents) per slab -> 5 slabs incl. a padded tail
    chunked, over_c = average_tiled_chunked(
        masks, cams, valid, origin, voxel, shape,
        max_slab_voxels=8 * shape[1] * shape[2])
    assert over_f == over_c == 0
    np.testing.assert_array_equal(np.asarray(full), chunked)


def test_chunked_dense_matches():
    """Grid-slab dense averaging vs the one-program dense op: same math,
    but the traced x_off blocks the constant-folding the full program
    gets, so XLA may contract FMAs differently — identical to ~1 ulp
    per accumulation step (measured max 5e-6 abs on 0.03% of voxels),
    not bitwise."""
    from plant3dvision_tpu.ops.carving import average_chunked
    masks, cams, origin, voxel, shape = _workload(V=4)
    valid = np.ones(len(masks), bool)
    fmasks = masks.astype(np.float32) / 255.0
    full = np.asarray(average(fmasks, cams, valid, origin, voxel, shape))
    chunked = average_chunked(fmasks, cams, valid, origin, voxel, shape,
                              max_slab_voxels=7 * shape[1] * shape[2])
    np.testing.assert_allclose(full, chunked, rtol=1e-5, atol=1e-5)


def test_backprojection_chunked_threshold(monkeypatch):
    """Backprojection routes big grids through the chunked lanes
    (P3D_AVG_CHUNK_VOXELS) and the result matches the unchunked run."""
    masks, cams, origin, voxel, shape = _workload(V=5)
    masks255 = masks * np.uint8(255)

    def run():
        bp = Backprojection(shape, origin, voxel, type="averaging", log=True)
        for m, c in zip(masks255, cams):
            bp.process_view(c[:4], c[4:13].reshape(3, 3), c[13:16], m)
        bp._flush()
        return bp._values

    base = run()
    monkeypatch.setenv("P3D_AVG_CHUNK_VOXELS", "4096")  # force chunking
    chunked = run()
    np.testing.assert_array_equal(np.asarray(base), np.asarray(chunked))


def test_fused_slab_accumulate_bit_identical():
    """accumulate_label_views_slab over slabs == the whole-grid program
    (the FusedSegmentationCarving 0.5 mm lane, VERDICT r3 #2)."""
    import jax.numpy as jnp
    from plant3dvision_tpu.ops.ml_fused import (accumulate_label_views,
                                                accumulate_label_views_slab)
    masks, cams, origin, voxel, shape = _workload(V=4)
    V, H, W = masks.shape
    C = 3
    rng = np.random.default_rng(0)
    probs = rng.random((V, C, H, W), np.float32)
    valid = np.ones(V, bool)

    full = accumulate_label_views(
        jnp.zeros((C, *shape), jnp.float32), jnp.asarray(probs),
        jnp.asarray(cams), jnp.asarray(valid),
        jnp.asarray(origin, jnp.float32), jnp.float32(voxel), shape, True)

    slab_nx = 8
    nx_pad = -(-shape[0] // slab_nx) * slab_nx
    vol = jnp.zeros((C, nx_pad, shape[1], shape[2]), jnp.float32)
    for s in range(nx_pad // slab_nx):
        vol = accumulate_label_views_slab(
            vol, jnp.asarray(probs), jnp.asarray(cams), jnp.asarray(valid),
            jnp.asarray(origin, jnp.float32), jnp.float32(voxel),
            s * slab_nx, slab_nx, True)
    np.testing.assert_array_equal(np.asarray(full),
                                  np.asarray(vol[:, :shape[0]]))


def test_accumulate_label_views_box_mode():
    """sample='box' = half-texel 2x2 prefilter + ONE nearest tap (the
    reference's LINEAR-at-integer-coords semantics, 4x fewer gathers):
    must equal the brute-force prefilter + nearest-gather oracle, and
    the slab program must match the whole-grid program."""
    import jax
    import jax.numpy as jnp
    from plant3dvision_tpu.ops.carving import _project
    from plant3dvision_tpu.ops.ml_fused import (accumulate_label_views,
                                                accumulate_label_views_slab)

    rng = np.random.default_rng(11)
    B, C, H, W = 3, 2, 24, 32
    shape = (8, 8, 8)
    probs = rng.random((B, C, H, W)).astype(np.float32)
    cams = np.zeros((B, 16), np.float32)
    from plant3dvision_tpu.camera import pose_to_extrinsics
    from plant3dvision_tpu.ops.carving import pack_camera
    for v in range(B):
        a = 2 * np.pi * v / B
        R, t = pose_to_extrinsics([30 * np.cos(a), 30 * np.sin(a), 5.0],
                                  (0, 0, 0))
        cams[v] = pack_camera([40.0, 40.0, W / 2, H / 2], R, t)
    valid = np.ones(B, bool)
    origin = np.array([-4.0, -4.0, -4.0], np.float32)

    vol0 = jnp.zeros((C, *shape), jnp.float32)
    got = np.asarray(accumulate_label_views(
        vol0, jnp.asarray(probs), jnp.asarray(cams), jnp.asarray(valid),
        jnp.asarray(origin), jnp.float32(1.0), shape, False, sample="box"))

    # oracle: the OpenCL LINEAR-at-integer window {ix-1, ix} x
    # {iy-1, iy} (texel centers at i+0.5), edge-clamped
    pf = np.pad(probs, ((0, 0), (0, 0), (1, 0), (1, 0)), mode="edge")
    pre = 0.25 * (pf[:, :, :H, :W] + pf[:, :, :H, 1:] +
                  pf[:, :, 1:, :W] + pf[:, :, 1:, 1:])
    want = np.zeros((C, *shape), np.float32)
    for v in range(B):
        px, py, _, _, in_img = jax.tree_util.tree_map(
            np.asarray, _project(jnp.asarray(cams[v]), jnp.asarray(origin),
                                 jnp.float32(1.0), shape, W, H))
        x0 = np.clip(np.floor(px).astype(int), 0, W - 2)
        y0 = np.clip(np.floor(py).astype(int), 0, H - 2)
        for c in range(C):
            want[c] += np.where(in_img, pre[v, c][y0, x0], 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # slab == full
    vol1 = jnp.zeros((C, *shape), jnp.float32)
    for s in range(2):
        vol1 = accumulate_label_views_slab(
            vol1, jnp.asarray(probs), jnp.asarray(cams),
            jnp.asarray(valid), jnp.asarray(origin), jnp.float32(1.0),
            s * 4, 4, False, sample="box")
    np.testing.assert_allclose(np.asarray(vol1), got, rtol=2e-6, atol=1e-6)
