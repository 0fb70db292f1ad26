"""Undistorted task: batched device path matches cv2 per image."""

import numpy as np

from plant3dvision_tpu.fsdb import io
from plant3dvision_tpu.runtime import RunContext, run_task


def test_undistorted_batched_matches_cv2(temp_db, rng):
    import cv2

    H, W = 96, 128
    K = np.array([[110.0, 0, W / 2], [0, 110.0, H / 2], [0, 0, 1.0]])
    dist = np.array([-0.12, 0.02, 0.0, 0.0])
    cam_md = {"camera_model": {"model": "OPENCV", "width": W, "height": H,
                               "params": [110.0, 110.0, W / 2, H / 2,
                                          -0.12, 0.02, 0.0, 0.0]}}
    scan = temp_db.create_scan("s")
    images = scan.create_fileset("images")
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    raw = []
    for v in range(5):
        img = np.stack([
            127 + 100 * np.sin(xx / (7 + v)) * np.cos(yy / 9.0),
            127 + 100 * np.cos(xx / 11.0 + yy / (5 + v)),
            np.clip(xx + yy + v, 0, 255)], axis=-1).astype(np.uint8)
        raw.append(img)
        f = images.create_file(f"{v:05d}_rgb")
        io.write_image(f, img, "png")
        f.set_metadata({"channel": "rgb", "camera": cam_md})

    ctx = RunContext(temp_db, "s", config={
        "Undistorted": {"upstream_task": "ImagesFilesetExists"}})
    run_task(ctx, "Undistorted", report=False)
    fs = ctx.scan.get_fileset(ctx.get_task("Undistorted").task_id())
    assert len(fs.get_files()) == 5
    for v in range(5):
        ours = io.read_image(fs.get_file(f"{v:05d}_rgb"))
        ref = cv2.undistort(raw[v], K, dist)
        diff = np.abs(ours[8:-8, 8:-8].astype(int) - ref[8:-8, 8:-8].astype(int))
        assert np.quantile(diff, 0.99) <= 2
        # metadata copied through
        assert fs.get_file(f"{v:05d}_rgb").get_metadata("channel") == "rgb"


def test_undistorted_output_is_lossless(temp_db):
    """JPEG inputs must be promoted to a lossless format on output:
    re-encoding the resampled frame as JPEG shifted downstream mask
    edges enough to cost ~5 deg of divergence-angle accuracy on the
    real_plant fixture (round 3)."""
    H, W = 64, 80
    cam_md = {"camera_model": {"model": "OPENCV", "width": W, "height": H,
                               "params": [90.0, 90.0, W / 2, H / 2,
                                          0.0, 0.0, 0.0, 0.0]}}
    scan = temp_db.create_scan("sj")
    images = scan.create_fileset("images")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    f = images.create_file("00000_rgb")
    io.write_image(f, img, "jpg")
    f.set_metadata({"channel": "rgb", "camera": cam_md})
    decoded = io.read_image(f)  # what the task reads (post-JPEG)

    ctx = RunContext(temp_db, "sj", config={
        "Undistorted": {"upstream_task": "ImagesFilesetExists"}})
    run_task(ctx, "Undistorted", report=False)
    fs = ctx.scan.get_fileset(ctx.get_task("Undistorted").task_id())
    fout = fs.get_file("00000_rgb")
    # zero distortion -> the identity resample must round-trip EXACTLY
    # (a JPEG output could not)
    assert fout.filename.endswith(".png"), fout.filename
    assert np.array_equal(io.read_image(fout), decoded)
