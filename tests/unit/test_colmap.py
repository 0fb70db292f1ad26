"""COLMAP layer tests: binary model round-trip + full Colmap task driven
against a fake `colmap` executable (role of the reference's
tests/unit/test_colmap.py, which needs the real binary)."""

import json
import os
import stat
import sys
from pathlib import Path

import numpy as np
import pytest

import plant3dvision_tpu.colmap.read_model as rm


def test_model_binary_roundtrip(tmp_path):
    cameras = {1: rm.Camera(1, "OPENCV", 640, 480,
                            np.array([500.0, 510.0, 320.0, 240.0,
                                      -0.1, 0.01, 0.001, -0.002]))}
    q = rm.rotmat2qvec(np.eye(3))
    images = {
        1: rm.Image(1, q, np.array([0.1, 0.2, 0.3]), 1, "00000_rgb.jpg",
                    np.array([[1.0, 2.0], [3.0, 4.0]]),
                    np.array([7, -1], dtype=np.int64)),
    }
    points = {7: rm.Point3D(7, np.array([1.0, 2.0, 3.0]),
                            np.array([10, 20, 30], dtype=np.uint8), 0.5,
                            np.array([1], dtype=np.int32),
                            np.array([0], dtype=np.int32))}
    rm.write_cameras_binary(cameras, tmp_path / "cameras.bin")
    rm.write_images_binary(images, tmp_path / "images.bin")
    rm.write_points3d_binary(points, tmp_path / "points3D.bin")

    c2, i2, p2 = rm.read_model(tmp_path)
    assert c2[1].model == "OPENCV"
    np.testing.assert_allclose(c2[1].params, cameras[1].params)
    np.testing.assert_allclose(i2[1].qvec, q)
    assert i2[1].name == "00000_rgb.jpg"
    np.testing.assert_allclose(i2[1].xys, images[1].xys)
    np.testing.assert_allclose(p2[7].xyz, [1, 2, 3])
    assert p2[7].image_ids.tolist() == [1]


def test_model_text_roundtrip(tmp_path):
    """Text model (model_converter TXT output; reference
    thirdparty/read_model.py:82-258) round-trips bit-exact and read_model
    auto-detects the format when cameras.bin is absent."""
    cameras = {1: rm.Camera(1, "SIMPLE_RADIAL", 960, 540,
                            np.array([398.25, 480.0, 270.0, -0.017]))}
    q = rm.rotmat2qvec(rm.qvec2rotmat([0.9, 0.1, -0.2, 0.4] /
                                      np.linalg.norm([0.9, 0.1, -0.2, 0.4])))
    images = {
        3: rm.Image(3, q, np.array([-0.5, 1.25, 7.0]), 1, "00003_rgb.jpg",
                    np.array([[1.5, 2.25], [3.0, 4.125]]),
                    np.array([7, -1], dtype=np.int64)),
        4: rm.Image(4, q, np.zeros(3), 1, "00004_rgb.jpg",
                    np.zeros((0, 2)), np.zeros(0, np.int64)),
    }
    points = {7: rm.Point3D(7, np.array([1.0, -2.5, 3.75]),
                            np.array([10, 20, 30], dtype=np.uint8), 0.5,
                            np.array([3], dtype=np.int32),
                            np.array([0], dtype=np.int32))}
    rm.write_cameras_text(cameras, tmp_path / "cameras.txt")
    rm.write_images_text(images, tmp_path / "images.txt")
    rm.write_points3d_text(points, tmp_path / "points3D.txt")

    c2, i2, p2 = rm.read_model(tmp_path)  # auto-detects .txt
    assert c2[1].model == "SIMPLE_RADIAL"
    np.testing.assert_array_equal(c2[1].params, cameras[1].params)
    np.testing.assert_array_equal(i2[3].qvec, q)
    np.testing.assert_array_equal(i2[3].tvec, images[3].tvec)
    assert i2[3].name == "00003_rgb.jpg"
    np.testing.assert_array_equal(i2[3].xys, images[3].xys)
    np.testing.assert_array_equal(i2[3].point3D_ids, images[3].point3D_ids)
    assert i2[4].xys.shape == (0, 2) and len(i2[4].point3D_ids) == 0
    np.testing.assert_array_equal(p2[7].xyz, points[7].xyz)
    np.testing.assert_array_equal(p2[7].rgb, points[7].rgb)
    assert p2[7].error == 0.5
    assert p2[7].image_ids.tolist() == [3]

    # explicit ext selection matches the reference's read_model(path, ext)
    c3, i3, p3 = rm.read_model(tmp_path, ext=".txt")
    assert c3.keys() == c2.keys() and i3.keys() == i2.keys()


def test_qvec_rotmat_roundtrip(rng):
    for _ in range(10):
        v = rng.standard_normal(3)
        angle = rng.uniform(0, np.pi)
        v = v / np.linalg.norm(v)
        K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
        q = rm.rotmat2qvec(R)
        np.testing.assert_allclose(rm.qvec2rotmat(q), R, atol=1e-10)


FAKE_COLMAP = r'''#!/usr/bin/env python3
"""Fake colmap binary: emits a plausible aligned sparse model built from
poses.txt, so the runner/task plumbing can be tested hermetically."""
import os, sys, struct
from pathlib import Path

if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
    ver = os.environ.get("FAKE_COLMAP_VERSION", "3.8")
    print(f"COLMAP {ver} -- Structure-from-Motion and Multi-View Stereo")
    sys.exit(0)

args = dict(zip(sys.argv[2::2], sys.argv[3::2]))
sub = sys.argv[1]

def write_model(out_dir, poses, image_names):
    sys.path.insert(0, "%REPO%")
    import numpy as np
    import plant3dvision_tpu.colmap.read_model as rm
    from plant3dvision_tpu.camera import pose_to_extrinsics
    out_dir.mkdir(parents=True, exist_ok=True)
    cameras = {1: rm.Camera(1, "SIMPLE_RADIAL", 64, 64,
                            np.array([80.0, 32.0, 32.0, 0.0]))}
    images = {}
    for i, (name, c) in enumerate(zip(image_names, poses), start=1):
        R, t = pose_to_extrinsics(c, (0, 0, 0))
        images[i] = rm.Image(i, rm.rotmat2qvec(R), t, 1, name,
                             np.zeros((0, 2)), np.zeros(0, dtype=np.int64))
    pts = {j: rm.Point3D(j, np.random.RandomState(j).uniform(-10, 10, 3),
                         np.array([0, 200, 0], dtype=np.uint8), 0.3,
                         np.zeros(0, np.int32), np.zeros(0, np.int32))
           for j in range(1, 51)}
    rm.write_cameras_binary(cameras, out_dir / "cameras.bin")
    rm.write_images_binary(images, out_dir / "images.bin")
    rm.write_points3d_binary(pts, out_dir / "points3D.bin")

if sub == "mapper":
    import os, math
    wd = Path(args["--database_path"]).parent
    poses, names = [], []
    pf = wd / "poses.txt"
    if pf.exists():
        for line in pf.read_text().splitlines():
            parts = line.split()
            names.append(parts[0])
            poses.append([float(x) for x in parts[1:4]])
    if os.environ.get("FAKE_COLMAP_TRUE_CIRCLE"):
        n = len(names)
        poses = [[40*math.cos(2*math.pi*i/n), 40*math.sin(2*math.pi*i/n), 10.0]
                 for i in range(n)]
    write_model(Path(args["--output_path"]) / "0", poses, names)
    if os.environ.get("FAKE_COLMAP_EXTRA_MODEL"):
        # a second, smaller reconstruction (tests model picking)
        write_model(Path(args["--output_path"]) / "1", poses[:2], names[:2])
elif sub == "model_aligner":
    import shutil
    # COLMAP <= 3.9 spells the threshold differently; the runner must
    # send the right one for the reported version (ref colmap.py:1002)
    ver = os.environ.get("FAKE_COLMAP_VERSION", "3.8")
    want = ("--robust_alignment_max_error"
            if tuple(map(int, ver.split("."))) <= (3, 9)
            else "--alignment_max_error")
    assert want in args, f"missing {want} in {sorted(args)}"
    src, dst = Path(args["--input_path"]), Path(args["--output_path"])
    dst.mkdir(parents=True, exist_ok=True)
    for f in src.glob("*.bin"):
        shutil.copy(f, dst / f.name)
elif sub == "model_analyzer":
    print("Cameras: 1\nImages: 2\nPoints: 50")
# all other subcommands: no-op success
sys.exit(0)
'''


@pytest.fixture()
def fake_colmap(tmp_path):
    exe = tmp_path / "colmap"
    exe.write_text(FAKE_COLMAP.replace("%REPO%",
                                       str(Path(__file__).resolve().parents[2])))
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    old = os.environ.get("COLMAP_EXE")
    os.environ["COLMAP_EXE"] = str(exe)
    yield exe
    if old is None:
        os.environ.pop("COLMAP_EXE", None)
    else:
        os.environ["COLMAP_EXE"] = old


def test_colmap_task_with_fake_binary(temp_db, fake_colmap, tmp_path):
    from plant3dvision_tpu.runtime import RunContext, run_task

    scan = temp_db.create_scan("s")
    images = scan.create_fileset("images")
    n = 12
    for v in range(n):
        f = images.create_file(f"{v:05d}_rgb")
        f.write_raw(b"\xff\xd8fake", "jpg")
        a = 2 * np.pi * v / n
        f.set_metadata({"channel": "rgb",
                        "approximate_pose": [40 * np.cos(a), 40 * np.sin(a),
                                             10.0, np.degrees(a), 0]})

    os.environ["COLMAP_WD"] = str(tmp_path / "wd")
    try:
        ctx = RunContext(temp_db, "s", config={
            "Colmap": {"distance_threshold": 5.0, "align_pcd": True}})
        report = run_task(ctx, "Colmap", report=False)
    finally:
        os.environ.pop("COLMAP_WD", None)
    assert report["Colmap"]["status"] == "done"

    fs = ctx.scan.get_fileset(report["Colmap"]["fileset"])
    cams = json.loads(fs.get_file("cameras").read_raw())
    imgs = json.loads(fs.get_file("images").read_raw())
    assert len(imgs) == n
    assert cams["1"]["model"] == "SIMPLE_RADIAL"
    assert fs.get_file("sparse") is not None
    assert fs.get_metadata("bounding_box") is not None

    # per-image export + QC metadata (fake model reproduces CNC poses
    # exactly, so every pose must be 'correct')
    for f in images.get_files():
        cc = f.get_metadata("colmap_camera")
        assert cc and "rotmat" in cc and "tvec" in cc
        assert f.get_metadata("pose_estimation") == "correct"
    ed = json.loads(fs.get_file("euclidean_distances").read_raw())
    assert ed["mean"] < 1e-6


def test_extrinsic_calibration_task(temp_db, fake_colmap, tmp_path):
    """ExtrinsicCalibration end-to-end against the hermetic fake binary:
    calibrated_pose per image, pose QC figure, circle-path fit stats +
    figure (reference tasks/calibration.py:330-622, utils.py
    plot_points_circle)."""
    from plant3dvision_tpu.runtime import RunContext, run_task

    scan = temp_db.create_scan("cal")
    images = scan.create_fileset("images")
    n = 12
    for v in range(n):
        f = images.create_file(f"{v:05d}_rgb")
        f.write_raw(b"\xff\xd8fake", "jpg")
        a = 2 * np.pi * v / n
        f.set_metadata({"channel": "rgb",
                        "approximate_pose": [40 * np.cos(a), 40 * np.sin(a),
                                             10.0, np.degrees(a), 0]})

    os.environ["COLMAP_WD"] = str(tmp_path / "wd")
    try:
        ctx = RunContext(temp_db, "cal", config={})
        report = run_task(ctx, "ExtrinsicCalibration", report=False)
    finally:
        os.environ.pop("COLMAP_WD", None)
    assert report["ExtrinsicCalibration"]["status"] == "done"

    for f in images.get_files():
        pose = f.get_metadata("calibrated_pose")
        assert pose is not None and len(pose) == 3

    fs = ctx.scan.get_fileset(report["ExtrinsicCalibration"]["fileset"])
    stats = json.loads(fs.get_file("calibration_stats").read_raw())
    # fake model reproduces the circular CNC path exactly
    cf = stats["circle_fit"]
    assert abs(cf["radius"] - 40.0) < 0.5, cf
    assert cf["residual_rms"] < 0.1, cf
    assert fs.get_file("circle_fit") is not None
    assert (fs.path() / "circle_fit.png").stat().st_size > 0
    assert fs.get_file("poses_figure") is not None


def test_blind_angle_raises(temp_db, fake_colmap, tmp_path):
    """Corrupt CNC poses for a contiguous arc -> blind-angle retry then
    failure (reference failure-detection semantics)."""
    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.runtime.runner import TaskFailure

    scan = temp_db.create_scan("s2")
    images = scan.create_fileset("images")
    n = 12
    for v in range(n):
        f = images.create_file(f"{v:05d}_rgb")
        f.write_raw(b"\xff\xd8fake", "jpg")
        a = 2 * np.pi * v / n
        pose = [40 * np.cos(a), 40 * np.sin(a), 10.0, np.degrees(a), 0]
        if v < 3:  # 90 deg arc of bad poses
            pose = [pose[0] + 100, pose[1], pose[2], pose[3], 0]
        f.set_metadata({"channel": "rgb", "approximate_pose": pose})

    os.environ["COLMAP_WD"] = str(tmp_path / "wd2")
    os.environ["FAKE_COLMAP_TRUE_CIRCLE"] = "1"  # SfM finds the true circle
    try:
        ctx = RunContext(temp_db, "s2", config={
            "Colmap": {"distance_threshold": 5.0, "max_blind_angle": 20.0}})
        ctx.get_task("Colmap").retry_count = 1  # keep the test fast
        with pytest.raises(TaskFailure):
            run_task(ctx, "Colmap", report=False)
    finally:
        os.environ.pop("COLMAP_WD", None)
        os.environ.pop("FAKE_COLMAP_TRUE_CIRCLE", None)
    # images in the bad arc were flagged
    flags = [f.get_metadata("pose_estimation") for f in images.get_files()]
    assert flags.count("incorrect") == 3


def test_runner_version_validation(fake_colmap, tmp_path):
    """Version < 3.6 is rejected (reference colmap.py:757-761)."""
    from plant3dvision_tpu.colmap.runner import (ColmapError, ColmapRunner,
                                                 parse_colmap_version)

    assert parse_colmap_version("COLMAP 3.8 -- SfM") == (3, 8)
    assert parse_colmap_version("COLMAP 3.11.1-dev") == (3, 11)
    assert parse_colmap_version("garbage") is None

    os.environ["FAKE_COLMAP_VERSION"] = "3.5"
    try:
        runner = ColmapRunner([], workdir=tmp_path / "wd_v")
        with pytest.raises(ColmapError, match="3.6 is required"):
            runner.validate_exe()
    finally:
        os.environ.pop("FAKE_COLMAP_VERSION", None)
    runner = ColmapRunner([], workdir=tmp_path / "wd_v2")
    runner.validate_exe()
    assert runner.version == (3, 8)


def test_runner_picks_largest_reconstruction(temp_db, fake_colmap, tmp_path):
    """With several mapper outputs, the biggest model is used; the
    analyzer stats are captured (reference weakness: assumed sparse/0)."""
    scan = temp_db.create_scan("s3")
    images = scan.create_fileset("images")
    for v in range(6):
        f = images.create_file(f"{v:05d}_rgb")
        f.write_raw(b"\xff\xd8fake", "jpg")
        a = 2 * np.pi * v / 6
        f.set_metadata({"channel": "rgb",
                        "approximate_pose": [40 * np.cos(a), 40 * np.sin(a),
                                             10.0, np.degrees(a), 0]})
    from plant3dvision_tpu.colmap.runner import ColmapRunner
    os.environ["FAKE_COLMAP_EXTRA_MODEL"] = "1"
    try:
        runner = ColmapRunner(images.get_files(), workdir=tmp_path / "wd3")
        points, imgs, cams, sparse, dense, bbox = runner.run()
    finally:
        os.environ.pop("FAKE_COLMAP_EXTRA_MODEL", None)
    assert runner.model_dir.name == "0"          # 6 imgs > 2 imgs
    assert len(imgs) == 6
    assert runner.analyzer_stats and "Points" in runner.analyzer_stats


def test_runner_newer_version_aligner_arg(temp_db, fake_colmap, tmp_path):
    """COLMAP > 3.9 gets 'alignment_max_error' (the fake asserts the
    spelling matches the version it reports)."""
    scan = temp_db.create_scan("s4")
    images = scan.create_fileset("images")
    for v in range(4):
        f = images.create_file(f"{v:05d}_rgb")
        f.write_raw(b"\xff\xd8fake", "jpg")
        a = 2 * np.pi * v / 4
        f.set_metadata({"channel": "rgb",
                        "approximate_pose": [40 * np.cos(a), 40 * np.sin(a),
                                             10.0, np.degrees(a), 0]})
    from plant3dvision_tpu.colmap.runner import ColmapRunner
    os.environ["FAKE_COLMAP_VERSION"] = "3.10"
    try:
        runner = ColmapRunner(images.get_files(), workdir=tmp_path / "wd4")
        runner.run()
        assert runner.version == (3, 10)
    finally:
        os.environ.pop("FAKE_COLMAP_VERSION", None)


def test_dense_array_codec(tmp_path):
    """COLMAP dense depth/normal map codec (reference
    thirdparty/read_dense.py:36-51 format: 'w&h&c&' + column-major f32)."""
    from plant3dvision_tpu.colmap.read_model import read_array, write_array

    depth = np.arange(15, dtype=np.float32).reshape(3, 5)
    p = tmp_path / "img.jpg.photometric.bin"
    write_array(depth, p)
    # header is ASCII w&h&c& followed by Fortran-order float32 payload
    raw = p.read_bytes()
    assert raw.startswith(b"5&3&1&")
    assert np.array_equal(read_array(p), depth)

    normals = np.random.default_rng(0).normal(size=(4, 6, 3)).astype(np.float32)
    p2 = tmp_path / "img.jpg.geometric.bin"
    write_array(normals, p2)
    assert np.array_equal(read_array(p2), normals)


def test_check_scan_parameters(temp_db):
    """ScanPath acquisition compatibility between a scan and a calibration
    scan (reference tasks/colmap.py:315-387)."""
    from plant3dvision_tpu.tasks.colmap import check_scan_parameters

    a = temp_db.create_scan("scan_sp_a")
    b = temp_db.create_scan("scan_sp_b")
    # no scan.toml on either side: unverifiable, passes with a warning
    assert check_scan_parameters(a, b)

    toml_a = ('[ScanPath]\nclass_name = "Circle"\n'
              '[ScanPath.kwargs]\nn_points = 60\nradius = 350\n')
    (a.path() / "scan.toml").write_text(toml_a)
    (b.path() / "scan.toml").write_text(toml_a)
    assert check_scan_parameters(a, b)

    (b.path() / "scan.toml").write_text(
        '[ScanPath]\nclass_name = "Circle"\n'
        '[ScanPath.kwargs]\nn_points = 36\nradius = 350\n')
    assert not check_scan_parameters(a, b)

    (b.path() / "scan.toml").write_text(toml_a.replace("Circle", "Spiral"))
    assert not check_scan_parameters(a, b)


def test_check_colmap_cfg(temp_db):
    """Colmap parameters must match the calibration scan's pipeline.toml
    backup (reference tasks/colmap.py:389-427)."""
    import pytest
    from plant3dvision_tpu.tasks.colmap import check_colmap_cfg

    calib = temp_db.create_scan("scan_cc")
    cur = {"single_camera": True, "camera_model": "OPENCV"}
    with pytest.raises(ValueError, match="pipeline.toml"):
        check_colmap_cfg(cur, calib)

    (calib.path() / "pipeline.toml").write_text(
        '[ExtrinsicCalibration]\nsingle_camera = true\n'
        'camera_model = "OPENCV"\n')
    check_colmap_cfg(cur, calib)  # matches

    with pytest.raises(ValueError, match="camera_model"):
        check_colmap_cfg({"single_camera": True,
                          "camera_model": "SIMPLE_RADIAL"}, calib)


def test_colmap_task_fixed_intrinsics(temp_db, fake_colmap, tmp_path,
                                      monkeypatch):
    """intrinsic_calibration_scan_id fixes the camera parameters from the
    calibration scan's camera_model.json and freezes the mapper's
    intrinsic refinement (reference tasks/colmap.py:662-664, :614-648)."""
    from plant3dvision_tpu.fsdb import io as fio
    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.tasks.colmap import (
        camera_params_from_intrinsic_calibration)
    import plant3dvision_tpu.colmap.runner as runner_mod

    calib = temp_db.create_scan("calib_intr")
    cm_fs = calib.create_fileset("IntrinsicCalibration_x_abc123")
    fio.write_json(cm_fs.get_file("camera_model", create=True), {
        "SIMPLE_RADIAL": {"model": "SIMPLE_RADIAL",
                          "params": [1400.0, 720.0, 540.0, -0.02],
                          "rms": 0.4},
        "OPENCV": {"model": "OPENCV",
                   "params": [1400.0, 1401.0, 720.0, 540.0,
                              -0.02, 0.001, 0.0, 0.0], "rms": 0.3}})

    params = camera_params_from_intrinsic_calibration(
        temp_db, "calib_intr", "SIMPLE_RADIAL")
    assert params == [1400.0, 720.0, 540.0, -0.02]
    with pytest.raises(ValueError, match="no 'RADIAL' fit"):
        camera_params_from_intrinsic_calibration(temp_db, "calib_intr",
                                                 "RADIAL")
    with pytest.raises(ValueError, match="not found"):
        camera_params_from_intrinsic_calibration(temp_db, "nope", "OPENCV")

    scan = temp_db.create_scan("s_intr")
    images = scan.create_fileset("images")
    for v in range(6):
        f = images.create_file(f"{v:05d}_rgb")
        f.write_raw(b"\xff\xd8fake", "jpg")
        a = 2 * np.pi * v / 6
        f.set_metadata({"channel": "rgb",
                        "approximate_pose": [40 * np.cos(a), 40 * np.sin(a),
                                             10.0, np.degrees(a), 0]})

    captured = {}
    real_runner = runner_mod.ColmapRunner

    def capturing_runner(*args, **kwargs):
        captured.update(kwargs.get("all_cli_args") or {})
        return real_runner(*args, **kwargs)

    monkeypatch.setattr(runner_mod, "ColmapRunner", capturing_runner)
    os.environ["COLMAP_WD"] = str(tmp_path / "wd_intr")
    try:
        ctx = RunContext(temp_db, "s_intr", config={"Colmap": {
            "intrinsic_calibration_scan_id": "calib_intr",
            "camera_model": "SIMPLE_RADIAL", "align_pcd": True}})
        report = run_task(ctx, "Colmap", report=False)
    finally:
        os.environ.pop("COLMAP_WD", None)
    assert report["Colmap"]["status"] == "done"
    fe = captured["feature_extractor"]
    assert fe["--ImageReader.camera_params"] == "1400.0,720.0,540.0,-0.02"
    assert captured["mapper"]["--Mapper.ba_refine_focal_length"] == "0"
    assert captured["mapper"]["--Mapper.ba_refine_extra_params"] == "0"


def test_colmap_task_extrinsic_calibration_scan(temp_db, fake_colmap,
                                                tmp_path, monkeypatch):
    """Full extrinsic-calibration reuse: compatibility checks pass, poses
    are injected, and the calibration COLMAP camera is fixed (reference
    tasks/colmap.py:658-661 + use_precalibrated_poses :234-312)."""
    from plant3dvision_tpu.fsdb import io as fio
    from plant3dvision_tpu.runtime import RunContext, run_task
    import plant3dvision_tpu.colmap.runner as runner_mod

    scan_toml = ('[ScanPath]\nclass_name = "Circle"\n'
                 '[ScanPath.kwargs]\nn_points = 6\nradius = 40\n')

    calib = temp_db.create_scan("calib_ext")
    (calib.path() / "scan.toml").write_text(scan_toml)
    (calib.path() / "pipeline.toml").write_text(
        '[ExtrinsicCalibration]\nsingle_camera = true\n'
        'camera_model = "SIMPLE_RADIAL"\n')
    calib_poses = []
    calib_imgs = calib.create_fileset("images")
    for v in range(6):
        f = calib_imgs.create_file(f"{v:05d}_rgb")
        f.write_raw(b"\xff\xd8fake", "jpg")
        a = 2 * np.pi * v / 6
        pose = [40 * np.cos(a) + 0.1, 40 * np.sin(a) - 0.1, 10.0]
        calib_poses.append(pose)
        f.set_metadata("calibrated_pose", pose)
    ext_fs = calib.create_fileset("ExtrinsicCalibration_x_deadbeef")
    fio.write_json(ext_fs.get_file("cameras", create=True), {
        "1": {"id": 1, "model": "SIMPLE_RADIAL", "width": 1440,
              "height": 1080, "params": [1400.0, 720.0, 540.0, -0.02]}})

    scan = temp_db.create_scan("s_ext")
    (scan.path() / "scan.toml").write_text(scan_toml)
    images = scan.create_fileset("images")
    for v in range(6):
        f = images.create_file(f"{v:05d}_rgb")
        f.write_raw(b"\xff\xd8fake", "jpg")
        a = 2 * np.pi * v / 6
        f.set_metadata({"channel": "rgb",
                        "approximate_pose": [40 * np.cos(a), 40 * np.sin(a),
                                             10.0, np.degrees(a), 0]})

    captured = {}
    real_runner = runner_mod.ColmapRunner

    def capturing_runner(*args, **kwargs):
        captured.update(kwargs.get("all_cli_args") or {})
        return real_runner(*args, **kwargs)

    monkeypatch.setattr(runner_mod, "ColmapRunner", capturing_runner)
    os.environ["COLMAP_WD"] = str(tmp_path / "wd_ext")
    try:
        ctx = RunContext(temp_db, "s_ext", config={"Colmap": {
            "extrinsic_calibration_scan_id": "calib_ext",
            "camera_model": "SIMPLE_RADIAL", "align_pcd": True}})
        report = run_task(ctx, "Colmap", report=False)
    finally:
        os.environ.pop("COLMAP_WD", None)
    assert report["Colmap"]["status"] == "done"
    # camera fixed from the calibration scan's COLMAP camera
    fe = captured["feature_extractor"]
    assert fe["--ImageReader.camera_model"] == "SIMPLE_RADIAL"
    assert fe["--ImageReader.camera_params"] == "1400.0,720.0,540.0,-0.02"
    # poses injected
    poses = [f.get_metadata("calibrated_pose")
             for f in ctx.scan.get_fileset("images").get_files()]
    assert poses == calib_poses

    # an incompatible acquisition config must refuse to calibrate
    (scan.path() / "scan.toml").write_text(scan_toml.replace("40", "35"))
    ctx2 = RunContext(temp_db, "s_ext", config={"Colmap": {
        "extrinsic_calibration_scan_id": "calib_ext",
        "camera_model": "SIMPLE_RADIAL", "align_pcd": True,
        "cli_args": {"marker": {}}}})   # param change -> fresh fileset
    os.environ["COLMAP_WD"] = str(tmp_path / "wd_ext2")
    try:
        with pytest.raises(Exception) as excinfo:
            run_task(ctx2, "Colmap", report=False)
        assert "acquisition" in str(excinfo.value.__cause__)
    finally:
        os.environ.pop("COLMAP_WD", None)


def test_normalize_cnc_poses_dialects():
    """Pose-metadata dialects across the reference's shipped fixtures:
    real rigs log [X, Y, Z, pan_deg, tilt_deg] (real_plant), the virtual
    scanner logs radians with pan in the LAST column (arabidopsis000)."""
    import numpy as np

    from plant3dvision_tpu.tasks.colmap import normalize_cnc_poses

    # real_plant dialect: degrees, pan in column 3 -> unchanged
    real = np.array([[75.0, 375.0, 80, 270.0 + 6 * i, 0] for i in range(60)])
    out, applied = normalize_cnc_poses(real)
    assert applied == []
    np.testing.assert_allclose(out, real)

    # arabidopsis000 dialect: radians, constant tilt in col 3, orbit pan
    # in col 4 -> converted + swapped
    virt = np.array([[350 * np.cos(np.radians(5 * i)),
                      350 * np.sin(np.radians(5 * i)), 600.0,
                      np.pi / 3, np.pi / 2 + np.radians(5 * i)]
                     for i in range(72)])
    out, applied = normalize_cnc_poses(virt)
    assert applied == ["radians->degrees", "pan/tilt swapped",
                       "euler rx->tilt"]
    # rx=60 deg from straight-down = 30 deg look-down = tilt -30
    np.testing.assert_allclose(out[:, 4], -30.0, atol=1e-4)      # tilt
    np.testing.assert_allclose(out[0, 3], 90.0, atol=1e-4)       # pan_0
    np.testing.assert_allclose(out[10, 3], 140.0, atol=1e-3)

    # degenerate: all-zero angles (single-view rig) -> untouched
    flat = np.array([[0.0, 100.0, 50.0, 0.0, 0.0]] * 4)
    out, applied = normalize_cnc_poses(flat)
    assert applied == []
