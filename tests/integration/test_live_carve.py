"""bin/live_carve: streaming acquisition-time carving CLI.

Drives the tool as a subprocess over a synthetic scan directory (as if
the imager had just finished writing it) and checks the final volume is
bit-identical to the batch fused carve of the same masks."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

import pytest

REPO = Path(__file__).resolve().parents[2]


@pytest.fixture()
def synth_scan(tmp_path):
    from plant3dvision_tpu.fsdb import FSDB
    from plant3dvision_tpu.synth import SyntheticPlant, generate_scan

    (tmp_path / "romidb").touch()
    db = FSDB(tmp_path)
    db.connect(unsafe=True)
    plant = SyntheticPlant(n_fruits=6, stem_radius=2.5, fruit_radius=1.8,
                           fruit_length=20.0, internode=6.0)
    generate_scan(db, "live", n_views=12, width=160, height=160, f=210.0,
                  plant=plant)
    scan = db.get_scan("live")
    bbox = scan.get_metadata("bounding_box")
    db.disconnect()
    return tmp_path / "live", bbox


def test_live_carve_matches_batch(synth_scan, tmp_path):
    scan_dir, bbox = synth_scan
    out = tmp_path / "live_volume.npz"
    bbox_arg = ",".join(str(v) for ax in ("x", "y", "z") for v in bbox[ax])
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, str(REPO / "bin" / "live_carve"), str(scan_dir),
         f"--bbox={bbox_arg}", "--voxel-size", "1.0", "--filter", "linear",
         "--threshold", "0.3", "--every", "5", "--idle-stop", "2",
         "--poll", "0.2", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=600)
    assert res.returncode == 0, res.stderr
    assert out.exists()
    meta = json.loads(out.with_suffix(".json").read_text())
    assert meta["n_views"] == 12 and meta["state"] == "final"
    live = np.load(out)["volume"]

    # batch oracle: same masks, fused engine
    import cv2

    import jax

    jax.config.update("jax_platforms", "cpu")
    from plant3dvision_tpu.ops.carving import camera_from_metadata
    from plant3dvision_tpu.ops.masks import compute_mask_numpy
    from plant3dvision_tpu.parallel.carving_mp import carve_fused

    masks, cams = [], []
    for img in sorted((scan_dir / "images").glob("*")):
        md = json.loads(
            (scan_dir / "metadata" / "images" / (img.stem + ".json"))
            .read_text())
        rgb = cv2.cvtColor(cv2.imread(str(img)), cv2.COLOR_BGR2RGB)
        masks.append(compute_mask_numpy(rgb, filter_type="linear",
                                        coefs=(0.0, 1.0, 0.0),
                                        threshold=0.3, binarize=True,
                                        as_bool=True))
        cams.append(camera_from_metadata(md["camera"]))
    masks, cams = np.stack(masks), np.stack(cams)
    origin = np.array([bbox["x"][0], bbox["y"][0], bbox["z"][0]], np.float32)
    shape = tuple(int(bbox[a][1] - bbox[a][0]) + 1 for a in ("x", "y", "z"))
    alive = carve_fused(masks, cams, np.ones(len(masks), bool), origin,
                        1.0, shape, out="alive")
    assert live.shape == alive.shape
    np.testing.assert_array_equal(live.astype(bool), alive)
    assert alive.sum() > 100  # a plant actually carved out


def test_live_carve_real_fixture_replay(tmp_path):
    """Streaming carve over a REPLAYED real_plant acquisition (VERDICT r3
    #10): the fixture's 60 photos are copied into the scan directory
    while live_carve watches (timed copy-in, as if the imager were
    writing), with per-image `colmap_camera` metadata from the
    committed TurntableCalibration result (bench_assets). The final
    streaming volume must be bit-identical to the batch fused carve of
    the same real masks."""
    import shutil
    import threading
    import time

    from plant3dvision_tpu import fixtures

    if not fixtures.has_reference_testdata("real_plant"):
        pytest.skip("reference testdata not available")

    asset = np.load(REPO / "bench_assets" / "real_fixture.npz",
                    allow_pickle=False)
    ids = [str(s) for s in asset["ids"]]
    cams = np.asarray(asset["cams"], np.float32)
    H, W = (int(x) for x in asset["hw"])

    src = fixtures.REF_TESTDATA / "real_plant"
    scan_dir = tmp_path / "replay"
    (tmp_path / "romidb").touch()
    (scan_dir / "images").mkdir(parents=True)
    (scan_dir / "metadata" / "images").mkdir(parents=True)

    def cam_md(c):
        return {"colmap_camera": {
            "camera_model": {"params": [float(x) for x in c[:4]]},
            "rotmat": np.asarray(c[4:13], float).reshape(3, 3).tolist(),
            "tvec": [float(x) for x in c[13:16]]}}

    def stage(i):
        fid = ids[i]
        img = next(src.glob(f"images/{fid}.*"))
        json_path = scan_dir / "metadata" / "images" / f"{fid}.json"
        json_path.write_text(json.dumps(cam_md(cams[i])))
        shutil.copy(img, scan_dir / "images" / img.name)

    # first third present before the watcher starts
    n = len(ids)
    for i in range(n // 3):
        stage(i)

    def writer():
        for i in range(n // 3, n):
            time.sleep(0.15)
            stage(i)

    th = threading.Thread(target=writer)
    out = tmp_path / "live_volume.npz"
    th.start()
    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        res = subprocess.run(
            [sys.executable, str(REPO / "bin" / "live_carve"),
             str(scan_dir),
             "--bbox=300,450,300,450,-175,105", "--voxel-size", "1.0",
             "--camera-metadata", "colmap_camera",
             "--filter", "linear", "--coefs", "0,1,0",
             "--threshold", "0.15", "--dilation", "3",
             "--every", "20", "--idle-stop", "4", "--poll", "0.3",
             "--out", str(out)],
            capture_output=True, text=True, env=env, timeout=900)
    finally:
        th.join()
    assert res.returncode == 0, res.stderr[-2000:]
    meta = json.loads(out.with_suffix(".json").read_text())
    assert meta["n_views"] == n and meta["state"] == "final"
    live = np.load(out)["volume"]

    # batch oracle on the SAME committed real masks
    import jax
    jax.config.update("jax_platforms", "cpu")
    from plant3dvision_tpu.parallel.carving_mp import carve_fused
    masks = np.unpackbits(asset["packed"], axis=1)[:, :H * W] \
        .reshape(-1, H, W).astype(bool)
    origin = np.array([300.0, 300.0, -175.0], np.float32)
    shape = (151, 151, 281)
    alive = carve_fused(masks, cams, np.ones(n, bool), origin, 1.0,
                        shape, out="alive")
    assert live.shape == alive.shape
    np.testing.assert_array_equal(live.astype(bool), alive)
    assert alive.sum() > 1000
