"""Task-level integration tests for the cylinder-radius evaluation pair and
the Visualization task — the analogues of the reference's
tests/integration/test_cylinder_estimation.py and test_visualization.py.
"""

import json
import zipfile
from pathlib import Path

import pytest

from plant3dvision_tpu.fsdb import io
from plant3dvision_tpu.fsdb.testing import TemporaryDB
from plant3dvision_tpu.runtime import RunContext, run_task
from plant3dvision_tpu.runtime.config import load_toml
from plant3dvision_tpu.synth import SyntheticPlant, generate_scan

REPO = Path(__file__).resolve().parents[2]


def test_cylinder_radius_tasks():
    """CylinderRadiusGroundTruth -> CylinderRadiusEstimation on a bare scan
    with the shipped virtual_cylinder preset (reference
    tests/integration/test_cylinder_estimation.py:9-55, delta 0.1)."""
    with TemporaryDB() as db:
        db.create_scan("cyl")
        ctx = RunContext(db, "cyl", load_toml(REPO / "configs" / "virtual_cylinder.toml"))
        report = run_task(ctx, "CylinderRadiusEstimation", report=False)

        gt_fs = ctx.scan.get_fileset(report["CylinderRadiusGroundTruth"]["fileset"])
        gt_file = gt_fs.get_files()[0]
        gt_radius = gt_file.get_metadata("radius")
        gt_height = gt_file.get_metadata("height")
        assert gt_radius and gt_height  # reference asserts non-empty metadata
        assert gt_file.path().exists()

        est_fs = ctx.scan.get_fileset(report["CylinderRadiusEstimation"]["fileset"])
        out = json.loads(est_fs.get_files()[0].read_raw())
        assert abs(out["calculated_radius"] - gt_radius) < 0.1
        assert out["gt_radius"] == gt_radius


@pytest.fixture(scope="module")
def viz_db():
    with TemporaryDB() as db:
        plant = SyntheticPlant(n_fruits=8, divergence_deg=137.5,
                               internode=6.0, stem_radius=2.5,
                               fruit_radius=1.8, fruit_length=25.0)
        generate_scan(db, "viz", n_views=8, width=256, height=256,
                      f=340.0, plant=plant)
        yield db


def test_visualization_images_only(viz_db):
    """Visualization on a scan with no pipeline outputs (reference
    test_visualization.py test_real_plant_empty: the task must succeed
    with images alone)."""
    ctx = RunContext(viz_db, "viz", {"Visualization": {"make_zip": True,
                                                       "thumbnail_size": 64,
                                                       "max_image_size": 128}})
    report = run_task(ctx, "Visualization", report=False)
    fs = ctx.scan.get_fileset(report["Visualization"]["fileset"])
    ids = {f.id for f in fs.get_files()}
    # one downsized image + one thumbnail per view, plus the scan zip
    assert sum(i.startswith("image_") for i in ids) == 8
    assert sum(i.startswith("thumbnail_") for i in ids) == 8
    zf = fs.get_file("scan")
    assert zf is not None and (fs.path() / "scan.zip").exists()
    with zipfile.ZipFile(fs.path() / "scan.zip") as z:
        assert len(z.namelist()) >= 16


def test_visualization_after_pipeline(viz_db):
    """Visualization after the geometric pipeline bundles the 3D artifacts
    (reference test_visualization.py test_real_plant)."""
    cfg = load_toml(REPO / "configs" / "geom_pipe_synth.toml")
    # different params than the images-only test -> different fileset hash
    # (same-params rerun would be skipped as already complete, as in luigi)
    cfg.setdefault("Visualization", {}).update(
        {"make_zip": True, "thumbnail_size": 64, "max_image_size": 200})
    ctx = RunContext(viz_db, "viz", cfg)
    run_task(ctx, "AnglesAndInternodes", report=False)
    report = run_task(ctx, "Visualization", report=False)
    fs = ctx.scan.get_fileset(report["Visualization"]["fileset"])

    pcd_file = fs.get_file("PointCloud")
    assert pcd_file is not None
    assert len(io.read_point_cloud(pcd_file)) > 100
    assert fs.get_file("CurveSkeleton") is not None
    seq = json.loads(fs.get_file("AnglesAndInternodes").read_raw())
    assert len(seq["angles"]) > 3
    # figure artifacts registered with real files behind them
    for fig in ("pointcloud_figure", "skeleton_figure", "sequences_figure"):
        f = fs.get_file(fig)
        assert f is not None and (fs.path() / f.filename).exists()


def test_angles_evaluation_alignment_figure():
    """AnglesAndInternodesEvaluation writes the DTW alignment figure into
    its output fileset as a first-class QC artifact (reference
    tasks/evaluation.py:718-725), alongside the JSON results."""
    with TemporaryDB() as db:
        scan = db.create_scan("figtest")
        # manual ground truth (real-scan route: measures.json at scan root)
        (scan.path()).mkdir(parents=True, exist_ok=True)
        (scan.path() / "measures.json").write_text(json.dumps(
            {"angles": [137.5] * 8, "internodes": [6.0] * 8}))
        # staged upstream AnglesAndInternodes output
        fs = scan.get_fileset("angles", create=True)
        io.write_json(fs.get_file("AnglesAndInternodes", create=True),
                      {"angles": [139.0] * 8, "internodes": [5.8] * 8})
        # marker GT fileset (ImagesFilesetExists needs a non-empty 'images')
        imgs = scan.get_fileset("images", create=True)
        io.write_json(imgs.get_file("dummy", create=True), {})

        cfg = {"AnglesAndInternodesEvaluation": {
                   "upstream_task": "NamedFilesetExists",
                   "ground_truth": "ImagesFilesetExists",
                   "free_ends": 0.0},
               "NamedFilesetExists": {"fileset_id": "angles"}}
        ctx = RunContext(db, "figtest", cfg)
        report = run_task(ctx, "AnglesAndInternodesEvaluation", report=False)

        efs = ctx.scan.get_fileset(
            report["AnglesAndInternodesEvaluation"]["fileset"])
        res = json.loads(efs.get_file("AnglesAndInternodesEvaluation").read_raw())
        assert res["mean_angle_error"] < 2.0
        fig = efs.get_file("alignment_figure")
        assert fig is not None
        assert (efs.path() / fig.filename).exists()
