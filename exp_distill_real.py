"""Bootstrap a real-scan segmentation checkpoint by self-distillation and
run the FULL ML route on the reference's real_plant fixture with it.

Produces:
  checkpoints/segnet_real.npz   the distilled CNN (stem/fruit/background)
  ML_REAL_REPORT.json           backend-stamped artifact: pseudo-label
                                stats, held-out-view IoU, ML-route DTW
                                scores vs measures.json

Uses a persistent DB at /tmp/distill_db so the geometric route
(calibration, carve, skeleton) is computed once and reused across
parameter iterations.

Usage:
  python exp_distill_real.py            # everything
  python exp_distill_real.py --ml-only  # reuse committed checkpoint
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
DB_PATH = Path("/tmp/distill_db")
CKPT = REPO / "checkpoints" / "segnet_real.npz"
REPORT = REPO / "ML_REAL_REPORT.json"


def _backend_stamp():
    import jax
    d = jax.devices()[0]
    return {"backend": jax.default_backend(), "device": str(d),
            "ts": time.strftime("%Y-%m-%d %H:%M:%S")}


def get_db():
    from plant3dvision_tpu import fixtures
    from plant3dvision_tpu.fsdb.db import FSDB

    fresh = not (DB_PATH / "romidb").exists()
    DB_PATH.mkdir(exist_ok=True)
    (DB_PATH / "romidb").touch()
    db = FSDB(str(DB_PATH))
    db.connect(unsafe=True)
    if fresh or db.get_scan("real_plant") is None:
        fixtures.load_reference_scan(db, "real_plant")
    return db


def run_distill(db, steps=3000, arch="resunet", crop=448, per_view=12):
    from plant3dvision_tpu.models.checkpoint import params_to_npz_bytes
    from plant3dvision_tpu.models.distill import distill_scan
    from plant3dvision_tpu.runtime import RunContext
    from plant3dvision_tpu.runtime.config import load_toml

    cfg = load_toml(REPO / "configs" / "geom_pipe_real_selfcal.toml")
    ctx = RunContext(db, "real_plant", cfg)
    t0 = time.time()
    params, config, report = distill_scan(
        ctx, crop=crop, per_view=per_view, steps=steps, arch=arch)
    report["seconds"] = round(time.time() - t0, 1)
    CKPT.parent.mkdir(exist_ok=True)
    CKPT.write_bytes(params_to_npz_bytes(params, config))
    print(f"[distill] checkpoint -> {CKPT} ({CKPT.stat().st_size/1e6:.1f} MB)")
    print(f"[distill] heldout IoU: {report['heldout_iou']}")
    return report


def ml_route_cfg(voxel_size=1.0, level_set=0.2, background_prior=0.4,
                 min_score=3.0, eps=2.0, min_points=5, sx=1408, sy=1056,
                 binarize=False, min_contrast=1.0, min_fruit_size=10.0,
                 batch_size=8, resize=False):
    cfg = _ml_route_cfg(voxel_size, level_set, background_prior, min_score,
                        eps, min_points, sx, sy, binarize, min_contrast,
                        min_fruit_size, batch_size)
    if resize:  # only set when used so older fileset hashes stay stable
        cfg["Segmentation2D"]["resize"] = True
    return cfg


def _ml_route_cfg(voxel_size, level_set, background_prior, min_score, eps,
                  min_points, sx, sy, binarize, min_contrast,
                  min_fruit_size, batch_size):
    return {
        "ModelFilesetExists": {"scan_id": "models"},
        "Segmentation2D": {
            "upstream_task": "Undistorted",
            "query": {"channel": "rgb"},
            "model_id": "segnet_real",
            "Sx": sx, "Sy": sy,
            "binarize": binarize, "threshold": 0.2, "dilation": 0,
            "batch_size": batch_size},
        "Voxels": {
            "upstream_mask": "Segmentation2D",
            "upstream_colmap": "TurntableCalibration",
            "camera_metadata": "colmap_camera",
            "voxel_size": voxel_size, "type": "averaging", "log": False,
            "bounding_box": {"x": [300, 450], "y": [300, 450],
                             "z": [-175, 105]}},
        "PointCloud": {"upstream_task": "Voxels",
                       "level_set_value": level_set,
                       "background_prior": background_prior,
                       "min_contrast": min_contrast,
                       "min_score": min_score},
        "SegmentedPointCloud": {"upstream_task": "PointCloud",
                                "upstream_segmentation": "Segmentation2D",
                                "use_colmap_poses": True},
        "OrganSegmentation": {"upstream_task": "SegmentedPointCloud",
                              "eps": eps, "min_points": min_points},
        "AnglesAndInternodes": {"upstream_task": "OrganSegmentation",
                                "organ_type": "fruit", "stem_axis": 2,
                                "min_elongation_ratio": 1.0,
                                "min_fruit_size": min_fruit_size},
        "AnglesAndInternodesEvaluation": {
            "upstream_task": "AnglesAndInternodes",
            "ground_truth": "ImagesFilesetExists",
            "free_ends": 0.4, "free_ends_eps": 1e-2},
    }


def run_ml_route(db, **kw):
    from plant3dvision_tpu.models.zoo import install_checkpoint
    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.utils import locate_task_filesets

    install_checkpoint(db, model_id="segnet_real", path=CKPT)
    db._load_scans()
    cfg = ml_route_cfg(**kw)
    # base geom cfg supplies TurntableCalibration/Undistorted params so
    # their fileset hashes match the cached geometric route
    from plant3dvision_tpu.runtime.config import load_toml
    base = load_toml(REPO / "configs" / "geom_pipe_real_selfcal.toml")
    for k in ("TurntableCalibration", "Undistorted"):
        cfg[k] = base[k]
    ctx = RunContext(db, "real_plant", cfg)
    t0 = time.time()
    report = run_task(ctx, "AnglesAndInternodesEvaluation", report=False)
    secs = round(time.time() - t0, 1)

    def _fs(name):
        fs = report.get(name, {}).get("fileset")
        if not fs:
            fs = locate_task_filesets(ctx.scan, [name])[name]
        return ctx.scan.get_fileset(fs)

    out = json.loads(_fs("AnglesAndInternodes")
                     .get_file("AnglesAndInternodes").read_raw())
    ev = json.loads(_fs("AnglesAndInternodesEvaluation")
                    .get_files()[0].read_raw())
    res = {"n_angles": len(out["angles"]),
           "normalized_cost": ev.get("normalized_cost"),
           "mean_angle_error": ev.get("mean_angle_error"),
           "seconds": secs, "params": kw}
    print(f"[ml-route] {res}")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ml-only", action="store_true")
    ap.add_argument("--distill-only", action="store_true")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--arch", default="resunet")
    ap.add_argument("--voxel-size", type=float, default=1.0)
    ap.add_argument("--level-set", type=float, default=0.2)
    ap.add_argument("--background-prior", type=float, default=0.4)
    ap.add_argument("--min-score", type=float, default=3.0)
    ap.add_argument("--eps", type=float, default=2.0)
    ap.add_argument("--min-fruit-size", type=float, default=10.0)
    ap.add_argument("--binarize", action="store_true")
    ap.add_argument("--no-report", action="store_true")
    args = ap.parse_args()

    db = get_db()
    try:
        report = {"stamp": _backend_stamp()}
        if not args.ml_only:
            report["distill"] = run_distill(db, steps=args.steps,
                                            arch=args.arch)
        if not args.distill_only:
            report["ml_route"] = run_ml_route(
                db, voxel_size=args.voxel_size, level_set=args.level_set,
                background_prior=args.background_prior,
                min_score=args.min_score, eps=args.eps,
                min_fruit_size=args.min_fruit_size,
                binarize=args.binarize)
        if not args.no_report:
            old = json.loads(REPORT.read_text()) if REPORT.exists() else {}
            old.update(report)
            REPORT.write_text(json.dumps(old, indent=1))
            print(f"[report] -> {REPORT}")
    finally:
        db.disconnect()


if __name__ == "__main__":
    main()
