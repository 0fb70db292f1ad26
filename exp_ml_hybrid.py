"""HYBRID ML route on the real_plant fixture: geometric carve volume +
CNN organ labels.

The committed ML route (exp_distill_real.py) carves the volume from the
CNN's probability masks; its recall ceiling is the distilled net's thin-
pedicel recall (19 angles vs the geometric route's 29 — ML_REAL_REPORT).
The reference supports the complementary composition (reference
tasks/proc3d.py:185-253: SegmentedPointCloud takes ANY point cloud +
ANY 2D segmentation): carve from the geometric excess-green masks
(recall-optimal, 29/29 organs) and use the CNN only to LABEL the points
by reprojection scoring. This script measures that hybrid:

  Masks(excess_green) -> Voxels(carving, kill_tolerance) -> PointCloud
       x  Segmentation2D(segnet_real, soft)  ->  SegmentedPointCloud
       -> OrganSegmentation -> AnglesAndInternodes -> DTW vs measures.json

Reuses /tmp/distill_db so calibration, masks, carve, point cloud and CNN
inference are all cache hits; only the labeling/clustering/angles tail
computes.

Usage: python exp_ml_hybrid.py [--eps 2.0] [--mfs 10] ...
"""

import argparse
import json
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
CKPT = REPO / "checkpoints" / "segnet_real.npz"
REPORT = REPO / "ML_REAL_REPORT.json"


def hybrid_cfg(eps=2.0, min_points=5, min_fruit_size=10.0,
               min_elongation_ratio=1.0, sx=1408, sy=1056, batch_size=8,
               resize=False):
    from plant3dvision_tpu.runtime.config import load_toml

    base = load_toml(REPO / "configs" / "geom_pipe_real_selfcal.toml")
    cfg = {k: base[k] for k in
           ("TurntableCalibration", "Undistorted", "Masks", "Voxels",
            "PointCloud")}
    cfg["ModelFilesetExists"] = {"scan_id": "models"}
    # identical to the committed ML-route Segmentation2D params so the
    # fileset hash matches the cached CNN inference
    cfg["Segmentation2D"] = {
        "upstream_task": "Undistorted",
        "query": {"channel": "rgb"},
        "model_id": "segnet_real",
        "Sx": sx, "Sy": sy,
        "binarize": False, "threshold": 0.2, "dilation": 0,
        "batch_size": batch_size}
    if resize:  # only set when used so the full-res fileset hash is stable
        cfg["Segmentation2D"]["resize"] = True
    cfg["SegmentedPointCloud"] = {
        "upstream_task": "PointCloud",
        "upstream_segmentation": "Segmentation2D",
        "use_colmap_poses": True}
    cfg["OrganSegmentation"] = {
        "upstream_task": "SegmentedPointCloud",
        "eps": eps, "min_points": min_points}
    cfg["AnglesAndInternodes"] = {
        "upstream_task": "OrganSegmentation",
        "organ_type": "fruit", "stem_axis": 2,
        "min_elongation_ratio": min_elongation_ratio,
        "min_fruit_size": min_fruit_size}
    cfg["AnglesAndInternodesEvaluation"] = {
        "upstream_task": "AnglesAndInternodes",
        "ground_truth": "ImagesFilesetExists",
        "free_ends": 0.4, "free_ends_eps": 1e-2}
    return cfg


def run_hybrid(db, **kw):
    from plant3dvision_tpu.models.zoo import install_checkpoint
    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.utils import locate_task_filesets

    install_checkpoint(db, model_id="segnet_real", path=CKPT)
    db._load_scans()
    cfg = hybrid_cfg(**kw)
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
    print(f"[hybrid] {res}", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eps", type=float, default=2.0)
    ap.add_argument("--min-points", type=int, default=5)
    ap.add_argument("--mfs", type=float, default=10.0)
    ap.add_argument("--mer", type=float, default=1.0)
    ap.add_argument("--sx", type=int, default=1408)
    ap.add_argument("--sy", type=int, default=1056)
    ap.add_argument("--resize", action="store_true")
    ap.add_argument("--save", action="store_true",
                    help="record result under ml_route_hybrid in "
                         "ML_REAL_REPORT.json")
    args = ap.parse_args()

    from exp_distill_real import _backend_stamp, get_db
    db = get_db()
    try:
        res = run_hybrid(db, eps=args.eps, min_points=args.min_points,
                         min_fruit_size=args.mfs,
                         min_elongation_ratio=args.mer,
                         sx=args.sx, sy=args.sy, resize=args.resize)
        if args.save:
            report = json.loads(REPORT.read_text()) if REPORT.exists() else {}
            report["stamp"] = _backend_stamp()
            report["ml_route_hybrid"] = res
            REPORT.write_text(json.dumps(report, indent=1))
            print(f"[hybrid] saved -> {REPORT}")
    finally:
        db.disconnect()


if __name__ == "__main__":
    main()
