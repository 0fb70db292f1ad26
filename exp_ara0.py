"""COLMAP-free geometric route on the reference's THIRD fixture,
arabidopsis000 (72 virtual 960x540 views on a Voronoi-textured floor,
exact-ish 'pose' metadata; the reference uses it only to exercise the
external COLMAP binary, tests/unit/test_colmap.py:16-46).

No trait ground truth ships with it, so the oracle is structural: the
reference's own angle-count oracle (len(angles) > 10,
tests/integration/test_anglesandinternodes.py:38-39) plus calibration
coherence and plant-extent sanity.

Usage: python exp_ara0.py [--voxel 1.0] [--mask-thr 0.15]
"""

import argparse
import json
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
DB_PATH = Path("/tmp/ara0_db")


def get_db():
    from plant3dvision_tpu import fixtures
    from plant3dvision_tpu.fsdb.db import FSDB

    DB_PATH.mkdir(exist_ok=True)
    (DB_PATH / "romidb").touch()
    db = FSDB(str(DB_PATH))
    db.connect(unsafe=True)
    if db.get_scan("arabidopsis000") is None:
        fixtures.load_reference_scan(db, "arabidopsis000")
    return db


def cfg(voxel=1.0, mask_thr=0.15, kill_tolerance=3, f_init=700.0,
        bin_size=6.0, node_sampling_dist=14.0, min_fruit_size=10.0,
        budget="full"):
    c = {
        "TurntableCalibration": {
            "upstream_task": "ImagesFilesetExists",
            # no channel metadata on this fixture -> match-all query
            "query": {}, "mask_type": "excess_green", "mask_threshold": 0.1,
            "f_init": f_init, "downsample": 4,
            # the fixture workspace is 400x400x990 mm — 4 mm hull voxels
            # crashed the TPU worker (program too big); 8 mm is plenty
            "voxel_mm": 8.0, "feature_ba": True},
        "Masks": {"upstream_task": "ImagesFilesetExists",
                  "upstream_pose": "TurntableCalibration",
                  "type": "excess_green",
                  "threshold": mask_thr, "dilation": 2, "binarize": True},
        "Voxels": {"upstream_mask": "Masks",
                   "upstream_colmap": "TurntableCalibration",
                   "camera_metadata": "colmap_camera",
                   "voxel_size": voxel, "type": "carving",
                   "kill_tolerance": kill_tolerance},
        "PointCloud": {"upstream_task": "Voxels", "level_set_value": 2.0},
        "CurveSkeleton": {"upstream_task": "PointCloud",
                          "bin_size": bin_size, "k": 10,
                          "stem_axis_inverted": False},
        "RefineSkeleton": {"upstream_task": "CurveSkeleton",
                           "upstream_pcd": "PointCloud",
                           "alpha": 5.0, "beta": 5.0, "knn_mst": True},
        "TreeGraph": {"upstream_task": "RefineSkeleton", "z_axis": 2,
                      "stem_axis_inverted": False},
        "AnglesAndInternodes": {"upstream_task": "TreeGraph",
                                "method": "legacy", "organ_type": "fruit",
                                "node_sampling_dist": node_sampling_dist,
                                "min_fruit_size": min_fruit_size},
    }
    if budget == "test":
        c["TurntableCalibration"].update({
            "cem_pop": 32, "cem_iters": 8, "feature_downsample": 2,
            "strides": [1, 2, 4, 7], "polish_rounds": 2})
    return c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxel", type=float, default=1.0)
    ap.add_argument("--mask-thr", type=float, default=0.15)
    ap.add_argument("--f-init", type=float, default=700.0)
    ap.add_argument("--budget", default="full")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize otherwise "
                         "registers the TPU; env JAX_PLATFORMS is not enough)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.utils import locate_task_filesets

    db = get_db()
    try:
        ctx = RunContext(db, "arabidopsis000",
                         cfg(voxel=args.voxel, mask_thr=args.mask_thr,
                             f_init=args.f_init, budget=args.budget))
        t0 = time.time()
        report = run_task(ctx, "AnglesAndInternodes", report=False)
        secs = round(time.time() - t0, 1)

        def _fs(name):
            fs = report.get(name, {}).get("fileset")
            if not fs:
                fs = locate_task_filesets(ctx.scan, [name])[name]
            return ctx.scan.get_fileset(fs)

        out = json.loads(_fs("AnglesAndInternodes")
                         .get_file("AnglesAndInternodes").read_raw())
        cal = json.loads(_fs("TurntableCalibration")
                         .get_file("calibration").read_raw())
        res = {"n_angles": len(out["angles"]),
               "angles": [round(a, 1) for a in out["angles"]],
               "internodes": [round(i, 1) for i in out["internodes"]],
               "coherence": cal.get("coherence"),
               "rms_px": (cal.get("feature_ba") or {}).get("rms_px"),
               "f": cal.get("theta", {}).get("f"), "seconds": secs}
        print(f"[ara0] {json.dumps(res)}")
    finally:
        db.disconnect()


if __name__ == "__main__":
    main()
