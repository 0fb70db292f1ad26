"""Accuracy experiments: real_plant COLMAP-free route, polish/BA variants.

Runs the reduced-budget real_plant pipeline (same config as
tests/integration/test_reference_data.py::test_real_plant_colmap_free_pipeline_dtw)
with variations of the TurntableCalibration polish/BA parameters and
prints one JSON line per variant with the DTW score vs measures.json.

Usage: python exp_real_acc.py [variant ...]   (default: all)
"""

import copy
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from plant3dvision_tpu import fixtures
from plant3dvision_tpu.fsdb.testing import TemporaryDB
from plant3dvision_tpu.runtime import RunContext, run_task

BASE_CFG = {
    "TurntableCalibration": {
        "query": {"channel": "rgb"}, "f_init": 1400.0,
        "cem_pop": 32, "cem_iters": 8,
        "feature_downsample": 2, "strides": [1, 2, 4, 7],
        "polish_rounds": 2,
    },
    "Masks": {"upstream_task": "ImagesFilesetExists",
              "upstream_pose": "TurntableCalibration",
              "query": {"channel": "rgb"},
              "type": "linear", "parameters": [0, 1, 0],
              "threshold": 0.15, "dilation": 3},
    "Voxels": {"upstream_mask": "Masks",
               "upstream_colmap": "TurntableCalibration",
               "camera_metadata": "colmap_camera",
               "voxel_size": 0.5, "type": "carving",
               "kill_tolerance": 3,
               "bounding_box": {"x": [300, 450], "y": [300, 450],
                                "z": [-175, 105]}},
    "PointCloud": {"upstream_task": "Voxels", "level_set_value": 2.0},
    "CurveSkeleton": {"upstream_task": "PointCloud", "bin_size": 6.0,
                      "k": 10, "stem_axis_inverted": False},
    "RefineSkeleton": {"upstream_task": "CurveSkeleton",
                       "upstream_pcd": "PointCloud",
                       "alpha": 5.0, "beta": 5.0, "knn_mst": True},
    "TreeGraph": {"upstream_task": "RefineSkeleton", "z_axis": 2,
                  "stem_axis_inverted": False},
    "AnglesAndInternodes": {"upstream_task": "TreeGraph",
                            "method": "legacy",
                            "organ_type": "fruit",
                            "node_sampling_dist": 14.0,
                            "min_fruit_size": 10.0},
    "AnglesAndInternodesEvaluation": {
        "upstream_task": "AnglesAndInternodes",
        "ground_truth": "ImagesFilesetExists",
        "free_ends": 0.4, "free_ends_eps": 1e-2},
}

# Measured (round-3 session-5, reduced budget; base = 0.087 / 15.4 deg /
# 34 angles):
#   shrink           0.0851 / 13.64 / 30  <- best balanced; adopted
#   roll             0.1443 / 25.36 / 36  <- per-view roll polish overfits
#                    the silhouette (same pathology as freed k1 in the BA)
#   cyc2             0.0866 / 19.33 / 23  <- BA re-run drops organs
#   cyc2_shrink_roll 0.0831 / 18.42 / 19  <- lowest ncost but a 19-angle
#                    subset (DTW rewards aligned subsets; not adopted)
VARIANTS = {
    "base": {},
    "shrink": {"TurntableCalibration": {
        "polish_rounds": 3, "polish_shrink": 0.7}},
    "roll": {"TurntableCalibration": {
        "polish_rounds": 3, "polish_shrink": 0.7,
        "polish_roll_span": 1.0}},
    "cyc2": {"TurntableCalibration": {
        "polish_rounds": 2, "ba_polish_cycles": 2}},
    "cyc2_shrink_roll": {"TurntableCalibration": {
        "polish_rounds": 3, "polish_shrink": 0.7,
        "polish_roll_span": 1.0, "ba_polish_cycles": 2}},
}


def run_variant(name):
    cfg = copy.deepcopy(BASE_CFG)
    for task, over in VARIANTS[name].items():
        cfg.setdefault(task, {}).update(over)
    t0 = time.time()
    with TemporaryDB() as db:
        fixtures.load_reference_scan(db, "real_plant")
        ctx = RunContext(db, "real_plant", cfg)
        report = run_task(ctx, "AnglesAndInternodesEvaluation", report=False)
        fs = ctx.scan.get_fileset(report["AnglesAndInternodes"]["fileset"])
        out = json.loads(fs.get_file("AnglesAndInternodes").read_raw())
        efs = ctx.scan.get_fileset(
            report["AnglesAndInternodesEvaluation"]["fileset"])
        ev = json.loads(efs.get_files()[0].read_raw())
    print(json.dumps({
        "variant": name,
        "ncost": round(ev["normalized_cost"], 4),
        "mean_angle_error": round(ev["mean_angle_error"], 2),
        "n_angles": len(out["angles"]),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        run_variant(n)
