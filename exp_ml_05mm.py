"""VERDICT r3 #2 done-criterion: the ML-route averaging volume at
0.5 mm voxels COMPLETES on the TPU (this exact workload killed the TPU
worker in round 3 — CLAUDE.md session 5 — before the grid-slab chunked
averaging lanes).

Runs FusedSegmentationCarving (CNN -> C-label averaging volume, the
device-resident ML-route front) on the real_plant fixture at 0.5 mm
with the committed distilled checkpoint + TurntableCalibration cameras
(bench_assets/real_fixture.npz), then a multiclass PointCloud. Prints
one JSON line with the slab count and output stats.
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import numpy as np

from plant3dvision_tpu import fixtures
from plant3dvision_tpu.fsdb import io
from plant3dvision_tpu.fsdb.testing import TemporaryDB
from plant3dvision_tpu.runtime import RunContext, run_task


def main():
    assert fixtures.has_reference_testdata("real_plant")
    asset = np.load(REPO / "bench_assets" / "real_fixture.npz",
                    allow_pickle=False)
    ids = [str(s) for s in asset["ids"]]
    cams = np.asarray(asset["cams"], np.float32)

    with TemporaryDB() as db:
        fixtures.load_reference_scan(db, "real_plant")
        scan = db.get_scan("real_plant")
        images = scan.get_fileset("images")
        for i, fid in enumerate(ids):
            f = images.get_file(fid)
            c = cams[i]
            f.set_metadata("colmap_camera", {
                "camera_model": {"params": [float(x) for x in c[:4]]},
                "rotmat": np.asarray(c[4:13], float).reshape(3, 3).tolist(),
                "tvec": [float(x) for x in c[13:16]]})
        scan.set_metadata("bounding_box", {"x": [300, 450], "y": [300, 450],
                                           "z": [-175, 105]})
        # install the distilled real-scan checkpoint as the model fileset
        models = scan.get_fileset("models", create=True)
        mfile = models.get_file("segnet_real", create=True)
        blob = (REPO / "checkpoints" / "segnet_real.npz").read_bytes()
        mfile.write_raw(blob, "npz")
        from plant3dvision_tpu.models.checkpoint import params_from_npz_bytes
        _, config = params_from_npz_bytes(blob)
        mfile.set_metadata("label_names", config.get("label_names"))
        mfile.set_metadata("model_config", config)

        cfg = {
            "NamedFilesetExists": {"fileset_id": "models"},
            "FusedSegmentationCarving": {
                "upstream_task": "ImagesFilesetExists",
                "model_fileset": "NamedFilesetExists",
                "query": {"channel": "rgb"},
                "camera_metadata": "colmap_camera",
                "voxel_size": 0.5, "Sx": 896, "Sy": 896,
                "batch_size": 4, "log": True},
            # committed ML-real multiclass params (configs/ml_pipe_real.toml)
            "PointCloud": {"upstream_task": "FusedSegmentationCarving",
                           "level_set_value": 1.0, "background_prior": 1.0,
                           "min_contrast": 10.0, "min_score": 0.2},
        }
        ctx = RunContext(db, "real_plant", cfg)
        t0 = time.time()
        report = run_task(ctx, "PointCloud", report=False)
        dt = time.time() - t0
        fs = ctx.scan.get_fileset(report["FusedSegmentationCarving"]["fileset"])
        vols = io.read_npz(fs.get_files()[0])
        pfs = ctx.scan.get_fileset(report["PointCloud"]["fileset"])
        pcd = io.read_point_cloud(pfs.get_files()[0])
        shp = next(iter(vols.values())).shape
        print(json.dumps({
            "ok": True, "seconds": round(dt, 1),
            "grid": list(shp), "labels": sorted(vols),
            "voxels_per_label": int(np.prod(shp)),
            "n_points": len(pcd.points),
        }))


if __name__ == "__main__":
    main()
