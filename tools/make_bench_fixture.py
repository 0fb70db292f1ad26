"""One-off: build the committed real-fixture carve workload for
`bench.py --fixture` (VERDICT r3 #1).

Runs the COLMAP-free calibrated route on the reference's real_plant
fixture (TurntableCalibration at the same reduced budget the CPU suite
uses — measured 34 organs / ncost 0.087 / 15.4 deg, i.e. production-
grade poses) + the pipeline's Masks stage (linear [0,1,0], threshold
0.15, dilation 3 — configs/test_geom_pipe_real.toml:26-37 params), then
saves the 60 binary masks (bit-packed) + packed cameras to
bench_assets/real_fixture.npz so the bench never re-runs calibration.

Usage: JAX_PLATFORMS=cpu python tools/make_bench_fixture.py
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from plant3dvision_tpu import fixtures
from plant3dvision_tpu.fsdb import io
from plant3dvision_tpu.fsdb.testing import TemporaryDB
from plant3dvision_tpu.ops.carving import camera_from_metadata
from plant3dvision_tpu.runtime import RunContext, run_task

CFG = {
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
}


def main():
    assert fixtures.has_reference_testdata("real_plant")
    with TemporaryDB() as db:
        fixtures.load_reference_scan(db, "real_plant")
        ctx = RunContext(db, "real_plant", CFG)
        report = run_task(ctx, "Masks", report=False)
        scan = ctx.scan
        mfs = scan.get_fileset(report["Masks"]["fileset"])
        masks, cams, ids = [], [], []
        for f in sorted(mfs.get_files(), key=lambda f: f.id):
            cam_md = f.get_metadata("colmap_camera")
            if cam_md is None:
                continue
            masks.append(io.read_image(f) != 0)
            cams.append(camera_from_metadata(cam_md))
            ids.append(f.id)
        masks = np.stack(masks)
        cams = np.stack(cams)
        V, H, W = masks.shape
        print(f"{V} masks {H}x{W}, fill "
              f"{masks.mean():.4f} (plant px per view)")
        out = REPO / "bench_assets"
        out.mkdir(exist_ok=True)
        np.savez_compressed(
            out / "real_fixture.npz",
            packed=np.packbits(masks.reshape(V, -1), axis=1),
            hw=np.array([H, W], np.int32),
            cams=cams.astype(np.float32),
            ids=np.array(ids))
        print("wrote", out / "real_fixture.npz",
              (out / "real_fixture.npz").stat().st_size, "bytes")


if __name__ == "__main__":
    main()
