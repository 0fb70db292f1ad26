"""End-to-end pipeline benchmark + accuracy report (driver-visible artifact).

Runs the FULL geometric pipeline (FusedCarving images->volume, PointCloud,
CurveSkeleton, RefineSkeleton, TreeGraph, AnglesAndInternodes) on the
north-star workload — a 300-image turntable scan at 1 mm voxels — on the
current JAX backend (real TPU when run outside the test harness), scores
the divergence angles against the generator's ground truth, and persists
everything to E2E_REPORT.json so the headline numbers are reproducible
artifacts rather than commit-message lore.

Optionally (--reference-data) also runs the parity pipelines on the
reference's shipped fixtures (virtual_plant exact-camera route and the
COLMAP-free real_plant route) and records the DTW scores against their
ground truths — the same protocol as reference
tests/integration/test_anglesandinternodes.py.

Usage: python bench_e2e.py [--views 300] [--voxel 1.0] [--reference-data]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def run_northstar(n_views=300, voxel=1.0, width=1440, height=1080,
                  engine=None):
    from plant3dvision_tpu.fsdb.testing import TemporaryDB
    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.runtime.config import load_toml
    from plant3dvision_tpu.synth import SyntheticPlant, generate_scan

    cfg = load_toml(Path(__file__).parent / "configs" / "geom_pipe_fast.toml")
    cfg["FusedCarving"]["voxel_size"] = voxel
    if engine:
        cfg["FusedCarving"]["engine"] = engine
    cfg["Clean"] = {"no_confirm": True}

    plant = SyntheticPlant(n_fruits=15, divergence_deg=137.5, internode=6.0,
                           stem_radius=2.0, fruit_radius=1.5,
                           fruit_length=35.0, first_node=30.0)
    with TemporaryDB() as db:
        t0 = time.perf_counter()
        generate_scan(db, "northstar", n_views=n_views, width=width,
                      height=height, f=1400.0, plant=plant, render_step=0.5)
        gen_s = time.perf_counter() - t0

        ctx = RunContext(db, "northstar", cfg)
        t0 = time.perf_counter()
        report = run_task(ctx, "AnglesAndInternodes", report=False)
        cold_s = time.perf_counter() - t0

        # warm passes: all programs compiled; this is the per-scan
        # production cost (a service processes many scans per process).
        # Three passes, report the min AND all of them: the single host
        # core + remote-device relay here add multi-second scheduling
        # noise per pass (measured 4.2 vs 9.9 s for identical work), and
        # the pass right after the cold one inherits its runtime
        # housekeeping.
        warm, reports = [], []
        for _ in range(3):
            run_task(ctx, "Clean", report=False)
            ctx = RunContext(db, "northstar", cfg)
            t0 = time.perf_counter()
            reports.append(run_task(ctx, "AnglesAndInternodes",
                                    report=False))
            warm.append(time.perf_counter() - t0)
        e2e_s = min(warm)
        report = reports[int(np.argmin(warm))]

        fs = ctx.scan.get_fileset(report["AnglesAndInternodes"]["fileset"])
        out = json.loads(fs.get_file("AnglesAndInternodes").read_raw())
        angles = np.asarray(out["angles"], float)
        if angles.max() < 7:
            angles = np.degrees(angles)
        gt = np.degrees(plant.gt_angles)
        n = min(len(angles), len(gt))
        err = float(np.abs(angles[:n] - gt[:n]).mean()) if n else None
        task_times = {k: round(v.get("seconds", 0.0), 3)
                      for k, v in report.items() if isinstance(v, dict)}
        return {
            "n_views": n_views, "voxel_mm": voxel,
            "image_size": [width, height],
            "scan_generation_s": round(gen_s, 2),
            "cold_seconds": round(cold_s, 3),
            "e2e_seconds": round(e2e_s, 3),
            "warm_passes_s": [round(w, 3) for w in warm],
            "task_seconds": task_times,
            "n_angles": len(angles),
            "mean_angle_error_deg": None if err is None else round(err, 3),
        }


def run_ml_northstar(n_views=126, size=896, voxel=0.15, batch=32,
                     sample="bilinear"):
    """ML-route e2e on the chip: photo-domain renders -> committed
    TPUSegNet -> FusedSegmentationCarving (CNN + multi-label averaging
    carve, device-resident) -> multiclass PointCloud -> OrganSegmentation
    -> organ angles, DTW-scored against the generator's known phyllotaxis.
    In this environment the e2e time is dominated by the host->device
    image transfer (axon tunnel); task_seconds records the split."""
    from plant3dvision_tpu.evaluation import align_sequences
    from plant3dvision_tpu.fsdb.testing import TemporaryDB
    from plant3dvision_tpu.models.zoo import (TPUSEGNET_CHECKPOINT,
                                              install_checkpoint)
    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.synth_photo import (ProceduralArabidopsis,
                                               generate_photo_scan)

    cfg = {
        "ModelFilesetExists": {"scan_id": "models"},
        "FusedSegmentationCarving": {
            "upstream_task": "ImagesFilesetExists",
            "camera_metadata": "camera", "voxel_size": voxel,
            "Sx": size, "Sy": size, "batch_size": batch, "log": False,
            "sample": sample,
        },
        # multiclass argmax + organ params mirror the fixture-proven
        # configs/ml_pipe_virtual.toml (the photo plant is fixture-scale:
        # fruit radius 0.3, siliques 3.5-9 units)
        "PointCloud": {"upstream_task": "FusedSegmentationCarving",
                       "level_set_value": 0.2, "background_prior": 1.0,
                       "min_contrast": 1.0, "min_score": 0.01},
        "OrganSegmentation": {"upstream_task": "PointCloud", "eps": 0.3,
                              "min_points": 5},
        "AnglesAndInternodes": {"upstream_task": "OrganSegmentation",
                                "organ_type": "fruit",
                                "min_fruit_size": 2.0,
                                "min_elongation_ratio": 1.0,
                                "characteristic_length": 1.0,
                                "stem_axis": 2,
                                "stem_axis_inverted": False},
        "Clean": {"no_confirm": True},
    }
    plant = ProceduralArabidopsis(seed=1)
    gt_angles = np.degrees(plant.gt_angles)
    gt_internodes = np.asarray(plant.gt_internodes, float)

    with TemporaryDB() as db:
        t0 = time.perf_counter()
        generate_photo_scan(db, "ml_northstar", n_views=n_views, width=size,
                            height=size, plant=plant, with_gt_masks=False)
        gen_s = time.perf_counter() - t0
        install_checkpoint(db, path=TPUSEGNET_CHECKPOINT,
                           model_id="tpusegnet_seg")
        db._load_scans()

        ctx = RunContext(db, "ml_northstar", cfg)
        t0 = time.perf_counter()
        run_task(ctx, "AnglesAndInternodes", report=False)
        cold_s = time.perf_counter() - t0

        warm, reports = [], []
        for _ in range(2):
            run_task(ctx, "Clean", report=False)
            ctx = RunContext(db, "ml_northstar", cfg)
            t0 = time.perf_counter()
            reports.append(run_task(ctx, "AnglesAndInternodes",
                                    report=False))
            warm.append(time.perf_counter() - t0)
        e2e_s = min(warm)
        report = reports[int(np.argmin(warm))]

        fs = ctx.scan.get_fileset(report["AnglesAndInternodes"]["fileset"])
        out = json.loads(fs.get_file("AnglesAndInternodes").read_raw())
        angles = np.asarray(out["angles"], float)
        if len(angles) and angles.max() < 7:
            angles = np.degrees(angles)
        dtw = align_sequences(angles.tolist(), out["internodes"],
                              gt_angles.tolist(), gt_internodes.tolist())
        task_times = {k: round(v.get("seconds", 0.0), 3)
                      for k, v in report.items() if isinstance(v, dict)}
        return {
            "n_views": n_views, "image_size": [size, size],
            "voxel": voxel, "arch": "tpusegnet", "batch": batch,
            "scan_generation_s": round(gen_s, 2),
            "cold_seconds": round(cold_s, 3),
            "e2e_seconds": round(e2e_s, 3),
            "warm_passes_s": [round(w, 3) for w in warm],
            "task_seconds": task_times,
            "n_angles": len(angles), "n_gt": len(gt_angles),
            "dtw_normalized_cost": round(float(dtw["normalized_cost"]), 4),
            "mean_angle_error_deg": (
                round(float(dtw["mean_angle_error"]), 2)
                if dtw.get("mean_angle_error") is not None else None),
        }


def run_reference_fixtures():
    from plant3dvision_tpu import fixtures
    from plant3dvision_tpu.fsdb.testing import TemporaryDB
    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.runtime.config import load_toml

    results = {}
    if not fixtures.has_reference_testdata("virtual_plant"):
        return {"skipped": "reference testdata not available"}

    def _dtw(ctx, report):
        efs = ctx.scan.get_fileset(
            report["AnglesAndInternodesEvaluation"]["fileset"])
        ev = json.loads(efs.get_files()[0].read_raw())
        fs = ctx.scan.get_fileset(report["AnglesAndInternodes"]["fileset"])
        out = json.loads(fs.get_file("AnglesAndInternodes").read_raw())
        return {"n_angles": len(out["angles"]),
                "dtw_normalized_cost": round(ev["normalized_cost"], 4),
                "mean_angle_error_deg": round(ev["mean_angle_error"], 2),
                "mean_internode_error": round(ev["mean_internode_error"], 3)}

    repo = Path(__file__).parent
    with TemporaryDB() as db:
        fixtures.load_reference_scan(db, "virtual_plant")
        cfg = load_toml(repo / "configs" / "geom_pipe_virtual.toml")
        ctx = RunContext(db, "virtual_plant", cfg)
        t0 = time.perf_counter()
        report = run_task(ctx, "AnglesAndInternodesEvaluation", report=False)
        results["virtual_plant"] = {
            **_dtw(ctx, report), "seconds": round(time.perf_counter() - t0, 1)}

    with TemporaryDB() as db:
        fixtures.load_reference_scan(db, "real_plant")
        # the committed config IS the measured-best recipe, run verbatim
        # (round 3: pinhole BA + lossless Undistorted + mask threshold
        # 0.15 + legacy angles -> 29/29 organs, ncost 0.066, 11.0 deg)
        cfg = load_toml(repo / "configs" / "geom_pipe_real_selfcal.toml")
        ctx = RunContext(db, "real_plant", cfg)
        t0 = time.perf_counter()
        report = run_task(ctx, "AnglesAndInternodesEvaluation", report=False)
        results["real_plant_colmap_free"] = {
            **_dtw(ctx, report), "seconds": round(time.perf_counter() - t0, 1)}
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=300)
    ap.add_argument("--voxel", type=float, default=1.0)
    ap.add_argument("--reference-data", action="store_true",
                    help="also run the reference-fixture parity pipelines")
    ap.add_argument("--out", default="E2E_REPORT.json")
    ap.add_argument("--platform", default=None,
                    help="force a JAX backend (e.g. cpu) before init")
    ap.add_argument("--skip-northstar", action="store_true")
    ap.add_argument("--ml", action="store_true",
                    help="also run the ML-route northstar (photo renders "
                         "-> TPUSegNet -> fused averaging carve -> organs)")
    ap.add_argument("--ml-views", type=int, default=126)
    ap.add_argument("--ml-size", type=int, default=896)
    # 0.25 measured on the v5e: identical accuracy to 0.15 (ncost 0.0869
    # vs 0.0868, same 16 angles) at 5.3x less wall time (94.9 s vs 498 s
    # e2e) — the 56M-voxel 0.15 grid buys nothing on this plant scale
    ap.add_argument("--ml-voxel", type=float, default=0.25)
    ap.add_argument("--ml-sample", default="bilinear",
                    help="FusedSegmentationCarving sampling: bilinear|box")
    ap.add_argument("--engine", default=None,
                    help="override FusedCarving.engine for the northstar")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    out_path = Path(args.out)
    report = (json.loads(out_path.read_text()) if out_path.exists() else {})
    # every section is stamped with the backend that actually produced it
    # (VERDICT r2 #2: a later CPU run must never silently relabel a TPU
    # capture); the top-level backend is only a summary of the sections.
    stamp = {"backend": jax.devices()[0].platform,
             "device": str(jax.devices()[0]),
             "captured": time.strftime("%Y-%m-%d %H:%M:%S")}
    if not args.skip_northstar:
        report["northstar"] = {**run_northstar(args.views, args.voxel,
                                               engine=args.engine),
                               **stamp}
    if args.ml:
        report["ml_northstar"] = {**run_ml_northstar(args.ml_views,
                                                     args.ml_size,
                                                     voxel=args.ml_voxel,
                                                     sample=args.ml_sample),
                                  **stamp}
    if args.reference_data:
        report["reference_fixtures"] = {**run_reference_fixtures(), **stamp}
    report.pop("backend", None)
    report.pop("device", None)
    backends = {v["backend"] for v in report.values()
                if isinstance(v, dict) and "backend" in v}
    report["backends"] = sorted(backends)

    out_path.write_text(json.dumps(report, indent=2) + "\n")
    ns = report.get("northstar")
    if ns is None:
        print(json.dumps(report.get("reference_fixtures", {})))
        return
    print(json.dumps({
        "metric": "geom_pipeline_e2e",
        "value": ns["e2e_seconds"],
        "unit": "s",
        "vs_baseline": round(10.0 / max(ns["e2e_seconds"], 1e-9), 2),
        "mean_angle_error_deg": ns["mean_angle_error_deg"],
    }))


if __name__ == "__main__":
    main()
