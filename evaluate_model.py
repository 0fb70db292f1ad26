#!/usr/bin/env python3
"""Batch CNN model evaluation over a test database (role of reference
evaluate_model.py): run Segmentation2D on every scan, compare against
ground-truth mask filesets, report per-class precision/recall curves.

Usage:
    python evaluate_model.py <db_root> --config configs/ml_pipe_synth.toml \
        [--gt-fileset gt_masks] [--out model_eval.json]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("db_root")
    ap.add_argument("--config", required=True)
    ap.add_argument("--gt-fileset", default="gt_masks")
    ap.add_argument("--out", default="model_eval.json")
    args = ap.parse_args()

    from plant3dvision_tpu.fsdb import FSDB
    from plant3dvision_tpu.metrics import CompareMaskFilesets
    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.runtime.config import load_toml
    from plant3dvision_tpu.utils import jsonify, locate_task_filesets

    db = FSDB(args.db_root)
    db.connect(unsafe=True)
    config = load_toml(args.config)

    all_results = {}
    for scan_id in db.list_scans():
        scan = db.get_scan(scan_id)
        if scan.get_fileset(args.gt_fileset) is None:
            continue
        print(f"=== {scan_id}")
        ctx = RunContext(db, scan_id, config)
        run_task(ctx, "Segmentation2D", report=False)
        seg_id = locate_task_filesets(scan, ["Segmentation2D"])["Segmentation2D"]
        seg_fs = scan.get_fileset(seg_id)
        labels = [l for l in (seg_fs.get_metadata("label_names") or [])
                  if l != "background"]
        cmp = CompareMaskFilesets(scan.get_fileset(args.gt_fileset),
                                  seg_fs, labels)
        all_results[scan_id] = cmp.results["label-results"]
        for label, r in cmp.results["label-results"].items():
            print(f"  {label:10s} precision={r['precision']} recall={r['recall']}")

    with open(args.out, "w") as f:
        json.dump(jsonify(all_results), f, indent=2)
    print(f"wrote {args.out}")
    db.disconnect()


if __name__ == "__main__":
    main()
