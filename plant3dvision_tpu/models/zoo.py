"""Committed model checkpoints (role of the reference's get_model.sh,
which downloads Resnet_896_896_epoch50.pt into a 'models' scan —
tasks/proc2d.py:336-339). This repo ships its own trained checkpoint
under checkpoints/ (see models/train_synth.py for the training recipe
and the embedded fixture_eval quality record)."""

from __future__ import annotations

from pathlib import Path

REPO = Path(__file__).resolve().parents[2]

#: The default organ-segmentation checkpoint: 2M-param ResUNet trained on
#: photo-domain synthetic renders (train_synth.py); fixture-render IoU
#: fruit 0.73 / leaf 0.90 / stem 0.74, plant union 0.914.
DEFAULT_CHECKPOINT = REPO / "checkpoints" / "unet_seg.npz"

#: The TPU-shaped alternative (models/segnet.py, 7.55M params): 129 vs
#: 70 img/s at 896^2 on one v5e (SEG_BENCH.json) because every conv runs
#: at >=128 channels (the vector-lane width). Fixture-render IoU fruit
#: 0.760 / leaf 0.904 / stem 0.748 / pedicel 0.520, plant union 0.905;
#: fixture ML route 41 angles / DTW ncost 0.212 / 27.5 deg (ResUNet:
#: 0.197 / 25.9 — both at the fixture's oracle ceiling, see
#: tests/integration/test_reference_data.py::test_virtual_plant_oracle_ceiling).
TPUSEGNET_CHECKPOINT = REPO / "checkpoints" / "tpusegnet_seg.npz"

#: The REAL-SCAN checkpoint (background/stem/fruit), self-distilled from
#: the geometric route's organ labels on the reference real_plant scan —
#: no hand annotation, no external weights (models/distill.py). Held-out-
#: view IoU stem 0.78 / fruit 0.82 / background 0.996; full ML route on
#: the real scan: 19 angles / DTW ncost 0.159 / 21.9 deg vs measures.json
#: (ML_REAL_REPORT.json, TPU-stamped). Quality guarded in
#: tests/integration/test_reference_data.py::test_segnet_real_checkpoint_quality.
SEGNET_REAL_CHECKPOINT = REPO / "checkpoints" / "segnet_real.npz"


def install_checkpoint(db, scan_id="models", model_id="unet_seg",
                       path=None):
    """Copy a committed checkpoint into a DB 'models' scan fileset, the
    layout Segmentation2D expects (ModelFilesetExists with scan_id).

    Returns the created File, or None if the checkpoint is missing."""
    import json

    path = Path(path or DEFAULT_CHECKPOINT)
    if not path.exists():
        return None
    scan = db.get_scan(scan_id, create=True)
    fs = scan.get_fileset("models", create=True)
    f = fs.get_file(model_id, create=True)
    f.write_raw(path.read_bytes(), "npz")
    # surface label_names/config as metadata like save_model does
    from .checkpoint import params_from_npz_bytes
    _, config = params_from_npz_bytes(path.read_bytes())
    f.set_metadata("label_names", config.get("label_names"))
    f.set_metadata("model_config", json.loads(json.dumps(config)))
    return f
