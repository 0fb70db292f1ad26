#!/usr/bin/env bash
# Smoke test: full ML (CNN) pipeline on a generated synthetic labelled
# scan — trains a small UNet, then runs Segmentation2D -> Voxels
# (averaging) -> ... -> AnglesAndInternodes
# (role of reference tests/check_ml_pipe.sh).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DB="${1:-$(mktemp -d)/db}"
mkdir -p "$DB" && touch "$DB/romidb"

PYTHONPATH="$REPO" python - <<EOF
from plant3dvision_tpu.fsdb import FSDB
from plant3dvision_tpu.synth import SyntheticPlant, generate_ml_scan
db = FSDB("$DB"); db.connect(unsafe=True)
# real-arabidopsis-like sparsity (same morphology as the integration
# suite, tests/integration/test_ml_pipeline.py): the visual hull can only
# instance-separate organs that don't overlap, and ml_pipe_synth.toml's
# organ filters (min_fruit_size=10) are tuned for this scale
plant = SyntheticPlant(n_fruits=7, divergence_deg=137.5, internode=14.0,
                       stem_radius=2.5, fruit_radius=2.0,
                       fruit_length=35.0, fruit_elevation_deg=55.0,
                       first_node=25.0)
generate_ml_scan(db, "ml_smoke", n_views=36, width=256, height=256,
                 plant=plant)
db.disconnect()
EOF

# train a small model on the scan's rendered GT masks
PYTHONPATH="$REPO" python -m plant3dvision_tpu.models.train "$DB/ml_smoke" \
    --epochs 12 --batch-size 4 --widths 16,32,64 --model-id smoke_unet

PYTHONPATH="$REPO" python -m plant3dvision_tpu.runtime.cli \
    AnglesAndInternodes "$DB/ml_smoke" --config "$REPO/configs/ml_pipe_synth.toml" \
    --param Segmentation2D.model_id=smoke_unet

python - <<EOF
import glob, json
f = glob.glob("$DB/ml_smoke/AnglesAndInternodes_*/AnglesAndInternodes.json")[0]
d = json.load(open(f))
assert len(d["angles"]) > 3, d["angles"]
print(f"ml pipe OK: {len(d['angles'])} angles")
EOF
