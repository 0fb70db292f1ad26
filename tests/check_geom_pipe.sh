#!/usr/bin/env bash
# Smoke test: full geometric pipeline on a generated synthetic scan
# (role of reference tests/check_geom_pipe.sh).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DB="${1:-$(mktemp -d)/db}"
mkdir -p "$DB" && touch "$DB/romidb"

PYTHONPATH="$REPO" python - <<EOF
from plant3dvision_tpu.fsdb import FSDB
from plant3dvision_tpu.synth import SyntheticPlant, generate_scan
db = FSDB("$DB"); db.connect(unsafe=True)
plant = SyntheticPlant(n_fruits=12, stem_radius=2.5, fruit_radius=1.8,
                       fruit_length=30.0, internode=6.0)
generate_scan(db, "smoke", n_views=36, width=448, height=448, f=600.0, plant=plant)
db.disconnect()
EOF

PYTHONPATH="$REPO" python -m plant3dvision_tpu.runtime.cli \
    AnglesAndInternodes "$DB/smoke" --config "$REPO/configs/geom_pipe_synth.toml"

python - <<EOF
import glob, json, sys
f = glob.glob("$DB/smoke/AnglesAndInternodes_*/AnglesAndInternodes.json")[0]
d = json.load(open(f))
assert len(d["angles"]) > 10, d["angles"]
print(f"geom pipe OK: {len(d['angles'])} angles")
EOF
