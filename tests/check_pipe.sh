#!/usr/bin/env bash
# Run both pipeline smoke tests (role of reference tests/check_pipe.sh).
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
bash "$HERE/check_geom_pipe.sh" "$@"
echo "=== geometric pipeline smoke: OK"
python -m pytest "$HERE/integration/test_ml_pipeline.py" -q
echo "=== ML pipeline smoke: OK"
