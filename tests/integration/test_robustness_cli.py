"""End-to-end run of bin/robustness_evaluation (reference
bin/robustness_evaluation:29-47): replicate a scan, run a task on every
replicate via the real CLI, pairwise-compare outputs with the metric map.

The deterministic pipeline makes replicas bit-identical, so the oracle is
exact: mask precision/recall 1.0 and point-cloud chamfer 0.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

from plant3dvision_tpu.fsdb.testing import TemporaryDB
from plant3dvision_tpu.synth import SyntheticPlant, generate_scan

REPO = Path(__file__).resolve().parents[2]
CONFIG = REPO / "configs" / "geom_pipe_synth.toml"
TOOL = REPO / "bin" / "robustness_evaluation"


@pytest.fixture(scope="module")
def small_db():
    with TemporaryDB() as db:
        plant = SyntheticPlant(n_fruits=8, stem_radius=2.5, fruit_radius=1.8,
                               fruit_length=25.0, internode=6.0)
        generate_scan(db, "rob", n_views=12, width=320, height=320,
                      f=430.0, plant=plant)
        yield db


def _run(db, task, out, n=2):
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO),
           "PATH": "/usr/bin:/bin:/usr/local/bin"}
    proc = subprocess.run(
        [sys.executable, str(TOOL), str(db.path() / "rob"),
         "--task", task, "--config", str(CONFIG), "-n", str(n),
         "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=str(REPO))
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(Path(out).read_text())


def test_robustness_masks_and_pointcloud(small_db, tmp_path):
    res = _run(small_db, "Masks", tmp_path / "rob_masks.json")
    pairs = res["Masks"]["compare_masks"]
    assert pairs, "no replicate pairs compared"
    for pair, metrics in pairs.items():
        assert metrics["mean_precision"] == pytest.approx(1.0), (pair, metrics)
        assert metrics["mean_recall"] == pytest.approx(1.0), (pair, metrics)
        assert metrics["n_pairs"] == 12

    # replicas already exist and Masks is complete on them; PointCloud
    # resumes from there (fileset-existence completeness across CLI runs)
    res = _run(small_db, "PointCloud", tmp_path / "rob_pcd.json")
    pairs = res["PointCloud"]["compare_point_clouds"]
    assert pairs
    for pair, metrics in pairs.items():
        assert metrics["chamfer"] == pytest.approx(0.0, abs=1e-6), (pair, metrics)
        assert metrics["fitness"] == pytest.approx(1.0), (pair, metrics)
