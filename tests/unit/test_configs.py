"""Every shipped config must parse, name only registered tasks, and set
only declared parameters — unknown keys bind to nothing (BaseTask.__init__
ignores them), so a typo in a preset would silently no-op without this."""

from pathlib import Path

import pytest

from plant3dvision_tpu.runtime.config import load_toml
from plant3dvision_tpu.runtime.task import TaskRegistry

REPO = Path(__file__).resolve().parents[2]
CONFIGS = sorted((REPO / "configs").glob("*.toml"))

# class attributes that are legitimately configurable but not Parameters
EXTRA_KEYS = {"retry_count"}

# sections consumed by non-pipeline CLIs: {section: allowed keys}
NON_TASK_SECTIONS = {
    "Training": {"gt_fileset", "epochs", "batch_size", "learning_rate",
                 "lr", "widths", "model_id", "max_images"},
}


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.name)
def test_config_sections_and_keys(path):
    cfg = load_toml(path)
    assert cfg, f"{path.name} parsed empty"
    for section, params in cfg.items():
        if section in NON_TASK_SECTIONS:
            unknown = set(params) - NON_TASK_SECTIONS[section]
            assert not unknown, f"{path.name} [{section}]: {sorted(unknown)}"
            continue
        cls = TaskRegistry.get(section)          # raises on unknown task
        declared = set(cls._params) | EXTRA_KEYS
        unknown = set(params) - declared
        assert not unknown, (
            f"{path.name} [{section}] sets undeclared parameter(s) "
            f"{sorted(unknown)}; declared: {sorted(cls._params)}")
