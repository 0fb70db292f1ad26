"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware. Must run before jax is imported."""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force-override (env ships JAX_PLATFORMS=axon)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

import numpy as np
import pytest

from plant3dvision_tpu.fsdb.testing import TemporaryDB


@pytest.fixture()
def temp_db():
    with TemporaryDB() as db:
        yield db


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
