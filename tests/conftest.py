"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware, per the multi-host test strategy (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


KRYLON = "/root/reference/tutorials/krylon.pcd"
TABLE_MUG = "/root/reference/tutorials/table_mug.pcd"


@pytest.fixture
def krylon_points():
    from gpd_tpu.io.pcd import load_pcd
    return load_pcd(KRYLON)
