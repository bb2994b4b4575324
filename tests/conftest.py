"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware, per the multi-host test strategy (SURVEY.md §4)."""

import os
import sys

# Force CPU: tests need the 8-device virtual mesh and deterministic f32
# matmuls. The TPU harness may preselect its backend via env/sitecustomize
# before conftest runs, so override through the jax config (effective until
# the first backend initialization).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

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


@pytest.fixture
def table_mug_points():
    from gpd_tpu.io.pcd import load_pcd
    return load_pcd(TABLE_MUG)
