"""Test configuration.

Golden-parity tests run in f64 on the CPU backend (the reference's golden
files demand ~1e-8 relative agreement, SURVEY.md section 4); multi-chip
sharding tests run on a virtual 8-device CPU mesh. Both require env setup
before jax initializes, hence this conftest sets it at import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment preloads a TPU plugin that pins jax_platforms at
# interpreter startup; env vars set here are too late, but the config
# update is honored as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest

GOLDEN_DIR = os.environ.get("GAUSSDCA_GOLDEN_DIR",
                            "/root/reference/test/data")


@pytest.fixture(scope="session")
def golden_dir():
    if not os.path.isdir(GOLDEN_DIR):
        pytest.skip(f"golden data dir not available: {GOLDEN_DIR}")
    return GOLDEN_DIR
