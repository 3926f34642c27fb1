"""Test harness: force the CPU backend with 8 virtual devices so sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication (4))."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# this machine's sitecustomize pins JAX_PLATFORMS=axon (TPU tunnel); the
# config update wins over the env var and guarantees the CPU backend
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gator_tpu import assets as gassets  # noqa: E402


@pytest.fixture(scope="session")
def small_assets():
    """Synthetic asset bundle with a small mesh for fast CPU tests."""
    return gassets.build_assets(
        "human36", data_dirs=[], synthetic_vertex_num=890, seed=0)


@pytest.fixture(scope="session")
def small_assets_coco():
    return gassets.build_assets(
        "coco", data_dirs=[], synthetic_vertex_num=890, seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
