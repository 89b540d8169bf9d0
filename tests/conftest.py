"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip logic is validated on a `--xla_force_host_platform_device_count=8` CPU
mesh (SURVEY.md §4 implication d); the real-TPU path is exercised by bench.py and
the driver's compile checks. The axon TPU plugin pins jax_platforms at import, so we
override via jax.config after import."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from oclpathtracer_tpu.scene import load_cornell_box


@pytest.fixture(scope="session")
def scene():
    return load_cornell_box()


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
