"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip logic is validated on a `--xla_force_host_platform_device_count=8` CPU
mesh (SURVEY.md §4 implication d); the real-TPU path is exercised by bench.py and
the driver's compile checks. The axon TPU plugin pins jax_platforms at import, so we
override via jax.config after import."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Tests must NOT enable the persistent compilation cache via the default dir
# (the CLI does so as a side effect): thousands of interpret-mode entries are
# useless across sessions, sharing the user-level dir with concurrent/killed
# bench processes corrupts it, and long cache-write sessions have segfaulted
# inside jax's zstd writer (deterministically, ~70 tests in). "off" is the
# runtime.cache kill-switch; tests that exercise the cache itself pass an
# explicit tmp dir, which bypasses it.
os.environ["OCLPT_COMPILATION_CACHE"] = "off"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from oclpathtracer_tpu.scene import load_cornell_box


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Drop compiled executables between test modules.

    A full-suite session accumulates hundreds of CPU executables (every
    interpret-mode Pallas kernel is a large XLA program); with all of them
    live, XLA's CPU compiler segfaults deterministically on the next big
    compile (observed at the wavefront kernel, ~70 tests in — cache on or
    off, jax 0.8.x). Per-module cache clearing keeps the compiler healthy
    and costs only recompiles of the handful of shared jitted helpers."""
    jax.clear_caches()
    yield


# Modules whose tests EACH compile multiple large interpret-mode Pallas
# kernels: by round 5, enough accumulate WITHIN one module to re-trigger the
# XLA CPU-compiler segfault (observed at test_kernels.py::
# test_direct_kernel_matches_ref_twin with the round-5 wide-BVH tests ahead
# of it). Per-test clearing in just these modules keeps executables-live
# bounded; their tests share almost no compiled functions, so the cost is
# only the small jnp helpers. With this, the FULL suite completes green on
# the 2-core box (round 5: ~2 h under heavy external CPU contention; the
# wall-time is XLA CPU compile of interpret-mode kernels, so shrinking test
# shapes does not help — program SIZE, i.e. bounces × unroll × streams, is
# the only lever). The quick gate remains `pytest -m 'not slow'`.
_HEAVY_KERNEL_MODULES = ("test_kernels", "test_grad_kernel", "test_bvh")


@pytest.fixture(autouse=True)
def _clear_heavy_module_caches(request):
    mod = getattr(request.module, "__name__", "")
    if mod.rsplit(".", 1)[-1] in _HEAVY_KERNEL_MODULES:
        jax.clear_caches()
    yield


@pytest.fixture(scope="session")
def scene():
    return load_cornell_box()


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
