"""Pallas megakernel tests (interpret mode on CPU; compiled on TPU via bench).

The exactness anchor: the megakernel consumes the reference's RNG streams
(kernels/rng.py ≡ core/rng.ref_*), so its output must match the jnp parity
integrator (integrators/parity.py) to float tolerance — same math, same draws.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from oclpathtracer_tpu import RenderConfig
from oclpathtracer_tpu.core import rng as jrng
from oclpathtracer_tpu.kernels import rng as krng
from oclpathtracer_tpu.kernels.megakernel import (
    pack_scene,
    render_pallas,
    render_samples_pallas,
)
from oclpathtracer_tpu.integrators.parity import render_sample_ref

CFG = RenderConfig(width=64, height=32, bounces=6)  # 2048 px = 2 blocks


def test_kernel_rng_matches_core_rng():
    pid = jnp.arange(64, dtype=jnp.uint32)
    s_j = jrng.ref_seed(pid, jnp.uint32(7))
    s_k = krng.seed_from(pid, jnp.uint32(7))
    assert np.array_equal(np.asarray(s_j), np.asarray(s_k))
    for _ in range(4):
        s_j, u_j = jrng.ref_next_float(s_j)
        s_k, u_k = krng.next_float(s_k)
        assert np.array_equal(np.asarray(u_j), np.asarray(u_k))


def test_megakernel_matches_parity_integrator(scene):
    table = pack_scene(scene)
    img_k = np.asarray(render_samples_pallas(table, CFG, 0, 1))
    img_j = np.asarray(render_sample_ref(scene, CFG, 0))
    np.testing.assert_allclose(img_k, img_j, rtol=1e-4, atol=1e-4)


def test_megakernel_multi_sample_sum(scene):
    table = pack_scene(scene)
    s4 = np.asarray(render_samples_pallas(table, CFG, 0, 4))
    j4 = sum(np.asarray(render_sample_ref(scene, CFG, i)) for i in range(4))
    np.testing.assert_allclose(s4, j4, rtol=1e-4, atol=2e-4)


def test_megakernel_start_sample_offset(scene):
    """Chunked progressive rendering must continue the same frame sequence."""
    table = pack_scene(scene)
    a = np.asarray(render_samples_pallas(table, CFG, 0, 2))
    b = np.asarray(render_samples_pallas(table, CFG, 2, 2))
    ab = np.asarray(render_samples_pallas(table, CFG, 0, 4))
    np.testing.assert_allclose(a + b, ab, rtol=1e-5, atol=1e-5)


def test_render_pallas_driver(scene):
    img = np.asarray(render_pallas(scene, CFG, total_spp=4, samples_per_call=2))
    assert img.shape == (CFG.n_pixels, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0
    assert img.mean() > 0.1  # lit scene


def test_non_block_aligned_image(scene):
    """n_pixels not divisible by 1024 — padding path."""
    cfg = RenderConfig(width=24, height=24, bounces=3)  # 576 px
    table = pack_scene(scene)
    img_k = np.asarray(render_samples_pallas(table, cfg, 0, 1))
    img_j = np.asarray(render_sample_ref(scene, cfg, 0))
    assert img_k.shape == (576, 3)
    np.testing.assert_allclose(img_k, img_j, rtol=1e-4, atol=1e-4)
