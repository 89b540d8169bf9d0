"""Integrator-ladder tests (BASELINE.json configs 1-4) on small images."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.integrators import (
    render_ao,
    render_direct,
    render_primary,
    render_sample,
)
from oclpathtracer_tpu.integrators.parity import render_sample_ref

CFG = RenderConfig(width=32, height=32, bounces=6)


def test_primary_shading(scene):
    img = np.asarray(render_primary(scene, CFG)).reshape(32, 32, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    # Red wall on image right (+x world), green on left.
    left = img[8:24, :6].mean((0, 1))
    right = img[8:24, -6:].mean((0, 1))
    assert left[1] > left[0] + 0.05, f"left should be green-ish, got {left}"
    assert right[0] > right[1] + 0.05, f"right should be red-ish, got {right}"
    # The ceiling light is visible and bright (emissive 30).
    assert img.max() > 10.0


def test_ao_range_and_contrast(scene):
    key = rng.make_key(1)
    img = np.asarray(render_ao(scene, CFG, key, spp=16)).reshape(32, 32, 3)
    assert (img >= 0).all() and (img <= 1).all()
    # Corners/creases darker than open floor: variance must exist.
    assert img.std() > 0.02
    assert 0.3 < img.mean() < 1.0


def test_direct_illumination(scene):
    key = rng.make_key(2)
    img = np.asarray(render_direct(scene, CFG, key, spp=32)).reshape(32, 32, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    # Floor under the light is lit.
    assert img.mean() > 0.05
    # Light itself is the brightest region.
    assert img.max() > 10


def test_path_trace_sample(scene):
    key = rng.make_key(0)
    rad, stats = render_sample(scene, CFG, jnp.int32(0), key)
    rad = np.asarray(rad)
    assert rad.shape == (1024, 3)
    assert np.isfinite(rad).all() and (rad >= 0).all()
    segs = int(stats["segments"])
    # Closed box + backface-cull leaks: between 1 and bounces segments per path.
    assert 1024 <= segs <= 1024 * (CFG.bounces + 1)


def test_path_trace_deterministic(scene):
    key = rng.make_key(0)
    a, _ = render_sample(scene, CFG, jnp.int32(3), key)
    b, _ = render_sample(scene, CFG, jnp.int32(3), key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c, _ = render_sample(scene, CFG, jnp.int32(4), key)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_path_trace_subset_matches_full(scene):
    """Rendering a pixel subset reproduces exactly those pixels of the full image —
    the sharding-invariance property the wavefront/sharded paths rely on."""
    key = rng.make_key(0)
    full, _ = render_sample(scene, CFG, jnp.int32(2), key)
    ids = jnp.asarray([0, 5, 100, 1023, 512], jnp.int32)
    sub, _ = render_sample(scene, CFG, jnp.int32(2), key, pixel_ids=ids)
    np.testing.assert_array_equal(np.asarray(sub), np.asarray(full)[np.asarray(ids)])


def test_path_brighter_than_direct_on_average(scene):
    """Indirect bounces add energy: path-traced mean ≥ direct-only mean (statistical,
    loose tolerance)."""
    key = rng.make_key(7)

    def avg_path(spp):
        acc = np.zeros((CFG.n_pixels, 3), np.float32)
        for s in range(spp):
            r, _ = render_sample(scene, CFG, jnp.int32(s), key)
            acc += np.asarray(r)
        return acc / spp

    pt = avg_path(8).mean()
    direct = np.asarray(render_direct(scene, CFG, key, spp=8)).mean()
    assert pt > 0.8 * direct


def test_parity_integrator_runs_and_is_deterministic(scene):
    a = np.asarray(render_sample_ref(scene, CFG, jnp.int32(0)))
    b = np.asarray(render_sample_ref(scene, CFG, jnp.int32(0)))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all() and (a >= 0).all()


@pytest.mark.slow  # interpret-mode kernel render dominates wall-time
def test_parity_vs_threefry_statistics(scene):
    """Same estimator, different RNG → means agree within Monte-Carlo error."""
    key = rng.make_key(0)
    spp = 24
    acc_ref = np.zeros(3)
    acc_tf = np.zeros(3)
    for s in range(spp):
        acc_ref += np.asarray(render_sample_ref(scene, CFG, jnp.int32(s))).mean(0)
        acc_tf += np.asarray(render_sample(scene, CFG, jnp.int32(s), key)[0]).mean(0)
    ref, tf = acc_ref / spp, acc_tf / spp
    assert np.allclose(ref, tf, rtol=0.15), f"ref {ref} vs threefry {tf}"
