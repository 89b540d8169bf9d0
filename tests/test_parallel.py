"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4 implication d).

The north-star invariant: sharded rendering is BITWISE identical to single-device
rendering, for any device count, because sample streams key on absolute pixel ids.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oclpathtracer_tpu import RenderConfig
from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.parallel.mesh import default_mesh
from oclpathtracer_tpu.parallel.sharded import render_progressive_sharded, shard_pixels
from oclpathtracer_tpu.render.driver import render_progressive

CFG = RenderConfig(width=32, height=32, bounces=4)


def test_shard_pixels_divisibility(cpu_devices):
    mesh = default_mesh(cpu_devices)
    ids = shard_pixels(CFG, mesh)
    assert ids.shape == (CFG.n_pixels,)
    bad = RenderConfig(width=33, height=7)
    with pytest.raises(ValueError):
        shard_pixels(bad, mesh)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_matches_single_device_bitwise(scene, cpu_devices, n_dev):
    mesh = default_mesh(cpu_devices, n=n_dev)
    img_sharded = render_progressive_sharded(scene, CFG, mesh, total_spp=4,
                                             samples_per_step=2)
    img_single = render_progressive(scene, CFG, total_spp=4, samples_per_step=2)
    assert np.array_equal(np.asarray(img_sharded), np.asarray(img_single)), (
        "sharded render must be bitwise identical to single-device"
    )


def test_sharded_layouts_agree(scene, cpu_devices):
    """2-way and 8-way meshes must also agree with each other bitwise."""
    img2 = render_progressive_sharded(scene, CFG, default_mesh(cpu_devices, n=2),
                                      total_spp=2, samples_per_step=2)
    img8 = render_progressive_sharded(scene, CFG, default_mesh(cpu_devices, n=8),
                                      total_spp=2, samples_per_step=2)
    assert np.array_equal(np.asarray(img2), np.asarray(img8))


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (64 * 64, 3)
    assert np.isfinite(out).all() and out.min() >= 0.0


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_megakernel_bitwise_matches_single(scene, cpu_devices):
    """The Pallas kernel under shard_map (absolute pid_base per device) must be
    bitwise identical to the single-device kernel."""
    from oclpathtracer_tpu.kernels.megakernel import pack_scene, render_samples_pallas
    from oclpathtracer_tpu.parallel.sharded_pallas import render_pallas_sharded

    from oclpathtracer_tpu.kernels.megakernel import scene_emissive_const

    cfg = RenderConfig(width=64, height=32, bounces=4)  # 2048 px / 8 dev = 256
    mesh = default_mesh(cpu_devices)
    table = pack_scene(scene)
    emi = scene_emissive_const(scene)
    for scan, kw in (("parity", {}), ("fast", {"emi_const": emi})):
        img_sh = render_pallas_sharded(scene, cfg, mesh, total_spp=2, scan=scan)
        img_1 = render_samples_pallas(table, cfg, 0, 2, scan=scan, **kw) / 2
        np.testing.assert_array_equal(np.asarray(img_sh), np.asarray(img_1))


def test_multihost_helpers_single_process(cpu_devices):
    from oclpathtracer_tpu.parallel import multihost

    mesh = multihost.global_mesh()
    assert mesh.shape["tiles"] == len(jax.devices())
    s = multihost.host_local_pixel_slice(1024)
    assert (s.start, s.stop) == (0, 1024)  # single process owns everything
    with pytest.raises(ValueError):
        multihost.host_local_pixel_slice(1001)  # not divisible
    assert multihost.process_count() == 1
    assert multihost.is_coordinator()
