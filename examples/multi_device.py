"""Multi-device rendering demo: tile-sharded progressive render over a mesh,
verified bitwise identical to single-device.

Run on any machine (uses a virtual 8-device CPU mesh if only one real device):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/multi_device.py
"""

from __future__ import annotations

import numpy as np
import jax

from oclpathtracer_tpu import RenderConfig
from oclpathtracer_tpu.parallel import default_mesh, render_progressive_sharded
from oclpathtracer_tpu.render.driver import render_progressive
from oclpathtracer_tpu.render.image import write_png
from oclpathtracer_tpu.scene import load_cornell_box


def main():
    scene = load_cornell_box()
    cfg = RenderConfig(width=64, height=64, bounces=6)
    mesh = default_mesh()
    print(f"mesh: {len(mesh.devices.flat)} x {mesh.devices.flat[0].platform}")

    img_sharded = render_progressive_sharded(scene, cfg, mesh, total_spp=16,
                                             samples_per_step=8)
    img_single = render_progressive(scene, cfg, total_spp=16, samples_per_step=8)

    same = np.array_equal(np.asarray(img_sharded), np.asarray(img_single))
    print(f"sharded == single-device bitwise: {same}")
    write_png("multi_device_render.png", np.asarray(img_sharded), 64, 64)
    print("wrote multi_device_render.png")


if __name__ == "__main__":
    main()
