"""Multi-device scaling benchmark — rays/s efficiency from 1 to N devices.

BASELINE.json's scaling target is ≥90% rays/s efficiency from 1 host to N≥2.
This harness measures it on whatever devices the platform exposes: on a real
multi-chip slice it produces the certified numbers; on this project's 1-chip
tunnel it degenerates to the single-device row (by design — the sharded path is
validated functionally on the 8-device CPU mesh and by the driver's
dryrun_multichip, and its forward pass has zero cross-device collectives, so
scaling is expected linear until the per-device pixel strip shrinks below one
kernel block).

Prints one JSON line per mesh size:
  {"devices": n, "mrays_per_s": x, "efficiency_vs_1": r}

Usage: python bench_scaling.py [--width 512] [--spp 32] [--bounces 4]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--bounces", type=int, default=4)
    args = ap.parse_args()

    from oclpathtracer_tpu import RenderConfig
    from oclpathtracer_tpu.kernels.megakernel import prepare_scan
    from oclpathtracer_tpu.parallel.mesh import default_mesh
    from oclpathtracer_tpu.parallel.sharded_pallas import make_sharded_kernel_step
    from oclpathtracer_tpu.runtime import enable_compilation_cache
    from oclpathtracer_tpu.scene import load_cornell_box

    enable_compilation_cache()
    cfg = RenderConfig(width=args.width, height=args.height,
                       bounces=args.bounces)
    scene = load_cornell_box()
    scan, table, emi, classes = prepare_scan(scene, "auto")

    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    base = None
    for n in sizes:
        mesh = default_mesh(devs, n=n)
        tbl = jax.device_put(table, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        step = make_sharded_kernel_step(cfg, mesh, args.spp, scan=scan,
                                        emi_const=emi, classes=classes)
        img, segs = step(tbl, jnp.int32(0))          # compile + warm
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        img, segs = step(tbl, jnp.int32(args.spp))
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        mrays = float(segs) / dt / 1e6
        if base is None:
            base = mrays
        print(json.dumps({
            "devices": n,
            "mrays_per_s": round(mrays, 2),
            "efficiency_vs_1": round(mrays / (base * n), 4),
        }))


if __name__ == "__main__":
    main()
