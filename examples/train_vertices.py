"""Inverse rendering of GEOMETRY: recover a moved Cornell light by gradient
descent on vertex positions — the round-5 flagship path.

Plain AD cannot do this at all: emission pickup is piecewise constant in the
vertices (GenerateColors.cl:241), so every vertex gradient lives in the
visibility boundary terms — the PRIMARY silhouette term (diff/edge.py) for the
camera-visible rim and the SECONDARY term (diff/secondary.py) for the rim seen
from every bounce vertex. diff/vertex.make_vertex_train_step runs the whole
step at kernel speed: Pallas pairwise forwards, Pallas arbitrary-ray boundary
probes, and (here) no jnp interior term — the trainable subset is the light
quad of a diffuse scene, whose interior term is identically zero.

Run (TPU or CPU-interpret):
    PYTHONPATH=. python examples/train_vertices.py [--steps 60] [--size 48]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from oclpathtracer_tpu import RenderConfig
from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.diff import extract_params, make_vertex_train_step
from oclpathtracer_tpu.diff.fast import pack_scene_table
from oclpathtracer_tpu.kernels.megakernel import render_samples_pallas_stats
from oclpathtracer_tpu.scene import load_cornell_box

LIGHT_TRIS = (10, 11)  # the ceiling light quad (RaytraceTest.cpp:147-153)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-2,
                    help="adam lr (3e-2 overshoots — measured r5)")
    ap.add_argument("--shift", type=float, default=0.3,
                    help="initial light x-offset (world units)")
    args = ap.parse_args()

    scene = load_cornell_box()
    cfg = RenderConfig(width=args.size, height=args.size, bounces=2)
    spp = args.spp

    # Target: the TRUE scene rendered at kernel speed.
    target, _ = render_samples_pallas_stats(pack_scene_table(scene), cfg, 0,
                                            2 * spp, scan="parity")
    target = target / (2 * spp)

    # Start: light quad shifted in x and z (both copies of each corner move —
    # vertices are per-triangle soup rows).
    params = extract_params(scene, albedo=False, vertices=True)
    sel = jnp.zeros((scene.num_triangles, 1), jnp.float32)
    sel = sel.at[jnp.asarray(LIGHT_TRIS)].set(1.0)
    shift = jnp.asarray([args.shift, 0.0, 0.0], jnp.float32)
    params = params._replace(vertices=tuple(v + sel * shift
                                            for v in params.vertices))

    true_v = extract_params(scene, albedo=False, vertices=True).vertices

    def light_err(p):
        return float(np.mean([
            np.abs(np.asarray(v[jnp.asarray(LIGHT_TRIS)])
                   - np.asarray(t[jnp.asarray(LIGHT_TRIS)])).mean()
            for v, t in zip(p.vertices, true_v)]))

    step, init = make_vertex_train_step(
        scene, cfg, spp, optax.adam(args.lr), interior_spp=0,
        samples_per_edge=48, edge_spp=4, secondary=True,
        secondary_samples_per_edge=16, secondary_spp=2,
        secondary_pixel_stride=4)
    state = init(params)
    key = rng.make_key(7)

    print(f"initial light-vertex error: {light_err(params):.4f} world units")
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, state, loss = step(params, state, target, jnp.int32(i), key)
        if (i + 1) % 10 == 0:
            print(f"step {i + 1:3d}  loss {float(loss):+.6f}  "
                  f"light err {light_err(params):.4f}")
    dt = time.perf_counter() - t0
    err = light_err(params)
    err0 = args.shift / 3.0  # mean over xyz of the x-only offset
    print(f"{args.steps} steps in {dt:.1f}s ({dt / args.steps * 1e3:.0f} "
          f"ms/step) — light-vertex error {err0:.4f} → {err:.4f}")
    if err < err0 * 0.6:
        print("recovered most of the light offset (run longer to converge "
              "further; measured r5: 0.100 → 0.051 in 100 steps at 64²).")


if __name__ == "__main__":
    main()
