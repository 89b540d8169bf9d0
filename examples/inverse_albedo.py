"""Inverse rendering demo (BASELINE.json config 5): recover perturbed wall albedos
from a rendered target by gradient descent through the path tracer.

Run:  python examples/inverse_albedo.py  [--steps 40] [--size 32]
"""

from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp
import optax

from oclpathtracer_tpu import RenderConfig
from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.diff import SceneParams, extract_params
from oclpathtracer_tpu.diff.inverse import make_optax_train_step, render_spp
from oclpathtracer_tpu.scene import load_cornell_box


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--target-spp", type=int, default=16)
    ap.add_argument("--lr", type=float, default=0.02)
    args = ap.parse_args()

    scene = load_cornell_box()
    cfg = RenderConfig(width=args.size, height=args.size, bounces=4)
    key = rng.make_key(0)

    # Target rendered with the TRUE albedos (higher spp than the optimization
    # renders — otherwise GD overfits the target's own Monte-Carlo noise).
    target = render_spp(scene, cfg, args.target_spp, rng.make_key(7))
    true_albedo = np.asarray(scene.materials.albedo)

    # Start from a perturbed guess.
    params = SceneParams(albedo=jnp.clip(
        extract_params(scene).albedo + 0.2, 0.0, 1.0))
    err0 = float(np.abs(np.asarray(params.albedo) - true_albedo).mean())

    # Adam handles the ~100x gradient-scale spread between wall and small-face
    # albedos that plain SGD oscillates on.
    step, opt_init = make_optax_train_step(scene, cfg, args.spp,
                                           optax.adam(args.lr))
    opt_state = opt_init(params)
    for i in range(args.steps):
        # step_idx=i -> a fresh sample set per step: stochastic gradients average
        # out MC noise instead of fitting one noisy realization.
        params, opt_state, loss = step(params, opt_state, target, jnp.int32(i), key)
        if i % 5 == 0 or i == args.steps - 1:
            err = float(np.abs(np.asarray(params.albedo) - true_albedo).mean())
            print(f"step {i:3d}  loss {float(loss):10.3f}  mean|albedo err| {err:.4f}")

    err1 = float(np.abs(np.asarray(params.albedo) - true_albedo).mean())
    print(f"albedo error: {err0:.4f} -> {err1:.4f}")

    # Image-space error is the actual inverse-rendering objective; parameter error
    # includes unidentifiable coordinates (faces barely visible at this resolution).
    from oclpathtracer_tpu.diff import apply_params

    eval_key = rng.make_key(99)
    img_true = np.asarray(render_spp(scene, cfg, 16, eval_key))
    img_rec = np.asarray(render_spp(apply_params(scene, params), cfg, 16, eval_key))
    img_init = np.asarray(render_spp(
        apply_params(scene, SceneParams(albedo=jnp.clip(
            extract_params(scene).albedo + 0.2, 0.0, 1.0))), cfg, 16, eval_key))
    print(f"image MSE vs truth: init {np.mean((img_init-img_true)**2):.3f} -> "
          f"recovered {np.mean((img_rec-img_true)**2):.3f}")


if __name__ == "__main__":
    main()
