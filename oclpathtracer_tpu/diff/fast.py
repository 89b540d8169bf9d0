"""Fast differentiable rendering: Pallas forward, exact backward via the jnp twin.

The Pallas megakernel has no AD rule (Mosaic kernels aren't traced by JAX's
autodiff). But the jnp parity integrator (integrators/parity.py) computes the SAME
function of the scene parameters — identical RNG streams, identical math, equal to
float tolerance (pinned by tests/test_kernels.py). So a custom_vjp can run the
kernel on the forward pass and differentiate the twin on the backward pass: the
returned gradient is the true gradient of what the forward computed (up to float
noise), with the forward at kernel speed (~25× the jnp forward on TPU).

The scene→table packing is reimplemented in jnp (pack_scene_table) so the forward
works on traced parameter values inside jit; its gradient is never needed (the
backward differentiates through apply_params → parity integrator instead).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.diff.inverse import SceneParams, apply_params
from oclpathtracer_tpu.integrators.parity import render_sample_ref
from oclpathtracer_tpu.kernels.megakernel import TABLE_COLS, render_samples_pallas_stats
from oclpathtracer_tpu.scene.types import Scene


def pack_scene_table(scene: Scene) -> jnp.ndarray:
    """jnp mirror of kernels.megakernel.pack_scene (traceable; columns identical)."""
    g, m = scene.geometry, scene.materials
    p1 = g.p1
    e1 = g.p2 - p1
    e2 = g.p3 - p1
    n = jnp.cross(e2, e1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    mid = g.mat_id
    t = scene.num_triangles
    tbl = jnp.zeros((t, TABLE_COLS), jnp.float32)
    tbl = tbl.at[:, 0:3].set(p1)
    tbl = tbl.at[:, 3:6].set(e1)
    tbl = tbl.at[:, 6:9].set(e2)
    tbl = tbl.at[:, 9:12].set(n)
    tbl = tbl.at[:, 12:15].set(m.albedo[mid])
    tbl = tbl.at[:, 15:18].set(m.emissive[mid])
    tbl = tbl.at[:, 18].set(m.roughness[mid])
    tbl = tbl.at[:, 19].set(m.mtype[mid].astype(jnp.float32))
    return tbl


def make_fast_renderer(scene: Scene, cfg: RenderConfig, n_samples: int):
    """render(params, start_sample) → MEAN image over n_samples reference-stream
    frames. Forward: Pallas megakernel. Backward: AD through the jnp twin."""

    def twin(params: SceneParams, start_sample) -> jnp.ndarray:
        sc = apply_params(scene, params)

        def body(acc, f):
            return acc + render_sample_ref(sc, cfg, f), None

        frames = start_sample + jnp.arange(n_samples, dtype=jnp.int32)
        acc, _ = jax.lax.scan(
            body, jnp.zeros((cfg.n_pixels, 3), jnp.float32), frames)
        return acc / n_samples

    @jax.custom_vjp
    def render(params: SceneParams, start_sample):
        sc = apply_params(scene, params)
        img, _ = render_samples_pallas_stats(pack_scene_table(sc), cfg,
                                             start_sample, n_samples)
        return img / n_samples

    def fwd(params, start_sample):
        return render(params, start_sample), (params, start_sample)

    def bwd(res, g):
        params, start_sample = res
        _, vjp_fn = jax.vjp(lambda p: twin(p, start_sample), params)
        (dparams,) = vjp_fn(g)
        return dparams, None

    render.defvjp(fwd, bwd)
    return render, twin


def make_fast_loss_fn(scene: Scene, cfg: RenderConfig, spp: int):
    """Unbiased pairwise loss (see make_unbiased_loss_fn) with kernel forwards.

    Two independent sample sets = two disjoint reference-frame ranges, selected
    by step index: frames [2k·spp, (2k+1)·spp) and [(2k+1)·spp, (2k+2)·spp).
    """
    render, _ = make_fast_renderer(scene, cfg, spp)

    def loss(params: SceneParams, target, step_idx):
        a = render(params, (2 * step_idx) * spp)
        b = render(params, (2 * step_idx + 1) * spp)
        return jnp.mean((a - target) * (b - target))

    return loss
