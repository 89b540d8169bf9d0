"""Primary-ray cast + Lambert shade (BASELINE.json config 1).

The simplest rung of the integrator ladder: one camera ray per pixel, nearest hit,
Lambertian "headlight" shade albedo·max(n·(-d), 0) + emissive. The reference folds
everything into one megakernel and never implemented this separately (its
AmbientOcclusion/DirectIllumination tests are empty placeholders,
RaytraceTest.cpp:293-303); this rung exists as the deterministic correctness anchor
for camera + intersection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.core.camera import generate_rays
from oclpathtracer_tpu.core.intersect import intersect_world
from oclpathtracer_tpu.scene.types import Scene


def render_primary(scene: Scene, cfg: RenderConfig, pixel_ids=None, jitter=None):
    """Deterministic (centered-sample) primary cast. Returns radiance (N, 3)."""
    if pixel_ids is None:
        pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    px = pixel_ids % cfg.width
    py = pixel_ids // cfg.width
    n = pixel_ids.shape[0]
    if jitter is None:
        # u = 0.5 makes the reference jitter x = px + 0.5 - 0.5 = pixel center.
        jitter = jnp.full((n, 2), 0.5, jnp.float32)

    o, d = generate_rays(px, py, cfg.width, cfg.height,
                         jitter[:, 0], jitter[:, 1], cfg.camera)
    rec = intersect_world(o, d, scene.geometry)

    albedo = scene.materials.albedo[rec.mat_id]
    emissive = scene.materials.emissive[rec.mat_id]
    nrm = rec.normal
    nrm = jnp.where((jnp.sum(nrm * d, axis=-1) < 0.0)[:, None], nrm, -nrm)
    cos = jnp.maximum(jnp.sum(nrm * (-d), axis=-1), 0.0)

    bg = jnp.asarray(cfg.bg_color, jnp.float32)
    shaded = albedo * cos[:, None] + emissive
    return jnp.where(rec.hit[:, None], shaded, bg)
