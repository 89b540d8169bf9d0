"""Ambient-occlusion integrator (BASELINE.json config 2).

Cosine-hemisphere visibility: ao(x) = E[ visible(x, wi, r_max) ] with wi cosine-
sampled about the flipped geometric normal. The reference only has an empty
placeholder test for this (RaytraceTest.cpp:293-295); sampling machinery reuses the
path integrator's (sampleHemisphereCosine ≡ GenerateColors.cl:161-172).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.core.brdf import sample_hemisphere_cosine
from oclpathtracer_tpu.core.camera import generate_rays
from oclpathtracer_tpu.core.intersect import intersect_world, occluded
from oclpathtracer_tpu.scene.types import Scene

DEFAULT_AO_RADIUS = 1.5  # world units; the Cornell box spans ~5.6


def render_ao_sample(scene: Scene, cfg: RenderConfig, sample_idx, key: jax.Array,
                     pixel_ids=None, ao_radius: float = DEFAULT_AO_RADIUS,
                     uniforms=None):
    """One 1-spp AO sample: 1.0 on miss, visibility of one cosine sample on hit.

    `uniforms` ((N, 4), optional) overrides the threefry draws — used by the
    parity twin (render_ao_sample_ref) and the Pallas AO kernel's tests.
    """
    if pixel_ids is None:
        pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    px = pixel_ids % cfg.width
    py = pixel_ids // cfg.width

    if uniforms is None:
        skey = rng.sample_key(key, sample_idx)
        us = rng.pixel_uniforms(skey, pixel_ids, 4)
    else:
        us = uniforms

    o, d = generate_rays(px, py, cfg.width, cfg.height, us[:, 0], us[:, 1], cfg.camera)
    rec = intersect_world(o, d, scene.geometry)
    nrm = rec.normal
    nrm = jnp.where((jnp.sum(nrm * d, axis=-1) < 0.0)[:, None], nrm, -nrm)

    wi = sample_hemisphere_cosine(nrm, us[:, 2], us[:, 3])
    so = rec.point + wi * cfg.ray_offset
    blocked = occluded(so, wi, scene.geometry, ao_radius)

    vis = jnp.where(rec.hit, jnp.where(blocked, 0.0, 1.0), 1.0)
    return jnp.broadcast_to(vis[:, None], (vis.shape[0], 3))


def render_ao(scene: Scene, cfg: RenderConfig, key: jax.Array, spp: int = 64,
              pixel_ids=None, ao_radius: float = DEFAULT_AO_RADIUS):
    """spp-averaged AO image (scan over samples on-device)."""
    if pixel_ids is None:
        pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)

    def body(acc, s):
        return acc + render_ao_sample(scene, cfg, s, key, pixel_ids, ao_radius), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((pixel_ids.shape[0], 3), jnp.float32),
        jnp.arange(spp, dtype=jnp.int32),
    )
    return acc / spp


def render_ao_sample_ref(scene: Scene, cfg: RenderConfig, frame_idx,
                         pixel_ids=None, ao_radius: float = DEFAULT_AO_RADIUS):
    """AO sample driven by the REFERENCE RNG streams (draw order: jitter x, y,
    phi, sinThetaSqr) — the bit-comparison twin of the Pallas AO kernel."""
    from oclpathtracer_tpu.integrators.parity import ref_uniforms

    if pixel_ids is None:
        pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    us = ref_uniforms(pixel_ids, frame_idx, 4)
    return render_ao_sample(scene, cfg, frame_idx, None, pixel_ids=pixel_ids,
                            ao_radius=ao_radius, uniforms=us)
