"""Direct illumination with area-light shadow rays + next-event estimation
(BASELINE.json config 3).

Not present in the reference (its DirectIllumination test is an empty placeholder,
RaytraceTest.cpp:297-299; the megakernel only ever finds light by random walk). The
emission convention matches the reference (Le = emissive × emissive_boost,
GenerateColors.cl:241) so direct + indirect decompositions line up with the full
path integrator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.core.brdf import eval_brdf
from oclpathtracer_tpu.core.camera import generate_rays
from oclpathtracer_tpu.core.intersect import intersect_world, occluded
from oclpathtracer_tpu.scene.types import Scene


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def sample_lights(scene: Scene, u_tri, u1, u2):
    """Area-uniform point on the emissive geometry.

    Returns (point (N,3), normal (N,3), emissive (N,3), pdf_area (N,)).
    Triangle chosen ∝ area via inverse-CDF on u_tri; point via the sqrt warp.
    """
    lights = scene.lights
    geom = scene.geometry
    areas = lights.area
    total = jnp.sum(areas)
    cdf = jnp.cumsum(areas) / total
    li = jnp.searchsorted(cdf, u_tri).astype(jnp.int32)
    li = jnp.clip(li, 0, areas.shape[0] - 1)
    tri = lights.tri_idx[li]

    a = geom.p1[tri]
    b = geom.p2[tri]
    c = geom.p3[tri]
    su = jnp.sqrt(u1)
    point = (
        (1.0 - su)[:, None] * a
        + (su * (1.0 - u2))[:, None] * b
        + (su * u2)[:, None] * c
    )
    normal = lights.normal[li]
    emissive = scene.materials.emissive[geom.mat_id[tri]]
    pdf_area = 1.0 / total  # scalar; area-uniform over all light area
    return point, normal, emissive, jnp.broadcast_to(pdf_area, u_tri.shape)


def render_direct_sample(scene: Scene, cfg: RenderConfig, sample_idx, key: jax.Array,
                         pixel_ids=None, uniforms=None):
    """One 1-spp sample of emitted + NEE direct lighting.

    `uniforms` ((N, 5), optional) overrides the threefry draws — used by the
    parity twin and the Pallas direct kernel's tests.
    """
    if pixel_ids is None:
        pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    px = pixel_ids % cfg.width
    py = pixel_ids // cfg.width

    if uniforms is None:
        skey = rng.sample_key(key, sample_idx)
        us = rng.pixel_uniforms(skey, pixel_ids, 5)
    else:
        us = uniforms

    o, d = generate_rays(px, py, cfg.width, cfg.height, us[:, 0], us[:, 1], cfg.camera)
    rec = intersect_world(o, d, scene.geometry)
    mats = scene.materials
    albedo = mats.albedo[rec.mat_id]
    emissive = mats.emissive[rec.mat_id]
    roughness = mats.roughness[rec.mat_id]
    mtype = mats.mtype[rec.mat_id]
    nrm = rec.normal
    nrm = jnp.where((_dot(nrm, d) < 0.0)[:, None], nrm, -nrm)

    # Visible emission (reference boost convention).
    radiance = jnp.where(rec.hit[:, None], emissive * cfg.emissive_boost, 0.0)

    # NEE shadow ray.
    lp, ln, le, pdf_a = sample_lights(scene, us[:, 2], us[:, 3], us[:, 4])
    to_light = lp - rec.point
    dist2 = jnp.maximum(_dot(to_light, to_light), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = to_light / dist[:, None]

    cos_x = _dot(wi, nrm)
    cos_l = _dot(-wi, ln)  # light normal faces into the box
    cos_l = jnp.abs(cos_l)

    so = rec.point + wi * cfg.ray_offset
    blocked = occluded(so, wi, scene.geometry, dist - 2.0 * cfg.ray_offset)

    wo = -d
    f = eval_brdf(wo, wi, nrm, albedo, roughness, mtype)
    geom_term = cos_x * cos_l / dist2
    contrib = f * (le * cfg.emissive_boost)[...] * (geom_term / pdf_a)[:, None]
    # Skip NEE from a point ON the light (emission already counted; avoids double
    # counting the light's own surface).
    on_light = jnp.max(emissive, axis=-1) > 0.0
    usable = rec.hit & ~blocked & (cos_x > 0.0) & ~on_light
    radiance = radiance + jnp.where(usable[:, None], contrib, 0.0)

    bg = jnp.asarray(cfg.bg_color, jnp.float32)
    return jnp.where(rec.hit[:, None], radiance, bg[None, :])


def render_direct(scene: Scene, cfg: RenderConfig, key: jax.Array, spp: int = 16,
                  pixel_ids=None):
    """spp-averaged direct-lighting image."""
    if pixel_ids is None:
        pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)

    def body(acc, s):
        return acc + render_direct_sample(scene, cfg, s, key, pixel_ids), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((pixel_ids.shape[0], 3), jnp.float32),
        jnp.arange(spp, dtype=jnp.int32),
    )
    return acc / spp


def render_direct_sample_ref(scene: Scene, cfg: RenderConfig, frame_idx,
                             pixel_ids=None):
    """Direct-NEE sample driven by the REFERENCE RNG streams (5 draws/pixel:
    jitter x, y, light-tri select, light u, light v) — bit-comparison twin of the
    Pallas direct kernel."""
    from oclpathtracer_tpu.integrators.parity import ref_uniforms

    if pixel_ids is None:
        pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    us = ref_uniforms(pixel_ids, frame_idx, 5)
    return render_direct_sample(scene, cfg, frame_idx, None, pixel_ids=pixel_ids,
                                uniforms=us)
