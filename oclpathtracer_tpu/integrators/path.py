"""Full path-trace integrator — the jnp "megakernel" form.

Same estimator as the reference's traceRays (GenerateColors.cl:223-261): up to
`bounces` scattering events, diffuse + GGX specular, emissive ×3 boost, flat bg on
miss, no NEE / MIS / Russian roulette. Quirks preserved for parity are cited inline.

Structure: the reference runs one divergent while-loop per pixel work-item. Here the
bounce loop is a `lax.scan` over the whole ray BATCH with an active-lane mask — the
vector-friendly formulation (every lane does every bounce's math; masking replaces
divergence). `kernels/` carries the same math into fused Pallas kernels; this module
is the semantic anchor all faster paths are tested against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.core.brdf import sample_brdf
from oclpathtracer_tpu.core.camera import generate_rays
from oclpathtracer_tpu.core.intersect import intersect_world
from oclpathtracer_tpu.scene.types import Scene

UNIFORMS_PER_BOUNCE = 2
CAMERA_UNIFORMS = 2


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def trace_paths(o: jnp.ndarray, d: jnp.ndarray, scene: Scene,
                uniforms: jnp.ndarray, cfg: RenderConfig,
                clamp: bool = True):
    """Trace a batch of paths to completion.

    o, d: (N, 3) primary rays; uniforms: (N, bounces, 2) BRDF-sampling uniforms.
    Returns (radiance (N, 3), stats) where stats["segments"] counts traced ray
    segments (for Mrays/s accounting). clamp=False skips the reference's final
    max(radiance, 0) (GenerateColors.cl:260) — the UNCLAMPED path sum is what
    the adjoint megakernel differentiates (its documented clamp-as-identity
    semantics; only observable at unphysical parameters where a per-sample
    radiance can go negative — tests/test_grad_kernel.py pins this).
    """
    n = o.shape[0]
    bg = jnp.asarray(cfg.bg_color, jnp.float32)
    radiance = jnp.zeros((n, 3), jnp.float32)
    mask = jnp.ones((n, 3), jnp.float32)
    active = jnp.ones((n,), bool)

    mats = scene.materials

    def bounce(carry, us):
        o, d, radiance, mask, active = carry
        # Segments traced this bounce = lanes alive at entry (the primary rays on
        # bounce 0, extension rays after) — the Mrays/s denominator.
        entrants = jnp.sum(active)
        rec = intersect_world(o, d, scene.geometry)

        # Miss → add masked background once, lane dies (GenerateColors.cl:233-237).
        miss = active & ~rec.hit
        radiance = radiance + jnp.where(miss[:, None], mask * bg, 0.0)
        active = active & rec.hit

        albedo = mats.albedo[rec.mat_id]
        emissive = mats.emissive[rec.mat_id]
        roughness = mats.roughness[rec.mat_id]
        mtype = mats.mtype[rec.mat_id]

        # Emission with the reference's ×3 boost (GenerateColors.cl:241).
        radiance = radiance + jnp.where(
            active[:, None], mask * emissive * cfg.emissive_boost, 0.0
        )

        # Flip normal against the incident ray (GenerateColors.cl:243).
        nrm = jnp.where((_dot(rec.normal, d) < 0.0)[:, None], rec.normal, -rec.normal)

        wo = -d
        bs = sample_brdf(wo, nrm, albedo, roughness, mtype, us[:, 0], us[:, 1])

        # pdf <= 0 terminates (GenerateColors.cl:251).
        alive = active & (bs.pdf > 0.0)
        safe_pdf = jnp.where(bs.pdf > 0.0, bs.pdf, 1.0)
        factor = bs.f * (_dot(bs.wi, nrm) / safe_pdf)[:, None]
        mask = jnp.where(alive[:, None], mask * factor, mask)

        # Re-spawn offset 0.01 along wi (GenerateColors.cl:257).
        o = rec.point + bs.wi * cfg.ray_offset
        d = jnp.where(alive[:, None], bs.wi, d)
        return (o, d, radiance, mask, alive), entrants

    us_per_bounce = jnp.moveaxis(uniforms, 1, 0)  # (bounces, N, 2)
    (o, d, radiance, mask, active), seg_counts = jax.lax.scan(
        bounce, (o, d, radiance, mask, active), us_per_bounce
    )
    # max(radiance, 0) — GenerateColors.cl:260.
    if clamp:
        radiance = jnp.maximum(radiance, 0.0)
    return radiance, {"segments": jnp.sum(seg_counts)}


def render_sample(scene: Scene, cfg: RenderConfig, sample_idx,
                  key: jax.Array, pixel_ids=None):
    """Render ONE 1-spp progressive sample of the (sub)image.

    `pixel_ids`: absolute pixel ids (defaults to the full image). Every uniform is
    keyed by (key, sample_idx, absolute pixel id) → sharding-invariant streams.
    Returns (radiance (N, 3), stats).
    """
    if pixel_ids is None:
        pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    px = pixel_ids % cfg.width
    py = pixel_ids // cfg.width

    skey = rng.sample_key(key, sample_idx)
    n_uniform = CAMERA_UNIFORMS + UNIFORMS_PER_BOUNCE * cfg.bounces
    us = rng.pixel_uniforms(skey, pixel_ids, n_uniform)

    o, d = generate_rays(px, py, cfg.width, cfg.height, us[:, 0], us[:, 1], cfg.camera)
    bounce_us = us[:, CAMERA_UNIFORMS:].reshape(-1, cfg.bounces, UNIFORMS_PER_BOUNCE)
    return trace_paths(o, d, scene, bounce_us, cfg)


@functools.partial(jax.jit, static_argnums=(1,))
def count_segments(scene: Scene, cfg: RenderConfig, sample_idxs: jnp.ndarray,
                   key: jax.Array) -> jnp.ndarray:
    """Total traced ray segments over `sample_idxs` — the Mrays/s denominator.

    A segment is counted when its lane is still alive at trace time (primary rays
    always; extension rays only until the lane terminates by miss / dead pdf),
    matching what a wavefront kernel with compaction would actually process.
    """

    def body(total, s):
        _, stats = render_sample(scene, cfg, s, key)
        return total + stats["segments"], None

    total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), sample_idxs)
    return total
