"""Reference-parity integrator: the full path trace driven by the reference's exact
RNG and draw order, for bit-level parity testing against the decoded OpenCL pipeline.

Draw order per pixel per frame (stateful LCG, seed = gid + hashUInt32(frame),
GenerateColors.cl:308):
  1. camera jitter x      (generateRay, GenerateColors.cl:278)
  2. camera jitter y      (:279)
  per bounce (both lobes consume exactly two draws):
  3. phi                  (sampleHemisphereCosine :163 / sampleGGX :182)
  4. sinThetaSqr / xi     (:164 / :183)

Lanes that terminate early in the reference stop drawing, but since the stream is
per-lane and already-emitted radiance is fixed, drawing unconditionally here yields
identical images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.core.camera import generate_rays
from oclpathtracer_tpu.integrators.path import trace_paths


def ref_uniforms(pixel_ids: jnp.ndarray, frame_idx, n_draws: int):
    """(N, n_draws) uniforms replaying the reference's per-pixel LCG stream."""
    state0 = rng.ref_seed(pixel_ids, jnp.asarray(frame_idx))

    def draw(state, _):
        state, u = rng.ref_next_float(state)
        return state, u

    _, us = jax.lax.scan(draw, state0, None, length=n_draws)
    return jnp.moveaxis(us, 0, 1)  # (N, n_draws)


def render_sample_ref(scene, cfg: RenderConfig, frame_idx, pixel_ids=None,
                      with_stats: bool = False):
    """One 1-spp progressive frame with reference-identical sample streams."""
    if pixel_ids is None:
        pixel_ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    px = pixel_ids % cfg.width
    py = pixel_ids // cfg.width

    n_draws = 2 + 2 * cfg.bounces
    us = ref_uniforms(pixel_ids, frame_idx, n_draws)

    o, d = generate_rays(px, py, cfg.width, cfg.height, us[:, 0], us[:, 1], cfg.camera)
    bounce_us = us[:, 2:].reshape(-1, cfg.bounces, 2)
    radiance, stats = trace_paths(o, d, scene, bounce_us, cfg)
    return (radiance, stats) if with_stats else radiance


def count_segments_ref(scene, cfg: RenderConfig, frames: jnp.ndarray) -> jnp.ndarray:
    """Traced-segment count over `frames` for the REFERENCE sample streams — the
    Mrays/s denominator matching what the Pallas megakernel actually traces."""

    def body(total, f):
        _, stats = render_sample_ref(scene, cfg, f, with_stats=True)
        return total + stats["segments"], None

    total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), frames)
    return total
