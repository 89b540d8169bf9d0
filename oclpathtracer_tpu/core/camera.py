"""Pinhole camera — batched ray generation.

Reproduces the reference camera exactly (generateRay, GenerateColors.cl:263-288):
eye (0, 2.75, 4) looking -z, up +y, vfov 60°, per-sample ±0.5px jitter. The
reference's "pointAimed" double transform (GenerateColors.cl:285-287) renormalizes an
already-normalized direction and is a mathematical no-op; we skip it (SURVEY.md §2.2).

All functions are batched over pixels (shape (N,)) — no per-ray Python loops.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from oclpathtracer_tpu.config import CameraConfig


def basis(cam: CameraConfig):
    """Orthonormal view basis (viewDir, holDir, upDir) — GenerateColors.cl:274-276."""
    look = jnp.asarray(cam.look, jnp.float32)
    up = jnp.asarray(cam.up, jnp.float32)
    view = look / jnp.linalg.norm(look)
    hol = jnp.cross(view, up)
    hol = hol / jnp.linalg.norm(hol)
    upd = jnp.cross(hol, view)
    upd = upd / jnp.linalg.norm(upd)
    return view, hol, upd


def generate_rays(px: jnp.ndarray, py: jnp.ndarray, width: int, height: int,
                  u1: jnp.ndarray, u2: jnp.ndarray, cam: CameraConfig):
    """Batched primary rays.

    px, py: (N,) integer pixel coordinates (x = column, y = row, y=0 at top).
    u1, u2: (N,) uniforms for the sub-pixel jitter.
    Returns (origins (N,3), directions (N,3) normalized).
    """
    inv_w = 1.0 / float(width)
    inv_h = 1.0 / float(height)
    aspect = float(width) / float(height)
    angle = math.tan(0.5 * math.radians(cam.vfov_degrees))

    view, hol, upd = basis(cam)
    eye = jnp.asarray(cam.eye, jnp.float32)

    # Jitter: x = px + u - 0.5, then pixel center +0.5 (GenerateColors.cl:278-282).
    x = px.astype(jnp.float32) + u1 - 0.5
    y = py.astype(jnp.float32) + u2 - 0.5
    sx = (2.0 * ((x + 0.5) * inv_w) - 1.0) * angle * aspect
    sy = -(1.0 - 2.0 * ((y + 0.5) * inv_h)) * angle

    # dir = normalize(sx*hol - sy*upd + view) — GenerateColors.cl:284 (note the -1*y).
    d = sx[:, None] * hol[None, :] - sy[:, None] * upd[None, :] + view[None, :]
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(eye, d.shape)
    return o, d


def pixel_grid(width: int, height: int):
    """Absolute pixel ids and (px, py) for the full image, row-major like the
    reference (gi = gid % w, gj = gid / w — GenerateColors.cl:305-306)."""
    pid = jnp.arange(width * height, dtype=jnp.int32)
    px = pid % width
    py = pid // width
    return pid, px, py
