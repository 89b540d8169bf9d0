"""Camera tests against the closed-form reference model (GenerateColors.cl:263-288)."""

import math

import numpy as np
import jax.numpy as jnp

from oclpathtracer_tpu.config import CameraConfig, RenderConfig
from oclpathtracer_tpu.core.camera import basis, generate_rays, pixel_grid


def test_basis_is_reference_frame():
    view, hol, upd = (np.asarray(v) for v in basis(CameraConfig()))
    assert np.allclose(view, [0, 0, -1])
    assert np.allclose(hol, [1, 0, 0])
    assert np.allclose(upd, [0, 1, 0])


def test_center_ray_points_down_axis():
    w = h = 512
    # Pixel (255.5-ish): use jitter u=0.5 → sample at px+0.5 grid position.
    px = jnp.asarray([w // 2 - 1], jnp.int32)
    py = jnp.asarray([h // 2 - 1], jnp.int32)
    u = jnp.asarray([1.0 - 1e-7], jnp.float32)  # x lands exactly at w/2 - tiny
    o, d = generate_rays(px, py, w, h, u, u, CameraConfig())
    d = np.asarray(d)[0]
    assert np.allclose(np.asarray(o)[0], [0, 2.75, 4.0])
    assert abs(d[0]) < 1e-3 and abs(d[1]) < 1e-3 and d[2] < -0.99


def test_corner_rays_match_closed_form():
    w = h = 512
    cam = CameraConfig()
    angle = math.tan(math.radians(30.0))
    px = jnp.asarray([0, w - 1], jnp.int32)
    py = jnp.asarray([0, h - 1], jnp.int32)
    u = jnp.full((2,), 0.5, jnp.float32)  # centered sample
    _, d = generate_rays(px, py, w, h, u, u, cam)
    d = np.asarray(d)
    # Top-left pixel center: sx = (2*(0.5/512)-1)*angle, sy = -(1-2*(0.5/512))*angle.
    sx = (2 * (0.5 / w) - 1) * angle
    sy = -(1 - 2 * (0.5 / h)) * angle
    want = np.array([sx, -sy, -1.0])
    want /= np.linalg.norm(want)
    assert np.allclose(d[0], want, atol=1e-6)
    # Top of image (py=0) looks UP (+y): reference flips y twice (:282 then :284).
    assert d[0][1] > 0
    assert d[1][1] < 0


def test_pixel_grid_row_major():
    pid, px, py = pixel_grid(4, 3)
    assert np.asarray(pid).shape == (12,)
    assert (np.asarray(px) == np.tile(np.arange(4), 3)).all()
    assert (np.asarray(py) == np.repeat(np.arange(3), 4)).all()


def test_jitter_stays_within_pixel():
    w = h = 16
    px = jnp.full((64,), 7, jnp.int32)
    py = jnp.full((64,), 3, jnp.int32)
    u1 = jnp.linspace(0.0, 0.999, 64)
    u2 = jnp.linspace(0.999, 0.0, 64)
    _, d = generate_rays(px, py, w, h, u1, u2, CameraConfig())
    d = np.asarray(d)
    # All jittered directions stay within a pixel-sized cone: spread is bounded by
    # one pixel's angular size.
    spread = d.max(0) - d.min(0)
    angle = math.tan(math.radians(30.0))
    per_pixel = 2 * angle / w
    assert (spread[:2] < 1.6 * per_pixel).all()
