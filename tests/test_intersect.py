"""Intersection tests: closed-form hits, backface-cull parity, nearest selection."""

import numpy as np
import jax.numpy as jnp

from oclpathtracer_tpu.core.intersect import intersect_world, intersect_tris, occluded
from oclpathtracer_tpu.scene.types import Geometry


def _geom(tris):
    """tris: list of (p1, p2, p3)."""
    a = np.asarray(tris, np.float32)
    return Geometry(
        p1=jnp.asarray(a[:, 0]),
        p2=jnp.asarray(a[:, 1]),
        p3=jnp.asarray(a[:, 2]),
        mat_id=jnp.arange(len(tris), dtype=jnp.int32),
    )


# A unit triangle in the z=0 plane. Winding chosen so a ray along -z sees its FRONT
# face under the reference's convention: accepted when det = dot(dir, cross(e2,e1))
# >= 1e-8 (GenerateColors.cl:97-100). For FRONT, e1=(1,0,0), e2=(0,1,0),
# cross(e2,e1)=(0,0,-1), so dot((0,0,-1) ray, normal) = +1 → accepted.
FRONT = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]
BACK = [(0.0, 0.0, 0.0), (0.0, 1.0, 0.0), (1.0, 0.0, 0.0)]


def test_simple_hit_t_and_point():
    g = _geom([FRONT])
    o = jnp.asarray([[0.25, 0.25, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    rec = intersect_world(o, d, g)
    assert bool(rec.hit[0])
    assert np.isclose(float(rec.t[0]), 5.0, atol=1e-5)
    assert np.allclose(np.asarray(rec.point[0]), [0.25, 0.25, 0.0], atol=1e-5)
    # Normal is normalize(cross(e2, e1)) — for FRONT winding that's -z... the
    # reference then flips toward the ray in the integrator; raw record here.
    n = np.asarray(rec.normal[0])
    assert np.allclose(np.abs(n), [0, 0, 1], atol=1e-6)


def test_backface_culled():
    g = _geom([BACK])
    o = jnp.asarray([[0.25, 0.25, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    rec = intersect_world(o, d, g)
    assert not bool(rec.hit[0])
    # Same triangle from the other side hits.
    o2 = jnp.asarray([[0.25, 0.25, -5.0]])
    d2 = jnp.asarray([[0.0, 0.0, 1.0]])
    rec2 = intersect_world(o2, d2, g)
    assert bool(rec2.hit[0])


def test_miss_outside_barycentric_bounds():
    g = _geom([FRONT])
    o = jnp.asarray([[0.9, 0.9, 5.0], [-0.1, 0.5, 5.0], [0.5, -0.1, 5.0]])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (3, 1))
    rec = intersect_world(o, d, g)
    assert not np.asarray(rec.hit).any()


def test_nearest_hit_and_first_min_tiebreak():
    far = [(p[0], p[1], -3.0) for p in FRONT]
    near = [(p[0], p[1], -1.0) for p in FRONT]
    dup = [(p[0], p[1], -1.0) for p in FRONT]
    g = _geom([far, near, dup])
    o = jnp.asarray([[0.25, 0.25, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    rec = intersect_world(o, d, g)
    assert bool(rec.hit[0])
    assert np.isclose(float(rec.t[0]), 6.0, atol=1e-5)
    # argmin returns the FIRST minimum ≡ the reference's strict `t < best` scan
    # (GenerateColors.cl:144-150): triangle 1, not 2.
    assert int(rec.tri_idx[0]) == 1


def test_t_max_respected():
    g = _geom([FRONT])
    o = jnp.asarray([[0.25, 0.25, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    valid, _ = intersect_tris(o, d, g, t_max=4.0)
    assert not np.asarray(valid).any()
    valid2, _ = intersect_tris(o, d, g, t_max=6.0)
    assert np.asarray(valid2).any()


def test_occluded_shadow_query():
    g = _geom([FRONT])
    o = jnp.asarray([[0.25, 0.25, 5.0], [0.25, 0.25, 5.0]])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (2, 1))
    t_max = jnp.asarray([6.0, 4.0])
    occ = np.asarray(occluded(o, d, g, t_max))
    assert occ[0] and not occ[1]


def test_cornell_primary_rays_all_hit(scene):
    """The camera is inside a closed box: every primary ray must hit geometry."""
    from oclpathtracer_tpu.config import RenderConfig
    from oclpathtracer_tpu.core.camera import generate_rays, pixel_grid

    cfg = RenderConfig(width=32, height=32)
    pid, px, py = pixel_grid(32, 32)
    u = jnp.full((1024,), 0.5, jnp.float32)
    o, d = generate_rays(px, py, 32, 32, u, u, cfg.camera)
    rec = intersect_world(o, d, scene.geometry)
    assert np.asarray(rec.hit).all()
    # Depth range sane: everything within the box's ~7-unit diagonal of the eye.
    t = np.asarray(rec.t)
    assert (t > 0.5).all() and (t < 12.0).all()
