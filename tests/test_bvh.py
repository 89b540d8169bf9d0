"""BVH tests: structural invariants + traversal agreement with brute force."""

import numpy as np
import jax.numpy as jnp
import pytest

from oclpathtracer_tpu.core.bvh import build_bvh, intersect_bvh, reorder_geometry
from oclpathtracer_tpu.core.intersect import intersect_world
from oclpathtracer_tpu.scene.procgen import random_triangles, sphere_field

pytestmark = pytest.mark.slow  # BVH traversal kernels in interpret mode


def _structural_check(bvh, n_tris):
    skip = np.asarray(bvh.skip)
    counts = np.asarray(bvh.tri_count)
    starts = np.asarray(bvh.tri_start)
    n = len(skip)
    # Pre-order skip links: skip[i] > i, root skip == n.
    assert (skip > np.arange(n)).all()
    assert skip[0] == n
    # Leaf ranges tile [0, n_tris) exactly once.
    leaf = counts > 0
    segs = sorted(zip(starts[leaf].tolist(), counts[leaf].tolist()))
    cursor = 0
    for s, c in segs:
        assert s == cursor
        cursor += c
    assert cursor == n_tris
    # order is a permutation.
    assert sorted(np.asarray(bvh.order).tolist()) == list(range(n_tris))


def test_bvh_structure_cornell(scene):
    bvh = build_bvh(scene.geometry)
    _structural_check(bvh, scene.num_triangles)


def test_bvh_structure_large():
    geom = random_triangles(777, seed=3)
    bvh = build_bvh(geom, leaf_size=8)
    _structural_check(bvh, 777)


def test_bvh_traversal_matches_brute_force_cornell(scene):
    geom = scene.geometry
    bvh = build_bvh(geom)
    rgeom = reorder_geometry(geom, bvh)

    n = 256
    rs = np.random.RandomState(0)
    o = jnp.asarray(rs.uniform(-2, 2, (n, 3)).astype(np.float32))
    o = o + jnp.asarray([0.0, 2.75, 0.0])  # inside-ish the box
    d = rs.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))

    rec = intersect_world(o, d, geom)
    t_b, idx_b, hit_b = intersect_bvh(o, d, bvh, rgeom)

    np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(rec.hit))
    ok = np.asarray(rec.hit)
    np.testing.assert_allclose(np.asarray(t_b)[ok], np.asarray(rec.t)[ok],
                               rtol=1e-5, atol=1e-5)
    # Same triangle (via the reorder map).
    orig_idx = np.asarray(bvh.order)[np.asarray(idx_b)[ok]]
    np.testing.assert_array_equal(orig_idx, np.asarray(rec.tri_idx)[ok])


def test_bvh_traversal_matches_brute_force_large():
    geom = random_triangles(500, seed=11)
    bvh = build_bvh(geom, leaf_size=8)
    rgeom = reorder_geometry(geom, bvh)

    n = 128
    rs = np.random.RandomState(5)
    o = jnp.asarray(rs.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = rs.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))

    rec = intersect_world(o, d, geom)
    t_b, idx_b, hit_b = intersect_bvh(o, d, bvh, rgeom)
    np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(rec.hit))
    ok = np.asarray(rec.hit)
    np.testing.assert_allclose(np.asarray(t_b)[ok], np.asarray(rec.t)[ok],
                               rtol=1e-5, atol=1e-5)


def test_sphere_field_scene_valid():
    scene = sphere_field(n_spheres=4, subdivisions=1, seed=1)
    assert scene.num_triangles == 4 + 4 * 80  # ground 2 + light 2 + spheres
    assert int(np.asarray(scene.lights.tri_idx).shape[0]) == 2
    # All normals finite, bboxes sane.
    for arr in (scene.geometry.p1, scene.geometry.p2, scene.geometry.p3):
        assert np.isfinite(np.asarray(arr)).all()
