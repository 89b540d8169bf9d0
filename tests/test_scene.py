"""Scene loader tests — assert the decoded cornellbox.bin facts from SURVEY.md §2.1."""

import numpy as np
import pytest

from oclpathtracer_tpu.scene import load_cornell_box, parse_mesh_file
from oclpathtracer_tpu.scene.loader import DEFAULT_SCENE_PATH, build_scene
from oclpathtracer_tpu.scene.types import DIFFUSE, SPECULAR


def test_parse_mesh_file_structure():
    meshes = parse_mesh_file(DEFAULT_SCENE_PATH)
    assert len(meshes) == 6
    assert [m.quad_idx.shape[0] for m in meshes] == [2, 3, 1, 1, 1, 10]
    assert [m.verts.shape[0] for m in meshes] == [8, 12, 4, 4, 4, 40]
    # Mesh 2 is the light: file albedo 5.0 != 0.5 (RaytraceTest.cpp:147).
    albedos = [m.file_albedo for m in meshes]
    assert albedos[2] == 5.0
    assert all(a == 0.5 for i, a in enumerate(albedos) if i != 2)


def test_counts(scene):
    # 18 quads → 36 triangles, 18 per-quad materials (RaytraceTest.cpp:197).
    assert scene.num_triangles == 36
    assert scene.materials.num_materials == 18
    # Triangle pairs share a material id (RaytraceTest.cpp:186-193).
    mat_id = np.asarray(scene.geometry.mat_id)
    assert (mat_id[0::2] == mat_id[1::2]).all()
    assert (mat_id == np.repeat(np.arange(18), 2)).all()


def test_material_assignment(scene):
    alb = np.asarray(scene.materials.albedo)
    emi = np.asarray(scene.materials.emissive)
    rough = np.asarray(scene.materials.roughness)
    mtype = np.asarray(scene.materials.mtype)

    # Quad layout: mesh0 (2 quads) + mesh1 (3) + mesh2 light (1) + mesh3 (1)
    # + mesh4 (1) + mesh5 (10) = 18.
    grey = np.array([0.7, 0.7, 0.7], np.float32)
    assert np.allclose(alb[0:5], grey)
    # The light mesh's albedo was OVERWRITTEN to grey by the i==2 branch
    # (RaytraceTest.cpp:165-166 after :150) — quirk preserved.
    assert np.allclose(alb[5], grey)
    assert np.allclose(emi[5], [30.0, 30.0, 30.0])
    assert np.allclose(alb[6], [0.6, 0.0, 0.0])   # mesh 3 red
    assert np.allclose(alb[7], [0.0, 0.6, 0.0])   # mesh 4 green
    assert np.allclose(alb[8:], [0.5, 0.35, 0.05])  # mesh 5 gold
    assert np.allclose(rough[8:], 0.008)
    assert (mtype[8:] == SPECULAR).all()
    assert (mtype[:8] == DIFFUSE).all()
    # Only the light emits.
    assert (emi[np.arange(18) != 5] == 0).all()


def test_lights(scene):
    # One light quad → two emissive triangles at the ceiling (y = 5.48).
    idx = np.asarray(scene.lights.tri_idx)
    assert idx.shape == (2,)
    assert (idx == [10, 11]).all()
    p1 = np.asarray(scene.geometry.p1)[idx]
    assert np.allclose(p1[:, 1], 5.48, atol=1e-3)
    area = np.asarray(scene.lights.area)
    # Light quad is 1.3 x 1.05 world units (bbox from the decoded file).
    assert np.isclose(area.sum(), 1.3 * 1.05, rtol=1e-4)


def test_geometry_bbox(scene):
    lo = np.minimum.reduce(
        [np.asarray(p).min(0) for p in (scene.geometry.p1, scene.geometry.p2, scene.geometry.p3)]
    )
    hi = np.maximum.reduce(
        [np.asarray(p).max(0) for p in (scene.geometry.p1, scene.geometry.p2, scene.geometry.p3)]
    )
    assert np.allclose(lo, [-2.797328, 0.0, -5.592], atol=1e-4)
    assert np.allclose(hi, [2.762672, 5.488, 0.0], atol=1e-4)
