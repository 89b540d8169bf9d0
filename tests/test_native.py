"""Native C++ runtime component tests (scene loader, image I/O, stopwatch).

The native parser must agree with the pure-Python semantic ground truth byte-for-
byte; the PPM writer must be token-compatible with the reference's
(RaytraceTest.cpp:277-287). Skips cleanly if the toolchain can't build the lib.
"""

import numpy as np
import pytest

native = pytest.importorskip("oclpathtracer_tpu.runtime.native")

from oclpathtracer_tpu.scene import loader


def test_native_parse_matches_python():
    py = loader.parse_mesh_file(loader.DEFAULT_SCENE_PATH)
    nt = native.parse_mesh_file(loader.DEFAULT_SCENE_PATH)
    assert len(py) == len(nt) == 6
    for a, b in zip(py, nt):
        assert a.file_albedo == b.file_albedo
        assert np.array_equal(a.quad_idx, b.quad_idx)
        assert np.array_equal(a.verts, b.verts)


def test_native_parse_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        native.parse_mesh_file(str(tmp_path / "missing.bin"))
    trunc = tmp_path / "trunc.bin"
    trunc.write_bytes(open(loader.DEFAULT_SCENE_PATH, "rb").read()[:50])
    with pytest.raises(ValueError):
        native.parse_mesh_file(str(trunc))


def test_native_ppm_token_format(tmp_path):
    img = (np.arange(2 * 3 * 3) % 256).astype(np.uint8)
    p = tmp_path / "t.ppm"
    native.write_ppm(str(p), img, 3, 2)
    toks = p.read_text().split()
    assert toks[:4] == ["P3", "3", "2", "255"]
    assert [int(t) for t in toks[4:]] == list(range(18))


def test_native_ppm6_roundtrip(tmp_path):
    img = (np.arange(4 * 4 * 3) % 256).astype(np.uint8)
    p = tmp_path / "t6.ppm"
    native.write_ppm6(str(p), img, 4, 4)
    data = p.read_bytes()
    header, pixels = data.split(b"255\n", 1)
    assert header.startswith(b"P6")
    assert np.array_equal(np.frombuffer(pixels, np.uint8), img)


def test_native_stopwatch():
    import time

    sw = native.NativeStopwatch().start()
    time.sleep(0.005)
    s1 = sw.split_ns()
    time.sleep(0.005)
    s2 = sw.split_ns()
    assert 0 < s1 < s2
    assert sw.elapsed_ns() >= s2


def test_scene_load_uses_native_and_matches(scene):
    """load_cornell_box routes through the native parser; semantic result must be
    the already-tested Scene (36 tris etc.)."""
    assert scene.num_triangles == 36
