"""ctypes bindings to the native C++ runtime components.

The reference implements its runtime in C++ (scene parse RaytraceTest.cpp:87-198,
PPM writer :277-287, StopwatchHost); this module binds our native equivalents
(oclpathtracer_tpu/native/*.cpp). The shared library is built lazily with the
in-tree Makefile on first use; every caller has a pure-Python fallback, so a
missing toolchain degrades gracefully (loader.py, image.py catch ImportError).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "liboclpt_native.so")


def _build() -> None:
    subprocess.run(
        ["make", "-s", "-C", _NATIVE_DIR],
        check=True,
        capture_output=True,
        text=True,
    )


def _load() -> ctypes.CDLL:
    if not os.path.exists(_SO_PATH):
        _build()
    lib = ctypes.CDLL(_SO_PATH)

    lib.oclpt_scene_load.restype = ctypes.c_void_p
    lib.oclpt_scene_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.oclpt_scene_n_meshes.restype = ctypes.c_int
    lib.oclpt_scene_n_meshes.argtypes = [ctypes.c_void_p]
    lib.oclpt_mesh_albedo.restype = ctypes.c_float
    lib.oclpt_mesh_albedo.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.oclpt_mesh_n_quads.restype = ctypes.c_int
    lib.oclpt_mesh_n_quads.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.oclpt_mesh_n_verts.restype = ctypes.c_int
    lib.oclpt_mesh_n_verts.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.oclpt_mesh_quads.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_int32)]
    lib.oclpt_mesh_verts.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_float)]
    lib.oclpt_scene_free.argtypes = [ctypes.c_void_p]

    lib.oclpt_write_ppm.restype = ctypes.c_int
    lib.oclpt_write_ppm.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_int]
    lib.oclpt_write_ppm6.restype = ctypes.c_int
    lib.oclpt_write_ppm6.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_int, ctypes.c_int]

    # restype MUST be c_void_p (the default c_int truncates 64-bit pointers).
    lib.oclpt_stopwatch_new.restype = ctypes.c_void_p
    lib.oclpt_stopwatch_free.argtypes = [ctypes.c_void_p]
    lib.oclpt_stopwatch_start.argtypes = [ctypes.c_void_p]
    lib.oclpt_stopwatch_split.restype = ctypes.c_uint64
    lib.oclpt_stopwatch_split.argtypes = [ctypes.c_void_p]
    lib.oclpt_stopwatch_elapsed_ns.restype = ctypes.c_uint64
    lib.oclpt_stopwatch_elapsed_ns.argtypes = [ctypes.c_void_p]
    lib.oclpt_stopwatch_n_splits.restype = ctypes.c_int
    lib.oclpt_stopwatch_n_splits.argtypes = [ctypes.c_void_p]
    lib.oclpt_stopwatch_get_split.restype = ctypes.c_uint64
    lib.oclpt_stopwatch_get_split.argtypes = [ctypes.c_void_p, ctypes.c_int]
    return lib


_lib = _load()


def parse_mesh_file(path: str) -> List:
    """Native parse → the same MeshRecord list as scene/loader.parse_mesh_file."""
    from oclpathtracer_tpu.scene.loader import MeshRecord

    err = ctypes.create_string_buffer(256)
    h = _lib.oclpt_scene_load(path.encode(), err, 256)
    if not h:
        msg = err.value.decode() or "native scene parse failed"
        if "cannot open" in msg:
            raise FileNotFoundError(f"{msg}: {path}")
        raise ValueError(f"{msg}: {path}")
    try:
        meshes = []
        for i in range(_lib.oclpt_scene_n_meshes(h)):
            nq = _lib.oclpt_mesh_n_quads(h, i)
            nv = _lib.oclpt_mesh_n_verts(h, i)
            quads = np.empty((nq, 4), np.int32)
            verts = np.empty((nv, 4), np.float32)
            if nq:
                _lib.oclpt_mesh_quads(h, i, quads.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int32)))
            if nv:
                _lib.oclpt_mesh_verts(h, i, verts.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)))
            meshes.append(MeshRecord(float(_lib.oclpt_mesh_albedo(h, i)),
                                     quads, verts[:, :3].copy()))
        return meshes
    finally:
        _lib.oclpt_scene_free(h)


def write_ppm(path: str, rgb_u8: np.ndarray, width: int, height: int) -> None:
    """ASCII P3 writer (reference token format, RaytraceTest.cpp:277-287)."""
    buf = np.ascontiguousarray(rgb_u8.reshape(height, width, 3), np.uint8)
    rc = _lib.oclpt_write_ppm(path.encode(), buf.ctypes.data_as(ctypes.c_char_p),
                              width, height)
    if rc != 0:
        raise IOError(f"native PPM write failed: {path}")


def write_ppm6(path: str, rgb_u8: np.ndarray, width: int, height: int) -> None:
    buf = np.ascontiguousarray(rgb_u8.reshape(height, width, 3), np.uint8)
    rc = _lib.oclpt_write_ppm6(path.encode(), buf.ctypes.data_as(ctypes.c_char_p),
                               width, height)
    if rc != 0:
        raise IOError(f"native PPM6 write failed: {path}")


class NativeStopwatch:
    """C++ stopwatch (≡ reference StopwatchHost, AdlStopwatchHost.inl:26-107)."""

    def __init__(self):
        self._h = _lib.oclpt_stopwatch_new()

    def start(self):
        _lib.oclpt_stopwatch_start(self._h)
        return self

    def split_ns(self) -> int:
        return _lib.oclpt_stopwatch_split(self._h)

    def elapsed_ns(self) -> int:
        return _lib.oclpt_stopwatch_elapsed_ns(self._h)

    def __del__(self):
        try:
            _lib.oclpt_stopwatch_free(self._h)
        except Exception:
            pass
