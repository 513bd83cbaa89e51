"""ctypes bindings for the native OBJ parser (objparse.cpp).

Builds the shared library on demand with g++ (no pybind11 dependency — plain
C ABI + ctypes). All failures degrade gracefully: ``available()`` returns
False and the pure-Python parser in ``models/obj_io.py`` takes over.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "objparse.cpp")
_LIB = os.path.join(_HERE, "libobjparse.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None

        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p]
        lib.obj_free.argtypes = [ctypes.c_void_p]
        for name in ("obj_num_vertices", "obj_num_texcoords",
                     "obj_num_normals", "obj_num_triangles"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        for name in ("obj_have_vt", "obj_have_vn", "obj_max_tc_dim"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int32
            fn.argtypes = [ctypes.c_void_p]
        for name, ty in (("obj_vertices", ctypes.c_float),
                         ("obj_texcoords", ctypes.c_float),
                         ("obj_normals", ctypes.c_float),
                         ("obj_faces_v", ctypes.c_int32),
                         ("obj_faces_vt", ctypes.c_int32),
                         ("obj_faces_vn", ctypes.c_int32),
                         ("obj_texcoord_dims", ctypes.c_int32)):
            fn = getattr(lib, name)
            fn.restype = ctypes.POINTER(ty)
            fn.argtypes = [ctypes.c_void_p]
        lib.obj_mtllibs.restype = ctypes.c_char_p
        lib.obj_mtllibs.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_array(ptr, count, dtype):
    if count == 0:
        return np.empty((0,), dtype=dtype)
    return np.ctypeslib.as_array(ptr, shape=(count,)).astype(dtype, copy=True)


def parse(filename: str):
    """Parse an OBJ file natively.

    Returns (vertices (V,3) f32, texture_coords (VT,d) f32 or None,
    normals (VN,3) f32 or None, faces_v (T,3) i32, faces_vt (T,3) i32 or
    None, faces_vn (T,3) i32 or None, mtllib_names list[str]) — or None if
    the file could not be opened.
    """
    lib = _load()
    if lib is None:
        return None
    ctx = lib.obj_parse(filename.encode())
    if not ctx:
        raise FileNotFoundError(filename)
    try:
        nv = lib.obj_num_vertices(ctx)
        nt = lib.obj_num_triangles(ctx)
        ntc = lib.obj_num_texcoords(ctx)
        nn = lib.obj_num_normals(ctx)

        vertices = _as_array(lib.obj_vertices(ctx), nv * 3,
                             np.float32).reshape(-1, 3)
        faces_v = _as_array(lib.obj_faces_v(ctx), nt * 3,
                            np.int32).reshape(-1, 3)

        texture_coords = None
        if ntc:
            tc3 = _as_array(lib.obj_texcoords(ctx), ntc * 3,
                            np.float32).reshape(-1, 3)
            d = max(int(lib.obj_max_tc_dim(ctx)), 1)
            texture_coords = tc3[:, :d]

        normals = (_as_array(lib.obj_normals(ctx), nn * 3,
                             np.float32).reshape(-1, 3) if nn else None)

        faces_vt = (_as_array(lib.obj_faces_vt(ctx), nt * 3,
                              np.int32).reshape(-1, 3)
                    if lib.obj_have_vt(ctx) and ntc else None)
        faces_vn = (_as_array(lib.obj_faces_vn(ctx), nt * 3,
                              np.int32).reshape(-1, 3)
                    if lib.obj_have_vn(ctx) and nn else None)

        raw = lib.obj_mtllibs(ctx).decode(errors="replace")
        mtllibs = [m for m in raw.split("\n") if m]
        return (vertices, texture_coords, normals, faces_v, faces_vt,
                faces_vn, mtllibs)
    finally:
        lib.obj_free(ctx)
