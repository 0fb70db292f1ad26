"""ctypes loader + numpy fallback for the native geometry module."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from ..fsdb.geometry import TriangleMesh
from ..runtime.log import configure_logger

logger = configure_logger(__name__)

_HERE = Path(__file__).resolve().parent
_SO = _HERE / "libp3dgeom.so"
_LIB = None
_TRIED = False


def _build() -> bool:
    src = _HERE / "geometry.cpp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(src), "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning(f"native build failed ({e}); using numpy fallback")
        return False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO.exists() or _SO.stat().st_mtime < (_HERE / "geometry.cpp").stat().st_mtime:
        if not _build():
            return None
    lib = ctypes.CDLL(str(_SO))
    lib.p3d_marching_tetrahedra.restype = ctypes.c_int
    lib.p3d_marching_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.p3d_free.restype = None
    lib.p3d_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def marching_cubes(volume, level: float = 0.0) -> TriangleMesh:
    """Isosurface of `volume` at `level` (inside = values > level).

    Vertices are in index coordinates (i, j, k); callers map to world via
    proc3d.index2point. Uses the native C++ marching-tetrahedra module;
    falls back to a (slow) numpy implementation if the build is missing.
    """
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    lib = _load()
    if lib is None:
        return _marching_tetrahedra_numpy(vol, level)
    nx, ny, nz = vol.shape
    pv = ctypes.POINTER(ctypes.c_float)()
    pt = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_longlong()
    nt = ctypes.c_longlong()
    rc = lib.p3d_marching_tetrahedra(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(level),
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pt), ctypes.byref(nt))
    if rc != 0:
        raise MemoryError("p3d_marching_tetrahedra failed")
    verts = np.ctypeslib.as_array(pv, shape=(nv.value * 3,)).reshape(-1, 3).copy()
    tris = np.ctypeslib.as_array(pt, shape=(nt.value * 3,)).reshape(-1, 3).copy()
    lib.p3d_free(pv)
    lib.p3d_free(pt)
    return TriangleMesh(verts.astype(np.float64), tris.astype(np.int64))


# -- numpy fallback (same algorithm, vectorized, used for cross-checking) --

_TETS = np.array([[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
                  [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]])
_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]])


def _marching_tetrahedra_numpy(vol, level):
    nx, ny, nz = vol.shape
    # global ids of cube corners for every cell
    gx, gy, gz = np.mgrid[0:nx - 1, 0:ny - 1, 0:nz - 1]
    cells = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    strides = np.array([ny * nz, nz, 1])
    corner_gids = (cells[:, None, :] + _CORNERS[None, :, :]) @ strides  # (C, 8)
    vals = vol.reshape(-1)[corner_gids]
    mixed = (vals > level).any(axis=1) & (vals <= level).any(axis=1)
    corner_gids = corner_gids[mixed]

    flat = vol.reshape(-1)
    verts_map: dict[tuple, int] = {}
    verts: list = []
    tris: list = []

    def pos(g):
        return np.array([g // (ny * nz), (g // nz) % ny, g % nz], dtype=float)

    def edge_point(a, b):
        if a > b:
            a, b = b, a
        key = (a, b)
        if key in verts_map:
            return verts_map[key]
        va, vb = flat[a], flat[b]
        t = np.clip((level - va) / (vb - va), 0.0, 1.0)
        verts.append(pos(a) + t * (pos(b) - pos(a)))
        verts_map[key] = len(verts) - 1
        return verts_map[key]

    def orient(a, b, c, d):
        pa, pb, pc, pd = pos(a), pos(b), pos(c), pos(d)
        return np.linalg.det(np.stack([pb - pa, pc - pa, pd - pa]))

    for g8 in corner_gids:
        for tet in _TETS:
            p = g8[tet]
            inside = flat[p] > level
            n_in = int(inside.sum())
            if n_in in (0, 4):
                continue
            ins = p[inside]
            outs = p[~inside]
            if n_in == 1:
                e = [edge_point(ins[0], o) for o in outs]
                if orient(ins[0], *outs) > 0:
                    tris.append(e)
                else:
                    tris.append([e[0], e[2], e[1]])
            elif n_in == 3:
                e = [edge_point(outs[0], i) for i in ins]
                if orient(outs[0], *ins) > 0:
                    tris.append([e[0], e[2], e[1]])
                else:
                    tris.append(e)
            else:
                a = edge_point(ins[0], outs[0])
                b = edge_point(ins[0], outs[1])
                c = edge_point(ins[1], outs[1])
                d = edge_point(ins[1], outs[0])
                if orient(ins[0], ins[1], outs[0], outs[1]) > 0:
                    tris.append([a, b, c])
                    tris.append([a, c, d])
                else:
                    tris.append([a, c, b])
                    tris.append([a, d, c])

    v = np.array(verts) if verts else np.zeros((0, 3))
    t = np.array(tris, dtype=np.int64) if tris else np.zeros((0, 3), dtype=np.int64)
    keep = t[:, 0] != -1
    return TriangleMesh(v, t[keep])
