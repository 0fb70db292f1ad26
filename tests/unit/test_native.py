"""Native C++ geometry module tests (marching tetrahedra)."""

import numpy as np
import pytest

from plant3dvision_tpu.native import marching_cubes, native_available
from plant3dvision_tpu.native.mc import _marching_tetrahedra_numpy


def _sphere_sdf(n=24, r=8.0):
    c = (n - 1) / 2.0
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    return (r - np.sqrt((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2)), c, r


def test_native_builds():
    assert native_available(), "C++ geometry module failed to build"


def test_sphere_surface():
    sdf, c, r = _sphere_sdf()
    mesh = marching_cubes(sdf, level=0.0)
    assert len(mesh.triangles) > 500
    d = np.linalg.norm(mesh.vertices - c, axis=1)
    np.testing.assert_allclose(d, r, atol=0.35)
    # surface area within a few % of the analytic sphere
    area = mesh.surface_area()
    assert abs(area - 4 * np.pi * r * r) / (4 * np.pi * r * r) < 0.08
    # volume within a few %
    vol = mesh.volume()
    assert abs(vol - 4 / 3 * np.pi * r ** 3) / (4 / 3 * np.pi * r ** 3) < 0.08


def test_watertight_sphere():
    """Every edge of the extracted surface is shared by exactly 2 triangles."""
    sdf, _, _ = _sphere_sdf(n=16, r=5.0)
    mesh = marching_cubes(sdf, level=0.0)
    t = mesh.triangles
    edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_native_matches_numpy_fallback():
    sdf, _, _ = _sphere_sdf(n=12, r=4.0)
    if not native_available():
        pytest.skip("no native lib")
    m_native = marching_cubes(sdf, level=0.0)
    m_numpy = _marching_tetrahedra_numpy(sdf, 0.0)
    assert len(m_native.triangles) == len(m_numpy.triangles)
    # same vertex sets (order may differ)
    a = np.sort(np.round(m_native.vertices, 5).view([("", float)] * 3), axis=0)
    b = np.sort(np.round(m_numpy.vertices, 5).view([("", float)] * 3), axis=0)
    assert np.array_equal(a, b)


def test_outward_orientation():
    sdf, c, r = _sphere_sdf()
    mesh = marching_cubes(sdf, level=0.0)
    v, t = mesh.vertices, mesh.triangles
    n = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    centers = v[t].mean(axis=1) - c
    cos = np.einsum("ij,ij->i", n, centers)
    # consistent orientation: all normals point the same way radially
    frac_out = (cos > 0).mean()
    assert frac_out > 0.99 or frac_out < 0.01, f"mixed orientation: {frac_out}"


def test_pcd2mesh_sphere():
    from plant3dvision_tpu.fsdb.geometry import PointCloud
    from plant3dvision_tpu.proc3d import pcd2mesh
    rng = np.random.default_rng(0)
    v = rng.standard_normal((20000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mesh = pcd2mesh(PointCloud(v * 10.0), voxel_size=1.0)
    assert len(mesh.triangles) > 2000
    d = np.linalg.norm(mesh.vertices - mesh.vertices.mean(0), axis=1)
    assert abs(d.mean() - 10.0) < 1.0
