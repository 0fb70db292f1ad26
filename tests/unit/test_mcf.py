"""MCF mesh skeletonization (native/geometry.cpp p3d_mcf_contract +
native/mcf.py collapse) — the reference's primary CurveSkeleton method
(romicgal/CGAL Mean_curvature_flow_skeletonization, reference
proc3d.py:156)."""

import numpy as np
import networkx as nx
import pytest

from plant3dvision_tpu.native.mc import marching_cubes
from plant3dvision_tpu.native.mcf import (collapse_to_skeleton,
                                          contract_mesh, skeletonize_mesh)


def _cylinder_mesh(r=4.0, z0=5, z1=54, n=(24, 24, 60)):
    x, y, z = np.mgrid[0:n[0], 0:n[1], 0:n[2]].astype(float)
    cx = cy = (n[0] - 1) / 2.0
    rad = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
    sdf = np.minimum(r - rad, np.minimum(z - z0, z1 - z))
    return marching_cubes(sdf, 0.0), (cx, cy)


def test_contraction_pulls_cylinder_to_axis():
    mesh, (cx, cy) = _cylinder_mesh()
    contracted = contract_mesh(mesh.vertices, mesh.triangles)
    d = np.sqrt((contracted[:, 0] - cx) ** 2 + (contracted[:, 1] - cy) ** 2)
    # surface starts at r=4; the contracted medial curve must sit well
    # inside (caps contract less — mean is the right gauge)
    assert d.mean() < 0.5, d.mean()
    assert np.median(d) < 0.2


def test_skeleton_cylinder_is_axis_path():
    mesh, (cx, cy) = _cylinder_mesh()
    centers, lines = skeletonize_mesh(mesh.vertices, mesh.triangles,
                                      min_branch=3.0)
    assert len(centers) >= 10
    d = np.sqrt((centers[:, 0] - cx) ** 2 + (centers[:, 1] - cy) ** 2)
    assert d.mean() < 1.5
    # spans the cylinder's axis
    assert centers[:, 2].min() < 10 and centers[:, 2].max() > 50
    g = nx.Graph()
    g.add_nodes_from(range(len(centers)))
    g.add_edges_from(map(tuple, lines))
    assert nx.number_connected_components(g) == 1
    assert max(dict(g.degree).values()) <= 6


def test_skeleton_branch_detected():
    """A trunk with a clearly-diverging side branch keeps >= 3 leaf tips
    after pruning (trunk bottom, trunk top, branch tip)."""
    n = (36, 24, 60)
    x, y, z = np.mgrid[0:n[0], 0:n[1], 0:n[2]].astype(float)
    cx, cy = 11.5, 11.5
    r = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
    r2 = np.sqrt((x - cx - 0.7 * np.clip(z - 25, 0, None)) ** 2
                 + (y - cy) ** 2)
    sdf = np.maximum(np.minimum(4.0 - r, np.minimum(z - 5, 52 - z)),
                     np.minimum(3.0 - r2, np.minimum(z - 23, 54 - z)))
    mesh = marching_cubes(sdf, 0.0)
    centers, lines = skeletonize_mesh(mesh.vertices, mesh.triangles,
                                      min_branch=3.0)
    g = nx.Graph()
    g.add_nodes_from(range(len(centers)))
    g.add_edges_from(map(tuple, lines))
    assert nx.number_connected_components(g) == 1
    leaves = [v for v in g.nodes if g.degree(v) == 1]
    assert len(leaves) >= 3     # trunk bottom + trunk top + branch tip
    # the branch reaches away from the trunk axis
    tips = centers[leaves]
    assert np.sqrt((tips[:, 0] - cx) ** 2).max() > 10.0


def test_scipy_fallback_matches_native_contraction():
    """The scipy mirror implements the same algorithm — both must land
    the cylinder's surface on the axis (not equal bitwise: different
    solvers), guarding the fallback path against rot."""
    from plant3dvision_tpu.native import mcf as m
    mesh, (cx, cy) = _cylinder_mesh(n=(16, 16, 30), r=3.0, z0=3, z1=27)
    c_native = contract_mesh(mesh.vertices, mesh.triangles)
    c_scipy = m._contract_scipy(np.asarray(mesh.vertices, float),
                                np.asarray(mesh.triangles, np.int32),
                                iterations=12, wl_factor=2.0, wh0=1.0,
                                cg_iters=800)
    for c in (c_native, c_scipy):
        d = np.sqrt((c[:, 0] - cx) ** 2 + (c[:, 1] - cy) ** 2)
        assert np.median(d) < 0.6, np.median(d)   # from r=3 surface


def test_collapse_merges_coincident_clusters():
    """Vertices within eps collapse to single nodes even without a
    connecting mesh edge (the parallel-chain fusion)."""
    # two parallel 3-vertex chains, 0.1 apart, plus a far vertex
    v = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0],
                  [0, 0.1, 0], [1, 0.1, 0], [2, 0.1, 0],
                  [5, 0, 0]], float)
    t = np.array([[0, 1, 3], [1, 4, 3], [1, 2, 4], [2, 5, 4],
                  [2, 6, 5]])
    centers, lines = collapse_to_skeleton(v, t, eps=0.5)
    assert len(centers) == 4          # three fused pairs + the far vertex
    g = nx.Graph()
    g.add_edges_from(map(tuple, lines))
    assert nx.number_connected_components(g) == 1
