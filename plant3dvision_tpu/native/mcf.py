"""Mean-curvature-flow mesh skeletonization (reference romicgal
`skeletonize_mesh` = CGAL Mean_curvature_flow_skeletonization, reference
proc3d.py:156).

Two stages (`skeletonize_mesh`):

1. `contract_mesh`: MCF contraction (Au et al. 2008, the family CGAL
   implements) — native C++ (geometry.cpp p3d_mcf_contract, CG on the
   normal equations) with a scipy.sparse mirror fallback.
2. mesh-geodesic collapse: distance-to-root binning ON THE MESH GRAPH
   (original surface connectivity — robust where contracted-space
   merging fuses crowded organs) + quotient MST; output {points, lines}
   in the same format as the Xu method
   (proc3d.skeleton_from_distance_to_root_clusters).

`collapse_to_skeleton` (sequential edge collapse in contracted space,
the literal CGAL stage-2) is kept for clean tubular meshes; on carved
plant hulls the mesh-geodesic route measured strictly better (see
skeletonize_mesh docstring).

DEFAULT-METHOD VERDICT (round 5, virtual_plant fixture A/B): mcf cannot
become the default skeletonizer on these fixtures regardless of mesh
connectivity. The IMLS mesh fragments at thin pedicels at every splat
width (sigma 0.6/1.0/1.5/2.0 -> 178/88/107/108 components;
exp_mcf_mesh.py) so the bridged route scores 0.141 ncost / 20.9 deg;
meshing the CARVED volume instead (library="volume_mc", connected by
construction, ~half-voxel inflation) lets mcf run unbridged but scores
0.187 / 18.7 deg over 34 organs — better angles, worse DTW, because the
mesh fuses/loses organs the POINT-based Xu route resolves (committed Xu:
0.137 / 21.9 over ~38). The gap is organ recall of any mesh
representation at these grids, not the skeletonizer — Xu stays the
default, mcf stays the reference-parity option.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..runtime.log import configure_logger
from .mc import _load

logger = configure_logger(__name__)

_MCF_BOUND = False


def _lib_mcf():
    global _MCF_BOUND
    lib = _load()
    if lib is None:
        return None
    if not _MCF_BOUND:
        try:
            lib.p3d_mcf_contract.restype = ctypes.c_int
            lib.p3d_mcf_contract.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_int), ctypes.c_longlong,
                ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
        except AttributeError:  # stale .so without the symbol
            return None
        _MCF_BOUND = True
    return lib


def contract_mesh(vertices, triangles, iterations=12, wl_factor=2.0,
                  wh0=1.0, cg_iters=800):
    """Contract a triangle mesh toward its curve skeleton; returns the
    contracted vertex positions (same indexing/topology)."""
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    t = np.ascontiguousarray(triangles, dtype=np.int32)
    lib = _lib_mcf()
    if lib is not None:
        out = np.empty_like(v)
        rc = lib.p3d_mcf_contract(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(t),
            int(iterations), ctypes.c_float(wl_factor),
            ctypes.c_float(wh0), int(cg_iters),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc == 0:
            return out.astype(np.float64)
        logger.warning("native MCF contraction failed; scipy fallback")
    return _contract_scipy(v.astype(np.float64), t, iterations, wl_factor,
                           wh0, cg_iters)


def _cot_laplacian(v, t):
    """Cotangent Laplacian (scipy CSR) + per-vertex one-ring area."""
    import scipy.sparse as sp
    n = len(v)
    ii, jj, ww = [], [], []
    area = np.zeros(n)
    for e in range(3):
        a, b, c = t[:, e], t[:, (e + 1) % 3], t[:, (e + 2) % 3]
        u = v[a] - v[c]
        w = v[b] - v[c]
        cr = np.cross(u, w)
        crn = np.maximum(np.linalg.norm(cr, axis=1), 1e-12)
        cot = np.clip((u * w).sum(1) / crn, -57.0, 57.0)
        ii.extend([a, b]); jj.extend([b, a]); ww.extend([0.5 * cot] * 2)
        np.add.at(area, a, 0.5 * crn / 3.0)
    W = sp.coo_matrix((np.concatenate(ww),
                       (np.concatenate(ii), np.concatenate(jj))),
                      shape=(n, n)).tocsr()
    d = np.asarray(W.sum(axis=1)).ravel()
    L = sp.diags(d) - W
    return L, area


def _contract_scipy(v, t, iterations, wl_factor, wh0, cg_iters):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    v = v.copy()
    L0, a0 = _cot_laplacian(v, t)
    mean_face = a0.mean() if len(a0) else 1.0
    wl = np.sqrt(max(mean_face, 1e-12))  # 1e-3 * sqrt(A) * 1e3, as native
    for it in range(iterations):
        L, area = (L0, a0) if it == 0 else _cot_laplacian(v, t)
        if area.sum() < 5e-3 * a0.sum():   # contracted enough (as native)
            break
        whi = np.minimum(wh0 * np.sqrt(a0 / np.maximum(area, 1e-12)), 1e4)
        A = (wl * wl) * (L.T @ L) + sp.diags(whi * whi)
        for c in range(3):
            b = whi * whi * v[:, c]
            x, _ = spla.cg(A, b, x0=v[:, c], maxiter=cg_iters, rtol=1e-7)
            v[:, c] = x
        wl *= wl_factor
    return v


def collapse_to_skeleton(contracted, triangles, eps, min_branch=0.0,
                         original=None):
    """Collapse the contracted mesh into a 1D curve skeleton by
    SEQUENTIAL EDGE COLLAPSE (the CGAL MCF skeletonization's own second
    stage): repeatedly merge the endpoints of the currently-shortest
    edge (< eps, lengths on the CONTRACTED positions) until no
    collapsible edge remains. Unlike a one-shot union-find quotient,
    this absorbs the ladder graphs a collapsed cross-section leaves
    behind (two parallel chains plus rungs) rung by rung, so the result
    is a near-tree instead of a cycle soup (measured: 134 spurious
    cycles with the quotient approach on the synthetic plant, ~0 here).

    `original`: when given, each skeleton node is RE-EMBEDDED at the
    weighted centroid of its merged vertices' ORIGINAL positions —
    CGAL's correspondence embedding. MCF contraction retracts thin-tube
    tips along their axis (measured ~50% of a fruit's length), so
    contracted positions truncate every organ; the original-surface
    centroid restores tips while ring clusters average to the medial
    axis.

    Leaf branches shorter than `min_branch` (real coordinates) are
    pruned. Returns (centers (N,3) float, lines (E,2) int).
    """
    import heapq

    import networkx as nx

    n = len(contracted)
    t = np.asarray(triangles)
    edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    edges = np.unique(np.sort(edges, axis=1), axis=0)

    pos = np.asarray(contracted, float).copy()
    weight = np.ones(n)
    emb = (np.asarray(original, float).copy() if original is not None
           else pos.copy())
    parent = np.arange(n)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    # faces_of[v]: indices of faces incident to (the cluster of) v;
    # a face is alive while its three corners map to distinct roots.
    faces_of = [set() for _ in range(n)]
    for fi, (x, y, z) in enumerate(t):
        faces_of[int(x)].add(fi)
        faces_of[int(y)].add(fi)
        faces_of[int(z)].add(fi)

    def face_alive(fi):
        x, y, z = t[fi]
        return len({find(int(x)), find(int(y)), find(int(z))}) == 3

    heap = []
    for a, b in edges:
        a, b = int(a), int(b)
        heapq.heappush(heap,
                       (float(np.linalg.norm(pos[a] - pos[b])), a, b))

    # collapse shortest-first while faces remain (CGAL semantics: the
    # contracted surface degenerates toward a 1-complex). An edge with
    # no living incident face is a finished curve segment and is
    # skipped. A plain run-to-no-faces CASCADES along the curve
    # (irregular triangulations have faces spanning three consecutive
    # curve clusters, each forcing a lengthwise merge — measured 6832
    # verts -> 46 nodes), so collapses are capped at 2*eps; the few
    # left-over fat faces (junctions, caps) surface as small cycles
    # that the chord pruning below and the TreeGraph MST absorb.
    cap = 2.0 * eps
    while heap:
        d, a, b = heapq.heappop(heap)
        if d >= cap:
            break
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        cur = float(np.linalg.norm(pos[ra] - pos[rb]))
        if abs(cur - d) > 1e-12:     # stale entry (endpoints moved either
            heapq.heappush(heap, (cur, ra, rb))  # way): re-queue at true
            continue                 # length so collapses stay shortest-first
        shared = faces_of[ra] & faces_of[rb]
        if not any(face_alive(fi) for fi in shared):
            continue                 # pure curve edge: keep
        # merge rb into ra (weighted positions, original-centroid embed)
        wa, wb = weight[ra], weight[rb]
        pos[ra] = (pos[ra] * wa + pos[rb] * wb) / (wa + wb)
        emb[ra] = (emb[ra] * wa + emb[rb] * wb) / (wa + wb)
        weight[ra] = wa + wb
        parent[rb] = ra
        faces_of[ra] |= faces_of[rb]
        faces_of[rb] = set()
        # re-queue the merged cluster's edges at their new lengths
        seen_roots = set()
        for fi in faces_of[ra]:
            for vv in t[fi]:
                rv = find(int(vv))
                if rv != ra and rv not in seen_roots:
                    seen_roots.add(rv)
                    heapq.heappush(
                        heap,
                        (float(np.linalg.norm(pos[ra] - pos[rv])), ra, rv))

    roots = np.array([find(i) for i in range(n)])
    uniq = np.unique(roots)
    remap0 = {int(r): i for i, r in enumerate(uniq)}
    centers = emb[uniq]
    line_set = set()
    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            line_set.add((min(remap0[ra], remap0[rb]),
                          max(remap0[ra], remap0[rb])))
    lines = np.array(sorted(line_set), dtype=np.int64).reshape(-1, 2)

    # prune short leaf branches (spurs) on the skeleton graph
    g = nx.Graph()
    g.add_nodes_from(range(len(centers)))
    for a, b in lines:
        g.add_edge(int(a), int(b),
                   length=float(np.linalg.norm(centers[a] - centers[b])))

    # drop SHORTCUT chords: contraction can stretch a few mesh edges far
    # along the curve, leaving quotient edges that bypass whole skeleton
    # segments. Any non-bridge edge much longer than the node spacing is
    # such a chord, not structure.
    long_edges = sorted(
        ((d["length"], a, b) for a, b, d in g.edges(data=True)
         if d["length"] > 3.0 * eps), reverse=True)
    for length, a, b in long_edges:
        if g.degree(a) > 1 and g.degree(b) > 1:
            g.remove_edge(a, b)
            if nx.has_path(g, a, b):
                continue
            g.add_edge(a, b, length=length)   # it was a bridge - restore
    if min_branch > 0:
        changed = True
        while changed:
            changed = False
            for leaf in [n for n in g.nodes if g.degree(n) == 1]:
                # walk the chain from the leaf to the next junction
                chain = [leaf]
                total = 0.0
                cur, prev = leaf, None
                while g.degree(cur) <= 2:
                    nbrs = [n for n in g.neighbors(cur) if n != prev]
                    if not nbrs:
                        break
                    nxt = nbrs[0]
                    total += g[cur][nxt]["length"]
                    prev, cur = cur, nxt
                    if g.degree(cur) > 2 or total >= min_branch:
                        break
                    chain.append(cur)
                if total < min_branch and g.degree(cur) > 2:
                    g.remove_nodes_from(chain)
                    changed = True

    nodes = sorted(g.nodes)
    remap = {n: i for i, n in enumerate(nodes)}
    centers = centers[nodes]
    lines = np.array([[remap[a], remap[b]] for a, b in g.edges],
                     dtype=np.int64).reshape(-1, 2)
    return centers, lines


def _mesh_csr_graph(v, t):
    """CSR graph of mesh edges weighted by ORIGINAL edge length."""
    import scipy.sparse as sp
    e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    e = np.unique(np.sort(e, axis=1), axis=0)
    w = np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=1)
    n = len(v)
    g = sp.coo_matrix((np.concatenate([w, w]),
                       (np.concatenate([e[:, 0], e[:, 1]]),
                        np.concatenate([e[:, 1], e[:, 0]]))),
                      shape=(n, n)).tocsr()
    return g


def skeletonize_mesh(vertices, triangles, iterations=12, wl_factor=2.0,
                     wh0=1.0, cg_iters=800, bin_size=None, min_branch=0.0,
                     stem_axis=2, stem_axis_inverted=False, eps=None,
                     embed="original"):
    """Full MCF mesh skeletonization: contract + mesh-geodesic collapse.

    Topology comes from geodesic distance-to-root binning ON THE MESH
    GRAPH (original edge lengths — the surface connectivity separates
    organs that crowd together after contraction, where any spatial
    merge rule fuses them; measured on the synthetic plant: sequential
    edge collapse in contracted space yields 4-22 usable leaf tips out
    of 12 fruits, this route all 12). Geometry comes from the MCF
    contraction: each distance-bin cluster is embedded at the centroid
    of its CONTRACTED member positions, i.e. on the medial curve — the
    centering that plain surface binning (the Xu point method) only
    approximates by averaging the ring.

    `bin_size` defaults to 4x the mean mesh edge. `eps` is accepted for
    backward compatibility and ignored by this route.
    Returns (centers (N,3), lines (E,2)) in skeleton {points, lines}
    form (reference proc3d.py:156 skeletonize_mesh output).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import minimum_spanning_tree

    from ..proc3d import connect_csr_graph, distance_to_root_clusters

    v = np.asarray(vertices, float)
    t = np.asarray(triangles)
    g = _mesh_csr_graph(v, t)
    if bin_size is None:
        e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
        bin_size = 4.0 * float(
            np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=1).mean())
    axis = int(stem_axis)
    root = int(np.argmax(v[:, axis]) if stem_axis_inverted
               else np.argmin(v[:, axis]))
    # carved-hull meshes can be multi-component (organs disconnect at
    # thin pedicels): bridge every component to the root's with its
    # shortest link, as the Xu point route does (reference
    # connect_graph, proc3d.py:212-263) — unreachable organs otherwise
    # silently vanish from the skeleton
    g = connect_csr_graph(g, v, root)

    contracted = contract_mesh(v, t, iterations=iterations,
                               wl_factor=wl_factor, wh0=wh0,
                               cg_iters=cg_iters)
    # embed="contracted": cluster centroids on the medial curve, but MCF
    # retracts thin-tube tips ~50% of an organ's length (measured) —
    # "original" (default) averages each bin's surface ring instead,
    # which centers tubes equally well and keeps the full organ extent.
    src_pts = contracted if embed == "contracted" else v
    centers, edges, _ = distance_to_root_clusters(g, root, src_pts,
                                                  float(bin_size))
    if len(edges) == 0:
        return centers, edges
    w = np.linalg.norm(centers[edges[:, 0]] - centers[edges[:, 1]], axis=1)
    cg_m = sp.coo_matrix((w, (edges[:, 0], edges[:, 1])),
                         shape=(len(centers), len(centers)))
    mst = sp.coo_matrix(minimum_spanning_tree(cg_m.maximum(cg_m.T)))
    lines = np.stack([mst.row, mst.col], axis=1)
    if min_branch > 0:
        centers, lines = _prune_spurs(centers, lines, float(min_branch))
    return centers, lines


def _prune_spurs(centers, lines, min_branch):
    """Remove leaf chains shorter than min_branch (real coordinates)."""
    import networkx as nx
    g = nx.Graph()
    g.add_nodes_from(range(len(centers)))
    for a, b in lines:
        g.add_edge(int(a), int(b),
                   length=float(np.linalg.norm(centers[a] - centers[b])))
    changed = True
    while changed:
        changed = False
        for leaf in [v_ for v_ in g.nodes if g.degree(v_) == 1]:
            chain = [leaf]
            total = 0.0
            cur, prev = leaf, None
            while g.degree(cur) <= 2:
                nxt_l = [v_ for v_ in g.neighbors(cur) if v_ != prev]
                if not nxt_l:
                    break
                nxt = nxt_l[0]
                total += g[cur][nxt]["length"]
                prev, cur = cur, nxt
                if g.degree(cur) > 2 or total >= min_branch:
                    break
                chain.append(cur)
            if total < min_branch and g.degree(cur) > 2:
                g.remove_nodes_from(chain)
                changed = True
    nodes = sorted(g.nodes)
    remap = {v_: i for i, v_ in enumerate(nodes)}
    centers = centers[nodes]
    lines = np.array([[remap[a], remap[b]] for a, b in g.edges],
                     dtype=np.int64).reshape(-1, 2)
    return centers, lines
