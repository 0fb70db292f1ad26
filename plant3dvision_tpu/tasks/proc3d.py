"""3D tasks: PointCloud, TriangleMesh, CurveSkeleton, RefineSkeleton
(reference tasks/proc3d.py, 694 LoC)."""

from __future__ import annotations

import numpy as np

from ..fsdb import io
from ..fsdb.geometry import PointCloud as PCD
from ..runtime.log import configure_logger
from ..runtime.task import Parameter, RomiTask
from .. import proc3d

logger = configure_logger(__name__)

# default label colors (role of reference config.PointCloudColorConfig)
LABEL_COLORS = {
    "stem": [0.2, 0.7, 0.2],
    "fruit": [0.9, 0.4, 0.1],
    "leaf": [0.1, 0.9, 0.1],
    "pedicel": [0.6, 0.6, 0.1],
    "flower": [0.9, 0.1, 0.6],
    "background": [0.3, 0.3, 0.3],
}


class PointCloud(RomiTask):
    """Volume -> point cloud with normals (reference tasks/proc3d.py:66-136).

    Multiclass NPZ: per-label argmax with background prior / contrast /
    score filters, per-label colors, 'labels' metadata.
    """

    upstream_task = Parameter(default="Voxels")
    level_set_value = Parameter(default=1.0)
    background_prior = Parameter(default=1.0)
    min_contrast = Parameter(default=10.0)
    min_score = Parameter(default=0.2)

    def run(self):
        ifile = self.input_file()
        voxels = io.read_npz(ifile)
        if len(voxels.keys()) == 1:
            multiclass = False
            voxels = voxels[list(voxels.keys())[0]]
        else:
            multiclass = True

        origin = np.array(ifile.get_metadata("origin"))
        voxel_size = float(ifile.get_metadata("voxel_size"))

        if not multiclass:
            pcd = proc3d.vol2pcd(voxels, origin, voxel_size,
                                 float(self.level_set_value))
            outfile = self.output_file()
            io.write_point_cloud(outfile, pcd)
            outfile.set_metadata({"voxel_size": voxel_size})
            return

        labels = list(voxels.keys())
        stack = np.stack([voxels[l] for l in labels], axis=-1).astype(np.float64)
        for i, l in enumerate(labels):
            if l == "background":
                stack[..., i] *= float(self.background_prior)
        res_idx = np.argmax(stack, axis=-1)

        pcd = PCD()
        point_labels = []
        for i, l in enumerate(labels):
            if l == "background":
                continue
            pred_c = (res_idx == i).astype(np.float64)
            if float(self.min_contrast) > 1.0:
                others = np.max(np.delete(stack, i, axis=-1), axis=-1)
                pred_c = pred_c * (pred_c > float(self.min_contrast) * others)
            pred_c = pred_c * (pred_c > float(self.min_score))
            out = proc3d.vol2pcd(pred_c, origin, voxel_size,
                                 float(self.level_set_value))
            if len(out) == 0:
                continue
            color = LABEL_COLORS.get(l, np.random.rand(3).tolist())
            out.colors = np.tile(np.asarray(color), (len(out), 1))
            pcd = pcd + out
            point_labels += [l] * len(out)

        outfile = self.output_file()
        io.write_point_cloud(outfile, pcd)
        outfile.set_metadata({"labels": point_labels, "voxel_size": voxel_size})


class TriangleMesh(RomiTask):
    """Point cloud / volume -> surface mesh.

    The reference uses open3d/CGAL Poisson (tasks/proc3d.py:299-345); here
    the default path is marching cubes over the signed-distance volume (the
    native C++ module), which consumes the SAME information the Poisson
    path derives its implicit function from. Falls back to an error if the
    native module is unavailable.
    """

    upstream_task = Parameter(default="PointCloud")
    library = Parameter(default="marching_cubes")
    filtering = Parameter(default="most connected triangles")
    level_set_value = Parameter(default=0.0)

    def requires(self):
        return [self._upstream(), self.ctx.get_task("Voxels")]

    def run(self):
        from ..native import marching_cubes

        voxels_target = self.ctx.get_task("Voxels").output()
        vfile = voxels_target.get(create=False).get_files()[0]
        vols = io.read_npz(vfile)
        key = list(vols.keys())[0]
        vol = vols[key]
        origin = np.array(vfile.get_metadata("origin"))
        voxel_size = float(vfile.get_metadata("voxel_size"))

        from ..ops.edt import signed_distance
        sd = np.asarray(signed_distance(vol, cap=8))
        mesh = marching_cubes(sd, level=-float(self.level_set_value))
        mesh.vertices = proc3d.index2point(mesh.vertices, origin, voxel_size)

        if str(self.filtering) == "most connected triangles":
            mesh = mesh.largest_connected_component()

        outfile = self.output_file()
        io.write_triangle_mesh(outfile, mesh)


class CurveSkeleton(RomiTask):
    """Point cloud / mesh -> curve skeleton {points, lines} JSON.

    The reference calls CGAL mean-curvature-flow skeletonization
    (tasks/proc3d.py:524-558). TPU-native replacement: the Xu
    distance-to-root-clusters method the reference ships as an alternative
    (proc3d.py:392-426) — geodesic level sets over the point cloud.
    """

    upstream_task = Parameter(default="PointCloud")
    bin_size = Parameter(default=4.0)
    k = Parameter(default=10)
    stem_axis = Parameter(default=2)
    stem_axis_inverted = Parameter(default=False)

    def run(self):
        obj = io.read_point_cloud(self.input_file())
        points = obj.points if hasattr(obj, "points") else obj.vertices
        if bool(self.stem_axis_inverted):
            root_index = int(np.argmax(points[:, int(self.stem_axis)]))
        else:
            root_index = int(np.argmin(points[:, int(self.stem_axis)]))
        centers, lines = proc3d.skeleton_from_distance_to_root_clusters(
            points, root_index, float(self.bin_size), int(self.k))
        outfile = self.output_file()
        io.write_json(outfile, {"points": centers.tolist(),
                                "lines": lines.tolist()})


class RefineSkeleton(RomiTask):
    """Deformable registration of the skeleton onto the point cloud
    (reference tasks/proc3d.py:561-639, skeleton_refinement submodule:
    CPD-style EM). TPU implementation in ops.registration."""

    upstream_task = Parameter(default="CurveSkeleton")
    upstream_pcd = Parameter(default="PointCloud")
    alpha = Parameter(default=5.0)
    beta = Parameter(default=5.0)
    max_iterations = Parameter(default=100)
    tolerance = Parameter(default=1e-4)
    knn_mst = Parameter(default=True)

    def requires(self):
        return {"skeleton": self._upstream(), "pcd": self.ctx.get_task(self.upstream_pcd)}

    def run(self):
        from ..ops.registration import cpd_nonrigid

        skel = io.read_json(self.input()["skeleton"].get(create=False).get_files()[0])
        pcd = io.read_point_cloud(self.input()["pcd"].get(create=False).get_files()[0])
        pts = np.asarray(skel["points"], dtype=float)
        lines = np.asarray(skel["lines"], dtype=int)

        refined = cpd_nonrigid(pcd.points, pts, alpha=float(self.alpha),
                               beta=float(self.beta),
                               max_iterations=int(self.max_iterations),
                               tolerance=float(self.tolerance))
        if bool(self.knn_mst):
            import scipy.sparse as sp
            from scipy.sparse.csgraph import minimum_spanning_tree
            from ..proc3d import knn_graph_csr
            g = knn_graph_csr(refined, min(5, len(refined)))
            mst = sp.coo_matrix(minimum_spanning_tree(g))
            lines = np.stack([mst.row, mst.col], axis=1)

        outfile = self.output_file()
        io.write_json(outfile, {"points": refined.tolist(),
                                "lines": lines.tolist()})
