"""Evaluation tasks (reference tasks/evaluation.py, 733 LoC): ground-truth
builders from virtual plants + evaluators for every pipeline stage."""

from __future__ import annotations

import numpy as np

from ..fsdb import io
from ..runtime.log import configure_logger
from ..runtime.task import Parameter, RomiTask
from ..utils import is_radians, jsonify, read_measures

logger = configure_logger(__name__)


class EvaluationTask(RomiTask):
    """ABC: evaluates upstream_task output against a ground_truth task
    (reference tasks/evaluation.py:40-68)."""

    upstream_task = Parameter(default=None)
    ground_truth = Parameter(default=None)

    def requires(self):
        return {"upstream": self._upstream(),
                "ground_truth": self.ctx.get_task(self.ground_truth)}

    def evaluate(self):
        raise NotImplementedError

    def run(self):
        results = self.evaluate()
        io.write_json(self.output_file(), jsonify(results))


class PointCloudGroundTruth(RomiTask):
    """Sample a ground-truth point cloud from the VirtualPlant mesh
    (reference tasks/evaluation.py:133-195)."""

    upstream_task = Parameter(default="VirtualPlantObj")
    pcd_size = Parameter(default=100000)

    def run(self):
        vp_file = self.input()[0].get(create=False).get_files()[0]
        mesh = io.read_triangle_mesh(vp_file)
        pcd = mesh.sample_points_poisson_disk(int(self.pcd_size))
        outfile = self.output_file()
        io.write_point_cloud(outfile, pcd)
        # propagate GT trait metadata
        for key in ("angles", "internodes"):
            v = vp_file.get_metadata(key)
            if v is not None:
                outfile.set_metadata(key, v)


class PointCloudEvaluation(EvaluationTask):
    """Registration fitness/RMSE + chamfer of predicted vs GT point cloud
    (reference tasks/evaluation.py:293-353)."""

    upstream_task = Parameter(default="PointCloud")
    ground_truth = Parameter(default="PointCloudGroundTruth")
    max_distance = Parameter(default=2.0)

    def evaluate(self):
        from ..metrics import chamfer_distance, point_cloud_registration_fitness
        pred = io.read_point_cloud(
            self.input()["upstream"].get(create=False).get_files()[0])
        gt = io.read_point_cloud(
            self.input()["ground_truth"].get(create=False).get_files()[0])
        fitness, rmse = point_cloud_registration_fitness(
            gt, pred, float(self.max_distance))
        back_fitness, back_rmse = point_cloud_registration_fitness(
            pred, gt, float(self.max_distance))
        return {
            "fitness": fitness, "inlier_rmse": rmse,
            "gt_fitness": back_fitness, "gt_inlier_rmse": back_rmse,
            "chamfer": chamfer_distance(gt, pred),
            "n_pred": len(pred), "n_gt": len(gt),
        }


class Segmentation2DEvaluation(EvaluationTask):
    """Mask precision/recall/mIoU per label vs a GT mask fileset
    (reference tasks/evaluation.py:356-396)."""

    upstream_task = Parameter(default="Segmentation2D")
    ground_truth = Parameter(default="NamedFilesetExists")
    dilation_amount = Parameter(default=0)
    labels = Parameter(default=[])

    def evaluate(self):
        from ..metrics import CompareMaskFilesets
        pred_fs = self.input()["upstream"].get(create=False)
        gt_fs = self.input()["ground_truth"].get(create=False)
        labels = list(self.labels) or [
            l for l in (pred_fs.get_metadata("label_names") or [])
            if l != "background"]
        cmp = CompareMaskFilesets(gt_fs, pred_fs, labels,
                                  int(self.dilation_amount))
        return cmp.results


class VoxelsEvaluation(EvaluationTask):
    """tp/fp/tn/fn of the carved volume vs a voxelized GT mesh
    (reference tasks/evaluation.py:399-477)."""

    upstream_task = Parameter(default="Voxels")
    ground_truth = Parameter(default="VirtualPlantObj")
    threshold = Parameter(default=0.5)

    def evaluate(self):
        vfile = self.input()["upstream"].get(create=False).get_files()[0]
        vols = io.read_npz(vfile)
        origin = np.asarray(vfile.get_metadata("origin"))
        vs = float(vfile.get_metadata("voxel_size"))

        gt_file = self.input()["ground_truth"].get(create=False).get_files()[0]
        mesh = io.read_triangle_mesh(gt_file)
        pcd = mesh.sample_points_poisson_disk(200000)

        results = {}
        from ..proc3d import point2index
        for label, vol in vols.items():
            if label == "background":
                continue
            pred = vol > float(self.threshold)
            gt = np.zeros_like(pred, dtype=bool)
            idx = point2index(pcd.points, origin, vs)
            ok = np.all((idx >= 0) & (idx < np.array(pred.shape)), axis=1)
            idx = idx[ok]
            gt[idx[:, 0], idx[:, 1], idx[:, 2]] = True
            tp = int(np.sum(gt & pred))
            fp = int(np.sum(~gt & pred))
            fn = int(np.sum(gt & ~pred))
            tn = int(np.sum(~gt & ~pred))
            results[label] = {
                "tp": tp, "fp": fp, "fn": fn, "tn": tn,
                "precision": tp / (tp + fp) if tp + fp else None,
                "recall": tp / (tp + fn) if tp + fn else None,
            }
        return results


class SegmentedPointCloudEvaluation(EvaluationTask):
    """Label-transfer metrics between labelled point clouds
    (reference tasks/evaluation.py:256-290)."""

    upstream_task = Parameter(default="SegmentedPointCloud")
    ground_truth = Parameter(default="PointCloudGroundTruth")

    def evaluate(self):
        from ..metrics import CompareSegmentedPointClouds
        pf = self.input()["upstream"].get(create=False).get_files()[0]
        gf = self.input()["ground_truth"].get(create=False).get_files()[0]
        pred = io.read_point_cloud(pf)
        gt = io.read_point_cloud(gf)
        pred_labels = pf.get_metadata("labels")
        gt_labels = gf.get_metadata("labels")
        cmp = CompareSegmentedPointClouds(gt, gt_labels, pred, pred_labels)
        return cmp.results


class CylinderRadiusGroundTruth(RomiTask):
    """Synthetic cylinder scan GT (reference tasks/evaluation.py:480-540)."""

    upstream_task = Parameter(default="ImagesFilesetExists", significant=False)
    radius = Parameter(default=10.0)
    height = Parameter(default=40.0)
    nb_points = Parameter(default=10000)

    def requires(self):
        return []

    def run(self):
        from ..evaluation import make_cylinder_pcd
        pcd = make_cylinder_pcd(float(self.radius), float(self.height),
                                int(self.nb_points))
        outfile = self.output_file()
        io.write_point_cloud(outfile, pcd)
        outfile.set_metadata({"radius": float(self.radius),
                              "height": float(self.height)})


class CylinderRadiusEstimation(EvaluationTask):
    """PCA radius recovery check (reference tasks/evaluation.py:543-597)."""

    upstream_task = Parameter(default="PointCloud")
    ground_truth = Parameter(default="CylinderRadiusGroundTruth")

    def evaluate(self):
        from ..evaluation import estimate_cylinder_radius
        pcd = io.read_point_cloud(
            self.input()["upstream"].get(create=False).get_files()[0])
        gt_file = self.input()["ground_truth"].get(create=False).get_files()[0]
        gt_radius = gt_file.get_metadata("radius")
        est = estimate_cylinder_radius(pcd)
        out = {"calculated_radius": est}
        if gt_radius:
            out["gt_radius"] = gt_radius
            out["err (%)"] = abs(est - gt_radius) / gt_radius * 100.0
        return out


class AnglesAndInternodesEvaluation(EvaluationTask):
    """DTW alignment of predicted vs ground-truth (angle, internode)
    sequences (reference tasks/evaluation.py:600-733). GT comes from
    measures.json (real scans) or VirtualPlant metadata (synthetic)."""

    upstream_task = Parameter(default="AnglesAndInternodes")
    ground_truth = Parameter(default="ImagesFilesetExists")
    free_ends = Parameter(default=0.4)
    free_ends_eps = Parameter(default=1e-2)

    def evaluate(self):
        from math import degrees
        from ..evaluation import align_sequences

        pred_file = self.input()["upstream"].get(create=False).get_file(
            "AnglesAndInternodes")
        pred = io.read_json(pred_file)
        pred_angles = list(map(float, pred["angles"]))
        pred_internodes = list(map(float, pred["internodes"]))
        if not pred_angles:
            raise IOError("Empty predicted angle sequence")

        gt_task = self.ground_truth
        if gt_task in ("VirtualPlant", "VirtualPlantObj", "PointCloudGroundTruth"):
            gt_fs = self.input()["ground_truth"].get(create=False)
            gt_file = gt_fs.get_files()[0]
            gt_angles = gt_file.get_metadata("angles")
            gt_internodes = gt_file.get_metadata("internodes")
        else:
            measures = read_measures(self.ctx.scan)
            gt_angles = measures.get("angles", [])
            gt_internodes = measures.get("internodes", [])
        if not gt_angles:
            raise IOError("No ground-truth angles available")

        # radians/degrees auto-guess (reference :673-695)
        if is_radians(gt_angles):
            gt_angles = [degrees(a) for a in gt_angles]
        if is_radians(pred_angles):
            pred_angles = [degrees(a) for a in pred_angles]

        res = align_sequences(pred_angles, pred_internodes,
                              gt_angles, gt_internodes,
                              free_ends=float(self.free_ends),
                              free_ends_eps=float(self.free_ends_eps))
        res["gt_angles"] = gt_angles
        res["pred_angles"] = pred_angles
        return res
