"""Quality metrics (role of reference plant3dvision/metrics.py, 586 LoC).

Point-set metrics run through sklearn KDTree (C-speed host queries) or JAX
for the large batched cases.
"""

from __future__ import annotations

import numpy as np

from .fsdb.geometry import PointCloud
from .runtime.log import configure_logger

logger = configure_logger(__name__)


# -- point cloud metrics (reference metrics.py:16-95) ---------------------

def chamfer_distance(ref_pcd, flo_pcd):
    """Symmetric mean squared nearest-neighbor distance
    (reference metrics.py:16-55)."""
    from sklearn.neighbors import KDTree
    ref = np.asarray(ref_pcd.points if hasattr(ref_pcd, "points") else ref_pcd)
    flo = np.asarray(flo_pcd.points if hasattr(flo_pcd, "points") else flo_pcd)
    if len(ref) == 0 or len(flo) == 0:
        return float("nan")
    d1, _ = KDTree(ref).query(flo, k=1)
    d2, _ = KDTree(flo).query(ref, k=1)
    return float((d1 ** 2).mean() + (d2 ** 2).mean())


def point_cloud_registration_fitness(ref_pcd, flo_pcd, max_distance=2.0):
    """(fitness, inlier_rmse) as in open3d evaluate_registration
    (reference metrics.py:58-95): fitness = |inlier corr| / |flo|,
    rmse over inlier correspondences."""
    from sklearn.neighbors import KDTree
    ref = np.asarray(ref_pcd.points if hasattr(ref_pcd, "points") else ref_pcd)
    flo = np.asarray(flo_pcd.points if hasattr(flo_pcd, "points") else flo_pcd)
    if len(ref) == 0 or len(flo) == 0:
        return 0.0, float("nan")
    d, _ = KDTree(ref).query(flo, k=1)
    inlier = d[:, 0] <= max_distance
    if inlier.sum() == 0:
        return 0.0, float("nan")
    fitness = float(inlier.mean())
    rmse = float(np.sqrt((d[inlier, 0] ** 2).mean()))
    return fitness, rmse


# -- set metrics (reference metrics.py:105-272) -----------------------------

class SetMetrics:
    """Accumulating tp/fp/tn/fn over mask pairs, with precision/recall/mIoU."""

    def __init__(self, groundtruth=None, prediction=None):
        self.tp = self.fp = self.tn = self.fn = 0
        self._n = 0
        self._miou_sum = 0.0
        if groundtruth is not None and prediction is not None:
            self.add(groundtruth, prediction)

    def add(self, groundtruth, prediction):
        gt = np.asarray(groundtruth) != 0
        pr = np.asarray(prediction) != 0
        tp = int(np.sum(gt & pr))
        fp = int(np.sum(~gt & pr))
        tn = int(np.sum(~gt & ~pr))
        fn = int(np.sum(gt & ~pr))
        self.tp += tp
        self.fp += fp
        self.tn += tn
        self.fn += fn
        union = tp + fp + fn
        self._miou_sum += (tp / union) if union else 1.0
        self._n += 1

    def __add__(self, other: "SetMetrics"):
        out = SetMetrics()
        for k in ("tp", "fp", "tn", "fn"):
            setattr(out, k, getattr(self, k) + getattr(other, k))
        out._n = self._n + other._n
        out._miou_sum = self._miou_sum + other._miou_sum
        return out

    def precision(self):
        d = self.tp + self.fp
        return self.tp / d if d else None

    def recall(self):
        d = self.tp + self.fn
        return self.tp / d if d else None

    def miou(self):
        return self._miou_sum / self._n if self._n else None

    def as_dict(self):
        return {"tp": self.tp, "fp": self.fp, "tn": self.tn, "fn": self.fn,
                "precision": self.precision(), "recall": self.recall(),
                "miou": self.miou()}


class CompareMasks(SetMetrics):
    """Pair comparison with optional dilation of the ground truth
    (reference metrics.py:207-272)."""

    def __init__(self, groundtruth, prediction, dilation_amount=0):
        super().__init__()
        if dilation_amount > 0:
            import jax.numpy as jnp
            from .ops.masks import binary_dilation
            groundtruth = np.asarray(
                binary_dilation(jnp.asarray(np.asarray(groundtruth) != 0),
                                dilation_amount))
        self.add(groundtruth, prediction)


class CompareMaskFilesets:
    """Compare two mask filesets matched by (shot_id, channel)
    (reference metrics.py:275-381)."""

    def __init__(self, groundtruth_fileset, prediction_fileset, labels,
                 dilation_amount=0):
        from .fsdb import io
        self.results = {"evaluation-results": {}}
        per_label = {label: SetMetrics() for label in labels}
        gt_files = groundtruth_fileset.get_files()
        index = {}
        for f in gt_files:
            key = (f.get_metadata("shot_id"), f.get_metadata("channel"))
            index[key] = f
        for pf in prediction_fileset.get_files():
            key = (pf.get_metadata("shot_id"), pf.get_metadata("channel"))
            label = key[1]
            if label not in labels or key not in index:
                continue
            gt = io.read_image(index[key])
            pred = io.read_image(pf)
            m = CompareMasks(gt, pred, dilation_amount)
            per_label[label] = per_label[label] + m
            self.results["evaluation-results"][pf.id] = m.as_dict()
        self.results["label-results"] = {
            label: m.as_dict() for label, m in per_label.items()}


class CompareSegmentedPointClouds:
    """Bidirectional NN label transfer between two labelled point clouds
    (reference metrics.py:384-519)."""

    def __init__(self, gt_pcd: PointCloud, gt_labels, pred_pcd: PointCloud,
                 pred_labels):
        from sklearn.neighbors import KDTree
        gt_pts = np.asarray(gt_pcd.points)
        pr_pts = np.asarray(pred_pcd.points)
        gt_lab = np.asarray(gt_labels)
        pr_lab = np.asarray(pred_labels)
        res = {}
        labels = sorted(set(gt_lab) | set(pr_lab))
        # gt -> pred
        _, i1 = KDTree(pr_pts).query(gt_pts, k=1)
        transfer1 = pr_lab[i1[:, 0]]
        # pred -> gt
        _, i2 = KDTree(gt_pts).query(pr_pts, k=1)
        transfer2 = gt_lab[i2[:, 0]]
        for label in labels:
            m = SetMetrics()
            m.add(gt_lab == label, transfer1 == label)
            m.add(transfer2 == label, pr_lab == label)
            res[label] = m.as_dict()
        miou = [v["miou"] for v in res.values() if v["miou"] is not None]
        self.results = {"per-label": res,
                        "miou": float(np.mean(miou)) if miou else None}


# -- mesh ratios (reference metrics.py:522-586) ------------------------------

def surface_ratio(pred_mesh, gt_mesh):
    ga = gt_mesh.surface_area()
    return pred_mesh.surface_area() / ga if ga else float("nan")


def volume_ratio(pred_mesh, gt_mesh):
    gv = gt_mesh.volume()
    return pred_mesh.volume() / gv if gv else float("nan")
