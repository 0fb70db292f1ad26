"""Cross-scan repeatability analysis (role of reference compare.py, 1108 LoC).

Pairwise comparison of pipeline outputs across replicated scans, used by
bin/robustness_evaluation: intrinsics spread, pose variability, masks,
point clouds, voxels, meshes, skeletons, angle sequences.
"""

from __future__ import annotations

import itertools

import numpy as np

from .fsdb import io
from .runtime.log import configure_logger
from .utils import locate_task_filesets

logger = configure_logger(__name__)


def _task_fileset(scan, task_name):
    fs_id = locate_task_filesets(scan, [task_name])[task_name]
    return scan.get_fileset(fs_id) if fs_id != "None" else None


def compare_intrinsics(scans):
    """Spread of per-scan camera intrinsics (reference compare.py:257)."""
    rows = {}
    for scan in scans:
        fs = _task_fileset(scan, "Colmap")
        if fs is None:
            continue
        f = fs.get_file("cameras")
        if f is None:
            continue
        cams = io.read_json(f)
        for cid, cam in cams.items():
            rows.setdefault(scan.id, cam["params"])
    if not rows:
        return {}
    arr = np.array(list(rows.values()), dtype=float)
    return {"per_scan": rows,
            "mean": arr.mean(axis=0).tolist(),
            "std": arr.std(axis=0).tolist(),
            "cv_percent": (100 * arr.std(axis=0)
                           / np.maximum(np.abs(arr.mean(axis=0)), 1e-12)).tolist()}


def compare_poses(scans):
    """Per-image estimated camera center variability (compare.py:407)."""
    per_image = {}
    for scan in scans:
        images = scan.get_fileset("images")
        if images is None:
            continue
        for f in images.get_files():
            cam = f.get_metadata("colmap_camera") or f.get_metadata("camera")
            if not cam:
                continue
            from .camera import compute_estimated_pose
            c = compute_estimated_pose(cam["rotmat"], cam["tvec"])
            per_image.setdefault(f.id, []).append(c)
    out = {}
    for fid, centers in per_image.items():
        arr = np.asarray(centers)
        if len(arr) > 1:
            out[fid] = {"mean": arr.mean(axis=0).tolist(),
                        "std": arr.std(axis=0).tolist(),
                        "spread": float(np.linalg.norm(arr.std(axis=0)))}
    return out


def compare_masks(scans, dilation=0):
    """Pairwise mask precision/recall across replicated scans
    (compare.py:679)."""
    from .metrics import CompareMasks
    results = {}
    filesets = [(s, _task_fileset(s, "Masks")) for s in scans]
    filesets = [(s, fs) for s, fs in filesets if fs is not None]
    for (s1, f1), (s2, f2) in itertools.combinations(filesets, 2):
        key = f"{s1.id}-vs-{s2.id}"
        pair = []
        for fa in f1.get_files():
            fb = f2.get_file(fa.id)
            if fb is None:
                continue
            m = CompareMasks(io.read_image(fa), io.read_image(fb), dilation)
            pair.append(m.as_dict())
        if pair:
            results[key] = {
                "mean_precision": float(np.mean([p["precision"] for p in pair
                                                 if p["precision"] is not None])),
                "mean_recall": float(np.mean([p["recall"] for p in pair
                                              if p["recall"] is not None])),
                "n_pairs": len(pair)}
    return results


def compare_point_clouds(scans, max_distance=2.0):
    """Pairwise chamfer + registration fitness (compare.py:733)."""
    from .metrics import chamfer_distance, point_cloud_registration_fitness
    results = {}
    pcds = []
    for s in scans:
        fs = _task_fileset(s, "PointCloud")
        if fs is not None and fs.get_files():
            pcds.append((s, io.read_point_cloud(fs.get_files()[0])))
    for (s1, p1), (s2, p2) in itertools.combinations(pcds, 2):
        fit, rmse = point_cloud_registration_fitness(p1, p2, max_distance)
        results[f"{s1.id}-vs-{s2.id}"] = {
            "chamfer": chamfer_distance(p1, p2),
            "fitness": fit, "inlier_rmse": rmse}
    return results


def compare_voxels(scans, threshold=0.5):
    """Pairwise voxel IoU (compare.py:792)."""
    results = {}
    vols = []
    for s in scans:
        fs = _task_fileset(s, "Voxels")
        if fs is not None and fs.get_files():
            v = io.read_npz(fs.get_files()[0])
            key = list(v.keys())[0]
            vols.append((s, v[key]))
    for (s1, v1), (s2, v2) in itertools.combinations(vols, 2):
        if v1.shape != v2.shape:
            continue
        a = v1 > threshold
        b = v2 > threshold
        inter = np.sum(a & b)
        union = np.sum(a | b)
        results[f"{s1.id}-vs-{s2.id}"] = {
            "iou": float(inter / union) if union else None}
    return results


def compare_meshes(scans):
    """Pairwise surface/volume ratios (compare.py:952)."""
    from .metrics import surface_ratio, volume_ratio
    results = {}
    meshes = []
    for s in scans:
        fs = _task_fileset(s, "TriangleMesh")
        if fs is not None and fs.get_files():
            meshes.append((s, io.read_triangle_mesh(fs.get_files()[0])))
    for (s1, m1), (s2, m2) in itertools.combinations(meshes, 2):
        results[f"{s1.id}-vs-{s2.id}"] = {
            "surface_ratio": surface_ratio(m1, m2),
            "volume_ratio": volume_ratio(m1, m2)}
    return results


def compare_skeletons(scans):
    """Pairwise chamfer of skeleton nodes (compare.py:1010)."""
    from .metrics import chamfer_distance
    results = {}
    skels = []
    for s in scans:
        fs = _task_fileset(s, "CurveSkeleton")
        if fs is not None and fs.get_files():
            skels.append((s, np.asarray(io.read_json(fs.get_files()[0])["points"])))
    for (s1, p1), (s2, p2) in itertools.combinations(skels, 2):
        results[f"{s1.id}-vs-{s2.id}"] = {"chamfer": chamfer_distance(p1, p2)}
    return results


def compare_angles(scans, free_ends=0.4):
    """Pairwise DTW of angle/internode sequences (compare.py:1059)."""
    from .evaluation import align_sequences
    results = {}
    seqs = []
    for s in scans:
        fs = _task_fileset(s, "AnglesAndInternodes")
        if fs is None:
            continue
        f = fs.get_file("AnglesAndInternodes")
        if f is None:
            continue
        seq = io.read_json(f)
        if seq.get("angles"):
            seqs.append((s, seq))
    for (s1, q1), (s2, q2) in itertools.combinations(seqs, 2):
        res = align_sequences(q1["angles"], q1["internodes"],
                              q2["angles"], q2["internodes"],
                              free_ends=free_ends)
        results[f"{s1.id}-vs-{s2.id}"] = {
            "mean_angle_error": res["mean_angle_error"],
            "mean_internode_error": res["mean_internode_error"],
            "normalized_cost": res["normalized_cost"]}
    return results


COMPARISON_FUNCTIONS = {
    "Colmap": compare_poses,
    "Masks": compare_masks,
    "Voxels": compare_voxels,
    "PointCloud": compare_point_clouds,
    "TriangleMesh": compare_meshes,
    "CurveSkeleton": compare_skeletons,
    "AnglesAndInternodes": compare_angles,
}
