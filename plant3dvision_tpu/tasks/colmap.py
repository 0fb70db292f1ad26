"""Colmap task (reference tasks/colmap.py, 836 LoC): runs SfM, exports
camera parameters to image metadata, writes model JSONs + sparse.ply, and
performs the pose-quality failure detection (per-image 'pose_estimation'
metadata + consecutive-failure "blind angle" retry, tasks/colmap.py:792-834).
"""

from __future__ import annotations

import numpy as np

from ..fsdb import io
from ..fsdb.geometry import PointCloud
from ..filenames import (COLMAP_CAMERAS_ID, COLMAP_DENSE_ID, COLMAP_IMAGES_ID,
                         COLMAP_POINTS_ID, COLMAP_SPARSE_ID)
from ..runtime.log import configure_logger
from ..runtime.task import Parameter, RetryableTaskError, RomiTask
from ..camera import compute_estimated_pose

logger = configure_logger(__name__)


def get_cnc_poses(scan, images_fileset=None):
    """Per-image CNC pose [x, y, z] from 'approximate_pose' or 'pose'
    metadata (reference tasks/colmap.py:33-231)."""
    fs = images_fileset or scan.get_fileset("images")
    poses = {}
    for f in fs.get_files():
        p = f.get_metadata("pose") or f.get_metadata("approximate_pose")
        if p is not None:
            poses[f.id] = np.asarray(p[:3], dtype=float)
    return poses


class Colmap(RomiTask):
    upstream_task = Parameter(default="ImagesFilesetExists")
    matcher = Parameter(default="exhaustive")
    camera_model = Parameter(default="SIMPLE_RADIAL")
    compute_dense = Parameter(default=False)
    align_pcd = Parameter(default=True)
    use_gpu = Parameter(default=False)
    single_camera = Parameter(default=True)
    alignment_max_error = Parameter(default=10)
    distance_threshold = Parameter(default=5.0)
    max_blind_angle = Parameter(default=20.0)
    cli_args = Parameter(default={})
    bounding_box = Parameter(default=None)
    query = Parameter(default={})
    intrinsic_calibration_scan_id = Parameter(default="")
    extrinsic_calibration_scan_id = Parameter(default="")

    retry_count = 10  # blind-angle retries (reference tasks/colmap.py:529)

    def run(self):
        from ..colmap.runner import ColmapRunner

        images_fs = self.input()[0].get(create=False) if isinstance(
            self.input(), (list, tuple)) else self.input().get(create=False)
        files = images_fs.get_files(query=self.query or None)

        cli_args = dict(self.cli_args or {})
        if self.extrinsic_calibration_scan_id:
            self._inject_calibrated_poses(files)

        runner = ColmapRunner(
            files, matcher=str(self.matcher),
            compute_dense=bool(self.compute_dense),
            all_cli_args=cli_args, align_pcd=bool(self.align_pcd),
            use_gpu=bool(self.use_gpu), single_camera=bool(self.single_camera),
            alignment_max_error=self.alignment_max_error,
            camera_model=str(self.camera_model))
        points, images, cameras, sparse, dense_path, auto_bbox = runner.run()

        outfs = self.output().get()
        io.write_json(outfs.get_file(COLMAP_POINTS_ID, create=True), points)
        io.write_json(outfs.get_file(COLMAP_IMAGES_ID, create=True), images)
        io.write_json(outfs.get_file(COLMAP_CAMERAS_ID, create=True), cameras)
        io.write_point_cloud(outfs.get_file(COLMAP_SPARSE_ID, create=True),
                             PointCloud(sparse))
        if dense_path is not None:
            from ..fsdb import ply as plyio
            io.write_point_cloud(outfs.get_file(COLMAP_DENSE_ID, create=True),
                                 plyio.read_ply(dense_path))

        bbox = self.bounding_box or auto_bbox
        if bbox is not None:
            outfs.set_metadata("bounding_box", bbox)

        # export per-image camera metadata (reference colmap.py:305-372)
        by_name = {im["name"]: im for im in images.values()}
        estimated = {}
        for f in files:
            im = by_name.get(f.filename) or by_name.get(f.id)
            if im is None:
                continue
            cam = cameras[str(im["camera_id"])]
            f.set_metadata("colmap_camera", {
                "camera_model": {
                    "model": cam["model"], "params": cam["params"],
                    "width": cam["width"], "height": cam["height"],
                },
                "rotmat": im["rotmat"],
                "tvec": im["tvec"],
            })
            estimated[f.id] = compute_estimated_pose(im["rotmat"], im["tvec"])

        self._pose_quality_check(files, estimated, outfs)

    def _inject_calibrated_poses(self, files):
        """Copy calibrated_pose metadata from an ExtrinsicCalibration scan
        (reference tasks/colmap.py:234-312)."""
        calib_scan = self.ctx.db.get_scan(self.extrinsic_calibration_scan_id)
        if calib_scan is None:
            logger.warning("Extrinsic calibration scan not found: "
                           f"{self.extrinsic_calibration_scan_id}")
            return
        calib_imgs = calib_scan.get_fileset("images")
        if calib_imgs is None:
            return
        for f in files:
            src = calib_imgs.get_file(f.id)
            if src is not None:
                pose = src.get_metadata("calibrated_pose")
                if pose is not None:
                    f.set_metadata("calibrated_pose", pose)

    def _pose_quality_check(self, files, estimated, outfs):
        """Compare COLMAP camera centers against CNC poses; flag images and
        raise RetryableTaskError on a blind angle
        (reference tasks/colmap.py:773-834)."""
        cnc = get_cnc_poses(self.ctx.scan)
        distances = {}
        statuses = []
        ordered = sorted(files, key=lambda f: f.id)
        for f in ordered:
            if f.id in cnc and f.id in estimated:
                d = float(np.linalg.norm(np.asarray(estimated[f.id]) - cnc[f.id]))
                distances[f.id] = d
                ok = d <= float(self.distance_threshold)
            else:
                ok = f.id in estimated
            f.set_metadata("pose_estimation", "correct" if ok else "incorrect")
            statuses.append(ok)

        if distances:
            vals = np.array(list(distances.values()))
            io.write_json(outfs.get_file("euclidean_distances", create=True),
                          {"mean": float(vals.mean()), "std": float(vals.std()),
                           "distances": {k: float(v) for k, v in distances.items()}})

        # blind angle: longest run of consecutive failures (circular scan)
        if statuses and len(statuses) > 2:
            run_len = max_run = 0
            for ok in statuses + statuses:  # wrap-around
                run_len = 0 if ok else run_len + 1
                max_run = max(max_run, run_len)
            max_run = min(max_run, len(statuses))
            blind_angle = 360.0 * max_run / len(statuses)
            if blind_angle > float(self.max_blind_angle):
                raise RetryableTaskError(
                    f"Blind angle {blind_angle:.1f} deg exceeds "
                    f"{self.max_blind_angle} deg "
                    f"({max_run}/{len(statuses)} consecutive bad poses)")
