"""ColmapRunner: drives the external COLMAP binary through its SfM steps.

Role of reference plant3dvision/colmap.py:381-1269 (ColmapRunner): workdir
setup, image staging, poses.txt for the model aligner, the step sequence
feature_extractor -> matcher -> mapper -> model_aligner -> model_analyzer
(+ optional dense MVS), model parsing, bounding-box estimation.

Env: COLMAP_EXE (binary path, default 'colmap'), COLMAP_WD (workdir).
The docker execution path of the reference is intentionally dropped — a
plain subprocess against a user-provided binary covers the same contract.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from pathlib import Path

import numpy as np

from ..runtime.log import configure_logger
from . import read_model as rm

logger = configure_logger(__name__)


class ColmapError(RuntimeError):
    pass


def colmap_available(exe=None) -> bool:
    exe = exe or os.environ.get("COLMAP_EXE", "colmap")
    return shutil.which(exe) is not None


class ColmapRunner:
    def __init__(self, image_files, matcher="exhaustive", compute_dense=False,
                 all_cli_args=None, align_pcd=True, use_gpu=False,
                 single_camera=True, alignment_max_error=10,
                 camera_model="SIMPLE_RADIAL", workdir=None, exe=None):
        """image_files: list of fsdb Files (payload + metadata with poses)."""
        self.matcher = matcher
        self.compute_dense = compute_dense
        self.align_pcd = align_pcd
        self.use_gpu = use_gpu
        self.single_camera = single_camera
        self.alignment_max_error = alignment_max_error
        self.camera_model = camera_model
        self.cli_args = all_cli_args or {}
        self.exe = exe or os.environ.get("COLMAP_EXE", "colmap")

        wd = workdir or os.environ.get("COLMAP_WD")
        self.workdir = Path(wd) if wd else Path(tempfile.mkdtemp(prefix="colmap_"))
        self.imgs_dir = self.workdir / "images"
        self.sparse_dir = self.workdir / "sparse"
        self.dense_dir = self.workdir / "dense"
        self.imgs_dir.mkdir(parents=True, exist_ok=True)
        self.sparse_dir.mkdir(parents=True, exist_ok=True)
        self.log_path = self.workdir / "colmap.log"

        self._stage_images(image_files)

    def _stage_images(self, image_files):
        """Copy images into the workdir; write poses.txt from metadata
        (priority: calibrated_pose > pose > approximate_pose — reference
        colmap.py:633-681)."""
        from ..fsdb import io
        lines = []
        for f in image_files:
            dst = self.imgs_dir / (f.filename or f"{f.id}.jpg")
            io.to_file(f, dst)
            pose = (f.get_metadata("calibrated_pose")
                    or f.get_metadata("pose")
                    or f.get_metadata("approximate_pose"))
            if pose is not None:
                x, y, z = pose[0], pose[1], pose[2]
                lines.append(f"{dst.name} {x} {y} {z}")
        if lines:
            (self.workdir / "poses.txt").write_text("\n".join(lines) + "\n")

    # -- steps ---------------------------------------------------------

    def _run(self, subcommand, **kwargs):
        cmd = [self.exe, subcommand]
        for k, v in kwargs.items():
            cmd += [f"--{k}", str(v)]
        extra = self.cli_args.get(subcommand, {})
        for k, v in extra.items():
            cmd += [f"--{k}", str(v)]
        logger.info("colmap " + " ".join(cmd[1:3]))
        with open(self.log_path, "a") as log:
            proc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT)
        if proc.returncode != 0:
            raise ColmapError(
                f"colmap {subcommand} failed (rc={proc.returncode}); "
                f"see {self.log_path}")

    def feature_extractor(self):
        self._run("feature_extractor",
                  **{"database_path": self.workdir / "database.db",
                     "image_path": self.imgs_dir,
                     "ImageReader.camera_model": self.camera_model,
                     "ImageReader.single_camera": int(self.single_camera),
                     "SiftExtraction.use_gpu": int(self.use_gpu)})

    def matcher_step(self):
        sub = {"exhaustive": "exhaustive_matcher",
               "sequential": "sequential_matcher",
               "spatial": "spatial_matcher",
               "transitive": "transitive_matcher"}[self.matcher]
        self._run(sub, **{"database_path": self.workdir / "database.db",
                          "SiftMatching.use_gpu": int(self.use_gpu)})

    def mapper(self):
        self._run("mapper", **{"database_path": self.workdir / "database.db",
                               "image_path": self.imgs_dir,
                               "output_path": self.sparse_dir})

    def model_aligner(self):
        if not (self.workdir / "poses.txt").exists():
            logger.warning("model_aligner skipped: no poses.txt")
            return
        aligned = self.workdir / "aligned"
        aligned.mkdir(exist_ok=True)
        self._run("model_aligner",
                  **{"input_path": self.sparse_dir / "0",
                     "output_path": aligned,
                     "ref_images_path": self.workdir / "poses.txt",
                     "ref_is_gps": 0,
                     "alignment_max_error": self.alignment_max_error})
        for f in aligned.glob("*.bin"):
            shutil.copy(f, self.sparse_dir / "0" / f.name)

    def model_analyzer(self):
        self._run("model_analyzer", **{"path": self.sparse_dir / "0"})

    def dense(self):
        self.dense_dir.mkdir(exist_ok=True)
        self._run("image_undistorter",
                  **{"image_path": self.imgs_dir,
                     "input_path": self.sparse_dir / "0",
                     "output_path": self.dense_dir})
        self._run("patch_match_stereo", **{"workspace_path": self.dense_dir})
        self._run("stereo_fusion",
                  **{"workspace_path": self.dense_dir,
                     "output_path": self.dense_dir / "fused.ply"})

    # -- orchestration ---------------------------------------------------

    def run(self):
        """Full SfM; returns (points_dict, images_dict, cameras_dict,
        sparse_points (N,3), dense_path or None, bounding_box)."""
        if not colmap_available(self.exe):
            raise ColmapError(
                f"COLMAP binary not found ({self.exe}); set COLMAP_EXE")
        self.feature_extractor()
        self.matcher_step()
        self.mapper()
        if self.align_pcd:
            self.model_aligner()
        try:
            self.model_analyzer()
        except ColmapError:
            pass

        cameras, images, points = rm.read_model(self.sparse_dir / "0")
        sparse = np.array([p.xyz for p in points.values()]) if points else np.zeros((0, 3))

        dense_path = None
        if self.compute_dense:
            self.dense()
            dense_path = self.dense_dir / "fused.ply"

        bbox = self.estimate_bounding_box(sparse)
        return (rm.points_to_dict(points), rm.images_to_dict(images),
                rm.cameras_to_dict(cameras), sparse, dense_path, bbox)

    @staticmethod
    def estimate_bounding_box(points, margin_frac=0.05):
        """Auto bbox = min/max +/- 5% (reference colmap.py:1244-1266)."""
        if len(points) == 0:
            return None
        lo = points.min(axis=0)
        hi = points.max(axis=0)
        margin = (hi - lo) * margin_frac
        lo = lo - margin
        hi = hi + margin
        return {"x": [float(lo[0]), float(hi[0])],
                "y": [float(lo[1]), float(hi[1])],
                "z": [float(lo[2]), float(hi[2])]}

    @staticmethod
    def crop_points(points, bbox):
        """Crop with empty-fallback (reference colmap.py:1218-1242)."""
        keep = np.ones(len(points), dtype=bool)
        for ax, key in enumerate(("x", "y", "z")):
            keep &= (points[:, ax] >= bbox[key][0]) & (points[:, ax] <= bbox[key][1])
        if keep.sum() == 0:
            logger.warning("bbox crop removed all points; keeping uncropped")
            return points
        return points[keep]
