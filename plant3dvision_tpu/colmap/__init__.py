"""COLMAP SfM integration (L3).

The reference drives the COLMAP C++/CUDA binary via subprocess/docker
(colmap.py:842-896) and parses its binary model files
(thirdparty/read_model.py). Per the TPU-era design (SURVEY.md §2.3),
COLMAP remains a host-side external engine: this package provides the
model-file parsers/writers and the subprocess runner; poses feed the TPU
carving path as read-only inputs.
"""

from . import read_model  # the submodule (read_model.read_model reads a dir)
from .read_model import (
    Camera,
    Image,
    Point3D,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
    qvec2rotmat,
    rotmat2qvec,
)
from .runner import ColmapRunner

__all__ = [
    "Camera", "Image", "Point3D", "read_cameras_binary", "read_images_binary",
    "read_points3d_binary", "read_model", "write_cameras_binary",
    "write_images_binary", "write_points3d_binary", "qvec2rotmat",
    "rotmat2qvec", "ColmapRunner",
]
