"""2D tasks: Undistorted, Masks (reference tasks/proc2d.py).

Per-image math runs as jitted TPU programs (ops.undistort / ops.masks);
jit caches by image shape so a whole fileset compiles once.
"""

from __future__ import annotations

import numpy as np

from ..fsdb import io
from ..runtime.log import configure_logger
from ..runtime.task import FileByFileTask, Parameter
from .. import camera as cameralib

logger = configure_logger(__name__)


class Undistorted(FileByFileTask):
    """Undistort images using their camera intrinsics.

    Camera source priority (reference tasks/proc2d.py:62-88): per-image
    'colmap_camera' metadata, then exact 'camera' metadata.
    """

    upstream_task = Parameter(default="ImagesFilesetExists")
    camera_model_source = Parameter(default="metadata")

    def f(self, fin, outfs):
        from ..ops.undistort import undistort
        cam = cameralib.get_camera_kwargs_from_images_metadata(fin)
        if cam is None:
            logger.warning(f"Undistorted: no camera metadata for {fin.id}, copying as-is")
            img = io.read_image(fin)
        else:
            img = io.read_image(fin)
            img = np.asarray(undistort(img, cam["K"].astype(np.float32),
                                       cam["dist"].astype(np.float32)))
        fout = outfs.get_file(fin.id, create=True)
        ext = (fin.filename or "x.png").rsplit(".", 1)[-1]
        io.write_image(fout, img, ext)
        return fout


class Masks(FileByFileTask):
    """Binary plant masks from color filters
    (reference tasks/proc2d.py:207-249)."""

    upstream_task = Parameter(default="Undistorted")
    type = Parameter(default="linear")
    parameters = Parameter(default=[0.0, 1.0, 0.0])
    dilation = Parameter(default=0)
    binarize = Parameter(default=True)
    threshold = Parameter(default=0.3)

    def f(self, fin, outfs):
        from ..ops.masks import compute_mask
        img = io.read_image(fin)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        coefs = self.parameters
        if isinstance(coefs, str):
            import json
            coefs = json.loads(coefs)
        out = np.asarray(compute_mask(
            img, filter_type=str(self.type), coefs=tuple(map(float, coefs)),
            threshold=float(self.threshold),
            dilation_radius=int(self.dilation),
            binarize=bool(self.binarize)))
        fout = outfs.get_file(fin.id, create=True)
        io.write_image(fout, (out * 255).astype(np.uint8), "png")
        return fout
