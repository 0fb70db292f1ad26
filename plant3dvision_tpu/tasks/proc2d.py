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

    Camera source (reference tasks/proc2d.py:62-88): per-image
    'colmap_camera'/'camera' metadata (default), or an
    IntrinsicCalibration output fileset (camera_model_source =
    "IntrinsicCalibration" [+ calibration_scan_id] with a chosen model).
    """

    upstream_task = Parameter(default="ImagesFilesetExists")
    camera_model_source = Parameter(default="metadata")
    calibration_scan_id = Parameter(default="")
    calibration_model = Parameter(default="OPENCV")

    def _calibrated_camera(self):
        """K/dist from an IntrinsicCalibration camera_model.json."""
        from ..utils import locate_task_filesets
        scan = self.ctx.scan
        if self.calibration_scan_id:
            scan = self.ctx.db.get_scan(self.calibration_scan_id) or scan
        fs_id = locate_task_filesets(scan, ["IntrinsicCalibration"])[
            "IntrinsicCalibration"]
        if fs_id == "None":
            raise FileNotFoundError("No IntrinsicCalibration fileset found")
        data = io.read_json(scan.get_fileset(fs_id).get_file("camera_model"))
        res = data[str(self.calibration_model)]
        K, dist = cameralib.colmap_params_to_k_dist(res["model"], res["params"])
        return {"K": K, "dist": dist}

    def _camera_for(self, fin):
        if str(self.camera_model_source) == "IntrinsicCalibration":
            return self._calibrated_camera()
        return cameralib.get_camera_kwargs_from_images_metadata(fin)

    @staticmethod
    def _out_ext(fin):
        """Undistorted output is written LOSSLESSLY: re-encoding a
        resampled frame as JPEG (imageio default quality) shifts mask
        edges enough to cost ~5 deg of divergence-angle accuracy on the
        real_plant fixture (measured round 3). Lossless inputs keep
        their extension; lossy ones are promoted to png."""
        ext = (fin.filename or "x.png").rsplit(".", 1)[-1].lower()
        return ext if ext in ("png", "tif", "tiff", "bmp") else "png"

    def f(self, fin, outfs):
        from ..ops.undistort import undistort
        cam = self._camera_for(fin)
        if cam is None:
            logger.warning(f"Undistorted: no camera metadata for {fin.id}, copying as-is")
            img = io.read_image(fin)
        else:
            img = io.read_image(fin)
            img = np.asarray(undistort(img, cam["K"].astype(np.float32),
                                       cam["dist"].astype(np.float32)))
        fout = outfs.get_file(fin.id, create=True)
        io.write_image(fout, img, self._out_ext(fin))
        return fout

    def run(self):
        """Batched path: group files by camera, undistort whole chunks in one
        vmapped device call (per-image dispatch costs ~0.2 s each through
        the device tunnel — see CLAUDE.md), threads for the codecs."""
        from concurrent.futures import ThreadPoolExecutor
        import jax
        import jax.numpy as jnp
        from ..ops.undistort import undistort_batch

        inp = self.input()
        if isinstance(inp, (list, tuple)):
            inp = inp[0]
        infs = inp.get(create=False)
        outfs = self.output().get()
        files = infs.get_files(query=self.query or None)
        logger.info(f"Undistorted: {len(files)} files")

        # group by camera parameters
        groups: dict[tuple, list] = {}
        no_cam = []
        for fin in files:
            cam = self._camera_for(fin)
            if cam is None:
                no_cam.append(fin)
                continue
            key = (tuple(np.asarray(cam["K"]).ravel()),
                   tuple(np.asarray(cam["dist"]).ravel()))
            groups.setdefault(key, []).append(fin)

        from ..runtime.task import paused_gc
        chunk = 16
        with self.ctx.scan.deferred_store(), paused_gc(), \
                ThreadPoolExecutor(8) as ex:
            def _copy_through(fin):
                fout = outfs.get_file(fin.id, create=True)
                io.write_image(fout, io.read_image(fin), self._out_ext(fin))
                fout.set_metadata(fin.get_metadata())

            list(ex.map(_copy_through, no_cam))

            for (k_flat, d_flat), members in groups.items():
                K = jnp.asarray(np.asarray(k_flat).reshape(3, 3), jnp.float32)
                dist = jnp.asarray(np.asarray(d_flat), jnp.float32)
                for i in range(0, len(members), chunk):
                    part = members[i: i + chunk]
                    imgs = list(ex.map(io.read_image, part))
                    if len({im.shape for im in imgs}) != 1:
                        for fin in part:  # mixed sizes: per-file fallback
                            fout = self.f(fin, outfs)
                            if fout is not None:
                                fout.set_metadata(fin.get_metadata())
                        continue
                    batch = np.stack(imgs)
                    out = np.asarray(undistort_batch(jnp.asarray(batch), K, dist))

                    def _write(args):
                        fin, img = args
                        fout = outfs.get_file(fin.id, create=True)
                        io.write_image(fout, img, self._out_ext(fin))
                        fout.set_metadata(fin.get_metadata())

                    list(ex.map(_write, zip(part, out)))


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
        from ..ops.masks import compute_mask_numpy
        img = io.read_image(fin)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        coefs = self.parameters
        if isinstance(coefs, str):
            import json
            coefs = json.loads(coefs)
        out = compute_mask_numpy(
            img, filter_type=str(self.type), coefs=tuple(map(float, coefs)),
            threshold=float(self.threshold),
            dilation_radius=int(self.dilation),
            binarize=bool(self.binarize))
        fout = outfs.get_file(fin.id, create=True)
        io.write_image(fout, (out * 255).astype(np.uint8), "png")
        return fout


class Segmentation2D(Masks):
    """CNN organ segmentation: one grayscale PNG per image x label with
    'channel' metadata (reference tasks/proc2d.py:302-393, romiseg boundary).

    The model comes from the 'models' fileset (ModelFilesetExists), stored
    in this framework's NPZ checkpoint format (models/checkpoint.py).
    """

    upstream_task = Parameter(default="Undistorted")
    model_fileset = Parameter(default="ModelFilesetExists", significant=False)
    model_id = Parameter(default="")
    query = Parameter(default={})
    Sx = Parameter(default=896)
    Sy = Parameter(default=896)
    #: False (reference behavior, tasks/proc2d.py:351): center-crop the
    #: input to (Sy, Sx) and shift the written camera principal point.
    #: True: resize the input to (Sy, Sx) for the net and resize the
    #: probability maps back, so the written masks keep the original
    #: geometry (camera metadata copied verbatim). Lets inference run at
    #: a fraction of full-frame cost when the plant fills the frame.
    resize = Parameter(default=False)
    single_label = Parameter(default="")
    inverted_labels = Parameter(default=["background"])
    binarize = Parameter(default=True)
    threshold = Parameter(default=0.01)
    dilation = Parameter(default=1)
    #: flip-averaged test-time augmentation (models/unet.py _fwd_program)
    tta = Parameter(default=False)
    #: inference batch: throughput scales well past 8 on TPU (measured
    #: 896^2 TPUSegNet 129->372 img/s from batch 8 to 96, ResUNet 70->197
    #: at 64; batch 128 OOMs a v5e — SEG_BENCH.json). 8 is the safe
    #: default for small-memory devices; not significant for hashing.
    batch_size = Parameter(default=8, significant=False)
    #: "bf16" (default) or "int8": dynamic int8 PTQ serving lane — the
    #: v5e MXU runs int8 contractions ~2x faster than bf16 (measured
    #: 227 vs 124 TOP/s, exp_int8_conv.py); same checkpoint, float
    #: logits head. Argmax-agreement guard: tests/unit/test_models.py.
    conv_mode = Parameter(default="bf16", significant=False)
    #: shard inference batches over all visible devices ("auto" follows
    #: models/unet.segmentation_inference: on for multi-device non-CPU
    #: backends; true/false force it — the dryrun's dp-seg lane)
    data_parallel = Parameter(default="auto", significant=False)

    def requires(self):
        return {"images": self._upstream(),
                "model": self.ctx.get_task(self.model_fileset)}

    def run(self):
        from ..models.checkpoint import load_model
        from ..models.unet import segmentation_inference
        from ..ops.masks import binary_dilation
        import jax.numpy as jnp

        model_fs = self.input()["model"].get(create=False)
        if model_fs is None:
            raise FileNotFoundError("No 'models' fileset found")
        mfile = (model_fs.get_file(self.model_id) if self.model_id
                 else model_fs.get_files()[0])
        model, params, config = load_model(mfile)
        labels = config.get("label_names") or mfile.get_metadata("label_names")

        images_fs = self.input()["images"].get(create=False)
        files = images_fs.get_files(query=self.query or None)
        logger.info(f"Segmentation2D: {len(files)} images, labels={labels}")

        from ..runtime.task import paused_gc

        Sx, Sy = int(self.Sx), int(self.Sy)
        do_resize = bool(self.resize)

        def _load(fin):
            img = io.read_image(fin)
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, axis=-1)
            H, W = img.shape[:2]
            if do_resize:
                import cv2
                if (W, H) != (Sx, Sy):
                    img = cv2.resize(img[..., :3], (Sx, Sy),
                                     interpolation=cv2.INTER_AREA)
                # second element = original size (to upsample probs back)
                return img[..., :3], (W, H)
            # center crop to (Sy, Sx) as the reference does (:351)
            y0 = max((H - Sy) // 2, 0)
            x0 = max((W - Sx) // 2, 0)
            return img[y0: y0 + Sy, x0: x0 + Sx, :3], (x0, y0)

        from concurrent.futures import ThreadPoolExecutor
        with paused_gc(), ThreadPoolExecutor(max_workers=8) as ex:
            loaded = list(ex.map(_load, files))
        imgs = [im for im, _ in loaded]
        offsets = [off for _, off in loaded]
        metas = list(files)
        batch = np.stack(imgs)

        dp = self.data_parallel
        if not isinstance(dp, bool):
            dp = {"auto": "auto", "true": True, "false": False}[
                str(dp).lower()]
        probs = segmentation_inference(model, params, batch,
                                       batch_size=int(self.batch_size),
                                       tta=bool(self.tta),
                                       conv_mode=str(self.conv_mode),
                                       data_parallel=dp)  # (N, C, H, W)
        if probs.dtype == np.uint8:   # quantized transfer (unet.py)
            probs = probs.astype(np.float32) / 255.0

        outfs = self.output().get()
        with paused_gc():
            if do_resize:
                self._write_channels(outfs, metas, labels, probs,
                                     orig_sizes=offsets)
            else:
                self._write_channels(outfs, metas, labels, probs, offsets)

    @staticmethod
    def _shift_principal_point(md, offset):
        """The written masks are center-cropped, so any per-image camera
        metadata must have its principal point shifted by the crop
        origin or downstream carving misprojects by (x0, y0) px. The
        reference copies the metadata verbatim (tasks/proc2d.py:383-388)
        — a latent bug for scans larger than (Sx, Sy)."""
        x0, y0 = offset
        if not (x0 or y0):
            return md
        for key in ("camera", "colmap_camera", "calibrated_camera"):
            cam = md.get(key)
            if not isinstance(cam, dict):
                continue
            model = cam.get("camera_model")
            if isinstance(model, dict) and "params" in model:
                params = list(model["params"])
                if len(params) >= 4:
                    params[2] = params[2] - x0
                    params[3] = params[3] - y0
                    model = dict(model, params=params)
                    md[key] = dict(cam, camera_model=model)
        return md

    def _write_channels(self, outfs, metas, labels, probs, offsets=None,
                        orig_sizes=None):
        from ..ops.masks import binary_dilation
        import jax.numpy as jnp
        for i, fin in enumerate(metas):
            for c, label in enumerate(labels):
                if self.single_label and label != self.single_label:
                    continue
                pred = probs[i, c]
                if orig_sizes is not None:
                    # resize mode: probabilities back to the original
                    # frame, camera metadata stays verbatim
                    import cv2
                    W, H = orig_sizes[i]
                    if pred.shape[:2] != (H, W):
                        pred = cv2.resize(np.asarray(pred, np.float32),
                                          (W, H),
                                          interpolation=cv2.INTER_LINEAR)
                # inverted labels (background) are thresholded in the
                # INVERTED space and re-inverted before writing, exactly
                # like the reference (tasks/proc2d.py:366-378): the
                # written background PNG is true background = NOT
                # dilate(plantness > threshold) — so the averaging
                # volume's background channel counts empty-space
                # evidence, not plant evidence
                inverted = label in list(self.inverted_labels)
                if inverted:
                    pred = 1.0 - pred
                if bool(self.binarize):
                    m = pred > float(self.threshold)
                    if int(self.dilation) > 0:
                        m = np.asarray(binary_dilation(jnp.asarray(m),
                                                       int(self.dilation)))
                    pred = m.astype(np.float32)
                if inverted:
                    pred = 1.0 - pred
                fout = outfs.get_file(f"{fin.id}_{label}", create=True)
                io.write_image(fout, (pred * 255).astype(np.uint8), "png")
                md = fin.get_metadata()
                if offsets is not None:
                    md = self._shift_principal_point(md, offsets[i])
                md["channel"] = label
                fout.set_metadata(md)
        outfs.set_metadata("label_names", list(labels))
