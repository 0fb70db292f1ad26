"""FusedSegmentationCarving: images -> CNN -> multi-label volume in one
device-resident pipeline (no per-label mask PNG round-trips).

Covers Segmentation2D + Voxels(type="averaging") of the reference's ML
route (tasks/proc2d.py:328-393 + tasks/cl.py:99-186) as a single task.
Output is IDENTICAL in kind to the Voxels task's NPZ (one array per
label + voxel_size/origin metadata), so PointCloud/SegmentedPointCloud
and the evaluation stack consume it unchanged. Use the separate
Segmentation2D task when the per-image label PNGs themselves are needed.
"""

from __future__ import annotations

import numpy as np

from ..fsdb import io
from ..runtime.log import configure_logger
from ..runtime.task import Parameter, RomiTask

logger = configure_logger(__name__)


class FusedSegmentationCarving(RomiTask):
    upstream_task = Parameter(default="ImagesFilesetExists")
    model_fileset = Parameter(default="ModelFilesetExists", significant=False)
    model_id = Parameter(default="")
    query = Parameter(default={})
    camera_metadata = Parameter(default="camera")
    voxel_size = Parameter(default=1.0)
    bounding_box = Parameter(default=None)
    Sx = Parameter(default=896)
    Sy = Parameter(default=896)
    #: probability sampling at the projection: "bilinear" (continuous —
    #: strictly more accurate than the reference) or "box" (the
    #: reference's LINEAR-at-integer-coords half-texel box filter,
    #: factored into a prefilter + ONE nearest gather = 4x fewer
    #: gathers; the gathers ARE this task's device time at fine voxels)
    sample = Parameter(default="bilinear")
    batch_size = Parameter(default=8)
    log = Parameter(default=True)

    def requires(self):
        return {"images": self._upstream(),
                "model": self.ctx.get_task(self.model_fileset)}

    def _resolve_bounding_box(self):
        bbox = self.bounding_box
        scan = self.ctx.scan
        if bbox is None:
            bbox = scan.get_metadata("bounding_box")
        if bbox is None:
            images_fs = scan.get_fileset("images")
            if images_fs is not None:
                bbox = (images_fs.get_metadata("bounding_box")
                        or images_fs.get_metadata("workspace"))
        if bbox is None:
            raise ValueError("Could not obtain a valid bounding-box")
        return bbox

    def run(self):
        import jax
        import jax.numpy as jnp

        from ..models.checkpoint import load_model
        from ..models.unet import _fwd_program
        from ..ops.carving import _avg_chunk_voxels, camera_from_metadata
        from ..ops.ml_fused import (accumulate_label_views,
                                    accumulate_label_views_slab)

        model_fs = self.input()["model"].get(create=False)
        mfile = (model_fs.get_file(self.model_id) if self.model_id
                 else model_fs.get_files()[0])
        model, params, config = load_model(mfile)
        labels = config.get("label_names") or mfile.get_metadata("label_names")
        C = len(labels)

        images_fs = self.input()["images"].get(create=False)
        files = images_fs.get_files(query=self.query or None)
        cam_key = str(self.camera_metadata)
        selected = [(f, f.get_metadata(cam_key)) for f in files]
        selected = [(f, c) for f, c in selected if c is not None]
        if not selected:
            raise ValueError(f"No images with '{cam_key}' camera metadata")

        Sx, Sy = int(self.Sx), int(self.Sy)
        bbox = self._resolve_bounding_box()
        vs = float(self.voxel_size)
        x0, x1 = bbox["x"]; y0, y1 = bbox["y"]; z0, z1 = bbox["z"]
        shape = (int((x1 - x0) / vs) + 1, int((y1 - y0) / vs) + 1,
                 int((z1 - z0) / vs) + 1)
        origin = np.array([x0, y0, z0])
        logger.info(f"FusedSegmentationCarving: {len(selected)} views, "
                    f"labels {labels}, grid {shape} at {vs} mm")

        params_c = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        # numpy params would re-cross the host->device link every batch
        params_c = jax.device_put(params_c)
        fwd = _fwd_program(model, Sy, Sx, "bfloat16", True, False)

        B = int(self.batch_size)
        # production grids (0.5 mm, 6 labels) exceed what one program's
        # per-view temporaries can hold — slab the x axis (VERDICT r3 #2;
        # the reference degrades with a warning, never a crash,
        # cl.py:154-158). One compiled slab program serves all slabs.
        budget = _avg_chunk_voxels()
        nvox_l = C * int(np.prod(shape))
        if nvox_l > budget:
            slab_nx = max(1, budget // (C * shape[1] * shape[2]))
            slab_nx = min(slab_nx, shape[0])
            nx_pad = -(-shape[0] // slab_nx) * slab_nx
            n_slabs = nx_pad // slab_nx
            logger.info(f"FusedSegmentationCarving: slabbing x into "
                        f"{n_slabs} chunks of {slab_nx} rows")
        else:
            slab_nx, nx_pad, n_slabs = shape[0], shape[0], 1
        vol = jnp.zeros((C, nx_pad, shape[1], shape[2]), jnp.float32)
        origin_j = jnp.asarray(origin, jnp.float32)
        log_mode = bool(self.log)
        sample = str(self.sample)

        batch_imgs, batch_cams = [], []

        def flush():
            nonlocal vol, batch_imgs, batch_cams
            if not batch_imgs:
                return
            n = len(batch_imgs)
            while len(batch_imgs) < B:          # pad to the static batch
                batch_imgs.append(np.zeros_like(batch_imgs[0]))
                batch_cams.append(batch_cams[-1])
            probs = fwd(params_c, jnp.asarray(np.stack(batch_imgs)))
            cams = jnp.asarray(np.stack(batch_cams))
            valid = jnp.arange(B) < n
            # crop-adjusted principal point: probs live on the (Sy, Sx)
            # center crop of the original frame
            if n_slabs == 1:
                vol = accumulate_label_views(vol, probs, cams, valid,
                                             origin_j, jnp.float32(vs),
                                             (nx_pad, *shape[1:]), log_mode,
                                             sample=sample)
            else:
                for si in range(n_slabs):
                    vol = accumulate_label_views_slab(
                        vol, probs, cams, valid, origin_j, jnp.float32(vs),
                        si * slab_nx, slab_nx, log_mode, sample=sample)
            batch_imgs, batch_cams = [], []

        for f, cam_md in selected:
            img = io.read_image(f)
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, axis=-1)
            H, W = img.shape[:2]
            yc = max((H - Sy) // 2, 0)
            xc = max((W - Sx) // 2, 0)
            crop = img[yc: yc + Sy, xc: xc + Sx, :3]
            cam = camera_from_metadata(cam_md)
            cam = cam.copy()
            cam[2] -= xc                        # cx, cy into crop coords
            cam[3] -= yc
            batch_imgs.append(crop)
            batch_cams.append(cam)
            if len(batch_imgs) == B:
                flush()
        flush()

        vol = vol[:, :shape[0]]                  # crop the slab x-padding
        if log_mode:
            # exp + clip on device so the handoff cache and the NPZ
            # artifact hold bit-identical values (host np.exp can differ
            # from the XLA exp by an ulp)
            vol = jnp.minimum(jnp.exp(vol), 1.0)
        # settle the async pipeline HERE so per-task wall times attribute
        # honestly: the image uploads + CNN + accumulates above are all
        # async dispatches, and without this the first downstream
        # consumer (PointCloud's band count) inherits this task's entire
        # device+tunnel wait (the r4 report booked ~50 s of tunnel-bound
        # image transfer to 'PointCloud' that way)
        import jax
        jax.block_until_ready(vol)
        outfile = self.output_file()
        # downstream tasks (PointCloud, evaluation) get the volumes
        # device-resident; the NPZ pull + deflate rides the writer thread
        # under their compute (fsdb.handoff)
        from ..fsdb import handoff
        handoff.cache_put(outfile, {label: vol[i] for i, label in
                                    enumerate(labels)})
        io.write_npz_async(
            outfile,
            lambda: {label: arr for label, arr in
                     zip(labels, np.asarray(vol))})
        outfile.set_metadata({"voxel_size": vs, "origin": origin.tolist(),
                              "label_names": list(labels)})
        self.output().get().set_metadata("label_names", list(labels))
