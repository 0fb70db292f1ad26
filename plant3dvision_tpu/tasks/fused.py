"""FusedCarving: images -> carved volume in one pass.

The compatible task DAG (Masks -> Voxels) materializes 300 mask PNGs per
scan — two full codec round trips the reference also pays. This task fuses
mask computation into carving setup: images are decoded, filtered and
BIT-PACKED per-thread, so nothing but 1-bit masks ever exists, then the
per-view hierarchical carver runs. Output is Voxels-format (npz volume +
voxel_size/origin metadata), so PointCloud etc. consume it via
upstream_task = "FusedCarving".
"""

from __future__ import annotations

import numpy as np

from ..fsdb import io
from ..runtime.log import configure_logger
from ..runtime.task import Parameter, RomiTask

logger = configure_logger(__name__)


class FusedCarving(RomiTask):
    upstream_task = Parameter(default="ImagesFilesetExists")
    query = Parameter(default={})
    camera_metadata = Parameter(default="camera")
    voxel_size = Parameter(default=1.0)
    bounding_box = Parameter(default=None)
    # mask parameters (same semantics as the Masks task)
    type = Parameter(default="linear")
    parameters = Parameter(default=[0.0, 1.0, 0.0])
    threshold = Parameter(default=0.3)
    dilation = Parameter(default=0)
    invert = Parameter(default=False)

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

    #: carve engine: "fused" = single-program dense carve with tile
    #: row-gather fine level + dilated combined pyramids
    #: (parallel/carving_mp.py — the fastest measured engine, bit-exact
    #: vs the others; DEFAULT now that the persistent JAX compile cache
    #: makes its cold compile a one-time cost per geometry, and the
    #: auto overlap grouping below keeps per-program view counts <= ~100
    #: where the remote compile stays ~1-2 min), "pv" = per-view
    #: incidence pairs with host-sized caps (ops/carving_pv.py; several
    #: small programs — the low-cold-latency alternative on a fresh
    #: cache), "fp" = fused pair-compacted engine
    #: (parallel/carving_fp.py — bit-exact, but its one large program
    #: hits a remote-compile pathology on this TPU toolchain; opt-in),
    #: "sharded" = view-sharded hierarchical carve over ALL visible
    #: devices (parallel/carving_mp.carve_sharded_hierarchical — the
    #: multi-chip lane; bit-exact vs "fused")
    engine = Parameter(default="fused", significant=False)
    #: decode/upload chunk: image decode+threshold+pack of chunk i+1
    #: overlaps the (async) device_put of chunk i
    chunk_views = Parameter(default=32, significant=False)
    #: split the views into this many equal groups and carve group g on
    #: the device (in a worker thread) WHILE the host decodes group g+1.
    #: Carving is a pure per-view intersection (kill/seen sets OR over
    #: views), so the per-group label volumes merge exactly:
    #: -1 if any group killed, else 1 if any group saw, else 0 — the
    #: merged volume is bit-identical to the single-pass carve
    #: (tests/integration/test_fused.py). Groups are padded to equal
    #: view counts with valid=False rows so every group reuses ONE
    #: compiled program. 0 = auto (3 groups when the scan has >= 150
    #: views, where decode dominates; else single-pass — each distinct
    #: group size costs one program compile); 1 = off.
    overlap_groups = Parameter(default=0, significant=False)

    def _decode_group(self, items, ex, pad_to, state):
        """Decode+threshold+bit-pack `items`, async-upload in chunks.

        Returns (packed_dev (pad_to, HW/8) uint8, cams (pad_to, 16),
        valid (pad_to,) bool). Pad rows are zero masks with valid=False
        (every engine honors `valid`, ops/carving.py:65).
        """
        import jax
        import jax.numpy as jnp

        chunk = max(int(self.chunk_views), 1)
        parts, cams_l = [], []
        for i in range(0, len(items), chunk):
            batch = list(ex.map(state["load"], items[i:i + chunk]))
            parts.append(jax.device_put(np.stack([b[0] for b in batch])))
            cams_l += [b[1] for b in batch]
        n = len(items)
        if pad_to > n:
            pad = np.zeros((pad_to - n, parts[0].shape[1]), np.uint8)
            parts.append(jax.device_put(pad))
            cams_l += [cams_l[-1]] * (pad_to - n)
        packed_dev = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        cams = np.stack(cams_l)
        valid = np.arange(pad_to) < n
        return packed_dev, cams, valid

    def _carve_group(self, packed_dev, cams, valid, origin, vs, shape, hw):
        H, W = hw
        if str(self.engine) == "pv":
            from ..ops.carving_pv import PerViewCarver
            carver = PerViewCarver((len(cams), H, W), cams, valid,
                                   packed=packed_dev)
            return carver.carve(origin, vs, shape)
        if str(self.engine) == "fused":
            from ..parallel.carving_mp import carve_fused
            return carve_fused(None, cams, valid, origin, vs, shape,
                               packed=packed_dev, hw=(H, W))
        if str(self.engine) == "vb":
            # view-chunked engine (ops/carving_vb.py): per-view math
            # batched over a chunk axis, flat-take lookups — bit-exact
            # vs "fused" (tests/unit/test_carving_vb.py)
            from ..ops.carving_vb import carve_fused_vb
            return carve_fused_vb(None, cams, valid, origin, vs, shape,
                                  packed=packed_dev, hw=(H, W))
        if str(self.engine) == "sharded":
            # view-sharded hierarchical carve over ALL visible devices
            # (per-level pmax joins over ICI — the multi-chip lane,
            # SURVEY §2.4; bit-exact vs "fused", test_fused.py)
            import jax
            from jax.sharding import Mesh
            from ..parallel.carving_mp import carve_sharded_hierarchical
            mesh = Mesh(np.array(jax.devices()), ("dp",))
            return carve_sharded_hierarchical(
                None, cams, valid, origin, vs, shape, mesh,
                packed=packed_dev, hw=(H, W))
        from ..parallel.carving_fp import carve_fused_pairs
        return carve_fused_pairs(None, cams, valid, origin, vs, shape,
                                 packed=packed_dev, hw=(H, W))

    def run(self):
        from concurrent.futures import ThreadPoolExecutor

        from ..ops.carving import camera_from_metadata
        from ..ops.masks import compute_mask_numpy

        images_fs = self.input()[0].get(create=False) if isinstance(
            self.input(), (list, tuple)) else self.input().get(create=False)
        files = images_fs.get_files(query=self.query or None)
        cam_key = str(self.camera_metadata)

        coefs = self.parameters
        if isinstance(coefs, str):
            import json
            coefs = json.loads(coefs)

        selected = []
        for f in files:
            cam = f.get_metadata(cam_key)
            if cam is not None:
                selected.append((f, cam))
        if not selected:
            raise ValueError(f"No images with '{cam_key}' camera metadata")

        shape_hw = {}

        def _load_pack(item):
            f, cam = item
            img = io.read_image(f)
            m = compute_mask_numpy(
                img, filter_type=str(self.type),
                coefs=tuple(map(float, coefs)),
                threshold=float(self.threshold),
                dilation_radius=int(self.dilation), binarize=True,
                as_bool=True)
            if bool(self.invert):
                m = ~m
            shape_hw["hw"] = m.shape
            return np.packbits(m.reshape(-1)), camera_from_metadata(cam)

        bbox = self._resolve_bounding_box()
        vs = float(self.voxel_size)
        x_min, x_max = bbox["x"]; y_min, y_max = bbox["y"]; z_min, z_max = bbox["z"]
        shape = (int((x_max - x_min) / vs) + 1, int((y_max - y_min) / vs) + 1,
                 int((z_max - z_min) / vs) + 1)
        origin = np.array([x_min, y_min, z_min])  # float64 for metadata parity
        logger.info(f"FusedCarving: grid {shape} at {vs} mm")

        n = len(selected)
        groups = int(self.overlap_groups)
        if groups == 0:
            groups = 3 if n >= 150 else 1
        groups = min(max(groups, 1), n)
        gsize = -(-n // groups)
        groups = -(-n // gsize)   # drop groups the ceil split left empty
        #                           (e.g. 4 views / 3 groups -> 2+2)
        state = {"load": _load_pack}

        # chunked decode -> ASYNC device upload: device_put returns
        # immediately, so chunk i's host->device transfer rides under
        # chunk i+1's decode/threshold/pack (VERDICT r2 #4: ingest was
        # ~half of FusedCarving's wall time, fully serial). With
        # overlap_groups > 1 the CARVE of group g (dispatched into a
        # single worker thread; decode/device waits release the GIL)
        # also rides under group g+1's decode.
        import time as _time
        t_run0 = _time.perf_counter()

        def _timed_carve(g, *args):
            t0 = _time.perf_counter() - t_run0
            vol = self._carve_group(*args)
            logger.info(f"FusedCarving: group {g} carve "
                        f"{t0:.2f}s -> {_time.perf_counter() - t_run0:.2f}s")
            return vol

        # paused_gc: gen-2 collections otherwise stall the decode
        # threads (2-3x measured inside a full-pipeline process)
        from ..runtime.task import paused_gc
        vols = []
        with paused_gc(), ThreadPoolExecutor(max_workers=8) as ex, \
                ThreadPoolExecutor(max_workers=1) as carve_ex:
            futs = []
            for g in range(groups):
                items = selected[g * gsize:(g + 1) * gsize]
                t0 = _time.perf_counter() - t_run0
                packed_dev, cams, valid = self._decode_group(
                    items, ex, gsize if groups > 1 else len(items), state)
                logger.info(f"FusedCarving: group {g} decode "
                            f"{t0:.2f}s -> "
                            f"{_time.perf_counter() - t_run0:.2f}s")
                H, W = shape_hw["hw"]
                if g == 0:
                    logger.info(f"FusedCarving: {n} views at {W}x{H}"
                                + (f" in {groups} overlapped groups"
                                   if groups > 1 else ""))
                futs.append(carve_ex.submit(
                    _timed_carve, g, packed_dev, cams, valid,
                    origin, vs, shape, (H, W)))
            vols = [f.result() for f in futs]

        vol = vols[0]
        for v in vols[1:]:
            # -1 (killed) dominates, else 1 (seen) over 0 (unobserved)
            vol = np.where(np.minimum(vol, v) == -1,
                           np.int8(-1), np.maximum(vol, v))

        outfile = self.output_file()
        out_vol = vol.astype(np.int32)
        # PointCloud gets the volume in-memory; the NPZ deflate rides the
        # artifact-writer thread under the downstream tasks (fsdb.handoff)
        from ..fsdb import handoff
        handoff.cache_put(outfile, {"volume": out_vol})
        io.write_npz_async(outfile, lambda: {"volume": out_vol})
        outfile.set_metadata({"voxel_size": vs, "origin": origin.tolist()})
