"""Streaming (incremental) space carving — live preview during acquisition.

Beyond-reference capability: the ROMI plant imager acquires a turntable
scan over minutes (one image per CNC move), but the reference pipeline
(cl.py Backprojection.process_fileset) only carves once the scan is
complete. `StreamingCarver` accepts views AS THEY ARRIVE and can produce
an up-to-date carved volume at any point ("preview"), so the operator
sees the reconstruction forming during the scan and the final volume is
available the moment the last image lands.

TPU-first design — re-carve over padded view buckets, not per-view
kernel launches:

- Views accumulate device-resident (bit-packed rows uploaded as they
  arrive, riding under acquisition, which is seconds per view).
- A preview carves ALL views so far with the tuned fused hierarchical
  engine (parallel/carving_mp.carve_fused — the bench.py engine),
  padding the view axis to a power-of-two bucket with valid=False
  slots. Static bucket shapes mean ONE compile per bucket size (the
  jit cache / persistent .jax_cache covers them), not one per arrival
  count, and the final preview is by construction BIT-IDENTICAL to the
  batch carve of the full mask set (same program, same inputs).
- Carving is a pure per-view intersection, so a preview at view k is
  itself exact for the first k views — there is no approximation
  anywhere in the stream path.

Why not incremental intersection over small groups: with few views the
hierarchy barely prunes (most of the grid is still undecided), so
per-group fine-level work explodes; and a running device volume would
need both the seen and killed planes merged per group. Re-carving the
full (bucketed) stack keeps the engine in its tuned regime and costs
~linear-in-V per preview — at the 300-view north-star scale the final
preview is the same ~1.4 s carve the batch pipeline pays.

Reference role: cl.py:234-303 (process_fileset accumulates per-view
kernel launches); this module is its acquisition-time counterpart.
"""

from __future__ import annotations

import numpy as np

from ..runtime.log import configure_logger

logger = configure_logger(__name__)


def _bucket(n: int, lo: int) -> int:
    b = max(lo, 1)
    while b < n:
        b *= 2
    return b


class StreamingCarver:
    """Incremental carving session over a fixed voxel grid.

    Parameters mirror ops.carving.Backprojection (shape/origin/
    voxel_size); `hw` is the mask resolution (H, W), fixed for the
    scan. `bucket_min` is the smallest padded view count — previews
    compile one program per power-of-two bucket >= this.

    Usage::

        sc = StreamingCarver(shape, origin, voxel_size, hw=(1080, 1440))
        for img, cam in acquisition:          # as images arrive
            sc.add_view(mask_of(img), cam)
            vol = sc.preview()                # optional, any time
        alive = sc.preview()                  # final == batch carve
    """

    def __init__(self, shape, origin, voxel_size, hw, bucket_min=16,
                 caps=(8192, 32768)):
        self.shape = tuple(int(s) for s in shape)
        self.origin = np.asarray(origin, np.float32)
        self.voxel_size = float(voxel_size)
        self.hw = (int(hw[0]), int(hw[1]))
        self.bucket_min = int(bucket_min)
        self.caps = tuple(caps)
        self._rows = []      # device-resident packed mask rows (1, B) u8
        self._cams = []      # (16,) f32 camera vectors
        self._n_previews = 0

    @property
    def n_views(self) -> int:
        return len(self._rows)

    def add_view(self, mask, camera) -> None:
        """Register one view: `mask` is (H, W) bool/0-1 (plant=1), or an
        already bit-packed flat row (ceil(H*W/8),) uint8; `camera` is a
        reference camera-metadata dict (cl.py:293-296) or a packed (16,)
        vector. The packed row uploads to the device immediately
        (asynchronously) so preview/finalize never waits on transfers.
        """
        import jax

        from .carving import camera_from_metadata

        H, W = self.hw
        mask = np.asarray(mask)
        if mask.ndim == 2:
            if mask.shape != (H, W):
                raise ValueError(f"mask shape {mask.shape} != hw {(H, W)}")
            row = np.packbits(mask.reshape(-1) != 0)
        elif mask.ndim == 1 and mask.dtype == np.uint8:
            row = mask
        else:
            raise ValueError("mask must be (H, W) binary or packed uint8")
        cam = (camera_from_metadata(camera) if isinstance(camera, dict)
               else np.asarray(camera, np.float32))
        if cam.shape != (16,):
            raise ValueError(f"camera vector shape {cam.shape} != (16,)")
        self._rows.append(jax.device_put(row[None]))
        self._cams.append(cam)

    def preview(self, out: str = "alive"):
        """Carve every view received so far; returns the volume.

        out="alive": (shape) bool — alive voxels (seen and never
        killed), the PointCloud input plane. out="int8": the raw
        -1/0/1 volume (killed/unobserved/seen). The final preview is
        bit-identical to `carve_fused` over the full mask set.
        """
        import jax.numpy as jnp

        from ..parallel.carving_mp import carve_fused

        n = self.n_views
        if n == 0:
            raise ValueError("no views added yet")
        b = _bucket(n, self.bucket_min)
        packed = jnp.concatenate(self._rows, axis=0)
        if b > n:
            packed = jnp.concatenate(
                [packed, jnp.zeros((b - n, packed.shape[1]), jnp.uint8)])
        cams = np.stack(self._cams + [self._cams[-1]] * (b - n))
        valid = np.arange(b) < n
        self._n_previews += 1
        logger.debug(f"StreamingCarver: preview #{self._n_previews} at "
                     f"{n} views (bucket {b})")
        return carve_fused(None, cams, valid, self.origin,
                           self.voxel_size, self.shape, caps=self.caps,
                           packed=packed, hw=self.hw,
                           out="alive" if out == "alive" else "int8")
