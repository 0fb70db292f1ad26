"""Space carving (volume back-projection) on TPU.

Replaces the reference's OpenCL kernels + host loop (cl.py:118-310,
kernels/backprojection.c): one kernel launch per view over prod(shape) work
items becomes a SINGLE jitted XLA program that scans all views over the
HBM-resident grid — no host round-trips, no per-view launches.

Semantics matched to kernels/backprojection.c:
- carve: a voxel is killed if ANY view projects it in-frustum onto a zero
  mask pixel (nearest sampling, truncating int cast, z>0 test, border
  inclusive 0..W-1/0..H-1); it is 'seen' if any in-frustum view hits a
  nonzero pixel. Output int8: -1 killed / 1 seen / 0 never observed.
- average: accumulates the sampled mask value over in-frustum views
  (reference samples with OpenCL LINEAR at integer coords — a half-texel
  box filter; we sample true bilinear at the continuous projection, which
  is strictly more accurate).

The grid coordinates are never materialized: XLA fuses the three broadcast
iota axes into the projection arithmetic, so per view the work is ~10 fused
VPU ops + one gather over the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-9


def _project(view_params, origin, voxel_size, shape, W, H, x_off=0):
    """Per-view projected integer pixel coords + in-frustum mask.

    view_params: (16,) = [fx, fy, cx, cy, r00..r22, t0, t1, t2]
    Returns (pxi, pyi, in_img) with shapes == `shape`.

    `x_off` shifts the x iota by a GLOBAL index offset (grid-slab
    sharding): `origin + vs * (iota + off)` reproduces the dense
    engine's `origin + vs * i_global` bit-for-bit, which a pre-shifted
    slab origin (`(origin + off*vs) + vs*iota`) does not in f32.
    """
    nx, ny, nz = shape
    fx, fy, cx, cy = view_params[0], view_params[1], view_params[2], view_params[3]
    r = view_params[4:13]
    t = view_params[13:16]
    x = origin[0] + voxel_size * (
        jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        + jnp.float32(x_off))
    y = origin[1] + voxel_size * jax.lax.broadcasted_iota(jnp.float32, shape, 1)
    z = origin[2] + voxel_size * jax.lax.broadcasted_iota(jnp.float32, shape, 2)
    pz = r[6] * x + r[7] * y + r[8] * z + t[2]
    px = (r[0] * x + r[1] * y + r[2] * z + t[0]) / pz * fx + cx
    py = (r[3] * x + r[4] * y + r[5] * z + t[1]) / pz * fy + cy
    # truncating cast toward zero, as the OpenCL (int) cast does
    pxi = px.astype(jnp.int32)
    pyi = py.astype(jnp.int32)
    in_img = (pz > 0) & (pxi >= 0) & (pxi <= W - 1) & (pyi >= 0) & (pyi <= H - 1)
    return px, py, pxi, pyi, in_img


@functools.partial(jax.jit, static_argnames=("shape",))
def carve(masks, cameras, valid, origin, voxel_size, shape):
    """Carve a voxel grid from binary masks.

    Parameters
    ----------
    masks : (V, H, W) uint8/bool/float — nonzero = plant.
    cameras : (V, 16) float32 — [fx,fy,cx,cy, rotmat(9) row-major, tvec(3)].
    valid : (V,) bool — allows padded static view batches.
    origin : (3,) float32; voxel_size : float; shape : static (nx,ny,nz).

    Returns int8 volume: -1 killed / 1 seen / 0 unobserved.
    """
    V, H, W = masks.shape
    origin = jnp.asarray(origin, jnp.float32)
    voxel_size = jnp.float32(voxel_size)
    masks_flat = (masks.reshape(V, H * W) != 0)

    def body(carry, inputs):
        killed, seen = carry
        mask_flat, cam, ok = inputs
        _, _, pxi, pyi, in_img = _project(cam, origin, voxel_size, shape, W, H)
        lin = jnp.clip(pyi, 0, H - 1) * W + jnp.clip(pxi, 0, W - 1)
        hit = jnp.take(mask_flat, lin.reshape(-1), axis=0).reshape(shape)
        in_img = jnp.logical_and(in_img, ok)
        killed = killed | (in_img & ~hit)
        seen = seen | (in_img & hit)
        return (killed, seen), None

    killed0 = jnp.zeros(shape, dtype=bool)
    seen0 = jnp.zeros(shape, dtype=bool)
    (killed, seen), _ = jax.lax.scan(body, (killed0, seen0), (masks_flat, cameras, valid))
    return jnp.where(killed, jnp.int8(-1), jnp.where(seen, jnp.int8(1), jnp.int8(0)))


@functools.partial(jax.jit, static_argnames=("shape",))
def average(masks, cameras, valid, origin, voxel_size, shape, x_off=0):
    """Accumulate bilinearly sampled mask values over all in-frustum views.

    masks: (V, H, W) float32 (already log-transformed by the caller if the
    reference 'log' mode is on). Returns float32 volume.

    `x_off` shifts the x iota by a global voxel index (grid-slab
    chunking, see `average_chunked`); the slab computes the same
    expression as the corresponding rows of the full-grid program
    (matching to ~1 ulp — the traced offset can change XLA's FMA
    contraction, so not guaranteed bitwise).
    """
    V, H, W = masks.shape
    origin = jnp.asarray(origin, jnp.float32)
    voxel_size = jnp.float32(voxel_size)
    masks_flat = masks.reshape(V, H * W).astype(jnp.float32)

    def body(acc, inputs):
        mask_flat, cam, ok = inputs
        px, py, pxi, pyi, in_img = _project(cam, origin, voxel_size, shape, W, H,
                                            x_off=x_off)
        x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, H - 2)
        fx = jnp.clip(px - x0.astype(jnp.float32), 0.0, 1.0)
        fy = jnp.clip(py - y0.astype(jnp.float32), 0.0, 1.0)

        def g(yy, xx):
            return jnp.take(mask_flat, (yy * W + xx).reshape(-1), axis=0).reshape(shape)

        val = (g(y0, x0) * (1 - fx) * (1 - fy) + g(y0, x0 + 1) * fx * (1 - fy)
               + g(y0 + 1, x0) * (1 - fx) * fy + g(y0 + 1, x0 + 1) * fx * fy)
        in_img = jnp.logical_and(in_img, ok)
        return acc + jnp.where(in_img, val, 0.0), None

    acc0 = jnp.zeros(shape, dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (masks_flat, cameras, valid))
    return acc


def average_chunked(masks, cameras, valid, origin, voxel_size, shape,
                    max_slab_voxels=16 << 20):
    """Grid-slab `average` for volumes whose per-view temporaries would
    exceed device memory as one program (VERDICT r3 #2). The x axis is
    split into equal static slabs (<= max_slab_voxels voxels each, one
    compiled program for all slabs; the trailing slab is padded and
    cropped on host). Matches `average` row for row to ~1 ulp: the slab
    recomputes x = origin + vs*(iota + x_off) exactly and keeps the
    per-view accumulation order (only FMA contraction may differ)."""
    nx, ny, nz = (int(s) for s in shape)
    per_x = ny * nz
    sx = max(1, max(int(max_slab_voxels), per_x) // per_x)
    sx = min(sx, nx)
    n_slabs = -(-nx // sx)
    masks_j = jnp.asarray(masks)
    cams_j = jnp.asarray(cameras)
    valid_j = jnp.asarray(valid)
    out = np.empty((nx, ny, nz), np.float32)
    for i in range(n_slabs):
        xs = i * sx
        vol = average(masks_j, cams_j, valid_j, origin, voxel_size,
                      (sx, ny, nz), x_off=xs)
        take = min(sx, nx - xs)
        out[xs:xs + take] = np.asarray(vol)[:take]
    return out


#: averaging volumes above this many voxels go through the grid-slab
#: chunked paths (a 0.5 mm ML-route volume as ONE program killed the TPU
#: worker — ~15 grid-sized f32 temporaries live inside the view scan).
#: Override with P3D_AVG_CHUNK_VOXELS.
def _avg_chunk_voxels() -> int:
    import os
    return int(os.environ.get("P3D_AVG_CHUNK_VOXELS", str(24 << 20)))


@functools.partial(jax.jit, static_argnames=("shape",))
def carve_tolerant(masks, cameras, valid, origin, voxel_size, shape,
                   max_kills):
    """Vote-based carve: a voxel survives up to `max_kills` dissenting
    views (strict carve = max_kills 0, the kernel semantics).

    Rationale: the reference can afford the strict ANY-view kill because
    COLMAP poses are sub-pixel (colmap.py:977-1008); with CNC+self-
    calibrated poses (ops/selfcal.py, ops/sfmlite.py — a few px of
    residual per view) a single misaligned view would erase thin organs.
    The vote tolerance trades a slightly fatter hull for robustness —
    the same idea as the reference's VoxelsWithPrior likelihood ratios
    (tasks/proc3d.py:642-694) with a hard threshold.

    Returns int8: -1 killed / 1 alive-and-seen / 0 unobserved.
    """
    V, H, W = masks.shape
    origin = jnp.asarray(origin, jnp.float32)
    voxel_size = jnp.float32(voxel_size)
    masks_flat = (masks.reshape(V, H * W) != 0)

    def body(carry, inputs):
        kills, seen = carry
        mask_flat, cam, ok = inputs
        _, _, pxi, pyi, in_img = _project(cam, origin, voxel_size, shape, W, H)
        lin = jnp.clip(pyi, 0, H - 1) * W + jnp.clip(pxi, 0, W - 1)
        hit = jnp.take(mask_flat, lin.reshape(-1), axis=0).reshape(shape)
        in_img = jnp.logical_and(in_img, ok)
        kills = kills + (in_img & ~hit).astype(jnp.int16)
        seen = seen | (in_img & hit)
        return (kills, seen), None

    init = (jnp.zeros(shape, jnp.int16), jnp.zeros(shape, bool))
    (kills, seen), _ = jax.lax.scan(body, init, (masks_flat, cameras, valid))
    killed = kills > jnp.int16(max_kills)
    return jnp.where(killed, jnp.int8(-1),
                     jnp.where(seen, jnp.int8(1), jnp.int8(0)))


@functools.partial(jax.jit, static_argnames=("shape",))
def count_kills(masks, cameras, valid, origin, voxel_size, shape):
    """Per-voxel dissenting-view count + seen flag (the accumulator
    behind carve_tolerant, exposed so incremental callers — the
    Backprojection batched API — can merge counts ACROSS batches instead
    of OR-ing per-batch verdicts, which would mis-apply the tolerance
    per batch)."""
    V, H, W = masks.shape
    origin = jnp.asarray(origin, jnp.float32)
    voxel_size = jnp.float32(voxel_size)
    masks_flat = (masks.reshape(V, H * W) != 0)

    def body(carry, inputs):
        kills, seen = carry
        mask_flat, cam, ok = inputs
        _, _, pxi, pyi, in_img = _project(cam, origin, voxel_size, shape, W, H)
        lin = jnp.clip(pyi, 0, H - 1) * W + jnp.clip(pxi, 0, W - 1)
        hit = jnp.take(mask_flat, lin.reshape(-1), axis=0).reshape(shape)
        in_img = jnp.logical_and(in_img, ok)
        kills = kills + (in_img & ~hit).astype(jnp.int16)
        seen = seen | (in_img & hit)
        return (kills, seen), None

    init = (jnp.zeros(shape, jnp.int16), jnp.zeros(shape, bool))
    (kills, seen), _ = jax.lax.scan(body, init, (masks_flat, cameras, valid))
    return kills, seen


def pack_camera(intrinsics, rot, tvec) -> np.ndarray:
    """[fx,fy,cx,cy] + 3x3 rotmat + tvec -> (16,) float32 row."""
    out = np.zeros(16, dtype=np.float32)
    out[0:4] = np.asarray(intrinsics, dtype=np.float32)[:4]
    out[4:13] = np.asarray(rot, dtype=np.float32).reshape(9)
    out[13:16] = np.asarray(tvec, dtype=np.float32).reshape(3)
    return out


def camera_from_metadata(cam_md: dict) -> np.ndarray:
    """Reference per-image camera metadata (cl.py:293-296):
    {'camera_model': {'params': [fx,fy,cx,cy,...]}, 'rotmat': 3x3, 'tvec': 3}."""
    return pack_camera(cam_md["camera_model"]["params"][0:4],
                       cam_md["rotmat"], cam_md["tvec"])


class Backprojection:
    """API-compatible replacement for the reference's cl.Backprojection
    (cl.py:118): same constructor and process_fileset/process_view surface,
    but all views are carved in one fused TPU program.
    """

    def __init__(self, shape, origin, voxel_size, type="carving",
                 default_value=0, labels=None, log=False,
                 kill_tolerance=0, engine="auto"):
        self.shape = tuple(int(s) for s in shape)
        self.origin = np.asarray(origin, dtype=np.float32)
        self.voxel_size = float(voxel_size)
        self.type = type
        self.default_value = default_value
        self.labels = labels
        self.log = log
        self.kill_tolerance = int(kill_tolerance)
        #: "auto" = single-device engines (hier/pv carve, tiled/dense
        #: averaging); "sharded" = shard over ALL visible devices
        #: (view-sharded hierarchical carve / x-slab-sharded averaging,
        #: parallel/carving*.py) — the multi-chip Voxels lane, exercised
        #: by dryrun_multichip stage 9
        self.engine = str(engine)
        if type not in ("carving", "averaging"):
            raise ValueError(
                f"Unknown kernel type {type}, valid values are 'averaging' or 'carving'!")
        self.dtype = np.int32 if type == "carving" else np.float32
        self._pending_masks = []
        self._pending_cams = []
        self._values = None
        self._kills = None
        self._seen = None

    @staticmethod
    def _n_devices() -> int:
        import jax
        return len(jax.devices())

    @staticmethod
    def _flat_mesh():
        import jax
        from jax.sharding import Mesh
        return Mesh(np.array(jax.devices()), ("dp",))

    # -- incremental API (parity with reference process_view) ----------
    def process_view(self, intrinsics, rot, tvec, mask):
        # masks are stored raw; float/log conversion happens at flush time
        # (the hierarchical averaging path needs the raw binary values)
        self._pending_masks.append(np.asarray(mask))
        self._pending_cams.append(pack_camera(intrinsics, rot, tvec))

    def _flush(self):
        if not self._pending_masks:
            if self._values is None:
                self._values = np.full(self.shape, self.default_value, dtype=self.dtype)
            return
        masks = np.stack(self._pending_masks)
        cams = np.stack(self._pending_cams)
        valid = np.ones(len(masks), dtype=bool)
        if self.type == "carving":
            if (self.engine == "sharded" and self.kill_tolerance > 0
                    and self._n_devices() > 1):
                logger.warning(
                    "Backprojection: engine='sharded' has no "
                    "kill-tolerance lane — vote carving runs "
                    "single-device (count_kills)")
            if self.kill_tolerance > 0:
                # vote carve: accumulate per-voxel dissent COUNTS so the
                # tolerance applies across flush batches, not per batch
                kills, seen = count_kills(
                    jnp.asarray(masks), jnp.asarray(cams),
                    jnp.asarray(valid), self.origin, self.voxel_size,
                    self.shape)
                if self._kills is not None:
                    kills = kills + self._kills
                    seen = seen | self._seen
                self._kills, self._seen = kills, seen
                vol = np.where(
                    np.asarray(kills) > self.kill_tolerance, -1,
                    np.where(np.asarray(seen), 1, 0)).astype(np.int32)
                self._values = vol
                self._pending_masks = []
                self._pending_cams = []
                return
            elif self.engine == "sharded" and self._n_devices() > 1:
                # multi-chip lane: view-sharded hierarchical carve (one
                # SPMD program, per-level pmax joins over ICI) —
                # bit-identical to the single-chip engines
                from ..parallel.carving_mp import carve_sharded_hierarchical
                vol = carve_sharded_hierarchical(
                    masks, cams, valid, self.origin, self.voxel_size,
                    self.shape, self._flat_mesh())
            else:
                # hierarchical carve: bit-identical, ~6x fewer gathers;
                # the per-view-compacted variant wins once straddle sets
                # are much smaller than the view count (large scans)
                if len(masks) > 100:
                    from .carving_pv import carve_perview as _carve_h
                else:
                    from .carving_hier import carve_hierarchical as _carve_h
                vol = _carve_h(masks, cams, valid, self.origin,
                               self.voxel_size, self.shape)
            vol = np.asarray(vol).astype(np.int32)
            if self._values is not None:
                prev = self._values
                killed = (prev == -1) | (vol == -1)
                seen = (prev == 1) | (vol == 1)
                vol = np.where(killed, -1, np.where(seen, 1, 0)).astype(np.int32)
        else:
            vol = None
            if self.engine == "sharded" and self._n_devices() > 1:
                # multi-chip lane: x-slab-sharded averaging (grid split
                # over the mesh, no volume collective); pad x to the
                # device count and crop — slabs index voxels globally so
                # padding is inert (parallel/carving.average_grid_sharded)
                import jax
                from ..parallel.carving import average_grid_sharded
                fmasks = masks.astype(np.float32)
                if masks.dtype == np.uint8:
                    fmasks = fmasks / 255.0
                if self.log:
                    fmasks = np.log(EPS + fmasks)
                n = self._n_devices()
                nx, ny, nz = self.shape
                nxp = -(-nx // n) * n
                mesh = self._flat_mesh()
                with mesh:
                    vol = np.asarray(average_grid_sharded(
                        fmasks, cams, valid, self.origin, self.voxel_size,
                        (nxp, ny, nz), mesh))[:nx]
            # two-valued masks (the Segmentation2D binarize default and
            # every color-filter Masks output): tile row-gather averaging
            # — ONE 32x32-px bit-tile fetch per (4^3-voxel cell, view)
            # serves all four bilinear taps of all 64 voxels, vs 4 flat
            # gathers per (voxel, view) in the dense scan (random gathers
            # are the v5e bottleneck; ops/averaging_tiled.py)
            # grids above the chunk budget are slabbed along x so no
            # single program's temporaries scale with the full volume
            # (reference degrades with a memory warning, never a crash —
            # cl.py:154-158; VERDICT r3 #2)
            chunked = int(np.prod(self.shape)) > _avg_chunk_voxels()
            nz = np.empty(0) if vol is not None else np.unique(masks)
            nz = nz[nz != 0]
            if vol is None and len(nz) <= 1:
                from .averaging_tiled import (average_tiled,
                                              average_tiled_chunked)
                # the single nonzero value, after the same normalization
                # the dense path applies below
                hi = float(nz[0]) if len(nz) else 0.0
                if masks.dtype == np.uint8:
                    hi /= 255.0
                v0, v1 = ((float(np.log(EPS)), float(np.log(EPS + hi)))
                          if self.log else (0.0, hi))
                if chunked:
                    tvol, over = average_tiled_chunked(
                        masks, cams, valid, self.origin, self.voxel_size,
                        self.shape, v0=v0, v1=v1)
                else:
                    tvol, over = average_tiled(masks, cams, valid,
                                               self.origin,
                                               self.voxel_size, self.shape,
                                               v0=v0, v1=v1)
                if over == 0:
                    vol = np.asarray(tvol)
                # overflow: cameras project 4-voxel cells wider than the
                # 24-px tile window — fall through to the dense scan
            if vol is None:
                # dense averaging fallback (also the non-binary path; the
                # hierarchical variant ops.averaging_hier has no early
                # pruning on thin plants and loses to this — measured v5e)
                fmasks = masks.astype(np.float32)
                if masks.dtype == np.uint8:
                    fmasks = fmasks / 255.0
                if self.log:
                    fmasks = np.log(EPS + fmasks)
                if chunked:
                    vol = average_chunked(fmasks, cams, valid, self.origin,
                                          self.voxel_size, self.shape)
                else:
                    vol = np.asarray(average(fmasks, cams, valid,
                                             self.origin,
                                             self.voxel_size, self.shape))
            if self._values is not None:
                vol = self._values + vol
        self._values = vol
        self._pending_masks = []
        self._pending_cams = []

    def get_values(self):
        self._flush()
        return self._values.reshape(self.shape)

    def clear(self):
        self._pending_masks = []
        self._pending_cams = []
        self._values = None
        self._kills = None
        self._seen = None

    # -- fileset API ----------------------------------------------------
    def process_fileset(self, fs, camera_metadata, invert=False):
        files = fs.get_files() if hasattr(fs, "get_files") else list(fs)
        if self.labels is not None:
            # f32: the carve/average programs produce f32 anyway; f64
            # doubles the host footprint of production label stacks
            # (6 labels x 0.5 mm real grid = 2.4 GB in f64)
            result = np.zeros((len(self.labels), *self.shape), dtype=np.float32)
            for i, label in enumerate(self.labels):
                self.clear()
                result[i] = self.process_label(files, camera_metadata, label, invert)
            return result
        return self.process_label(files, camera_metadata, None, invert=invert)

    def process_label(self, files, camera_metadata, label=None, invert=False):
        from concurrent.futures import ThreadPoolExecutor
        from ..fsdb import io

        selected = []
        for fi in files:
            if label is not None and fi.get_metadata("channel") != label:
                continue
            cam = fi.get_metadata(camera_metadata, default=None)
            if cam is None:
                continue
            selected.append((fi, cam))

        def _load(item):
            fi, cam = item
            mask = io.read_image(fi)
            if invert:
                mask = np.invert(mask)
            return camera_from_metadata(cam), mask

        # PNG decode dominates mask ingestion: load in parallel
        with ThreadPoolExecutor(max_workers=8) as ex:
            for c, mask in ex.map(_load, selected):
                self.process_view(c[0:4], c[4:13], c[13:16], mask)
        return self.get_values()
