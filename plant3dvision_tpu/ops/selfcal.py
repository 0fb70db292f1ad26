"""TPU-native turntable self-calibration — COLMAP-free camera recovery.

The reference recovers per-image cameras by running the external COLMAP
SfM binary (reference colmap.py:381-1269). For turntable acquisitions the
Plant Imager also records an approximate CNC pose per image
([X, Y, Z, pan, tilt], reference tasks/colmap.py:33-72), which pins the
camera ring geometry up to a handful of global unknowns: the focal
length, the CNC->optical-center mount offsets, and pan/tilt/roll zero
offsets. This module recovers those by maximizing SILHOUETTE COHERENCE
(Hernandez, Schmitt & Cipolla, "Silhouette Coherence for Camera
Calibration under Circular Motion", PAMI 2007): carve the visual hull
from all silhouettes, then measure how completely the hull re-projects
onto each silhouette. With correct cameras the hull explains (almost)
every silhouette pixel; any calibration error strictly shrinks the hull
and coverage drops.

TPU-first formulation (original design, no reference counterpart):

- one objective evaluation = one dense low-resolution space carve (this
  framework's cheapest primitive, ops/carving.py) plus a batched
  ray-march coverage test — a few million fused gathers;
- a whole CEM population is scored by a single vmapped jitted program,
  so the search runs entirely on device with zero per-candidate
  dispatch;
- every gather table is bool (u8 random gathers are ~1000x slower on
  v5e — see CLAUDE.md).

The recovered cameras are exported in the same ``colmap_camera``
metadata layout the Colmap task writes, so the rest of the pipeline runs
unchanged (tasks/colmap.py `TurntableCalibration`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .carving import _project

#: theta layout (full-resolution pixels / degrees / millimetres)
THETA_NAMES = ("f", "dcx", "dcy", "dpan", "dtilt", "roll", "mx", "my", "mz")

#: default CEM search widths per parameter; frozen parameters get 0.
DEFAULT_STD = {"f": 0.25, "dcx": 20.0, "dcy": 20.0, "dpan": 3.0,
               "dtilt": 1.5, "roll": 1.5, "mx": 10.0, "my": 10.0, "mz": 15.0}

DEFAULT_FREE = ("f", "dpan", "dtilt", "roll", "mx", "my")


def cnc_to_cameras(poses, theta, width, height, scale=1.0):
    """Packed (V, 16) cameras [fx,fy,cx,cy,R(9),t(3)] from CNC poses.

    poses: (V, 5) float [X, Y, Z, pan_deg, tilt_deg] — the plant imager's
    ``approximate_pose`` metadata. The convention (decoded from the
    reference's shipped real_plant fixture, tests/testdata/real_plant):
    the camera sits at (X, Y, Z) and looks along the world direction
    ``R_z(pan + 90 deg)·x̂``; tilt>0 looks up; world +z is up.

    theta: (9,) calibration vector, see THETA_NAMES. Mount offsets
    (mx, my, mz) displace the optical center along the camera's local
    right/down/forward axes. `scale` rescales intrinsics to a
    downsampled working resolution. Fully jax-traceable (vmap over theta
    candidates, grad-capable).
    """
    poses = jnp.asarray(poses, jnp.float32)
    f, dcx, dcy, dpan, dtilt, roll, mx, my, mz = (theta[i] for i in range(9))
    phi = jnp.deg2rad(poses[:, 3] + 90.0 + dpan)
    tau = jnp.deg2rad(poses[:, 4] + dtilt)
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    ctau, stau = jnp.cos(tau), jnp.sin(tau)
    zeros = jnp.zeros_like(phi)
    fwd = jnp.stack([cphi * ctau, sphi * ctau, stau], axis=1)
    right0 = jnp.stack([sphi, -cphi, zeros], axis=1)
    down0 = jnp.cross(fwd, right0)
    rho = jnp.deg2rad(roll)
    cr, sr = jnp.cos(rho), jnp.sin(rho)
    right = cr * right0 + sr * down0
    down = -sr * right0 + cr * down0
    C = poses[:, :3] + mx * right + my * down + mz * fwd
    R = jnp.stack([right, down, fwd], axis=1)          # (V, 3, 3), rows
    t = -jnp.einsum("vij,vj->vi", R, C)
    s = jnp.float32(scale)
    fx = jnp.broadcast_to(f * s, phi.shape)
    cx = jnp.broadcast_to((width / 2.0 + dcx) * s, phi.shape)
    cy = jnp.broadcast_to((height / 2.0 + dcy) * s, phi.shape)
    return jnp.concatenate(
        [jnp.stack([fx, fx, cx, cy], axis=1), R.reshape(-1, 9), t], axis=1)


def _alive_volume(cams, masks_flat, origin, voxel_size, shape, H, W):
    """Dense carve -> bool hull volume (alive = seen by >=1 view and
    killed by none; same semantics as ops.carving.carve)."""

    def body(carry, xs):
        killed, seen = carry
        mask_flat, cam = xs
        _, _, pxi, pyi, in_img = _project(cam, origin, voxel_size, shape, W, H)
        lin = jnp.clip(pyi, 0, H - 1) * W + jnp.clip(pxi, 0, W - 1)
        hit = jnp.take(mask_flat, lin.reshape(-1), axis=0).reshape(shape)
        killed = killed | (in_img & ~hit)
        seen = seen | (in_img & hit)
        return (killed, seen), None

    init = (jnp.zeros(shape, bool), jnp.zeros(shape, bool))
    (killed, seen), _ = jax.lax.scan(body, init, (masks_flat, cams))
    return seen & ~killed


def _ray_coverage(cams, alive, sil_uv, sil_valid, origin, voxel_size,
                  shape, n_steps):
    """Fraction of silhouette pixels whose viewing ray hits the hull.

    sil_uv: (V, N, 2) low-res pixel coords (u, v) of sampled silhouette
    pixels; sil_valid: (V, N) bool padding mask. Returns (per_view (V,),
    mean scalar)."""
    V = cams.shape[0]
    fx = cams[:, 0]; fy = cams[:, 1]; cx = cams[:, 2]; cy = cams[:, 3]
    R = cams[:, 4:13].reshape(V, 3, 3)
    t = cams[:, 13:16]
    C = -jnp.einsum("vji,vj->vi", R, t)                 # camera centers
    d_cam = jnp.stack([(sil_uv[..., 0] - cx[:, None]) / fx[:, None],
                       (sil_uv[..., 1] - cy[:, None]) / fy[:, None],
                       jnp.ones_like(sil_uv[..., 0])], axis=-1)  # (V,N,3)
    d = jnp.einsum("vji,vnj->vni", R, d_cam)            # world rays

    ext = voxel_size * jnp.asarray(shape, jnp.float32)
    bmin = origin[None, None, :]
    bmax = (origin + ext)[None, None, :]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    ta = (bmin - C[:, None, :]) * inv
    tb = (bmax - C[:, None, :]) * inv
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
    t0 = jnp.maximum(t0, 0.0)
    seg_ok = t1 > t0                                     # ray meets bbox

    steps = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) / n_steps
    ts = t0[..., None] + steps * (t1 - t0)[..., None]    # (V, N, S)
    pos = C[:, None, None, :] + ts[..., None] * d[:, :, None, :]
    idx = jnp.floor((pos - origin) / voxel_size).astype(jnp.int32)
    nx, ny, nz = shape
    inb = ((idx[..., 0] >= 0) & (idx[..., 0] < nx)
           & (idx[..., 1] >= 0) & (idx[..., 1] < ny)
           & (idx[..., 2] >= 0) & (idx[..., 2] < nz))
    lin = (jnp.clip(idx[..., 0], 0, nx - 1) * (ny * nz)
           + jnp.clip(idx[..., 1], 0, ny - 1) * nz
           + jnp.clip(idx[..., 2], 0, nz - 1))
    hit = jnp.take(alive.reshape(-1), lin.reshape(-1)).reshape(lin.shape)
    covered = jnp.any(hit & inb, axis=-1) & seg_ok       # (V, N)
    w = sil_valid.astype(jnp.float32)
    per_view = jnp.sum(covered * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = (jnp.sum(covered * w) / jnp.maximum(jnp.sum(w), 1.0))
    return per_view, mean


@functools.partial(jax.jit, static_argnames=("shape", "Hl", "Wl", "n_steps"))
def _score_batch(thetas, poses, masks_flat, sil_uv, sil_valid, origin,
                 voxel_size, width, height, scale, shape, Hl, Wl, n_steps):
    """Coherence score for a (B, 9) batch of candidates — one program."""

    def one(theta):
        cams = cnc_to_cameras(poses, theta, width, height, scale)
        alive = _alive_volume(cams, masks_flat, origin, voxel_size,
                              shape, Hl, Wl)
        _, mean = _ray_coverage(cams, alive, sil_uv, sil_valid, origin,
                                voxel_size, shape, n_steps)
        return mean

    return jax.vmap(one)(thetas)


@functools.partial(jax.jit, static_argnames=("shape", "Hl", "Wl", "n_steps"))
def _diagnose(theta, poses, masks_flat, sil_uv, sil_valid, origin,
              voxel_size, width, height, scale, shape, Hl, Wl, n_steps):
    """Per-view coverage + hull volume for one calibration (QC output)."""
    cams = cnc_to_cameras(poses, theta, width, height, scale)
    alive = _alive_volume(cams, masks_flat, origin, voxel_size, shape, Hl, Wl)
    per_view, mean = _ray_coverage(cams, alive, sil_uv, sil_valid, origin,
                                   voxel_size, shape, n_steps)
    return per_view, mean, alive


def _maxpool2d(m, k):
    V, H, W = m.shape
    Hp, Wp = -(-H // k) * k, -(-W // k) * k
    out = np.zeros((V, Hp, Wp), bool)
    out[:, :H, :W] = m
    return out.reshape(V, Hp // k, k, Wp // k, k).max(axis=(2, 4))


def _dilate1(m):
    out = m.copy()
    out[:, 1:] |= m[:, :-1]; out[:, :-1] |= m[:, 1:]
    out[:, :, 1:] |= m[:, :, :-1]; out[:, :, :-1] |= m[:, :, 1:]
    return out


def _sample_sil(masks_lo, n_sil, rng):
    """(V, N, 2) float low-res (u, v) silhouette samples + validity."""
    V = masks_lo.shape[0]
    uv = np.zeros((V, n_sil, 2), np.float32)
    valid = np.zeros((V, n_sil), bool)
    for v in range(V):
        ys, xs = np.nonzero(masks_lo[v])
        if len(ys) == 0:
            continue
        take = min(n_sil, len(ys))
        sel = rng.choice(len(ys), size=take, replace=False)
        uv[v, :take, 0] = xs[sel] + 0.5
        uv[v, :take, 1] = ys[sel] + 0.5
        valid[v, :take] = True
    return uv, valid


def calibrate_turntable(masks, poses, bbox, *, f_init=1400.0,
                        f_bounds=(400.0, 4000.0), free=DEFAULT_FREE,
                        downsample=8, voxel_mm=4.0, n_sil=192, n_steps=None,
                        pop=48, elites=8, iters=12, rounds=2, seed=0,
                        std_scale=1.0, progress=None):
    """Recover the global turntable calibration from binary silhouettes.

    Parameters
    ----------
    masks : (V, H, W) bool/uint8 full-resolution silhouettes.
    poses : (V, 5) CNC [X, Y, Z, pan_deg, tilt_deg] per image.
    bbox : {"x": [lo, hi], "y": ..., "z": ...} working volume (mm).
    free : names of theta components to optimize (rest stay 0 / f_init).
    rounds : multi-resolution rounds; each halves `downsample`/`voxel_mm`
        and restarts CEM around the previous optimum with tighter widths.

    Returns dict with theta (named + raw), coherence, history.
    """
    masks = np.asarray(masks) != 0
    V, H, W = masks.shape
    poses = np.asarray(poses, np.float32)
    rng = np.random.default_rng(seed)

    x0, x1 = bbox["x"]; y0, y1 = bbox["y"]; z0, z1 = bbox["z"]
    origin_np = np.array([x0, y0, z0], np.float32)

    mean = np.zeros(9, np.float32)
    mean[0] = f_init
    std = np.zeros(9, np.float32)
    for i, name in enumerate(THETA_NAMES):
        if name in free:
            base = DEFAULT_STD[name]
            std[i] = base * f_init if name == "f" else base
            std[i] *= std_scale
    free_mask = (std > 0).astype(np.float32)
    floor = np.maximum(std * 0.01, 1e-4)

    best_theta, best_score = mean.copy(), -1.0
    history = []

    for rnd in range(rounds):
        k = max(1, downsample >> rnd)
        vs = voxel_mm / (2 ** rnd)
        masks_lo = _dilate1(_maxpool2d(masks, k))
        Hl, Wl = masks_lo.shape[1:]
        shape = (int((x1 - x0) / vs) + 1, int((y1 - y0) / vs) + 1,
                 int((z1 - z0) / vs) + 1)
        steps = n_steps or int(np.ceil(np.linalg.norm(shape) * 0.75))
        sil_uv, sil_valid = _sample_sil(_maxpool2d(masks, k), n_sil, rng)

        args = (jnp.asarray(poses), jnp.asarray(masks_lo.reshape(V, -1)),
                jnp.asarray(sil_uv), jnp.asarray(sil_valid),
                jnp.asarray(origin_np), jnp.float32(vs),
                jnp.float32(W), jnp.float32(H), jnp.float32(1.0 / k))

        if rnd == 0:
            # seed generation: roll quadrant x focal spread (the roll
            # ambiguity from the imager's stored-image rotation is 4-way)
            seeds = []
            for roll0 in (0.0, 90.0, 180.0, 270.0):
                for fs in (0.7, 1.0, 1.4):
                    th = mean.copy()
                    th[0] = f_init * fs
                    th[5] = roll0
                    seeds.append(th)
            scores = np.asarray(_score_batch(
                jnp.asarray(np.stack(seeds)), *args,
                shape=shape, Hl=Hl, Wl=Wl, n_steps=steps))
            b = int(np.argmax(scores))
            mean = seeds[b].copy()
            # roll is now a local refinement around the winning quadrant
            history.append({"round": rnd, "stage": "roll-seed",
                            "score": float(scores[b]),
                            "roll": float(mean[5]), "f": float(mean[0])})

        for it in range(iters):
            cand = mean[None, :] + std[None, :] * rng.standard_normal(
                (pop, 9)).astype(np.float32)
            cand[0] = mean  # keep the incumbent
            cand[:, 0] = np.clip(cand[:, 0], *f_bounds)
            scores = np.asarray(_score_batch(
                jnp.asarray(cand), *args,
                shape=shape, Hl=Hl, Wl=Wl, n_steps=steps))
            order = np.argsort(scores)[::-1]
            elite = cand[order[:elites]]
            mean = elite.mean(axis=0)
            std = np.maximum(0.5 * std + 0.5 * elite.std(axis=0),
                             floor) * free_mask
            if scores[order[0]] > best_score:
                best_score = float(scores[order[0]])
                best_theta = cand[order[0]].copy()
            history.append({"round": rnd, "iter": it,
                            "best": float(scores[order[0]]),
                            "mean_f": float(mean[0])})
            if progress:
                progress(rnd, it, float(scores[order[0]]), mean)

        mean = best_theta.copy()
        # tighten for the next (finer) round
        std = np.maximum(std * 0.5, floor) * free_mask

        # final diagnostics at this round's resolution
        per_view, coh, alive = _diagnose(
            jnp.asarray(best_theta), *args,
            shape=shape, Hl=Hl, Wl=Wl, n_steps=steps)

    alive_np = np.asarray(alive)
    idx = np.argwhere(alive_np)
    hull_bbox = None
    if len(idx):
        lo = origin_np + idx.min(axis=0) * vs
        hi = origin_np + (idx.max(axis=0) + 1) * vs
        margin = 0.05 * (hi - lo)  # reference auto-bbox pads 5%
        lo, hi = lo - margin, hi + margin
        hull_bbox = {"x": [float(lo[0]), float(hi[0])],
                     "y": [float(lo[1]), float(hi[1])],
                     "z": [float(lo[2]), float(hi[2])]}

    return {
        "theta": {n: float(best_theta[i]) for i, n in enumerate(THETA_NAMES)},
        "theta_raw": best_theta,
        "coherence": float(coh),
        "per_view_coverage": np.asarray(per_view).tolist(),
        "hull_bounding_box": hull_bbox,
        "history": history,
    }


def theta_to_camera_metadata(theta, poses, width, height):
    """Per-image `colmap_camera`-layout metadata dicts from a calibration
    (same shape the Colmap task exports, reference colmap.py:305-372)."""
    cams = np.asarray(cnc_to_cameras(
        jnp.asarray(poses, jnp.float32), jnp.asarray(theta, jnp.float32),
        float(width), float(height)))
    out = []
    for v in range(cams.shape[0]):
        fx, fy, cx, cy = (float(c) for c in cams[v, :4])
        out.append({
            "camera_model": {
                "model": "OPENCV",
                "params": [fx, fy, cx, cy, 0.0, 0.0, 0.0, 0.0],
                "width": int(width), "height": int(height),
            },
            "rotmat": cams[v, 4:13].reshape(3, 3).tolist(),
            "tvec": cams[v, 13:16].tolist(),
        })
    return out
