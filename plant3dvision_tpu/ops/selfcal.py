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

from .carving import _project, carve_tolerant

#: theta layout (full-resolution pixels / degrees / millimetres)
THETA_NAMES = ("f", "dcx", "dcy", "dpan", "dtilt", "roll", "mx", "my", "mz")

#: default CEM search widths per parameter; frozen parameters get 0.
DEFAULT_STD = {"f": 0.25, "dcx": 20.0, "dcy": 20.0, "dpan": 3.0,
               "dtilt": 4.0, "roll": 1.5, "mx": 10.0, "my": 20.0, "mz": 15.0}

DEFAULT_FREE = ("f", "dpan", "dtilt", "roll", "mx", "my")


def cnc_to_cameras(poses, theta, width, height, scale=1.0, droll=None):
    """Packed (V, 16) cameras [fx,fy,cx,cy,R(9),t(3)] from CNC poses.

    poses: (V, 5) float [X, Y, Z, pan_deg, tilt_deg] — the plant imager's
    ``approximate_pose`` metadata. The convention (decoded from the
    reference's shipped real_plant fixture, tests/testdata/real_plant):
    the camera sits at (X, Y, Z) and looks along the world direction
    ``R_z(pan + 90 deg)·x̂``; tilt>0 looks up; world +z is up.

    theta: (9,) calibration vector, see THETA_NAMES. Mount offsets
    (mx, my, mz) displace the optical center along the camera's local
    right/down/forward axes. `scale` rescales intrinsics to a
    downsampled working resolution. `droll` (V,) adds per-view roll
    deltas on top of the global roll (gimbal wobble — the feature BA
    can free them, sfmlite layout [.., droll_view]). Fully
    jax-traceable (vmap over theta candidates, grad-capable).
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
    rho = jnp.broadcast_to(jnp.deg2rad(roll), phi.shape)
    if droll is not None:
        rho = rho + jnp.deg2rad(jnp.asarray(droll, jnp.float32))
    cr, sr = jnp.cos(rho)[:, None], jnp.sin(rho)[:, None]
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


def _alive_volume(cams, masks_flat, origin, voxel_size, shape, H, W,
                  tol_kills=0):
    """Dense vote carve -> bool hull volume (alive = seen by >=1 view,
    carved by at most `tol_kills`). Single source of truth for carve
    semantics: delegates to ops.carving.carve_tolerant (strict carve =
    tol 0, bitwise ops.carving.carve)."""
    masks = masks_flat.reshape(masks_flat.shape[0], H, W)
    valid = jnp.ones(masks.shape[0], bool)
    return carve_tolerant(masks, cams, valid, origin, voxel_size, shape,
                          tol_kills) == 1


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
    """Coherence score for a (B, 9) batch of candidates — one program.

    NOTE the score is silhouette-ray RECALL only. A background-ray
    precision term (hit rate of just-outside-the-silhouette rays
    against a kill-tolerant hull) was built and measured a NO-OP for
    the focal-length degeneracy seen on arabidopsis000: a global focal
    error is (to first order) a gauge transformation of the circular
    rig — the hull and the probe rays fatten together, so neither
    recall nor precision moves. f must come from the feature bundle
    adjustment (ops/sfmlite.iterative_refine multi-start), not from
    silhouettes.

    Candidates are evaluated in lax.map chunks, not one flat vmap: a
    vmapped carve materializes (B, V, n_voxels) intermediates, which at
    large-workspace fixtures (arabidopsis000: 2.5M voxels x 72 views x
    48 candidates at the fine CEM round) exceeds v5e HBM and crashes the
    TPU worker. The chunk size keeps the carve intermediate near the
    measured-safe ~3e8 voxel-view budget; per-candidate work is already
    big enough to saturate the chip, so the serialization is ~free."""
    V = poses.shape[0]
    n_vox = 1
    for s in shape:
        n_vox *= int(s)
    chunk = max(1, min(int(thetas.shape[0]), int(3e8) // max(1, V * n_vox)))

    def one(theta):
        cams = cnc_to_cameras(poses, theta, width, height, scale)
        alive = _alive_volume(cams, masks_flat, origin, voxel_size,
                              shape, Hl, Wl)
        _, mean = _ray_coverage(cams, alive, sil_uv, sil_valid, origin,
                                voxel_size, shape, n_steps)
        return mean

    return jax.lax.map(one, thetas, batch_size=chunk)


_SCORE_SUB = 8  # candidates per dispatched scoring program


def _score_many(thetas, args, shape, Hl, Wl, n_steps):
    """Score a candidate population in fixed-size program dispatches.

    One jit call over the whole population is one giant device program —
    B x V x n_vox mask gathers back to back. At the arabidopsis000
    fixture's workspace (48 candidates x 72 views x 2.5M voxels at the
    4 mm round ~= 8.7G gathers ~= 70 s on the ~124M/s gather unit) a
    single program of that length killed the TPU worker outright, with
    or without lax.map chunking — the chunking bounds memory, not
    program duration. Dispatching `_SCORE_SUB`-candidate programs keeps
    every program short, and padding the tail keeps it to exactly one
    compiled shape per round."""
    thetas = np.asarray(thetas, np.float32)
    B = len(thetas)
    out = np.empty(B, np.float32)
    for s in range(0, B, _SCORE_SUB):
        sub = thetas[s:s + _SCORE_SUB]
        n = len(sub)
        if n < _SCORE_SUB:
            sub = np.concatenate(
                [sub, np.repeat(sub[-1:], _SCORE_SUB - n, axis=0)])
        sc = np.asarray(_score_batch(jnp.asarray(sub), *args, shape=shape,
                                     Hl=Hl, Wl=Wl, n_steps=n_steps))
        out[s:s + n] = sc[:n]
    return out


@functools.partial(jax.jit, static_argnames=("shape", "Hl", "Wl", "n_steps"))
def _diagnose(theta, poses, masks_flat, sil_uv, sil_valid, origin,
              voxel_size, width, height, scale, shape, Hl, Wl, n_steps):
    """Per-view coverage + hull volume for one calibration (QC output)."""
    cams = cnc_to_cameras(poses, theta, width, height, scale)
    alive = _alive_volume(cams, masks_flat, origin, voxel_size, shape, Hl, Wl)
    per_view, mean = _ray_coverage(cams, alive, sil_uv, sil_valid, origin,
                                   voxel_size, shape, n_steps)
    return per_view, mean, alive


@functools.partial(jax.jit, static_argnames=("shape", "Hl", "Wl", "n_steps"))
def _diagnose_cams(cams_lo, masks_flat, sil_uv, sil_valid, origin,
                   voxel_size, shape, Hl, Wl, n_steps):
    alive = _alive_volume(cams_lo, masks_flat, origin, voxel_size,
                          shape, Hl, Wl)
    per_view, mean = _ray_coverage(cams_lo, alive, sil_uv, sil_valid,
                                   origin, voxel_size, shape, n_steps)
    return per_view, mean, alive


def coverage_for_cameras(masks, cams, bbox, *, downsample=4, voxel_mm=2.0,
                         n_sil=256, seed=0):
    """Silhouette-coherence diagnostics for EXPLICIT packed cameras
    (e.g. after per-view BA jitter, where no single theta exists).

    Returns (per_view_coverage (V,), mean_coverage, hull_bbox_or_None) —
    the per-view QC signal the TurntableCalibration task turns into
    `pose_estimation` metadata (role of reference tasks/colmap.py:792-808).
    """
    masks = np.asarray(masks) != 0
    V = masks.shape[0]
    rng = np.random.default_rng(seed)
    k = int(downsample)
    vs = float(voxel_mm)
    x0, x1 = bbox["x"]; y0, y1 = bbox["y"]; z0, z1 = bbox["z"]
    origin_np = np.array([x0, y0, z0], np.float32)
    masks_lo = _dilate1(_maxpool2d(masks, k))
    Hl, Wl = masks_lo.shape[1:]
    shape = (int((x1 - x0) / vs) + 1, int((y1 - y0) / vs) + 1,
             int((z1 - z0) / vs) + 1)
    steps = int(np.ceil(np.linalg.norm(shape) * 0.75))
    sil_uv, sil_valid = _sample_sil(_maxpool2d(masks, k), n_sil, rng)
    cams_lo = np.asarray(cams, np.float32).copy()
    cams_lo[:, :4] /= k
    per_view, mean, alive = _diagnose_cams(
        jnp.asarray(cams_lo), jnp.asarray(masks_lo.reshape(V, -1)),
        jnp.asarray(sil_uv), jnp.asarray(sil_valid),
        jnp.asarray(origin_np), jnp.float32(vs),
        shape=shape, Hl=Hl, Wl=Wl, n_steps=steps)
    alive_np = np.asarray(alive)
    idx = np.argwhere(alive_np)
    hull_bbox = None
    if len(idx):
        lo = origin_np + idx.min(axis=0) * vs
        hi = origin_np + (idx.max(axis=0) + 1) * vs
        margin = 0.05 * (hi - lo)
        lo, hi = lo - margin, hi + margin
        hull_bbox = {"x": [float(lo[0]), float(hi[0])],
                     "y": [float(lo[1]), float(hi[1])],
                     "z": [float(lo[2]), float(hi[2])]}
    return np.asarray(per_view), float(mean), hull_bbox


@functools.partial(jax.jit, static_argnames=("shape", "Hl", "Wl"))
def _robust_alive(cams, masks_flat, origin, voxel_size, shape, Hl, Wl,
                  tol_kills):
    """Vote-based hull (see _alive_volume; kill-tolerant for a few
    misaligned views — the AND-carve lets a single bad camera erase the
    plant)."""
    return _alive_volume(cams, masks_flat, origin, voxel_size, shape,
                         Hl, Wl, tol_kills)


@functools.partial(jax.jit, static_argnames=("shape", "n_steps"))
def _view_delta_coverage(pose_v, theta, jit_v, deltas, alive, sil_uv_v,
                         sil_valid_v, origin, voxel_size, width, height,
                         scale, shape, n_steps):
    """Coverage of ONE view's silhouette rays against a fixed hull, for a
    (G, 3) grid of (dpan, dtilt, droll) adjustments on top of the view's
    current jitter (jit_v = [dpan, dtilt, droll]). Returns (G,)
    coverages."""

    def one(delta):
        pose = pose_v[None, :].at[0, 3].add(jit_v[0] + delta[0])
        pose = pose.at[0, 4].add(jit_v[1] + delta[1])
        cams = cnc_to_cameras(pose, theta, width, height, scale,
                              droll=jit_v[2:3] + delta[2])
        _, mean = _ray_coverage(cams, alive, sil_uv_v[None], sil_valid_v[None],
                                origin, voxel_size, shape, n_steps)
        return mean

    return jax.vmap(one)(deltas)


def refine_views_to_hull(masks, poses, theta, jitter, bbox, *,
                         rounds=2, span=(1.5, 1.0), grid=(11, 7),
                         roll_span=0.0, roll_grid=5, shrink=1.0,
                         tol_kills=2, downsample=4, voxel_mm=2.0,
                         n_sil=256, seed=0):
    """Per-view silhouette polish: align every view's pan/tilt to the
    ROBUST visual hull (kill-tolerant vote carve), alternating hull
    re-carves. This optimizes exactly what space carving needs — that
    every view's silhouette is explained by the common hull — and mops
    up residual per-view gimbal jitter that feature BA leaves on
    texture-poor views. Returns (dpan_view, dtilt_view, droll_view,
    per_view_cov).

    `roll_span > 0` adds a per-view roll axis to the search grid
    (`roll_grid` samples) — the feature BA's roll estimate is noisy on
    texture-poor views and rides along unpolished otherwise.
    `shrink < 1` scales all spans by `shrink` each round around the
    running argmax, so the grid resolution improves with rounds instead
    of staying at span/grid (zoom-in search).

    No reference counterpart (the reference gets per-view poses from
    COLMAP, colmap.py:977-1008); the alternation follows silhouette-
    coherence practice (Hernandez et al., PAMI 2007, sec. V).
    """
    masks = np.asarray(masks) != 0
    V = masks.shape[0]
    poses = np.asarray(poses, np.float32)
    theta = jnp.asarray(theta, jnp.float32)
    dpan_v = np.array(jitter[0], np.float32) if jitter is not None \
        else np.zeros(V, np.float32)
    dtilt_v = np.array(jitter[1], np.float32) if jitter is not None \
        else np.zeros(V, np.float32)
    # per-view roll from the feature BA is kept fixed during the polish
    droll_v = (np.array(jitter[2], np.float32)
               if jitter is not None and len(jitter) > 2
               else np.zeros(V, np.float32))
    rng = np.random.default_rng(seed)

    k = int(downsample)
    vs = float(voxel_mm)
    x0, x1 = bbox["x"]; y0, y1 = bbox["y"]; z0, z1 = bbox["z"]
    origin_np = jnp.asarray([x0, y0, z0], jnp.float32)
    masks_lo = _dilate1(_maxpool2d(masks, k))
    Hl, Wl = masks_lo.shape[1:]
    masks_flat = jnp.asarray(masks_lo.reshape(V, -1))
    shape = (int((x1 - x0) / vs) + 1, int((y1 - y0) / vs) + 1,
             int((z1 - z0) / vs) + 1)
    steps = int(np.ceil(np.linalg.norm(shape) * 0.9))
    sil_uv, sil_valid = _sample_sil(_maxpool2d(masks, k), n_sil, rng)
    sil_uv = jnp.asarray(sil_uv)
    sil_valid = jnp.asarray(sil_valid)
    W_full = float(masks.shape[2])
    H_full = float(masks.shape[1])

    gp, gt = grid
    gr = int(roll_grid) if roll_span > 0.0 else 1
    spans = [float(span[0]), float(span[1]), float(roll_span)]

    def _deltas(sp, st, sr):
        dp = np.linspace(-sp, sp, gp, dtype=np.float32)
        dt = np.linspace(-st, st, gt, dtype=np.float32)
        dr = (np.linspace(-sr, sr, gr, dtype=np.float32)
              if gr > 1 else np.zeros(1, np.float32))
        return jnp.asarray(np.stack(
            np.meshgrid(dp, dt, dr, indexing="ij"),
            axis=-1).reshape(-1, 3))

    per_view = np.zeros(V, np.float32)
    for rnd in range(rounds):
        deltas = _deltas(*spans)
        poses_adj = poses.copy()
        poses_adj[:, 3] += dpan_v
        poses_adj[:, 4] += dtilt_v
        cams = cnc_to_cameras(jnp.asarray(poses_adj), theta,
                              W_full, H_full, 1.0 / k,
                              droll=jnp.asarray(droll_v))
        alive = _robust_alive(cams, masks_flat, origin_np, jnp.float32(vs),
                              shape, Hl, Wl, jnp.int16(tol_kills))
        for v in range(V):
            cov = np.asarray(_view_delta_coverage(
                jnp.asarray(poses[v]), theta,
                jnp.asarray([dpan_v[v], dtilt_v[v], droll_v[v]]), deltas,
                alive,
                sil_uv[v], sil_valid[v], origin_np, jnp.float32(vs),
                jnp.float32(W_full), jnp.float32(H_full),
                jnp.float32(1.0 / k), shape=shape, n_steps=steps))
            b = int(np.argmax(cov))
            d = np.asarray(deltas[b])
            dpan_v[v] += float(d[0])
            dtilt_v[v] += float(d[1])
            droll_v[v] += float(d[2])
            per_view[v] = float(cov[b])
        if shrink != 1.0:
            spans = [s * float(shrink) for s in spans]
    return dpan_v, dtilt_v, droll_v, per_view


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


def estimate_tilt_offset(masks, poses, bbox, f, height, z_frac=0.5):
    """Closed-form vertical-basin initializer for the CEM seeds.

    The CNC tilt can be off by tens of degrees of effective look-down
    (gimbal arms also raise the optical center above the CNC z). The
    dtilt that maps the MEAN silhouette-centroid row onto the working
    volume's center is elevation(bbox center) + atan((v_bar - cy)/f) for
    roll 0 (the image-offset term flips sign at roll 180, vanishes at
    +-90). Returns (elev_dtilt_deg, image_offset_deg) so the seed loop
    can combine them per roll quadrant. A wrong vertical basin makes the
    coherence landscape flat at zero, which no local search recovers
    from (observed on the reference's real_plant fixture: true
    look-down ~13 deg)."""
    masks = np.asarray(masks) != 0
    rows = []
    for m in masks:
        ys, _ = np.nonzero(m)
        if len(ys):
            rows.append(ys.mean())
    if not rows:
        import warnings
        warnings.warn("estimate_tilt_offset: all silhouettes are empty; "
                      "check the calibration mask type/threshold")
        return 0.0, 0.0
    v_bar = float(np.mean(rows))
    poses = np.asarray(poses, float)
    cx_w = 0.5 * (bbox["x"][0] + bbox["x"][1])
    cy_w = 0.5 * (bbox["y"][0] + bbox["y"][1])
    # `z_frac` picks the assumed plant elevation inside the working
    # volume (0.5 = center). Workspaces much taller than the plant (the
    # arabidopsis000 fixture's is z 10-1000 mm for a ~300 mm plant) put
    # the center far from the plant, so the seed loop sweeps a few
    # fractions to cover every vertical basin.
    cz_w = bbox["z"][0] + z_frac * (bbox["z"][1] - bbox["z"][0])
    d = float(np.mean(np.hypot(poses[:, 0] - cx_w, poses[:, 1] - cy_w)))
    elev = np.arctan2(cz_w - float(np.mean(poses[:, 2])), d)
    off = np.arctan((v_bar - height / 2.0) / f)
    return (float(np.degrees(elev) - np.mean(poses[:, 4])),
            float(np.degrees(off)))


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
    rounds : multi-resolution rounds; each halves `downsample`/`voxel_mm`,
        crops the scoring volume to the previous round's hull bbox, and
        restarts CEM around the previous optimum with tighter widths.

    Returns dict with theta (named + raw), coherence, history.
    """
    masks = np.asarray(masks) != 0
    V, H, W = masks.shape
    poses = np.asarray(poses, np.float32)
    rng = np.random.default_rng(seed)

    x0, x1 = bbox["x"]; y0, y1 = bbox["y"]; z0, z1 = bbox["z"]
    wx0, wx1, wy0, wy1, wz0, wz1 = x0, x1, y0, y1, z0, z1  # workspace

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
        origin_np = np.array([x0, y0, z0], np.float32)
        shape = (int((x1 - x0) / vs) + 1, int((y1 - y0) / vs) + 1,
                 int((z1 - z0) / vs) + 1)
        steps = n_steps or int(np.ceil(np.linalg.norm(shape) * 0.75))
        sil_uv, sil_valid = _sample_sil(_maxpool2d(masks, k), n_sil, rng)

        args = (jnp.asarray(poses), jnp.asarray(masks_lo.reshape(V, -1)),
                jnp.asarray(sil_uv), jnp.asarray(sil_valid),
                jnp.asarray(origin_np), jnp.float32(vs),
                jnp.float32(W), jnp.float32(H), jnp.float32(1.0 / k))

        if rnd == 0:
            # seed generation: roll quadrant x focal spread x plant
            # elevation (the roll ambiguity from the imager's
            # stored-image rotation is 4-way; the elevation sweep covers
            # workspaces much taller than the plant, where the
            # mask-centroid rule anchored at the volume CENTER lands in
            # the wrong vertical basin, which no local search recovers
            # from — observed on the arabidopsis000 fixture, z 10-1000 mm
            # for a ~300 mm plant)
            zspan = (z1 - z0) / max(1e-6, min(x1 - x0, y1 - y0))
            z_fracs = (0.2, 0.5, 0.8) if zspan > 1.2 else (0.5,)
            seeds = []
            for roll0 in (0.0, 90.0, 180.0, 270.0):
                for fs in (0.7, 1.0, 1.4):
                    for zf in z_fracs:
                        th = mean.copy()
                        th[0] = f_init * fs
                        elev_dt, img_off = estimate_tilt_offset(
                            masks, poses, bbox, th[0], H, z_frac=zf)
                        sign = {0.0: 1.0, 180.0: -1.0}.get(roll0, 0.0)
                        th[4] = elev_dt + sign * img_off
                        th[5] = roll0
                        seeds.append(th)
            scores = _score_many(np.stack(seeds), args,
                                 shape=shape, Hl=Hl, Wl=Wl, n_steps=steps)
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
            scores = _score_many(cand, args,
                                 shape=shape, Hl=Hl, Wl=Wl, n_steps=steps)
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

        if rnd < rounds - 1:
            # Coarse-to-fine in EXTENT, not just resolution: crop the
            # next round's scoring volume to this round's hull. On
            # workspaces much larger than the plant (arabidopsis000:
            # 400x400x990 mm for a ~300 mm plant) rescoring the full
            # workspace at the halved voxel size is 8x the work for
            # empty space. Crop from the KILL-TOLERANT hull, not the
            # strict one — the round's theta is still rough, and a few
            # misaligned views strict-carving away true plant would cut
            # it out of every later round's reach — plus a generous pad.
            cams_best = cnc_to_cameras(
                jnp.asarray(poses), jnp.asarray(best_theta),
                jnp.float32(W), jnp.float32(H), jnp.float32(1.0 / k))
            alive_tol = _robust_alive(
                cams_best, args[1], args[4], jnp.float32(vs),
                shape, Hl, Wl, jnp.int16(2))
            idx = np.argwhere(np.asarray(alive_tol))
            if len(idx):
                lo = origin_np + idx.min(axis=0) * vs
                hi = origin_np + (idx.max(axis=0) + 1) * vs
                pad = np.maximum(0.2 * (hi - lo), 8.0 * vs)
                lo = np.maximum(lo - pad, [wx0, wy0, wz0])
                hi = np.minimum(hi + pad, [wx1, wy1, wz1])
                # quantize the next round's grid shape to multiples of
                # 16 voxels per axis: the crop is data-dependent, and
                # every distinct shape is a fresh (remote, ~minutes)
                # compile of _score_batch — quantized shapes make the
                # persistent compile cache actually hit across runs
                vs_next = voxel_mm / (2 ** (rnd + 1))
                n = np.floor((hi - lo) / vs_next).astype(int) + 1
                n16 = np.ceil(n / 16).astype(int) * 16
                # extent lands mid-voxel so int((x1-x0)/vs)+1 == n16
                # regardless of float rounding direction
                span = (n16 - 0.5) * vs_next
                wlo = np.array([wx0, wy0, wz0])
                whi = np.array([wx1, wy1, wz1])
                fits = span <= (whi - wlo)
                hi = np.where(fits, lo + span, hi)
                over = np.maximum(hi - whi, 0.0)
                lo, hi = lo - over, hi - over    # shift, keep the shape
                # axes where the quantized span exceeds the workspace
                # fall back to the FULL workspace extent — that shape is
                # data-independent, hence already cache-stable
                lo = np.where(fits, lo, wlo)
                hi = np.where(fits, hi, whi)
                x0, y0, z0 = (float(v) for v in lo)
                x1, y1, z1 = (float(v) for v in hi)
                history.append({
                    "round": rnd, "stage": "hull-crop",
                    "bbox": [[x0, x1], [y0, y1], [z0, z1]]})

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

    # f pinned at a search bound flags the circular-motion focal gauge
    # (silhouette coherence barely moves along f, so the CEM can drift
    # to a bound) — callers should multi-start the feature BA's focal
    # (sfmlite.iterative_refine f_starts) instead of trusting this f.
    f_best = float(best_theta[0])
    f_at_bound = ("lo" if f_best <= f_bounds[0] * 1.02 else
                  "hi" if f_best >= f_bounds[1] * 0.98 else None)

    return {
        "theta": {n: float(best_theta[i]) for i, n in enumerate(THETA_NAMES)},
        "theta_raw": best_theta,
        "coherence": float(coh),
        "per_view_coverage": np.asarray(per_view).tolist(),
        "hull_bounding_box": hull_bbox,
        "f_at_bound": f_at_bound,
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
