"""Turntable bundle adjustment ("SfM-lite") — the feature-based half of
the COLMAP-free calibration path.

The silhouette-coherence stage (ops/selfcal.py) pins the turntable pose
parameters to a few pixels, but (a) the focal length is only weakly
identified by silhouettes (the classic focal-vs-object-scale gauge of
circular motion) and (b) space carving of millimetre-thin pedicels needs
sub-pixel poses — the accuracy the reference gets from COLMAP's bundle
adjustment (reference colmap.py:977-1008). This module recovers both
from image features, exploiting the turntable structure: camera CENTERS
are known from the CNC (up to the mount offset), so only a ~10-global +
2-per-view parameter calibration is adjusted, not a full 6-DoF SfM.

Everything is TPU-shaped:
- Harris corners: batched convolutions over the whole image stack;
- descriptors: normalized patches; matching: one (K, K) matmul per view
  pair on the MXU, mutual-best + ratio test;
- bundle adjustment: rays from fixed centers -> closed-form midpoint
  triangulation -> reprojection residuals; Gauss-Newton with Huber IRLS,
  the normal equations are a tiny (~130 x 130) dense solve. The whole GN
  step is one jitted program differentiated with jax.jacfwd.

No counterpart exists in the reference (it shells out to COLMAP); cited
behaviors: pose export format colmap.py:305-372, pose QC
tasks/colmap.py:773-834.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .selfcal import cnc_to_cameras

# ----------------------------------------------------------------------
# keypoints
# ----------------------------------------------------------------------


def _box3(x):
    """3x3 box filter, batched (V, H, W)."""
    out = x
    out = out + jnp.roll(x, 1, axis=-1) + jnp.roll(x, -1, axis=-1)
    out = out + jnp.roll(out, 1, axis=-2) + jnp.roll(out, -1, axis=-2)
    return out / 9.0


@functools.partial(jax.jit, static_argnames=("k", "border", "bands"))
def harris_keypoints(gray, mask, k: int = 512, border: int = 16,
                     kappa: float = 0.06, bands: int = 6):
    """Top-k Harris corners per view, restricted to `mask`.

    gray: (V, H, W) float32; mask: (V, H, W) bool. Returns (uv (V, k, 2)
    float [x, y], score (V, k)); invalid slots have score <= 0.

    Selection is STRATIFIED over `bands` horizontal image bands (top-k/bands
    per band): plants are texture-rich at the rosette and nearly bare along
    the stem — a global top-k would cluster there and leave the bundle
    adjustment without vertical leverage (tilt/height degeneracy).
    """
    V, H, W = gray.shape
    ix = (jnp.roll(gray, -1, axis=-1) - jnp.roll(gray, 1, axis=-1)) * 0.5
    iy = (jnp.roll(gray, -1, axis=-2) - jnp.roll(gray, 1, axis=-2)) * 0.5
    sxx = _box3(ix * ix)
    syy = _box3(iy * iy)
    sxy = _box3(ix * iy)
    r = sxx * syy - sxy * sxy - kappa * (sxx + syy) ** 2

    # 3x3 non-maximum suppression
    rmax = r
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            rmax = jnp.maximum(rmax, jnp.roll(r, (dy, dx), axis=(-2, -1)))
    yidx = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    xidx = jax.lax.broadcasted_iota(jnp.int32, r.shape, 2)
    ok = ((r >= rmax) & mask
          & (yidx >= border) & (yidx < H - border)
          & (xidx >= border) & (xidx < W - border))
    r = jnp.where(ok, r, -jnp.inf)

    bands = max(1, min(bands, k))
    kb = k // bands
    Hb = -(-H // bands)
    rp = jnp.pad(r, ((0, 0), (0, bands * Hb - H), (0, 0)),
                 constant_values=-jnp.inf)
    rb = rp.reshape(V, bands, Hb * W)
    score_b, lin_b = jax.lax.top_k(rb, kb)              # (V, bands, kb)
    lin = (lin_b + (jnp.arange(bands) * Hb * W)[None, :, None]
           ).reshape(V, bands * kb)
    score = score_b.reshape(V, bands * kb)
    if bands * kb < k:                                   # pad to k slots
        pad = k - bands * kb
        lin = jnp.pad(lin, ((0, 0), (0, pad)))
        score = jnp.pad(score, ((0, 0), (0, pad)),
                        constant_values=-jnp.inf)
    uv = jnp.stack([(lin % W).astype(jnp.float32),
                    (lin // W).astype(jnp.float32)], axis=-1)
    return uv, jnp.where(jnp.isfinite(score), score, 0.0)


@functools.partial(jax.jit, static_argnames=("size",))
def patch_descriptors(gray, uv, size: int = 16):
    """Normalized (size x size -> 8x8-pooled) patch descriptors.

    gray: (V, H, W); uv: (V, K, 2). Returns (V, K, 64) unit-norm f32 —
    NCC matching becomes a plain matmul.
    """
    V, H, W = gray.shape
    half = size // 2

    def per_view(g, uvv):
        def per_kp(c):
            x0 = jnp.clip(c[0].astype(jnp.int32) - half, 0, W - size)
            y0 = jnp.clip(c[1].astype(jnp.int32) - half, 0, H - size)
            return jax.lax.dynamic_slice(g, (y0, x0), (size, size))
        return jax.vmap(per_kp)(uvv)

    patches = jax.vmap(per_view)(gray, uv)                 # (V, K, s, s)
    p = size // 8
    pooled = patches.reshape(*patches.shape[:2], 8, p, 8, p).mean(axis=(3, 5))
    d = pooled.reshape(*pooled.shape[:2], 64)
    d = d - d.mean(axis=-1, keepdims=True)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)


@jax.jit
def match_mutual(desc_a, desc_b, score_a, score_b, ratio: float = 0.95):
    """Mutual-best NCC matching with a Lowe-style ratio test.

    desc_*: (K, 64) unit descriptors. Returns (idx_b (K,), valid (K,)):
    for each keypoint of a, its match in b.
    """
    sim = desc_a @ desc_b.T                               # MXU
    alive = (score_a[:, None] > 0) & (score_b[None, :] > 0)
    sim = jnp.where(alive, sim, -2.0)
    best_ab = jnp.argmax(sim, axis=1)
    top2 = jax.lax.top_k(sim, 2)[0]
    ratio_ok = top2[:, 0] * ratio > top2[:, 1]
    best_ba = jnp.argmax(sim, axis=0)
    mutual = best_ba[best_ab] == jnp.arange(sim.shape[0])
    valid = mutual & ratio_ok & (top2[:, 0] > 0.5)
    return best_ab, valid


# ----------------------------------------------------------------------
# bundle adjustment
# ----------------------------------------------------------------------


#: BA parameter vector layout:
#: [theta(9), k1, dpan_view(V), dtilt_view(V), droll_view(V)]
K1_IDX = 9
N_GLOBAL = 10
N_JITTER = 3      # per-view delta groups (dpan, dtilt, droll)


def _cameras_from_params(p, poses, width, height):
    """Global theta (9) + k1 + per-view (dpan_v, dtilt_v, droll_v) ->
    packed (V, 16) cameras (k1 is applied separately in the projection).

    Per-view pan/tilt deltas ride on the pose table columns and the roll
    deltas go through cnc_to_cameras' droll argument, so cnc_to_cameras
    stays the single extrinsic model.
    """
    V = poses.shape[0]
    theta = p[:9]
    dpan_v = p[N_GLOBAL:N_GLOBAL + V]
    dtilt_v = p[N_GLOBAL + V:N_GLOBAL + 2 * V]
    droll_v = p[N_GLOBAL + 2 * V:N_GLOBAL + 3 * V]
    poses_adj = poses.at[:, 3].add(dpan_v).at[:, 4].add(dtilt_v)
    return cnc_to_cameras(poses_adj, theta, width, height, droll=droll_v)


def _project_points(cams, X, k1=0.0):
    """cams (M, 16) x points (M, 3) -> pixel (M, 2), with SIMPLE_RADIAL
    distortion x_d = x (1 + k1 r^2) (COLMAP model the reference fits for
    this camera class, camera.py:14-138)."""
    R = cams[:, 4:13].reshape(-1, 3, 3)
    t = cams[:, 13:16]
    q = jnp.einsum("mij,mj->mi", R, X) + t
    z = jnp.maximum(q[:, 2], 1e-6)
    x = q[:, 0] / z
    y = q[:, 1] / z
    d = 1.0 + k1 * (x * x + y * y)
    return jnp.stack([x * d * cams[:, 0] + cams[:, 2],
                      y * d * cams[:, 1] + cams[:, 3]], axis=1)


def _rays(cams, uv, k1=0.0):
    """(C, d̂) world rays through pixels uv for packed cams rows.

    Pixels are UNdistorted first (two fixed-point iterations of the
    SIMPLE_RADIAL inverse — ample for |k1| r^2 << 1)."""
    R = cams[:, 4:13].reshape(-1, 3, 3)
    t = cams[:, 13:16]
    C = -jnp.einsum("mji,mj->mi", R, t)
    xd = (uv[:, 0] - cams[:, 2]) / cams[:, 0]
    yd = (uv[:, 1] - cams[:, 3]) / cams[:, 1]
    x, y = xd, yd
    for _ in range(2):
        s = 1.0 + k1 * (x * x + y * y)
        x, y = xd / s, yd / s
    d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=1)
    d = jnp.einsum("mji,mj->mi", R, d_cam)
    return C, d / jnp.linalg.norm(d, axis=1, keepdims=True)


def _residuals(p, poses, va, vb, ua, ub, width, height):
    """Pairwise reprojection residuals (M, 4) via midpoint triangulation.

    Used only for the cheap geometric PRE-GATE of raw matches — the BA
    itself uses multi-view tracks (_track_residuals): pairwise
    triangulation is self-consistent under a focal/tilt/height gauge
    family, so it cannot anchor the global calibration alone.
    """
    cams = _cameras_from_params(p, poses, width, height)
    k1 = p[K1_IDX]
    ca, cb = cams[va], cams[vb]
    Ca, da = _rays(ca, ua, k1)
    Cb, db = _rays(cb, ub, k1)
    w = Cb - Ca
    ab = jnp.sum(da * db, axis=1)
    wa = jnp.sum(w * da, axis=1)
    wb = jnp.sum(w * db, axis=1)
    den = 1.0 - ab * ab
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    s = (wa - wb * ab) / den
    t = (wa * ab - wb) / den
    X = 0.5 * (Ca + s[:, None] * da + Cb + t[:, None] * db)
    ra = _project_points(ca, X, k1) - ua
    rb = _project_points(cb, X, k1) - ub
    return jnp.concatenate([ra, rb], axis=1)


def build_tracks(va, vb, ka, kb, n_views, k):
    """Union-find pairwise keypoint matches into multi-view tracks.

    Nodes are (view, keypoint-slot); every match joins two nodes. Tracks
    touching the same view twice (merge conflicts) are dropped. Returns
    (obs_track (M,), obs_node (M,)) — observation lists for every track
    with >= 2 observations, ordered by track id.
    """
    parent = np.arange(n_views * k, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    na = va.astype(np.int64) * k + ka
    nb = vb.astype(np.int64) * k + kb
    for x, y in zip(na, nb):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[rx] = ry

    nodes = np.unique(np.concatenate([na, nb]))
    roots = np.array([find(x) for x in nodes])
    order = np.argsort(roots, kind="stable")
    nodes, roots = nodes[order], roots[order]
    _, track_of, counts = np.unique(roots, return_inverse=True,
                                    return_counts=True)

    # drop tracks that observe one view twice (ambiguous merges)
    views = nodes // k
    ok_track = np.ones(len(counts), bool)
    seen = {}
    for n, t, v in zip(nodes, track_of, views):
        if (t, v) in seen:
            ok_track[t] = False
        seen[(t, v)] = True
    keep = ok_track[track_of] & (counts[track_of] >= 2)
    nodes, track_of = nodes[keep], track_of[keep]
    _, track_of = np.unique(track_of, return_inverse=True)  # re-densify
    return track_of.astype(np.int32), nodes


def _track_residuals(p, poses, obs_track, obs_view, obs_uv, width, height,
                     n_tracks: int):
    """Reprojection residuals (M_obs, 2) with multi-view track structure.

    Each track's 3D point is the closed-form least-squares intersection
    of ALL its observation rays (min sum of squared ray distances:
    X = [sum(I - dd^T)]^-1 [sum (I - dd^T) C]), then reprojected into
    every observing view. Because the same point must agree across the
    whole arc of views, the focal/tilt/height gauge of pairwise
    triangulation is broken. Fully differentiable in p.
    """
    cams = _cameras_from_params(p, poses, width, height)
    k1 = p[K1_IDX]
    co = cams[obs_view]
    C, d = _rays(co, obs_uv, k1)
    eye = jnp.eye(3, dtype=jnp.float32)
    P = eye[None] - d[:, :, None] * d[:, None, :]        # (M, 3, 3)
    Pb = jnp.einsum("mij,mj->mi", P, C)
    A = jax.ops.segment_sum(P, obs_track, n_tracks)
    b = jax.ops.segment_sum(Pb, obs_track, n_tracks)
    A = A + 1e-6 * eye[None]
    X = jnp.linalg.solve(A, b[..., None])[..., 0]        # (T, 3)
    return _project_points(co, X[obs_track], k1) - obs_uv


@functools.partial(jax.jit, static_argnames=("n_free", "n_tracks"))
def _gn_step(p, p_prior, poses, obs_track, obs_view, obs_uv, w_obs,
             width, height, free_idx, reg, lam, n_free: int, n_tracks: int):
    """One Huber-IRLS Levenberg-Marquardt step on the free parameters.

    Diagonal (Marquardt) scaling handles the wildly mixed parameter
    units (pixels / degrees / millimetres) without hand-tuned scales.
    `reg` is a TIKHONOV PRIOR weight toward `p_prior` (not mere step
    damping): along data-flat valleys (e.g. focal/height/tilt families
    on feature sets with little vertical spread) it keeps physically
    absurd solutions — metre-scale mount offsets — out of reach."""

    def r_free(pf):
        return _track_residuals(p.at[free_idx].set(pf), poses, obs_track,
                                obs_view, obs_uv, width, height, n_tracks)

    pf = p[free_idx]
    r = r_free(pf)                                       # (M, 2)
    err = jnp.linalg.norm(r, axis=1)
    delta = 2.0                                          # Huber width (px)
    hub = jnp.where(err <= delta, 1.0, delta / jnp.maximum(err, 1e-9))
    wgt = (hub * w_obs)[:, None]

    J = jax.jacfwd(r_free)(pf)                           # (M, 2, n_free)
    Jw = (J * wgt[..., None]).reshape(-1, n_free)
    JTJ = Jw.T @ J.reshape(-1, n_free)
    # IRLS normal equations: J^T W J dp = -J^T W r (Jw already carries
    # one factor of W — multiplying r by wgt again would solve a
    # W^2-weighted system and bias the stationary point)
    JTr = Jw.T @ r.reshape(-1)
    JTJ = JTJ + jnp.diag(reg)
    JTr = JTr + reg * (pf - p_prior[free_idx])
    diag = jnp.maximum(jnp.diag(JTJ), 1e-8)
    A = JTJ + jnp.diag(lam * diag)
    dp = jnp.linalg.solve(A, -JTr)
    rms = jnp.sqrt(jnp.sum((r * wgt) ** 2) / jnp.maximum(jnp.sum(wgt) * 2, 1.0))
    return p.at[free_idx].add(dp), rms, err


def refine_turntable(matches, poses, theta0, width, height, *,
                     free=("f", "dpan", "dtilt", "roll", "mx", "my", "k1"),
                     per_view=True, iters=12, jitter_reg=10.0,
                     gate_px=(60.0, 12.0, 4.0), jitter_from_stage=0,
                     min_track_views=3, jitter0=None, k10=0.0):
    """Bundle-adjust the turntable calibration against feature matches.

    matches: dict with view indices va/vb (M,) int32, pixel coords ua/ub
    (M, 2) float32 and keypoint slot indices ka/kb (M,) — as returned by
    build_matches. Pairwise matches are merged into MULTI-VIEW TRACKS
    and each track is triangulated from all its rays; tracks shorter
    than `min_track_views` are dropped (pairwise-only constraints carry
    a focal/tilt/height gauge and would let the solver settle in a
    wrong basin). theta0: (9,) initial calibration (e.g. from
    selfcal.calibrate_turntable). Returns dict with theta, per-view
    (dpan_v, dtilt_v) CNC-jitter estimates, inlier stats, rms.

    Staging: the outlier gate tightens per stage; per-view jitter joins
    from stage `jitter_from_stage` (default 0 — on real turntables the
    gimbal jitter DOMINATES the residuals, so it must be free early;
    the Tikhonov prior toward 0 keeps it from absorbing global basin
    error). After the last gate a short polish runs on the final
    inlier set so the tightest gate shapes the solution, not just the
    statistics.
    """
    from .selfcal import THETA_NAMES

    va, vb = np.asarray(matches["va"]), np.asarray(matches["vb"])
    ua, ub = np.asarray(matches["ua"]), np.asarray(matches["ub"])
    ka, kb = np.asarray(matches["ka"]), np.asarray(matches["kb"])
    poses_j = jnp.asarray(poses, jnp.float32)
    V = poses_j.shape[0]
    K = int(max(ka.max(initial=0), kb.max(initial=0))) + 1

    obs_track, obs_node = build_tracks(va, vb, ka, kb, V, K)
    uv_table = np.zeros((V * K, 2), np.float32)
    uv_table[va.astype(np.int64) * K + ka] = ua
    uv_table[vb.astype(np.int64) * K + kb] = ub
    # keep tracks spanning enough views to anchor the calibration
    n_obs = np.bincount(obs_track, minlength=obs_track.max() + 1 if
                        len(obs_track) else 1)
    keep = n_obs[obs_track] >= min_track_views
    if keep.sum() < 100 and len(obs_track):
        keep = n_obs[obs_track] >= 2        # fall back on sparse scenes
    obs_track, obs_node = obs_track[keep], obs_node[keep]
    _, obs_track = np.unique(obs_track, return_inverse=True)
    n_tracks = int(obs_track.max()) + 1 if len(obs_track) else 0
    if n_tracks == 0:
        raise ValueError("no multi-view tracks to bundle-adjust")
    obs_view = (obs_node // K).astype(np.int32)
    obs_uv = uv_table[obs_node]

    obs_track_j = jnp.asarray(obs_track.astype(np.int32))
    obs_view_j = jnp.asarray(obs_view)
    obs_uv_j = jnp.asarray(obs_uv)

    jit3 = _jitter_vector(jitter0, V)
    p = jnp.concatenate([jnp.asarray(theta0, jnp.float32),
                         jnp.asarray([k10], jnp.float32),
                         jnp.asarray(jit3)])
    p_prior = p
    names = list(THETA_NAMES) + ["k1"]
    glob = [names.index(n) for n in free]
    jit_idx = list(range(N_GLOBAL, N_GLOBAL + N_JITTER * V))
    # prior weights (px^2 per unit^2): focal free; angles and mount
    # offsets softly anchored to the silhouette-stage solution; k1 in
    # normalized-coordinate units (typical |k1| < 0.3)
    prior_by_name = {"f": 1e-8, "dcx": 1e-3, "dcy": 1e-3, "dpan": 1.0,
                     "dtilt": 1.0, "roll": 1.0, "mx": 1.0, "my": 1.0,
                     "mz": 1.0, "k1": 1e3}

    def _stage_params(with_jitter):
        free_list = list(glob)
        reg_list = [prior_by_name[names[i]] for i in glob]
        if with_jitter:
            free_list += jit_idx
            # per-view deltas are anchored to 0: they absorb CNC
            # jitter; the global dpan/dtilt carry the mount calibration.
            # Roll wobble is physically smaller than gimbal pan drift,
            # so its prior is 4x stiffer.
            reg_list += ([jitter_reg] * (2 * V)
                         + [4.0 * jitter_reg] * V)
        return (jnp.asarray(free_list, jnp.int32),
                jnp.asarray(reg_list, jnp.float32), len(free_list))

    w_obs = jnp.ones(len(obs_track), jnp.float32)
    rms = np.inf
    for stage, gate in enumerate(gate_px):
        free_idx, reg, n_free = _stage_params(
            per_view and stage >= jitter_from_stage)
        # the final stage appends a polish on the tightest gate's
        # inliers, so that gate steers the solution
        n_iters = iters + (iters // 2 if stage == len(gate_px) - 1 else 0)
        lam = 1e-1
        for it in range(n_iters):
            p, rms, err = _gn_step(p, p_prior, poses_j, obs_track_j,
                                   obs_view_j, obs_uv_j, w_obs,
                                   jnp.float32(width), jnp.float32(height),
                                   free_idx, reg, jnp.float32(lam), n_free,
                                   n_tracks=n_tracks)
            lam = max(lam * 0.6, 1e-4)
            if stage == len(gate_px) - 1 and it == iters - 1:
                w_obs = (err <= gate).astype(jnp.float32)
        w_obs = (err <= gate).astype(jnp.float32)

    theta = np.asarray(p[:9])
    return {
        "theta": {**{n: float(theta[i]) for i, n in enumerate(THETA_NAMES)},
                  "k1": float(p[K1_IDX])},
        "theta_raw": theta,
        "k1": float(p[K1_IDX]),
        "dpan_view": np.asarray(p[N_GLOBAL:N_GLOBAL + V]),
        "dtilt_view": np.asarray(p[N_GLOBAL + V:N_GLOBAL + 2 * V]),
        "droll_view": np.asarray(p[N_GLOBAL + 2 * V:N_GLOBAL + 3 * V]),
        "rms_px": float(rms),
        "n_matches": int(len(va)),
        "n_tracks": n_tracks,
        "n_obs": int(len(obs_track)),
        "n_inliers": int(np.asarray(w_obs).sum()),
    }


def iterative_refine(gray, kp_masks, theta0, poses, width, height, *,
                     rounds=2, k=512, strides=(1, 2, 4, 7, 12),
                     downsample=1, min_matches=50, estimate_k1=False,
                     f_starts=(1.0,),
                     schedule=((80.0, (60.0, 12.0, 4.0)),
                               (15.0, (8.0, 4.0, 2.5))),
                     _cache=None):
    """Alternate matching and bundle adjustment (SfM-style refinement).

    Round 1 gates raw matches with the rough silhouette calibration
    (wide gate — CNC pan jitter alone is worth tens of pixels); each
    later round RE-GATES the cached raw matches with the refined
    cameras at a tighter gate, growing the inlier set while shedding
    outliers, then re-runs the BA warm-started from the previous
    solution. Detection/matching runs once (cached). Returns the last
    refine_turntable result (with an extra "f_start" key), or None when
    no start yields enough matches.

    `f_starts` multi-starts the focal length: round 1 runs once per
    multiplier of theta0's f and the start whose BA keeps the most
    final-gate inliers wins (later rounds continue from it alone). This
    is the degeneracy-breaker for silhouette-calibrated rigs: a global
    focal error is a near-gauge of the circular-motion silhouette score
    (the hull and its probe rays fatten together), so the silhouette
    stage can hand the BA an f that is off by 2-3x and pinned at its
    search bound (observed on the arabidopsis000 fixture), and a single
    GN descent from such a start collapses onto a small degenerate
    inlier subset instead of crossing the valley. Starts are scored on
    the SAME raw match set and gates, so inlier counts are comparable.
    """
    if _cache is None:
        _cache = {}
    theta0 = np.asarray(theta0, np.float32)
    # k1 from feature tracks of a centered rotating plant is barely
    # identifiable (it trades against f): on the real_plant fixture the
    # freed estimate flips sign run-to-run and undistorting with it
    # LOSES ~4 deg of divergence-angle accuracy vs pinhole (round 3
    # k1 sweep: 0.0 -> 16.35 deg, +0.0087 -> 20.5, -0.0087 -> 19.5).
    # Pinhole BA is the default; free k1 only on request.
    free = ("f", "dpan", "dtilt", "roll", "mx", "my")
    if estimate_k1:
        free = free + ("k1",)

    mgate, bgates = schedule[0]
    best = None
    for m in (f_starts or (1.0,)):
        th = theta0.copy()
        th[0] *= float(m)
        matches = build_matches(gray, kp_masks, th, poses, width, height,
                                k=k, strides=strides, gate_px=mgate,
                                downsample=downsample, _cache=_cache)
        if len(matches["va"]) < min_matches:
            continue
        try:
            cand = refine_turntable(matches, poses, th, width, height,
                                    gate_px=bgates, free=free)
        except ValueError:          # no multi-view tracks at this gating
            continue
        if not np.isfinite(cand["rms_px"]):
            continue
        # per-start focal trust region: on near-planar feature sets
        # (e.g. a small rosette: arabidopsis000's masks are ~3.5k px on
        # a 518k-px frame) the GN can spiral f -> 0, pulling every
        # projection toward the principal point and "fitting" the few
        # near-center observations at sub-pixel rms. Such a collapse
        # must not be crowned winner just because its inlier count
        # beats other collapsed starts.
        ratio = float(cand["theta_raw"][0]) / max(float(th[0]), 1e-6)
        if not (0.4 <= ratio <= 2.5):
            continue
        if best is None or cand["n_inliers"] > best[1]["n_inliers"]:
            best = (float(m), cand)
    if best is None:
        return None

    m_win, ba = best
    theta = ba["theta_raw"]
    jitter = (ba["dpan_view"], ba["dtilt_view"], ba["droll_view"])
    k1 = ba["k1"]
    for rnd in range(1, min(rounds, len(schedule))):
        mgate, bgates = schedule[rnd]
        matches = build_matches(gray, kp_masks, theta, poses, width, height,
                                k=k, strides=strides, gate_px=mgate,
                                downsample=downsample, jitter0=jitter,
                                k10=k1, _cache=_cache)
        if len(matches["va"]) < min_matches:
            break
        cand = refine_turntable(matches, poses, theta, width, height,
                                gate_px=bgates, jitter0=jitter, k10=k1,
                                free=free)
        ratio = float(cand["theta_raw"][0]) / max(float(theta[0]), 1e-6)
        if not np.isfinite(cand["rms_px"]) or not (0.4 <= ratio <= 2.5):
            break                   # keep the previous round's solution
        ba = cand
        theta = ba["theta_raw"]
        jitter = (ba["dpan_view"], ba["dtilt_view"], ba["droll_view"])
        k1 = ba["k1"]
    ba["f_start"] = m_win
    return ba


def _jitter_vector(jitter0, V):
    """Per-view delta groups -> flat (N_JITTER*V,) vector; accepts legacy
    2-tuples (dpan, dtilt) by zero-filling the roll group."""
    if jitter0 is None:
        return np.zeros(N_JITTER * V, np.float32)
    groups = list(jitter0)
    while len(groups) < N_JITTER:
        groups.append(np.zeros(V, np.float32))
    return np.concatenate(groups).astype(np.float32)


def cameras_from_refined(res, poses, width, height):
    """Packed (V, 16) cameras from a refine_turntable result."""
    poses_adj = np.asarray(poses, np.float32).copy()
    poses_adj[:, 3] += res["dpan_view"]
    poses_adj[:, 4] += res["dtilt_view"]
    droll = res.get("droll_view")
    return np.asarray(cnc_to_cameras(
        jnp.asarray(poses_adj), jnp.asarray(res["theta_raw"]),
        float(width), float(height),
        droll=None if droll is None else jnp.asarray(droll)))


# ----------------------------------------------------------------------
# end-to-end feature pipeline
# ----------------------------------------------------------------------


def build_matches(gray, masks, theta0, poses, width, height, *,
                  k=512, strides=(1, 2, 4, 7), gate_px=80.0,
                  ratio=0.95, chunk=12, downsample=1, jitter0=None,
                  k10=0.0, _cache=None):
    """Detect, describe and match keypoints across turntable strides.

    gray: (V, H, W) float32 images at FULL resolution (width/height);
    masks restrict keypoints to the plant. Detection optionally runs at
    1/`downsample` resolution (CPU-test budget control) — returned match
    coordinates are always full-resolution pixels. Views are processed
    in `chunk`-sized batches to bound device memory. Matches are
    pre-gated with the initial calibration `theta0` (+ optional per-view
    `jitter0` = (dpan_view, dtilt_view) from a previous BA round —
    iterative re-matching with a tighter gate is how the inlier set
    grows once the first refinement lands): reprojection through
    midpoint triangulation must land within `gate_px`. Returns a dict
    of match columns (va, vb, ua, ub, ka, kb). Pass a dict as `_cache`
    to reuse detection/matching across gating rounds.
    """
    if _cache is not None and "raw" in _cache:
        out = dict(_cache["raw"])
        V = np.asarray(poses).shape[0]
        return _gate_matches(out, theta0, jitter0, poses, V, width, height,
                             gate_px, k10)
    gray = np.asarray(gray, np.float32)
    masks = np.asarray(masks) != 0
    ds = int(downsample)
    if ds > 1:
        V0, H0, W0 = gray.shape
        Hc, Wc = (H0 // ds) * ds, (W0 // ds) * ds
        gray = gray[:, :Hc, :Wc].reshape(V0, Hc // ds, ds, Wc // ds, ds)
        gray = gray.mean(axis=(2, 4))
        masks = masks[:, :Hc, :Wc].reshape(V0, Hc // ds, ds, Wc // ds, ds)
        masks = masks.max(axis=(2, 4))

    V = gray.shape[0]
    uv_l, score_l, desc_l = [], [], []
    for c0 in range(0, V, chunk):
        g = jnp.asarray(gray[c0:c0 + chunk])
        m = jnp.asarray(masks[c0:c0 + chunk])
        uv_c, score_c = harris_keypoints(g, m, k=k)
        desc_l.append(np.asarray(patch_descriptors(g, uv_c)))
        uv_l.append(np.asarray(uv_c))
        score_l.append(np.asarray(score_c))
    uv = np.concatenate(uv_l)
    score = jnp.asarray(np.concatenate(score_l))
    desc = jnp.asarray(np.concatenate(desc_l))
    if ds > 1:
        uv = (uv + 0.5) * ds - 0.5
    uv = jnp.asarray(uv)

    uv_np = np.asarray(uv)
    cols = {n: [] for n in ("va", "vb", "ua", "ub", "ka", "kb")}
    for s in strides:
        for a in range(V):
            b = (a + s) % V
            if b == a:
                continue
            idx_b, valid = match_mutual(desc[a], desc[b], score[a],
                                        score[b], ratio)
            valid_np = np.asarray(valid)
            if not valid_np.any():
                continue
            ka = np.nonzero(valid_np)[0]
            kb = np.asarray(idx_b)[ka]
            cols["va"].append(np.full(len(ka), a, np.int32))
            cols["vb"].append(np.full(len(ka), b, np.int32))
            cols["ua"].append(uv_np[a][ka])
            cols["ub"].append(uv_np[b][kb])
            cols["ka"].append(ka.astype(np.int32))
            cols["kb"].append(kb.astype(np.int32))

    if not cols["va"]:
        return {n: (np.zeros((0, 2), np.float32) if n in ("ua", "ub")
                    else np.zeros(0, np.int32)) for n in cols}
    out = {n: np.concatenate(v) for n, v in cols.items()}
    out["ua"] = out["ua"].astype(np.float32)
    out["ub"] = out["ub"].astype(np.float32)
    if _cache is not None:
        _cache["raw"] = dict(out)
    return _gate_matches(out, theta0, jitter0, poses, V, width, height,
                         gate_px, k10)


def _gate_matches(out, theta0, jitter0, poses, V, width, height, gate_px,
                  k10=0.0):
    """Geometric pre-gate in ONE batched call (per-pair calls would
    re-trace for every distinct match count)."""
    p0 = jnp.concatenate([jnp.asarray(theta0, jnp.float32),
                          jnp.asarray([k10], jnp.float32),
                          jnp.asarray(_jitter_vector(jitter0, V))])
    r = np.asarray(_residuals(
        p0, jnp.asarray(poses, jnp.float32), jnp.asarray(out["va"]),
        jnp.asarray(out["vb"]), jnp.asarray(out["ua"]),
        jnp.asarray(out["ub"]), jnp.float32(width), jnp.float32(height)))
    keep = np.linalg.norm(r, axis=1) <= gate_px
    return {n: v[keep] for n, v in out.items()}
