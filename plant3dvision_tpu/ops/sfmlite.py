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


@functools.partial(jax.jit, static_argnames=("k", "border"))
def harris_keypoints(gray, mask, k: int = 512, border: int = 16,
                     kappa: float = 0.06):
    """Top-k Harris corners per view, restricted to `mask`.

    gray: (V, H, W) float32; mask: (V, H, W) bool. Returns (uv (V, k, 2)
    float [x, y], score (V, k)); invalid slots have score <= 0.
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

    score, lin = jax.lax.top_k(r.reshape(V, H * W), k)
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


def _cameras_from_params(p, poses, width, height):
    """Global theta (9) + per-view (dpan_v, dtilt_v) -> packed (V, 16).

    p: (9 + 2V,). Per-view deltas ride on the pose table (pan/tilt
    columns), so cnc_to_cameras stays the single projection model.
    """
    V = poses.shape[0]
    theta = p[:9]
    dpan_v = p[9:9 + V]
    dtilt_v = p[9 + V:9 + 2 * V]
    poses_adj = poses.at[:, 3].add(dpan_v).at[:, 4].add(dtilt_v)
    return cnc_to_cameras(poses_adj, theta, width, height)


def _project_points(cams, X):
    """cams (M, 16) x points (M, 3) -> pixel (M, 2)."""
    R = cams[:, 4:13].reshape(-1, 3, 3)
    t = cams[:, 13:16]
    q = jnp.einsum("mij,mj->mi", R, X) + t
    z = jnp.maximum(q[:, 2], 1e-6)
    return jnp.stack([q[:, 0] / z * cams[:, 0] + cams[:, 2],
                      q[:, 1] / z * cams[:, 1] + cams[:, 3]], axis=1)


def _residuals(p, poses, va, vb, ua, ub, width, height):
    """Per-match reprojection residuals (M, 4).

    For match m between views (va, vb) at pixels (ua, ub): back-project
    both rays from the (fixed) camera centers, triangulate the midpoint,
    reproject into both views. Fully differentiable in p.
    """
    cams = _cameras_from_params(p, poses, width, height)
    ca, cb = cams[va], cams[vb]

    def ray(c, u):
        R = c[:, 4:13].reshape(-1, 3, 3)
        t = c[:, 13:16]
        C = -jnp.einsum("mji,mj->mi", R, t)
        d_cam = jnp.stack([(u[:, 0] - c[:, 2]) / c[:, 0],
                           (u[:, 1] - c[:, 3]) / c[:, 1],
                           jnp.ones_like(u[:, 0])], axis=1)
        d = jnp.einsum("mji,mj->mi", R, d_cam)
        return C, d

    Ca, da = ray(ca, ua)
    Cb, db = ray(cb, ub)
    # midpoint of the common perpendicular of the two rays
    w = Cb - Ca
    aa = jnp.sum(da * da, axis=1)
    bb = jnp.sum(db * db, axis=1)
    ab = jnp.sum(da * db, axis=1)
    wa = jnp.sum(w * da, axis=1)
    wb = jnp.sum(w * db, axis=1)
    den = aa * bb - ab * ab
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    s = (wa * bb - wb * ab) / den
    t = (wa * ab - wb * aa) / den
    X = 0.5 * (Ca + s[:, None] * da + Cb + t[:, None] * db)

    ra = _project_points(ca, X) - ua
    rb = _project_points(cb, X) - ub
    return jnp.concatenate([ra, rb], axis=1)


@functools.partial(jax.jit, static_argnames=("n_free",))
def _gn_step(p, poses, va, vb, ua, ub, w_match, width, height,
             free_idx, reg, lam, n_free: int):
    """One Huber-IRLS Levenberg-Marquardt step on the free parameters.

    Diagonal (Marquardt) scaling handles the wildly mixed parameter
    units (pixels / degrees / millimetres) without hand-tuned scales."""

    def r_free(pf):
        return _residuals(p.at[free_idx].set(pf), poses, va, vb, ua, ub,
                          width, height)

    pf = p[free_idx]
    r = r_free(pf)                                       # (M, 4)
    err = jnp.linalg.norm(r, axis=1)
    delta = 2.0                                          # Huber width (px)
    hub = jnp.where(err <= delta, 1.0, delta / jnp.maximum(err, 1e-9))
    wgt = (hub * w_match)[:, None]

    J = jax.jacfwd(r_free)(pf)                           # (M, 4, n_free)
    Jw = (J * wgt[..., None]).reshape(-1, n_free)
    JTJ = Jw.T @ J.reshape(-1, n_free)
    JTr = Jw.T @ (r * wgt).reshape(-1)
    diag = jnp.maximum(jnp.diag(JTJ), 1e-8)
    A = JTJ + jnp.diag(lam * diag + reg)
    dp = jnp.linalg.solve(A, -JTr)
    rms = jnp.sqrt(jnp.sum((r * wgt) ** 2) / jnp.maximum(jnp.sum(wgt) * 4, 1.0))
    return p.at[free_idx].add(dp), rms, err


def refine_turntable(matches, poses, theta0, width, height, *,
                     free=("f", "dpan", "dtilt", "roll", "mx", "my"),
                     per_view=True, iters=12, jitter_reg=1e2,
                     gate_px=(30.0, 8.0, 3.0)):
    """Bundle-adjust the turntable calibration against feature matches.

    matches: dict or tuple (va, vb, ua, ub) — view indices (M,) int32 and
    pixel coords (M, 2) float32 of matched keypoints.
    theta0: (9,) initial calibration (e.g. from
    selfcal.calibrate_turntable). Returns dict with theta, per-view
    (dpan_v, dtilt_v), inlier stats, rms.

    The outlier gate tightens over `gate_px` stages; matches outside the
    current gate get weight 0 (re-admitted if a later iterate explains
    them — weights are recomputed from scratch each stage).
    """
    from .selfcal import THETA_NAMES

    if isinstance(matches, dict):
        va, vb, ua, ub = (matches[k] for k in ("va", "vb", "ua", "ub"))
    else:
        va, vb, ua, ub = matches
    va = jnp.asarray(va, jnp.int32)
    vb = jnp.asarray(vb, jnp.int32)
    ua = jnp.asarray(ua, jnp.float32)
    ub = jnp.asarray(ub, jnp.float32)
    poses_j = jnp.asarray(poses, jnp.float32)
    V = poses_j.shape[0]

    p = jnp.concatenate([jnp.asarray(theta0, jnp.float32),
                         jnp.zeros(2 * V, jnp.float32)])
    free_list = [THETA_NAMES.index(n) for n in free]
    reg_list = [1e-6] * len(free_list)
    if per_view:
        free_list += list(range(9, 9 + 2 * V))
        # per-view deltas are regularized toward 0: they absorb CNC
        # jitter, while the global dpan/dtilt carry the mount calibration
        reg_list += [jitter_reg] * (2 * V)
    free_idx = jnp.asarray(free_list, jnp.int32)
    reg = jnp.asarray(reg_list, jnp.float32)
    n_free = len(free_list)

    w_match = jnp.ones(va.shape[0], jnp.float32)
    rms = np.inf
    for stage, gate in enumerate(gate_px):
        lam = 1e-1
        for _ in range(iters):
            p, rms, err = _gn_step(p, poses_j, va, vb, ua, ub, w_match,
                                   jnp.float32(width), jnp.float32(height),
                                   free_idx, reg, jnp.float32(lam), n_free)
            lam = max(lam * 0.6, 1e-4)
        w_match = (err <= gate).astype(jnp.float32)

    theta = np.asarray(p[:9])
    return {
        "theta": {n: float(theta[i]) for i, n in enumerate(THETA_NAMES)},
        "theta_raw": theta,
        "dpan_view": np.asarray(p[9:9 + V]),
        "dtilt_view": np.asarray(p[9 + V:9 + 2 * V]),
        "rms_px": float(rms),
        "n_matches": int(va.shape[0]),
        "n_inliers": int(np.asarray(w_match).sum()),
    }


def cameras_from_refined(res, poses, width, height):
    """Packed (V, 16) cameras from a refine_turntable result."""
    poses_adj = np.asarray(poses, np.float32).copy()
    poses_adj[:, 3] += res["dpan_view"]
    poses_adj[:, 4] += res["dtilt_view"]
    return np.asarray(cnc_to_cameras(jnp.asarray(poses_adj),
                                     jnp.asarray(res["theta_raw"]),
                                     float(width), float(height)))


# ----------------------------------------------------------------------
# end-to-end feature pipeline
# ----------------------------------------------------------------------


def build_matches(gray, masks, theta0, poses, width, height, *,
                  k=512, strides=(1, 2, 4, 7), gate_px=40.0,
                  ratio=0.95):
    """Detect, describe and match keypoints across turntable strides.

    gray: (V, H, W) float32 images (full or working resolution — pass
    matching width/height for the intrinsics scale). masks restrict
    keypoints to the plant. Matches are pre-gated with the initial
    calibration `theta0` (reprojection through midpoint triangulation
    must land within `gate_px`). Returns (va, vb, ua, ub) numpy arrays.
    """
    V = gray.shape[0]
    uv, score = harris_keypoints(jnp.asarray(gray), jnp.asarray(masks), k=k)
    desc = patch_descriptors(jnp.asarray(gray), uv)

    p0 = jnp.concatenate([jnp.asarray(theta0, jnp.float32),
                          jnp.zeros(2 * V, jnp.float32)])
    poses_j = jnp.asarray(poses, jnp.float32)

    va_all, vb_all, ua_all, ub_all = [], [], [], []
    for s in strides:
        for a in range(V):
            b = (a + s) % V
            if b == a:
                continue
            idx_b, valid = match_mutual(desc[a], desc[b], score[a], score[b],
                                        ratio=ratio)
            valid_np = np.asarray(valid)
            if not valid_np.any():
                continue
            ka = np.nonzero(valid_np)[0]
            kb = np.asarray(idx_b)[ka]
            ua = np.asarray(uv[a])[ka]
            ub = np.asarray(uv[b])[kb]
            va = np.full(len(ka), a, np.int32)
            vb = np.full(len(ka), b, np.int32)
            r = np.asarray(_residuals(
                p0, poses_j, jnp.asarray(va), jnp.asarray(vb),
                jnp.asarray(ua, jnp.float32), jnp.asarray(ub, jnp.float32),
                jnp.float32(width), jnp.float32(height)))
            keep = np.linalg.norm(r, axis=1) <= gate_px
            va_all.append(va[keep]); vb_all.append(vb[keep])
            ua_all.append(ua[keep]); ub_all.append(ub[keep])

    if not va_all:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32))
    return (np.concatenate(va_all), np.concatenate(vb_all),
            np.concatenate(ua_all).astype(np.float32),
            np.concatenate(ub_all).astype(np.float32))
