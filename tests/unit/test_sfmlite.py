"""Turntable bundle adjustment (ops/sfmlite.py) unit tests.

The BA core is validated in-model: synthetic 3D points observed through
cameras built by cnc_to_cameras with a known calibration + per-view CNC
jitter must be recovered (focal to <1%, sub-pixel rms) from a wrong
initial focal — the precision COLMAP provides in the reference pipeline
(reference colmap.py:977-1008)."""

import numpy as np
import jax.numpy as jnp

from plant3dvision_tpu.ops import selfcal, sfmlite


def _ring_poses(n_views, radius=200.0, z=60.0):
    ang = 360.0 * np.arange(n_views) / n_views
    return np.stack([
        radius * np.cos(np.deg2rad(ang)),
        radius * np.sin(np.deg2rad(ang)),
        np.full(n_views, z),
        ang + 90.0,
        np.zeros(n_views),
    ], axis=1).astype(np.float32)


def _synthetic_scene(V=20, W=320, H=240, seed=3):
    """Ring scene with known calibration + CNC jitter -> (poses, matches,
    theta_true, jit_pan). Matches are exact multi-view tracks with 0.3 px
    observation noise (what build_tracks/refine_turntable consume)."""
    rng = np.random.default_rng(seed)
    poses = _ring_poses(V)

    theta_true = np.zeros(9, np.float32)
    theta_true[0] = 260.0
    theta_true[3] = 1.0        # dpan
    theta_true[6] = 3.0        # mx
    theta_true[7] = -2.0       # my
    jit_pan = (0.15 * rng.standard_normal(V)).astype(np.float32)
    jit_tilt = (0.10 * rng.standard_normal(V)).astype(np.float32)
    poses_true = poses.copy()
    poses_true[:, 3] += jit_pan
    poses_true[:, 4] += jit_tilt
    cams = np.asarray(selfcal.cnc_to_cameras(poses_true, theta_true, W, H))

    # random structure inside the working volume
    pts = np.stack([rng.uniform(-30, 30, 300), rng.uniform(-30, 30, 300),
                    rng.uniform(10, 120, 300)], axis=1)

    def project(v, X):
        fx, fy, cx, cy = cams[v, :4]
        R, t = cams[v, 4:13].reshape(3, 3), cams[v, 13:16]
        q = X @ R.T + t
        return np.stack([q[:, 0] / q[:, 2] * fx + cx,
                         q[:, 1] / q[:, 2] * fy + cy], axis=1)

    # observations with per-view noise, consistent per (view, point) so
    # pairwise matches merge into true multi-view tracks
    noisy = {v: project(v, pts) + 0.3 * rng.standard_normal((len(pts), 2))
             for v in range(V)}
    cols = {n: [] for n in ("va", "vb", "ua", "ub", "ka", "kb")}
    for s in (1, 2, 4, 7):
        for a in range(V):
            b = (a + s) % V
            pa, pb = noisy[a], noisy[b]
            vis = ((pa > 8) & (pa < [W - 8, H - 8])).all(1) \
                & ((pb > 8) & (pb < [W - 8, H - 8])).all(1)
            idx = np.nonzero(vis)[0]
            cols["va"].append(np.full(len(idx), a, np.int32))
            cols["vb"].append(np.full(len(idx), b, np.int32))
            cols["ua"].append(pa[idx])
            cols["ub"].append(pb[idx])
            cols["ka"].append(idx.astype(np.int32))
            cols["kb"].append(idx.astype(np.int32))
    matches = {n: np.concatenate(v) for n, v in cols.items()}
    matches["ua"] = matches["ua"].astype(np.float32)
    matches["ub"] = matches["ub"].astype(np.float32)
    return poses, matches, theta_true, jit_pan


def test_refine_turntable_recovers_focal_and_jitter():
    V, W, H = 20, 320, 240
    poses, matches, theta_true, jit_pan = _synthetic_scene(V, W, H)

    theta0 = np.zeros(9, np.float32)
    theta0[0] = 300.0          # ~15% focal error from the silhouette stage
    theta0[3] = 0.7
    res = sfmlite.refine_turntable(matches, poses, theta0, W, H)

    assert abs(res["theta"]["f"] - 260.0) / 260.0 < 0.01, res["theta"]
    assert res["rms_px"] < 1.0, res["rms_px"]
    # recovered per-view pan jitter tracks the truth (up to the global
    # dpan gauge, removed by centering)
    rec = res["dpan_view"] - res["dpan_view"].mean()
    tru = jit_pan - jit_pan.mean()
    assert np.corrcoef(rec, tru)[0, 1] > 0.9
    assert np.max(np.abs(rec - tru)) < 0.1  # degrees


def test_harris_and_matching_on_shifted_texture():
    rng = np.random.default_rng(0)
    H, W = 120, 160
    base = rng.standard_normal((H + 8, W)).astype(np.float32)
    # smooth the noise so patches are distinctive but not pixel-degenerate
    for ax in (0, 1):
        base = (base + np.roll(base, 1, ax) + np.roll(base, -1, ax)) / 3.0
    img_a = base[:H]
    img_b = base[5:H + 5]      # pure 5-pixel vertical shift
    gray = jnp.asarray(np.stack([img_a, img_b]))
    mask = jnp.ones((2, H, W), bool)

    uv, score = sfmlite.harris_keypoints(gray, mask, k=128)
    assert np.asarray(score > 0).sum() > 100
    desc = sfmlite.patch_descriptors(gray, uv)
    idx_b, valid = sfmlite.match_mutual(desc[0], desc[1], score[0], score[1])

    ka = np.nonzero(np.asarray(valid))[0]
    assert len(ka) > 20
    d = np.asarray(uv[1])[np.asarray(idx_b)[ka]] - np.asarray(uv[0])[ka]
    med = np.median(d, axis=0)
    np.testing.assert_allclose(med, [0.0, -5.0], atol=0.5)


def test_iterative_refine_multistart_recovers_gross_focal_error():
    """A silhouette-stage f off by ~2.4x (the circular-motion focal
    gauge pins it at the CEM bound — observed on arabidopsis000) must
    be recovered by the f_starts multi-start: the winning start is
    selected by final-gate inlier count on the shared raw match set."""
    V, W, H = 20, 320, 240
    poses, matches, theta_true, _ = _synthetic_scene(V, W, H)

    theta0 = np.zeros(9, np.float32)
    theta0[0] = 110.0          # truth is 260 — a 2.4x underestimate
    theta0[3] = 0.7

    # detection/matching is bypassed via the pre-seeded raw-match cache
    # (build_matches re-gates per start without touching images). The
    # 2.4x start lands near truth and must win on final-gate inliers
    # over the 20x-low 0.05x start (the gross start converges on clean
    # synthetic data too — the pathology this guards against needs real
    # outliers — but selection + f_start bookkeeping is what's under
    # test here; the ara0 fixture is the integration-level oracle).
    res = sfmlite.iterative_refine(
        None, None, theta0, poses, W, H, min_matches=50,
        f_starts=(0.05, 2.4), _cache={"raw": dict(matches)})
    assert res is not None
    assert res["f_start"] in (0.05, 2.4)
    assert abs(res["theta"]["f"] - 260.0) / 260.0 < 0.01, res["theta"]
    assert res["rms_px"] < 1.0, res["rms_px"]

    # every start failing -> None (the task falls back to silhouette
    # cameras), not an exception
    none_res = sfmlite.iterative_refine(
        None, None, theta0, poses, W, H, min_matches=10 ** 9,
        f_starts=(1.0, 2.4), _cache={"raw": dict(matches)})
    assert none_res is None
