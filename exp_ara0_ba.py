"""Debug the feature BA collapse on arabidopsis000.

Observed (CPU run, multi-start): every focal start collapses to a tiny
inlier subset with f -> 0 (72/5146 inliers at rms 0.74 px). This script
isolates the BA: silhouette theta hardcoded from the run log, matches
built once, then refine_turntable probed per start / per freeing policy.

Usage: python exp_ara0_ba.py [--cpu]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--starts", default="1.0,1.6,2.6,4.2")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from exp_ara0 import get_db
    from plant3dvision_tpu.ops.masks import compute_mask_numpy, _dilate_np
    from plant3dvision_tpu.ops import sfmlite
    from plant3dvision_tpu.fsdb import io
    from plant3dvision_tpu.tasks.colmap import normalize_cnc_poses

    db = get_db()
    scan = db.get_scan("arabidopsis000")
    fs = scan.get_fileset("images")
    files = sorted(fs.get_files(), key=lambda f: f.id)
    poses, conv = normalize_cnc_poses(
        [f.get_metadata("pose")[:5] for f in files])
    print("pose conversions:", conv)

    masks, gray = [], []
    for f in files:
        img = io.read_image(f)
        m = compute_mask_numpy(img, filter_type="excess_green",
                               coefs=(0.0, 1.0, 0.0), threshold=0.1,
                               binarize=True) > 0.5
        masks.append(m)
        gray.append(img.mean(axis=2).astype(np.float32) / 255.0)
    masks = np.stack(masks)
    gray = np.stack(gray)
    V, H, W = masks.shape
    kp_masks = np.stack([_dilate_np(m, 6) for m in masks])
    print(f"{V} views {W}x{H}, mask px/view: {masks.sum(axis=(1, 2)).mean():.0f}")

    # silhouette theta from the 20:55 run log
    theta_sil = np.array([401.207, 0.0, 0.0, 0.98380, -3.58146, -0.03766,
                          5.82608, 7.63005, 0.0], np.float32)

    cache = {}
    t0 = time.time()
    raw = sfmlite.build_matches(gray, kp_masks, theta_sil, poses, W, H,
                                k=512, strides=(1, 2, 4, 7, 12),
                                gate_px=1e9, _cache=cache)
    print(f"raw matches: {len(raw['va'])} ({time.time()-t0:.0f}s)")

    for m in (float(s) for s in args.starts.split(",")):
        th = theta_sil.copy()
        th[0] *= m
        g = sfmlite.build_matches(None, None, th, poses, W, H,
                                  gate_px=80.0, _cache=cache)
        print(f"\n== start x{m} (f={th[0]:.0f}): gated {len(g['va'])}")
        if len(g["va"]) < 50:
            continue
        for free in (("f", "dpan", "dtilt", "roll", "mx", "my"),
                     ("dpan", "dtilt", "roll", "mx", "my")):
            try:
                ba = sfmlite.refine_turntable(
                    g, poses, th, W, H, gate_px=(60.0, 12.0, 4.0), free=free)
            except ValueError as e:
                print(f"  free={'+'.join(free)}: {e}")
                continue
            t = ba["theta"]
            print(f"  free={'f' in free and 'f+' or ''}rest: "
                  f"f={t['f']:.1f} rms={ba['rms_px']:.2f} "
                  f"inl={ba['n_inliers']}/{ba['n_obs']} "
                  f"tracks={ba['n_tracks']} my={t['my']:.1f} "
                  f"dtilt={t['dtilt']:.2f} roll={t['roll']:.2f}")
    db.disconnect()


if __name__ == "__main__":
    main()


def probe_round2():
    """Reproduce iterative_refine round 2 from the good x1.6 round-1
    solution: re-gate at 15 px with jitter, refine at (8, 4, 2.5)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from exp_ara0 import get_db
    from plant3dvision_tpu.ops.masks import compute_mask_numpy, _dilate_np
    from plant3dvision_tpu.ops import sfmlite
    from plant3dvision_tpu.fsdb import io
    from plant3dvision_tpu.tasks.colmap import normalize_cnc_poses

    db = get_db()
    scan = db.get_scan("arabidopsis000")
    files = sorted(scan.get_fileset("images").get_files(), key=lambda f: f.id)
    poses, _ = normalize_cnc_poses([f.get_metadata("pose")[:5] for f in files])
    masks, gray = [], []
    for f in files:
        img = io.read_image(f)
        masks.append(compute_mask_numpy(img, filter_type="excess_green",
                                        coefs=(0.0, 1.0, 0.0), threshold=0.1,
                                        binarize=True) > 0.5)
        gray.append(img.mean(axis=2).astype(np.float32) / 255.0)
    masks, gray = np.stack(masks), np.stack(gray)
    V, H, W = masks.shape
    kp_masks = np.stack([_dilate_np(m, 6) for m in masks])
    theta_sil = np.array([401.207, 0.0, 0.0, 0.98380, -3.58146, -0.03766,
                          5.82608, 7.63005, 0.0], np.float32)
    cache = {}
    th = theta_sil.copy(); th[0] *= 1.6
    free = ("f", "dpan", "dtilt", "roll", "mx", "my")
    g = sfmlite.build_matches(gray, kp_masks, th, poses, W, H, k=512,
                              strides=(1, 2, 4, 7, 12), gate_px=80.0,
                              _cache=cache)
    ba = sfmlite.refine_turntable(g, poses, th, W, H,
                                  gate_px=(60.0, 12.0, 4.0), free=free)
    print(f"round1: f={ba['theta']['f']:.1f} rms={ba['rms_px']:.2f} "
          f"inl={ba['n_inliers']}/{ba['n_obs']}")
    theta = ba["theta_raw"]
    jitter = (ba["dpan_view"], ba["dtilt_view"], ba["droll_view"])
    g2 = sfmlite.build_matches(None, None, theta, poses, W, H, gate_px=15.0,
                               jitter0=jitter, k10=ba["k1"], _cache=cache)
    print(f"round2 gated: {len(g2['va'])}")
    ba2 = sfmlite.refine_turntable(g2, poses, theta, W, H,
                                   gate_px=(8.0, 4.0, 2.5), jitter0=jitter,
                                   k10=ba["k1"], free=free)
    t = ba2["theta"]
    print(f"round2: f={t['f']:.1f} rms={ba2['rms_px']:.2f} "
          f"inl={ba2['n_inliers']}/{ba2['n_obs']} my={t['my']:.1f} "
          f"dtilt={t['dtilt']:.2f}")
    db.disconnect()
