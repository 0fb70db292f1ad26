"""Trait extraction tests on exact synthetic skeletons: the angle oracle."""

import numpy as np

from plant3dvision_tpu.synth import SyntheticPlant
from plant3dvision_tpu.traits import (
    compute_angles_and_internodes_from_directions,
    compute_stem_and_fruit_directions,
    compute_tree_graph,
)


def exact_skeleton(plant: SyntheticPlant, stem_step=2.0, fruit_step=2.0):
    """Polyline skeleton straight from the generative model."""
    pts = []
    lines = []
    # stem: 0 .. stem top
    a, b, _ = plant.capsules[0]
    n = int(np.linalg.norm(b - a) / stem_step) + 1
    zs = np.linspace(a[2], b[2], n)
    stem_idx = []
    for z in zs:
        pts.append([0.0, 0.0, z])
        stem_idx.append(len(pts) - 1)
    lines += [[i, j] for i, j in zip(stem_idx[:-1], stem_idx[1:])]
    # fruits
    for (fa, fb, _r) in plant.capsules[1:]:
        m = int(np.linalg.norm(fb - fa) / fruit_step) + 1
        ts = np.linspace(0, 1, m)[1:]
        # attach to nearest stem node
        attach = stem_idx[int(np.argmin(np.abs(zs - fa[2])))]
        prev = attach
        for t in ts:
            p = fa * (1 - t) + fb * t
            pts.append(p.tolist())
            lines.append([prev, len(pts) - 1])
            prev = len(pts) - 1
    return np.array(pts), np.array(lines)


def angle_error(pred_deg, gt_deg):
    """Best mean abs error over the direction/complement ambiguities."""
    pred = np.asarray(pred_deg, dtype=float)
    gt = np.asarray(gt_deg, dtype=float)
    cands = [pred, 360 - pred, pred[::-1], 360 - pred[::-1]]
    errs = []
    for c in cands:
        if len(c) == len(gt):
            errs.append(np.abs(c - gt).mean())
    return min(errs) if errs else np.inf


def test_tree_graph_structure():
    plant = SyntheticPlant(n_fruits=8)
    pts, lines = exact_skeleton(plant)
    T = compute_tree_graph(pts, lines, stem_axis=2, stem_axis_inverted=True)
    from plant3dvision_tpu.traits.tree import (get_nodes_by_label,
                                               get_ordered_branching_point_nodes)
    bps = get_ordered_branching_point_nodes(T)
    assert len(bps) == 8
    stem_nodes = get_nodes_by_label(T, "stem")
    assert len(stem_nodes) >= 40  # stem polyline survives as main stem
    fruit_nodes = get_nodes_by_label(T, "fruit")
    assert len(fruit_nodes) > 8 * 5  # each fruit contributes its polyline


def test_angles_recovered_exactly_on_gt_skeleton():
    gt = 137.5
    plant = SyntheticPlant(n_fruits=10, divergence_deg=gt, internode=6.0)
    pts, lines = exact_skeleton(plant)
    T = compute_tree_graph(pts, lines, stem_axis=2, stem_axis_inverted=True)
    dirs = compute_stem_and_fruit_directions(T, max_node_dist=10.0,
                                             min_fruit_length=6.0)
    fruit_dirs, stem_dirs, bp_coords, _ = dirs
    assert len(fruit_dirs) == 10
    seq = compute_angles_and_internodes_from_directions(fruit_dirs, stem_dirs,
                                                        bp_coords)
    assert len(seq["angles"]) == 9
    err = angle_error(seq["angles"], np.full(9, gt))
    assert err < 0.5, f"angle error {err} deg, angles={seq['angles']}"
    np.testing.assert_allclose(seq["internodes"], np.full(9, 6.0), atol=0.3)


def test_angles_with_varied_divergence():
    rng = np.random.default_rng(3)
    plant = SyntheticPlant(n_fruits=12, divergence_deg=137.5, internode=6.0,
                           jitter_deg=15.0, seed=3)
    gt_deg = np.rad2deg(plant.gt_angles)
    pts, lines = exact_skeleton(plant)
    T = compute_tree_graph(pts, lines, stem_axis=2, stem_axis_inverted=True)
    dirs = compute_stem_and_fruit_directions(T, max_node_dist=10.0,
                                             min_fruit_length=6.0)
    seq = compute_angles_and_internodes_from_directions(*dirs[:3])
    err = angle_error(seq["angles"], gt_deg)
    assert err < 1.0, f"angle error {err} deg"


def test_cpd_refines_noisy_skeleton():
    """RefineSkeleton math: CPD pulls a perturbed skeleton toward the cloud."""
    from plant3dvision_tpu.ops.registration import cpd_nonrigid
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, 400)
    cloud = np.stack([np.sin(3 * t), np.cos(3 * t), 5 * t], axis=1)
    cloud += 0.01 * rng.standard_normal(cloud.shape)
    skel = np.stack([np.sin(3 * t[::20]), np.cos(3 * t[::20]), 5 * t[::20]], axis=1)
    noisy = skel + 0.3 * rng.standard_normal(skel.shape)
    refined = cpd_nonrigid(cloud, noisy, alpha=2.0, beta=2.0, max_iterations=60)
    d_before = np.abs(np.linalg.norm(noisy[:, :2], axis=1) - 1).mean()
    d_after = np.abs(np.linalg.norm(refined[:, :2], axis=1) - 1).mean()
    assert d_after < d_before * 0.5, (d_before, d_after)


def test_legacy_angles_on_gt_skeleton():
    """The reference's legacy plane-normal algorithm
    (arabidopsis.py:566-683) recovers the divergence angle on an exact
    skeleton — a cross-check against the directions method."""
    from plant3dvision_tpu.traits.angles import (
        compute_angles_and_internodes_legacy)

    gt = 137.5
    plant = SyntheticPlant(n_fruits=10, divergence_deg=gt, internode=6.0)
    pts, lines = exact_skeleton(plant)
    T = compute_tree_graph(pts, lines, stem_axis=2, stem_axis_inverted=True)
    seq = compute_angles_and_internodes_legacy(T, n_nodes_fruit=5,
                                               n_nodes_stem=5)
    assert len(seq["angles"]) >= 8, seq["angles"]
    err = angle_error(seq["angles"], np.full(len(seq["angles"]), gt))
    assert err < 6.0, f"legacy angle error {err} deg, {seq['angles']}"
    np.testing.assert_allclose(
        seq["internodes"], np.full(len(seq["internodes"]), 6.0), atol=0.5)
