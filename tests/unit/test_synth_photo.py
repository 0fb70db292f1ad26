"""Unit tests for the photo-domain splat renderer (synth_photo.py)."""

import numpy as np

from plant3dvision_tpu.synth_photo import (ML_LABELS, ProceduralArabidopsis,
                                           fixture_like_cameras,
                                           render_photo,
                                           sample_capsule_surface,
                                           sample_mesh_surface)


def test_sample_capsule_surface_on_surface():
    rng = np.random.default_rng(0)
    a, b, r = np.array([0.0, 0, 0]), np.array([0.0, 0, 10.0]), 0.5
    pts, nrm = sample_capsule_surface(a, b, r, density=200.0, rng=rng)
    # every sample is within the capsule radius envelope
    t = np.clip(pts[:, 2] / 10.0, 0, 1)
    closest = np.stack([np.zeros_like(t), np.zeros_like(t), t * 10.0], 1)
    d = np.linalg.norm(pts - closest, axis=1)
    assert np.all(d <= r + 1e-6)
    assert np.all(d >= r - 1e-6) or d.min() > 0.4   # lateral + caps
    # normals are unit
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-6)


def test_sample_mesh_area_weighting():
    rng = np.random.default_rng(0)
    # two triangles, one 100x larger: samples should land ~100:1
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                  [5, 0, 0], [15, 0, 0], [5, 10, 0]], float)
    t = np.array([[0, 1, 2], [3, 4, 5]])
    pts, _ = sample_mesh_surface(v, t, density=50.0, rng=rng)
    frac_big = np.mean(pts[:, 0] >= 5.0)
    assert frac_big > 0.95


def test_render_photo_occlusion_order():
    """The NEARER surface must win the pixel (painter's algorithm)."""
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    R = np.eye(3)
    t = np.zeros(3)
    n = 8000   # dense enough that the near sheet fully covers its pixels
    rng = np.random.default_rng(1)
    # two parallel square sheets on the optical axis; 'stem' is closer
    xy = rng.uniform(-0.5, 0.5, (n, 2))
    near = np.column_stack([xy, np.full(n, 5.0)])
    far = np.column_stack([xy * 2.0, np.full(n * 1, 8.0)])
    nrm = np.tile([0.0, 0, -1.0], (n, 1))
    samples = {"stem": (near, nrm), "leaf": (far, nrm)}
    rgb, masks, lab = render_photo(samples, K, R, t, 64, 64, rng=rng)
    stem_i = ML_LABELS.index("stem")
    # center pixels covered by both sheets -> stem (nearer) wins
    center = lab[28:36, 28:36]
    assert (center == stem_i).mean() > 0.9
    assert masks["background"][0, 0] == 255


def test_procedural_plant_ground_truth_shapes():
    p = ProceduralArabidopsis(n_fruits=17, seed=3)
    assert len(p.gt_angles) == 16 and len(p.gt_internodes) == 16
    samples = p.labeled_samples(density=60.0)
    assert set(samples) == {"stem", "pedicel", "fruit", "leaf"}
    K, R, t = fixture_like_cameras(1, radius=80.0, width=128, height=128,
                                   f=53.0)[0]
    rgb, masks, lab = render_photo(samples, K, R, t, 128, 128,
                                   rng=np.random.default_rng(0))
    # the plant must be visible and labeled
    assert (lab > 0).sum() > 50
    # label image is consistent with the per-organ masks' union
    union = np.zeros_like(lab, bool)
    for name, m in masks.items():
        if name != "background":
            union |= m > 0
    assert ((lab > 0) & ~union).mean() < 0.02
