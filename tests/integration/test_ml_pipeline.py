"""End-to-end ML pipeline tests.

Two layers of oracle (role of the reference's ML integration tests,
tests/integration/test_anglesandinternodes.py):

- CNN path: train a tiny UNet on synthetic color-coded scans, then
  Segmentation2D -> Voxels(averaging) -> PointCloud(multiclass) ->
  SegmentedPointCloud; assert per-class labelling is sane.
- Organ trait path: with ground-truth masks (NamedFilesetExists), run
  through OrganSegmentation -> AnglesAndInternodes and check divergence
  angles against the known 137.5 deg spiral.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax

from plant3dvision_tpu.fsdb import io
from plant3dvision_tpu.fsdb.testing import TemporaryDB
from plant3dvision_tpu.runtime import RunContext, run_task
from plant3dvision_tpu.runtime.config import load_toml
from plant3dvision_tpu.synth import SyntheticPlant, generate_ml_scan

REPO = Path(__file__).resolve().parents[2]
CONFIG = REPO / "configs" / "ml_pipe_synth.toml"

LABELS = ["background", "stem", "pedicel", "fruit"]


def _sparse_plant():
    # real-arabidopsis-like sparsity: long fruits, wide internodes — the
    # visual hull can only instance-separate organs that don't overlap
    return SyntheticPlant(n_fruits=7, divergence_deg=137.5, internode=14.0,
                          stem_radius=2.5, fruit_radius=2.0,
                          fruit_length=35.0, fruit_elevation_deg=55.0,
                          first_node=25.0)


def _train_tiny_segmenter(scan, steps=150):
    """Train a small UNet to segment the color-coded renders (the mapping
    color->label is trivially learnable, so a few steps suffice)."""
    import optax
    import jax.numpy as jnp
    from plant3dvision_tpu.models import create_unet

    images_fs = scan.get_fileset("images")
    gt_fs = scan.get_fileset("gt_masks")
    imgs, labels = [], []
    for f in images_fs.get_files()[:8]:
        img = io.read_image(f)
        shot = f.get_metadata("shot_id")
        lab = np.zeros(img.shape[:2], np.int32)
        for li, name in enumerate(LABELS):
            if name == "background":
                continue
            for g in gt_fs.get_files({"shot_id": shot, "channel": name}):
                lab[io.read_image(g) > 0] = li
        imgs.append(img.astype(np.float32) / 255.0)
        labels.append(lab)
    imgs = np.stack(imgs)
    labels = np.stack(labels)

    model, params = create_unet(jax.random.PRNGKey(0),
                                input_shape=(1, imgs.shape[1], imgs.shape[2], 3),
                                widths=(16, 32), blocks_per_stage=1,
                                n_classes=len(LABELS))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    # the plant covers ~1% of pixels: weight classes by inverse frequency
    freq = np.bincount(labels.ravel(), minlength=len(LABELS)).astype(np.float64)
    w = (freq.sum() / np.maximum(freq, 1.0))
    w = jnp.asarray(w / w.sum() * len(LABELS), jnp.float32)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ce * w[y]).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, imgs, labels)
    assert float(loss) < 0.3, f"segmenter failed to train: loss={float(loss)}"
    return params


@pytest.fixture(scope="module")
def ml_db():
    with TemporaryDB() as db:
        scan = generate_ml_scan(db, "synthetic_ml", n_views=36,
                                width=256, height=256, f=360.0,
                                plant=_sparse_plant())
        params = _train_tiny_segmenter(scan)
        from plant3dvision_tpu.models.checkpoint import save_model
        models_fs = scan.get_fileset("models", create=True)
        save_model(models_fs.create_file("tiny_seg"), params,
                   {"label_names": LABELS, "widths": [16, 32],
                    "blocks_per_stage": 1})
        yield db


def test_cnn_segmented_point_cloud(ml_db):
    """CNN -> averaging carve -> multiclass pcd -> reprojection labels."""
    ctx = RunContext(ml_db, "synthetic_ml", load_toml(CONFIG))
    run_task(ctx, "SegmentedPointCloud", report=False)
    fs = ctx.scan.get_fileset(ctx.get_task("SegmentedPointCloud").task_id())
    f = fs.get_files()[0]
    labels = f.get_metadata("labels")
    counts = {l: labels.count(l) for l in set(labels)}
    assert counts.get("stem", 0) > 100
    assert counts.get("fruit", 0) > 100


def test_segmentation2d_resize_mode(ml_db):
    """resize=True runs the net at (Sy, Sx) and writes the probability
    maps back at the ORIGINAL frame size with verbatim camera metadata
    (vs the reference's center crop + principal-point shift). The
    half-res output must agree with the full-res segmentation."""
    base = load_toml(CONFIG)
    ctx = RunContext(ml_db, "synthetic_ml", base)
    run_task(ctx, "Segmentation2D", report=False)
    full_fs = ctx.scan.get_fileset(ctx.get_task("Segmentation2D").task_id())

    cfg = load_toml(CONFIG)
    # 0.75 scale: thin synthetic fruits survive (IoU .48 at 0.5 scale is
    # resolution loss, not plumbing — the floor here guards geometry)
    cfg["Segmentation2D"].update({"Sx": 192, "Sy": 192, "resize": True})
    ctx2 = RunContext(ml_db, "synthetic_ml", cfg)
    run_task(ctx2, "Segmentation2D", report=False)
    half_fs = ctx2.scan.get_fileset(ctx2.get_task("Segmentation2D").task_id())
    assert half_fs.id != full_fs.id  # resize is a significant param

    scored = 0
    for f in half_fs.get_files()[:8]:
        ch = f.get_metadata("channel")
        if ch == "background":
            continue
        half = io.read_image(f) > 127
        assert half.shape == (256, 256)  # original frame, not net size
        ref = io.read_image(full_fs.get_file(f.id)) > 127
        if ref.sum() < 50:
            continue
        iou = (half & ref).sum() / max((half | ref).sum(), 1)
        # pedicels are ~2 px wide at this render size: any resampling
        # halves them (measured .36); hold only the thicker classes to
        # a real floor, pedicel to overlap-exists
        assert iou > (0.5 if ch in ("stem", "fruit") else 0.1), (f.id, iou)
        scored += 1
        # camera metadata must be verbatim (no principal-point shift)
        assert f.get_metadata("camera") == \
            full_fs.get_file(f.id).get_metadata("camera")
    assert scored >= 3


def test_organ_path_angle_accuracy(ml_db):
    """With exact masks, the organ trait path recovers the spiral."""
    cfg = load_toml(CONFIG)
    cfg["NamedFilesetExists"] = {"fileset_id": "gt_masks"}
    cfg["Voxels"]["upstream_mask"] = "NamedFilesetExists"
    cfg["SegmentedPointCloud"]["upstream_segmentation"] = "NamedFilesetExists"
    ctx = RunContext(ml_db, "synthetic_ml", cfg)
    report = run_task(ctx, "AnglesAndInternodes", report=False)
    assert report["AnglesAndInternodes"]["status"] in ("done", "skipped")

    fs = ctx.scan.get_fileset(report["AnglesAndInternodes"]["fileset"])
    out = json.loads(fs.get_file("AnglesAndInternodes").read_raw())
    assert len(out["angles"]) == 6, out["angles"]
    err = np.mean([min(abs(a - 137.5), abs(360 - a - 137.5))
                   for a in out["angles"]])
    assert err < 10.0, out["angles"]
    np.testing.assert_allclose(out["internodes"], 14.0, atol=3.0)


def test_fused_segmentation_carving_matches_two_stage(ml_db):
    """FusedSegmentationCarving (device-resident CNN->averaging volume,
    tasks/fused_ml.py) matches the Segmentation2D -> Voxels(averaging)
    route up to the label-PNG uint8 quantization the two-stage path
    introduces."""
    scan = ml_db.get_scan("synthetic_ml")
    cfg = {
        "Segmentation2D": {"upstream_task": "ImagesFilesetExists",
                           "model_fileset": "NamedFilesetExists",
                           "query": {"channel": "rgb"},
                           "Sx": 256, "Sy": 256,
                           "binarize": False, "dilation": 0,
                           "inverted_labels": []},
        "NamedFilesetExists": {"fileset_id": "models"},
        "Voxels": {"upstream_mask": "Segmentation2D",
                   "upstream_colmap": "DummyTask",
                   "camera_metadata": "camera", "voxel_size": 2.0,
                   "type": "averaging", "log": False},
        "FusedSegmentationCarving": {
            "upstream_task": "ImagesFilesetExists",
            "model_fileset": "NamedFilesetExists",
            "query": {"channel": "rgb"},
            "camera_metadata": "camera", "voxel_size": 2.0,
            "Sx": 256, "Sy": 256, "batch_size": 8, "log": False},
    }
    ctx = RunContext(ml_db, "synthetic_ml", cfg)
    r1 = run_task(ctx, "Voxels", report=False)
    r2 = run_task(ctx, "FusedSegmentationCarving", report=False)

    from plant3dvision_tpu.utils import locate_task_filesets

    def _vols(name, report):
        fs_id = report.get(name, {}).get("fileset") or \
            locate_task_filesets(scan, [name])[name]
        return io.read_npz(scan.get_fileset(fs_id).get_files()[0])

    two_stage = _vols("Voxels", r1)
    fused = _vols("FusedSegmentationCarving", r2)
    assert set(fused) == set(two_stage) == set(LABELS)
    n_views = 36
    for label in LABELS:
        a, b = two_stage[label], fused[label]
        assert a.shape == b.shape
        # uint8 PNG quantization bounds the per-view error at 0.5/255
        tol = n_views * 0.5 / 255.0 + 1e-3
        assert np.abs(a - b).max() <= tol * 3, (label, np.abs(a - b).max())
        assert np.abs(a - b).mean() <= tol, (label, np.abs(a - b).mean())


def test_fused_carving_slab_lane_matches(ml_db, monkeypatch):
    """FusedSegmentationCarving's grid-slab lane (forced via a tiny
    P3D_AVG_CHUNK_VOXELS, VERDICT r3 #2) reproduces the whole-grid
    program's volumes."""
    from plant3dvision_tpu.utils import locate_task_filesets
    scan = ml_db.get_scan("synthetic_ml")
    cfg = {
        "NamedFilesetExists": {"fileset_id": "models"},
        "FusedSegmentationCarving": {
            "upstream_task": "ImagesFilesetExists",
            "model_fileset": "NamedFilesetExists",
            "query": {"channel": "rgb"},
            "camera_metadata": "camera", "voxel_size": 2.5,
            "Sx": 256, "Sy": 256, "batch_size": 8, "log": True},
    }

    def run():
        ctx = RunContext(ml_db, "synthetic_ml", cfg)
        r = run_task(ctx, "FusedSegmentationCarving", report=False)
        fs_id = r.get("FusedSegmentationCarving", {}).get("fileset") or \
            locate_task_filesets(scan, ["FusedSegmentationCarving"])[
                "FusedSegmentationCarving"]
        vols = io.read_npz(scan.get_fileset(fs_id).get_files()[0])
        return fs_id, {k: np.array(v) for k, v in vols.items()}

    fs_id, full = run()
    scan.delete_fileset(fs_id)
    monkeypatch.setenv("P3D_AVG_CHUNK_VOXELS", "2048")
    _, chunked = run()
    assert set(full) == set(chunked) == set(LABELS)
    for label in LABELS:
        np.testing.assert_allclose(full[label], chunked[label],
                                   rtol=1e-6, atol=1e-6)


def test_segmentation2d_runs_torch_bn_checkpoint(ml_db):
    """VERDICT r4 #4 end-to-end: the Segmentation2D TASK serves a torch
    `.pt` checkpoint WITH BatchNorm running stats (the reference's
    published-model format, tasks/proc2d.py:336-351): the loader folds
    the stats into a norm='affine' ResUNet and the task writes one mask
    per image x label."""
    import torch
    from io import BytesIO
    from flax.traverse_util import flatten_dict

    from plant3dvision_tpu.models.unet import ResUNet

    scan = ml_db.get_scan("synthetic_ml")
    model = ResUNet(n_classes=len(LABELS), widths=(8, 16),
                    blocks_per_stage=1, norm="affine")
    template = model.init(jax.random.PRNGKey(4),
                          jax.numpy.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(9)
    sd = {}
    for i, (k, v) in enumerate(flatten_dict(template, sep="/").items()):
        v = np.asarray(v)
        leaf = k.rsplit("/", 1)[-1]
        if "ChannelAffine" in k and leaf == "bias":
            continue
        if "ChannelAffine" in k:   # scale leaf -> synthetic BN quadruple
            C = v.shape[0]
            sd[f"m{i}.weight"] = rng.random(C).astype(np.float32) + 0.5
            sd[f"m{i}.bias"] = rng.standard_normal(C).astype(np.float32)
            sd[f"m{i}.running_mean"] = rng.standard_normal(C).astype(
                np.float32)
            sd[f"m{i}.running_var"] = rng.random(C).astype(np.float32) + 0.3
            sd[f"m{i}.num_batches_tracked"] = np.int64(3)
        elif v.ndim == 4:
            sd[f"m{i}.weight"] = np.transpose(
                rng.standard_normal(v.shape).astype(np.float32) * 0.1,
                (3, 2, 0, 1))
        else:
            key = f"m{i}.bias" if leaf == "bias" else f"m{i}.weight"
            sd[key] = rng.standard_normal(v.shape).astype(np.float32) * 0.1

    buf = BytesIO()
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               buf)
    mfs = scan.get_fileset("models", create=True)
    f = mfs.get_file("torch_bn", create=True)
    f.write_raw(buf.getvalue(), "pt")
    f.set_metadata("label_names", LABELS)
    f.set_metadata("model_config", {"label_names": LABELS,
                                    "widths": [8, 16],
                                    "blocks_per_stage": 1})

    cfg = load_toml(CONFIG)
    cfg["Segmentation2D"] = dict(cfg["Segmentation2D"],
                                 model_id="torch_bn", binarize=False)
    ctx = RunContext(ml_db, "synthetic_ml", cfg)
    run_task(ctx, "Segmentation2D", report=False)
    fs = ctx.scan.get_fileset(ctx.get_task("Segmentation2D").task_id())
    files = fs.get_files()
    n_rgb = len(scan.get_fileset("images").get_files())
    assert len(files) == n_rgb * len(LABELS)
    channels = {f.get_metadata("channel") for f in files}
    assert channels == set(LABELS)
    probs = io.read_image(files[0])
    assert probs.shape == (256, 256)
