"""UNet model tests: shapes, training step, checkpoint roundtrip."""

import numpy as np

import jax
import jax.numpy as jnp


def test_unet_forward_shape():
    from plant3dvision_tpu.models import create_unet
    model, params = create_unet(jax.random.PRNGKey(0),
                                input_shape=(1, 64, 64, 3),
                                widths=(16, 32), blocks_per_stage=1,
                                n_classes=3)
    logits = model.apply(params, jnp.zeros((2, 64, 64, 3)))
    assert logits.shape == (2, 64, 64, 3)
    assert logits.dtype == jnp.float32


def test_train_step_reduces_loss():
    import optax
    from plant3dvision_tpu.models import create_unet
    from plant3dvision_tpu.parallel import make_mesh, make_train_step
    from plant3dvision_tpu.parallel.train import shard_params

    mesh = make_mesh({"dp": 2})
    model, params = create_unet(jax.random.PRNGKey(0),
                                input_shape=(1, 32, 32, 3),
                                widths=(8, 16), blocks_per_stage=1,
                                n_classes=2)
    opt = optax.adam(1e-2)
    with mesh:
        params = shard_params(params, mesh)
        opt_state = opt.init(params)
        step, shard_batch = make_train_step(model, opt, mesh)
        rng = np.random.default_rng(0)
        # learnable rule: label = 1 where red channel > 0.5
        imgs = rng.random((4, 32, 32, 3)).astype(np.float32)
        labels = (imgs[..., 0] > 0.5).astype(np.int32)
        imgs_d, labels_d = shard_batch(imgs, labels)
        losses = []
        for _ in range(30):
            params, opt_state, loss = step(params, opt_state, imgs_d, labels_d)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.75, losses[::10]


def test_checkpoint_roundtrip(temp_db):
    from plant3dvision_tpu.models import create_unet
    from plant3dvision_tpu.models.checkpoint import load_model, save_model

    model, params = create_unet(jax.random.PRNGKey(1),
                                input_shape=(1, 32, 32, 3),
                                widths=(8, 16), blocks_per_stage=1,
                                n_classes=2)
    scan = temp_db.create_scan("models_scan")
    fs = scan.create_fileset("models")
    f = fs.create_file("tiny")
    save_model(f, params, {"label_names": ["background", "stem"],
                           "widths": [8, 16], "blocks_per_stage": 1})
    model2, params2, config = load_model(f)
    assert config["label_names"] == ["background", "stem"]
    x = jnp.ones((1, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(model.apply(params, x)),
                               np.asarray(model2.apply(params2, x)),
                               atol=1e-6)


def test_segmentation_inference_layout():
    from plant3dvision_tpu.models import create_unet
    from plant3dvision_tpu.models.unet import segmentation_inference
    model, params = create_unet(jax.random.PRNGKey(0),
                                input_shape=(1, 32, 32, 3),
                                widths=(8, 16), blocks_per_stage=1,
                                n_classes=4)
    imgs = (np.random.rand(3, 40, 48, 3) * 255).astype(np.uint8)  # non-mult-32
    probs = segmentation_inference(model, params, imgs, batch_size=2)
    # default output is quantized uint8/255 (transfer-bound links)
    assert probs.shape == (3, 4, 40, 48) and probs.dtype == np.uint8
    np.testing.assert_allclose(probs.astype(np.float32).sum(axis=1) / 255.0,
                               1.0, atol=2.0 / 255.0)
    probs_f = segmentation_inference(model, params, imgs, batch_size=2,
                                     output_dtype="float32")
    assert probs_f.dtype == np.float32
    np.testing.assert_allclose(probs_f.sum(axis=1), 1.0, atol=1e-4)


def test_segmentation_inference_data_parallel():
    """dp-sharded serving (batch over a flat device mesh, params
    replicated) matches the single-device path on the 8-device virtual
    mesh — the production Segmentation2D multi-chip lane (SURVEY §2.4)."""
    from plant3dvision_tpu.models import create_unet
    from plant3dvision_tpu.models.unet import segmentation_inference

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs a multi-device mesh")
    model, params = create_unet(jax.random.PRNGKey(2),
                                input_shape=(1, 32, 32, 3),
                                widths=(8, 16), blocks_per_stage=1,
                                n_classes=4)
    imgs = (np.random.rand(11, 32, 40, 3) * 255).astype(np.uint8)
    ref = segmentation_inference(model, params, imgs, batch_size=4,
                                 data_parallel=False)
    # batch 4 is rounded up to the 8-device multiple internally
    dp = segmentation_inference(model, params, imgs, batch_size=4,
                                data_parallel=True)
    assert dp.shape == ref.shape == (11, 4, 32, 40)
    # batch-axis sharding must not change per-sample math (uint8/255
    # quantization absorbs sub-lsb reduction-order noise)
    np.testing.assert_array_equal(dp, ref)


def test_segmentation_inference_tta():
    """Flip-TTA: valid distribution, and exactly the plain/flipped average
    (both evaluated by the same compiled program)."""
    from plant3dvision_tpu.models import create_unet
    from plant3dvision_tpu.models.unet import segmentation_inference
    model, params = create_unet(jax.random.PRNGKey(0),
                                input_shape=(1, 32, 32, 3),
                                widths=(8, 16), blocks_per_stage=1,
                                n_classes=4)
    imgs = (np.random.rand(2, 32, 48, 3) * 255).astype(np.uint8)
    p = segmentation_inference(model, params, imgs, batch_size=2,
                               output_dtype="float32")
    pf = segmentation_inference(model, params, imgs[:, :, ::-1],
                                batch_size=2, output_dtype="float32")
    t = segmentation_inference(model, params, imgs, batch_size=2,
                               output_dtype="float32", tta=True)
    assert t.shape == p.shape
    np.testing.assert_allclose(t.sum(axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(t, 0.5 * (p + pf[:, :, :, ::-1]),
                               atol=2e-3)


def test_segmentation_inference_int8_lane():
    """Dynamic int8 PTQ serving lane (models/quant.py): same checkpoint,
    every compute conv quantized on the fly (symmetric per-channel
    weights, per-tensor activations, int32 accumulate). Guard: the
    COMMITTED synth checkpoint's predictions agree with the float lane
    even on out-of-domain noise input (the worst case for dynamic
    activation scales — in-domain renders agree tighter)."""
    import pathlib
    from plant3dvision_tpu.models.checkpoint import (
        params_from_npz_bytes, _upcast_f16, model_from_config)
    from plant3dvision_tpu.models.unet import segmentation_inference

    ckpt = pathlib.Path(__file__).parents[2] / "checkpoints" / "unet_seg.npz"
    params, config = params_from_npz_bytes(ckpt.read_bytes())
    params = _upcast_f16(params)
    model = model_from_config(config)

    img = (np.random.RandomState(0).rand(192, 192, 3) * 255).astype(np.uint8)
    kw = dict(batch_size=1, output_dtype="float32", data_parallel=False)
    pf = segmentation_inference(model, params, img[None], conv_mode="bf16", **kw)
    pi = segmentation_inference(model, params, img[None], conv_mode="int8", **kw)
    assert pi.shape == pf.shape
    np.testing.assert_allclose(pi.sum(axis=1), 1.0, atol=1e-4)
    agree = (pf.argmax(1) == pi.argmax(1)).mean()
    assert agree > 0.95, f"int8 argmax agreement {agree:.4f}"
    assert np.abs(pf - pi).mean() < 0.02


def test_torch_state_dict_converter_hermetic():
    """Hermetic converter test (the real romiseg checkpoint is not
    redistributable — reference get_model.sh:10-12): a torch-layout
    state_dict (OIHW conv kernels, torch-style names, shuffled order)
    built from a known flax model must convert back into functionally
    identical params via convert_torch_state_dict."""
    import jax
    from plant3dvision_tpu.models import create_unet
    from plant3dvision_tpu.models.checkpoint import convert_torch_state_dict
    from plant3dvision_tpu.models.unet import segmentation_inference
    from flax.traverse_util import flatten_dict

    model, params = create_unet(jax.random.PRNGKey(1),
                                input_shape=(1, 32, 32, 3),
                                widths=(8, 16), blocks_per_stage=1,
                                n_classes=3)
    # simulate the torch checkpoint: OIHW kernels, torch naming
    # (module-definition order, as torch state dicts guarantee)
    rng = np.random.default_rng(0)
    sd = {}
    for i, (k, v) in enumerate(flatten_dict(params, sep="/").items()):
        v = np.asarray(v)
        if v.ndim == 4:                      # HWIO -> OIHW
            v = np.transpose(v, (3, 2, 0, 1))
        kind = "bias" if k.rsplit("/", 1)[-1] == "bias" else "weight"
        sd[f"encoder.layer{i}.{kind}"] = v

    conv = convert_torch_state_dict(sd, params)
    imgs = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    ref = segmentation_inference(model, params, imgs, batch_size=2,
                                 output_dtype="float32",
                                 compute_dtype="float32")
    got = segmentation_inference(model, conv, imgs, batch_size=2,
                                 output_dtype="float32",
                                 compute_dtype="float32")
    # shape-signature matching can permute same-shaped tensors, but for
    # this architecture (distinct widths per stage) outputs must agree
    np.testing.assert_allclose(got, ref, atol=2e-4)
    # ... and the mapping must be EXACT per leaf, not merely functionally
    # close (VERDICT r3 #5: silent shape-matching must be impossible)
    src = flatten_dict(params, sep="/")
    dst = flatten_dict(conv, sep="/")
    assert set(src) == set(dst)
    for k in src:
        np.testing.assert_array_equal(np.asarray(src[k]), np.asarray(dst[k]),
                                      err_msg=k)


def test_torch_converter_contract_violations():
    """Loud-failure contract (VERDICT r3 #5): square linear weights are
    transposed (never silently passed through), BatchNorm running stats
    refuse strict conversion, bookkeeping counters are dropped, and a
    missing tensor raises naming the param."""
    import pytest
    from flax.traverse_util import flatten_dict
    from plant3dvision_tpu.models.checkpoint import convert_torch_state_dict

    rng = np.random.default_rng(2)

    # square linear: torch (out,in) must come back transposed
    template = {"head": {"kernel": np.zeros((8, 8), np.float32),
                         "bias": np.zeros((8,), np.float32)}}
    w = rng.random((8, 8)).astype(np.float32)
    sd = {"head.weight": w, "head.bias": np.zeros(8, np.float32),
          "head.num_batches_tracked": np.array(7)}
    conv = convert_torch_state_dict(sd, template)
    np.testing.assert_array_equal(
        flatten_dict(conv, sep="/")["head/kernel"], w.T)

    # BatchNorm running stats: strict mode refuses, non-strict warns
    sd_bn = dict(sd)
    sd_bn["bn.running_mean"] = np.zeros(8, np.float32)
    sd_bn["bn.running_var"] = np.ones(8, np.float32)
    with pytest.raises(ValueError, match="running"):
        convert_torch_state_dict(sd_bn, template)
    with pytest.warns(UserWarning, match="dropped"):
        convert_torch_state_dict(sd_bn, template, strict=False)

    # kind gate: a same-shaped norm 'weight' cannot serve a missing bias
    template2 = {"norm": {"scale": np.zeros((8,), np.float32),
                          "bias": np.zeros((8,), np.float32)}}
    with pytest.raises(ValueError, match="norm/bias"):
        convert_torch_state_dict({"norm.weight": np.ones(8, np.float32)},
                                 template2)


def test_tpusegnet_forward_and_checkpoint(temp_db):
    """TPU-shaped seg model: s2d/d2s inverse, full-res logits, arch-tagged
    checkpoint loads back as TPUSegNet (models/segnet.py)."""
    from plant3dvision_tpu.models import create_segnet
    from plant3dvision_tpu.models.checkpoint import load_model, save_model
    from plant3dvision_tpu.models.segnet import (TPUSegNet, depth_to_space,
                                                 space_to_depth)

    x = jnp.arange(2 * 16 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 16, 3)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 4), 4)), np.asarray(x))

    model, params = create_segnet(jax.random.PRNGKey(0),
                                  input_shape=(1, 64, 64, 3),
                                  widths=(16, 32), blocks_per_stage=1,
                                  n_classes=4)
    logits = model.apply(params, jnp.zeros((2, 64, 64, 3)))
    assert logits.shape == (2, 64, 64, 4)
    assert logits.dtype == jnp.float32

    scan = temp_db.create_scan("segnet_scan")
    fs = scan.create_fileset("models")
    f = fs.create_file("tiny_segnet")
    save_model(f, params, {"label_names": ["a", "b", "c", "d"],
                           "arch": "tpusegnet", "widths": [16, 32],
                           "blocks_per_stage": 1, "patch": 4})
    model2, params2, config = load_model(f)
    assert isinstance(model2, TPUSegNet)
    x = jnp.linspace(0, 1, 2 * 64 * 64 * 3).reshape(2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(model.apply(params, x)),
                               np.asarray(model2.apply(params2, x)),
                               atol=1e-5)


def test_tpusegnet_inference_api():
    """segmentation_inference is architecture-generic: works with the
    TPU-shaped model including non-multiple-of-patch crops (padding)."""
    from plant3dvision_tpu.models import create_segnet
    from plant3dvision_tpu.models.unet import segmentation_inference

    model, params = create_segnet(jax.random.PRNGKey(0),
                                  input_shape=(1, 96, 96, 3),
                                  widths=(16, 32), blocks_per_stage=1,
                                  n_classes=3)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (3, 90, 70, 3), dtype=np.uint8)
    probs = segmentation_inference(model, params, imgs, batch_size=2,
                                   output_dtype="float32")
    assert probs.shape == (3, 3, 90, 70)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-3)


def test_training_config_resolution(tmp_path):
    """Trainer preset binding: defaults < [Training] TOML < CLI flags
    (configs/training_seg.toml's [Training] section must actually drive
    the trainer, not just document it)."""
    from plant3dvision_tpu.models.train import resolve_training_config

    toml = tmp_path / "t.toml"
    toml.write_text('[Training]\nepochs = 7\nlearning_rate = 0.5\n'
                    'model_id = "m1"\n')
    cfg = resolve_training_config(str(toml), {"epochs": None, "lr": None,
                                              "model_id": None})
    assert cfg["epochs"] == 7 and cfg["lr"] == 0.5 and cfg["model_id"] == "m1"
    assert cfg["gt_fileset"] == "gt_masks"          # default survives

    cfg = resolve_training_config(str(toml), {"epochs": 3, "lr": None})
    assert cfg["epochs"] == 3 and cfg["lr"] == 0.5  # CLI beats TOML

    # the shipped preset resolves cleanly
    from pathlib import Path
    repo = Path(__file__).resolve().parents[2]
    cfg = resolve_training_config(str(repo / "configs/training_seg.toml"), {})
    assert cfg["epochs"] == 50 and cfg["model_id"] == "Resnet_896_896_epoch50"


def test_training_checkpoint_resume_bit_exact():
    """Intra-run training resume: an interrupted run restored from the
    checkpointed state (params + optimizer moments + RNG) must finish
    BIT-IDENTICAL to the uninterrupted run — the state blob is complete
    iff this holds (same guarantee class as the carve engines' bit-exact
    oracles)."""
    from plant3dvision_tpu.models.train import train

    rng = np.random.default_rng(0)
    images = rng.random((6, 16, 16, 3)).astype(np.float32)
    labels = (rng.random((6, 16, 16)) > 0.8).astype(np.int32)
    names = ["background", "plant"]
    kw = dict(widths=(4, 8), epochs=4, batch_size=2, use_mesh=False,
              log_every=100)

    p_full, _, hist_full = train(images, labels, names, **kw)

    states = {}
    train(images, labels, names, checkpoint_every=2,
          on_checkpoint=lambda blob, ep: states.__setitem__(ep, blob), **kw)
    assert list(states) == [1]  # after epoch 1 only (not at the end)

    p_res, _, hist_res = train(images, labels, names,
                               resume_state=states[1], **kw)

    from flax.traverse_util import flatten_dict
    ff = flatten_dict(p_full, sep="/")
    fr = flatten_dict(p_res, sep="/")
    assert ff.keys() == fr.keys()
    for k in ff:
        np.testing.assert_array_equal(np.asarray(ff[k]), np.asarray(fr[k]),
                                      err_msg=k)
    assert hist_res == hist_full


def test_training_resume_under_mesh():
    """Resume restores numpy leaves onto the live mesh shardings (a
    replicated-recompile would still be correct but slow; this guards
    that the path at least runs and keeps training)."""
    import jax
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs the multi-device CPU mesh")
    from plant3dvision_tpu.models.train import train

    rng = np.random.default_rng(1)
    images = rng.random((4, 16, 16, 3)).astype(np.float32)
    labels = (rng.random((4, 16, 16)) > 0.8).astype(np.int32)
    names = ["background", "plant"]
    kw = dict(widths=(8, 16), epochs=3, batch_size=2, use_mesh=True,
              log_every=100)
    states = {}
    train(images, labels, names, checkpoint_every=1,
          on_checkpoint=lambda blob, ep: states.__setitem__(ep, blob), **kw)
    p_res, _, hist = train(images, labels, names,
                           resume_state=states[1], **kw)
    assert len(hist) == 3 and np.isfinite(hist[-1])


def test_batchnorm_fold_matches_torch_eval():
    """VERDICT r4 #4: a torch Conv/BatchNorm net in eval mode and the
    flax `norm="affine"` mirror loaded via convert_torch_state_dict(
    fold_bn=True) must agree numerically — the running stats fold into
    per-channel affines exactly (gamma/sqrt(var+eps), beta-mean*scale).
    Convs are bias-free as in the reference's ResNet backbone (romiseg
    loads torchvision-style weights, tasks/proc2d.py:336-351)."""
    import torch
    import flax.linen as nn
    from plant3dvision_tpu.models.checkpoint import convert_torch_state_dict
    from plant3dvision_tpu.models.unet import ChannelAffine

    torch.manual_seed(0)
    net = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, padding=1, bias=False),
        torch.nn.BatchNorm2d(8),
        torch.nn.ReLU(),
        torch.nn.Conv2d(8, 4, 3, padding=1, bias=False),
        torch.nn.BatchNorm2d(4),
    )
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias))
                m.running_mean.copy_(torch.randn_like(m.running_mean))
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.3)
    net.eval()

    class Mirror(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(8, (3, 3), padding="SAME", use_bias=False,
                        dtype=jnp.float32)(x)
            h = ChannelAffine(8)(h)
            h = nn.relu(h)
            h = nn.Conv(4, (3, 3), padding="SAME", use_bias=False,
                        dtype=jnp.float32)(h)
            return ChannelAffine(4)(h)

    mirror = Mirror()
    template = mirror.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3), jnp.float32))
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert_torch_state_dict(sd, template, fold_bn=True)

    x = np.random.default_rng(3).random((2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = mirror.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_load_model_torch_pt_batchnorm(temp_db):
    """A torch `.pt` checkpoint WITH BatchNorm running stats loads through
    models fileset -> load_model: the loader folds the stats, builds a
    norm='affine' ResUNet, and serves through segmentation_inference
    (reference model format, tasks/proc2d.py:336-351 + get_model.sh)."""
    import torch
    from io import BytesIO
    from flax.traverse_util import flatten_dict
    from plant3dvision_tpu.models.checkpoint import load_model
    from plant3dvision_tpu.models.unet import ResUNet, segmentation_inference

    labels = ["background", "stem", "fruit"]
    model = ResUNet(n_classes=3, widths=(8, 16), blocks_per_stage=1,
                    norm="affine")
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 3), jnp.float32))

    # synthesize the torch state dict in template traversal order (the
    # converter contract); every affine (scale, bias) pair becomes a BN
    # quadruple whose FOLD equals known (scale, bias) targets
    rng = np.random.default_rng(7)
    eps = 1e-5
    sd = {}
    want = {}
    for i, (k, v) in enumerate(flatten_dict(template, sep="/").items()):
        v = np.asarray(v)
        leaf = k.rsplit("/", 1)[-1]
        if "ChannelAffine" in k and leaf == "bias":
            continue  # emitted with its scale partner
        if "ChannelAffine" in k:  # scale leaf -> BN quadruple
            C = v.shape[0]
            gamma = rng.random(C).astype(np.float32) + 0.5
            beta = rng.standard_normal(C).astype(np.float32)
            mean = rng.standard_normal(C).astype(np.float32)
            var = rng.random(C).astype(np.float32) + 0.3
            sd[f"m{i}.weight"] = gamma
            sd[f"m{i}.bias"] = beta
            sd[f"m{i}.running_mean"] = mean
            sd[f"m{i}.running_var"] = var
            sd[f"m{i}.num_batches_tracked"] = np.int64(11)
            s = gamma / np.sqrt(var + eps)
            want[k.replace("/bias", "/scale")] = s
            want[k.rsplit("/", 1)[0] + "/bias"] = beta - mean * s
        elif v.ndim == 4:
            w = rng.standard_normal(v.shape).astype(np.float32) * 0.1
            sd[f"m{i}.weight"] = np.transpose(w, (3, 2, 0, 1))
            want[k] = w
        else:
            w = rng.standard_normal(v.shape).astype(np.float32) * 0.1
            sd[f"m{i}.bias" if leaf == "bias" else f"m{i}.weight"] = w
            want[k] = w

    buf = BytesIO()
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               buf)
    scan = temp_db.create_scan("torch_models")
    fs = scan.create_fileset("models")
    f = fs.create_file("bn_net")
    f.write_raw(buf.getvalue(), "pt")
    f.set_metadata("label_names", labels)
    f.set_metadata("model_config", {"label_names": labels,
                                    "widths": [8, 16],
                                    "blocks_per_stage": 1})

    model2, params2, config = load_model(f)
    assert config["norm"] == "affine"
    got = flatten_dict(params2, sep="/")
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k], atol=1e-6,
                                   err_msg=k)
    imgs = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    probs = segmentation_inference(model2, params2, imgs, batch_size=2,
                                   output_dtype="float32")
    assert probs.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
