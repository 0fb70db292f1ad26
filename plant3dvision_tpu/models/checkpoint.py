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

    Checkpoints may be stored float16 (train_synth saves them halved);
    params are upcast to float32 here — the model casts to bfloat16
    internally for the MXU path."""
    params, config = params_from_npz_bytes(file.read_raw())
    params = _upcast_f16(params)
    return model_from_config(config), params, config


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
        blocks_per_stage=int(config.get("blocks_per_stage", 2)))


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


def convert_torch_state_dict(state_dict, param_template, strict=True):
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
      target can't absorb them — retrain or distill instead). Pass
      strict=False to drop leftovers with a warning.

    Returns a params pytree shaped like `param_template`.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

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
                "retrain/distill, or pass strict=False to drop it")
        import warnings
        warnings.warn(f"convert_torch_state_dict: dropped {len(leftovers)} "
                      f"unmatched torch tensors, e.g. {leftovers[:4]}")
    return unflatten_dict({tuple(k.split("/")): v for k, v in out.items()})
