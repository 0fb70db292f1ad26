"""UNet training pipeline (role of the reference's romiseg training,
configs/training_seg.toml): train the organ segmenter on labeled scans
(images + per-label mask filesets) with the dp x tp sharded step.

CLI:
    python -m plant3dvision_tpu.models.train <db>/<scan> \
        --gt-fileset gt_masks --epochs 20 --out-scan models
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..runtime.log import configure_logger

logger = configure_logger(__name__)


def load_dataset(scan, gt_fileset="gt_masks", labels=None, max_images=None):
    """Stack (images, int labels) from a scan's images + GT mask filesets."""
    from ..fsdb import io

    images_fs = scan.get_fileset("images")
    gt_fs = scan.get_fileset(gt_fileset)
    if labels is None:
        labels = gt_fs.get_metadata("label_names")
    imgs, labs = [], []
    files = images_fs.get_files()
    if max_images:
        files = files[:max_images]
    for f in files:
        img = io.read_image(f)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        shot = f.get_metadata("shot_id")
        lab = np.zeros(img.shape[:2], np.int32)
        for li, name in enumerate(labels):
            if name == "background":
                continue
            for g in gt_fs.get_files({"shot_id": shot, "channel": name}):
                lab[io.read_image(g) > 0] = li
        imgs.append(img[..., :3].astype(np.float32) / 255.0)
        labs.append(lab)
    return np.stack(imgs), np.stack(labs), list(labels)


def train(images, labels_int, label_names, widths=(32, 64, 128),
          blocks_per_stage=1, epochs=20, batch_size=4, lr=3e-3, seed=0,
          use_mesh=True, log_every=10,
          checkpoint_every=0, on_checkpoint=None, resume_state=None):
    """Train a ResUNet; returns (params, config, history).

    Intra-run checkpoint/resume (the task-level resume of the runtime is
    fileset-granular; a long training run needs finer grain):
    every `checkpoint_every` epochs, `on_checkpoint(state_bytes, epoch)`
    receives the full serialized training state (params + optimizer
    moments + epoch + numpy RNG state). Pass such a blob back as
    `resume_state` to continue: the RNG state replays the exact same
    batch order, so an interrupted-and-resumed run is BIT-IDENTICAL to
    an uninterrupted one (guarded in tests/unit/test_models.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from . import create_unet
    from .checkpoint import (training_state_from_npz_bytes,
                             training_state_to_npz_bytes)
    from ..parallel import make_mesh
    from ..parallel.mesh import best_dp_tp
    from ..parallel.train import shard_params

    n, H, W, _ = images.shape
    model, params = create_unet(jax.random.PRNGKey(seed),
                                input_shape=(1, H, W, 3),
                                widths=tuple(widths),
                                blocks_per_stage=blocks_per_stage,
                                n_classes=len(label_names))
    optimizer = optax.adamw(lr)

    # class weights (plants cover ~1% of pixels)
    freq = np.bincount(labels_int.ravel(), minlength=len(label_names)).astype(float)
    w = freq.sum() / np.maximum(freq, 1.0)
    w = jnp.asarray(w / w.sum() * len(label_names), jnp.float32)

    devices = jax.devices()
    if use_mesh and len(devices) > 1:
        mesh = make_mesh(best_dp_tp(len(devices)))
        ctx = mesh
    else:
        mesh = None
        import contextlib
        ctx = contextlib.nullcontext()

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ce * w[y]).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    rng = np.random.default_rng(seed)
    start_epoch = 0
    with ctx:
        if mesh is not None:
            params = shard_params(params, mesh)
        opt_state = optimizer.init(params)
        if resume_state is not None:
            r_params, r_opt, meta = training_state_from_npz_bytes(
                resume_state, opt_state)

            # restore onto the live templates' MESH shardings (numpy
            # leaves otherwise force a replicated recompile); leaves with
            # single-device shardings (e.g. the optax step count) stay
            # uncommitted — device_put would pin them to one device and
            # conflict with the mesh-committed params inside jit
            def _restore_leaf(t, a):
                arr = jnp.asarray(a)
                sh = getattr(t, "sharding", None)
                if isinstance(sh, jax.sharding.NamedSharding):
                    return jax.device_put(arr, sh)
                return arr

            params = jax.tree.map(_restore_leaf, params, r_params)
            opt_state = jax.tree.map(_restore_leaf, opt_state, r_opt)
            rng.bit_generator.state = meta["rng_state"]
            start_epoch = int(meta["epoch"]) + 1
            history = list(meta.get("history", []))
            logger.info(f"resumed training at epoch {start_epoch}")
        steps_per_epoch = max(n // batch_size, 1)
        for epoch in range(start_epoch, epochs):
            order = rng.permutation(n)
            for s in range(steps_per_epoch):
                sel = order[s * batch_size:(s + 1) * batch_size]
                if len(sel) < batch_size:
                    sel = np.concatenate([sel, order[: batch_size - len(sel)]])
                params, opt_state, loss = step(params, opt_state,
                                               jnp.asarray(images[sel]),
                                               jnp.asarray(labels_int[sel]))
            history.append(float(loss))
            if epoch % log_every == 0 or epoch == epochs - 1:
                logger.info(f"epoch {epoch}: loss={float(loss):.4f}")
            if (checkpoint_every and on_checkpoint is not None
                    and (epoch + 1) % checkpoint_every == 0
                    and epoch + 1 < epochs):
                meta = {"epoch": epoch,
                        "rng_state": rng.bit_generator.state,
                        "history": history}
                on_checkpoint(
                    training_state_to_npz_bytes(params, opt_state, meta),
                    epoch)

    config = {"label_names": label_names, "widths": list(widths),
              "blocks_per_stage": blocks_per_stage}
    return params, config, history


def resolve_training_config(config_path, cli_args):
    """Merge defaults < [Training] TOML section < explicit CLI flags
    (the reference binds its training preset the same way,
    configs/training_seg.toml)."""
    cfg = {"gt_fileset": "gt_masks", "epochs": 20, "batch_size": 4,
           "lr": 3e-3, "widths": "32,64,128", "model_id": "unet_seg",
           "max_images": None, "checkpoint_every": None}
    if config_path:
        from ..runtime.config import load_toml
        section = dict(load_toml(config_path).get("Training", {}))
        if "learning_rate" in section:
            section.setdefault("lr", section.pop("learning_rate"))
        cfg.update({k: v for k, v in section.items()
                    if k in cfg and v is not None})
    for k in cfg:
        v = cli_args.get(k)
        if v is not None:
            cfg[k] = v
    return cfg


def main(argv=None):
    from ..fsdb import FSDB
    from ..runtime.cli import parse_dataset
    from .checkpoint import save_model

    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="<db>/<scan> with images + GT masks")
    ap.add_argument("--config", default=None,
                    help="TOML preset with a [Training] section "
                         "(configs/training_seg.toml); CLI flags override")
    ap.add_argument("--gt-fileset", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--widths", default=None)
    ap.add_argument("--model-id", default=None)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--checkpoint-every", type=int, default=None,
                    help="save full training state every N epochs into "
                         "the models fileset; an interrupted run resumes "
                         "from the last state automatically")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore any existing training state")
    args = ap.parse_args(argv)

    cfg = resolve_training_config(args.config, vars(args))
    args.gt_fileset, args.model_id = cfg["gt_fileset"], cfg["model_id"]
    args.epochs, args.batch_size = int(cfg["epochs"]), int(cfg["batch_size"])
    args.lr, args.widths = float(cfg["lr"]), str(cfg["widths"])
    args.max_images = cfg.get("max_images")
    ckpt_every = int(cfg.get("checkpoint_every") or 0)

    db_path, scan_id = parse_dataset(args.dataset)
    db = FSDB(db_path)
    db.connect(unsafe=True)
    scan = db.get_scan(scan_id)
    images, labels_int, label_names = load_dataset(
        scan, args.gt_fileset, max_images=args.max_images)
    logger.info(f"dataset: {images.shape}, labels {label_names}")
    widths = tuple(int(x) for x in args.widths.split(","))

    models_fs = scan.get_fileset("models", create=True)
    state_id = f"{args.model_id}_trainstate"
    resume_state = None
    if not args.fresh:
        sf = models_fs.get_file(state_id)
        if sf is not None:
            resume_state = sf.read_raw()
            logger.info(f"found training state '{state_id}' — resuming")

    def on_checkpoint(blob, epoch):
        f = models_fs.get_file(state_id, create=True)
        f.write_raw(blob, "npz")
        f.set_metadata("epoch", epoch)
        logger.info(f"checkpointed training state at epoch {epoch}")

    params, config, history = train(
        images, labels_int, label_names, widths=widths, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr,
        checkpoint_every=ckpt_every,
        on_checkpoint=on_checkpoint if ckpt_every else None,
        resume_state=resume_state)
    f = models_fs.get_file(args.model_id, create=True)
    save_model(f, params, config)
    if models_fs.get_file(state_id) is not None:
        models_fs.delete_file(state_id)  # completed — state is stale now
    logger.info(f"saved model '{args.model_id}' (final loss {history[-1]:.4f})")
    db.disconnect()
    return 0


if __name__ == "__main__":
    sys.exit(main())
