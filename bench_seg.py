"""Segmentation2D inference throughput benchmark (driver-visible artifact).

Measures the 896x896 organ-segmentation CNN forward (the reference's
romiseg hot path, tasks/proc2d.py:328-351) in images/s on the current JAX
backend, scalar-forced steady-state timing (a result scalar is pulled to
the host every iteration so device queueing cannot inflate the number —
see CLAUDE.md). Compute-only protocol: the batch is device-resident, as
in the production FusedSegmentationCarving path where probabilities never
leave the device (the axon tunnel here moves 2-30 MB/s, so a
transfer-inclusive number would measure the relay, not the TPU).

Prints ONE JSON line and appends the result to SEG_BENCH.json with a
backend stamp.

Usage: python bench_seg.py [--batch 8] [--size 896] [--steps 5]
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=896)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--conv-mode", default="bf16", choices=["bf16", "int8"],
                    help="int8 = dynamic PTQ conv lane (models/quant.py)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--checkpoint",
                    default=str(REPO / "checkpoints/unet_seg.npz"))
    ap.add_argument("--out", default=str(REPO / "SEG_BENCH.json"))
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from plant3dvision_tpu.models import create_unet
    from plant3dvision_tpu.models.checkpoint import (_upcast_f16,
                                                     model_from_config,
                                                     params_from_npz_bytes)

    ckpt = Path(args.checkpoint)
    if ckpt.exists():
        params, config = params_from_npz_bytes(ckpt.read_bytes())
        params = _upcast_f16(params)
        model = model_from_config(config)
        src = "checkpoint"
    else:
        model, params = create_unet(jax.random.PRNGKey(0),
                                    input_shape=(1, args.size, args.size, 3))
        config = {"widths": [64, 128, 256, 512]}
        src = "random-params"

    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, params)
    params = jax.device_put(params)   # else numpy params re-upload per call

    if args.conv_mode == "int8":
        from plant3dvision_tpu.models.quant import int8_conv_general_dilated
        model = model.clone(conv_impl=int8_conv_general_dilated)

    @jax.jit
    def fwd(p, x):
        logits = model.apply(p, x.astype(jnp.bfloat16) / 255.0)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        # (B, C, H, W) on device, like the production inference path:
        # NHWC would materialize a 21x lane-padded output buffer
        probs = probs.transpose(0, 3, 1, 2)
        # scalar pull forces real completion through the tunnel
        return probs, probs.mean()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (args.batch, args.size, args.size, 3),
                                 dtype=np.uint8))
    t0 = time.perf_counter()
    _, s = fwd(params, x)
    float(s)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        _, s = fwd(params, x)
        float(s)                       # scalar-forced
        times.append(time.perf_counter() - t0)
    best = min(times)
    img_s = args.batch / best

    entry = {
        "images_per_s": round(img_s, 2),
        "batch": args.batch,
        "size": args.size,
        "dtype": "bfloat16" if args.conv_mode == "bf16" else "int8-ptq",
        "min_step_s": round(best, 4),
        "median_step_s": round(float(np.median(times)), 4),
        "compile_s": round(compile_s, 1),
        "params_source": src,
        "arch": config.get("arch", "resunet"),
        "widths": config.get("widths"),
        "protocol": "device-resident batch, softmax included, "
                    "scalar-forced, min of %d" % args.steps,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "captured": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    out = Path(args.out)
    hist = json.loads(out.read_text()) if out.exists() else []
    hist.append(entry)
    out.write_text(json.dumps(hist, indent=2) + "\n")
    print(json.dumps({"metric": "seg_inference", "value": entry["images_per_s"],
                      "unit": "img/s", "backend": entry["backend"]}))


if __name__ == "__main__":
    main()
