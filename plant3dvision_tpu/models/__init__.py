"""Neural models (Flax): the 2D organ-segmentation CNN family.

Role of the reference's `romiseg` submodule (PyTorch ResNet-UNet, 896x896,
labels {background, flower, fruit, leaf, pedicel, stem} — reference
tasks/proc2d.py:329-393). TPU-first: bf16 matmuls/convs, static shapes,
batched inference, dp+tp shardable training step (parallel/train.py).
"""

from .unet import ResUNet, SEGMENTATION_LABELS, create_unet
from .segnet import TPUSegNet, create_segnet

__all__ = ["ResUNet", "TPUSegNet", "SEGMENTATION_LABELS", "create_unet",
           "create_segnet", "segmentation"]


def segmentation(Sx, Sy, image_files, model_file, batch_size=4):
    """Functional API mirroring the reference romiseg call
    (`Segmentation2D.segmentation(Sx, Sy, images, model)`,
    reference tasks/proc2d.py:351): center-crops each image File to
    (Sy, Sx), runs batched inference, returns
    ((N, n_labels, Sy, Sx) float32 probabilities, label_names).
    """
    import numpy as np
    from ..fsdb import io
    from .checkpoint import load_model
    from .unet import segmentation_inference

    model, params, config = load_model(model_file)
    labels = config.get("label_names")
    imgs = []
    for f in image_files:
        img = io.read_image(f)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        H, W = img.shape[:2]
        y0 = max((H - Sy) // 2, 0)
        x0 = max((W - Sx) // 2, 0)
        imgs.append(img[y0: y0 + Sy, x0: x0 + Sx, :3])
    probs = segmentation_inference(model, params, np.stack(imgs),
                                   batch_size=batch_size)
    if probs.dtype == np.uint8:       # quantized transfer (unet.py)
        probs = probs.astype(np.float32) / 255.0
    return probs, labels
