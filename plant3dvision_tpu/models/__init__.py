"""Neural models (Flax): the 2D organ-segmentation CNN family.

Role of the reference's `romiseg` submodule (PyTorch ResNet-UNet, 896x896,
labels {background, flower, fruit, leaf, pedicel, stem} — reference
tasks/proc2d.py:329-393). TPU-first: bf16 matmuls/convs, static shapes,
batched inference, dp+tp shardable training step (parallel/train.py).
"""

from .unet import ResUNet, SEGMENTATION_LABELS, create_unet

__all__ = ["ResUNet", "SEGMENTATION_LABELS", "create_unet"]
