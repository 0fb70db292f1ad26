"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axis_shapes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh from {'axis': size}. Default: all devices on 'dp'."""
    devices = devices if devices is not None else jax.devices()
    if axis_shapes is None:
        axis_shapes = {"dp": len(devices)}
    names = tuple(axis_shapes.keys())
    shape = tuple(axis_shapes.values())
    n = int(np.prod(shape))
    if n != len(devices):
        devices = devices[:n]
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, names)


def best_dp_tp(n_devices: int) -> dict[str, int]:
    """Split devices into a (dp, tp) mesh: tp gets the largest power-of-two
    factor <= 4 (channel sharding has limited win for conv nets)."""
    tp = 1
    for cand in (4, 2):
        if n_devices % cand == 0:
            tp = cand
            break
    return {"dp": n_devices // tp, "tp": tp}
