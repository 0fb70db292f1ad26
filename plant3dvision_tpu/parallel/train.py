"""Sharded UNet training step: dp over batch, tp over conv output channels.

XLA inserts the collectives (gradient psum over 'dp', activation/weight
collectives for 'tp') from sharding annotations — no hand-written NCCL-style
code, per the scaling-book recipe: pick a mesh, annotate, let XLA do it.
"""

from __future__ import annotations

import functools

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _param_spec(path, leaf, tp_axis="tp"):
    """Conv kernels (H, W, Cin, Cout): shard Cout over tp. Biases/scales:
    replicate (they're tiny)."""
    if leaf.ndim == 4 and leaf.shape[-1] % 2 == 0:
        return P(None, None, None, tp_axis)
    return P()


def shard_params(params, mesh: Mesh, tp_axis="tp"):
    """Apply NamedShardings to a param pytree."""
    def place(path, leaf):
        spec = _param_spec(path, leaf, tp_axis) if tp_axis in mesh.axis_names else P()
        # drop tp spec if the axis doesn't divide the dim
        if spec != P() and leaf.shape[-1] % mesh.shape[tp_axis] != 0:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def make_train_step(model, optimizer, mesh: Mesh, dp_axis="dp", tp_axis="tp"):
    """Returns (train_step, shard_fn). train_step(params, opt_state, batch)
    -> (params, opt_state, loss). batch = {'image': (B,H,W,3), 'label':
    (B,H,W) int32} sharded over dp.
    """

    def loss_fn(params, images, labels):
        logits = model.apply(params, images)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return ce.mean()

    data_sharding = NamedSharding(mesh, P(dp_axis))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_batch(images, labels):
        return (jax.device_put(images, data_sharding),
                jax.device_put(labels, data_sharding))

    return train_step, shard_batch
