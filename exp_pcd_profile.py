"""Profile: ML-route multiclass PointCloud at the 0.25 mm north-star grid
(VERDICT r4 #5 — the 29.7 s stage).

Synthesizes a north-star-scale multiclass score-volume set directly on
device (no scan/CNN needed: the PointCloud stage only sees volumes),
then times the stage's two halves:

- ops.multiclass.multiclass_select (one device program)
- proc3d.vol2pcd per organ label (EDT + band compaction + band pull)

and prints the band sizes + bytes pulled, so the link-time share is
explicit. Run on the real TPU.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

import jax
import jax.numpy as jnp


def build_volumes(shape=(480, 480, 880)):
    """Plant-like multiclass score volumes, built ON DEVICE: a stem
    cylinder + fruit capsules, scores in [0, 1] like the averaging
    route's exp volumes."""
    nx, ny, nz = shape

    @jax.jit
    def make():
        x = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        y = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
        z = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
        cx, cy = nx / 2.0, ny / 2.0
        r2 = (x - cx) ** 2 + (y - cy) ** 2
        stem = jnp.exp(-r2 / (2 * 12.0 ** 2)) * (z < nz * 0.9)
        fruit = jnp.zeros(shape, jnp.float32)
        for i in range(12):
            a = 2.39996 * i
            fz = nz * (0.15 + 0.06 * i)
            fx = cx + (40 + 6 * i) * np.cos(a)
            fy = cy + (40 + 6 * i) * np.sin(a)
            d2 = ((x - fx) ** 2 + (y - fy) ** 2 + (z - fz) ** 2)
            fruit = jnp.maximum(fruit, jnp.exp(-d2 / (2 * 10.0 ** 2)))
        stem = jnp.clip(stem * 1.4, 0, 1)
        fruit = jnp.clip(fruit * 1.4, 0, 1)
        bg = jnp.clip(1.0 - jnp.maximum(stem, fruit), 0, 1)
        return {"background": bg, "stem": stem, "fruit": fruit}

    vols = make()
    jax.block_until_ready(vols)
    return vols


def main():
    from plant3dvision_tpu import proc3d
    from plant3dvision_tpu.ops.multiclass import multiclass_select

    shape = (480, 480, 880)
    print(f"device: {jax.devices()[0]}; grid {shape} = "
          f"{np.prod(shape) / 1e6:.0f} M voxels x 3 labels")
    vols = build_volumes(shape)
    labels = list(vols.keys())

    for rep in range(3):
        t0 = time.perf_counter()
        selected = multiclass_select(vols, labels, background_prior=1.0,
                                     min_contrast=10.0, min_score=0.2)
        jax.block_until_ready(selected)
        t_sel = time.perf_counter() - t0

        t_pcd = {}
        pts = {}
        for l in labels:
            if l == "background":
                continue
            t0 = time.perf_counter()
            out = proc3d.vol2pcd(selected[l], np.zeros(3), 0.25, 1.0)
            t_pcd[l] = time.perf_counter() - t0
            pts[l] = len(out)
        total = t_sel + sum(t_pcd.values())
        print(f"pass {rep}: select {t_sel:.2f}s; "
              + "; ".join(f"{l} vol2pcd {t_pcd[l]:.2f}s ({pts[l]} pts)"
                          for l in t_pcd)
              + f"; TOTAL {total:.2f}s")


if __name__ == "__main__":
    main()
