"""Non-rigid point set registration (Coherent Point Drift EM).

Role of the reference's `skeleton_refinement.perform_registration`
(tasks/proc3d.py:623-631): deform skeleton nodes onto the point cloud.
The EM inner loop is pure matrix algebra — ideal for the MXU — and runs as
a single jitted lax.while_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(Y, beta):
    d2 = jnp.sum((Y[:, None, :] - Y[None, :, :]) ** 2, axis=-1)
    return jnp.exp(-d2 / (2.0 * beta ** 2))


@functools.partial(jax.jit, static_argnames=("max_iterations",))
def _cpd_loop(X, Y, alpha, beta, w, max_iterations, tolerance):
    N, D = X.shape
    M = Y.shape[0]
    G = _gaussian_kernel(Y, beta)
    sigma2_0 = jnp.sum((X[None, :, :] - Y[:, None, :]) ** 2) / (D * M * N)

    def cond(state):
        it, sigma2, prev_sigma2, W = state
        # the sigma2 floor doubles as a hard stop: one more E-step at a
        # collapsed sigma2 zeroes every responsibility and snaps W back
        # to 0 (observed on TPU where the contraction overshoots)
        return jnp.logical_and(
            jnp.logical_and(it < max_iterations, sigma2 > 1e-8),
            jnp.abs(prev_sigma2 - sigma2) > tolerance)

    def body(state):
        it, sigma2, _, W = state
        TY = Y + G @ W
        d2 = jnp.sum((X[None, :, :] - TY[:, None, :]) ** 2, axis=-1)  # (M, N)
        num = jnp.exp(-d2 / (2.0 * sigma2))
        c = (2.0 * jnp.pi * sigma2) ** (D / 2.0) * (w / (1.0 - w)) * (M / N)
        # + tiny: a target point far from every node underflows the whole
        # num column to 0 in f32 — den=0 made P=0/0=NaN (hit on TPU once
        # sigma2 contracts); with the floor such orphans get P=0 instead
        den = jnp.sum(num, axis=0, keepdims=True) + c + 1e-30
        P = num / den
        P1 = jnp.sum(P, axis=1)            # (M,)
        Np = jnp.maximum(jnp.sum(P1), 1e-10)
        PX = P @ X                          # (M, D)
        # ridge floor keeps the solve well-posed when sigma2 bottoms out
        A = (G * P1[:, None]
             + jnp.maximum(alpha * sigma2, 1e-6) * jnp.eye(M))
        B = PX - P1[:, None] * Y
        W_new = jnp.linalg.solve(A, B)
        TY = Y + G @ W_new
        xPx = jnp.sum(jnp.sum(P, axis=0) * jnp.sum(X * X, axis=1))
        yPy = jnp.sum(P1 * jnp.sum(TY * TY, axis=1))
        trPXY = jnp.sum(TY * (P @ X))
        sigma2_new = jnp.maximum((xPx - 2 * trPXY + yPy) / (Np * D), 1e-9)
        return (it + 1, sigma2_new, sigma2, W_new)

    init = (jnp.int32(0), sigma2_0, sigma2_0 + 2 * tolerance + 1.0,
            jnp.zeros((M, D), X.dtype))
    _, _, _, W = jax.lax.while_loop(cond, body, init)
    return Y + G @ W


def cpd_nonrigid(target_points, source_points, alpha=5.0, beta=5.0,
                 max_iterations=100, tolerance=1e-4, w=0.0,
                 max_target_points=20000, seed=0):
    """Deform `source_points` (skeleton) onto `target_points` (point cloud).

    Returns the deformed source points as numpy (M, 3).
    """
    X = np.asarray(target_points, dtype=np.float32)
    Y = np.asarray(source_points, dtype=np.float32)
    if len(X) > max_target_points:
        rng = np.random.default_rng(seed)
        X = X[rng.choice(len(X), max_target_points, replace=False)]
    # full-f32 matmuls: the EM trajectory (sigma2 contraction) is
    # sensitive to the TPU's default bf16 matmul precision, and the
    # matrices here are tiny
    with jax.default_matmul_precision("float32"):
        out = _cpd_loop(jnp.asarray(X), jnp.asarray(Y), float(alpha),
                        float(beta), float(w), int(max_iterations),
                        float(tolerance))
    return np.asarray(out, dtype=np.float64)
