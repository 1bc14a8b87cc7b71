"""K-nearest-neighbor mean distance — replacement for the ``simple-knn`` CUDA
extension (reference submodules/simple-knn/simple_knn.cu, binding
``distCUDA2`` at spatial.cu:22): per point, the mean SQUARED distance to its 3
nearest neighbors, used to initialize Gaussian scales.

The reference uses a Morton-order space partition; init-time only, so here we
use an exact chunked brute force under ``lax.scan`` — O(N^2) flops but dense
MXU-friendly work with O(N * chunk) memory, plenty fast at the <=200k-point
scales this is called at.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def mean_dist_to_knn(points, alive=None, k: int = 3, chunk: int = 256):
    """Mean squared distance from each point to its k nearest (excl. self).

    points: (N,3). alive: optional (N,) bool mask for padded buffers (dead
    rows are excluded as neighbors and get output 0). Matches distCUDA2
    semantics: result[i] = mean_{j in 3NN(i)} |p_i - p_j|^2.
    """
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    if alive is None:
        alive_p = jnp.arange(n + pad) < n
    else:
        alive_p = jnp.pad(alive, (0, pad))
    n_pad = n + pad

    pts_chunks = pts.reshape(n_pad // chunk, chunk, 3)
    idx_chunks = jnp.arange(n_pad, dtype=jnp.int32).reshape(n_pad // chunk, chunk)

    def body(_, inp):
        rows, ridx = inp
        d2 = jnp.sum((rows[:, None, :] - pts[None, :, :]) ** 2, -1)  # (chunk, N)
        d2 = jnp.where(alive_p[None, :], d2, jnp.inf)
        d2 = jnp.where(ridx[:, None] == jnp.arange(n_pad)[None, :], jnp.inf, d2)
        # k smallest via iterative min extraction (k is tiny)
        total = jnp.zeros((chunk,), jnp.float32)
        for _ in range(k):
            m = jnp.min(d2, axis=1)
            am = jnp.argmin(d2, axis=1)
            total = total + jnp.where(jnp.isfinite(m), m, 0.0)
            d2 = d2.at[jnp.arange(chunk), am].set(jnp.inf)
        return None, total / k

    _, out = jax.lax.scan(body, None, (pts_chunks, idx_chunks))
    out = out.reshape(n_pad)[:n]
    if alive is not None:
        out = jnp.where(alive, out, 0.0)
    return out
