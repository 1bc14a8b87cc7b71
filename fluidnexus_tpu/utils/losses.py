"""Training losses and image metrics.

Behavioral parity with FluidDynamics/utils/loss_utils.py (l1/l2/relative,
11x11 sigma-1.5 Gaussian-window SSIM, particle min-separation penalty,
Hungarian-matching L1, temporal consistency) and utils/image_utils.py (psnr).
JAX re-implementations; SSIM uses depthwise conv with SAME zero padding like
the reference's F.conv2d(padding=ws//2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, gt):
    return jnp.abs(pred - gt).mean()


def l2_loss(pred, gt):
    return ((pred - gt) ** 2).mean()


def relative_loss(pred, gt):
    return jnp.abs((pred - gt) / (gt + 0.001)).mean()


def _gaussian_window(window_size: int, sigma: float):
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


@functools.lru_cache(maxsize=8)
def _blur_matrix(n: int, window_size: int, sigma: float):
    """(n, n) banded Toeplitz blur: (A @ v)[i] = sum_k g[k] v[i + k - ws//2]
    with out-of-range taps dropped — exactly SAME zero padding. Returns
    NUMPY (the lru_cache must never hold a traced value)."""
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    a = np.zeros((n, n), np.float32)
    half = window_size // 2
    for k in range(window_size):
        d = k - half
        idx = np.arange(max(0, -d), min(n, n - d))
        a[idx, idx + d] = g[k]
    return a


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1, img2, window_size: int = 11):
    """SSIM over (C,H,W) images (loss_utils.py:33-69). Returns scalar mean.

    The separable Gaussian window is applied as two banded-Toeplitz MATMULS
    (A_h @ img @ A_w) instead of a depthwise conv: feature-grouped convs
    can't map to the MXU and the r4 recon-step trace pinned each 11x11 conv
    fusion at ~12.8 ms on (2, 3, 544, 960) where the matmul pair is
    FLOP-trivial. Zero SAME padding is encoded in the banded rows, so the
    result is bit-comparable to F.conv2d(padding=ws//2) up to f32
    reassociation."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    h, w = img1.shape[-2], img1.shape[-1]
    ah = _blur_matrix(h, window_size, 1.5)
    aw = _blur_matrix(w, window_size, 1.5)

    def conv(x):
        return jnp.einsum("hH,ncHW,Ww->nchw", ah, x, aw,
                          precision=jax.lax.Precision.HIGHEST)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def psnr(img1, img2):
    """PSNR per image over flattened pixels (image_utils.py:8-10)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def psnr_mask(img1, img2, threshold: float = 0.01):
    """PSNR over pixels where the target has content — channel-sum of img2
    above threshold (image_utils.psnr_mask:13-19). Images (C,H,W)."""
    valid = jnp.sum(img2, axis=0) > threshold
    se = ((img1 - img2) ** 2).mean(0)
    mse = jnp.sum(jnp.where(valid, se, 0.0)) / jnp.maximum(valid.sum(), 1)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def distance_loss(positions, threshold, alive=None):
    """Min-separation penalty: sum of (threshold - d)^2 over pairs closer than
    threshold, excluding self pairs (loss_utils.py:98-121).

    alive masks padded rows of static-capacity buffers (dead rows contribute 0).
    """
    d = jnp.sqrt(jnp.maximum(jnp.sum((positions[:, None] - positions[None, :]) ** 2, -1), 1e-20))
    n = positions.shape[0]
    mask = (d < threshold) & ~jnp.eye(n, dtype=bool)
    if alive is not None:
        mask = mask & alive[:, None] & alive[None, :]
    return jnp.sum((jnp.maximum(threshold - d, 0.0) * mask) ** 2)


def l1_loss_optimal_matching(predictions, ground_truth):
    """Hungarian-matched L1 (loss_utils.py:124-137). Host-side assignment via
    scipy (non-jittable, matching the reference's .cpu() round-trip)."""
    from scipy.optimize import linear_sum_assignment

    cost = jnp.sum(jnp.abs(predictions[:, None] - ground_truth[None, :]), -1)
    rows, cols = linear_sum_assignment(np.asarray(jax.lax.stop_gradient(cost)))
    return cost[rows, cols].sum()


def l2_loss_consistency(predictions, prev_predictions):
    """MSE of the first prev-N particles against their previous values
    (loss_utils.py:140-147)."""
    if prev_predictions is None:
        return jnp.zeros(())
    prev_num = prev_predictions.shape[0]
    return jnp.mean((predictions[:prev_num] - prev_predictions) ** 2)
