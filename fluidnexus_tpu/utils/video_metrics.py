"""Offline video/image evaluation metrics.

Parity role: Zero123/ldm/modules/evaluate/{ssim.py, frechet_video_distance.py,
torch_frechet_video_distance.py, evaluate_perceptualsim.py} — SSIM lives in
utils/losses.py; this module provides the Fréchet-distance machinery.

The reference FVD uses an I3D network's features; pretrained I3D weights are
not shippable here, so `frechet_distance` takes a pluggable `feature_fn`
(plug an I3D/VideoMAE embedder when weights are available). The default
`pixel_feature_fn` (blurred downsampled pixel statistics per clip) gives a
deterministic, weight-free distributional distance useful for regression
tracking; it is NOT numerically comparable to published FVD values.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


def pixel_feature_fn(videos, grid: int = 8):
    """videos: (N, T, H, W, C) in [0,1] -> (N, D) mean/std pooled features."""
    v = jnp.asarray(videos, jnp.float32)
    n, t, h, w, c = v.shape
    v = jax.image.resize(v, (n, t, grid, grid, c), "linear")
    mean_t = v.mean(1).reshape(n, -1)
    std_t = v.std(1).reshape(n, -1)
    return jnp.concatenate([mean_t, std_t], -1)


def _sqrtm_psd(mat):
    """Matrix square root of a symmetric PSD matrix via eigendecomposition.
    Negative eigenvalues (numerical noise on rank-deficient inputs) clip to
    zero — adding a floor instead injects O(dim * sqrt(floor)) trace error."""
    w, v = np.linalg.eigh(mat)
    return (v * np.sqrt(np.clip(w, 0, None))) @ v.T


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """Fréchet distance between Gaussian fits of two feature sets —
    the FVD/FID formula: |mu_a-mu_b|^2 + tr(Sa + Sb - 2 (Sa Sb)^{1/2})."""
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    mu_a, mu_b = a.mean(0), b.mean(0)
    sa = np.cov(a, rowvar=False) + 1e-8 * np.eye(a.shape[1])
    sb = np.cov(b, rowvar=False) + 1e-8 * np.eye(b.shape[1])
    sqrt_ab = _sqrtm_psd(_sqrtm_psd(sa) @ sb @ _sqrtm_psd(sa))
    # the analytic distance is >= 0; tiny negatives are eigensolver noise on
    # rank-deficient covariances (few clips, many features)
    return float(max(0.0, np.sum((mu_a - mu_b) ** 2) + np.trace(sa + sb - 2 * sqrt_ab)))


def frechet_video_distance(videos_a, videos_b,
                           feature_fn: Optional[Callable] = None,
                           i3d_ckpt: Optional[str] = None) -> float:
    """FVD-style distance between two sets of clips (N,T,H,W,C in [0,1]).

    Pass ``i3d_ckpt`` (path to a pytorch-i3d checkpoint) or
    ``feature_fn=i3d_feature_fn(...)`` for real I3D-feature FVD; the default
    pixel features are a weight-free stand-in (see module docstring)."""
    if i3d_ckpt and feature_fn is None:
        feature_fn = i3d_feature_fn(ckpt_path=i3d_ckpt)
    fn = feature_fn or pixel_feature_fn
    return frechet_distance(np.asarray(fn(videos_a)), np.asarray(fn(videos_b)))


def perceptual_similarity(img_a, img_b, feature_fn: Optional[Callable] = None) -> float:
    """Feature-space L2 between two images (evaluate_perceptualsim parity
    shape; plug a VGG/CLIP feature_fn for LPIPS-class numbers)."""
    if feature_fn is None:
        feature_fn = lambda x: pixel_feature_fn(x[:, None])
    fa = np.asarray(feature_fn(np.asarray(img_a)[None]))
    fb = np.asarray(feature_fn(np.asarray(img_b)[None]))
    return float(np.sqrt(((fa - fb) ** 2).sum()))


def i3d_feature_fn(i3d_params=None, batch: int = 8,
                   ckpt_path: Optional[str] = None) -> Callable:
    """Kinetics-I3D logits as FVD features — the reference detector
    (torch_frechet_video_distance.py:60-100). Pass a loaded param dict OR
    ``ckpt_path`` (pytorch-i3d .pt state dict / converted .npz —
    utils.i3d.load_params) for numbers comparable to published FVD; with
    neither, a deterministic random I3D (regression tracking only)."""
    from fluidnexus_tpu.utils import i3d as i3d_mod
    from fluidnexus_tpu.utils.i3d import i3d_logits

    if i3d_params is None:
        i3d_params = i3d_mod.load_params(ckpt_path) if ckpt_path else i3d_mod.random_params(0)
    fwd = jax.jit(lambda v: i3d_logits(i3d_params, v))

    def fn(videos):
        v = np.asarray(videos, np.float32)
        outs = [np.asarray(fwd(v[i:i + batch])) for i in range(0, len(v), batch)]
        return np.concatenate(outs, 0)

    return fn


def fvd_i3d(videos_a, videos_b, i3d_params) -> float:
    """Real FVD: Frechet distance over I3D Kinetics-400 logits
    (frechet_video_distance.py / torch_frechet_video_distance.py parity)."""
    return frechet_video_distance(videos_a, videos_b,
                                  feature_fn=i3d_feature_fn(i3d_params))
