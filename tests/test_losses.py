"""Loss/metric oracles.

SSIM is oracle-tested against the reference formulation — the 11x11
sigma-1.5 Gaussian-window depthwise F.conv2d with SAME zero padding
(FluidDynamics/utils/loss_utils.py:33-69, itself pytorch-ssim) — because
the TPU implementation applies the window as banded-Toeplitz MATMULS
(utils/losses.ssim), not a conv.
"""
import math

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fluidnexus_tpu.utils.losses import l1_loss, psnr, ssim


def _torch_ssim(img1, img2, ws=11):
    g = torch.tensor([math.exp(-((x - ws // 2) ** 2) / (2 * 1.5 ** 2))
                      for x in range(ws)])
    g = (g / g.sum()).unsqueeze(1)
    win = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
    c = img1.size(-3)
    win = win.expand(c, 1, ws, ws).contiguous()
    conv = lambda x: F.conv2d(x, win, padding=ws // 2, groups=c)  # noqa: E731
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean().item()


def test_ssim_matches_reference_conv():
    rng = np.random.default_rng(0)
    for shape in [(3, 37, 53), (1, 64, 64), (3, 544 // 8, 960 // 8)]:
        a = rng.random(shape).astype(np.float32)
        b = np.clip(a + 0.1 * rng.normal(size=shape), 0, 1).astype(np.float32)
        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        want = _torch_ssim(torch.tensor(a)[None], torch.tensor(b)[None])
        assert abs(got - want) < 1e-5, (shape, got, want)


def test_ssim_identical_images_is_one():
    rng = np.random.default_rng(1)
    a = rng.random((3, 40, 48)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-5


def test_l1_and_psnr():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.5)
    assert abs(float(l1_loss(a, b)) - 0.5) < 1e-7
    assert abs(float(psnr(a, b)) - 20.0 * math.log10(1 / 0.5)) < 1e-4
