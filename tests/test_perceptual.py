"""Perceptual-similarity (LPIPS-style VGG16) port equivalence.

Oracle: a torch reimplementation of torchvision's vgg16.features + the
reference PNet scoring (evaluate_perceptualsim.py:234-296) run with the SAME
random weights; the JAX port must match feature maps and final scores.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fluidnexus_tpu.utils.perceptual import (  # noqa: E402
    CONV_CH, CONV_IDX, SHIFT, SCALE, SLICE_END, POOL_AFTER,
    compute_perceptual_similarity_from_list, perceptual_sim, random_params,
    vgg16_features)


def _torch_features(params, x):
    """torchvision vgg16.features oracle, layer-by-layer (Sequential indices
    0..29), returning the 5 LPIPS slice taps."""
    h = torch.as_tensor(x, dtype=torch.float32)
    outs = []
    li = 0
    for idx in CONV_IDX:
        while li < idx:
            if li in POOL_AFTER:
                h = torch.nn.functional.max_pool2d(h, 2, 2)
            li += 1
        w = torch.as_tensor(params[f"features.{idx}.weight"])
        b = torch.as_tensor(params[f"features.{idx}.bias"])
        h = torch.nn.functional.relu(torch.nn.functional.conv2d(h, w, b, padding=1))
        li = idx + 2
        if li in SLICE_END:
            outs.append(h)
    return outs


def _torch_pnet_score(params, in0, in1):
    """PNet.forward oracle (:272-293) with cos_sim (:25-37)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    f0 = _torch_features(params, (torch.as_tensor(in0, dtype=torch.float32) - shift) / scale)
    f1 = _torch_features(params, (torch.as_tensor(in1, dtype=torch.float32) - shift) / scale)
    val = 0.0
    for a, b in zip(f0, f1):
        na = a / (a.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
        nb = b / (b.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
        val = val + (1.0 - (na * nb).sum(1).mean(dim=(1, 2)))
    return val.numpy()


def test_vgg16_features_match_torch():
    params = random_params(0)
    x = np.random.default_rng(1).normal(size=(2, 3, 64, 64)).astype(np.float32)
    ours = vgg16_features(params, x)
    ref = _torch_features(params, x)
    assert len(ours) == len(ref) == 5
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4)


def test_perceptual_sim_matches_torch_pnet():
    params = random_params(0)
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (3, 3, 32, 32)).astype(np.float32)
    b = rng.uniform(-1, 1, (3, 3, 32, 32)).astype(np.float32)
    ours = np.asarray(perceptual_sim(a, b, params))
    ref = _torch_pnet_score(params, a, b)
    np.testing.assert_allclose(ours, ref, atol=1e-3)
    # identical images -> (near) zero distance
    zero = np.asarray(perceptual_sim(a, a, params))
    assert np.all(zero < 1e-4)


def test_compute_perceptual_similarity_summary():
    params = random_params(0)
    rng = np.random.default_rng(3)
    pred = [rng.uniform(0, 1, (3, 16, 16)).astype(np.float32) for _ in range(3)]
    tgt = [np.clip(p + rng.normal(0, 0.05, p.shape).astype(np.float32), 0, 1)
           for p in pred]
    out = compute_perceptual_similarity_from_list(pred, tgt, params)
    assert set(out) == {"Perceptual similarity", "PSNR", "SSIM"}
    assert out["PSNR"] > 20 and 0 < out["SSIM"] <= 1
    same = compute_perceptual_similarity_from_list(pred, pred, params)
    assert same["Perceptual similarity"] < out["Perceptual similarity"]
