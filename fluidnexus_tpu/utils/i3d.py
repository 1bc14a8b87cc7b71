"""Inflated 3D Inception-V1 (I3D) feature network for FVD.

Parity target: Zero123/ldm/modules/evaluate/torch_frechet_video_distance.py
(I3D 400-class Kinetics logits as FVD features) and
frechet_video_distance.py (the TF-hub I3D). This is the standard
InceptionI3d graph (Carreira & Zisserman 2017) implemented as a pure-JAX
forward over a flat parameter dict keyed by the community `pytorch-i3d`
state-dict names (Conv3d_1a_7x7.conv3d.weight, Mixed_3b.b1a.bn.running_mean,
...), so the widely mirrored `rgb_imagenet.pt` / `i3d_torchscript.pt`
checkpoints load directly after a numpy conversion
(`{k: v.numpy() for k, v in torch.load(f).items()}` -> np.savez).

No weights ship in this repo (zero-egress build); `random_params(seed)`
builds a deterministically initialized network so FVD is reproducible and
regression-testable, and becomes numerically comparable to published FVD
numbers the moment real weights are supplied.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3

# (name, out, kernel, stride) for the stem; inception blocks listed below
_STEM = (
    ("Conv3d_1a_7x7", 64, (7, 7, 7), (2, 2, 2)),
    ("Conv3d_2b_1x1", 64, (1, 1, 1), (1, 1, 1)),
    ("Conv3d_2c_3x3", 192, (3, 3, 3), (1, 1, 1)),
)
# name -> (b0, b1a, b1b, b2a, b2b, b3b)
_MIXED = (
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
)
NUM_CLASSES = 400


def _conv(x, w, stride):
    """x NDHWC, w torch-layout (O, I, kT, kH, kW); TF-SAME padding."""
    w = jnp.transpose(jnp.asarray(w, jnp.float32), (2, 3, 4, 1, 0))  # DHWIO
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _unit(p: Dict[str, np.ndarray], prefix: str, x, stride=(1, 1, 1), relu=True):
    x = _conv(x, p[f"{prefix}.conv3d.weight"], stride)
    if f"{prefix}.bn.running_mean" in p:
        mean_np = np.asarray(p[f"{prefix}.bn.running_mean"], np.float32)
        mean = jnp.asarray(mean_np)
        var = jnp.asarray(p[f"{prefix}.bn.running_var"], jnp.float32)
        gamma = jnp.asarray(p.get(f"{prefix}.bn.weight", np.ones_like(mean_np)), jnp.float32)
        beta = jnp.asarray(p.get(f"{prefix}.bn.bias", np.zeros_like(mean_np)), jnp.float32)
        x = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta
    elif f"{prefix}.conv3d.bias" in p:
        x = x + jnp.asarray(p[f"{prefix}.conv3d.bias"], jnp.float32)
    return jax.nn.relu(x) if relu else x


def _max_pool(x, kernel, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) + kernel + (1,), (1,) + stride + (1,), "SAME")


def _mixed(p, name, x):
    b0 = _unit(p, f"{name}.b0", x)
    b1 = _unit(p, f"{name}.b1b", _unit(p, f"{name}.b1a", x))
    b2 = _unit(p, f"{name}.b2b", _unit(p, f"{name}.b2a", x))
    b3 = _unit(p, f"{name}.b3b", _max_pool(x, (3, 3, 3), (1, 1, 1)))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_logits(params: Dict[str, np.ndarray], videos) -> jnp.ndarray:
    """videos (N, T, H, W, 3) in [0, 1] -> Kinetics-400 logits (N, 400).

    Matches the torchscript FVD detector's preprocessing: bilinear resize to
    224x224 and rescale to [-1, 1] (torch_frechet_video_distance.py:66-79)."""
    x = jnp.asarray(videos, jnp.float32)
    n, t, h, w, c = x.shape
    if (h, w) != (224, 224):
        x = jax.image.resize(x, (n, t, 224, 224, c), "bilinear")
    x = x * 2.0 - 1.0

    x = _unit(params, "Conv3d_1a_7x7", x, (2, 2, 2))
    x = _max_pool(x, (1, 3, 3), (1, 2, 2))
    x = _unit(params, "Conv3d_2b_1x1", x)
    x = _unit(params, "Conv3d_2c_3x3", x)
    x = _max_pool(x, (1, 3, 3), (1, 2, 2))
    x = _mixed(params, "Mixed_3b", x)
    x = _mixed(params, "Mixed_3c", x)
    x = _max_pool(x, (3, 3, 3), (2, 2, 2))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _mixed(params, name, x)
    x = _max_pool(x, (2, 2, 2), (2, 2, 2))
    x = _mixed(params, "Mixed_5b", x)
    x = _mixed(params, "Mixed_5c", x)

    # global average pool over (2,7,7) windows = full spatial at 224 input,
    # then the 1x1x1 logits conv and temporal mean (pytorch-i3d logits head)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 7, 7, 1), (1, 1, 1, 1, 1), "VALID") / (2 * 7 * 7)
    x = _unit(params, "logits", x, relu=False)
    return x.mean(axis=(1, 2, 3))


def _branch_channels(in_ch: int, spec) -> Sequence[Tuple[str, int, int, Tuple[int, int, int]]]:
    b0, b1a, b1b, b2a, b2b, b3b = spec
    return (("b0", in_ch, b0, (1, 1, 1)), ("b1a", in_ch, b1a, (1, 1, 1)),
            ("b1b", b1a, b1b, (3, 3, 3)), ("b2a", in_ch, b2a, (1, 1, 1)),
            ("b2b", b2a, b2b, (3, 3, 3)), ("b3b", in_ch, b3b, (1, 1, 1)))


def random_params(seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic random init with the exact checkpoint key layout —
    substitutes for real Kinetics weights in tests/regression tracking."""
    rng = np.random.default_rng(seed)
    p: Dict[str, np.ndarray] = {}

    def unit(prefix, cin, cout, k):
        fan_in = cin * int(np.prod(k))
        p[f"{prefix}.conv3d.weight"] = rng.normal(
            0, 1.0 / np.sqrt(fan_in), (cout, cin) + tuple(k)).astype(np.float32)
        p[f"{prefix}.bn.running_mean"] = np.zeros(cout, np.float32)
        p[f"{prefix}.bn.running_var"] = np.ones(cout, np.float32)
        p[f"{prefix}.bn.weight"] = np.ones(cout, np.float32)
        p[f"{prefix}.bn.bias"] = np.zeros(cout, np.float32)

    cin = 3
    for name, cout, k, _ in _STEM:
        unit(name, cin, cout, k)
        cin = cout
    for name, spec in _MIXED:
        for bname, bc_in, bc_out, k in _branch_channels(cin, spec):
            unit(f"{name}.{bname}", bc_in, bc_out, k)
        cin = spec[0] + spec[2] + spec[4] + spec[5]
    p["logits.conv3d.weight"] = rng.normal(
        0, 1.0 / np.sqrt(cin), (NUM_CLASSES, cin, 1, 1, 1)).astype(np.float32)
    p["logits.conv3d.bias"] = np.zeros(NUM_CLASSES, np.float32)
    return p


def load_params(path: str) -> Dict[str, np.ndarray]:
    """Load an I3D checkpoint: .npz (converted) or a torch .pt state dict."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}
