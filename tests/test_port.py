"""Torch->flax layout converters verified by forward equivalence."""
import numpy as np

from fluidnexus_tpu.diffusion.port import (
    merge_lora_into_dense, port_input_conv_4to8, t2f_conv2d, t2f_conv3d, t2f_linear,
)


def test_linear_port_forward_equivalence():
    import torch
    import jax.numpy as jnp

    lin = torch.nn.Linear(5, 7)
    x = np.random.default_rng(0).normal(size=(3, 5)).astype(np.float32)
    want = lin(torch.from_numpy(x)).detach().numpy()
    got = x @ t2f_linear(lin.weight.detach().numpy()) + lin.bias.detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv2d_port_forward_equivalence():
    import torch
    import jax
    import jax.numpy as jnp

    conv = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = np.random.default_rng(1).normal(size=(1, 3, 10, 12)).astype(np.float32)
    want = conv(torch.from_numpy(x)).detach().numpy()  # NCHW

    kernel = jnp.asarray(t2f_conv2d(conv.weight.detach().numpy()))
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + conv.bias.detach().numpy()
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_conv3d_port_shapes():
    w = np.zeros((8, 3, 3, 5, 5), np.float32)
    assert t2f_conv3d(w).shape == (3, 5, 5, 3, 8)


def test_input_conv_4to8_preserves_behavior():
    rng = np.random.default_rng(2)
    w4 = rng.normal(size=(16, 4, 3, 3)).astype(np.float32)
    w8 = port_input_conv_4to8(w4)
    assert w8.shape == (16, 8, 3, 3)
    np.testing.assert_array_equal(w8[:, :4], w4)
    np.testing.assert_array_equal(w8[:, 4:], 0)


def test_merge_lora():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(6, 4)).astype(np.float32)
    a = rng.normal(size=(6, 2)).astype(np.float32)
    b = rng.normal(size=(2, 4)).astype(np.float32)
    x = rng.normal(size=(5, 6)).astype(np.float32)
    merged = merge_lora_into_dense(w, a, b, alpha=0.5)
    np.testing.assert_allclose(x @ merged, x @ w + (x @ a @ b) * 0.5, atol=1e-5)
