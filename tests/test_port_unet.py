"""Forward-equivalence of the Zero123 UNet weight port against the REFERENCE
torch implementation (imported from /root/reference with stubs for its
unused heavy deps). This is the proof that a reference user's checkpoint
drops into this framework."""
import sys
import types

import numpy as np
import pytest


def _import_reference_unet():
    for name in ("torchvision", "carvekit", "carvekit.api", "carvekit.api.high"):
        sys.modules.setdefault(name, types.ModuleType(name))
    tv = sys.modules["torchvision"]
    tv.utils = types.ModuleType("tv.utils")
    tv.utils.make_grid = lambda *a, **k: None
    tv.transforms = types.ModuleType("tv.transforms")
    sys.modules["carvekit.api.high"].HiInterface = object
    oc = types.ModuleType("omegaconf")
    oc.listconfig = types.ModuleType("omegaconf.listconfig")
    oc.listconfig.ListConfig = list
    sys.modules.setdefault("omegaconf", oc)
    sys.modules.setdefault("omegaconf.listconfig", oc.listconfig)
    if "/root/reference/Zero123" not in sys.path:
        sys.path.insert(0, "/root/reference/Zero123")
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    return UNetModel


@pytest.mark.slow
def test_unet_port_forward_equivalence():
    import jax.numpy as jnp
    import torch

    from fluidnexus_tpu.diffusion.ldm.unet import UNet, UNetConfig
    from fluidnexus_tpu.diffusion.port import port_zero123_unet

    UNetModel = _import_reference_unet()
    torch.manual_seed(0)
    ref = UNetModel(image_size=32, in_channels=8, out_channels=4, model_channels=32,
                    attention_resolutions=[2, 1], num_res_blocks=1, channel_mult=[1, 2],
                    num_heads=4, use_spatial_transformer=True, transformer_depth=1,
                    context_dim=16, legacy=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = UNetConfig(in_channels=8, out_channels=4, model_channels=32,
                     channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(2, 1), num_heads=4, context_dim=16)
    params = port_zero123_unet(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3 + 5, 8, 16, 16)).astype(np.float32)[:, :8]  # (B,8,16,16)
    x = rng.normal(size=(2, 8, 16, 16)).astype(np.float32)
    t = np.array([7, 443], np.int64)
    ctx = rng.normal(size=(2, 1, 16)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                   context=torch.from_numpy(ctx)).numpy()

    model = UNet(cfg)
    got = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(t), jnp.asarray(ctx))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_kl_vae_port_forward_equivalence():
    import jax.numpy as jnp
    import torch

    from fluidnexus_tpu.diffusion.ldm.autoencoder import AutoencoderKL, KLVAEConfig
    from fluidnexus_tpu.diffusion.port import port_kl_vae

    _import_reference_unet()  # installs stubs + sys.path
    from ldm.modules.diffusionmodules.model import Decoder, Encoder

    torch.manual_seed(0)
    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=[],
              in_channels=3, resolution=32, z_channels=4, double_z=True, dropout=0.0)
    enc = Encoder(**kw).eval()
    dec = Decoder(**kw).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)

    sd = {}
    for k, v in enc.state_dict().items():
        sd["encoder." + k] = v.detach().numpy()
    for k, v in dec.state_dict().items():
        sd["decoder." + k] = v.detach().numpy()
    for k, v in quant.state_dict().items():
        sd["quant_conv." + k] = v.detach().numpy()
    for k, v in post.state_dict().items():
        sd["post_quant_conv." + k] = v.detach().numpy()

    cfg = KLVAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                      scale_factor=1.0)
    params = port_kl_vae(sd, cfg)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        moments = quant(enc(torch.from_numpy(x)))
        mean = moments[:, :4]
        recon = dec(post(mean)).numpy()

    model = AutoencoderKL(cfg)
    z = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    method=model.encode)
    got = model.apply({"params": params}, z, method=model.decode)
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 3, 1, 2), mean.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), recon, atol=5e-4, rtol=1e-3)
