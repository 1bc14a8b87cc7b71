"""Forward-equivalence of the Zero123 UNet weight port against the REFERENCE
torch implementation (imported from /root/reference with stubs for its
unused heavy deps). This is the proof that a reference user's checkpoint
drops into this framework."""
import sys
import types

import numpy as np
import pytest


def _import_reference_unet():
    import importlib.machinery

    for name in ("torchvision", "carvekit", "carvekit.api", "carvekit.api.high"):
        mod = types.ModuleType(name)
        # a real ModuleSpec: transformers later calls find_spec("torchvision"),
        # which raises ValueError on an in-sys.modules module whose __spec__
        # is None (this was the full-suite-only test_t5_conditioner error)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules.setdefault(name, mod)
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


def _import_reference_video_vae():
    import torch
    import torch.distributed as dist
    import os

    if not dist.is_initialized():
        os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
        os.environ.setdefault("MASTER_PORT", "29571")
        dist.init_process_group("gloo", rank=0, world_size=1)
    import typing

    bt = types.ModuleType("beartype")
    bt.beartype = lambda f=None, *a, **k: (f if f is not None else (lambda g: g))
    bt_t = types.ModuleType("beartype.typing")
    bt_t.Union = typing.Union
    bt_t.Tuple = typing.Tuple
    bt_t.Optional = typing.Optional
    bt_t.List = typing.List
    sys.modules.setdefault("beartype", bt)
    sys.modules.setdefault("beartype.typing", bt_t)
    sgm = types.ModuleType("sgm")
    sgm.__path__ = []
    util = types.ModuleType("sgm.util")
    util.get_context_parallel_group = lambda: None
    util.get_context_parallel_group_rank = lambda: 0
    util.get_context_parallel_rank = lambda: 0
    util.get_context_parallel_world_size = lambda: 1
    sys.modules.setdefault("sgm", sgm)
    sys.modules.setdefault("sgm.util", util)
    if "/root/reference/CogVideoX" not in sys.path:
        sys.path.insert(0, "/root/reference/CogVideoX")
    from vae_modules.cp_enc_dec import ContextParallelDecoder3D, ContextParallelEncoder3D

    return ContextParallelEncoder3D, ContextParallelDecoder3D


@pytest.mark.slow
def test_video_vae_port_forward_equivalence():
    import jax.numpy as jnp
    import torch

    from fluidnexus_tpu.diffusion.port import port_video_vae
    from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig, VideoVAE

    Enc, Dec = _import_reference_video_vae()
    torch.manual_seed(0)
    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=[],
              in_channels=3, resolution=32, z_channels=4, double_z=True,
              temporal_compress_times=2)
    enc = Enc(**kw).eval()
    dec = Dec(**{k: v for k, v in kw.items() if k != "double_z"}).eval()

    sd = {}
    for k, v in enc.state_dict().items():
        sd["encoder." + k] = v.detach().numpy()
    for k, v in dec.state_dict().items():
        sd["decoder." + k] = v.detach().numpy()

    cfg = VAE3DConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                      temporal_compress_times=2, scale_factor=1.0)
    params = port_video_vae(sd, cfg)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)  # torch NCTHW
    with torch.no_grad():
        moments = enc(torch.from_numpy(x))
        mean = moments[:, :4]
        recon = dec(mean).numpy()

    model = VideoVAE(cfg)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # NTHWC
    z, _ = model.apply({"params": params}, x_j, method=model.encode, mutable=["cache"])
    got, _ = model.apply({"params": params}, z, method=model.decode, mutable=["cache"])
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 4, 1, 2, 3), mean.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), recon, atol=2e-3, rtol=1e-2)


def test_clip_visual_port_structure_and_forward():
    """OpenAI CLIP visual layout -> our tower: synthetic state dict with the
    OpenAI key names/shapes; port must fill every parameter (verified by
    apply succeeding) and the attention packing must match torch's
    MultiheadAttention (verified against torch functional MHA on one layer)."""
    import jax.numpy as jnp
    import torch

    from fluidnexus_tpu.diffusion.ldm.clip import CLIPVisionConfig, CLIPVisionTower
    from fluidnexus_tpu.diffusion.port import port_openai_clip_visual

    torch.manual_seed(0)
    width, layers, heads, out_dim, patch, img = 32, 2, 4, 12, 14, 28
    grid = img // patch
    sd = {
        "conv1.weight": torch.randn(width, 3, patch, patch).numpy() * 0.02,
        "class_embedding": torch.randn(width).numpy() * 0.02,
        "positional_embedding": torch.randn(grid * grid + 1, width).numpy() * 0.02,
        "ln_pre.weight": torch.ones(width).numpy(), "ln_pre.bias": torch.zeros(width).numpy(),
        "ln_post.weight": torch.ones(width).numpy(), "ln_post.bias": torch.zeros(width).numpy(),
        "proj": torch.randn(width, out_dim).numpy() * 0.02,
    }
    for i in range(layers):
        tb = f"transformer.resblocks.{i}"
        sd[tb + ".ln_1.weight"] = torch.ones(width).numpy()
        sd[tb + ".ln_1.bias"] = torch.zeros(width).numpy()
        sd[tb + ".ln_2.weight"] = torch.ones(width).numpy()
        sd[tb + ".ln_2.bias"] = torch.zeros(width).numpy()
        sd[tb + ".attn.in_proj_weight"] = torch.randn(3 * width, width).numpy() * 0.05
        sd[tb + ".attn.in_proj_bias"] = torch.randn(3 * width).numpy() * 0.01
        sd[tb + ".attn.out_proj.weight"] = torch.randn(width, width).numpy() * 0.05
        sd[tb + ".attn.out_proj.bias"] = torch.zeros(width).numpy()
        sd[tb + ".mlp.c_fc.weight"] = torch.randn(4 * width, width).numpy() * 0.05
        sd[tb + ".mlp.c_fc.bias"] = torch.zeros(4 * width).numpy()
        sd[tb + ".mlp.c_proj.weight"] = torch.randn(width, 4 * width).numpy() * 0.05
        sd[tb + ".mlp.c_proj.bias"] = torch.zeros(width).numpy()

    params = port_openai_clip_visual(sd, layers)
    cfg = CLIPVisionConfig(image_size=img, patch_size=patch, width=width, layers=layers,
                           heads=heads, output_dim=out_dim)
    tower = CLIPVisionTower(cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, img, img, 3)), jnp.float32)
    emb = tower.apply({"params": params}, x)
    assert emb.shape == (1, out_dim)
    assert np.isfinite(np.asarray(emb)).all()

    # attention packing equivalence on one layer against torch functional MHA
    s = 5
    h_in = np.random.default_rng(1).normal(size=(1, s, width)).astype(np.float32)
    w_in = torch.from_numpy(sd["transformer.resblocks.0.attn.in_proj_weight"])
    b_in = torch.from_numpy(sd["transformer.resblocks.0.attn.in_proj_bias"])
    w_out = torch.from_numpy(sd["transformer.resblocks.0.attn.out_proj.weight"])
    b_out = torch.from_numpy(sd["transformer.resblocks.0.attn.out_proj.bias"])
    ht = torch.from_numpy(h_in).transpose(0, 1)  # (s,b,d)
    want, _ = torch.nn.functional.multi_head_attention_forward(
        ht, ht, ht, width, heads, w_in, b_in, None, None, False, 0.0, w_out, b_out)
    want = want.transpose(0, 1).detach().numpy()

    from fluidnexus_tpu.diffusion.ldm.clip import MHA

    mha = MHA(heads)
    mp = {"qkv": params["attn_0"]["qkv"], "out": params["attn_0"]["out"]}
    got = np.asarray(mha.apply({"params": mp}, jnp.asarray(h_in)))
    np.testing.assert_allclose(got, want, atol=2e-5)
