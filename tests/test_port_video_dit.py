"""SAT-checkpoint -> VideoDiT port: forward equivalence.

The sat package isn't importable here, so the oracle is a torch harness that
implements the reference forward math primitive-by-primitive, following
CogVideoX/dit_video_concat.py (ImagePatchEmbeddingMixin:20-52, Rotary3D
mixin :248-335, AdaLNMixin.layer_forward:473-545 + qk-LN attention_fn
:556-570, FinalLayerMixin:364-400 incl. (c p q) unpatchify, and the SAT base
transformer's fused qkv / gelu-tanh MLP / final_layernorm). The same random
state dict is then ported with port_video_dit and run through VideoDiT."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fluidnexus_tpu.diffusion.port import graft_params_into, port_video_dit
from fluidnexus_tpu.diffusion.video.dit import VideoDiT, VideoDiTConfig

CFG = VideoDiTConfig(hidden_size=64, num_layers=2, num_heads=4, text_hidden_size=32,
                     text_length=4, latent_frames=3, latent_height=16, latent_width=16,
                     in_channels=16, out_channels=16, dtype=jnp.float32, ln_affine=True,
                     time_embed_dim=None)  # oracle's time_embed is hidden-sized


def make_state_dict(cfg, rng):
    d, nh = cfg.hidden_size, cfg.num_heads
    hd = d // nh
    p, ci, co = cfg.patch_size, cfg.in_channels, cfg.out_channels

    def w(*shape, scale=0.2):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    sd = {
        "mixins.patch_embed.proj.weight": w(d, ci, p, p),
        "mixins.patch_embed.proj.bias": w(d),
        "mixins.patch_embed.text_proj.weight": w(d, cfg.text_hidden_size),
        "mixins.patch_embed.text_proj.bias": w(d),
        "time_embed.0.weight": w(d, d), "time_embed.0.bias": w(d),
        "time_embed.2.weight": w(d, d), "time_embed.2.bias": w(d),
        "transformer.final_layernorm.weight": 1 + w(d, scale=0.05),
        "transformer.final_layernorm.bias": w(d, scale=0.05),
        "mixins.final_layer.norm_final.weight": 1 + w(d, scale=0.05),
        "mixins.final_layer.norm_final.bias": w(d, scale=0.05),
        "mixins.final_layer.adaLN_modulation.1.weight": w(2 * d, d),
        "mixins.final_layer.adaLN_modulation.1.bias": w(2 * d),
        "mixins.final_layer.linear.weight": w(p * p * co, d),
        "mixins.final_layer.linear.bias": w(p * p * co),
    }
    for i in range(cfg.num_layers):
        t, a = f"transformer.layers.{i}", "mixins.adaln_layer"
        sd.update({
            f"{a}.adaLN_modulations.{i}.1.weight": w(12 * d, d),
            f"{a}.adaLN_modulations.{i}.1.bias": w(12 * d),
            f"{a}.query_layernorm_list.{i}.weight": 1 + w(hd, scale=0.05),
            f"{a}.query_layernorm_list.{i}.bias": w(hd, scale=0.05),
            f"{a}.key_layernorm_list.{i}.weight": 1 + w(hd, scale=0.05),
            f"{a}.key_layernorm_list.{i}.bias": w(hd, scale=0.05),
            f"{t}.input_layernorm.weight": 1 + w(d, scale=0.05),
            f"{t}.input_layernorm.bias": w(d, scale=0.05),
            f"{t}.post_attention_layernorm.weight": 1 + w(d, scale=0.05),
            f"{t}.post_attention_layernorm.bias": w(d, scale=0.05),
            f"{t}.attention.query_key_value.weight": w(3 * d, d),
            f"{t}.attention.query_key_value.bias": w(3 * d),
            f"{t}.attention.dense.weight": w(d, d),
            f"{t}.attention.dense.bias": w(d),
            f"{t}.mlp.dense_h_to_4h.weight": w(4 * d, d),
            f"{t}.mlp.dense_h_to_4h.bias": w(4 * d),
            f"{t}.mlp.dense_4h_to_h.weight": w(d, 4 * d),
            f"{t}.mlp.dense_4h_to_h.bias": w(d),
        })
    return sd


def rope_tables(cfg):
    """Reference Rotary3DPositionEmbeddingMixin:264-291 freq tables."""
    hd = cfg.head_dim
    dim_t, dim_h, dim_w = hd // 4, hd // 8 * 3, hd // 8 * 3
    tt = cfg.latent_frames
    hh = cfg.latent_height // cfg.patch_size
    ww = cfg.latent_width // cfg.patch_size

    def freqs(dim, size):
        f = 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
        return np.repeat(np.einsum("s,f->sf", np.arange(size, dtype=np.float64), f), 2, -1)

    ft = np.broadcast_to(freqs(dim_t, tt)[:, None, None, :], (tt, hh, ww, dim_t))
    fh = np.broadcast_to(freqs(dim_h, hh)[None, :, None, :], (tt, hh, ww, dim_h))
    fw = np.broadcast_to(freqs(dim_w, ww)[None, None, :, :], (tt, hh, ww, dim_w))
    f = np.concatenate([ft, fh, fw], -1).reshape(-1, hd)
    return torch.tensor(np.cos(f), dtype=torch.float32), torch.tensor(np.sin(f), dtype=torch.float32)


def torch_reference_forward(sd, cfg, lat, tsteps, txt):
    g = lambda k: torch.tensor(sd[k])

    def lin(x, k):
        return F.linear(x, g(k + ".weight"), g(k + ".bias"))

    def lnorm(x, k, dim):
        return F.layer_norm(x, (dim,), g(k + ".weight"), g(k + ".bias"), eps=1e-6)

    def modulate(v, sh, sc):
        return v * (1 + sc.unsqueeze(1)) + sh.unsqueeze(1)

    b, T, C, H, W = lat.shape
    p, d, nh, tl = cfg.patch_size, cfg.hidden_size, cfg.num_heads, cfg.text_length
    hd = d // nh

    x = torch.tensor(lat).reshape(b * T, C, H, W)
    x = F.conv2d(x, g("mixins.patch_embed.proj.weight"), g("mixins.patch_embed.proj.bias"), stride=p)
    x = x.reshape(b, T, d, -1).permute(0, 1, 3, 2).reshape(b, -1, d)
    x = torch.cat([lin(torch.tensor(txt), "mixins.patch_embed.text_proj"), x], 1)

    half = d // 2
    fr = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = torch.tensor(tsteps, dtype=torch.float32)[:, None] * fr[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], -1)
    emb = lin(F.silu(lin(emb, "time_embed.0")), "time_embed.2")

    cos, sin = rope_tables(cfg)

    def rotary(u):  # (b, nh, s, hd); rotate_half = interleaved pairs
        s = u.shape[2]
        u2 = u.reshape(*u.shape[:-1], -1, 2)
        rht = torch.stack([-u2[..., 1], u2[..., 0]], -1).reshape(u.shape)
        return u * cos[:s][None, None] + rht * sin[:s][None, None]

    for i in range(cfg.num_layers):
        t, a = f"transformer.layers.{i}", "mixins.adaln_layer"
        mod = lin(F.silu(emb), f"{a}.adaLN_modulations.{i}.1").chunk(12, 1)
        (s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp,
         ts_msa, tsc_msa, tg_msa, ts_mlp, tsc_mlp, tg_mlp) = mod
        txt_h, img_h = x[:, :tl], x[:, tl:]
        h = torch.cat([
            modulate(lnorm(txt_h, f"{t}.input_layernorm", d), ts_msa, tsc_msa),
            modulate(lnorm(img_h, f"{t}.input_layernorm", d), s_msa, sc_msa)], 1)
        qkv = lin(h, f"{t}.attention.query_key_value")
        q, k, v = qkv.chunk(3, -1)

        def heads(u):
            return u.reshape(b, -1, nh, hd).permute(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        q = F.layer_norm(q, (hd,), g(f"{a}.query_layernorm_list.{i}.weight"),
                         g(f"{a}.query_layernorm_list.{i}.bias"), eps=1e-6)
        k = F.layer_norm(k, (hd,), g(f"{a}.key_layernorm_list.{i}.weight"),
                         g(f"{a}.key_layernorm_list.{i}.bias"), eps=1e-6)
        q = torch.cat([q[:, :, :tl], rotary(q[:, :, tl:])], 2)
        k = torch.cat([k[:, :, :tl], rotary(k[:, :, tl:])], 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = lin(o.permute(0, 2, 1, 3).reshape(b, -1, d), f"{t}.attention.dense")
        txt_h = txt_h + tg_msa.unsqueeze(1) * o[:, :tl]
        img_h = img_h + g_msa.unsqueeze(1) * o[:, tl:]

        h = torch.cat([
            modulate(lnorm(txt_h, f"{t}.post_attention_layernorm", d), ts_mlp, tsc_mlp),
            modulate(lnorm(img_h, f"{t}.post_attention_layernorm", d), s_mlp, sc_mlp)], 1)
        h = lin(F.gelu(lin(h, f"{t}.mlp.dense_h_to_4h"), approximate="tanh"),
                f"{t}.mlp.dense_4h_to_h")
        txt_h = txt_h + tg_mlp.unsqueeze(1) * h[:, :tl]
        img_h = img_h + g_mlp.unsqueeze(1) * h[:, tl:]
        x = torch.cat([txt_h, img_h], 1)

    x = lnorm(x, "transformer.final_layernorm", d)
    xi = x[:, tl:]
    sh, sc = lin(F.silu(emb), "mixins.final_layer.adaLN_modulation.1").chunk(2, 1)
    xi = modulate(lnorm(xi, "mixins.final_layer.norm_final", d), sh, sc)
    xi = lin(xi, "mixins.final_layer.linear")
    # unpatchify 'b (t h w) (c p q) -> b t c (h p) (w q)' (:359)
    hh, ww = H // p, W // p
    out = xi.reshape(b, T, hh, ww, cfg.out_channels, p, p)
    out = out.permute(0, 1, 4, 2, 5, 3, 6).reshape(b, T, cfg.out_channels, H, W)
    return out.numpy()


@pytest.mark.slow
def test_port_video_dit_forward_equivalence():
    rng = np.random.default_rng(0)
    sd = make_state_dict(CFG, rng)
    b = 2
    lat = rng.standard_normal((b, CFG.latent_frames, CFG.in_channels,
                               CFG.latent_height, CFG.latent_width)).astype(np.float32)
    tsteps = np.array([3.0, 250.0], np.float32)
    txt = rng.standard_normal((b, CFG.text_length, CFG.text_hidden_size)).astype(np.float32)

    with torch.no_grad():
        ref = torch_reference_forward(sd, CFG, lat, tsteps, txt)

    m = VideoDiT(CFG)
    template = m.init(jax.random.PRNGKey(0), jnp.zeros_like(jnp.asarray(lat)),
                      jnp.zeros((b,)), jnp.zeros_like(jnp.asarray(txt)))
    ported = port_video_dit(sd, CFG)
    params = graft_params_into(template, ported)
    got = np.asarray(m.apply(params, jnp.asarray(lat), jnp.asarray(tsteps), jnp.asarray(txt)))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_port_accepts_wrapped_prefix():
    rng = np.random.default_rng(1)
    sd = {f"model.diffusion_model.{k}": v for k, v in make_state_dict(CFG, rng).items()}
    ported = port_video_dit(sd, CFG)
    assert "block_1" in ported and ported["patch_proj"]["kernel"].shape == (
        CFG.patch_size ** 2 * CFG.in_channels, CFG.hidden_size)


def test_port_raw_sat_lora_checkpoint():
    """Raw SAT-lora2 finetune layout (<linear>.original.weight +
    matrix_A.{p}/matrix_B.{p}, r partitions 3 for qkv / 1 for dense) folds
    losslessly and ports identically to the hand-merged checkpoint
    (cogvideox_5b_lora_prefixi2v.yaml:56-59)."""
    import numpy as np

    from fluidnexus_tpu.diffusion.port import merge_sat_lora, port_video_dit

    cfg = CFG
    rng = np.random.default_rng(11)
    sd = make_state_dict(cfg, rng)

    r = 4
    lora_sd = dict(sd)
    merged_expect = dict(sd)
    for i in range(cfg.num_layers):
        for name, parts in ((f"transformer.layers.{i}.attention.query_key_value", 3),
                            (f"transformer.layers.{i}.attention.dense", 1)):
            w = np.asarray(sd[name + ".weight"])
            out_p = w.shape[0] // parts
            lora_sd.pop(name + ".weight")
            lora_sd[name + ".original.weight"] = w
            lora_sd[name + ".original.bias"] = lora_sd.pop(name + ".bias")
            merged_expect[name + ".bias"] = lora_sd[name + ".original.bias"]
            wm = w.copy()
            for p in range(parts):
                a = rng.normal(0, 0.2, (r, w.shape[1])).astype(np.float32)
                b = rng.normal(0, 0.2, (out_p, r)).astype(np.float32)
                lora_sd[f"{name}.matrix_A.{p}"] = a
                lora_sd[f"{name}.matrix_B.{p}"] = b
                wm[p * out_p:(p + 1) * out_p] += (1.0 / r) * (b @ a)
            merged_expect[name + ".weight"] = wm

    folded = merge_sat_lora(lora_sd)
    for k, v in merged_expect.items():
        np.testing.assert_allclose(folded[k], v, atol=1e-6, err_msg=k)
    assert not any("matrix_A" in k or ".original." in k for k in folded)

    # end-to-end: port_video_dit auto-detects the raw layout
    pa = port_video_dit(lora_sd, cfg)
    pb = port_video_dit(merged_expect, cfg)
    qa = pa["block_0"]["attn"]["qkv"]["kernel"]
    qb = pb["block_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_allclose(qa, qb, atol=1e-6)
    da = pa["block_1"]["attn"]["out"]["kernel"]
    db = pb["block_1"]["attn"]["out"]["kernel"]
    np.testing.assert_allclose(da, db, atol=1e-6)
