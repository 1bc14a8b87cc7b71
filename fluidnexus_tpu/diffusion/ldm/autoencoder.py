"""KL autoencoder (f=8, z=4) for the novel-view LDM.

Parity target: Zero123/ldm/models/autoencoder.py (AutoencoderKL) with the
SD-standard encoder/decoder (ldm/modules/diffusionmodules/model.py): ch 128,
ch_mult (1,2,4,4), 2 res blocks, mid attention, double_z. NHWC flax.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class KLVAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    in_channels: int = 3
    out_channels: int = 3
    scale_factor: float = 0.18215
    dtype: jnp.dtype = jnp.float32


class ResBlock2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.silu(nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6, dtype=jnp.float32)(x))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = nn.silu(nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6, dtype=jnp.float32)(h))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if c != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock2D(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6, dtype=jnp.float32)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h).reshape(b, hh * ww, 1, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h).reshape(b, hh * ww, 1, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h).reshape(b, hh * ww, 1, c)
        o = jax.nn.dot_product_attention(q, k, v).reshape(b, hh, ww, c)
        return x + nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(o)


class KLEncoder(nn.Module):
    cfg: KLVAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.ch, (3, 3), padding="SAME", dtype=c.dtype, name="conv_in")(x)
        for i, mult in enumerate(c.ch_mult):
            for j in range(c.num_res_blocks):
                h = ResBlock2D(c.ch * mult, c.dtype, name=f"down_{i}_block_{j}")(h)
            if i != len(c.ch_mult) - 1:
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                            dtype=c.dtype, name=f"down_{i}_downsample")(h)
        h = ResBlock2D(h.shape[-1], c.dtype, name="mid_block_1")(h)
        h = AttnBlock2D(c.dtype, name="mid_attn")(h)
        h = ResBlock2D(h.shape[-1], c.dtype, name="mid_block_2")(h)
        h = nn.silu(nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6, dtype=jnp.float32)(h))
        return nn.Conv(2 * c.z_channels, (3, 3), padding="SAME", dtype=c.dtype, name="conv_out")(h)


class KLDecoder(nn.Module):
    cfg: KLVAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        block_in = c.ch * c.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=c.dtype, name="conv_in")(z)
        h = ResBlock2D(block_in, c.dtype, name="mid_block_1")(h)
        h = AttnBlock2D(c.dtype, name="mid_attn")(h)
        h = ResBlock2D(block_in, c.dtype, name="mid_block_2")(h)
        for i in reversed(range(len(c.ch_mult))):
            for j in range(c.num_res_blocks + 1):
                h = ResBlock2D(c.ch * c.ch_mult[i], c.dtype, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding="SAME", dtype=c.dtype, name=f"up_{i}_upsample")(h)
        h = nn.silu(nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6, dtype=jnp.float32)(h))
        return nn.Conv(c.out_channels, (3, 3), padding="SAME", dtype=c.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: KLVAEConfig

    def setup(self):
        self.encoder = KLEncoder(self.cfg)
        self.decoder = KLDecoder(self.cfg)
        # 1x1 moment/latent convs (AutoencoderKL quant_conv/post_quant_conv)
        self.quant_conv = nn.Conv(2 * self.cfg.z_channels, (1, 1), dtype=self.cfg.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1), dtype=self.cfg.dtype)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def encode(self, x, rng=None, sample=False):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, -1)
        if sample and rng is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(rng, mean.shape)
        else:
            z = mean  # posterior mode — zero123 conditions on the mode
        return z * self.cfg.scale_factor

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z / self.cfg.scale_factor))

    def __call__(self, x, rng=None):
        z = self.encode(x, rng, sample=True)
        return self.decode(z), z
