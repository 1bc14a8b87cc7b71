"""SD-class UNet for the novel-view latent diffusion model.

Parity target: Zero123/ldm/modules/diffusionmodules/openaimodel.py (UNetModel,
996 LoC) at the FluidNexus config (Zero123/configs/fluid_nexus_smoke.yaml:
28-43): in_channels 8 (4 latent + 4 cond-image latent), out 4, model_channels
320, channel_mult (1,2,4,4), num_res_blocks 2, attention at downsample rates
(4,2,1), spatial transformer depth 1 with context_dim 768, num_heads 8.

flax/TPU implementation in NHWC; attention uses jax.nn.dot_product_attention
(XLA fused / flash path).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    dtype: jnp.dtype = jnp.float32


def timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


class GroupNorm32(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.GroupNorm(num_groups=min(32, c), epsilon=1e-5, dtype=jnp.float32)(x)


class ResBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        h = nn.silu(GroupNorm32()(x))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        e = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = nn.silu(GroupNorm32()(h))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class CrossAttention(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        d = x.shape[-1]
        hd = d // self.heads
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, s, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, s, self.heads, hd)
        k = k.reshape(b, sk, self.heads, hd)
        v = v.reshape(b, sk, self.heads, hd)
        out = jax.nn.dot_product_attention(q, k, v)
        return nn.Dense(d, dtype=self.dtype, name="to_out")(out.reshape(b, s, d))


class TransformerBlock(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.heads, self.dtype, name="attn1")(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x))
        x = x + CrossAttention(self.heads, self.dtype, name="attn2")(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x), context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x)
        # GEGLU feed-forward (ldm/modules/attention.py FeedForward)
        hg = nn.Dense(x.shape[-1] * 8, dtype=self.dtype, name="ff_in")(h)
        a, g = jnp.split(hg, 2, -1)
        h = a * nn.gelu(g)
        return x + nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(h)


class SpatialTransformer(nn.Module):
    heads: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, hh, ww, c = x.shape
        h = GroupNorm32()(x)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(b, hh * ww, c)
        for i in range(self.depth):
            h = TransformerBlock(self.heads, self.dtype, name=f"block_{i}")(h, context)
        h = h.reshape(b, hh, ww, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, kernel_init=nn.initializers.zeros,
                    name="proj_out")(h)
        return x + h


class UNet(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, timesteps, context):
        """x: (B,H,W,Cin); context: (B,L,context_dim). Returns (B,H,W,Cout)."""
        c = self.cfg
        temb = timestep_embedding(timesteps, c.model_channels)
        emb = nn.Dense(4 * c.model_channels, dtype=jnp.float32, name="time_fc1")(temb)
        emb = nn.Dense(4 * c.model_channels, dtype=jnp.float32, name="time_fc2")(nn.silu(emb))

        hs = []
        h = nn.Conv(c.model_channels, (3, 3), padding="SAME", dtype=c.dtype, name="conv_in")(x)
        hs.append(h)
        ds = 1
        # down
        for i, mult in enumerate(c.channel_mult):
            ch = c.model_channels * mult
            for j in range(c.num_res_blocks):
                h = ResBlock(ch, c.dtype, name=f"down_{i}_res_{j}")(h, emb)
                if ds in c.attention_resolutions:
                    h = SpatialTransformer(c.num_heads, c.transformer_depth, c.dtype,
                                           name=f"down_{i}_attn_{j}")(h, context)
                hs.append(h)
            if i != len(c.channel_mult) - 1:
                # symmetric pad + VALID matches torch Conv2d(stride=2, padding=1)
                # pixel alignment (XLA SAME would pad (0,1))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=c.dtype, name=f"down_{i}_downsample")(h)
                hs.append(h)
                ds *= 2
        # mid
        ch = c.model_channels * c.channel_mult[-1]
        h = ResBlock(ch, c.dtype, name="mid_res_1")(h, emb)
        h = SpatialTransformer(c.num_heads, c.transformer_depth, c.dtype, name="mid_attn")(h, context)
        h = ResBlock(ch, c.dtype, name="mid_res_2")(h, emb)
        # up
        for i, mult in reversed(list(enumerate(c.channel_mult))):
            ch = c.model_channels * mult
            for j in range(c.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], -1)
                h = ResBlock(ch, c.dtype, name=f"up_{i}_res_{j}")(h, emb)
                if ds in c.attention_resolutions:
                    h = SpatialTransformer(c.num_heads, c.transformer_depth, c.dtype,
                                           name=f"up_{i}_attn_{j}")(h, context)
            if i != 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding="SAME", dtype=c.dtype, name=f"up_{i}_upsample")(h)
                ds //= 2
        h = nn.silu(GroupNorm32()(h))
        return nn.Conv(c.out_channels, (3, 3), padding="SAME", dtype=c.dtype,
                       kernel_init=nn.initializers.zeros, name="conv_out")(h)
