"""CLIP ViT image embedder for view conditioning.

Parity target: Zero123/ldm/modules/encoders/modules.py FrozenCLIPImageEmbedder
(:343): CLIP ViT-L/14 vision tower, the pooled (class-token) embedding
projected to 768, preceded by CLIP pixel normalization. flax implementation
with the standard ViT-L/14 geometry so OpenAI weights can be ported.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    output_dim: int = 768
    dtype: jnp.dtype = jnp.float32


class MHA(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        hd = d // self.heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, -1)
        q = q.reshape(b, s, self.heads, hd)
        k = k.reshape(b, s, self.heads, hd)
        v = v.reshape(b, s, self.heads, hd)
        o = jax.nn.dot_product_attention(q, k, v).reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="out")(o)


class CLIPVisionTower(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images):
        """images: (B,H,W,3) in [0,1]. Returns (B, output_dim) pooled embed."""
        c = self.cfg
        x = (images - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
        if x.shape[1] != c.image_size:
            x = jax.image.resize(x, (x.shape[0], c.image_size, c.image_size, 3), "bilinear")
        x = nn.Conv(c.width, (c.patch_size, c.patch_size), strides=(c.patch_size, c.patch_size),
                    use_bias=False, dtype=c.dtype, name="patch_embed")(x)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (d,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)).astype(x.dtype), x], 1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (gh * gw + 1, d), jnp.float32)
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_pre")(x)
        for i in range(c.layers):
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln1_{i}")(x)
            x = x + MHA(c.heads, c.dtype, name=f"attn_{i}")(h)
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln2_{i}")(x)
            h = nn.Dense(4 * d, dtype=c.dtype, name=f"mlp_fc_{i}")(h)
            h = h * jax.nn.sigmoid(1.702 * h)  # quick-gelu
            x = x + nn.Dense(d, dtype=c.dtype, name=f"mlp_proj_{i}")(h)
        pooled = nn.LayerNorm(dtype=jnp.float32, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02), (d, c.output_dim), jnp.float32)
        return pooled @ proj.astype(pooled.dtype)
