"""Video diffusion transformer (CogVideoX-class) — flax/TPU implementation.

Parity target: CogVideoX/dit_video_concat.py (DiffusionTransformer:583-804
with mixins ImagePatchEmbeddingMixin:20, Rotary3DPositionEmbeddingMixin:248,
AdaLNMixin:435, FinalLayerMixin:364, SwiGLUMixin:408):
  - 2x2 patch embed over latent frames, text projected and PREPENDED to the
    token sequence (joint text+video full self-attention);
  - factorized 3D RoPE on image tokens only (head-dim split d/4 | 3d/8 | 3d/8
    over t/h/w, pairwise rotate — :265-300);
  - per-layer AdaLN with 12-way modulation: separate shift/scale/gate for the
    text and image streams in both attention and MLP (:488-543);
  - qk layer-norm per head (:455-468);
  - final layer: 2-way AdaLN modulate + linear + unpatchify (:364-400).

TP-ready: attention/MLP matmuls carry flax logical sharding annotations
('embed', 'heads', 'mlp') so pjit can shard the 5B configuration over the
'model' mesh axis; see fluidnexus_tpu/parallel.
LoRA (r=128 in the reference finetune, configs/cogvideox_5b_lora_prefixi2v.
yaml:56-59) is built into every attention/MLP projection — params named
``lora_a/lora_b`` with zero-init B; base weights can be frozen by path.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

P = nn.with_logical_partitioning


@dataclasses.dataclass(frozen=True)
class VideoDiTConfig:
    hidden_size: int = 3072
    num_layers: int = 42
    num_heads: int = 48
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    text_hidden_size: int = 4096     # T5-XXL
    text_length: int = 226
    latent_frames: int = 13          # compressed_num_frames
    latent_height: int = 60
    latent_width: int = 90
    # 512 in the released 5B (cogvideox_5b_lora_prefixi2v.yaml:31); None
    # falls back to hidden_size, which at 3072 would put a 3072x36864 AdaLN
    # projection in EVERY layer (+4.7B params — not the reference geometry)
    time_embed_dim: Optional[int] = 512
    mlp_ratio: int = 4
    lora_rank: int = 0               # 0 disables LoRA params
    dtype: jnp.dtype = jnp.bfloat16
    # the released 5B model trains affine LayerNorms everywhere
    # (configs/cogvideox_5b.yaml elementwise_affine: True); False gives the
    # classic DiT non-affine LN (modulation supplies shift/scale)
    ln_affine: bool = True
    # rematerialize each block in the backward pass (the reference finetunes
    # with checkpoint_activations: True, cogvideox_5b_lora_prefixi2v.yaml:41);
    # at 5B/17776-token shapes activations otherwise exceed HBM
    remat: bool = True
    # blocks per remat scope: 1 = classic per-block checkpointing; g > 1
    # stores only every g-th block boundary (ceil(L/g) x seq x hidden) and
    # recomputes g blocks per group in the backward — the sqrt-style
    # memory/compute trade for single-chip finetunes
    remat_group: int = 1
    # QLoRA-style int8 base weights: the frozen block matmul kernels
    # (qkv/out/fc1/fc2 + the adaLN projection) are stored as int8 with a
    # per-output-column f32 scale and dequantized in the matmul epilogue
    # (y = (x @ q) * scale — exact for per-column scales). Halves-again the
    # 11.1 GiB bf16 base tree to ~5.6 GiB, which is what fits the full 5B
    # LoRA train step on ONE 16 GiB v5e chip. Convert float checkpoints with
    # quantize_dit_params().
    base_quant: bool = False

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def temb_dim(self):
        return self.time_embed_dim or self.hidden_size

    @property
    def tokens_per_frame(self):
        return (self.latent_height // self.patch_size) * (self.latent_width // self.patch_size)


def timestep_embedding(t, dim, max_period=10000):
    """Sinusoidal embedding (reference uses the SD timestep_embedding)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


def make_3d_rope(cfg: VideoDiTConfig, theta: float = 10000.0):
    """Factorized t/h/w rotary tables, (T*H*W, head_dim) cos/sin
    (Rotary3DPositionEmbeddingMixin:264-295). Note the reference repeats each
    frequency to ADJACENT pairs (repeat '... n -> ... (n r)', r=2) and uses
    rotate_half = interleaved pair rotation."""
    d = cfg.head_dim
    dim_t, dim_h, dim_w = d // 4, d // 8 * 3, d // 8 * 3
    t_sz = cfg.latent_frames
    h_sz = cfg.latent_height // cfg.patch_size
    w_sz = cfg.latent_width // cfg.patch_size

    def freqs(dim, size):
        f = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
        out = np.einsum("s,f->sf", np.arange(size, dtype=np.float64), f)
        return np.repeat(out, 2, axis=-1)  # (size, dim)

    ft = freqs(dim_t, t_sz)[:, None, None, :]
    fh = freqs(dim_h, h_sz)[None, :, None, :]
    fw = freqs(dim_w, w_sz)[None, None, :, :]
    f = np.concatenate(
        [np.broadcast_to(ft, (t_sz, h_sz, w_sz, ft.shape[-1])),
         np.broadcast_to(fh, (t_sz, h_sz, w_sz, fh.shape[-1])),
         np.broadcast_to(fw, (t_sz, h_sz, w_sz, fw.shape[-1]))], -1
    ).reshape(t_sz * h_sz * w_sz, d)
    return jnp.asarray(np.cos(f), jnp.float32), jnp.asarray(np.sin(f), jnp.float32)


def rotate_half_interleaved(x):
    """(x0,x1,x2,x3,...) -> (-x1,x0,-x3,x2,...) — the reference rotate_half."""
    x2 = x.reshape(x.shape[:-1] + (-1, 2))
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], -1)
    return rot.reshape(x.shape)


def apply_rope(x, cos, sin):
    """x: (B,H,S,D); cos/sin: (S,D)."""
    return x * cos[None, None] + rotate_half_interleaved(x) * sin[None, None]


def _int8_zeros(key, shape, dtype=jnp.int8):
    return jnp.zeros(shape, jnp.int8)


class LoRADense(nn.Module):
    """Dense with optional LoRA adapter and logical sharding annotations.

    quant=True stores the FROZEN base kernel as int8 with a per-output-column
    f32 scale (QLoRA-style): y = (x @ q) * scale is exact for per-column
    scales, so the dequant rides the matmul epilogue and no f32/bf16 copy of
    the kernel is ever materialized. LoRA adapters stay f32 trainables."""

    features: int
    rank: int = 0
    use_bias: bool = True
    kernel_axes: Tuple[str, str] = ("embed", "mlp")
    dtype: jnp.dtype = jnp.bfloat16
    lora_alpha: float = 1.0
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        if self.quant:
            kq = self.param("kernel_q", P(_int8_zeros, self.kernel_axes),
                            (in_f, self.features), jnp.int8)
            ks = self.param("kernel_scale", P(nn.initializers.ones, (self.kernel_axes[-1],)),
                            (self.features,), jnp.float32)
            y = (x @ kq.astype(self.dtype)) * ks.astype(self.dtype)
        else:
            kernel = self.param("kernel", P(nn.initializers.lecun_normal(), self.kernel_axes),
                                (in_f, self.features), jnp.float32)
            y = x @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", P(nn.initializers.zeros, (self.kernel_axes[-1],)),
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        if self.rank > 0:
            la = self.param("lora_a", P(nn.initializers.lecun_normal(), (self.kernel_axes[0], None)),
                            (in_f, self.rank), jnp.float32)
            lb = self.param("lora_b", P(nn.initializers.zeros, (None, self.kernel_axes[-1])),
                            (self.rank, self.features), jnp.float32)
            y = y + (x @ la.astype(self.dtype)) @ lb.astype(self.dtype) * self.lora_alpha
        return y


def _ln(x, eps=1e-6):
    """LayerNorm without learned affine (modulation supplies shift/scale)."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class AffineLN(nn.Module):
    """LayerNorm with learned scale/bias (elementwise_affine=True of the
    released 5B weights); pure _ln when the config disables affine."""

    affine: bool = True
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        y = _ln(x, self.eps)
        if not self.affine:
            return y
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return y * scale.astype(y.dtype) + bias.astype(y.dtype)


def _joint_attention(q, k, v):
    """Full self-attention over the joint text+video sequence. On TPU this
    takes the Pallas flash-attention kernel (the xformers memory-efficient
    path of the reference, sgm/modules/attention.py:248-346): unaligned
    sequence lengths — the 5B joint sequence is 226+17550=17776 — are FRONT
    zero-padded to a 512 multiple with segment ids masking pad<->real
    attention, so the kernel fires at the real shape (<1% pad overhead).
    Falls back to XLA's fused dot_product_attention off-TPU or for tiny
    sequences. q/k/v: (b,h,s,d); returns (b,s,h,d)."""
    b, h, s, d = q.shape
    if jax.default_backend() == "tpu" and s >= 512 and d % 64 == 0:
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention)

            pad = (-s) % 512
            sp = s + pad
            # the library default is 128-blocks — device-profiled at ~2% MXU
            # on the 5B shape (48 heads x 17920: 940k block iterations, each
            # a 64-deep half-MXU matmul + softmax-carry overhead). 512-blocks
            # (sp is always a 512 multiple here) run 16x fewer iterations
            # with full-depth contractions.
            bs = 512 if sp % 512 == 0 else 128
            # backward blocks: the r3 assumption that the 128-block
            # iteration-overhead pathology "does NOT apply to the bwd
            # sweeps" was WRONG — the r4 step trace pinned bwd_dkv+bwd_dq
            # at 42.0 of the 58.2 s 5B LoRA step (~5% MXU), and the device
            # sweep (tools/bench_attention.py --bwd, bf16, fwd 512) reads
            # 1072.7 / 495.3 / 273.5 ms/layer fwd+bwd at bb=128/256/512.
            # 512 costs a larger f32 dkv workspace (~1.6 GiB transient vs
            # 0.4) but the full 5B step still fits (test_5b_lora_train_smoke)
            bb = bs
            blocks = BlockSizes(
                block_q=bs, block_k_major=bs, block_k=bs, block_b=1,
                block_q_major_dkv=bb, block_k_major_dkv=bb, block_k_dkv=bb,
                block_q_dkv=bb, block_k_major_dq=bb, block_k_dq=bb,
                block_q_dq=bb)
            if pad:
                qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
                kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
                vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
                seg = jnp.concatenate(
                    [jnp.ones((b, s), jnp.int32), jnp.zeros((b, pad), jnp.int32)], 1)
                out = flash_attention(qp, kp, vp, segment_ids=SegmentIds(seg, seg),
                                      causal=False, sm_scale=1.0 / float(np.sqrt(d)),
                                      block_sizes=blocks)
                return out[:, :, :s].transpose(0, 2, 1, 3)
            out = flash_attention(q, k, v, causal=False, sm_scale=1.0 / float(np.sqrt(d)),
                                  block_sizes=blocks)
            return out.transpose(0, 2, 1, 3)
        except Exception:
            pass
    return jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))


class JointAttention(nn.Module):
    cfg: VideoDiTConfig

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin):
        c = self.cfg
        b, s, _ = x.shape
        qkv = LoRADense(3 * c.hidden_size, rank=c.lora_rank, kernel_axes=("embed", "heads"),
                        dtype=c.dtype, quant=c.base_quant, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, c.num_heads, c.head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        # per-head-dim qk layernorm (AdaLNMixin qk_ln, :455-468)
        q_scale = self.param("q_ln_scale", nn.initializers.ones, (c.head_dim,), jnp.float32)
        k_scale = self.param("k_ln_scale", nn.initializers.ones, (c.head_dim,), jnp.float32)
        q = _ln(q) * q_scale.astype(c.dtype)
        k = _ln(k) * k_scale.astype(c.dtype)
        if c.ln_affine:  # the 5B qk-LNs are full affine LayerNorms
            q_bias = self.param("q_ln_bias", nn.initializers.zeros, (c.head_dim,), jnp.float32)
            k_bias = self.param("k_ln_bias", nn.initializers.zeros, (c.head_dim,), jnp.float32)
            q = q + q_bias.astype(c.dtype)
            k = k + k_bias.astype(c.dtype)

        tl = c.text_length
        q = q.at[:, :, tl:].set(apply_rope(q[:, :, tl:], rope_cos, rope_sin).astype(q.dtype))
        k = k.at[:, :, tl:].set(apply_rope(k[:, :, tl:], rope_cos, rope_sin).astype(k.dtype))

        attn = _joint_attention(q, k, v)  # (b,s,h,d)
        out = attn.reshape(b, s, c.hidden_size)
        return LoRADense(c.hidden_size, rank=c.lora_rank, kernel_axes=("heads", "embed"),
                         dtype=c.dtype, quant=c.base_quant, name="out")(out)


class MLP(nn.Module):
    cfg: VideoDiTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = LoRADense(c.mlp_ratio * c.hidden_size, rank=c.lora_rank,
                      kernel_axes=("embed", "mlp"), dtype=c.dtype,
                      quant=c.base_quant, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=True)
        return LoRADense(c.hidden_size, rank=c.lora_rank,
                         kernel_axes=("mlp", "embed"), dtype=c.dtype,
                         quant=c.base_quant, name="fc2")(h)


class DiTBlock(nn.Module):
    cfg: VideoDiTConfig

    @nn.compact
    def __call__(self, x, emb, rope_cos, rope_sin):
        c = self.cfg
        tl = c.text_length
        if c.base_quant:
            # int8 adaLN projection (0.79B params across the 42 layers —
            # 3.2 GiB at f32, 0.8 GiB quantized); f32 compute like nn.Dense
            mod = LoRADense(12 * c.hidden_size, rank=0, quant=True,
                            kernel_axes=("embed", "mlp"), dtype=jnp.float32,
                            name="adaLN")(nn.silu(emb))
        else:
            mod = nn.Dense(12 * c.hidden_size, name="adaLN",
                           kernel_init=nn.initializers.zeros, dtype=jnp.float32)(nn.silu(emb))
        (s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp,
         ts_msa, tsc_msa, tg_msa, ts_mlp, tsc_mlp, tg_mlp) = jnp.split(mod.astype(c.dtype), 12, -1)

        # input_layernorm / post_attention_layernorm are shared between the
        # text and image streams and applied BEFORE modulate
        # (AdaLNMixin.layer_forward :510-534)
        ln1 = AffineLN(affine=c.ln_affine, name="ln1")
        ln2 = AffineLN(affine=c.ln_affine, name="ln2")
        xt, xi = x[:, :tl], x[:, tl:]
        h = jnp.concatenate(
            [modulate(ln1(xt), ts_msa, tsc_msa), modulate(ln1(xi), s_msa, sc_msa)], 1)
        a = JointAttention(c, name="attn")(h, rope_cos, rope_sin)
        xt = xt + tg_msa[:, None] * a[:, :tl]
        xi = xi + g_msa[:, None] * a[:, tl:]

        h = jnp.concatenate(
            [modulate(ln2(xt), ts_mlp, tsc_mlp), modulate(ln2(xi), s_mlp, sc_mlp)], 1)
        mo = MLP(c, name="mlp")(h)
        xt = xt + tg_mlp[:, None] * mo[:, :tl]
        xi = xi + g_mlp[:, None] * mo[:, tl:]
        return jnp.concatenate([xt, xi], 1)


class VideoDiT(nn.Module):
    """Denoiser network: (latents, timesteps, text_emb) -> prediction."""

    cfg: VideoDiTConfig

    @nn.compact
    def __call__(self, latents, timesteps, text_emb):
        """latents: (B, T, C, H, W); timesteps: (B,); text_emb: (B, L, text_hidden)."""
        c = self.cfg
        b, t, ch, hh, ww = latents.shape
        p = c.patch_size

        # patch embed (ImagePatchEmbeddingMixin:20-52)
        x = latents.astype(c.dtype).transpose(0, 1, 3, 4, 2)  # b t h w c
        x = x.reshape(b, t, hh // p, p, ww // p, p, ch).transpose(0, 1, 2, 4, 3, 5, 6)
        x = x.reshape(b, t * (hh // p) * (ww // p), p * p * ch)
        x = nn.Dense(c.hidden_size, dtype=c.dtype, name="patch_proj")(x)
        txt = nn.Dense(c.hidden_size, dtype=c.dtype, name="text_proj")(text_emb.astype(c.dtype))
        x = jnp.concatenate([txt, x], 1)

        # time embedding MLP (DiffusionTransformer._build_modules:87-92)
        temb = timestep_embedding(timesteps, c.hidden_size)
        temb = nn.Dense(c.temb_dim, name="time_fc1", dtype=jnp.float32)(temb)
        temb = nn.Dense(c.temb_dim, name="time_fc2", dtype=jnp.float32)(nn.silu(temb))

        rope_cos, rope_sin = make_3d_rope(c)
        rope_cos = rope_cos.astype(c.dtype)[: x.shape[1] - c.text_length]
        rope_sin = rope_sin.astype(c.dtype)[: x.shape[1] - c.text_length]

        if c.remat and c.remat_group > 1:
            # grouped activation checkpointing: one remat scope per GROUP of
            # blocks, so the backward stores ceil(L/g) boundary activations
            # instead of L (42 x 109 MB at the 5B joint sequence) at the cost
            # of recomputing g blocks per group. Param paths stay block_{i}
            # (checkpoint-port parity) because children are created on self.
            # NESTED checkpointing: the outer scope stores only group
            # boundaries; the inner per-block remat keeps the group's
            # backward from materializing every block's internals at once
            # (the f32 qk-LN/MLP residuals of 6 blocks are ~5 GiB at the 5B
            # shape — nested, only one block's internals live at a time)
            g = c.remat_group
            for lo in range(0, c.num_layers, g):
                def run_group(mdl, xg, tg, cosg, sing, _lo=lo):
                    for i in range(_lo, min(_lo + g, c.num_layers)):
                        xg = nn.remat(DiTBlock)(c, name=f"block_{i}", parent=mdl)(
                            xg, tg, cosg, sing)
                    return xg

                x = nn.remat(run_group)(self, x, temb, rope_cos, rope_sin)
        else:
            block_cls = nn.remat(DiTBlock) if c.remat else DiTBlock
            for i in range(c.num_layers):
                x = block_cls(c, name=f"block_{i}")(x, temb, rope_cos, rope_sin)

        # SAT base transformer's final_layernorm after the last layer, then
        # the FinalLayerMixin norm_final + modulate (:364-400)
        x = AffineLN(affine=c.ln_affine, name="final_ln")(x)
        xi = x[:, c.text_length:]
        mod = nn.Dense(2 * c.hidden_size, name="final_adaLN",
                       kernel_init=nn.initializers.zeros, dtype=jnp.float32)(nn.silu(temb))
        shift, scale = jnp.split(mod.astype(c.dtype), 2, -1)
        xi = modulate(AffineLN(affine=c.ln_affine, name="norm_final")(xi), shift, scale)
        xi = nn.Dense(p * p * c.out_channels, name="final_linear", dtype=c.dtype)(xi)

        # unpatchify (:352-361)
        hp, wp = hh // p, ww // p
        out = xi.reshape(b, t, hp, wp, p, p, c.out_channels)
        out = out.transpose(0, 1, 6, 2, 4, 3, 5).reshape(b, t, c.out_channels, hh, ww)
        return out.astype(jnp.float32)


def quantize_dit_params(params, modules=("qkv", "out", "fc1", "fc2", "adaLN")):
    """Float DiT param tree -> the base_quant=True layout: every block matmul
    kernel becomes int8 ``kernel_q`` + per-output-column f32 ``kernel_scale``
    (symmetric absmax, q = round(w/scale) clamped to +-127). Bias / LN /
    LoRA / embedding leaves pass through unchanged. Returns a PLAIN (unboxed)
    tree — re-place with engine.shard_for_generation / param_shardings for TP.
    """
    def unbox(x):
        return x.unbox() if isinstance(x, nn.meta.AxisMetadata) else x

    def quant_mod(d):
        w = jnp.asarray(unbox(d["kernel"]), jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
        out = {k: walk(v) for k, v in d.items() if k != "kernel"}
        out["kernel_q"] = q
        out["kernel_scale"] = scale
        return out

    def walk(tree):
        if isinstance(tree, nn.meta.AxisMetadata):
            return tree.unbox()
        if not isinstance(tree, (dict,)) and not hasattr(tree, "items"):
            return tree
        return {k: (quant_mod(v) if k in modules and hasattr(v, "items")
                    and "kernel" in v else walk(v))
                for k, v in tree.items()}

    return walk(params)


def lora_param_filter(path: Tuple[str, ...]) -> bool:
    """True for LoRA params — the only trainables in the reference finetune
    (diffusion_video.py:105-127: not_trainable_prefixes ['all'] with
    matrix_A/B exemption)."""
    return any(p in ("lora_a", "lora_b") for p in path)
