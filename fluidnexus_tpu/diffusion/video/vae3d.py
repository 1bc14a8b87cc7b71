"""Causal 3D video VAE (CogVideoX-class): 8x spatial / 4x temporal compression
to 16-channel latents.

Parity target: CogVideoX/vae_modules/cp_enc_dec.py — ContextParallelCausalConv3d
(:362-434: time pad = k_t-1 frames, first-frame replicate or cache),
DownSample3D/Upsample3D (:533-615: odd-length first-frame split),
ContextParallelResnetBlock3D (:616), Encoder (:718) / Decoder (:841, with
zq-conditioned SpatialNorm3D :453).

TPU redesign:
  - channel-last NDHWC layout (XLA-native conv tiling);
  - the reference's "fake CP cache" (serial chunked decode on one device,
    :243-291) is a flax ``cache`` variable collection: run
    ``apply(..., first_chunk=..., mutable=["cache"])`` per latent chunk and
    the causal convs stay continuous across chunks;
  - true context parallelism over time (the reference's NCCL P2P halo,
    :199-242): every module takes an optional ``cp: CPState``; under a
    shard_map over the 'time' mesh axis, causal convs halo-exchange via
    ppermute, group norms psum their statistics (masked to real frames),
    and the temporal down/upsamplers run their uniform branch. The odd
    first frame is handled by FRONT-PADDING the sequence with replicated
    copies of frame 0 (pad count odd, so pooling pairs stay aligned and
    the pad region keeps collapsing onto frame 0) — the time-sharded pass
    is then EXACTLY equal to the serial one. See parallel/cp.py
    cp_vae_encode/cp_vae_decode for the entry points.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CPState:
    """Context-parallel state threaded through the VAE modules.

    axis: mesh axis name the time dimension is sharded over.
    pad:  number of replicated-frame-0 pad frames at the CURRENT temporal
          resolution (evolves: (p+1)//2 - 1 per temporal downsample,
          2*p + 1 per temporal upsample).
    n:    number of shards on the axis (static).
    """

    axis: str
    pad: int
    n: int

    def downsampled(self) -> "CPState":
        return dataclasses.replace(self, pad=(self.pad + 1) // 2 - 1)

    def upsampled(self) -> "CPState":
        return dataclasses.replace(self, pad=2 * self.pad + 1)


@dataclasses.dataclass(frozen=True)
class VAE3DConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4)
    num_res_blocks: int = 3
    in_channels: int = 3
    out_channels: int = 3
    z_channels: int = 16
    double_z: bool = True
    temporal_compress_times: int = 4
    dtype: jnp.dtype = jnp.float32
    scale_factor: float = 1.15258426   # engine latent scale (cogvideox yaml)

    @property
    def temporal_compress_level(self):
        return int(np.log2(self.temporal_compress_times))

    @property
    def num_resolutions(self):
        return len(self.ch_mult)


class CausalConv3d(nn.Module):
    """3D conv, causal in time: pads (k_t - 1) frames on the left with either
    the running cache (chunked decode), a replicate of the first frame
    (_fake_cp_pass_from_previous_rank, cp_enc_dec.py:243-291), or — under
    context parallelism — the previous time-shard's tail via ppermute
    (_pass_from_previous_rank, cp_enc_dec.py:199-242)."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, first_chunk: bool = True, cp: Optional[CPState] = None):
        kt, kh, kw = self.kernel_size
        b, t, h, w, c = x.shape
        pad_t = kt - 1
        if pad_t > 0 and cp is not None:
            from fluidnexus_tpu.parallel.cp import halo_exchange_time

            # shard 0's front pad replicates its first local frame, which under
            # the front-pad layout IS frame 0 — identical to the serial pad
            xp = halo_exchange_time(x, kt, cp.axis)
        elif pad_t > 0:
            cache = self.variable("cache", "pad", lambda: jnp.zeros((b, pad_t, h, w, c), x.dtype))
            if first_chunk:
                front = jnp.repeat(x[:, :1], pad_t, axis=1)
            else:
                front = cache.value
            xp = jnp.concatenate([front, x], axis=1)
            if not self.is_initializing():
                cache.value = jax.lax.stop_gradient(xp[:, -pad_t:])
        else:
            xp = x
        return nn.Conv(self.features, self.kernel_size,
                       padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
                       dtype=self.dtype, name="conv")(xp)


def group_norm(x, scale, bias, groups=32, eps=1e-6, cp: Optional[CPState] = None):
    """GroupNorm over (t, h, w, c//groups). Under CP the statistics are
    psum'd across time shards and masked to REAL frames (the front pads are
    replicated frame-0 copies that must not bias the moments)."""
    b, t, h, w, c = x.shape
    groups = min(groups, c)
    xg = x.astype(jnp.float32).reshape(b, t, h, w, groups, c // groups)
    if cp is None:
        mu = xg.mean((1, 2, 3, 5), keepdims=True)
        var = ((xg - mu) ** 2).mean((1, 2, 3, 5), keepdims=True)
    else:
        gidx = jax.lax.axis_index(cp.axis) * t + jnp.arange(t)
        mask = (gidx >= cp.pad).astype(jnp.float32).reshape(1, t, 1, 1, 1, 1)
        s1 = (xg * mask).sum((1, 2, 3, 5), keepdims=True)
        s2 = (xg * xg * mask).sum((1, 2, 3, 5), keepdims=True)
        cnt = mask.sum() * (h * w * (c // groups))
        s1, s2, cnt = jax.lax.psum((s1, s2, cnt), cp.axis)
        mu = s1 / cnt
        var = jnp.maximum(s2 / cnt - mu * mu, 0.0)
    xn = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(b, t, h, w, c)
    return (xn * scale + bias).astype(x.dtype)


class Norm3D(nn.Module):
    """GroupNorm(32), optionally zq-conditioned (SpatialNorm3D, :453-531)."""

    zq_ch: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None, first_chunk: bool = True, cp: Optional[CPState] = None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        h = group_norm(x, scale, bias, cp=cp)
        if zq is None:
            return h
        # resize zq to x's (t, h, w); first frame kept separate when the
        # temporal sizes differ (SpatialNorm3D forward, :476-520). Under CP
        # both t axes are front-padded to shard-uniform EVEN lengths, so the
        # plain per-shard nearest resize reproduces the serial split exactly
        # (integer upscale nearest is blockwise, and shard boundaries align).
        zt, xt = zq.shape[1], x.shape[1]
        if (zt, zq.shape[2], zq.shape[3]) != (x.shape[1], x.shape[2], x.shape[3]):
            if cp is None and xt > zt and xt % 2 == 1:
                z_first = jax.image.resize(zq[:, :1], (zq.shape[0], 1) + x.shape[2:4] + (zq.shape[-1],),
                                           "nearest")
                z_rest = jax.image.resize(zq[:, 1:], (zq.shape[0], xt - 1) + x.shape[2:4] + (zq.shape[-1],),
                                          "nearest")
                zq = jnp.concatenate([z_first, z_rest], 1)
            else:
                zq = jax.image.resize(zq, (zq.shape[0], xt) + x.shape[2:4] + (zq.shape[-1],), "nearest")
        conv_y = CausalConv3d(c, (1, 1, 1), dtype=self.dtype, name="conv_y")(zq, first_chunk, cp)
        conv_b = CausalConv3d(c, (1, 1, 1), dtype=self.dtype, name="conv_b")(zq, first_chunk, cp)
        return h * conv_y + conv_b


class ResnetBlock3D(nn.Module):
    """(ContextParallelResnetBlock3D, cp_enc_dec.py:616-716)"""

    out_channels: int
    zq_ch: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None, first_chunk: bool = True, cp: Optional[CPState] = None):
        c_in = x.shape[-1]
        h = Norm3D(self.zq_ch, dtype=self.dtype, name="norm1")(x, zq, first_chunk, cp)
        h = nn.silu(h)
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv1")(h, first_chunk, cp)
        h = Norm3D(self.zq_ch, dtype=self.dtype, name="norm2")(h, zq, first_chunk, cp)
        h = nn.silu(h)
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv2")(h, first_chunk, cp)
        if c_in != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class DownSample3D(nn.Module):
    """Spatial stride-2 conv with asymmetric pad; temporal avg-pool-2 with
    first-frame split on odd lengths (cp_enc_dec.py:573-615)."""

    compress_time: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, first_chunk: bool = True, cp: Optional[CPState] = None):
        t_total = x.shape[1] * (cp.n if cp is not None else 1)
        if self.compress_time and t_total > 1:
            if cp is not None:
                # front-padded even layout: pairs never straddle shards
                # (local t and shard offsets both even)
                assert x.shape[1] % 2 == 0, "CP temporal pool needs even local t"
                x = (x[:, 0::2] + x[:, 1::2]) / 2.0
            elif x.shape[1] % 2 == 1 and first_chunk:
                first, rest = x[:, :1], x[:, 1:]
                if rest.shape[1] > 0:
                    rest = (rest[:, 0::2] + rest[:, 1::2]) / 2.0
                x = jnp.concatenate([first, rest], 1)
            else:
                x = (x[:, 0::2] + x[:, 1::2]) / 2.0
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        b, t = x.shape[:2]
        x2 = x.reshape((b * t,) + x.shape[2:])
        x2 = nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv")(x2)
        return x2.reshape((b, t) + x2.shape[1:])


class Upsample3D(nn.Module):
    """Nearest 2x spatial; temporal 2x (first frame not duplicated on odd
    first chunk) (cp_enc_dec.py:533-572)."""

    compress_time: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, first_chunk: bool = True, cp: Optional[CPState] = None):
        b, t, h, w, c = x.shape
        t_total = t * (cp.n if cp is not None else 1)
        if self.compress_time and t_total > 1:
            if cp is None and t % 2 == 1 and first_chunk:
                first = jax.image.resize(x[:, :1], (b, 1, h * 2, w * 2, c), "nearest")
                rest = jax.image.resize(x[:, 1:], (b, (t - 1) * 2, h * 2, w * 2, c), "nearest")
                x = jnp.concatenate([first, rest], 1)
            else:
                # CP: plain per-shard doubling; the serial first-frame
                # non-duplication is absorbed by the pad region (2p+1 pads)
                x = jax.image.resize(x, (b, t * 2, h * 2, w * 2, c), "nearest")
        else:
            x = jax.image.resize(x, (b, t, h * 2, w * 2, c), "nearest")
        b, t = x.shape[:2]
        x2 = x.reshape((b * t,) + x.shape[2:])
        x2 = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(x2)
        return x2.reshape((b, t) + x2.shape[1:])


class Encoder3D(nn.Module):
    """(ContextParallelEncoder3D, cp_enc_dec.py:718-840)"""

    cfg: VAE3DConfig

    @nn.compact
    def __call__(self, x, first_chunk: bool = True, cp: Optional[CPState] = None):
        c = self.cfg
        h = CausalConv3d(c.ch, dtype=c.dtype, name="conv_in")(x, first_chunk, cp)
        for i_level in range(c.num_resolutions):
            block_out = c.ch * c.ch_mult[i_level]
            for i_block in range(c.num_res_blocks):
                h = ResnetBlock3D(block_out, dtype=c.dtype,
                                  name=f"down_{i_level}_block_{i_block}")(h, None, first_chunk, cp)
            if i_level != c.num_resolutions - 1:
                compress = i_level < c.temporal_compress_level
                h = DownSample3D(compress_time=compress,
                                 dtype=c.dtype, name=f"down_{i_level}_downsample")(h, first_chunk, cp)
                if compress and cp is not None:
                    cp = cp.downsampled()
        h = ResnetBlock3D(h.shape[-1], dtype=c.dtype, name="mid_block_1")(h, None, first_chunk, cp)
        h = ResnetBlock3D(h.shape[-1], dtype=c.dtype, name="mid_block_2")(h, None, first_chunk, cp)
        h = Norm3D(dtype=c.dtype, name="norm_out")(h, None, first_chunk, cp)
        h = nn.silu(h)
        out_ch = 2 * c.z_channels if c.double_z else c.z_channels
        return CausalConv3d(out_ch, dtype=c.dtype, name="conv_out")(h, first_chunk, cp)


class Decoder3D(nn.Module):
    """(ContextParallelDecoder3D, cp_enc_dec.py:841-1000; zq-conditioned
    norms)"""

    cfg: VAE3DConfig

    @nn.compact
    def __call__(self, z, first_chunk: bool = True, cp: Optional[CPState] = None):
        c = self.cfg
        zq = z
        block_in = c.ch * c.ch_mult[-1]
        h = CausalConv3d(block_in, dtype=c.dtype, name="conv_in")(z, first_chunk, cp)
        h = ResnetBlock3D(block_in, zq_ch=c.z_channels, dtype=c.dtype,
                          name="mid_block_1")(h, zq, first_chunk, cp)
        h = ResnetBlock3D(block_in, zq_ch=c.z_channels, dtype=c.dtype,
                          name="mid_block_2")(h, zq, first_chunk, cp)
        for i_level in reversed(range(c.num_resolutions)):
            block_out = c.ch * c.ch_mult[i_level]
            for i_block in range(c.num_res_blocks + 1):
                h = ResnetBlock3D(block_out, zq_ch=c.z_channels, dtype=c.dtype,
                                  name=f"up_{i_level}_block_{i_block}")(h, zq, first_chunk, cp)
            if i_level != 0:
                compress = i_level >= c.num_resolutions - c.temporal_compress_level
                h = Upsample3D(compress_time=compress, dtype=c.dtype,
                               name=f"up_{i_level}_upsample")(h, first_chunk, cp)
                if compress and cp is not None:
                    cp = cp.upsampled()
        h = Norm3D(zq_ch=c.z_channels, dtype=c.dtype, name="norm_out")(h, zq, first_chunk, cp)
        h = nn.silu(h)
        return CausalConv3d(c.out_channels, dtype=c.dtype, name="conv_out")(h, first_chunk, cp)


class VideoVAE(nn.Module):
    """Encode/decode wrapper (VideoAutoencoderInferenceWrapper,
    autoencoder.py:580). Latents are scaled by cfg.scale_factor on encode and
    unscaled on decode, as the engine does."""

    cfg: VAE3DConfig

    def setup(self):
        self.encoder = Encoder3D(self.cfg)
        self.decoder = Decoder3D(self.cfg)

    def encode(self, x, rng=None, first_chunk=True, sample=True, cp: Optional[CPState] = None):
        moments = self.encoder(x, first_chunk, cp)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if sample and rng is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(rng, mean.shape)
        else:
            z = mean
        return z * self.cfg.scale_factor

    def decode(self, z, first_chunk=True, cp: Optional[CPState] = None):
        return self.decoder(z / self.cfg.scale_factor, first_chunk, cp)

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode(z), z


@functools.lru_cache(maxsize=None)
def _decode_appliers(vae: "VideoVAE"):
    """Jitted per-chunk decode appliers, cached per VAE module (a hashable
    frozen dataclass) so repeated chunked_decode calls — one per refine
    window, one per spatial tile — reuse the compiled executables instead
    of re-tracing the multi-GiB graphs every call."""

    @jax.jit
    def run_first(p, zc):
        out, mut = vae.apply({"params": p}, zc, first_chunk=True,
                             method=vae.decode, mutable=["cache"])
        return out, mut["cache"]

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run_next(p, cache, zc):
        out, mut = vae.apply({"params": p, "cache": cache}, zc, first_chunk=False,
                             method=vae.decode, mutable=["cache"])
        return out, mut["cache"]

    return run_first, run_next


@functools.lru_cache(maxsize=None)
def _encode_appliers(vae: "VideoVAE"):
    """Jitted per-chunk encode appliers, cached per VAE module (see
    _decode_appliers)."""

    @functools.partial(jax.jit, static_argnames=("samp",))
    def run_first(p, xc, k, samp):
        out, mut = vae.apply({"params": p}, xc, k, first_chunk=True, sample=samp,
                             method=vae.encode, mutable=["cache"])
        return out, mut["cache"]

    @functools.partial(jax.jit, donate_argnums=(1,), static_argnames=("samp",))
    def run_next(p, cache, xc, k, samp):
        out, mut = vae.apply({"params": p, "cache": cache}, xc, k,
                             first_chunk=False, sample=samp,
                             method=vae.encode, mutable=["cache"])
        return out, mut["cache"]

    return run_first, run_next


def chunked_decode(vae: VideoVAE, params, z, chunk: int = 2,
                   first_latents: Optional[int] = None):
    """Serial chunked decode with the conv cache carried across chunks — the
    reference's fake-CP path (gen_refine_pi2v_long.py:253-265, 2 latent
    frames per call). z: (B, T, H, W, C) channel-last latents.

    Each chunk runs as ONE jitted graph with the incoming conv cache DONATED:
    un-jitted op-by-op dispatch double-buffers the multi-GiB full-resolution
    caches and OOMs a 16 GiB chip at the real 480x720 geometry.

    first_latents overrides the first chunk's latent count (default:
    chunk + remainder, the reference split). The real-shape 3-latent first
    chunk compiles to a 16.5 GiB program — 0.7 GiB over a v5e chip — while
    first_latents=1 (the 4k+1 head frame decodes alone) peaks at the
    2-latent chunk (~7.3 GiB bf16 temp) and fits."""
    t = z.shape[1]
    # the odd remainder goes to the FIRST chunk, so the temporal first-frame
    # split happens exactly once (gen_refine_pi2v_long.py:253-257)
    rem = t % chunk
    first = (chunk + rem) if first_latents is None else first_latents
    assert first >= 1 and (t - first) % chunk == 0, (t, first, chunk)
    bounds = []
    start = 0
    while start < t:
        end = first if start == 0 else start + chunk
        bounds.append((start, min(end, t)))
        start = end

    run_first, run_next = _decode_appliers(vae)
    outs = []
    cache = None
    for i, (s, e) in enumerate(bounds):
        zc = z[:, s:e]
        if cache is None:
            out, cache = run_first(params, zc)
        else:
            out, cache = run_next(params, cache, zc)
        outs.append(out)
    return jnp.concatenate(outs, axis=1)


def chunked_encode(vae: VideoVAE, params, x, chunk: int = 2, rng=None,
                   sample: bool = False, first_latents: Optional[int] = None):
    """Serial chunked ENCODE with the conv cache carried across chunks — the
    mirror of chunked_decode for the training path (the reference encodes
    whole clips on an 80 GiB A100; at 49x480x720 the un-chunked encoder's
    first-conv activations alone are ~4 GiB x several and exceed one 16 GiB
    chip). `chunk` counts OUTPUT latent frames (4 input frames each); the
    first chunk takes the 4k+1 head frame plus the remainder, so the
    temporal first-frame split happens exactly once. Each chunk is one
    jitted graph with the incoming cache donated."""
    t = x.shape[1]
    ct = vae.cfg.temporal_compress_times
    assert (t - 1) % ct == 0, f"clip length {t} is not 4k+1"
    t_lat = (t - 1) // ct + 1
    rem = t_lat % chunk
    first = (chunk + rem) if first_latents is None else first_latents
    assert first >= 1 and (t_lat - first) % chunk == 0, (t_lat, first, chunk)

    bounds = [(0, 1 + (first - 1) * ct)]
    while bounds[-1][1] < t:
        s = bounds[-1][1]
        bounds.append((s, s + chunk * ct))

    run_first, run_next = _encode_appliers(vae)
    outs = []
    cache = None
    for i, (s, e) in enumerate(bounds):
        k = None
        if sample and rng is not None:
            rng, k = jax.random.split(rng)
        xc = x[:, s:e]
        if cache is None:
            out, cache = run_first(params, xc, k, sample and k is not None)
        else:
            out, cache = run_next(params, cache, xc, k, sample and k is not None)
        outs.append(out)
    return jnp.concatenate(outs, axis=1)


def spatial_tiled_decode(vae: VideoVAE, params, z, chunk: int = 2,
                         first_latents: Optional[int] = None,
                         tiles: int = 2, halo: int = 8):
    """Chunked decode in `tiles` overlapping WIDTH tiles with a linear
    crossfade over the halo — the community "tiled VAE" recipe for decoders
    whose full-frame activations exceed one device's HBM (the real 480x720
    CogVideoX geometry compiles to ~16.2 GiB on a 15.75 GiB v5e even at
    bf16/2-latent chunks; two 53-wide latent tiles fit comfortably).

    Exact in tile interiors (convs see `halo` latent pixels = 8*halo output
    pixels of real context, beyond the decoder's receptive field for the
    default 8); the spatial GroupNorm statistics are per-tile — the same
    class of approximation the temporal chunking already carries.
    """
    b, t, h, w, c = z.shape
    if tiles <= 1:
        return chunked_decode(vae, params, z, chunk, first_latents)
    sf = 2 ** (len(vae.cfg.ch_mult) - 1)   # spatial upsample factor (8)
    xs = np.linspace(0, w, tiles + 1).astype(int)
    outs = []
    for i in range(tiles):
        x0 = max(xs[i] - halo, 0)
        x1 = min(xs[i + 1] + halo, w)
        tile = chunked_decode(vae, params, z[:, :, :, x0:x1], chunk, first_latents)
        outs.append((tile, x0 * sf, xs[i] * sf, xs[i + 1] * sf))

    out_dtype = outs[0][0].dtype
    full = jnp.zeros(outs[0][0].shape[:3] + (w * sf, outs[0][0].shape[-1]),
                     jnp.float32)
    weight = jnp.zeros((w * sf,), jnp.float32)
    for tile, off, lo, hi in outs:
        tw = tile.shape[3]
        # linear ramp over the halo region, flat inside [lo, hi)
        pos = jnp.arange(tw, dtype=jnp.float32) + off
        ramp_in = jnp.clip((pos - (lo - halo * sf)) / max(halo * sf, 1), 0.0, 1.0)
        ramp_out = jnp.clip(((hi + halo * sf) - pos) / max(halo * sf, 1), 0.0, 1.0)
        wgt = jnp.minimum(ramp_in, ramp_out)
        full = full.at[:, :, :, off:off + tw].add(
            tile.astype(jnp.float32) * wgt[None, None, None, :, None])
        weight = weight.at[off:off + tw].add(wgt)
    blended = full / jnp.maximum(weight, 1e-6)[None, None, None, :, None]
    return blended.astype(out_dtype)
