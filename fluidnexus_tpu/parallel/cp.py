"""Context parallelism for the causal 3D VAE's temporal axis.

Parity target: CogVideoX/vae_modules/cp_enc_dec.py — _conv_split/_conv_gather
(:137-196) shard frames across cp ranks keeping the conv halo, and
_pass_from_previous_rank (:199-242) P2P-sends the (k_t - 1)-frame halo to the
next rank. TPU-native: the video is sharded over the 'time' mesh axis with
shard_map, and the halo exchange is a single jax.lax.ppermute over ICI.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange_time(x_local, kernel_t: int, axis_name: str = "time"):
    """Prepend the previous shard's last (kernel_t - 1) frames; the first
    shard gets a replicate of its own first frame (the reference's causal
    first-frame pad). x_local: (B, T_local, H, W, C)."""
    pad = kernel_t - 1
    if pad == 0:
        return x_local
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    tail = x_local[:, -pad:]
    # send my tail to the NEXT rank (ring shift by +1)
    prev_tail = jax.lax.ppermute(tail, axis_name, [(i, (i + 1) % n) for i in range(n)])
    first_pad = jnp.repeat(x_local[:, :1], pad, axis=1)
    front = jnp.where(idx == 0, first_pad, prev_tail)
    return jnp.concatenate([front, x_local], axis=1)


def cp_causal_conv_time(conv_fn: Callable, mesh: Mesh, kernel_t: int = 3):
    """Wrap a per-shard temporal-conv function into a time-sharded SPMD op.

    conv_fn: (B, T_local + kernel_t - 1, H, W, C) -> (B, T_local, H, W, C')
    (i.e. a VALID-in-time conv applied after the halo is attached).
    Returns a function over the full (B, T, H, W, C) array laid out with T
    sharded over the 'time' mesh axis.
    """

    def shard_fn(x_local):
        xp = halo_exchange_time(x_local, kernel_t)
        return conv_fn(xp)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=P(None, "time", None, None, None),
        out_specs=P(None, "time", None, None, None),
    )


def _front_pad(x, pad: int):
    """Prepend `pad` replicated copies of frame 0 along the time axis."""
    if pad == 0:
        return x
    return jnp.concatenate([jnp.repeat(x[:, :1], pad, axis=1), x], axis=1)


def cp_vae_encode(vae, params, x, mesh: Mesh, axis: str = "time", sample=False, rng=None):
    """Time-sharded (context-parallel) VideoVAE encode, EXACTLY equal to the
    serial pass (parity: cp_enc_dec.py:137-242's split/halo scheme, redesigned
    for uniform shard_map shards).

    The causal VAE's first frame is special (replicate pad, unpooled,
    unduplicated). Uniform shards are recovered by FRONT-PADDING the video
    with P replicated copies of frame 0, P odd and T+P divisible by
    n * 2^levels: pooling pairs then stay aligned (the pad block keeps
    collapsing onto frame 0), halo exchanges carry exact neighbor frames, and
    group-norm statistics psum over shards with the pads masked out.
    x: (B, T, H, W, C) with T = 1 + k * temporal_compress_times.
    """
    from fluidnexus_tpu.diffusion.video.vae3d import CPState

    n = mesh.shape[axis]
    lv = vae.cfg.temporal_compress_level
    t = x.shape[1]
    assert t % 2 == 1, f"causal VAE expects odd frame count, got {t}"
    mult = max(n << lv, 2)
    pad = (-t) % mult  # odd: t odd, mult even
    xp = _front_pad(x, pad)

    def fn(p, xl, key):
        return vae.apply({"params": p}, xl, rng=key, sample=sample,
                         cp=CPState(axis, pad, n), method=vae.encode)

    spec = P(None, axis, None, None, None)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    z = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), spec, P()),
        out_specs=spec, check_vma=False,
    )(params, xp, rng)
    pad_z = (pad + 1) // (1 << lv) - 1
    return z[:, pad_z:]


def cp_vae_decode(vae, params, z, mesh: Mesh, axis: str = "time"):
    """Time-sharded VideoVAE decode, exactly equal to the serial pass (see
    cp_vae_encode; decode only needs T_z + P divisible by n with P odd)."""
    from fluidnexus_tpu.diffusion.video.vae3d import CPState

    n = mesh.shape[axis]
    lv = vae.cfg.temporal_compress_level
    t = z.shape[1]
    assert t % 2 == 1, f"causal VAE expects odd latent count, got {t}"
    # smallest ODD pad with (t + pad) % n == 0 (odd t makes one exist for all n)
    pad = next(p for p in range(1, 2 * n + 2, 2) if (t + p) % n == 0)
    zp = _front_pad(z, pad)

    def fn(p, zl):
        return vae.apply({"params": p}, zl, cp=CPState(axis, pad, n), method=vae.decode)

    spec = P(None, axis, None, None, None)
    out = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), spec),
        out_specs=spec, check_vma=False,
    )(params, zp)
    pad_out = (pad + 1) * (1 << lv) - 1
    return out[:, pad_out:]


def cp_split_time(x, mesh: Mesh):
    """Lay the time axis out over the 'time' mesh axis (the reference's
    _conv_split, cp_enc_dec.py:137-163 — here just a sharding constraint)."""
    return jax.device_put(x, NamedSharding(mesh, P(None, "time", None, None, None)))


def cp_gather_time(x):
    """_conv_gather equivalent: materialize the full sequence on all devices."""
    return jax.device_put(x, None) if x.is_fully_addressable else x
