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


def cp_split_time(x, mesh: Mesh):
    """Lay the time axis out over the 'time' mesh axis (the reference's
    _conv_split, cp_enc_dec.py:137-163 — here just a sharding constraint)."""
    return jax.device_put(x, NamedSharding(mesh, P(None, "time", None, None, None)))


def cp_gather_time(x):
    """_conv_gather equivalent: materialize the full sequence on all devices."""
    return jax.device_put(x, None) if x.is_fully_addressable else x
