"""Device mesh, tensor-parallel sharding rules, and ZeRO-style optimizer
sharding.

The reference's distributed substrate is NCCL process groups owned by
SAT mpu (dp/mp/cp) + DeepSpeed ZeRO-2 (SURVEY §2.6). TPU-native equivalent:
ONE jax mesh with named axes
    data   — data parallel (DDP / ZeRO grouping axis)
    model  — tensor parallel (SAT ColumnParallelLinear, dit_video_concat.py:10)
    time   — context/sequence parallel for the VAE temporal axis
GSPMD inserts the collectives; these helpers only pin layouts.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# flax logical axis -> mesh axis. The DiT annotates kernels with
# ('embed','heads') / ('embed','mlp') etc. — 'heads' and 'mlp' split over the
# model axis = Megatron column parallel; the following row-parallel matmul
# contracts over the sharded axis and GSPMD emits the reduce (the all-reduce
# NCCL would do).
LOGICAL_RULES = (
    ("embed", None),
    ("heads", "model"),
    ("mlp", "model"),
    ("batch", "data"),
    ("time", "time"),
)


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: int = 1, time: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = n_devices or devices.size
    devices = devices[:n]
    dp = dp or (n // (tp * time))
    assert dp * tp * time == n, f"{dp}x{tp}x{time} != {n}"
    return Mesh(devices.reshape(dp, tp, time), axis_names=("data", "model", "time"))


def shard_params_logical(params, mesh: Mesh, logical_specs):
    """Apply flax logical-axis metadata to concrete NamedShardings."""
    specs = nn.logical_to_mesh_sharding(logical_specs, mesh, LOGICAL_RULES)
    return jax.device_put(params, specs)


def zero_shard_opt_state(opt_state, mesh: Mesh):
    """ZeRO-equivalent: shard optimizer moments along the data axis on their
    largest divisible dimension (DeepSpeed stage-2's optimizer-state
    partitioning, configs/sft_pi2v_*.yaml deepspeed block)."""
    dp = mesh.shape["data"]

    def spec_for(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        for axis, size in enumerate(x.shape):
            if size % dp == 0 and size >= dp:
                parts = [None] * x.ndim
                parts[axis] = "data"
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, spec_for(x)), opt_state)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-leading sharding over the data axis."""
    return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
