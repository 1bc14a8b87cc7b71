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


def param_shardings(params, mesh: Mesh):
    """NamedShardings from the params' own flax logical-axis metadata
    (nn.with_logical_partitioning boxes); unannotated leaves replicate."""
    return nn.logical_to_mesh_sharding(nn.get_partition_spec(params), mesh, LOGICAL_RULES)


def _is_meta(x):
    return isinstance(x, nn.meta.AxisMetadata)


def _zero_extend(spec: P, shape, dp: int) -> P:
    """ZeRO: additionally shard the largest still-unsharded, dp-divisible dim
    along 'data' (DeepSpeed's optimizer-state partitioning over the DP group,
    configs/sft_pi2v_*.yaml deepspeed block)."""
    parts = list(spec) + [None] * (len(shape) - len(spec))
    if "data" in parts or not shape:
        return P(*parts)
    best = None
    for axis, size in enumerate(shape):
        if parts[axis] is None and size % dp == 0 and size >= dp:
            if best is None or size > shape[best]:
                best = axis
    if best is not None:
        parts[best] = "data"
    return P(*parts)


def zero_shard_opt_state(opt_state, mesh: Mesh):
    """Shard optimizer state: each moment inherits ITS PARAM's tensor-parallel
    layout (the flax logical-axis metadata survives optax's tree_zeros_like),
    then the largest remaining dim is sharded along 'data' (ZeRO)."""
    dp = mesh.shape["data"]
    shardings = nn.logical_to_mesh_sharding(nn.get_partition_spec(opt_state),
                                            mesh, LOGICAL_RULES)

    def put(x, s):
        arr = x.unbox() if _is_meta(x) else x
        if not hasattr(arr, "shape"):
            return x
        spec = _zero_extend(s.spec, arr.shape, dp)
        out = jax.device_put(arr, NamedSharding(mesh, spec))
        return x.replace_boxed(out) if _is_meta(x) else out

    return jax.tree.map(put, opt_state, shardings, is_leaf=_is_meta)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-leading sharding over the data axis."""
    return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
