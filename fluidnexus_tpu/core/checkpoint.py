"""Checkpointing: orbax for param trees, plus flat-npz fallback.

The reference has three checkpoint formats (SURVEY §5: per-frame npys,
Lightning ckpt, SAT iteration dirs). This framework: particle stages keep the
reference npy format (splat/dynamics.py); network params use orbax (or npz).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_params(path: str, params: Any):
    """Orbax if available, else flat npz with /-joined keys.

    flax Partitioned/AxisMetadata boxes are UNBOXED first: orbax would
    serialize a box as a {value, names, ...} subtree, which silently changes
    the tree structure on restore (kernel leaves come back as dicts — found
    by the train_video full-state resume test). Checkpoints are therefore
    always plain array trees; reshard on load via param_shardings /
    shard_for_generation."""
    try:
        import flax.linen as nn

        params = jax.tree.map(
            lambda x: x.unbox() if isinstance(x, nn.meta.AxisMetadata) else x,
            params, is_leaf=lambda x: isinstance(x, nn.meta.AxisMetadata))
    except Exception:
        pass
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), params, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
        flat = {}

        def add(prefix, tree):
            for k, v in tree.items():
                key = f"{prefix}/{k}" if prefix else str(k)
                if isinstance(v, dict):
                    add(key, v)
                else:
                    flat[key] = np.asarray(v)

        add("", params)
        np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
        return path


def rebox_like(template: Any, plain: Any):
    """Re-wrap a plain (checkpoint-loaded) tree in the flax Partitioned /
    AxisMetadata boxes of `template` (a freshly-initialized tree), restoring
    the logical-axis metadata that param_shardings / zero_shard_opt_state
    read. Non-boxed positions pass through."""
    import flax.linen as nn

    def is_box(x):
        return isinstance(x, nn.meta.AxisMetadata)

    return jax.tree.map(
        lambda t, v: t.replace_boxed(v) if is_box(t) else v,
        template, plain, is_leaf=is_box)


def load_params_prefer_ema(path: str):
    """Load `<path>_ema` when it exists, else `<path>` — FusedEmaAdam parity:
    the reference samples from EMA weights (sft_pi2v_*.yaml optimizer block),
    and train_video saves the EMA-merged tree as the `_ema` sibling."""
    base = path.rstrip("/")
    if base.endswith(".npz"):
        base = base[:-4]
    ema = base + "_ema"
    if os.path.isdir(ema) or os.path.exists(ema) or os.path.exists(ema + ".npz"):
        return load_params(ema)
    return load_params(path)


def load_params(path: str):
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    out: dict = {}
    for key in data.files:
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[key]
    return out
