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
    """Orbax if available, else flat npz with /-joined keys."""
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


def load_params_prefer_ema(path: str):
    """Load `<path>_ema` when it exists, else `<path>` — FusedEmaAdam parity:
    the reference samples from EMA weights (sft_pi2v_*.yaml optimizer block),
    and train_video saves the EMA-merged tree as the `_ema` sibling."""
    ema = path.rstrip("/") + "_ema"
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
