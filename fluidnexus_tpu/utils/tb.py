"""TensorBoard observability for the training pipelines.

Parity target: FluidDynamics/helpers/helper_train.py:29-45
(prepare_output_and_logger: SummaryWriter rooted at model_path) and the
per-view loss scalars / solver diagnostics / rendered-image grids the
reference logs from train_physical_particle.py:151-154,408-424,699-741.

The writer is optional: when tensorboard isn't importable every method is a
no-op, so pipelines never gate on it. Images are accepted as (H,W), (H,W,C)
or (C,H,W) float arrays in [0,1] (numpy or jax).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


class TrainLogger:
    """SummaryWriter wrapper rooted at ``model_path`` like the reference."""

    def __init__(self, model_path: Optional[str], enabled: bool = True):
        self._w = None
        if not (model_path and enabled):
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            os.makedirs(model_path, exist_ok=True)
            self._w = SummaryWriter(model_path)
        except Exception:
            self._w = None

    @property
    def enabled(self) -> bool:
        return self._w is not None

    def scalar(self, tag: str, value, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def scalars(self, prefix: str, values: dict, step: int):
        for k, v in values.items():
            try:
                self.scalar(f"{prefix}/{k}", float(np.asarray(v)), step)
            except (TypeError, ValueError):
                pass  # non-scalar diagnostic

    def image(self, tag: str, img, step: int):
        """(H,W) / (H,W,C) / (C,H,W) float in [0,1] -> TB image."""
        if self._w is None:
            return
        arr = np.asarray(img, np.float32)
        if arr.ndim == 2:
            arr = arr[None]                      # (1,H,W)
        elif arr.ndim == 3 and arr.shape[-1] in (1, 3) and arr.shape[0] not in (1, 3):
            arr = arr.transpose(2, 0, 1)          # HWC -> CHW
        self._w.add_image(tag, np.clip(arr, 0.0, 1.0), step)

    def image_grid(self, tag: str, imgs, step: int, ncol: int = 8):
        """Batch of images -> one tiled grid (the reference ImageLogger's
        torchvision.make_grid, helpers/custom_callbacks.py:108-115). Accepts
        (N,H,W), (N,H,W,C) or (N,C,H,W) float arrays in [0,1]."""
        if self._w is None:
            return
        arr = np.asarray(imgs, np.float32)
        if arr.ndim == 3:
            arr = arr[..., None]                 # (N,H,W,1)
        elif arr.ndim == 4 and arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):
            arr = arr.transpose(0, 2, 3, 1)      # NCHW -> NHWC
        n, h, w, c = arr.shape
        ncol = min(ncol, n)
        nrow = -(-n // ncol)
        pad = nrow * ncol - n
        if pad:
            arr = np.concatenate([arr, np.zeros((pad, h, w, c), np.float32)])
        grid = (arr.reshape(nrow, ncol, h, w, c).transpose(0, 2, 1, 3, 4)
                .reshape(nrow * h, ncol * w, c))
        self.image(tag, grid, step)

    def histogram(self, tag: str, values, step: int):
        if self._w is not None:
            self._w.add_histogram(tag, np.asarray(values).reshape(-1), step)

    def text(self, tag: str, s: str, step: int = 0):
        if self._w is not None:
            self._w.add_text(tag, s, step)

    # SummaryWriter-compatible aliases so pipelines accept either a raw
    # torch SummaryWriter or this wrapper
    def add_scalar(self, tag: str, value, step: int):
        self.scalar(tag, value, step)

    def add_image(self, tag: str, img, step: int):
        self.image(tag, img, step)

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()
            self._w = None


def device_memory_stats(device=None) -> dict:
    """Peak/in-use HBM for one device, in MiB — the TPU analog of the
    reference CUDACallback's torch.cuda.max_memory_allocated report
    (Zero123/helpers/custom_callbacks.py:196-216). Empty dict on platforms
    that don't expose allocator stats (CPU)."""
    import jax

    dev = device or jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        return {}
    out = {}
    if "peak_bytes_in_use" in stats:
        out["peak_mib"] = stats["peak_bytes_in_use"] / 2**20
    if "bytes_in_use" in stats:
        out["in_use_mib"] = stats["bytes_in_use"] / 2**20
    if "bytes_limit" in stats:
        out["limit_mib"] = stats["bytes_limit"] / 2**20
    return out
