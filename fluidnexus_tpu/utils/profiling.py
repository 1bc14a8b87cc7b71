"""Tracing/profiling for the training and generation pipelines.

SURVEY §5 parity: the reference's observability is torch.cuda timing in the
Lightning CUDACallback (Zero123/helpers/custom_callbacks.py:196-216) plus
deepspeed's ``wall_clock_breakdown`` knob; the TPU-native tool is the XLA
profiler — ``jax.profiler`` traces (HLO timelines, per-op HBM/FLOP stats)
viewable in TensorBoard or xprof. This module wraps it so every pipeline can
expose a ``--profile_dir`` flag, and adds a host-side stage timer for the
coarse phase breakdown the reference prints.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """XLA profiler trace over the enclosed block; no-op when log_dir is
    falsy. Open the result with `tensorboard --logdir <dir>` (Profile tab)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named host span that shows up on the profiler timeline (and is free
    when no trace is active)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class _StageHandle:
    __slots__ = ("block_on",)

    def __init__(self, block_on=None):
        self.block_on = block_on


class StageTimer:
    """Accumulating wall-clock timer for named pipeline stages.

    Pass the stage's output arrays as `block_on` to wait for async dispatch
    before stopping the clock, so the stage's time covers the device work it
    launched — otherwise jax returns futures and the device time is billed to
    whichever later stage first blocks (e.g. a log line's float(loss)).
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        """Yields a holder: set `holder.block_on = <stage outputs>` inside the
        block (or pass block_on= up front for values that already exist) and
        the timer waits for them before stopping the clock."""
        holder = _StageHandle(block_on)
        t0 = time.perf_counter()
        try:
            yield holder
        finally:
            if holder.block_on is not None:
                import jax

                jax.block_until_ready(holder.block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        """Mean seconds per stage call."""
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def report(self) -> str:
        parts = [f"{k} {self.totals[k]:.3f}s/{self.counts[k]}x"
                 for k in sorted(self.totals, key=self.totals.get, reverse=True)]
        return " | ".join(parts)
