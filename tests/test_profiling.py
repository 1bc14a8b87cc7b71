"""XLA profiler integration + stage timers (SURVEY §5 tracing/profiling)."""
import os
import time

from fluidnexus_tpu.utils.profiling import StageTimer, annotate, trace


def test_trace_writes_profile_dump(tmp_path):
    import jax
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        with annotate("matmul_stage"):
            x = jnp.ones((64, 64))
            jax.block_until_ready(x @ x)
    prof = os.path.join(tmp_path, "plugins", "profile")
    assert os.path.isdir(prof) and os.listdir(prof), "no profiler dump written"


def test_trace_noop_without_dir():
    with trace(""):
        pass
    with trace(None):
        pass


def test_stage_timer_accumulates():
    t = StageTimer()
    for _ in range(3):
        with t.stage("a"):
            time.sleep(0.01)
    with t.stage("b"):
        pass
    assert t.counts["a"] == 3 and t.counts["b"] == 1
    assert t.totals["a"] >= 0.03
    assert set(t.summary()) == {"a", "b"}
    assert "a" in t.report() and "3x" in t.report()
