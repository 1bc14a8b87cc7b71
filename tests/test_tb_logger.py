"""TrainLogger: event files written, shapes accepted, no-op when disabled.
Parity target: FluidDynamics/helpers/helper_train.py:29-45 (SummaryWriter
rooted at model_path) + the rendered-grid add_images calls."""
import os

import numpy as np

from fluidnexus_tpu.utils.tb import TrainLogger


def test_logger_writes_event_file(tmp_path):
    lg = TrainLogger(str(tmp_path))
    assert lg.enabled
    lg.scalar("loss/total", 0.5, 1)
    lg.scalars("diag", {"rho": 1.01, "bad": np.zeros(3)}, 2)  # non-scalar skipped
    lg.image("render/hw", np.random.rand(8, 12), 1)           # (H,W)
    lg.image("render/hwc", np.random.rand(8, 12, 3), 1)       # (H,W,C)
    lg.image("render/chw", np.random.rand(3, 8, 12), 1)       # (C,H,W)
    lg.add_scalar("alias", 1.0, 3)                            # SummaryWriter alias
    lg.add_image("alias_img", np.random.rand(4, 4), 3)
    lg.text("config", "k: 3.0")
    lg.close()
    events = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert events, "no event file written"
    assert os.path.getsize(tmp_path / events[0]) > 100


def test_logger_disabled_noop():
    lg = TrainLogger(None)
    assert not lg.enabled
    lg.scalar("x", 1.0, 0)
    lg.image("y", np.zeros((4, 4)), 0)
    lg.flush()
    lg.close()


def test_image_grid_tiles_batches(tmp_path):
    """ImageLogger-style grids (custom_callbacks.py:108-115): N images tile
    into ceil(N/ncol) x ncol; NCHW and NHW accepted; zero-pad the tail."""
    lg = TrainLogger(str(tmp_path))
    lg.image_grid("grid/nhwc", np.random.rand(5, 6, 7, 3), 1, ncol=2)  # 3x2 grid
    lg.image_grid("grid/nchw", np.random.rand(4, 3, 6, 7), 1)
    lg.image_grid("grid/nhw", np.random.rand(2, 6, 7), 1)
    lg.close()
    events = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert events and os.path.getsize(tmp_path / events[0]) > 100


def test_device_memory_stats_shape():
    """CUDACallback parity: MiB-keyed dict (possibly empty on CPU), floats."""
    from fluidnexus_tpu.utils.tb import device_memory_stats

    stats = device_memory_stats()
    assert isinstance(stats, dict)
    for v in stats.values():
        assert isinstance(v, float) and v >= 0
