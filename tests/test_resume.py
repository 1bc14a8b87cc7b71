import os

import numpy as np
import pytest

from fluidnexus_tpu.core.config import Config
from fluidnexus_tpu.data.readers import SceneInfo
from fluidnexus_tpu.pipelines.train_physical_particle import train
from tests.test_train_physical import smoke_like_scene


def tiny_cfg(tmp_path):
    cfg = Config()
    o, m = cfg.optim, cfg.model
    m.model_path = str(tmp_path)
    m.hidden_capacity = 8192
    m.init_hidden_radius_max = 0.03
    m.visual_capacity = 4096
    m.init_visual_num_pts = 150
    m.init_thick_visual_num_pts = 0
    o.iterations_per_time_first = 4
    o.iterations_per_time_current = 3
    o.iterations_per_time_current_max = 3
    o.stable_iterations = 1
    o.solver_iterations = 2
    o.secs = 0.033
    o.alpha = 0.0
    o.p0 = 1.5
    o.k = 3.0
    o.H = 2.0
    o.init_hidden_velocity = 100.0
    o.emit_ratio_hidden = 1.0
    o.emit_ratio_visual = 1.0
    o.batch = 1
    o.lambda_exyz = 0.1
    o.lambda_gas_constraints = 0.0
    o.lambda_next_gas_constraints = 0.0
    cfg.pipe.tile_capacity = 64
    cfg.pipe.chunk = 16
    cfg.pipe.dup_x = 3
    cfg.pipe.dup_y = 3
    return cfg


@pytest.mark.slow
def test_resume_from_frame(tmp_path):
    scene = smoke_like_scene(n_frames=3)
    # test cameras for the held-out eval path
    scene = SceneInfo(point_cloud=None, train_cameras=scene.train_cameras,
                      test_cameras=scene.train_cameras[:3],
                      nerf_normalization=scene.nerf_normalization)
    cfg = tiny_cfg(tmp_path)
    result = train(cfg, scene_info=scene, log=lambda *a: None)
    assert len(result["metrics"]) == 2
    # frame-1 metrics include held-out psnr (test cams exist for t=... only t
    # indices present in test cameras; t=0 frames only -> none at t>=1)

    # resume at frame 2: should produce exactly the frame-2 entry
    result2 = train(cfg, scene_info=scene, log=lambda *a: None, resume_from_frame=2)
    assert len(result2["metrics"]) == 1
    assert result2["metrics"][0]["frame"] == 2
    assert np.isfinite(result2["metrics"][0]["loss"])
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoint", "frame_002_xyz.npy"))
