import os

import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.core.config import Config
from fluidnexus_tpu.pipelines.future_simulation import predict
from fluidnexus_tpu.pipelines.train_visual_particle import train as train_level_two
from fluidnexus_tpu.sim.pbf import PBFParams
from fluidnexus_tpu.sim.state import make_particle_state, make_visual_state
from fluidnexus_tpu.splat.dynamics import constant_visual_attrs, save_hidden, save_visual
from tests.test_train_physical import smoke_like_scene


def fake_level_one_checkpoint(path, n_frames=2, n_hidden=100, n_vis=60, seed=0):
    rng = np.random.default_rng(seed)
    params = PBFParams(h=2.0, p0=1.5, k=3.0, secs=0.033)
    for t in range(n_frames):
        base = np.array([0.326, 0.05 + 0.02 * t, -0.3], np.float32) * 100
        hx = (rng.uniform(-3, 3, (n_hidden, 3)) + base).astype(np.float32)
        st = make_particle_state(256, jnp.asarray(hx), init_velocity_y=50.0)
        st = st._replace(estimate_xyz=st.xyz)
        save_hidden(st, params, path, t)
        vx = (rng.uniform(-3, 3, (n_vis, 3)) + base).astype(np.float32)
        vis = make_visual_state(128, jnp.asarray(vx))
        attrs = constant_visual_attrs(128, 1)
        save_visual(vis, attrs, path, t)  # saves world-unit xyz (scale=True)
    return params


@pytest.mark.slow
def test_future_simulation_rollout(tmp_path):
    load_path = str(tmp_path / "recon")
    out_path = str(tmp_path / "future")
    fake_level_one_checkpoint(os.path.join(load_path, "checkpoint"))

    cfg = Config()
    o, m = cfg.optim, cfg.model
    m.load_path = load_path
    m.model_path = out_path
    m.hidden_capacity = 1024
    m.visual_capacity = 512
    o.future_pred_frames = 3
    o.solver_iterations_future = 2
    o.p0 = 1.5
    o.p0_future = 1.2
    o.decay_frames_future_p0 = 2
    o.H = 2.0
    o.k = 3.0
    o.secs = 0.033
    o.alpha = 0.0
    o.emit_ratio_hidden = 1.0
    o.emit_ratio_visual = 1.0
    o.init_hidden_velocity = 100.0
    cfg.pipe.tile_capacity = 32
    cfg.pipe.chunk = 8
    cfg.pipe.dup_x = 3
    cfg.pipe.dup_y = 3

    scene = smoke_like_scene(n_frames=2)
    frames = predict(cfg, scene_info=scene, log=lambda *a: None, save_renders=True)

    assert len(frames) == 3
    # p0 decays from the reconstruction value toward p0_future
    # (future_simulation.py:123: fut=0 -> p0_recon, fut>=decay -> p0_future)
    assert frames[0]["p0"] == 1.5
    assert frames[-1]["p0"] == 1.2
    assert all(np.isfinite(f["p_ratio"]) for f in frames)
    assert frames[-1]["hidden"] > 100  # emission grew the particle set
    # checkpoints for future frames written at indices n_frames..n_frames+2
    for t in (2, 3, 4):
        assert os.path.exists(os.path.join(out_path, "checkpoint", f"frame_{t:03d}_xyz.npy"))
    # renders written for every camera of the t=0 rig
    renders = os.listdir(os.path.join(out_path, "training_render"))
    assert len(renders) == 3 * 3  # 3 future frames x 3 cameras


def test_level_two_fit(tmp_path):
    load_path = str(tmp_path / "recon")
    out_path = str(tmp_path / "lvl2")
    fake_level_one_checkpoint(os.path.join(load_path, "checkpoint"), n_frames=2)

    cfg = Config()
    o, m = cfg.optim, cfg.model
    m.load_path = load_path
    m.model_path = out_path
    m.visual_capacity = 128
    o.fit_color = True
    o.fit_opacity = True
    o.fit_scales = True
    o.fit_rotation = True
    o.init_scales_w_xyz_dist = True
    o.inherit_prev_color = True
    o.inherit_prev_opacity = True
    o.inherit_prev_scales = True
    o.inherit_prev_rotation = True
    o.lambda_consistency_color = 10.0
    o.lambda_consistency_opacity = 8.0
    o.lambda_consistency_rotation = 0.1
    o.lambda_reg_scaling = 1.0
    o.scaling_reg_ratio_threshold = 4.0
    o.iterations_per_time_current_level_two = 6
    o.iterations_per_time_current_level_two_max = 6
    o.batch = 1
    cfg.pipe.tile_capacity = 32
    cfg.pipe.chunk = 8
    cfg.pipe.dup_x = 3
    cfg.pipe.dup_y = 3

    scene = smoke_like_scene(n_frames=2)
    results = train_level_two(cfg, scene_info=scene, log=lambda *a: None)
    assert len(results) == 2
    assert all(np.isfinite(r["loss"]) for r in results)
    for t in range(2):
        for name in ("visual_xyz", "visual_color", "visual_scales", "visual_rotation", "visual_opacity"):
            assert os.path.exists(
                os.path.join(out_path, "checkpoint_level_two", f"frame_{t:03d}_{name}.npy"))
    # fitted scales should differ from the constant init
    sc = np.load(os.path.join(out_path, "checkpoint_level_two", "frame_001_visual_scales.npy"))
    assert not np.allclose(sc, -5.9)

def test_future_simulation_renders_with_demo_cameras(tmp_path):
    """The demo-camera sweep rig drives the future render path end-to-end:
    cameras come from read_cameras_real_capture(use_demo_cameras=True) and
    predict() renders the t=0 rig (the reference hardcodes time_index=0,
    entries_fluid_nexus/future_simulation.py:179)."""
    import json

    from fluidnexus_tpu.data.readers import read_cameras_real_capture
    from fluidnexus_tpu.data.scene import SceneInfo

    root = str(tmp_path / "data")
    os.makedirs(root)
    rng = np.random.default_rng(3)
    raw = np.stack([np.eye(4) for _ in range(4)])
    # demo poses orbit ~2 units from the plume (world units)
    raw[:, :3, 3] = np.array([0.326, 0.1, -0.3]) + np.array([0, 0, 2.0]) \
        + 0.1 * rng.normal(size=(4, 3))
    np.save(os.path.join(root, "demo_cams_poses_extra.npy"), raw)
    c2w = np.eye(4)
    c2w[:3, 3] = [0, 0, 3.0]
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"frames": [{"file_path": "camera00", "transform_matrix": c2w.tolist(),
                               "camera_hw": [24, 32], "camera_angle_x": 0.8}]}, f)
    cams = read_cameras_real_capture(
        root, "transforms_train.json", duration=2, capture_part="smoke",
        use_demo_cameras=True, read_image=False)
    scene = SceneInfo(point_cloud=None, train_cameras=cams, test_cameras=[],
                      nerf_normalization={"radius": 2.0, "translate": np.zeros(3)})

    load_path = str(tmp_path / "recon")
    out_path = str(tmp_path / "future")
    fake_level_one_checkpoint(os.path.join(load_path, "checkpoint"))
    cfg = Config()
    o, m = cfg.optim, cfg.model
    m.load_path, m.model_path = load_path, out_path
    m.hidden_capacity, m.visual_capacity = 1024, 512
    m.use_demo_cameras = True
    o.future_pred_frames = 2
    o.solver_iterations_future = 1
    o.H, o.k, o.secs, o.alpha = 2.0, 3.0, 0.033, 0.0
    o.emit_ratio_hidden = o.emit_ratio_visual = 1.0
    o.init_hidden_velocity = 100.0
    cfg.pipe.tile_capacity, cfg.pipe.chunk = 32, 8
    cfg.pipe.dup_x = cfg.pipe.dup_y = 3

    frames = predict(cfg, scene_info=scene, log=lambda *a: None, save_renders=True)
    assert len(frames) == 2
    renders = sorted(os.listdir(os.path.join(out_path, "training_render")))
    # one demo camera in the t=0 rig, rendered for both future frames
    assert len(renders) == 2
    assert all("_demo000_" in r for r in renders)
