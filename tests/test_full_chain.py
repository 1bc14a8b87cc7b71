"""Cross-stage integration: the on-disk handoffs between all four
reconstruction stages plus the generative refinement, on tiny synthetic data.
This is the composition the reference runs as 20+ separate shell scripts."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.core.config import Config
from fluidnexus_tpu.data.readers import SceneInfo
from tests.test_train_physical import smoke_like_scene


@pytest.mark.slow
def test_recon_to_leveltwo_to_future_chain(tmp_path):
    from fluidnexus_tpu.pipelines.future_simulation import predict
    from fluidnexus_tpu.pipelines.train_physical_particle import train as train_physical
    from fluidnexus_tpu.pipelines.train_visual_particle import train as train_level_two

    scene = smoke_like_scene(n_frames=2)
    scene = SceneInfo(point_cloud=None, train_cameras=scene.train_cameras,
                      test_cameras=scene.train_cameras[:2],
                      nerf_normalization=scene.nerf_normalization)

    cfg = Config()
    o, m = cfg.optim, cfg.model
    m.model_path = str(tmp_path / "recon")
    m.hidden_capacity = 8192
    m.init_hidden_radius_max = 0.03
    m.visual_capacity = 2048
    m.init_visual_num_pts = 100
    m.init_thick_visual_num_pts = 0
    o.iterations_per_time_first = 3
    o.iterations_per_time_current = 2
    o.iterations_per_time_current_max = 2
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
    cfg.pipe.tile_capacity = 64
    cfg.pipe.chunk = 16
    cfg.pipe.dup_x = 3
    cfg.pipe.dup_y = 3

    # stage 2: physical reconstruction
    result = train_physical(cfg, scene_info=scene, log=lambda *a: None)
    assert result["metrics"]

    # stage 3: level-two appearance fit consumes the recon checkpoint
    cfg2 = Config()
    cfg2.model = m.__class__(**{**m.__dict__})
    cfg2.optim = o.__class__(**{**o.__dict__})
    cfg2.pipe = cfg.pipe
    cfg2.model.load_path = str(tmp_path / "recon")
    cfg2.model.model_path = str(tmp_path / "lvl2")
    cfg2.optim.fit_color = True
    cfg2.optim.fit_opacity = True
    cfg2.optim.iterations_per_time_current_level_two = 2
    cfg2.optim.iterations_per_time_current_level_two_max = 2
    lvl2 = train_level_two(cfg2, scene_info=scene, log=lambda *a: None)
    assert len(lvl2) == 2
    assert os.path.exists(tmp_path / "lvl2" / "checkpoint_level_two" / "frame_001_visual_color.npy")

    # stage 4: future rollout consumes recon (+ level-two attrs)
    cfg3 = Config()
    cfg3.model = m.__class__(**{**m.__dict__})
    cfg3.optim = o.__class__(**{**o.__dict__})
    cfg3.pipe = cfg.pipe
    cfg3.model.load_path = str(tmp_path / "recon")
    cfg3.model.level_two_load_path = str(tmp_path / "lvl2")
    cfg3.model.model_path = str(tmp_path / "future")
    cfg3.optim.use_level_two_in_future = True
    cfg3.optim.future_pred_frames = 2
    cfg3.optim.solver_iterations_future = 2
    cfg3.optim.p0_future = 1.2
    cfg3.optim.decay_frames_future_p0 = 2
    frames = predict(cfg3, scene_info=scene, log=lambda *a: None, save_renders=True)
    assert len(frames) == 2
    renders = sorted(os.listdir(tmp_path / "future" / "training_render"))
    assert len(renders) > 0

    # stage 5: generative refinement consumes the simulation renders
    from fluidnexus_tpu.diffusion.video.dit import VideoDiTConfig
    from fluidnexus_tpu.diffusion.video.engine import VideoEngine
    from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig
    from fluidnexus_tpu.pipelines.gen_future_video import refine_future
    from fluidnexus_tpu.pipelines.gen_refine_video import RefineConfig

    h = w = 32
    win, pre = 9, 5
    lat_t = (win - 1) // 4 + 1
    eng = VideoEngine(
        VideoDiTConfig(hidden_size=32, num_layers=1, num_heads=2, text_hidden_size=16,
                       text_length=4, latent_frames=lat_t, latent_height=h // 8,
                       latent_width=w // 8, dtype=jnp.float32),
        VAE3DConfig(ch=8, ch_mult=(1, 1, 1, 2), num_res_blocks=1),
    )
    params = eng.init_params(jax.random.PRNGKey(0))
    vae_params = eng.init_vae_params(jax.random.PRNGKey(1), frames=5, height=h, width=w)

    # recon frames folder: the capture frames (prefix source)
    from PIL import Image

    recon_frames = tmp_path / "capture"
    os.makedirs(recon_frames)
    rng = np.random.default_rng(0)
    for i in range(10):
        Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(
            recon_frames / f"{i:03d}.png")
    # lay the sim renders out over the window body range [since, since+win-pre)
    import shutil

    sim_dir = tmp_path / "future" / "training_render"
    since = pre  # prefix frames 0..pre-1 come from the capture
    sim_files = sorted(f for f in os.listdir(sim_dir) if "train00" in f)
    assert sim_files
    for j in range(since, since + win - pre):
        shutil.copy(sim_dir / sim_files[j % len(sim_files)],
                    sim_dir / f"render_frame{j:03d}_train00_0000.png")
    out = refine_future(
        eng, params, vae_params, jnp.zeros((1, 4, 16)), jnp.zeros((1, 4, 16)),
        str(sim_dir), str(recon_frames), str(tmp_path / "gen"),
        camera_name="train00", capture_part="smoke", gen_future_since=since,
        strength=0.6, cfg=RefineConfig(window_frames=win, prefix_frames=pre,
                                       num_steps=3, height=h, width=w),
        rng=jax.random.PRNGKey(2), log=lambda *a: None,
    )
    outs = sorted(os.listdir(out))
    assert len(outs) == win - pre
    # output folder follows the reader convention so stage-2 re-training with
    # gen_future_since picks it up
    assert f"cogvxlora5b_future_prefix9_i2v3_strength0d6_start{since}_smoke_rawsize" in out


def test_scalar_real_loader(tmp_path):
    """ScalarReal layout: colmap_frames/colmap_{t}/{file_path}.png, gray."""
    import json

    from fluidnexus_tpu.core.config import Config
    from fluidnexus_tpu.data.scene import read_scene
    from PIL import Image

    rng = np.random.default_rng(0)
    frames = []
    for cam in range(2):
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 2.0 + cam]
        frames.append({"file_path": f"train0{cam}", "transform_matrix": c2w.tolist(),
                       "camera_hw": [20, 24], "camera_angle_x": 0.7})
        for t in range(2):
            d = tmp_path / "colmap_frames" / f"colmap_{t}"
            os.makedirs(d, exist_ok=True)
            Image.fromarray(rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)).save(
                d / f"train0{cam}.png")
    # train_views "01" (partial) selects transforms_train_01.json (fluid_nexus_real.py:46-57)
    for name, sel in (("transforms_train_01.json", [0, 1]), ("transforms_test.json", [1])):
        with open(tmp_path / name, "w") as f:
            json.dump({"near": 0.1, "far": 10.0, "frames": [frames[i] for i in sel]}, f)

    cfg = Config()
    cfg.model.data_path = str(tmp_path)
    cfg.model.loader = "scalar_real"
    cfg.model.gray_image = True
    cfg.model.start_time = 0
    cfg.model.duration = 2
    cfg.model.train_views = "01"
    info = read_scene(cfg)
    assert len(info.train_cameras) == 4
    assert info.train_cameras[0].image.ndim == 2  # grayscale
