import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.core.config import Config
from fluidnexus_tpu.core.ply import load_background_ply, save_background_ply
from fluidnexus_tpu.data.cameras import Camera
from fluidnexus_tpu.data.readers import SceneInfo
from fluidnexus_tpu.ops.rasterizer import RasterizerConfig, rasterize
from fluidnexus_tpu.pipelines.train_background import evaluate, render_view, train
from fluidnexus_tpu.splat.background import BackgroundParams


def synthetic_scene(n_cams=3, width=48, height=36, n_gauss=40, seed=0):
    """Render a known Gaussian scene into per-camera targets."""
    rng = np.random.default_rng(seed)
    gt = dict(
        means=rng.uniform(-0.5, 0.5, (n_gauss, 3)).astype(np.float32),
        cols=rng.uniform(0.1, 0.9, (n_gauss, 3)).astype(np.float32),
        ops=rng.uniform(0.5, 0.95, (n_gauss,)).astype(np.float32),
        scales=np.exp(rng.uniform(-2.6, -1.8, (n_gauss, 3))).astype(np.float32),
        rots=np.tile(np.array([1, 0, 0, 0], np.float32), (n_gauss, 1)),
    )
    cams = []
    cfg_r = RasterizerConfig(tile_capacity=64, chunk=16, dup_x=3, dup_y=3)
    for i in range(n_cams):
        ang = (i - 1) * 0.4
        ry = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]]
        )
        R = ry @ np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])  # c2w rotation
        center = ry @ np.array([0.0, 0.0, 3.0])
        T = -R.T @ center
        cam = Camera(uid=i, R=R, T=T, fovx=0.7, fovy=0.55, width=width, height=height,
                     time_idx=0)
        out = rasterize(
            jnp.asarray(gt["means"]), jnp.asarray(gt["cols"]), jnp.asarray(gt["ops"]),
            jnp.asarray(gt["scales"]), jnp.asarray(gt["rots"]),
            view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy, width=width, height=height,
            bg_color=jnp.zeros(3), config=cfg_r,
        )
        cam.image = np.asarray(out.color).transpose(1, 2, 0)
        cams.append(cam)
    return cams, gt


def test_train_background_end_to_end(tmp_path):
    cams, gt = synthetic_scene()
    info = SceneInfo(
        point_cloud=np.random.default_rng(1).uniform(-0.5, 0.5, (200, 3)).astype(np.float32),
        train_cameras=cams, test_cameras=cams[:1],
        nerf_normalization={"radius": 3.0, "translate": np.zeros(3)},
    )
    cfg = Config()
    cfg.model.model_path = str(tmp_path)
    cfg.optim.iterations = 120
    cfg.optim.densify_from_iter = 30
    cfg.optim.densification_interval = 40
    cfg.optim.densify_until_iter = 100
    cfg.optim.opacity_reset_interval = 1000
    cfg.pipe.tile_capacity = 64
    cfg.pipe.chunk = 16
    cfg.pipe.dup_x = 3
    cfg.pipe.dup_y = 3
    cfg.save_iterations = [120]

    bp = BackgroundParams(capacity=1024, position_lr_init=0.002, position_lr_final=0.0002)
    raster_cfg = RasterizerConfig(tile_capacity=64, chunk=16, dup_x=3, dup_y=3)

    # baseline metric before training: random points
    from fluidnexus_tpu.splat.background import create_from_points

    m0 = create_from_points(info.point_cloud, bp)
    before = evaluate(m0, cams, jnp.zeros(3), raster_cfg)

    model, stats = train(cfg, info, bg_params=bp)
    after = evaluate(model, cams, jnp.zeros(3), raster_cfg)
    assert after["psnr"] > before["psnr"] + 2.0, (before, after)

    # save/load round trip
    ply = os.path.join(str(tmp_path), "point_cloud/iteration_120/point_cloud.ply")
    assert os.path.exists(ply)
    back = load_background_ply(ply)
    alive = int(model.num_alive)
    assert back["xyz"].shape == (alive, 3)
    np.testing.assert_allclose(
        back["xyz"], np.asarray(model.xyz)[np.asarray(model.alive)], atol=1e-6
    )
    assert os.path.exists(os.path.join(str(tmp_path), "gs_all_cam_poses.npy"))


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 17
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacity = rng.normal(size=(n, 1)).astype(np.float32)
    scaling = rng.normal(size=(n, 3)).astype(np.float32)
    rotation = rng.normal(size=(n, 4)).astype(np.float32)
    p = str(tmp_path / "test.ply")
    save_background_ply(p, xyz, color, opacity, scaling, rotation)
    back = load_background_ply(p)
    np.testing.assert_allclose(back["xyz"], xyz, atol=1e-6)   # double sign flip cancels
    np.testing.assert_allclose(back["color"], color, atol=1e-6)
    np.testing.assert_allclose(back["opacity"], opacity, atol=1e-6)
    np.testing.assert_allclose(back["scaling"], scaling, atol=1e-6)
    np.testing.assert_allclose(back["rotation"], rotation, atol=1e-6)


def test_multi_step_scan_matches_single_step(tmp_path):
    """steps_per_launch=1 (one dispatch per iteration) and the lax.scan
    multi-step launches must produce the same optimization trajectory."""
    cams, _ = synthetic_scene(n_cams=2, n_gauss=20)
    info = SceneInfo(
        point_cloud=np.random.default_rng(2).uniform(-0.5, 0.5, (64, 3)).astype(np.float32),
        train_cameras=cams, test_cameras=cams[:1],
        nerf_normalization={"radius": 3.0, "translate": np.zeros(3)},
    )
    bp = BackgroundParams(capacity=128, position_lr_init=0.002, position_lr_final=0.0002)

    results = {}
    for name, spl in (("single", 1), ("scan", 25)):
        cfg = Config()
        cfg.optim.iterations = 50
        cfg.optim.densify_from_iter = 20
        cfg.optim.densification_interval = 25
        cfg.optim.densify_until_iter = 40
        cfg.optim.opacity_reset_interval = 1000
        cfg.optim.steps_per_launch = spl
        cfg.pipe.tile_capacity = 64
        cfg.pipe.chunk = 16
        cfg.pipe.dup_x = 3
        cfg.pipe.dup_y = 3
        model, _ = train(cfg, info, bg_params=bp)
        results[name] = model

    a, b = results["single"], results["scan"]
    assert int(a.num_alive) == int(b.num_alive)
    np.testing.assert_allclose(np.asarray(a.xyz), np.asarray(b.xyz), atol=5e-5)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color), atol=5e-5)


def test_nan_guard_aborts_with_emergency_checkpoint(tmp_path):
    """Failure detection: exploding loss -> FloatingPointError + PLY dump."""
    cams, _ = synthetic_scene(n_cams=2, n_gauss=10)
    info = SceneInfo(
        point_cloud=np.random.default_rng(3).uniform(-0.5, 0.5, (32, 3)).astype(np.float32),
        train_cameras=cams, test_cameras=cams[:1],
        nerf_normalization={"radius": 3.0, "translate": np.zeros(3)},
    )
    cfg = Config()
    cfg.model.model_path = str(tmp_path)
    cfg.optim.iterations = 120
    cfg.optim.densify_until_iter = 0
    cfg.pipe.tile_capacity = 64
    cfg.pipe.chunk = 16
    cfg.pipe.dup_x = 3
    cfg.pipe.dup_y = 3
    # a NaN in the supervision data poisons the loss on the first chunk
    cams[0].image = cams[0].image.copy()
    cams[0].image[0, 0] = np.nan
    cams[1].image = cams[1].image.copy()
    cams[1].image[0, 0] = np.nan
    bp = BackgroundParams(capacity=64)
    with pytest.raises(FloatingPointError, match="non-finite"):
        train(cfg, info, bg_params=bp)
    # emergency checkpoint landed
    assert any("point_cloud" in d for d in os.listdir(tmp_path)), os.listdir(tmp_path)
