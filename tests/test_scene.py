import json
import os

import numpy as np
import pytest

from fluidnexus_tpu.core.config import Config
from fluidnexus_tpu.data.readers import (
    apply_camera_hack, c2w_to_rt, fake_view_folder, future_view_folder,
)
from fluidnexus_tpu.data.scene import cameras_by_time, read_scene


def write_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


@pytest.fixture
def tiny_dataset(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    frames = []
    for cam in range(5):
        angle = (cam - 2) * 0.3
        c2w = np.eye(4)
        c2w[:3, :3] = [
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ]
        c2w[:3, 3] = [np.sin(angle) * 3, 0.2, np.cos(angle) * 3]
        frames.append(
            {
                "file_path": f"train0{cam}",
                "transform_matrix": c2w.tolist(),
                "camera_hw": [24, 32],
                "camera_angle_x": 0.8,
            }
        )
        for t in range(4):
            write_png(os.path.join(root, f"train0{cam}", f"{t:03d}.png"), rng.uniform(0, 1, (24, 32, 3)))
    for name, sel in (("transforms_train.json", [0, 1, 3, 4]), ("transforms_test.json", [2]),
                      ("transforms.json", list(range(5)))):
        with open(os.path.join(root, name), "w") as f:
            json.dump({"near": 0.1, "far": 10.0, "frames": [frames[i] for i in sel]}, f)
    # fake-view folders for cams 1,4 sourced from cam 2 (train_views "20134")
    for cam in ("1", "4"):
        folder = fake_view_folder("smoke", "2", cam, "0d5")
        for t in range(4):
            write_png(os.path.join(root, folder, f"frame_{t:06d}.png"), rng.uniform(0, 1, (24, 32, 3)))
    return root


def test_read_scene_real_views(tiny_dataset):
    cfg = Config()
    cfg.model.data_path = tiny_dataset
    cfg.model.start_time = 0
    cfg.model.duration = 4
    cfg.model.capture_part = "smoke"
    cfg.model.train_views = "0134"
    info = read_scene(cfg)
    assert len(info.train_cameras) == 4 * 4  # 4 cams x 4 frames
    assert len(info.test_cameras) == 1 * 4
    assert not any(c.is_fake_view for c in info.train_cameras)
    byt = cameras_by_time(info.train_cameras)
    assert sorted(byt.keys()) == [0, 1, 2, 3]
    assert all(len(v) == 4 for v in byt.values())
    assert info.nerf_normalization["radius"] > 0
    c = info.train_cameras[0]
    assert c.image.shape == (24, 32, 3)
    assert np.isfinite(c.full_proj).all()


def test_read_scene_fake_views(tiny_dataset):
    cfg = Config()
    cfg.model.data_path = tiny_dataset
    cfg.model.start_time = 0
    cfg.model.duration = 4
    cfg.model.capture_part = "smoke"
    cfg.model.train_views = "20134"
    cfg.model.train_views_fake = "14"
    cfg.model.use_refined_fake = True
    cfg.model.refined_strength = "0d5"
    info = read_scene(cfg)
    # train_views "20134" covers all views -> transforms.json (5 cams)
    assert len(info.train_cameras) == 5 * 4
    fakes = [c for c in info.train_cameras if c.is_fake_view]
    assert len(fakes) == 2 * 4  # cams 1,4 x 4 frames
    # fake views keep the real capture for _real metrics
    assert fakes[0].image_real is not None
    assert not np.allclose(fakes[0].image, fakes[0].image_real)


def test_camera_hack_changes_pose():
    c2w = np.eye(4)
    out = apply_camera_hack(c2w.copy(), "smoke", "0")
    assert not np.allclose(out, c2w)
    same = apply_camera_hack(c2w.copy(), "smoke", "9")
    np.testing.assert_allclose(same, c2w)


def test_c2w_to_rt_convention():
    c2w = np.eye(4)
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    R, T = c2w_to_rt(c2w)
    # camera center must be recoverable: C = -R @ T (R stored transposed)
    center = -(R @ T)
    np.testing.assert_allclose(center, [1.0, 2.0, 3.0], atol=1e-12)


def test_folder_names_match_reference_convention():
    assert (
        fake_view_folder("smoke", "2", "0", "0d5")
        == "zero123_finetune_52000_cam2to0_cogvxlora5b_strength0d5_rawsize"
    )
    assert (
        fake_view_folder("ball", "2", "3", "0d26")
        == "zero123_finetune_88000_cam2to3_cogvxlora5b_strength0d26_rawsize"
    )
    assert (
        future_view_folder("smoke", "1", "0d75", 90)
        == "camera01_cogvxlora5b_future_prefix9_i2v3_strength0d75_start90_smoke_rawsize"
    )
    assert (
        future_view_folder("smoke", "1", "0d75", 90, is_wind=True)
        == "camera01_cogvxlora5b_prefix9_i2v3_strength0d75_start90_wind_smoke_rawsize"
    )


# --------------------- object capture: dual pose / demo / repeat -------------


def _ref_rot(axis, theta):
    """Reference rotation matrices (scene/functions.py:100-130), independent
    re-derivation for the oracle."""
    c, s = np.cos(theta), np.sin(theta)
    m = np.eye(4)
    if axis == "z":
        m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    elif axis == "y":
        m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    else:
        m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def _ref_rt(c2w):
    c2w = c2w.copy()
    c2w[:3, 1:3] *= -1
    w2c = np.linalg.inv(c2w)
    return w2c[:3, :3].T, w2c[:3, 3]


def test_object_capture_pose_switch(tmp_path):
    """smoke_and_ball_object applies DUAL per-camera corrections and switches
    to the second pose at data_2_since (fluid_nexus_real_reader.py:201-283,
    399-401)."""
    from fluidnexus_tpu.data.readers import read_cameras_real_capture

    c2w = np.eye(4)
    c2w[:3, 3] = [0.5, 0.2, 3.0]
    root = str(tmp_path)
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"frames": [{"file_path": "camera03", "transform_matrix": c2w.tolist(),
                               "camera_hw": [24, 32], "camera_angle_x": 0.8}]}, f)
    cams = read_cameras_real_capture(
        root, "transforms_train.json", duration=6, capture_part="smoke_and_ball_object",
        data_2_path=root, data_2_since=3, read_image=False)
    assert len(cams) == 6

    # pose 1 oracle: cam 3 of the object capture, z -2.2, y 5, x 0.5 degrees
    c1 = c2w @ _ref_rot("z", np.deg2rad(-2.2)) @ _ref_rot("y", np.deg2rad(5.0)) @ _ref_rot("x", np.deg2rad(0.5))
    R1, T1 = _ref_rt(c1)
    # pose 2 oracle: z -2.1, y 4.8
    c2 = c2w @ _ref_rot("z", np.deg2rad(-2.1)) @ _ref_rot("y", np.deg2rad(4.8))
    R2, T2 = _ref_rt(c2)

    for t in range(3):
        np.testing.assert_allclose(cams[t].R, R1, atol=1e-12)
        np.testing.assert_allclose(cams[t].T, T1, atol=1e-12)
    for t in range(3, 6):
        np.testing.assert_allclose(cams[t].R, R2, atol=1e-12)
        np.testing.assert_allclose(cams[t].T, T2, atol=1e-12)
    assert not np.allclose(R1, R2)


def test_demo_cameras_substitution(tmp_path):
    """use_demo_cameras swaps in the demo sweep poses 2->4->0->2, every 2nd
    (fluid_nexus_real_reader.py:99-126, 404-406)."""
    from fluidnexus_tpu.data.readers import read_cameras_real_capture

    root = str(tmp_path)
    rng = np.random.default_rng(3)
    raw = np.stack([np.eye(4) + 0.0 for _ in range(8)])
    raw[:, :3, 3] = rng.normal(size=(8, 3))
    np.save(os.path.join(root, "demo_cams_poses_extra.npy"), raw)
    c2w = np.eye(4)
    c2w[:3, 3] = [0, 0, 3.0]
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"frames": [{"file_path": "camera00", "transform_matrix": c2w.tolist(),
                               "camera_hw": [24, 32], "camera_angle_x": 0.8}]}, f)
    cams = read_cameras_real_capture(
        root, "transforms_train.json", duration=8, capture_part="smoke",
        use_demo_cameras=True, read_image=False)
    demo = np.concatenate([raw[4:], raw[::-1], raw[:4]], axis=0)[::2]
    for t in range(8):
        R, T = _ref_rt(demo[t])
        np.testing.assert_allclose(cams[t].R, R, atol=1e-12)
        np.testing.assert_allclose(cams[t].T, T, atol=1e-12)
        assert cams[t].image_name.endswith(f"_demo{t:03d}")


def test_real_view_repeat(tiny_dataset):
    """ScalarReal weights real views by repetition (scalar_real_reader.py:226)."""
    from fluidnexus_tpu.data.readers import read_cameras_real_capture

    cams = read_cameras_real_capture(
        tiny_dataset, "transforms_test.json", duration=4, capture_part="smoke",
        real_view_repeat=3)
    assert len(cams) == 1 * 4 * 3
    assert [c.uid for c in cams] == list(range(12))
    np.testing.assert_allclose(cams[0].R, cams[1].R)
    assert cams[0].time_idx == cams[2].time_idx
