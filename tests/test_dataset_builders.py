"""Dataset-tree builders produce reference-identical layouts from tiny
synthetic inputs (parity: DataProcessing/scalar_flow/preprocess.py,
fluid_nexus_real/create_*_dataset.py / create_*_paths.py,
convert_simulation_original_to_cogvideox[_unshift].py)."""
import json
import os

import numpy as np
import pytest

from fluidnexus_tpu.data.dataset_builders import (
    copy_cogvideox_val_dataset, create_cogvideox_dataset, create_cogvideox_paths,
    create_zero123_dataset, create_zero123_paths, convert_simulation_to_cogvideox,
    prepare_generative_image, scalar_flow_preprocess, separate_background, shift_image,
)


def _png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


@pytest.fixture
def capture(tmp_path):
    """Tiny FluidNexus capture: 2 sequences x 2 cams x 40 frames of 32x24."""
    rng = np.random.default_rng(0)
    root = str(tmp_path / "cap")
    seqs = ["10_23_22_53_16", "10_23_22_59_01"]
    for seq in seqs:
        for cam in range(2):
            for t in range(40):
                _png(os.path.join(root, seq, f"camera{cam:02d}", f"{t:03d}.png"),
                     rng.integers(0, 255, (24, 32, 3)))
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "capture_set.csv"), "w") as f:
        f.write("sequence\n" + "\n".join(seqs) + "\n")
    return root, seqs


def test_scalar_flow_preprocess(tmp_path):
    rng = np.random.default_rng(1)
    sim = str(tmp_path / "sim_000000" / "input")
    os.makedirs(os.path.join(sim, "cam"))
    for t in range(3):
        data = rng.uniform(0, 1, (5, 16, 12)).astype(np.float32)
        np.savez(os.path.join(sim, "cam", f"imgsUnproc_{t:06d}.npz"), data=data)
    n = scalar_flow_preprocess(sim, log=lambda *_: None)
    assert n == 3
    # reference folder names, frame 0 only in raw/denoise
    for cam in (0, 1, 2, 3, 4):
        assert sorted(os.listdir(os.path.join(sim, f"cam{cam}_raw"))) == [
            f"imgs_{t:06d}.png" for t in range(3)]
        assert len(os.listdir(os.path.join(sim, f"cam{cam}_no_bg"))) == 2
        assert len(os.listdir(os.path.join(sim, f"cam{cam}_no_denoise_no_bg_scale145"))) == 2
    # raw content: camera_ids[0]=2 holds stack slot 0, flipped + u8
    from PIL import Image

    raw = np.asarray(Image.open(os.path.join(sim, "cam2_raw", "imgs_000002.png")))
    assert raw.shape == (16, 12) and raw.dtype == np.uint8


def test_separate_background_matches_reference_semantics():
    cur = np.array([[100, 30], [8, 200]], np.uint8)
    first = np.array([[50, 25], [0, 0]], np.uint8)
    out = separate_background(cur, first, threshold=8)
    # cv2.subtract saturates at 0; THRESH_TOZERO keeps values > threshold
    np.testing.assert_array_equal(out, [[50, 0], [0, 200]])
    out_sc = separate_background(cur, first, threshold=8, scale=1.45)
    np.testing.assert_array_equal(out_sc, [[72, 0], [0, 255]])


def test_zero123_dataset_and_paths(tmp_path, capture):
    root, seqs = capture
    out = str(tmp_path / "z123")
    n = create_zero123_dataset(root, out, seqs, num_cams=2, size=64, log=lambda *_: None)
    assert n == 2 * 2 * 40
    # layout: <seq>/frame_<id:03d>/<cam:02d>.png
    assert os.path.exists(os.path.join(out, seqs[0], "frame_000", "00.png"))
    assert os.path.exists(os.path.join(out, seqs[1], "frame_039", "01.png"))
    from PIL import Image

    img = Image.open(os.path.join(out, seqs[0], "frame_000", "00.png"))
    assert img.size == (64, 64)

    splits = create_zero123_paths(out, seqs, num_val=1, log=lambda *_: None)
    assert splits == {"train": seqs[1:], "val": seqs[:1]}
    with open(os.path.join(out, "seq_to_cam.json")) as f:
        assert json.load(f) == {s: 1 for s in seqs}
    with open(os.path.join(out, "train_paths20.json")) as f:
        train = json.load(f)
    assert len(train) == 40 and all(p.startswith(seqs[1]) for p in train)


def test_cogvideox_dataset_paths_and_val_copy(tmp_path, capture):
    root, seqs = capture
    out = str(tmp_path / "cvx")
    names = create_cogvideox_dataset(
        root, out, seqs, num_cams=2, min_frame_id=2, num_all_frames=40,
        start_frame_step=10, frame_step=2, num_frames=5, width=48, height=32,
        caption="tiny smoke", log=lambda *_: None)
    # starts = range(2, 30, 10) = [2, 12, 22] per cam per seq
    assert len(names) == 2 * 2 * 3
    assert "seq_10_23_22_53_16_cam_00_start_002_frames_005" in names
    clip = os.path.join(out, "videos", names[0])
    assert len(os.listdir(clip)) == 5
    from PIL import Image

    assert Image.open(os.path.join(clip, "002.png")).size == (48, 32)
    with open(os.path.join(out, "labels", names[0] + ".txt")) as f:
        assert f.read() == "tiny smoke"

    train, val = create_cogvideox_paths(out, seqs, num_val=1, log=lambda *_: None)
    assert len(val) == 6 and len(train) == 6
    assert all(seqs[0] in v for v in val)

    sub = str(tmp_path / "cvx_sub")
    n = copy_cogvideox_val_dataset(out, sub, start_frame_ids=(12,), log=lambda *_: None)
    assert n == 4
    assert len(os.listdir(os.path.join(sub, "videos"))) == 4


def test_simulation_to_cogvideox_with_unshift(tmp_path):
    rng = np.random.default_rng(2)
    exp = str(tmp_path / "exp")
    for view in ("train00", "train02"):
        for t in range(2):
            _png(os.path.join(exp, "training_render", f"render_frame_{view}_{t:04d}_0000.png"),
                 rng.integers(0, 255, (64, 36, 3)))
    n = convert_simulation_to_cogvideox(exp, identifier="0000", width=48, height=32,
                                        unshift=True, log=lambda *_: None)
    assert n == 4
    outs = os.listdir(os.path.join(exp, "training_render_for_cogvideox"))
    assert len(outs) == 4
    from PIL import Image

    assert Image.open(os.path.join(exp, "training_render_for_cogvideox", outs[0])).size == (48, 32)
    # unshift intermediates written
    assert len(os.listdir(os.path.join(exp, "training_render_unshift"))) == 4


def test_shift_image_matches_reference():
    img = np.arange(24, dtype=np.uint8).reshape(4, 3, 2)
    out = shift_image(img, 1, -1)
    assert out[0].sum() == 0  # top row zero-filled
    np.testing.assert_array_equal(out[1:, :-1], img[:-1, 1:])


def test_prepare_generative_image_letterbox():
    img = np.full((10, 10, 3), 200, np.uint8)
    out = prepare_generative_image(img, width_new=40, height_new=20)
    assert out.shape == (20, 40, 3)
    assert out[:, :10].sum() == 0 and out[:, -10:].sum() == 0  # side bars
    assert (out[:, 10:30] > 0).all()


def test_smooth_visual_attrs_roundtrip(tmp_path):
    """smooth_visual_attrs writes the *_smoothed_ws{w}.npy files that
    load_visual (gm_dynamics load_visual_smoothed:2095) reads — the
    reference consumes these but ships no producer. Moving average over the
    centered window; growing particle counts average over shared indices;
    quaternions sign-align to the center frame."""
    import numpy as np

    from fluidnexus_tpu.data.dataset_builders import smooth_visual_attrs
    from fluidnexus_tpu.splat.dynamics import load_visual

    d = str(tmp_path)
    counts = [3, 3, 4, 4]
    rng = np.random.default_rng(0)
    for i, n in enumerate(counts):
        pre = f"{d}/frame_{i:03d}_"
        np.save(pre + "visual_xyz.npy", rng.normal(size=(n, 3)).astype(np.float32))
        np.save(pre + "visual_color.npy", np.full((n, 1), float(i), np.float32))
        np.save(pre + "visual_scales.npy", np.ones((n, 3), np.float32) * (i + 1))
        rot = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
        if i == 1:
            rot = -rot  # opposite-sign quats: same rotation, must align
        np.save(pre + "visual_rotation.npy", rot)
        np.save(pre + "visual_opacity.npy", np.ones((n, 1), np.float32))

    n_frames = smooth_visual_attrs(d, window=3)
    assert n_frames == 4

    # frame 1 color smoothed over frames 0..2 on shared rows: (0+1+2)/3 = 1
    sm = np.load(f"{d}/frame_001_visual_color_smoothed_ws3.npy")
    np.testing.assert_allclose(sm[:3], 1.0)
    # frame 2: row 3 exists only in frames 2,3 -> mean(2,3)=2.5
    sm2 = np.load(f"{d}/frame_002_visual_color_smoothed_ws3.npy")
    np.testing.assert_allclose(sm2[3], 2.5)
    # rotation sign alignment: averaging q and -q must not cancel
    smr = np.load(f"{d}/frame_001_visual_rotation_smoothed_ws3.npy")
    np.testing.assert_allclose(np.abs(smr[:, 0]), 1.0, atol=1e-6)

    # the loader picks up the smoothed files when the flags ask for them
    vis, attrs = load_visual(d, 1, capacity=8, channels=1, smoothed_window=3,
                             use_smoothed={"color": True}, scale=False)
    np.testing.assert_allclose(np.asarray(attrs.color[:3, 0]), 1.0)
