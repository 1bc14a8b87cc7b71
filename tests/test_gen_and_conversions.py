import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.data.conversions import (
    convert_cogvideox_to_original, convert_original_to_zero123, create_zero123_cams,
    crop_and_resize, get_w2c_rt_from_c2w, pad_square,
)


def test_pad_square():
    img = np.ones((10, 6, 3), np.uint8)
    out = pad_square(img)
    assert out.shape == (10, 10, 3)
    img2 = np.ones((6, 10, 3), np.uint8)
    assert pad_square(img2).shape == (10, 10, 3)


def test_crop_and_resize_aspect():
    img = np.random.default_rng(0).integers(0, 255, (192, 256, 3)).astype(np.uint8)
    out = crop_and_resize(img, new_width=108, new_height=192)
    assert out.shape == (192, 108, 3)


def test_conversion_roundtrip(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    for cam in range(2):
        for t in range(3):
            from PIL import Image

            os.makedirs(os.path.join(root, f"camera0{cam}"), exist_ok=True)
            Image.fromarray(rng.integers(0, 255, (20, 12, 3)).astype(np.uint8)).save(
                os.path.join(root, f"camera0{cam}", f"{t:03d}.png"))
    n = convert_original_to_zero123(root, os.path.join(root, "z123"), num_cameras=2,
                                    size=64, log=lambda *a: None)
    assert n == 6
    assert os.path.exists(os.path.join(root, "z123", "frame_002", "01.png"))

    # cams npy
    c2w = np.eye(4); c2w[:3, 3] = [1, 2, 3]
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"frames": [{"file_path": "train03", "transform_matrix": c2w.tolist()}]}, f)
    create_zero123_cams(os.path.join(root, "transforms.json"), os.path.join(root, "camera"),
                        log=lambda *a: None)
    rt = np.load(os.path.join(root, "camera", "03.npy"))
    assert rt.shape == (3, 4)
    # W2C of identity-with-translation (after GL flip) has T = -R^T C
    c = -(rt[:3, :3].T @ rt[:, 3])
    np.testing.assert_allclose(c, [1, 2, 3], atol=1e-5)

    # cogvideox->original
    os.makedirs(os.path.join(root, "refined"), exist_ok=True)
    from PIL import Image

    Image.fromarray(rng.integers(0, 255, (48, 72, 3)).astype(np.uint8)).save(
        os.path.join(root, "refined", "frame_000000.png"))
    convert_cogvideox_to_original(os.path.join(root, "refined"), os.path.join(root, "raw"),
                                  width=54, height=96, log=lambda *a: None)
    out = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(
        os.path.join(root, "raw", "frame_000000.png")))
    assert out.shape == (96, 54, 3)


@pytest.mark.slow
def test_gen_refine_windowed_chaining(tmp_path):
    """End-to-end windowed refinement with a tiny random model: window 2's
    prefix must come from window 1's OUTPUT (the chaining property)."""
    from fluidnexus_tpu.diffusion.video.dit import VideoDiTConfig
    from fluidnexus_tpu.diffusion.video.engine import VideoEngine
    from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig
    from fluidnexus_tpu.pipelines.gen_refine_video import RefineConfig, refine_long_video

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

    rng = np.random.default_rng(0)
    from PIL import Image

    gt_dir = str(tmp_path / "gt")
    in_dir = str(tmp_path / "z123")
    os.makedirs(gt_dir); os.makedirs(in_dir)
    for i in range(pre):
        Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(
            os.path.join(gt_dir, f"{i:03d}.png"))
    for i in range(2 * win):
        Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(
            os.path.join(in_dir, f"frame_{i:06d}.png"))

    txt = jnp.zeros((1, 4, 16))
    cfg = RefineConfig(window_frames=win, prefix_frames=pre, num_windows=2,
                       sdedit_strength=0.6, num_steps=4, height=h, width=w)
    written = refine_long_video(eng, params, vae_params, txt, None, in_dir, gt_dir,
                                str(tmp_path / "out"), cfg, jax.random.PRNGKey(2),
                                log=lambda *a: None)
    assert written[0] == win
    assert written[1] == win - pre
    outs = sorted(os.listdir(tmp_path / "out"))
    assert len(outs) == win + (win - pre)


@pytest.mark.slow
def test_train_video_lora_tiny(tmp_path):
    """Two LoRA finetune iterations over the clip-folder dataset."""
    from fluidnexus_tpu.pipelines.train_video import build_argparser, train

    rng = np.random.default_rng(0)
    from PIL import Image

    clip = tmp_path / "videos" / "clip0"
    os.makedirs(clip)
    os.makedirs(tmp_path / "labels")
    for i in range(9):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)).save(
            clip / f"frame_{i:06d}.png")
    (tmp_path / "labels" / "clip0.txt").write_text("a smoke plume")

    args = build_argparser().parse_args([
        "--data_root", str(tmp_path), "--iterations", "2", "--batch", "2",
        "--num_frames", "9", "--height", "32", "--width", "32", "--tiny",
        "--lora_rank", "2", "--log_every", "1",
    ])
    params, loss, ema = train(args, log=lambda *a: None)
    assert np.isfinite(loss)
    # FusedEmaAdam parity: the EMA tree exists, has full-tree structure, and
    # after 2 steps at decay 0.9999 sits very close to (but not exactly at)
    # the raw weights on the trained lora leaves
    assert ema is not None
    assert jax.tree_util.tree_structure(ema) == jax.tree_util.tree_structure(params)


@pytest.mark.slow
def test_train_video_eval_fork(tmp_path):
    """--eval_interval samples an mp4 + caption + TB tags mid-finetune with
    the EMA-merged weights (reference log_video/forward_step_eval parity,
    train_image_to_video.py:59-109,141-170)."""
    from fluidnexus_tpu.pipelines.train_video import build_argparser, train

    rng = np.random.default_rng(0)
    from PIL import Image

    clip = tmp_path / "videos" / "clip0"
    os.makedirs(clip)
    os.makedirs(tmp_path / "labels")
    for i in range(9):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)).save(
            clip / f"frame_{i:06d}.png")
    (tmp_path / "labels" / "clip0.txt").write_text("a smoke plume")
    save = tmp_path / "run"

    args = build_argparser().parse_args([
        "--data_root", str(tmp_path), "--iterations", "2", "--batch", "1",
        "--num_frames", "9", "--height", "32", "--width", "32", "--tiny",
        "--lora_rank", "2", "--log_every", "1", "--save_dir", str(save),
        "--eval_interval", "2", "--eval_steps", "2", "--save_every", "100",
    ])
    train(args, log=lambda *a: None)
    # the reference's artifact layout: <save>/video/samples_gs_NNNNNN/*.mp4
    # + <save>/video_texts/NNNNNN.txt
    vids = sorted((save / "video").glob("samples_gs_*/*"))
    assert vids and vids[0].parent.name == "samples_gs_000002"
    assert (save / "video_texts" / "000002.txt").read_text().strip() == "a smoke plume"
    from fluidnexus_tpu.utils.video_io import read_video

    arr = read_video(str(vids[0]))
    assert arr.shape[1:] == (32, 32, 3) and arr.shape[0] == 9
    # TB event files exist (eval/loss + samples grid were written)
    assert any(f.name.startswith("events") for f in save.iterdir())


@pytest.mark.slow
def test_train_video_resume_full_state(tmp_path):
    """--resume_from restores params + optimizer moments + EMA + rng +
    iteration (SAT checkpoint-resume parity): a 2-iter run saved at every
    step resumes and finishes to 4 with the step counter continuing."""
    from fluidnexus_tpu.pipelines.train_video import build_argparser, train

    rng = np.random.default_rng(0)
    from PIL import Image

    clip = tmp_path / "videos" / "clip0"
    os.makedirs(clip)
    os.makedirs(tmp_path / "labels")
    for i in range(9):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)).save(
            clip / f"frame_{i:06d}.png")
    (tmp_path / "labels" / "clip0.txt").write_text("a smoke plume")
    save_dir = str(tmp_path / "ckpt")

    base = ["--data_root", str(tmp_path), "--batch", "2", "--num_frames", "9",
            "--height", "32", "--width", "32", "--tiny", "--lora_rank", "2",
            "--log_every", "1", "--save_dir", save_dir, "--save_every", "1"]
    args = build_argparser().parse_args(base + ["--iterations", "2"])
    train(args, log=lambda *a: None)
    assert os.path.exists(os.path.join(save_dir, "train_state_0000002.npz"))

    logs = []
    args2 = build_argparser().parse_args(base + ["--iterations", "4",
                                                 "--resume_from", save_dir])
    params, loss, ema = train(args2, log=lambda *a: logs.append(" ".join(map(str, a))))
    assert np.isfinite(loss)
    assert any("resumed training state at iter 2" in ln for ln in logs)
    # the resumed run starts at iter 3 (no re-run of 1-2)
    assert any(ln.startswith("iter 3/4") for ln in logs)
    assert not any(ln.startswith("iter 1/4") for ln in logs)
    assert os.path.exists(os.path.join(save_dir, "iter_0000004_ema"))
