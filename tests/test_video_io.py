"""MJPEG-AVI writer/reader roundtrip — the ffmpeg-free video packing path
(reference packs frame folders to mp4 in create_cogvideox_dataset.py)."""
import os

import numpy as np

from fluidnexus_tpu.utils.video_io import (
    frames_folder_to_video, read_avi_mjpeg, read_video, write_avi_mjpeg, write_video,
)


def _smooth_frames(t=5, h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.stack([
        np.stack([(xx / w + i / t) % 1.0, yy / h, np.full_like(xx, 0.5)], -1)
        for i in range(t)
    ])
    return frames  # float [0,1], smooth -> JPEG-friendly


def test_avi_roundtrip(tmp_path):
    frames = _smooth_frames()
    p = write_avi_mjpeg(str(tmp_path / "clip.avi"), frames, fps=8)
    back = read_avi_mjpeg(p)
    assert back.shape == (5, 48, 64, 3) and back.dtype == np.uint8
    ref = (frames * 255 + 0.5).astype(np.uint8).astype(np.float32)
    err = np.abs(back.astype(np.float32) - ref).mean()
    assert err < 6.0, f"JPEG roundtrip error too high: {err}"


def test_avi_container_structure(tmp_path):
    p = write_avi_mjpeg(str(tmp_path / "c.avi"), _smooth_frames(t=2), fps=4)
    data = open(p, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert b"MJPG" in data and b"idx1" in data
    # RIFF size field must cover the whole file
    import struct

    assert struct.unpack("<I", data[4:8])[0] + 8 == len(data)


def test_write_video_fallback_extension(tmp_path):
    # no imageio-ffmpeg here -> .mp4 request degrades to .avi
    out = write_video(str(tmp_path / "v.mp4"), _smooth_frames(t=2))
    assert out.endswith(".avi") or out.endswith(".mp4")
    assert os.path.exists(out)
    assert read_video(out).shape[0] == 2


def test_frames_folder_to_video(tmp_path):
    from PIL import Image

    folder = tmp_path / "render"
    os.makedirs(folder)
    for i, f in enumerate(_smooth_frames(t=3)):
        Image.fromarray((f * 255).astype(np.uint8)).save(folder / f"frame_{i:06d}.png")
    out = frames_folder_to_video(str(folder), fps=8)
    assert os.path.exists(out)
    assert read_video(out).shape == (3, 48, 64, 3)
