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


def test_orbit_cameras_geometry():
    """Orbit cameras all look at the center; projection puts it mid-frame."""
    from fluidnexus_tpu.data.camera_paths import orbit_cameras

    center = np.array([0.3, 0.5, -0.2])
    cams = orbit_cameras(center, radius=2.0, n_frames=8, width=64, image_height=48)
    assert len(cams) == 8
    for cam in cams:
        # center projects to NDC (0,0) with positive depth
        ph = np.concatenate([center, [1.0]]) @ cam.full_proj
        ndc = ph[:2] / ph[3]
        assert abs(ndc[0]) < 1e-5 and abs(ndc[1]) < 1e-5, ndc
        pv = np.concatenate([center, [1.0]]) @ cam.world_view
        assert pv[2] > 0  # in front of the camera
        # eye stays on the orbit sphere
        assert abs(np.linalg.norm(cam.camera_center - center) - np.hypot(2.0, 0.0)) < 1e-4


def test_render_orbit_example(tmp_path):
    """End-to-end: PLY -> orbit render -> AVI."""
    from fluidnexus_tpu.core.ply import save_background_ply

    rng = np.random.default_rng(0)
    n = 50
    ply = tmp_path / "pc.ply"
    save_background_ply(
        str(ply),
        rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32),
        rng.uniform(0, 1, (n, 3)).astype(np.float32),
        rng.normal(2.0, 0.1, (n, 1)).astype(np.float32),
        np.full((n, 3), -3.0, np.float32),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
    )
    import sys
    sys.path.insert(0, "examples")
    from render_orbit import main

    out = tmp_path / "orbit.avi"
    main(["--ply", str(ply), "--out", str(out), "--frames", "3",
          "--width", "48", "--height", "32", "--radius", "2.0"])
    v = read_video(str(out))
    assert v.shape == (3, 32, 48, 3)
    assert v.mean() > 1.0  # something rendered (not all black)
