"""Inter-stage format conversions — the DataProcessing subproject as a
library (the reference is 15 path-hardcoded scripts, SURVEY §2.4).

Parity targets (DataProcessing/):
  - convert_original_to_zero123.py:36-51 — pad-to-square + 512x512 resize into
    frame_%03d/{cam:02d}.png
  - fluid_nexus_real/create_zero123_cams.py (get_w2c_RT_from_c2w:10-15) —
    transforms.json c2w -> per-camera W2C .npy
  - utils/image_utils.py pad_square:131, prepare_generative_image_crop_first
    :374-430 (center-crop to the 1080/1920 strip then letterbox to 720x480),
    crop_and_resize:446-463 (center-crop to target aspect then resize)
  - convert_zero123_to_cogvideox.py / convert_cogvideox_to_original.py /
    convert_future_cogvideox_to_original.py — folder plumbing around those.
Each function also has a CLI: python -m fluidnexus_tpu.data.conversions <cmd>.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Sequence

import numpy as np


def _imread(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def _imwrite(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


def _resize(arr, w, h):
    from PIL import Image

    return np.asarray(Image.fromarray(arr.astype(np.uint8)).resize((w, h), Image.LANCZOS))


def pad_square(img: np.ndarray) -> np.ndarray:
    """(image_utils.pad_square:131-139)"""
    h, w = img.shape[:2]
    if h > w:
        pad = (h - w) // 2
        return np.pad(img, ((0, 0), (pad, pad), (0, 0)))
    if h < w:
        pad = (w - h) // 2
        return np.pad(img, ((pad, pad), (0, 0), (0, 0)))
    return img


def prepare_generative_image_crop_first(img: np.ndarray, width_new=720, height_new=480,
                                        bg_color=(0, 0, 0)) -> np.ndarray:
    """Center-crop the square zero123 output to the 1080/1920 vertical strip,
    then letterbox-fit into (width_new, height_new)
    (image_utils.py:374-430)."""
    h0, w0 = img.shape[:2]
    crop_width = int(256 * (1080 / 1920))
    # the reference computes the strip at 256-scale; scale to this image
    crop_width = int(crop_width * w0 / 256)
    left = (w0 - crop_width) // 2
    img = img[:, left:left + crop_width]
    h0, w0 = img.shape[:2]
    ratio = min(width_new / w0, height_new / h0)
    nw, nh = int(w0 * ratio), int(h0 * ratio)
    resized = _resize(img, nw, nh)
    out = np.zeros((height_new, width_new, 3), np.uint8)
    out[:] = np.asarray(bg_color, np.uint8)
    top, left = (height_new - nh) // 2, (width_new - nw) // 2
    out[top:top + nh, left:left + nw] = resized
    return out


def crop_and_resize(img: np.ndarray, new_width=1080, new_height=1920) -> np.ndarray:
    """Center-crop to the target aspect then resize (image_utils.py:446-463)."""
    ratio = new_width / new_height
    h, w = img.shape[:2]
    crop_width = int(h * ratio)
    x = (w - crop_width) // 2
    return _resize(img[:, x:x + crop_width], new_width, new_height)


def convert_original_to_zero123(data_root: str, out_root: str, num_cameras=5,
                                camera_prefix="camera", size=512, log=print):
    """(convert_original_to_zero123.py:36-51)"""
    count = 0
    for cam_id in range(num_cameras):
        folder = os.path.join(data_root, f"{camera_prefix}{cam_id:02d}")
        if not os.path.isdir(folder):
            continue
        for name in sorted(os.listdir(folder)):
            if not name.endswith(".png"):
                continue
            frame_id = int(name.split(".")[0])
            img = pad_square(_imread(os.path.join(folder, name)))
            img = _resize(img, size, size)
            _imwrite(os.path.join(out_root, f"frame_{frame_id:03d}", f"{cam_id:02d}.png"), img)
            count += 1
    log(f"converted {count} frames -> {out_root}")
    return count


def get_w2c_rt_from_c2w(c2w: np.ndarray) -> np.ndarray:
    """(create_zero123_cams.py:10-15): OpenGL c2w -> [R|T] W2C (3,4)."""
    c2w = np.array(c2w, np.float64).copy()
    c2w[:3, 1:3] *= -1
    w2c = np.linalg.inv(c2w)
    return np.concatenate([w2c[:3, :3], w2c[:3, 3:4]], 1).astype(np.float32)


def create_zero123_cams(transforms_json: str, out_dir: str, log=print):
    """transforms.json -> camera/{i:02d}.npy (create_zero123_cams.py)."""
    with open(transforms_json) as f:
        frames = json.load(f)["frames"]
    os.makedirs(out_dir, exist_ok=True)
    for frame in frames:
        cam = int(frame["file_path"][-1:])
        rt = get_w2c_rt_from_c2w(np.array(frame["transform_matrix"]))
        np.save(os.path.join(out_dir, f"{cam:02d}.npy"), rt)
    log(f"wrote {len(frames)} camera npys -> {out_dir}")
    return len(frames)


def convert_zero123_to_cogvideox(zero123_folder: str, out_folder: str,
                                 width=720, height=480, log=print):
    """(convert_zero123_to_cogvideox.py:19-50, minus the mp4 packing)"""
    names = sorted(n for n in os.listdir(zero123_folder) if n.endswith(".png"))
    for name in names:
        img = _imread(os.path.join(zero123_folder, name))
        _imwrite(os.path.join(out_folder, name), prepare_generative_image_crop_first(img, width, height))
    log(f"converted {len(names)} frames -> {out_folder}")
    return len(names)


def convert_cogvideox_to_original(refined_folder: str, out_folder: str,
                                  width=1080, height=1920, log=print):
    """Refined CogVideoX frames -> original portrait frame layout consumed as
    fake views (convert_cogvideox_to_original.py; '_rawsize' folders)."""
    names = sorted(n for n in os.listdir(refined_folder) if n.endswith(".png"))
    for name in names:
        img = _imread(os.path.join(refined_folder, name))
        _imwrite(os.path.join(out_folder, name), crop_and_resize(img, width, height))
    log(f"converted {len(names)} frames -> {out_folder}")
    return len(names)


def main(argv=None):
    ap = argparse.ArgumentParser(description="FluidNexus format conversions")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("original_to_zero123")
    p.add_argument("--data_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--num_cameras", type=int, default=5)
    p.add_argument("--camera_prefix", default="camera")

    p = sub.add_parser("zero123_cams")
    p.add_argument("--transforms_json", required=True)
    p.add_argument("--out_dir", required=True)

    p = sub.add_parser("zero123_to_cogvideox")
    p.add_argument("--zero123_folder", required=True)
    p.add_argument("--out_folder", required=True)

    p = sub.add_parser("cogvideox_to_original")
    p.add_argument("--refined_folder", required=True)
    p.add_argument("--out_folder", required=True)
    p.add_argument("--width", type=int, default=1080)
    p.add_argument("--height", type=int, default=1920)

    args = ap.parse_args(argv)
    if args.cmd == "original_to_zero123":
        convert_original_to_zero123(args.data_root, args.out_root, args.num_cameras,
                                    args.camera_prefix)
    elif args.cmd == "zero123_cams":
        create_zero123_cams(args.transforms_json, args.out_dir)
    elif args.cmd == "zero123_to_cogvideox":
        convert_zero123_to_cogvideox(args.zero123_folder, args.out_folder)
    elif args.cmd == "cogvideox_to_original":
        convert_cogvideox_to_original(args.refined_folder, args.out_folder,
                                      args.width, args.height)


if __name__ == "__main__":
    main()
