"""Video finetune datasets — mp4 parity with the reference SFTDataset.

Parity target: CogVideoX/data_video.py SFTDataset:368-494:
  - videos/<name>.mp4 + labels/<name>.txt (first caption line);
  - fps RESAMPLING: a clip longer than max_num_frames at the target fps is
    strided from `skip_frms_num` at actual_fps/fps (:439-449); a clip with
    more raw frames than max but a short duration is uniformly strided
    (:451-459); a short clip is snapped DOWN to 4k+1 frames for the causal
    VAE (:461-471 nearest_smaller_4k_plus_1);
  - pad_last_frame to max_num_frames (:158-168, repeat the final frame);
  - resize_for_rectangle_crop: bicubic cover-resize + center crop to
    (height, width) (:127-155 with reshape_mode="center");
  - normalize (x - 127.5) / 127.5 (:479).

mp4 decode uses OpenCV's built-in codecs (no external ffmpeg binary — the
TPU-image answer to the reference's decord dependency); MJPEG-AVI files from
utils.video_io's fallback writer load through the same path.

ClipFolderDataset (frame folders, the layout DataProcessing emits before mp4
packing) lives here too; make_video_dataset() picks by directory content.
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

VIDEO_EXTS = (".mp4", ".avi", ".mkv", ".webm")


def nearest_smaller_4k_plus_1(n: int) -> int:
    """data_video.py:461-466 — the causal VAE needs 4k+1 frames."""
    r = n % 4
    return n - 3 if r == 0 else n - r + 1


def pad_last_frame(frames: np.ndarray, num_frames: int) -> np.ndarray:
    """Repeat the final frame up to num_frames / truncate past it (:158-168)."""
    if len(frames) < num_frames:
        pad = np.repeat(frames[-1:], num_frames - len(frames), axis=0)
        return np.concatenate([frames, pad], 0)
    return frames[:num_frames]


def resize_for_rectangle_crop(frames: np.ndarray, height: int, width: int,
                              mode: str = "center") -> np.ndarray:
    """Bicubic cover-resize then crop to (height, width) (:127-155).
    frames: (T,H,W,C) uint8."""
    t, h, w = frames.shape[:3]
    if w / h > width / height:
        nh, nw = height, int(round(w * height / h))
    else:
        nh, nw = int(round(h * width / w)), width
    try:
        import cv2

        out = np.stack([cv2.resize(f, (nw, nh), interpolation=cv2.INTER_CUBIC)
                        for f in frames])
    except Exception:
        from PIL import Image

        out = np.stack([np.asarray(Image.fromarray(f).resize((nw, nh), Image.BICUBIC))
                        for f in frames])
    dh, dw = out.shape[1] - height, out.shape[2] - width
    if mode == "center":
        top, left = dh // 2, dw // 2
    else:  # "random"
        top = np.random.randint(0, dh + 1)
        left = np.random.randint(0, dw + 1)
    return out[:, top:top + height, left:left + width]


def select_clip_frames(ori_vlen: int, actual_fps: float, fps: float,
                       max_num_frames: int, skip_frms_num: int = 0
                       ) -> Tuple[np.ndarray, int]:
    """The SFTDataset frame-index selection (:437-471). Returns (indices
    into the raw clip, num_frames recorded for the item)."""
    start = int(skip_frms_num)
    if actual_fps > 0 and ori_vlen / actual_fps * fps > max_num_frames:
        # long clip: resample to `fps`. Stride floors to >=1: a clip slower
        # than the target fps (or barely longer than max) would otherwise
        # compute stride 0 and crash np.arange
        num = max_num_frames
        end = int(start + num / fps * actual_fps)
        idx = np.arange(start, end, max((end - start) // num, 1)).astype(int)
        idx = np.clip(idx, 0, ori_vlen - 1)
        return idx, num
    if ori_vlen > max_num_frames:
        num = max_num_frames
        end = int(ori_vlen - skip_frms_num)
        idx = np.arange(start, end, max((end - start) // num, 1)).astype(int)
        return idx, num
    end = int(ori_vlen - skip_frms_num)
    num = nearest_smaller_4k_plus_1(end - start)
    return np.arange(start, start + num), num


class SFTVideoDataset:
    """videos/<name>.mp4 + labels/<name>.txt — the reference's actual
    finetune dataset layout, loaded without decord or external ffmpeg."""

    def __init__(self, root: str, num_frames: int = 49, height: int = 480,
                 width: int = 720, fps: float = 8.0, skip_frms_num: int = 0):
        self.root = root
        self.num_frames = num_frames
        self.height, self.width = height, width
        self.fps = fps
        self.skip_frms_num = skip_frms_num
        vids = os.path.join(root, "videos")
        self.clips = sorted(
            f for f in os.listdir(vids)
            if os.path.isfile(os.path.join(vids, f)) and f.lower().endswith(VIDEO_EXTS))
        assert self.clips, f"no video files under {root}/videos"

    def __len__(self):
        return len(self.clips)

    def caption(self, clip: str) -> str:
        base = os.path.splitext(clip)[0]
        p = os.path.join(self.root, "labels", base + ".txt")
        if os.path.exists(p):
            lines = open(p).read().splitlines()
            return lines[0] if lines else ""
        return ""

    def load_clip(self, clip: str, rng=None):
        from fluidnexus_tpu.utils.video_io import read_video_with_fps

        frames, actual_fps = read_video_with_fps(os.path.join(self.root, "videos", clip))
        idx, num = select_clip_frames(len(frames), actual_fps, self.fps,
                                      self.num_frames, self.skip_frms_num)
        out = frames[idx]
        out = pad_last_frame(out, self.num_frames)
        out = resize_for_rectangle_crop(out, self.height, self.width, "center")
        return (out.astype(np.float32) - 127.5) / 127.5

    def sample_batch(self, batch: int, rng: np.random.Generator):
        names = [self.clips[rng.integers(len(self.clips))] for _ in range(batch)]
        frames = np.stack([self.load_clip(n, rng) for n in names])
        captions = [self.caption(n) for n in names]
        return frames, captions


class ClipFolderDataset:
    """clips/<name>/frame_%06d.png (+ labels/<name>.txt caption) — the frame
    layout DataProcessing/fluid_nexus_real/create_cogvideox_dataset.py emits
    before mp4 packing."""

    def __init__(self, root: str, num_frames: int = 49, height: int = 480, width: int = 720):
        self.root = root
        self.num_frames = num_frames
        self.height, self.width = height, width
        vids = os.path.join(root, "videos")
        self.clips = sorted(
            d for d in os.listdir(vids) if os.path.isdir(os.path.join(vids, d))
        ) if os.path.isdir(vids) else []
        assert self.clips, f"no clip folders under {root}/videos"

    def caption(self, clip: str) -> str:
        p = os.path.join(self.root, "labels", clip + ".txt")
        return open(p).read().strip() if os.path.exists(p) else ""

    def load_clip(self, clip: str, rng: np.random.Generator):
        from PIL import Image

        folder = os.path.join(self.root, "videos", clip)
        frames = sorted(f for f in os.listdir(folder) if f.endswith(".png"))
        # snap to 4k+1 frames (data_video.py:461-471)
        n = min(len(frames), self.num_frames)
        n = (n - 1) // 4 * 4 + 1
        start = rng.integers(0, max(len(frames) - n, 0) + 1)
        out = []
        for f in frames[start:start + n]:
            img = Image.open(os.path.join(folder, f)).convert("RGB").resize(
                (self.width, self.height), Image.LANCZOS)
            out.append(np.asarray(img, np.float32))
        return (np.stack(out) - 127.5) / 127.5

    def sample_batch(self, batch: int, rng: np.random.Generator):
        names = [self.clips[rng.integers(len(self.clips))] for _ in range(batch)]
        frames = np.stack([self.load_clip(n, rng) for n in names])
        captions = [self.caption(n) for n in names]
        return frames, captions


def make_video_dataset(root: str, num_frames: int = 49, height: int = 480,
                       width: int = 720, fps: float = 8.0):
    """Pick the dataset by content of <root>/videos: video FILES (mp4/avi)
    -> SFTVideoDataset; frame-folder directories -> ClipFolderDataset."""
    vids = os.path.join(root, "videos")
    has_files = os.path.isdir(vids) and any(
        f.lower().endswith(VIDEO_EXTS) for f in os.listdir(vids))
    if has_files:
        return SFTVideoDataset(root, num_frames, height, width, fps=fps)
    return ClipFolderDataset(root, num_frames, height, width)
