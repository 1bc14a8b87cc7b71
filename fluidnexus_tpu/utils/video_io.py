"""Video file I/O without an ffmpeg-on-PATH requirement.

The reference packs frame folders into mp4s with imageio-ffmpeg / decord
(CogVideoX/data_video.py, DataProcessing/*/create_cogvideox_dataset.py).
This module provides:

  - ``write_video``: real mp4 via OpenCV's built-in encoder (no external
    ffmpeg binary), imageio-ffmpeg when importable, else a pure-Python
    MJPEG-in-AVI writer (every frame a PIL-encoded JPEG inside a standard
    RIFF AVI container — playable by ffmpeg/VLC/browsers).
  - ``read_video`` / ``read_video_with_fps``: the matching readers (OpenCV
    first — it decodes mp4 AND MJPEG-AVI natively — then the pure-Python
    AVI parser, then imageio).

Frames are (T,H,W,3) uint8 or float in [0,1].
"""
from __future__ import annotations

import io
import os
import struct
from typing import List, Optional

import numpy as np


def _to_uint8(frames) -> np.ndarray:
    arr = np.asarray(frames)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if arr.ndim == 3:  # (T,H,W) gray -> RGB
        arr = np.repeat(arr[..., None], 3, axis=-1)
    assert arr.ndim == 4 and arr.shape[-1] == 3, f"bad frames shape {arr.shape}"
    return arr


def _jpeg_bytes(frame: np.ndarray, quality: int) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def write_avi_mjpeg(path: str, frames, fps: int = 8, quality: int = 95) -> str:
    """RIFF AVI with one 'vids'/'MJPG' stream; returns the written path."""
    arr = _to_uint8(frames)
    t, h, w = arr.shape[:3]
    jpegs = [_jpeg_bytes(arr[i], quality) for i in range(t)]
    maxbuf = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / max(fps, 1)),  # dwMicroSecPerFrame
        maxbuf * fps,            # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        t, 0, 1,                 # dwTotalFrames, dwInitialFrames, dwStreams
        maxbuf, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, t, maxbuf, -1, 0,   # scale, rate, start, length, buf, quality, samplesize
        0, 0, w, h,                    # rcFrame
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\0" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b""
    index = b""
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        index += struct.pack("<4sII I", b"00dc", 0x10, 4 + len(movi_payload), len(j))
        movi_payload += chunk(b"00dc", j)
    movi = lst(b"movi", movi_payload)
    idx1 = chunk(b"idx1", index)

    body = b"AVI " + hdrl + movi + idx1
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return path


def read_avi_mjpeg(path: str) -> np.ndarray:
    """Decode every '00dc'/'00db' JPEG chunk of an AVI. Returns (T,H,W,3) u8."""
    from PIL import Image

    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI ", f"{path}: not an AVI"
    frames: List[np.ndarray] = []
    pos = 12
    stack = [len(data)]
    while pos + 8 <= stack[-1]:
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if fourcc == b"LIST":
            stack.append(pos + 8 + size)
            pos += 12  # descend past the list type
            continue
        if fourcc in (b"00dc", b"00db") and size > 0:
            frames.append(np.asarray(
                Image.open(io.BytesIO(data[pos + 8:pos + 8 + size])).convert("RGB")))
        pos += 8 + size + (size % 2)
        while len(stack) > 1 and pos >= stack[-1]:
            stack.pop()
    assert frames, f"{path}: no video chunks"
    return np.stack(frames)


def _cv2_write_mp4(path: str, arr: np.ndarray, fps: int) -> Optional[str]:
    try:
        import cv2
    except Exception:
        return None
    t, h, w = arr.shape[:3]
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not out.isOpened():
        return None
    for i in range(t):
        out.write(cv2.cvtColor(arr[i], cv2.COLOR_RGB2BGR))
    out.release()
    return path if os.path.exists(path) and os.path.getsize(path) > 0 else None


def _cv2_read(path: str):
    """(frames u8 RGB, fps) via OpenCV, or None if it can't open the file."""
    try:
        import cv2
    except Exception:
        return None
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None
    fps = float(cap.get(cv2.CAP_PROP_FPS) or 0.0)
    frames: List[np.ndarray] = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        return None
    return np.stack(frames), fps


def write_video(path: str, frames, fps: int = 8, quality: int = 95) -> str:
    """Write frames to ``path``. mp4 via OpenCV's built-in encoder (then
    imageio-ffmpeg); MJPEG AVI as the last resort (the extension is switched
    to .avi). Returns the actual path written."""
    arr = _to_uint8(frames)
    if path.endswith(".mp4"):
        out = _cv2_write_mp4(path, arr, fps)
        if out:
            return out
        try:
            import imageio.v2 as imageio  # noqa: F401 — needs the ffmpeg plugin

            imageio.mimwrite(path, list(arr), fps=fps, quality=8, macro_block_size=1)
            return path
        except Exception:
            path = path[:-4] + ".avi"
    if not path.endswith(".avi"):
        path = path + ".avi"
    return write_avi_mjpeg(path, arr, fps=fps, quality=quality)


def read_video_with_fps(path: str):
    """(frames (T,H,W,3) u8, fps) — fps is 0.0 when the container lacks it."""
    got = _cv2_read(path)
    if got is not None:
        return got
    if path.endswith(".avi"):
        return read_avi_mjpeg(path), 0.0
    import imageio.v2 as imageio

    reader = imageio.get_reader(path)
    fps = float(reader.get_meta_data().get("fps", 0.0) or 0.0)
    frames = np.stack([np.asarray(f) for f in reader])
    return frames, fps


def read_video(path: str) -> np.ndarray:
    return read_video_with_fps(path)[0]


def frames_folder_to_video(folder: str, out_path: Optional[str] = None,
                           fps: int = 8, pattern: str = ".png") -> str:
    """Pack a frame folder (the pipelines' output convention) into a video —
    the packing step of create_cogvideox_dataset.py, sans ffmpeg."""
    from PIL import Image

    names = sorted(f for f in os.listdir(folder) if f.endswith(pattern))
    assert names, f"no {pattern} frames in {folder}"
    frames = np.stack([np.asarray(Image.open(os.path.join(folder, n)).convert("RGB"))
                       for n in names])
    return write_video(out_path or folder.rstrip("/") + ".mp4", frames, fps=fps)
