import os

import numpy as np

from fluidnexus_tpu.runtime.native_loader import NativeImageLoader, decode_png, native_available


def make_pngs(tmp_path, n=6, h=24, w=16):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(n):
        arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        p = str(tmp_path / f"img_{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


def test_decode_png_matches_pil(tmp_path):
    paths, arrays = make_pngs(tmp_path, n=1)
    out = decode_png(paths[0], 24, 16)
    assert out.shape == (3, 24, 16)
    np.testing.assert_allclose(out.transpose(1, 2, 0), arrays[0] / 255.0, atol=2e-2)


def test_native_lib_builds_and_decodes(tmp_path):
    assert native_available(), "native runtime library failed to build"
    paths, arrays = make_pngs(tmp_path, n=1, h=32, w=32)
    out = decode_png(paths[0], 16, 16)  # downscale path
    assert out.shape == (3, 16, 16)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_threaded_loader_yields_all(tmp_path):
    paths, arrays = make_pngs(tmp_path, n=6)
    loader = NativeImageLoader(paths, height=24, width=16, threads=2, queue=3)
    got = {}
    for idx, arr in loader:
        got[idx] = arr
    loader.close()
    assert sorted(got) == list(range(6))
    for i in range(6):
        np.testing.assert_allclose(got[i].transpose(1, 2, 0), arrays[i] / 255.0, atol=2e-2)


def test_gray_mode(tmp_path):
    paths, arrays = make_pngs(tmp_path, n=2)
    loader = NativeImageLoader(paths, height=24, width=16, gray=True, threads=1)
    idx, arr = next(loader)
    loader.close()
    assert arr.shape == (24, 16)
    # ITU-R 601 luma, matching PIL convert("L") (the readers' fallback path)
    rgb = arrays[idx].astype(np.float32) / 255.0
    expect = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    np.testing.assert_allclose(arr, expect, atol=3e-2)
