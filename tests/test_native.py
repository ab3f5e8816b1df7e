"""Native host-ops (C++ via ctypes) parity with the numpy path."""

import os

import numpy as np

from cvpr2021_vspw_implement_tpu import native
from cvpr2021_vspw_implement_tpu.data.datasets import MEAN, STD


def test_native_builds_and_loads():
    assert native.available(), "g++ build of libhostops.so failed"


def test_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (23, 31, 3), np.uint8)
    out = native.normalize_u8(img)
    ref = ((img.astype(np.float32) / 255.0) - MEAN) / STD
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_remap_matches_numpy():
    mask = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = native.remap_label_u8(mask)
    ref = mask.astype(np.int32) - 1
    ref[mask == 0] = 255
    ref[ref == 254] = 255
    np.testing.assert_array_equal(out, ref)


def test_native_jpeg_decode_matches_pil(tmp_path):
    """libjpeg pool decode must be bit-identical to PIL (same libjpeg,
    same ISLOW IDCT) — single and batched."""
    import glob

    from PIL import Image

    from cvpr2021_vspw_implement_tpu import native
    from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw

    if not native.jpeg_available():
        import pytest
        pytest.skip("libjpeg toolchain unavailable")
    root = str(tmp_path / "v")
    make_synthetic_vspw(root, 1, 4, (40, 56), 5, seed=13)
    paths = sorted(glob.glob(os.path.join(root, "data", "*", "origin",
                                          "*.jpg")))
    pil = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
    one = native.decode_jpeg(paths[0])
    np.testing.assert_array_equal(one, pil[0])
    batch = native.decode_jpeg_batch(paths, nthreads=3)
    assert batch is not None
    for a, b in zip(batch, pil):
        np.testing.assert_array_equal(a, b)
    # missing file → clean failure, not a crash
    assert native.decode_jpeg(paths[0] + ".nope") is None
