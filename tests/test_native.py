"""Native host-ops (C++ via ctypes) parity with the numpy path."""

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
