"""In-place pad-band re-zero kernel == ops/masked.mask_valid.

The kernel implements the width-bucketed eval invariant (re-zero the
padded region of a spatial-conv input, ops/masked.py) touching only the
band of rows/cols the bucketing contract allows to be invalid; it must
be bit-identical to the full-tensor where() for any valid size the
bucket admits.  Interpret mode on the CPU mesh; bench-path coverage on
TPU comes from tests/test_masked_eval.py running compiled."""

import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.ops.masked import feature_valid, mask_valid
from cvpr2021_vspw_implement_tpu.ops.pallas.band_zero import (
    band_zero_inplace)


@pytest.mark.smoke
@pytest.mark.parametrize("feat,valid", [
    ((64, 112, 256), (480, 853)),   # OS8 pyramid level
    ((32, 56, 128), (480, 853)),    # OS16
    ((64, 112, 256), (449, 833)),   # both dims mid-band
    ((64, 112, 256), (512, 896)),   # no padding: nothing may change
    ((64, 112, 256), (457, 896)),   # rows only
])
def test_band_zero_matches_mask_valid(feat, valid):
    hf, wf, c = feat
    pad_hw = (512, 896)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, hf, wf, c)).astype(np.float32))
    hv, wv = feature_valid(hf, wf,
                           (jnp.int32(valid[0]), jnp.int32(valid[1])),
                           pad_hw)
    got = band_zero_inplace(x, hv, wv, pad_hw, interpret=True)
    want = mask_valid(x, (hv, wv))
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.smoke
def test_band_zero_bf16_and_batch():
    pad_hw = (128, 192)
    hf, wf, c = 32, 48, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, hf, wf, c))).astype(jnp.bfloat16)
    hv, wv = feature_valid(hf, wf, (jnp.int32(96), jnp.int32(135)), pad_hw)
    got = band_zero_inplace(x, hv, wv, pad_hw, interpret=True)
    want = mask_valid(x, (hv, wv))
    assert np.array_equal(np.asarray(got, np.float32),
                          np.asarray(want, np.float32))


@pytest.mark.smoke
def test_bucket_hw_height_stays_at_stride():
    """bucket_hw: widths round to the user bucket, heights only to the
    encoder stride (VSPW-480p heights are constant, so 480 must stay 480
    instead of padding to 512 — ops/masked.bucket_hw)."""
    from cvpr2021_vspw_implement_tpu.ops.masked import bucket_hw
    assert bucket_hw(480, 853) == (480, 896)
    assert bucket_hw(480, 853, bucket=32) == (480, 864)
    assert bucket_hw(477, 853) == (480, 896)      # /8 slack: 3 <= 3
    assert bucket_hw(481, 640) == (512, 640)
    assert bucket_hw(480, 896) == (480, 896)      # exact fit unchanged
