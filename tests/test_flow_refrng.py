"""Draw-for-draw RNG parity of the refrng flow augmentors vs the ACTUAL
reference augmentor module (reference: RAFT_core/utils/augmentor.py).

The reference module is executed directly (it needs cv2 + torch, both
present; torchvision is stubbed with an adapter around our RefColorJitter,
so the ColorJitter RNG/arithmetic is shared by construction — what this
test proves independently is that every OTHER draw (the global np.random
stream: asymmetric/eraser/stretch/spatial/flip/crop draws) happens from the
same stream in the same order, and that the cv2 resize + eraser + crop
arithmetic is bit-identical).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
from PIL import Image

from cvpr2021_vspw_implement_tpu.models.raft.datasets import (
    FlowAugmentor, RefColorJitter, SparseFlowAugmentor)

REF = "/root/reference/RAFT_core/utils/augmentor.py"

pytestmark = pytest.mark.smoke


def _load_reference_augmentor():
    torch = pytest.importorskip("torch")
    pytest.importorskip("cv2")

    class _TVColorJitter:
        """torchvision.transforms.ColorJitter stand-in: PIL in/out around
        our RefColorJitter (which draws from the torch global stream)."""

        def __init__(self, brightness, contrast, saturation, hue):
            self._rcj = RefColorJitter(brightness, contrast, saturation,
                                       hue, impl="torch")

        def __call__(self, pil_img):
            return Image.fromarray(self._rcj(np.array(pil_img)))

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.ColorJitter = _TVColorJitter
    tv.transforms = tvt
    saved = {k: sys.modules.get(k) for k in ("torchvision",
                                             "torchvision.transforms")}
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    try:
        spec = importlib.util.spec_from_file_location("ref_augmentor", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod, torch


def _data(seed, ht=100, wd=120, sparse=False):
    r = np.random.default_rng(seed)
    img1 = r.integers(0, 256, (ht, wd, 3)).astype(np.uint8)
    img2 = r.integers(0, 256, (ht, wd, 3)).astype(np.uint8)
    flow = (r.standard_normal((ht, wd, 2)) * 5).astype(np.float32)
    if not sparse:
        return img1, img2, flow
    valid = (r.random((ht, wd)) < 0.3).astype(np.float32)
    return img1, img2, flow, valid


def test_dense_refrng_draw_for_draw():
    ref_mod, torch = _load_reference_augmentor()
    for seed in range(12):
        img1, img2, flow = _data(seed)

        np.random.seed(seed)
        torch.manual_seed(seed)
        ref_aug = ref_mod.FlowAugmentor(crop_size=(64, 80))
        r1, r2, rf = ref_aug(img1.copy(), img2.copy(), flow.copy())

        np.random.seed(seed)
        torch.manual_seed(seed)
        ours = FlowAugmentor(crop_size=(64, 80), refrng=True)
        o1, o2, of, _ = ours(img1.copy(), img2.copy(), flow.copy())

        assert np.array_equal(o1, np.asarray(r1, np.float32)), seed
        assert np.array_equal(o2, np.asarray(r2, np.float32)), seed
        assert np.array_equal(of, np.asarray(rf, np.float32)), seed


def test_sparse_refrng_draw_for_draw():
    ref_mod, torch = _load_reference_augmentor()
    for seed in range(12):
        img1, img2, flow, valid = _data(seed, sparse=True)

        np.random.seed(seed)
        torch.manual_seed(seed)
        ref_aug = ref_mod.SparseFlowAugmentor(crop_size=(64, 80))
        r1, r2, rf, rv = ref_aug(img1.copy(), img2.copy(), flow.copy(),
                                 valid.copy())

        np.random.seed(seed)
        torch.manual_seed(seed)
        ours = SparseFlowAugmentor(crop_size=(64, 80), refrng=True)
        o1, o2, of, ov = ours(img1.copy(), img2.copy(), flow.copy(),
                              valid.copy())

        assert np.array_equal(o1, np.asarray(r1, np.float32)), seed
        assert np.array_equal(o2, np.asarray(r2, np.float32)), seed
        assert np.array_equal(of, np.asarray(rf, np.float32)), seed
        assert np.array_equal(ov, np.asarray(rv, np.float32)), seed


def test_pyrandom_jitter_impl_runs():
    """torchvision<=0.8 semantics: python-random draws, same PIL ops."""
    import random

    img = np.random.default_rng(0).integers(0, 256, (40, 50, 3)) \
        .astype(np.uint8)
    random.seed(3)
    a = RefColorJitter(0.4, 0.4, 0.4, 0.5 / 3.14, impl="py")(img)
    random.seed(3)
    b = RefColorJitter(0.4, 0.4, 0.4, 0.5 / 3.14, impl="py")(img)
    assert np.array_equal(a, b)
    assert a.shape == img.shape and a.dtype == np.uint8
