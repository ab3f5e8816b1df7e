"""Optical-flow training datasets + augmentor
(reference: RAFT_core/datasets.py, RAFT_core/utils/augmentor.py).

Directory-layout loaders for the standard flow benchmarks plus a generic
(img1, img2, flow[, valid]) pair dataset.  The augmentors implement the
FULL reference semantics — photometric ColorJitter (asymmetric with p=0.2),
occlusion eraser, 2^U scale + per-axis stretch, h/v flips with flow sign
fixes, and the sparse (KITTI) variant's splat-based flow-map resize.

Two RNG modes:

* default — self-contained ``np.random.default_rng(seed)`` stream with a
  numpy ColorJitter (same blend formulas as torchvision's functional
  backend); reproducible and thread-safe.
* ``refrng=True`` — DRAW-FOR-DRAW reference parity: every random draw
  comes from the same stream, in the same call order, as the reference
  (global ``np.random`` legacy stream for the augmentor body; the torch
  global stream — or python ``random`` for torchvision<=0.8 semantics —
  inside ColorJitter), photometric ops use PIL ImageEnhance arithmetic
  (torchvision's PIL backend) and resizes use cv2.resize(INTER_LINEAR),
  so outputs are bit-identical to the reference pipeline under equal
  seeds (proven in tests/test_flow_refrng.py by executing the actual
  reference augmentor module).

Resize uses cv2.resize(INTER_LINEAR) exactly as the reference when cv2 is
importable, with a PIL BILINEAR fallback (sub-lsb interpolation-weight
differences only).
"""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image, ImageEnhance

try:
    import cv2
    cv2.setNumThreads(0)
    _HAVE_CV2 = True
except Exception:  # pragma: no cover - cv2 is present in this image
    _HAVE_CV2 = False

from .frame_utils import read_flo, read_kitti_png


class ColorJitterNP:
    """numpy re-implementation of torchvision.transforms.ColorJitter on
    uint8 images: random op order, factors drawn uniformly, blend formulas
    per torchvision.transforms.functional (brightness: img*f; contrast:
    blend with the mean of the grayscale; saturation: blend with the
    per-pixel grayscale; hue: HSV hue rotation)."""

    def __init__(self, brightness, contrast, saturation, hue, rng):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = rng

    @staticmethod
    def _gray(img):
        # ITU-R 601-2 luma (PIL convert("L") / torchvision rgb_to_grayscale)
        return (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2])

    def __call__(self, img_u8):
        img = img_u8.astype(np.float32)
        order = self.rng.permutation(4)
        for op in order:
            if op == 0 and self.brightness:
                f = self.rng.uniform(max(0.0, 1 - self.brightness),
                                     1 + self.brightness)
                img = img * f
            elif op == 1 and self.contrast:
                f = self.rng.uniform(max(0.0, 1 - self.contrast),
                                     1 + self.contrast)
                mean = self._gray(np.clip(img, 0, 255)).mean()
                img = f * img + (1 - f) * mean
            elif op == 2 and self.saturation:
                f = self.rng.uniform(max(0.0, 1 - self.saturation),
                                     1 + self.saturation)
                g = self._gray(np.clip(img, 0, 255))[..., None]
                img = f * img + (1 - f) * g
            elif op == 3 and self.hue:
                f = self.rng.uniform(-self.hue, self.hue)
                img = self._shift_hue(np.clip(img, 0, 255), f)
            img = np.clip(img, 0, 255)
        return img.astype(np.uint8)

    @staticmethod
    def _shift_hue(img, f):
        import colorsys  # noqa: F401  (documents the HSV convention)
        r, g, b = img[..., 0] / 255, img[..., 1] / 255, img[..., 2] / 255
        mx = np.maximum(np.maximum(r, g), b)
        mn = np.minimum(np.minimum(r, g), b)
        d = mx - mn
        h = np.zeros_like(mx)
        m = d > 0
        rm = m & (mx == r)
        gm = m & (mx == g) & ~rm
        bm = m & ~rm & ~gm
        h[rm] = ((g - b)[rm] / d[rm]) % 6
        h[gm] = (b - r)[gm] / d[gm] + 2
        h[bm] = (r - g)[bm] / d[bm] + 4
        h = h / 6.0
        s = np.where(mx > 0, d / np.maximum(mx, 1e-12), 0.0)
        h = (h + f) % 1.0
        i = np.floor(h * 6.0)
        fr = h * 6.0 - i
        p = mx * (1 - s)
        q = mx * (1 - s * fr)
        t = mx * (1 - s * (1 - fr))
        i = i.astype(np.int32) % 6
        r2 = np.choose(i, [mx, q, p, p, t, mx])
        g2 = np.choose(i, [t, mx, mx, q, p, p])
        b2 = np.choose(i, [p, p, t, mx, mx, q])
        return np.stack([r2, g2, b2], -1) * 255.0


def _resize_img(img, scale_x, scale_y):
    """cv2.resize(None, fx=, fy=, INTER_LINEAR) — the reference's resize
    (augmentor.py:85-88) — with a PIL BILINEAR fallback if cv2 is absent
    (interpolation weights then differ at sub-lsb level only)."""
    if _HAVE_CV2:
        return cv2.resize(img, None, fx=scale_x, fy=scale_y,
                          interpolation=cv2.INTER_LINEAR)
    h, w = img.shape[:2]
    nh, nw = int(round(h * scale_y)), int(round(w * scale_x))
    if img.ndim == 3 and img.shape[2] == 2:  # flow: resize channels apart
        chans = [np.asarray(Image.fromarray(img[..., c]).resize(
            (nw, nh), Image.BILINEAR)) for c in range(2)]
        return np.stack(chans, -1)
    return np.asarray(Image.fromarray(img.astype(np.uint8)).resize(
        (nw, nh), Image.BILINEAR))


class _LegacyNPRandom:
    """Adapter giving the reference's GLOBAL legacy ``np.random`` stream the
    ``Generator`` method names the augmentors call — each method is the
    exact legacy function the reference calls at the same point
    (augmentor.py: np.random.rand/uniform/randint), so draws match the
    reference draw for draw."""

    @staticmethod
    def random():
        return np.random.rand()

    @staticmethod
    def uniform(low, high):
        return np.random.uniform(low, high)

    @staticmethod
    def integers(low, high):
        return np.random.randint(low, high)


def _pil_adjust_hue(img, hue_factor):
    """torchvision functional_pil.adjust_hue: uint8 hue-channel rotation in
    PIL's HSV space (wrap-around uint8 add of hue_factor*255)."""
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    # torchvision writes ``np_h += np.uint8(hue_factor * 255)``; under the
    # reference-era numpy 1.x a negative float wraps modulo 256 (truncate
    # toward zero, then wrap) — numpy 2.x raises instead, so emulate
    shift = np.uint8(int(hue_factor * 255) % 256)
    with np.errstate(over="ignore"):
        np_h += shift
    h = Image.fromarray(np_h, "L")
    return Image.merge("HSV", (h, s, v)).convert("RGB")


class RefColorJitter:
    """Draw-for-draw torchvision.transforms.ColorJitter (PIL backend).

    Matches torchvision's RNG stream and uint8 arithmetic exactly:

    * ``impl='torch'`` (torchvision >= 0.9, the torch-1.8/CVPR2021 era):
      ``torch.randperm(4)`` then one ``torch.empty(1).uniform_`` per
      enabled op drawn lazily in permutation order, all against the torch
      GLOBAL generator.
    * ``impl='py'`` (torchvision <= 0.8 / RAFT's published torch-1.6
      pin): one ``random.uniform`` per enabled op in fixed
      brightness/contrast/saturation/hue order, then ``random.shuffle``
      of the op list — all against python's global ``random`` stream.

    Applications go through PIL ImageEnhance / HSV exactly as
    torchvision's PIL backend, so outputs are bit-identical uint8.
    Accepts and returns numpy uint8 HWC (the reference wraps with
    ``Image.fromarray`` / ``np.array`` — augmentor.py:42-49).
    """

    def __init__(self, brightness, contrast, saturation, hue,
                 impl: str = "torch"):
        self.brightness = (max(0.0, 1 - brightness), 1 + brightness)
        self.contrast = (max(0.0, 1 - contrast), 1 + contrast)
        self.saturation = (max(0.0, 1 - saturation), 1 + saturation)
        self.hue = (-hue, hue)
        self.impl = impl

    def _apply(self, img, fn_id, factor):
        if fn_id == 0:
            return ImageEnhance.Brightness(img).enhance(factor)
        if fn_id == 1:
            return ImageEnhance.Contrast(img).enhance(factor)
        if fn_id == 2:
            return ImageEnhance.Color(img).enhance(factor)
        return _pil_adjust_hue(img, factor)

    def __call__(self, img_u8):
        img = Image.fromarray(np.ascontiguousarray(img_u8))
        if self.impl == "torch":
            import torch
            for fn_id in torch.randperm(4).tolist():
                rng_range = (self.brightness, self.contrast,
                             self.saturation, self.hue)[fn_id]
                factor = float(torch.empty(1).uniform_(*rng_range))
                img = self._apply(img, fn_id, factor)
        else:
            import random as _pyrandom
            ops = []
            for fn_id, rng_range in enumerate(
                    (self.brightness, self.contrast, self.saturation,
                     self.hue)):
                ops.append((fn_id, _pyrandom.uniform(*rng_range)))
            _pyrandom.shuffle(ops)
            for fn_id, factor in ops:
                img = self._apply(img, fn_id, factor)
        return np.array(img, dtype=np.uint8)


class FlowAugmentor:
    """Dense-flow augmentation, full reference semantics
    (reference: RAFT_core/utils/augmentor.py:15-118)."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5,
                 do_flip: bool = True, seed: int | None = None,
                 refrng: bool = False, jitter_impl: str = "torch"):
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = 0.8
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.do_flip = do_flip
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.1
        if refrng:
            # draw-for-draw reference RNG parity (see module docstring)
            self.rng = _LegacyNPRandom()
            self.photo_aug = RefColorJitter(0.4, 0.4, 0.4, 0.5 / 3.14,
                                            impl=jitter_impl)
        else:
            self.rng = np.random.default_rng(seed)
            self.photo_aug = ColorJitterNP(0.4, 0.4, 0.4, 0.5 / 3.14,
                                           self.rng)
        self.asymmetric_color_aug_prob = 0.2
        self.eraser_aug_prob = 0.5

    def color_transform(self, img1, img2):
        if self.rng.random() < self.asymmetric_color_aug_prob:
            return self.photo_aug(img1), self.photo_aug(img2)
        stack = np.concatenate([img1, img2], axis=0)
        stack = self.photo_aug(stack)
        i1, i2 = np.split(stack, 2, axis=0)
        return i1, i2

    def eraser_transform(self, img1, img2, bounds=(50, 100)):
        ht, wd = img1.shape[:2]
        img2 = img2.copy()
        if self.rng.random() < self.eraser_aug_prob:
            mean_color = np.mean(img2.reshape(-1, 3), axis=0)
            for _ in range(int(self.rng.integers(1, 3))):
                x0 = int(self.rng.integers(0, wd))
                y0 = int(self.rng.integers(0, ht))
                dx = int(self.rng.integers(bounds[0], bounds[1]))
                dy = int(self.rng.integers(bounds[0], bounds[1]))
                img2[y0:y0 + dy, x0:x0 + dx, :] = mean_color
        return img1, img2

    def spatial_transform(self, img1, img2, flow):
        ht, wd = img1.shape[:2]
        min_scale = np.maximum((self.crop_size[0] + 8) / float(ht),
                               (self.crop_size[1] + 8) / float(wd))
        scale = 2 ** self.rng.uniform(self.min_scale, self.max_scale)
        scale_x = scale_y = scale
        if self.rng.random() < self.stretch_prob:
            scale_x *= 2 ** self.rng.uniform(-self.max_stretch,
                                             self.max_stretch)
            scale_y *= 2 ** self.rng.uniform(-self.max_stretch,
                                             self.max_stretch)
        scale_x = np.clip(scale_x, min_scale, None)
        scale_y = np.clip(scale_y, min_scale, None)

        if self.rng.random() < self.spatial_aug_prob:
            img1 = _resize_img(img1, scale_x, scale_y)
            img2 = _resize_img(img2, scale_x, scale_y)
            flow = _resize_img(flow.astype(np.float32), scale_x, scale_y)
            # list (not f32 array) multiply: promote to f64 exactly like
            # the reference (augmentor.py:89) so f32 rounding happens ONCE
            # at return — keeps refrng mode bit-identical
            flow = flow * [scale_x, scale_y]

        if self.do_flip:
            if self.rng.random() < self.h_flip_prob:
                img1 = img1[:, ::-1]
                img2 = img2[:, ::-1]
                flow = flow[:, ::-1] * [-1.0, 1.0]
            if self.rng.random() < self.v_flip_prob:
                img1 = img1[::-1]
                img2 = img2[::-1]
                flow = flow[::-1] * [1.0, -1.0]

        y0 = int(self.rng.integers(0, img1.shape[0] - self.crop_size[0]))
        x0 = int(self.rng.integers(0, img1.shape[1] - self.crop_size[1]))
        sl = np.s_[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        return img1[sl], img2[sl], flow[sl]

    def __call__(self, img1, img2, flow, valid=None):
        img1 = np.clip(img1, 0, 255).astype(np.uint8)
        img2 = np.clip(img2, 0, 255).astype(np.uint8)
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow = self.spatial_transform(img1, img2, flow)
        out_valid = np.ones(flow.shape[:2], np.float32)
        return (np.ascontiguousarray(img1, np.float32),
                np.ascontiguousarray(img2, np.float32),
                np.ascontiguousarray(flow, np.float32),
                np.ascontiguousarray(out_valid))


class SparseFlowAugmentor:
    """Sparse-flow (KITTI) augmentation with splat-based flow-map resize
    (reference: RAFT_core/utils/augmentor.py:122-246)."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5,
                 do_flip: bool = False, seed: int | None = None,
                 refrng: bool = False, jitter_impl: str = "torch"):
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = 0.8
        self.do_flip = do_flip
        if refrng:
            self.rng = _LegacyNPRandom()
            self.photo_aug = RefColorJitter(0.3, 0.3, 0.3, 0.3 / 3.14,
                                            impl=jitter_impl)
        else:
            self.rng = np.random.default_rng(seed)
            self.photo_aug = ColorJitterNP(0.3, 0.3, 0.3, 0.3 / 3.14,
                                           self.rng)
        self.eraser_aug_prob = 0.5

    def color_transform(self, img1, img2):
        stack = np.concatenate([img1, img2], axis=0)
        stack = self.photo_aug(stack)
        i1, i2 = np.split(stack, 2, axis=0)
        return i1, i2

    eraser_transform = FlowAugmentor.eraser_transform

    @staticmethod
    def resize_sparse_flow_map(flow, valid, fx=1.0, fy=1.0):
        ht, wd = flow.shape[:2]
        coords = np.stack(np.meshgrid(np.arange(wd), np.arange(ht)),
                          axis=-1).reshape(-1, 2).astype(np.float32)
        flow_f = flow.reshape(-1, 2).astype(np.float32)
        valid_f = valid.reshape(-1).astype(np.float32)
        coords0 = coords[valid_f >= 1]
        flow0 = flow_f[valid_f >= 1]
        ht1, wd1 = int(round(ht * fy)), int(round(wd * fx))
        coords1 = coords0 * [fx, fy]
        flow1 = flow0 * [fx, fy]
        xx = np.round(coords1[:, 0]).astype(np.int32)
        yy = np.round(coords1[:, 1]).astype(np.int32)
        v = (xx > 0) & (xx < wd1) & (yy > 0) & (yy < ht1)
        flow_img = np.zeros([ht1, wd1, 2], np.float32)
        valid_img = np.zeros([ht1, wd1], np.int32)
        flow_img[yy[v], xx[v]] = flow1[v]
        valid_img[yy[v], xx[v]] = 1
        return flow_img, valid_img

    def spatial_transform(self, img1, img2, flow, valid):
        ht, wd = img1.shape[:2]
        min_scale = np.maximum((self.crop_size[0] + 1) / float(ht),
                               (self.crop_size[1] + 1) / float(wd))
        scale = 2 ** self.rng.uniform(self.min_scale, self.max_scale)
        scale_x = float(np.clip(scale, min_scale, None))
        scale_y = float(np.clip(scale, min_scale, None))
        if self.rng.random() < self.spatial_aug_prob:
            img1 = _resize_img(img1, scale_x, scale_y)
            img2 = _resize_img(img2, scale_x, scale_y)
            flow, valid = self.resize_sparse_flow_map(flow, valid,
                                                      scale_x, scale_y)
        if self.do_flip and self.rng.random() < 0.5:
            img1 = img1[:, ::-1]
            img2 = img2[:, ::-1]
            flow = flow[:, ::-1] * np.array([-1.0, 1.0], np.float32)
            valid = valid[:, ::-1]
        margin_y, margin_x = 20, 50
        y0 = int(self.rng.integers(
            0, img1.shape[0] - self.crop_size[0] + margin_y))
        x0 = int(self.rng.integers(
            -margin_x, img1.shape[1] - self.crop_size[1] + margin_x))
        y0 = int(np.clip(y0, 0, img1.shape[0] - self.crop_size[0]))
        x0 = int(np.clip(x0, 0, img1.shape[1] - self.crop_size[1]))
        sl = np.s_[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        return img1[sl], img2[sl], flow[sl], valid[sl]

    def __call__(self, img1, img2, flow, valid):
        img1 = np.clip(img1, 0, 255).astype(np.uint8)
        img2 = np.clip(img2, 0, 255).astype(np.uint8)
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow, valid = self.spatial_transform(
            img1, img2, flow, valid)
        return (np.ascontiguousarray(img1, np.float32),
                np.ascontiguousarray(img2, np.float32),
                np.ascontiguousarray(flow, np.float32),
                np.ascontiguousarray(valid.astype(np.float32)))


class FlowPairDataset:
    """Generic list of (img1_path, img2_path, flow_path[, kitti]) triplets."""

    def __init__(self, triplets, augmentor: FlowAugmentor | None = None,
                 kitti_format: bool = False):
        self.triplets = list(triplets)
        self.augmentor = augmentor
        self.kitti_format = kitti_format

    def __len__(self):
        return len(self.triplets)

    def __getitem__(self, idx):
        p1, p2, pf = self.triplets[idx]
        img1 = np.asarray(Image.open(p1).convert("RGB"), np.float32)
        img2 = np.asarray(Image.open(p2).convert("RGB"), np.float32)
        if self.kitti_format:
            flow, valid = read_kitti_png(pf)
        else:
            flow, valid = read_flo(pf), None
        if self.augmentor is not None:
            return self.augmentor(img1, img2, flow, valid)
        out_valid = valid if valid is not None else np.ones(flow.shape[:2],
                                                            np.float32)
        return img1, img2, flow, out_valid


def flying_chairs(root: str, augmentor=None, split: str | None = None):
    """FlyingChairs layout: data/NNNNN_img{1,2}.ppm + NNNNN_flow.flo.

    ``split`` = 'training'/'validation' applies the official
    chairs_split.txt (1 = train, 2 = val; reference:
    RAFT_core/datasets.py:121-134, file looked up in ``root`` then its
    parent); None uses every pair."""
    flows = sorted(glob.glob(os.path.join(root, "data", "*_flow.flo")))
    trips = [(f.replace("_flow.flo", "_img1.ppm"),
              f.replace("_flow.flo", "_img2.ppm"), f) for f in flows]
    if split is not None:
        for cand in (os.path.join(root, "chairs_split.txt"),
                     os.path.join(os.path.dirname(root.rstrip("/")),
                                  "chairs_split.txt")):
            if os.path.exists(cand):
                ids = np.loadtxt(cand, dtype=np.int32)
                want = 1 if split == "training" else 2
                trips = [t for t, x in zip(trips, ids) if x == want]
                break
        else:
            raise FileNotFoundError(
                f"chairs_split.txt not found near {root} (required for "
                f"split={split!r})")
    return FlowPairDataset(trips, augmentor)


def flying_things(root: str, dstype: str = "frames_cleanpass",
                  augmentor=None):
    """FlyingThings3D layout (reference: RAFT_core/datasets.py:137-158):
    <dstype>/TRAIN/*/*/left/*.png paired with
    optical_flow/TRAIN/*/*/into_{future,past}/left/*.pfm."""
    from .frame_utils import read_pfm

    trips = []
    for direction in ("into_future", "into_past"):
        image_dirs = sorted(glob.glob(os.path.join(root, dstype,
                                                   "TRAIN", "*", "*")))
        image_dirs = sorted(os.path.join(d, "left") for d in image_dirs)
        flow_dirs = sorted(glob.glob(os.path.join(root, "optical_flow",
                                                  "TRAIN", "*", "*")))
        flow_dirs = sorted(os.path.join(d, direction, "left")
                           for d in flow_dirs)
        for idir, fdir in zip(image_dirs, flow_dirs):
            images = sorted(glob.glob(os.path.join(idir, "*.png")))
            flows = sorted(glob.glob(os.path.join(fdir, "*.pfm")))
            for i in range(len(flows) - 1):
                if direction == "into_future":
                    trips.append((images[i], images[i + 1], flows[i]))
                else:
                    trips.append((images[i + 1], images[i], flows[i + 1]))

    class _PfmDataset(FlowPairDataset):
        def __getitem__(self, idx):
            p1, p2, pf = self.triplets[idx]
            img1 = np.asarray(Image.open(p1).convert("RGB"), np.float32)
            img2 = np.asarray(Image.open(p2).convert("RGB"), np.float32)
            flow = read_pfm(pf)[:, :, :2]
            if self.augmentor is not None:
                return self.augmentor(img1, img2, flow, None)
            return img1, img2, flow, np.ones(flow.shape[:2], np.float32)

    return _PfmDataset(trips, augmentor)


def sintel(root: str, split: str = "training", dstype: str = "clean",
           augmentor=None):
    """Sintel layout: <split>/<dstype>/<scene>/frame_NNNN.png + flow/."""
    trips = []
    img_root = os.path.join(root, split, dstype)
    for scene in sorted(os.listdir(img_root)):
        frames = sorted(glob.glob(os.path.join(img_root, scene, "*.png")))
        for a, b in zip(frames[:-1], frames[1:]):
            flo = os.path.join(root, split, "flow", scene,
                               os.path.basename(a).replace(".png", ".flo"))
            trips.append((a, b, flo))
    return FlowPairDataset(trips, augmentor)


def kitti(root: str, split: str = "training", augmentor=None):
    """KITTI-2015 layout: image_2/NNNNNN_1{0,1}.png + flow_occ/."""
    img1s = sorted(glob.glob(os.path.join(root, split, "image_2", "*_10.png")))
    trips = [(a, a.replace("_10.png", "_11.png"),
              os.path.join(root, split, "flow_occ", os.path.basename(a)))
             for a in img1s]
    return FlowPairDataset(trips, augmentor, kitti_format=True)


def hd1k(root: str, augmentor=None):
    """HD1K layout (reference: RAFT_core/datasets.py:166-183):
    hd1k_input/image_2/SSSSSS_NNNN.png paired consecutively WITHIN each
    6-digit sequence prefix against hd1k_flow_gt/flow_occ/ (sparse
    KITTI-png flow).  Like the reference, the last frame of each sequence
    has no successor and is dropped."""
    trips = []
    seq_ix = 0
    while True:
        flows = sorted(glob.glob(os.path.join(
            root, "hd1k_flow_gt", "flow_occ", "%06d_*.png" % seq_ix)))
        images = sorted(glob.glob(os.path.join(
            root, "hd1k_input", "image_2", "%06d_*.png" % seq_ix)))
        if len(flows) == 0:
            break
        for i in range(len(flows) - 1):
            trips.append((images[i], images[i + 1], flows[i]))
        seq_ix += 1
    return FlowPairDataset(trips, augmentor, kitti_format=True)


class MixedFlowDataset:
    """Weighted concatenation of flow datasets — the exact sampling
    equivalent of the reference's ``100*clean + 100*final + 200*kitti +
    5*hd1k + things`` torch ConcatDataset sum (RAFT_core/datasets.py:220):
    uniform index draws over the virtual concatenation hit each part with
    probability proportional to multiplier * len(part), and every part
    keeps its OWN augmentor (the reference composes per-dataset aug
    params into each member)."""

    def __init__(self, parts):
        """parts: iterable of (dataset, multiplier)."""
        self.parts = [(ds, int(m)) for ds, m in parts]
        assert all(m > 0 for _, m in self.parts)
        self._sizes = [m * len(ds) for ds, m in self.parts]

    def __len__(self):
        return sum(self._sizes)

    def __getitem__(self, idx):
        if idx < 0:
            idx += len(self)
        for (ds, _m), sz in zip(self.parts, self._sizes):
            if idx < sz:
                return ds[idx % len(ds)]
            idx -= sz
        raise IndexError(idx)
