"""VSPW-480p datasets: indexing, augmentation, label remap.

Mirrors the reference data layer semantics (reference: dataset2.py) with a
host-side numpy implementation feeding the TPU input pipeline:

  * directory layout ``<root>/data/<video>/{origin,mask}/*`` with
    ``<root>/<split>.txt`` video lists;
  * label remap 0→255(ignore), v→v-1, 254→255 (dataset2.py:602-609);
  * ImageNet mean/std normalization (dataset2.py:531-533);
  * train aug: shared-per-clip horizontal flip, multiscale {0.8,1,1.5,2}
    PIL resize (bilinear img / nearest mask), pad-to-cropsize (img 0 / label
    255) + shared random crop (dataset2.py:634-653, clip variant 806-845);
  * fps subsampling ``k % int(15/trainfps) == 0`` (dataset2.py:524-527);
  * clip sampling: contiguous run from a random dilated sublist
    (BaseDataset_clip, dataset2.py:780-849) and anchor+offsets long clips
    with p=0.5 temporal reversal (BaseDataset_longclip, dataset2.py:984-1048);
  * eval datasets per video: sequential frames, centered neighbor windows
    (TestDataset_clip, dataset2.py:270-338), anchor+offset windows with
    edge fallback to anchor-dil (TestDataset_longclip, dataset2.py:433-476).

All outputs are NHWC numpy (images float32 normalized, labels int32).
"""

from __future__ import annotations

import os
import random
from typing import Sequence

import numpy as np
from PIL import Image

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------
def normalize_image(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] → ImageNet-normalized float32.

    uint8 inputs take the fused native path (native/hostops.cpp) — one pass
    instead of the /255, subtract, divide temporaries."""
    if img.dtype == np.uint8:
        from .. import native
        return native.normalize_u8(img)
    return (img - MEAN) / STD


def remap_label(segm: np.ndarray) -> np.ndarray:
    """Mask remap (reference: dataset2.py:602-609): 0→255, v→v-1, 254→255."""
    if segm.dtype == np.uint8:
        from .. import native
        return native.remap_label_u8(segm)
    segm = segm.astype(np.int32)
    out = segm - 1
    out[segm == 0] = 255
    out[out == 254] = 255
    return out


def _load_mask(dataroot, video, imgname, lesslabel):
    maskdir = "mask_42label" if lesslabel else "mask"
    return Image.open(os.path.join(dataroot, "data", video, maskdir,
                                   os.path.splitext(imgname)[0] + ".png"))


def load_frame(dataroot: str, video: str, imgname: str,
               lesslabel: bool = False):
    """Load (PIL image RGB, PIL mask) for one frame.

    JPEG frames take the native libjpeg path (native/jpegpool.cpp —
    bit-identical to PIL's decode, tested) wrapped back into a PIL image so
    the augmentation ops are unchanged; PIL is the fallback."""
    path = os.path.join(dataroot, "data", video, "origin", imgname)
    img = None
    if imgname.lower().endswith((".jpg", ".jpeg")):
        from .. import native
        arr = native.decode_jpeg(path)
        if arr is not None:
            img = Image.fromarray(arr)
    if img is None:
        img = Image.open(path).convert("RGB")
    return img, _load_mask(dataroot, video, imgname, lesslabel)


def list_videos(dataroot: str, split: str) -> list[str]:
    with open(os.path.join(dataroot, split + ".txt")) as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def list_frames(dataroot: str, video: str) -> list[str]:
    return sorted(os.listdir(os.path.join(dataroot, "data", video, "origin")))


def dilation_lists(frames: Sequence[str], num: int) -> list[list[str]]:
    """Split frames into num+1 stride-(num+1) sublists (dataset2.py:143-151)."""
    return [[f for k, f in enumerate(frames) if k % (num + 1) == a]
            for a in range(num + 1)]


SCALES = (0.8, 1.0, 1.5, 2.0)


def _item_rng_handles(args, seed, epoch: int, idx: int):
    """Per-(epoch, item) RNG pair for history-free augmentation draws.

    A stateful stream ties each item's augmentation to everything consumed
    before it, which makes step-exact preemption resume impossible without
    replaying the whole history.  Seeding per (seed, epoch, index) keeps
    draws random across epochs AND reproducible from any resume point
    (tests/test_resume.py).  ``refrng`` keeps the reference's stateful
    global streams (draw-for-draw parity, tests/test_refrng.py)."""
    if getattr(args, "refrng", False):
        return random, np.random
    mix = (seed or 0) * 1_000_003 + epoch * 65_537 + idx
    return random.Random(mix), np.random.default_rng(mix)


def _rng_handles(args, seed):
    """RNG pair (python-random-like, numpy-random-like).

    Default: per-dataset generators (reproducible, parallel-safe).
    ``args.refrng`` opt-in: the GLOBAL ``random`` / ``np.random`` module
    streams, drawn in the reference's exact call order — seeding them like
    the reference driver does (train_clip2.py seeds nothing; a test seeds
    np.random.seed/random.seed) reproduces the reference's augmentation
    draw-for-draw (reference consumption sites: dataset2.py:634-653,
    806-845, 989-990)."""
    if getattr(args, "refrng", False):
        return random, np.random
    return random.Random(seed), np.random.default_rng(seed)


def _augment_frame(img: Image.Image, mask: Image.Image, flip: bool,
                   scale: float):
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
    if scale != 1.0:
        w, h = img.size
        img = img.resize((int(w * scale), int(h * scale)), Image.BILINEAR)
        mask = mask.resize((int(w * scale), int(h * scale)), Image.NEAREST)
    return img, mask


def _pad_crop_clip(imgs: list[np.ndarray], labels: list[np.ndarray],
                   cropsize: tuple[int, int], rng: random.Random):
    """Shared pad + random crop across a clip (dataset2.py:806-845).

    Pads symmetrically by the deficit (the reference pads (pad, pad) on both
    sides) with 0 for images / 255 for labels, then one crop offset for all.
    """
    ch, cw = cropsize
    h, w = imgs[0].shape[:2]
    padh = ch - h if h < ch else 0
    padw = cw - w if w < cw else 0
    ph, pw = h + 2 * padh, w + 2 * padw
    x = rng.randint(0, pw - cw)
    y = rng.randint(0, ph - ch)
    out_i, out_l = [], []
    for img, lab in zip(imgs, labels):
        if padh or padw:
            img = np.pad(img, ((padh, padh), (padw, padw), (0, 0)), "constant")
            lab = np.pad(lab, ((padh, padh), (padw, padw)), "constant",
                         constant_values=255)
        out_i.append(img[y:y + ch, x:x + cw])
        out_l.append(lab[y:y + ch, x:x + cw])
    return out_i, out_l


# ---------------------------------------------------------------------------
# train datasets
# ---------------------------------------------------------------------------
class FrameDataset:
    """Single-frame train/val dataset (reference BaseDataset, dataset2.py:494-654)."""

    def __init__(self, args, split: str = "train", seed: int | None = None):
        self.args = args
        self.split = split
        self.dataroot = args.dataroot
        self.cropsize = (480, 720) if getattr(args, "train_filter", False) \
            else (args.cropsize, args.cropsize)
        trainfps = 1 if split == "val" else args.trainfps
        self.seed = seed or 0
        self.epoch = 0
        self.rng, self.nprng = _rng_handles(args, seed)

        self.imglist: list[tuple[str, str]] = []
        num = int(15.0 / trainfps)
        for video in list_videos(self.dataroot, split):
            frames = list_frames(self.dataroot, video)
            self.imglist.extend((video, f) for k, f in enumerate(frames)
                                if k % num == 0)

    def __len__(self):
        return len(self.imglist)

    def set_epoch(self, epoch: int):
        """Key per-item augmentation RNG by epoch (called by the loader)."""
        self.epoch = int(epoch)

    def __getitem__(self, idx):
        video, name = self.imglist[idx]
        img, mask = load_frame(self.dataroot, video, name,
                               getattr(self.args, "lesslabel", False))
        rng, nprng = _item_rng_handles(self.args, self.seed, self.epoch,
                                       int(idx))
        if self.split == "train":
            flip = bool(nprng.choice([0, 1]))
            scale = float(nprng.choice(SCALES)) \
                if getattr(self.args, "multi_scale", False) else 1.0
            img, mask = _augment_frame(img, mask, flip, scale)
        arr = np.asarray(img)  # stays uint8 through crop (native fast path)
        lab = remap_label(np.asarray(mask))
        if self.split == "train":
            [arr], [lab] = _pad_crop_clip([arr], [lab], self.cropsize, rng)
        return normalize_image(arr), lab


class ClipDataset:
    """Contiguous-clip train dataset (BaseDataset_clip, dataset2.py:657-849).

    Samples ``clip_num`` consecutive frames from a random temporally-dilated
    sublist of one video, with one shared flip/scale/crop for the clip.
    """

    def __init__(self, args, split: str = "train", seed: int | None = None):
        self.args = args
        self.split = split
        self.dataroot = args.dataroot
        self.cropsize = (args.cropsize, args.cropsize)
        self.clip_num = args.clip_num
        self.dilation = args.dilation_num
        self.rng, self.nprng = _rng_handles(args, seed)
        self.videolists = list_videos(self.dataroot, split)
        self.imgdic = {v: list_frames(self.dataroot, v) for v in self.videolists}

    def __len__(self):
        return len(self.videolists)

    def __getitem__(self, idx):
        video = self.videolists[idx]
        frames = list(self.imgdic[video])
        sublists = dilation_lists(frames, self.dilation)
        sub = sublists[0]
        for _ in range(10):
            sub = sublists[int(self.nprng.choice(len(sublists)))]
            if len(sub) > self.clip_num:
                break
        sub = list(sub)
        while len(sub) <= self.clip_num:
            sub.append(sub[-1])
        start = int(self.nprng.choice(len(sub) - self.clip_num))
        names = sub[start:start + self.clip_num]
        return self._load_clip(video, names)

    def _load_clip(self, video, names):
        flip = bool(self.nprng.choice([0, 1]))
        # the reference draws the scale unconditionally and only APPLIES it
        # under multi_scale (dataset2.py:807-825, 990-1010)
        scale = float(self.nprng.choice(SCALES))
        if not getattr(self.args, "multi_scale", False):
            scale = 1.0
        lesslabel = getattr(self.args, "lesslabel", False)
        # the clip's JPEG frames decode concurrently on the native pool
        decoded = None
        if all(n.lower().endswith((".jpg", ".jpeg")) for n in names):
            from .. import native
            decoded = native.decode_jpeg_batch(
                [os.path.join(self.dataroot, "data", video, "origin", n)
                 for n in names])
        imgs, labs = [], []
        for i, name in enumerate(names):
            if decoded is not None:
                img = Image.fromarray(decoded[i])
                mask = _load_mask(self.dataroot, video, name, lesslabel)
            else:
                img, mask = load_frame(self.dataroot, video, name, lesslabel)
            if self.split == "train":
                img, mask = _augment_frame(img, mask, flip, scale)
            imgs.append(np.asarray(img))  # uint8 until after crop
            labs.append(remap_label(np.asarray(mask)))
        if self.split == "train":
            imgs, labs = _pad_crop_clip(imgs, labs, self.cropsize, self.rng)
        return ([normalize_image(i) for i in imgs], labs)


class LongClipDataset(ClipDataset):
    """Anchor+offsets train dataset (BaseDataset_longclip, dataset2.py:852-1048).

    Frame order is [anchor, anchor+d1, ..., anchor+dk]; the whole video is
    temporally reversed with p=0.5 before sampling the anchor.
    """

    def __init__(self, args, split: str = "train", seed: int | None = None):
        super().__init__(args, split, seed)
        dil = args.dilation2
        self.dilation2 = [int(d) for d in dil.split(",")] \
            if isinstance(dil, str) else list(dil)
        assert len(self.dilation2) + 1 == self.clip_num

    def __getitem__(self, idx):
        video = self.videolists[idx]
        frames = list(self.imgdic[video])
        if self.nprng.random() < 0.5:
            frames = frames[::-1]
        usable = frames[:-self.dilation2[-1]]
        while len(usable) < 1:
            frames.append(frames[-1])
            usable = frames[:-self.dilation2[-1]]
        anchor = int(self.nprng.choice(len(usable)))
        names = [frames[anchor]] + [frames[anchor + d] for d in self.dilation2]
        return self._load_clip(video, names)


class TwoDataset:
    """VSPW frame + a random frame from a second image dataset per item
    (reference TwoDataset, dataset2.py:1052-1242)."""

    def __init__(self, args, split: str = "train", seed: int | None = None):
        self.primary = FrameDataset(args, split, seed)
        import copy
        args2 = copy.copy(args)
        args2.dataroot = args.dataroot2
        self.secondary = FrameDataset(args2, split, seed)
        self.nprng = np.random.default_rng(seed)
        self.cropsize = self.primary.cropsize

    def __len__(self):
        return len(self.primary)

    def __getitem__(self, idx):
        img1, lab1 = self.primary[idx]
        j = int(self.nprng.choice(len(self.secondary)))
        img2, lab2 = self.secondary[j]
        return (img1, lab1), (img2, lab2)


# ---------------------------------------------------------------------------
# eval datasets (per video)
# ---------------------------------------------------------------------------
class TestFrameDataset:
    """Sequential per-video eval frames (TestDataset, dataset2.py:34-141)."""

    __test__ = False  # not a pytest class

    def __init__(self, dataroot: str, video: str, args):
        self.dataroot = dataroot
        self.video = video
        self.args = args
        self.imglist = list_frames(dataroot, video)

    def __len__(self):
        return len(self.imglist)

    def __getitem__(self, idx):
        name = self.imglist[idx]
        img, mask = load_frame(self.dataroot, self.video, name,
                               getattr(self.args, "lesslabel", False))
        if getattr(self.args, "use_720p", False) \
                and type(self) is TestFrameDataset:
            # reference quirk kept: only the per-frame TestDataset honors
            # --use_720p (dataset2.py:130-133); the clip eval datasets
            # accept the flag but ignore it
            img = img.resize((1080, 720), Image.BILINEAR)
            mask = mask.resize((1080, 720), Image.NEAREST)
        arr = normalize_image(np.asarray(img))
        lab = remap_label(np.asarray(mask))
        return arr, lab, os.path.splitext(name)[0] + ".png"


class TestClipDataset(TestFrameDataset):
    """Centered neighbor window per eval frame (TestDataset_clip,
    dataset2.py:154-338): within the frame's dilated sublist, take a
    clip_num window centered on it (edge-clamped); the eval frame itself is
    excluded from the context except for nonlocal3d."""

    def __init__(self, dataroot, video, args):
        super().__init__(dataroot, video, args)
        self.clip_num = args.clip_num
        self.dilation = args.dilation_num
        self.dilists = dilation_lists(self.imglist, self.dilation)
        self.method = getattr(args, "method", "")

    def __getitem__(self, idx):
        arr, lab, gtname = super().__getitem__(idx)
        name = self.imglist[idx]
        thelist = next(dl for dl in self.dilists if name in dl)
        i = thelist.index(name)
        add = self.clip_num // 2 if self.clip_num % 2 else self.clip_num // 2
        addleft = add
        addright = add if self.clip_num % 2 else add - 1
        if i - addleft < 0:
            start, end = 0, min(self.clip_num, len(thelist))
        elif i + addright >= len(thelist):
            end = len(thelist)
            start = max(end - self.clip_num, 0)
        else:
            start, end = i - addleft, i - addleft + self.clip_num

        clips, cliplabs, names = [], [], []
        if end - start < 2:
            clips.append(arr)
            cliplabs.append(lab)
            names.append(name)
        else:
            for j in range(start, end):
                if self.method != "nonlocal3d" and j == i:
                    continue
                cimg, cmask = load_frame(self.dataroot, self.video, thelist[j],
                                         getattr(self.args, "lesslabel", False))
                clips.append(normalize_image(np.asarray(cimg)))
                cliplabs.append(remap_label(np.asarray(cmask)))
                names.append(thelist[j])
        if self.method == "nonlocal3d":
            return arr, lab, clips, cliplabs, gtname, names
        return arr, lab, clips, cliplabs, gtname


class TestLongClipDataset(TestFrameDataset):
    """Anchor + dilation2 offsets per eval frame (TestDataset_longclip,
    dataset2.py:344-490); near the video end, offsets flip backwards."""

    def __init__(self, dataroot, video, args):
        super().__init__(dataroot, video, args)
        dil = args.dilation2
        self.dilation2 = [int(d) for d in dil.split(",")] \
            if isinstance(dil, str) else list(dil)
        self.clip_num = args.clip_num
        assert len(self.dilation2) + 1 == self.clip_num

    def __getitem__(self, idx):
        arr, lab, gtname = super().__getitem__(idx)
        clips, cliplabs = [], []
        for dil in self.dilation2:
            j = idx - dil if idx + self.dilation2[-1] >= len(self.imglist) \
                else idx + dil
            cimg, cmask = load_frame(self.dataroot, self.video,
                                     self.imglist[j],
                                     getattr(self.args, "lesslabel", False))
            clips.append(normalize_image(np.asarray(cimg)))
            cliplabs.append(remap_label(np.asarray(cmask)))
        return arr, lab, clips, cliplabs, gtname
