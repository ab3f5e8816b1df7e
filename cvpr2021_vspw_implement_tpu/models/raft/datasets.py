"""Optical-flow training datasets + augmentor
(reference: RAFT_core/datasets.py, RAFT_core/utils/augmentor.py).

Directory-layout loaders for the standard flow benchmarks plus a generic
(img1, img2, flow[, valid]) pair dataset.  The augmentor implements the
spatial part of the reference's FlowAugmentor (random crop + horizontal /
vertical flips with flow sign fixes); photometric jitter hooks are kept
minimal (brightness/contrast) since torchvision's ColorJitter is not part
of this image.
"""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from .frame_utils import read_flo, read_kitti_png


class FlowAugmentor:
    """Spatial flow augmentation (reference: RAFT_core/utils/augmentor.py)."""

    def __init__(self, crop_size, do_flip: bool = True,
                 brightness: float = 0.2, seed: int | None = None):
        self.crop_size = crop_size
        self.do_flip = do_flip
        self.brightness = brightness
        self.rng = np.random.default_rng(seed)

    def __call__(self, img1, img2, flow, valid=None):
        ch, cw = self.crop_size
        h, w = img1.shape[:2]
        if h < ch or w < cw:
            ph, pw = max(ch - h, 0), max(cw - w, 0)
            pad = ((0, ph), (0, pw))
            img1 = np.pad(img1, pad + ((0, 0),))
            img2 = np.pad(img2, pad + ((0, 0),))
            flow = np.pad(flow, pad + ((0, 0),))
            if valid is not None:
                valid = np.pad(valid, pad)
            h, w = img1.shape[:2]
        y = int(self.rng.integers(0, h - ch + 1))
        x = int(self.rng.integers(0, w - cw + 1))
        sl = np.s_[y:y + ch, x:x + cw]
        img1, img2, flow = img1[sl], img2[sl], flow[sl]
        if valid is not None:
            valid = valid[sl]

        if self.do_flip and self.rng.random() < 0.5:   # h-flip
            img1 = img1[:, ::-1]
            img2 = img2[:, ::-1]
            flow = flow[:, ::-1] * np.array([-1.0, 1.0], np.float32)
            if valid is not None:
                valid = valid[:, ::-1]
        if self.do_flip and self.rng.random() < 0.1:   # v-flip
            img1 = img1[::-1]
            img2 = img2[::-1]
            flow = flow[::-1] * np.array([1.0, -1.0], np.float32)
            if valid is not None:
                valid = valid[::-1]

        if self.brightness:
            scale = 1.0 + self.rng.uniform(-self.brightness, self.brightness)
            img1 = np.clip(img1 * scale, 0, 255)
            img2 = np.clip(img2 * scale, 0, 255)

        out_valid = valid if valid is not None else np.ones(flow.shape[:2],
                                                            np.float32)
        return (np.ascontiguousarray(img1, np.float32),
                np.ascontiguousarray(img2, np.float32),
                np.ascontiguousarray(flow, np.float32),
                np.ascontiguousarray(out_valid, np.float32))


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


def flying_chairs(root: str, augmentor=None):
    """FlyingChairs layout: data/NNNNN_img{1,2}.ppm + NNNNN_flow.flo."""
    flows = sorted(glob.glob(os.path.join(root, "data", "*_flow.flo")))
    trips = [(f.replace("_flow.flo", "_img1.ppm"),
              f.replace("_flow.flo", "_img2.ppm"), f) for f in flows]
    return FlowPairDataset(trips, augmentor)


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
