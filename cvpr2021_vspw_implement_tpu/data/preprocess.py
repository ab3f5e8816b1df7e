"""Offline 480p preprocessing tool (reference: change2_480p.py:11-30).

Resizes every frame (bilinear) and mask (nearest) to height 480 preserving
aspect ratio.  Parallelised over a thread pool (PIL releases the GIL during
decode/encode).

Usage: python -m cvpr2021_vspw_implement_tpu.data.preprocess SRC DST [--workers N]
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

from PIL import Image


def change(src_root: str, dst_root: str, video: str, image: str) -> None:
    img = Image.open(os.path.join(src_root, "data", video, "origin", image))
    w, h = img.size
    odir = os.path.join(dst_root, "data", video, "origin")
    os.makedirs(odir, exist_ok=True)
    img.resize((int(480 * w / h), 480), Image.BILINEAR).save(
        os.path.join(odir, image))

    stem = os.path.splitext(image)[0]
    mpath = os.path.join(src_root, "data", video, "mask", stem + ".png")
    if os.path.isfile(mpath):
        mdir = os.path.join(dst_root, "data", video, "mask")
        os.makedirs(mdir, exist_ok=True)
        Image.open(mpath).resize((int(480 * w / h), 480), Image.NEAREST).save(
            os.path.join(mdir, stem + ".png"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    jobs = []
    with ThreadPoolExecutor(args.workers) as pool:
        for video in sorted(os.listdir(os.path.join(args.src, "data"))):
            if video.startswith("."):
                continue
            vdir = os.path.join(args.src, "data", video, "origin")
            for image in sorted(os.listdir(vdir)):
                if image.startswith("."):
                    continue
                jobs.append(pool.submit(change, args.src, args.dst, video, image))
        for j in jobs:
            j.result()
    # split lists carry over unchanged
    for split in ("train", "val", "test"):
        sp = os.path.join(args.src, split + ".txt")
        if os.path.isfile(sp):
            with open(sp) as f, open(os.path.join(args.dst, split + ".txt"), "w") as g:
                g.write(f.read())
    print("finish")


if __name__ == "__main__":
    main()
