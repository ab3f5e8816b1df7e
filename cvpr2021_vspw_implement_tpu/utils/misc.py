"""Small host-side helpers: meters, logging, palette, device parsing.

Reference surface: utils.py:110-302 (setup_logger, AverageMeter, colorEncode,
parse_devices) and the hardcoded ``_palette`` of test.py:22.
"""

from __future__ import annotations

import logging
import os
import re
import sys

import numpy as np


class AverageMeter:
    """Running average (reference: utils.py:135-167)."""

    def __init__(self):
        self.val = None
        self.sum = 0.0
        self.count = 0.0

    def update(self, val, weight: float = 1.0):
        self.val = val
        self.sum += val * weight
        self.count += weight

    def value(self):
        return self.val

    def average(self):
        return self.sum / self.count if self.count else None


def setup_logger(distributed_rank: int = 0, filename: str = "log.txt"):
    """Stdout logger (reference: utils.py:110-122)."""
    logger = logging.getLogger("Logger")
    logger.setLevel(logging.DEBUG)
    if distributed_rank > 0 or logger.handlers:
        return logger
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setLevel(logging.DEBUG)
    fmt = "[%(asctime)s %(levelname)s %(filename)s line %(lineno)d %(process)d] %(message)s"
    ch.setFormatter(logging.Formatter(fmt))
    logger.addHandler(ch)
    return logger


def vspw_palette() -> list[int]:
    """The 256-entry PNG palette used for prediction dumps (test.py:22).

    Entries 0-21 follow the VOC bit-pattern colormap with the 192 level
    replaced by 191; entries 22-255 are grayscale (i, i, i).
    """
    def voc_color(i: int):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        return [min(v, 191) if v == 192 else v for v in (r, g, b)]

    palette: list[int] = []
    for i in range(22):
        palette.extend(voc_color(i))
    for i in range(22, 256):
        palette.extend([i, i, i])
    return palette


def colorEncode(labelmap: np.ndarray, colors, mode: str = "RGB") -> np.ndarray:
    """Map a label image to an RGB visualization (reference: utils.py:213-227)."""
    labelmap = labelmap.astype(int)
    colors = np.asarray(colors, dtype=np.uint8)
    h, w = labelmap.shape
    out = np.zeros((h, w, 3), dtype=np.uint8)
    valid = labelmap >= 0
    out[valid] = colors[labelmap[valid] % len(colors)]
    if mode == "BGR":
        return out[:, :, ::-1]
    return out


def find_recursive(root_dir: str, ext: str = ".jpg") -> list[str]:
    files = []
    for root, _dirs, filenames in os.walk(root_dir):
        for filename in filenames:
            if filename.startswith("."):
                continue
            if filename.endswith(ext):
                files.append(os.path.join(root, filename))
    return sorted(files)


class NotSupportedCliException(Exception):
    pass


def parse_devices(input_devices: str) -> list[str]:
    """Parse the reference's ``--gpus`` syntax (reference: utils.py:282-302).

    Kept for CLI compatibility; the result is only used for its *count*
    (number of mesh data-parallel shards).
    """
    ret: list[str] = []
    for d in input_devices.split(","):
        d = d.lower().strip()
        m = re.match(r"^(?:gpu)?(\d+)$", d)
        if m:
            dev = f"gpu{m.group(1)}"
            if dev not in ret:
                ret.append(dev)
            continue
        m = re.match(r"^(?:gpu)?(\d+)-(?:gpu)?(\d+)$", d)
        if m:
            start, end = sorted((int(m.group(1)), int(m.group(2))))
            for x in range(start, end + 1):
                dev = f"gpu{x}"
                if dev not in ret:
                    ret.append(dev)
            continue
        raise NotSupportedCliException(f'Can not recognize device: "{d}"')
    return ret


def honor_platform_env() -> None:
    """Respect an explicit JAX_PLATFORMS env var in the CLI drivers.

    This image's sitecustomize registers the axon TPU plugin and pins
    ``jax_platforms`` programmatically AFTER env-var processing, so
    ``JAX_PLATFORMS=cpu python -m ...train`` would still claim the TPU.
    Drivers call this before touching jax.devices() (e.g. to run on a
    virtual multi-device CPU mesh via xla_force_host_platform_device_count).
    """
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            import jax
            jax.config.update("jax_platforms", env)
        except Exception:
            pass
