"""Flow file IO (reference: RAFT_core/utils/frame_utils.py).

Middlebury ``.flo`` read/write and KITTI 16-bit PNG flow read/write.
"""

from __future__ import annotations

import numpy as np

TAG_FLOAT = 202021.25


def read_flo(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        tag = np.frombuffer(f.read(4), np.float32)[0]
        assert abs(tag - TAG_FLOAT) < 1e-3, f"bad .flo magic in {path}"
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        data = np.frombuffer(f.read(h * w * 2 * 4), np.float32)
    return data.reshape(h, w, 2).copy()


def write_flo(path: str, flow: np.ndarray) -> None:
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.float32(TAG_FLOAT).tofile(f)
        np.int32(w).tofile(f)
        np.int32(h).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_pfm(path: str) -> np.ndarray:
    """PFM image (FlyingThings3D flow storage; reference:
    RAFT_core/utils/frame_utils.py:33-78).  Returns [H, W, C] float32 with
    PFM's bottom-up row order flipped to top-down."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"not a PFM file: {path}")
        dims = f.readline()
        while dims.startswith(b"#"):
            dims = f.readline()
        w, h = (int(v) for v in dims.split())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.frombuffer(f.read(), endian + "f4")
    img = data.reshape(h, w, 3 if color else 1).astype(np.float32)
    return np.flipud(img).copy()


def read_kitti_png(path: str):
    """KITTI flow PNG: 16-bit BGR-stored (valid, v*64+2^15, u*64+2^15)."""
    import cv2
    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float64)     # BGR → RGB = (u, v, valid)
    flow = (raw[..., :2] - 2 ** 15) / 64.0
    valid = raw[..., 2].astype(np.float32)
    return flow.astype(np.float32), valid


def write_kitti_png(path: str, flow: np.ndarray,
                    valid: np.ndarray | None = None) -> None:
    import cv2
    h, w = flow.shape[:2]
    out = np.zeros((h, w, 3), np.uint16)
    out[..., :2] = np.clip(flow * 64.0 + 2 ** 15, 0, 2 ** 16 - 1)
    out[..., 2] = 1 if valid is None else valid.astype(np.uint16)
    cv2.imwrite(path, out[:, :, ::-1])           # store as BGR
