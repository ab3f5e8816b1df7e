"""Flow demo (reference: RAFT/demo.py): estimate and visualize optical flow
for image pairs in a directory.

Usage:
  python -m cvpr2021_vspw_implement_tpu.demo --path imgs/ --out flow_out/ \
      [--raft_ckpt raft-things.pth] [--iters 20]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from .models.raft import RAFT, pad_to_multiple_of_8, unpad
from .models.raft.flow_viz import flow_to_image
from .tc_cal import load_raft_variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", required=True, help="directory of frames")
    ap.add_argument("--out", default="flow_out")
    ap.add_argument("--raft_ckpt", default="")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    model = RAFT(iters=args.iters)
    variables = load_raft_variables(args.raft_ckpt, model)

    import jax

    @jax.jit
    def flow_fn(i1, i2):
        p1, pads = pad_to_multiple_of_8(i1)
        p2, _ = pad_to_multiple_of_8(i2)
        _, flow = model.apply(variables, p1, p2, test_mode=True)
        return unpad(flow, pads)

    frames = sorted(f for f in os.listdir(args.path)
                    if f.lower().endswith((".png", ".jpg", ".jpeg")))
    os.makedirs(args.out, exist_ok=True)
    for a, b in zip(frames[:-1], frames[1:]):
        i1 = np.asarray(Image.open(os.path.join(args.path, a)).convert("RGB"),
                        np.float32)[None]
        i2 = np.asarray(Image.open(os.path.join(args.path, b)).convert("RGB"),
                        np.float32)[None]
        flow = np.asarray(flow_fn(jnp.asarray(i1), jnp.asarray(i2)))[0]
        viz = flow_to_image(flow)
        stem = os.path.splitext(a)[0]
        Image.fromarray(viz).save(os.path.join(args.out, f"{stem}_flow.png"))
        print(f"{a} -> {b}: |flow| max {np.abs(flow).max():.2f}")


if __name__ == "__main__":
    main()
