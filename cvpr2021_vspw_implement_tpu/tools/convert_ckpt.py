"""Checkpoint layout converter: GPipe-pipelined <-> standard block layout.

A trainer running with ``TPU.pipeline_stages P`` stores the dilated trunk's
homogeneous layer3 tail stacked on a leading stage axis
(``layer3_pipe/stages/block{j}`` — models/pipeline.py).  This tool converts
a saved ``.msgpack`` checkpoint (full TrainState or bare variables) between
that layout and the standard per-block layout, in either direction, so
checkpoints move freely between pipelined pod-slice training, unpipelined
single-chip fine-tuning and the eval drivers.

Usage::

    python -m cvpr2021_vspw_implement_tpu.tools.convert_ckpt \
        --input ckpt/model_epoch_5.msgpack --output flat.msgpack --unstack
    python -m cvpr2021_vspw_implement_tpu.tools.convert_ckpt \
        --input flat.msgpack --output piped.msgpack --stack 11 [--tail 22]

(The eval drivers auto-unstack via ``maybe_unpipeline``; this tool exists
for re-sharding a checkpoint into a DIFFERENT stage count and for exporting
flat checkpoints for external consumers.)
"""

from __future__ import annotations

import argparse
import re


def _detect_tail(tree) -> int:
    """Largest N such that layer3_1..layer3_N all exist somewhere."""
    best = 0

    def walk(d):
        nonlocal best
        if not isinstance(d, dict):
            return
        idx = [int(m.group(1)) for k in d
               for m in [re.fullmatch(r"layer3_(\d+)", str(k))] if m]
        if idx and 1 in idx:
            best = max(best, max(idx))
        for v in d.values():
            walk(v)

    walk(tree)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--unstack", action="store_true",
                   help="pipelined -> standard per-block layout")
    g.add_argument("--stack", type=int, metavar="N_STAGES",
                   help="standard -> pipelined layout with N_STAGES stages")
    ap.add_argument("--tail", type=int, default=0,
                    help="tail block count (default: auto-detect; 22 for "
                         "ResNet-101 layer3)")
    args = ap.parse_args(argv)

    from ..utils.misc import honor_platform_env
    honor_platform_env()
    import flax.serialization as ser

    from ..models.pipeline import (maybe_unpipeline, stack_pipeline_params)

    with open(args.input, "rb") as f:
        tree = ser.msgpack_restore(f.read())

    if args.unstack:
        out = maybe_unpipeline(tree)
        if out is tree:
            raise SystemExit("no pipelined subtree found in the checkpoint")
    else:
        n_tail = args.tail or _detect_tail(tree)
        if not n_tail:
            raise SystemExit("no layer3_1..layer3_N tail found; is this "
                             "already pipelined?  (--unstack first)")
        if n_tail % args.stack:
            raise SystemExit(f"tail of {n_tail} blocks does not divide "
                             f"into {args.stack} stages")
        out = {coll: stack_pipeline_params(t, "layer3", n_tail, args.stack)
               if isinstance(t, dict) else t
               for coll, t in tree.items()}

    with open(args.output, "wb") as f:
        f.write(ser.msgpack_serialize(out))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
