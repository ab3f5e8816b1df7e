"""Parameter-path → PartitionSpec rules (tensor parallelism).

The reference has no tensor parallelism at all (SURVEY §2 parallelism
census); on TPU the wide head channels (PPM/OCR 512-d convs, the 2560→512
fuse convs) shard naturally on the mesh 'model' axis: weights are split on
their output-channel dim and GSPMD inserts the (tiny, ICI-local)
collectives.  This module centralizes the param-path → spec mapping for
every model family so trainers, the dry-run and tests share ONE rule set
(was: ad-hoc substring checks in __graft_entry__).

Matching is by regex over the '/'-joined flax param path.  Anything
unmatched is replicated.  The same rules cover optimizer state: optax
momentum/trace pytrees contain the param paths as sub-paths, and matching
uses ``re.search``.

BN scale/bias and running stats stay replicated — they are KB-scale and the
BN channel dim is the *input* dim of the next sharded conv, so GSPMD keeps
layout changes local either way.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: conv kernels whose OUT-channel dim (last, HWIO) shards on 'model'.
TP_OUT_CHANNEL_PATTERNS = (
    # ClipPSP / per-frame PPM heads (models/clip_psp.py, decoders.py)
    r"ppm_convs_\d+/conv/conv/kernel$",
    r"(^|/)conv_last_conv/conv/kernel$",
    r"(^|/)deepsup_conv/conv/kernel$",
    # shared clip decoder PPMDeepsupClip / PPMClip (models/decoders.py)
    r"decoder/ppm/ppm_\d+_conv/conv/kernel$",
    r"decoder/conv_last_/0/conv/kernel$",
    r"decoder/cbr_deepsup/0/conv/kernel$",
    # NetWarp / ETC blend head (models/netwarp.py, etc.py)
    r"(^|/)conv_last_0/conv/kernel$",
    # OCR heads (models/ocr.py, clip_ocr.py, netwarp ocr variants)
    r"(^|/)conv_3x3_conv/conv/kernel$",
    r"(^|/)dsn_conv/conv/kernel$",
    r"(f_pixel_\d+_conv|f_up_conv|fuse_conv)/conv/kernel$",
    r"(f_object|f_down)/conv\d+/conv/kernel$",
    # warp family embedding heads (models/warp_our.py, propnet.py)
    r"(^|/)(emb|emb_2|emb2)/conv/conv/kernel$",
)

_TP_RE = re.compile("|".join(TP_OUT_CHANNEL_PATTERNS))

#: stacked GPipe stage params (models/pipeline.py): leading axis = pipeline
#: stage, sharded over 'pipe' so each device holds only its stage's weights.
_PIPE_RE = re.compile(r"_pipe/stages/block\d+/")


def tp_spec(path: str, shape, n_model: int, n_pipe: int = 1) -> P | None:
    """PartitionSpec for a param at ``path`` with ``shape``, or None to
    replicate.  Pipeline-stacked leaves shard their leading (stage) axis on
    'pipe'; wide head kernels shard their out-channel (last) dim on 'model';
    both gated on divisibility."""
    pipe = (n_pipe > 1 and _PIPE_RE.search(path) and len(shape) >= 1
            and shape[0] % n_pipe == 0)
    if n_model > 1 and _TP_RE.search(path) and len(shape) >= 2 \
            and shape[-1] % n_model == 0:
        return P("pipe" if pipe else None,
                 *([None] * (len(shape) - 2)), "model")
    if pipe:
        return P("pipe", *([None] * (len(shape) - 1)))
    return None


def _join_path(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                    for k in path)


def shard_tree(tree, mesh: Mesh, n_model: int | None = None,
               n_pipe: int | None = None):
    """device_put every leaf of ``tree`` (params, TrainState, opt state...)
    with the TP/pipeline rules applied; everything unmatched is replicated.

    Works on any pytree whose leaf paths embed the param paths (TrainState
    included: optimizer momentum entries match via substring search)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if n_model is None:
        n_model = axis_sizes.get("model", 1)
    if n_pipe is None:
        n_pipe = axis_sizes.get("pipe", 1)

    def put(path, x):
        spec = tp_spec(_join_path(path), getattr(x, "shape", ()), n_model,
                       n_pipe)
        return jax.device_put(x, NamedSharding(mesh, spec if spec else P()))

    return jax.tree_util.tree_map_with_path(put, tree)
