"""Import torch state_dicts into flax parameter trees.

Enables per-pixel fidelity on the reference's frozen checkpoints
(e.g. ``raft-things.pth`` for the flow subsystem, ImageNet-pretrained
encoders): torch OIHW conv kernels → HWIO, BN weight/bias/running stats →
scale/bias/batch_stats.  Name translation is rule-based per architecture.

Loading the .pth files themselves uses ``torch.load`` on CPU (torch is a
test/interop dependency only — nothing from torch touches the TPU path).
"""

from __future__ import annotations

import re

import numpy as np


def _set(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def import_raft_state_dict(state_dict) -> dict:
    """torch RAFT state_dict → {'params': ..., 'batch_stats': ...} matching
    models.raft.RAFT's tree layout."""
    params: dict = {}
    stats: dict = {}

    def conv_path(flax_parts):
        return flax_parts + ["conv"]

    for name, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        name = name.removeprefix("module.")
        parts = name.split(".")
        net = parts[0]  # fnet | cnet | update_block

        if net in ("fnet", "cnet"):
            rest, leaf = parts[1:-1], parts[-1]
            if rest[0] in ("conv1", "conv2"):
                flax = [net, rest[0], "conv"]
                _set(params, flax + ["kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            elif rest[0] == "norm1":
                flax = [net, "norm1", "bnorm"]
                _emit_bn(params, stats, flax, leaf, t)
            else:
                # layerX.Y.{conv1,conv2,norm1..3,downsample.{0,1}}
                m = re.match(r"layer(\d)", rest[0])
                blk = f"layer{m.group(1)}_{rest[1]}"
                sub = rest[2]
                if sub == "downsample":
                    if rest[3] == "0":  # conv
                        flax = [net, blk, "downsample", "conv"]
                        _set(params, flax + ["kernel" if leaf == "weight" else "bias"],
                             _conv_kernel(t) if leaf == "weight" else t)
                    else:               # norm3
                        _emit_bn(params, stats, [net, blk, "norm3", "bnorm"],
                                 leaf, t)
                elif sub.startswith("conv"):
                    flax = [net, blk, sub, "conv"]
                    _set(params, flax + ["kernel" if leaf == "weight" else "bias"],
                         _conv_kernel(t) if leaf == "weight" else t)
                elif sub.startswith("norm"):
                    _emit_bn(params, stats, [net, blk, sub, "bnorm"], leaf, t)
        elif net == "update_block":
            rest, leaf = parts[1:-1], parts[-1]
            if rest[0] == "encoder":
                flax = ["update_block", "encoder", rest[1], "conv"]
            elif rest[0] == "gru":
                flax = ["update_block", "gru", rest[1]]  # bare nn.Conv
            elif rest[0] == "flow_head":
                flax = ["update_block", "flow_head", rest[1], "conv"]
            elif rest[0] == "mask":
                flax = ["update_block", f"mask_{rest[1]}", "conv"]
            else:
                raise KeyError(name)
            _set(params, flax + ["kernel" if leaf == "weight" else "bias"],
                 _conv_kernel(t) if leaf == "weight" else t)
        else:
            raise KeyError(f"unrecognized RAFT param {name}")
    return {"params": params, "batch_stats": stats}


def _emit_bn(params, stats, flax_prefix, leaf, t):
    if leaf == "weight":
        _set(params, flax_prefix + ["scale"], t)
    elif leaf == "bias":
        _set(params, flax_prefix + ["bias"], t)
    elif leaf == "running_mean":
        _set(stats, flax_prefix + ["mean"], t)
    elif leaf == "running_var":
        _set(stats, flax_prefix + ["var"], t)
    # num_batches_tracked is dropped


def import_resnet_state_dict(state_dict) -> dict:
    """torch deep-stem ResNet state_dict (reference: models/resnet.py layout —
    conv1..3/bn1..3 stem, layerX.Y blocks, downsample.{0,1}) → flax variables
    for models.resnet.ResNetFeatures."""
    params: dict = {}
    stats: dict = {}
    for name, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        name = name.removeprefix("module.")
        parts = name.split(".")
        if parts[0] in ("fc", "fc_1", "avgpool"):
            continue  # classifier head, dropped by the feature trunk
        leaf = parts[-1]
        if parts[0].startswith("conv") and len(parts) == 2:
            _set(params, [parts[0], "conv",
                          "kernel" if leaf == "weight" else "bias"],
                 _conv_kernel(t) if leaf == "weight" else t)
        elif parts[0].startswith("bn") and len(parts) == 2:
            _emit_bn(params, stats, [parts[0]], leaf, t)
        elif parts[0].startswith("layer"):
            blk = f"{parts[0]}_{parts[1]}"
            sub = parts[2]
            if sub == "downsample":
                if parts[3] == "0":
                    _set(params, [blk, "downsample_conv", "conv",
                                  "kernel" if leaf == "weight" else "bias"],
                         _conv_kernel(t) if leaf == "weight" else t)
                else:
                    _emit_bn(params, stats, [blk, "downsample_bn"], leaf, t)
            elif sub.startswith("conv"):
                _set(params, [blk, sub, "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            elif sub.startswith("bn"):
                _emit_bn(params, stats, [blk, sub], leaf, t)
        # anything else (num_batches_tracked etc.) is dropped
    return {"params": params, "batch_stats": stats}


def load_encoder_checkpoint(path: str) -> dict:
    """Load an ImageNet-pretrained deep-stem ResNet .pth (the reference's
    ``--pre_enc`` / ``--predir`` checkpoints) into flax variables."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return import_resnet_state_dict(sd)


def import_hrnet_state_dict(state_dict) -> dict:
    """torch HRNetV2-W48 state_dict (reference: models/hrnet.py layout) →
    flax variables for models.hrnet.HRNetV2 (stem/stages submodules)."""
    params: dict = {}
    stats: dict = {}

    def put_conv(flax, leaf, t):
        _set(params, flax + ["conv", "kernel" if leaf == "weight" else "bias"],
             _conv_kernel(t) if leaf == "weight" else t)

    def put_convbn_conv(flax, leaf, t):
        # _ConvBN wraps our Conv (itself wrapping nn.Conv named "conv")
        put_conv(flax + ["conv"], leaf, t)

    for name, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        name = name.removeprefix("module.")
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        head = parts[0]
        if head in ("conv1", "conv2"):
            put_convbn_conv(["stem", "stem1" if head == "conv1" else "stem2"],
                            leaf, t)
        elif head in ("bn1", "bn2"):
            _emit_bn(params, stats,
                     ["stem", "stem1" if head == "bn1" else "stem2", "bn"],
                     leaf, t)
        elif head == "layer1":
            blk = ["stem", f"layer1_{parts[1]}"]
            sub = parts[2]
            if sub == "downsample":
                if parts[3] == "0":
                    put_conv(blk + ["downsample_conv"], leaf, t)
                else:
                    _emit_bn(params, stats, blk + ["downsample_bn"], leaf, t)
            elif sub.startswith("conv"):
                put_conv(blk + [sub], leaf, t)
            else:
                _emit_bn(params, stats, blk + [sub], leaf, t)
        elif head.startswith("transition"):
            stage = int(head[len("transition"):]) + 1
            i = parts[1]
            flax = ["stages", f"transition{stage}_{i}"]
            rest = parts[2:-1]
            # existing branch: Sequential(conv, bn, relu) → ["0"]/["1"];
            # new branch: Sequential(Sequential(conv, bn, relu)) →
            # ["0","0"]/["0","1"]
            if rest in (["0"], ["0", "0"]):
                put_convbn_conv(flax, leaf, t)
            elif rest in (["1"], ["0", "1"]):
                _emit_bn(params, stats, flax + ["bn"], leaf, t)
            else:
                raise KeyError(name)
        elif head.startswith("stage"):
            stage = int(head[len("stage"):])
            m = parts[1]
            flax_mod = ["stages", f"stage{stage}_m{m}"]
            kind = parts[2]
            if kind == "branches":
                i, b, sub = parts[3], parts[4], parts[5]
                blk = flax_mod + [f"branch{i}_block{b}"]
                if sub == "downsample":
                    if parts[6] == "0":
                        put_conv(blk + ["downsample_conv"], leaf, t)
                    else:
                        _emit_bn(params, stats, blk + ["downsample_bn"],
                                 leaf, t)
                elif sub.startswith("conv"):
                    put_conv(blk + [sub], leaf, t)
                else:
                    _emit_bn(params, stats, blk + [sub], leaf, t)
            elif kind == "fuse_layers":
                i, j = int(parts[3]), int(parts[4])
                rest = parts[5:-1]
                if j > i:
                    # Sequential(conv, bn)
                    flax = flax_mod + [f"fuse{i}_{j}"]
                    if rest == ["0"]:
                        put_convbn_conv(flax, leaf, t)
                    else:
                        _emit_bn(params, stats, flax + ["bn"], leaf, t)
                else:
                    # Sequential of (i-j) Sequential(conv, bn[, relu])
                    k = rest[0]
                    flax = flax_mod + [f"fuse{i}_{j}_{k}"]
                    if rest[1] == "0":
                        put_convbn_conv(flax, leaf, t)
                    else:
                        _emit_bn(params, stats, flax + ["bn"], leaf, t)
            else:
                raise KeyError(name)
        elif head in ("incre_modules", "downsamp_modules", "final_layer",
                      "classifier", "last_layer"):
            continue  # classification head, absent in the feature trunk
        else:
            raise KeyError(f"unrecognized HRNet param {name}")
    return {"params": params, "batch_stats": stats}


def import_mobilenet_state_dict(state_dict) -> dict:
    """torch MobileNetV2 state_dict (reference: models/mobilenet.py) → flax
    variables for models.mobilenet.MobileNetV2Dilated.

    features.0 = stem conv_bn; features.1..17 = InvertedResidual blocks whose
    Sequential indices map (expand_ratio != 1) 0/1→conv_0/bn_0, 3/4→conv_1/
    bn_1, 6/7→conv_2/bn_2 and (block 1, expand_ratio == 1) 0/1→conv_0/bn_0,
    3/4→conv_1/bn_1.  features.18 (1x1-1280) and the classifier are dropped
    (MobileNetV2Dilated uses features[:-1], models/models.py:775)."""
    params: dict = {}
    stats: dict = {}
    conv_map = {"0": 0, "3": 1, "6": 2}
    bn_map = {"1": 0, "4": 1, "7": 2}
    for name, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        name = name.removeprefix("module.")
        parts = name.split(".")
        leaf = parts[-1]
        if parts[0] != "features" or leaf == "num_batches_tracked":
            continue
        fi = int(parts[1])
        if fi == 0:
            if parts[2] == "0":
                _set(params, ["stem_conv", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            else:
                _emit_bn(params, stats, ["stem_bn"], leaf, t)
        elif fi <= 17:
            sub = parts[3]
            blk = f"block_{fi}"
            if sub in conv_map:
                _set(params, [blk, f"conv_{conv_map[sub]}", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            elif sub in bn_map:
                _emit_bn(params, stats, [blk, f"bn_{bn_map[sub]}"], leaf, t)
        # features.18 + classifier dropped
    return {"params": params, "batch_stats": stats}


def import_ppm_decoder_state_dict(state_dict, deepsup: bool = True) -> dict:
    """torch PPM/PPMDeepsup decoder state_dict (reference layout:
    ppm.{i}.1/2 branch conv+bn, conv_last_.0/1/4 (or conv_last.* for plain
    PPM), cbr_deepsup.0/1, conv_last_deepsup_) → flax variables for
    models.decoders.PPMDeepsup / PPM."""
    params: dict = {}
    stats: dict = {}
    for name, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        name = name.removeprefix("module.")
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        head = parts[0]
        if head == "ppm":
            i, sub = parts[1], parts[2]
            if sub == "1":    # 1x1 conv
                _set(params, ["ppm", f"ppm_{i}_conv", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            elif sub == "2":  # bn
                _emit_bn(params, stats, ["ppm", f"ppm_{i}_bn"], leaf, t)
        elif head in ("conv_last_", "conv_last"):
            tail = "conv_last_" if deepsup else "conv_last"
            sub = parts[1]
            if sub == "0":
                _set(params, [tail, "0", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            elif sub == "1":
                _emit_bn(params, stats, [tail, "1"], leaf, t)
            elif sub == "4":
                _set(params, [tail, "cls", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
        elif head == "cbr_deepsup":
            if parts[1] == "0":
                _set(params, ["cbr_deepsup", "0", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            else:
                _emit_bn(params, stats, ["cbr_deepsup", "1"], leaf, t)
        elif head in ("conv_last_deepsup_", "conv_last_deepsup"):
            _set(params, ["conv_last_deepsup_", "conv",
                          "kernel" if leaf == "weight" else "bias"],
                 _conv_kernel(t) if leaf == "weight" else t)
        # other heads (dropout etc.) carry no params
    return {"params": params, "batch_stats": stats}


def import_c1_state_dict(state_dict, deepsup: bool = False) -> dict:
    """torch C1 / C1DeepSup decoder state_dict (reference layout —
    models.py:826-886: cbr.{0,1}, conv_last_1 / conv_last_ (bare Conv2d),
    cbr_deepsup.{0,1}, conv_last_deepsup_) → flax variables for
    models.decoders.C1 / C1DeepSup."""
    params: dict = {}
    stats: dict = {}
    for name, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        name = name.removeprefix("module.")
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        head = parts[0]
        if head in ("cbr", "cbr_deepsup"):
            if parts[1] == "0":
                _emit_conv(params, [head, "0"], leaf, t)
            else:
                _emit_bn(params, stats, [head, "1"], leaf, t)
        elif head in ("conv_last_1", "conv_last_", "conv_last_deepsup_"):
            _emit_conv(params, [head], leaf, t)
    return {"params": params, "batch_stats": stats}


def import_upernet_decoder_state_dict(state_dict) -> dict:
    """torch UPerNet decoder state_dict (reference layout —
    models.py:1085-1128: ppm_conv.{i}.{0,1}, ppm_last_conv.{0,1},
    fpn_in.{i}.{0,1}, fpn_out.{i}.0.{0,1}, conv_last_.0.{0,1},
    conv_last_.1) → flax variables for models.decoders.UPerNet.

    ModuleList indices map straight across: fpn_in.{i} pairs with
    conv_out[i] on both sides."""
    params: dict = {}
    stats: dict = {}
    for name, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        name = name.removeprefix("module.")
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        head = parts[0]
        if head == "ppm_conv":
            i, sub = parts[1], parts[2]
            if sub == "0":
                _emit_conv(params, [f"ppm_conv_{i}_conv"], leaf, t)
            else:
                _emit_bn(params, stats, [f"ppm_conv_{i}_bn"], leaf, t)
        elif head == "ppm_last_conv":
            if parts[1] == "0":
                _emit_conv(params, ["ppm_last_conv", "0"], leaf, t)
            else:
                _emit_bn(params, stats, ["ppm_last_conv", "1"], leaf, t)
        elif head == "fpn_in":
            i, sub = parts[1], parts[2]
            if sub == "0":
                _emit_conv(params, [f"fpn_in_{i}_conv"], leaf, t)
            else:
                _emit_bn(params, stats, [f"fpn_in_{i}_bn"], leaf, t)
        elif head == "fpn_out":
            i, sub = parts[1], parts[3]  # fpn_out.{i}.0.{0|1}.<leaf>
            if sub == "0":
                _emit_conv(params, [f"fpn_out_{i}", "0"], leaf, t)
            else:
                _emit_bn(params, stats, [f"fpn_out_{i}", "1"], leaf, t)
        elif head == "conv_last_":
            if parts[1] == "0":  # cbr
                if parts[2] == "0":
                    _emit_conv(params, ["conv_last_0", "0"], leaf, t)
                else:
                    _emit_bn(params, stats, ["conv_last_0", "1"], leaf, t)
            else:                # final 1x1 classifier
                _emit_conv(params, ["conv_last_1"], leaf, t)
    return {"params": params, "batch_stats": stats}


def import_clip_psp_state_dict(state_dict) -> dict:
    """Fused Clip_PSP checkpoint (the clip trainer saves one model —
    reference: train_clip2.py:179-189; layout: encoder.*, ppm_conv.ppm.{i}.0/1,
    ppm_conv.conv_last_.{0,1,4}, deepsup.{0,1,4}, pspweight_conv.0) → flax
    variables for models.clip_psp.ClipPSP."""
    enc_sd, rest = {}, {}
    for name, tensor in state_dict.items():
        name = name.removeprefix("module.")
        if name.startswith("encoder."):
            enc_sd[name[len("encoder."):]] = tensor
        else:
            rest[name] = tensor

    out = import_resnet_state_dict(enc_sd)
    params = {"encoder": out["params"]}
    stats = {"encoder": out["batch_stats"]}

    for name, tensor in rest.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "ppm_conv" and parts[1] == "ppm":
            i, sub = parts[2], parts[3]
            if sub == "0":
                _set(params, [f"ppm_convs_{i}", "conv", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            else:
                _emit_bn(params, stats, [f"ppm_convs_{i}", "bn"], leaf, t)
        elif parts[0] == "ppm_conv" and parts[1] == "conv_last_":
            sub = parts[2]
            if sub == "0":
                _set(params, ["conv_last_conv", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            elif sub == "1":
                _emit_bn(params, stats, ["conv_last_bn"], leaf, t)
            elif sub == "4":
                _set(params, ["conv_last_cls", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
        elif parts[0] == "deepsup":
            sub = parts[1]
            if sub == "0":
                _set(params, ["deepsup_conv", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            elif sub == "1":
                _emit_bn(params, stats, ["deepsup_bn"], leaf, t)
            elif sub == "4":
                _set(params, ["deepsup_cls", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
        elif parts[0] == "pspweight_conv":
            _set(params, ["pspweight_conv", "conv",
                          "kernel" if leaf == "weight" else "bias"],
                 _conv_kernel(t) if leaf == "weight" else t)
        # crit etc. carry no params
    return {"params": params, "batch_stats": stats}


def import_ocr_decoder_state_dict(state_dict) -> dict:
    """torch SpatialOCRNet decoder state_dict (reference layout:
    conv_3x3.{0,1}, dsn_head.{0,1,4}, spatial_ocr_head.object_context_block.
    {f_pixel,f_object}.{0,1,3,4} / f_down.{0,1} / f_up.{0,1},
    spatial_ocr_head.conv_bn_dropout.{0,1}, head) → flax variables for
    models.ocr.SpatialOCRNet."""
    params: dict = {}
    stats: dict = {}

    def put(flax, leaf, t):
        _set(params, flax + ["conv", "kernel" if leaf == "weight" else "bias"],
             _conv_kernel(t) if leaf == "weight" else t)

    for name, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        name = name.removeprefix("module.")
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        head = parts[0]
        if head == "conv_3x3":
            if parts[1] == "0":
                put(["conv_3x3_conv"], leaf, t)
            else:
                _emit_bn(params, stats, ["conv_3x3_bn"], leaf, t)
        elif head == "dsn_head":
            if parts[1] == "0":
                put(["dsn_head_cbr", "0"], leaf, t)
            elif parts[1] == "1":
                _emit_bn(params, stats, ["dsn_head_cbr", "1"], leaf, t)
            elif parts[1] == "4":
                put(["dsn_cls"], leaf, t)
        elif head == "head":
            put(["head"], leaf, t)
        elif head == "spatial_ocr_head":
            sub = parts[1]
            if sub == "conv_bn_dropout":
                if parts[2] == "0":
                    put(["spatial_ocr_head", "fuse_conv"], leaf, t)
                else:
                    _emit_bn(params, stats, ["spatial_ocr_head", "fuse_bn"],
                             leaf, t)
            elif sub == "object_context_block":
                blk = parts[2]  # f_pixel | f_object | f_down | f_up
                idx = parts[3]
                base = ["spatial_ocr_head", "object_context_block"]
                if blk == "f_pixel":
                    # Sequential(conv,bn,relu,conv,bn,relu): 0/1 → _0, 3/4 → _1
                    stage = "0" if idx in ("0", "1") else "1"
                    if idx in ("0", "3"):
                        put(base + [f"f_pixel_{stage}_conv"], leaf, t)
                    else:
                        _emit_bn(params, stats,
                                 base + [f"f_pixel_{stage}_bn"], leaf, t)
                elif blk == "f_object":
                    stage = "0" if idx in ("0", "1") else "1"
                    if idx in ("0", "3"):
                        put(base + ["f_object", f"conv{stage}"], leaf, t)
                    else:
                        _emit_bn(params, stats,
                                 base + ["f_object", f"bn{stage}"], leaf, t)
                elif blk == "f_down":
                    if idx == "0":
                        put(base + ["f_down", "conv0"], leaf, t)
                    else:
                        _emit_bn(params, stats, base + ["f_down", "bn0"],
                                 leaf, t)
                elif blk == "f_up":
                    if idx == "0":
                        put(base + ["f_up_conv"], leaf, t)
                    else:
                        _emit_bn(params, stats, base + ["f_up_bn"], leaf, t)
        # spatial_context_head has no params
    return {"params": params, "batch_stats": stats}


def import_deeplab_decoder_state_dict(state_dict) -> dict:
    """torch DeepLab decoder state_dict (reference layout —
    models/deeplab.py:36-137: aspp.aspp{1-4}.{atrous_conv,bn},
    aspp.global_avg_pool.{1,2}, aspp.{conv1,bn1}, decoder.{conv1,bn1},
    decoder.last_conv.{0,1,4,5}, decoder.lastlast_conv.1) → flax variables
    for models.deeplab.DeepLab."""
    params: dict = {}
    stats: dict = {}

    def put(flax, leaf, t):
        _set(params, flax + ["conv", "kernel" if leaf == "weight" else "bias"],
             _conv_kernel(t) if leaf == "weight" else t)

    for name, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        name = name.removeprefix("module.")
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        head = parts[0]
        if head == "aspp":
            sub = parts[1]
            if sub.startswith("aspp"):  # aspp1..aspp4 branches
                if parts[2] == "atrous_conv":
                    put(["aspp", sub, "conv"], leaf, t)
                else:  # bn
                    _emit_bn(params, stats, ["aspp", sub, "bn"], leaf, t)
            elif sub == "global_avg_pool":
                # Sequential(AdaptiveAvgPool2d, Conv2d, BN, ReLU): 1=conv, 2=bn
                if parts[2] == "1":
                    put(["aspp", "gp_conv"], leaf, t)
                else:
                    _emit_bn(params, stats, ["aspp", "gp_bn"], leaf, t)
            elif sub == "conv1":
                put(["aspp", "conv1"], leaf, t)
            elif sub == "bn1":
                _emit_bn(params, stats, ["aspp", "bn1"], leaf, t)
        elif head == "decoder":
            sub = parts[1]
            if sub == "conv1":
                put(["low_conv"], leaf, t)
            elif sub == "bn1":
                _emit_bn(params, stats, ["low_bn"], leaf, t)
            elif sub == "last_conv":
                # Sequential(conv,bn,relu,drop,conv,bn,relu): 0/1 → _0, 4/5 → _1
                idx = parts[2]
                stage = "0" if idx in ("0", "1") else "1"
                if idx in ("0", "4"):
                    put([f"last_conv_{stage}"], leaf, t)
                else:
                    _emit_bn(params, stats, [f"last_bn_{stage}"], leaf, t)
            elif sub == "lastlast_conv":  # Sequential(drop, conv): 1 = classifier
                put(["classifier"], leaf, t)
    return {"params": params, "batch_stats": stats}


def _split_fused(state_dict, prefixes):
    """Bucket a fused-model state_dict by top-level module prefix."""
    buckets = {p: {} for p in prefixes}
    rest = {}
    for name, tensor in state_dict.items():
        name = name.removeprefix("module.")
        for p in prefixes:
            if name.startswith(p + "."):
                buckets[p][name[len(p) + 1:]] = tensor
                break
        else:
            rest[name] = tensor
    return buckets, rest


def import_netwarp_state_dict(state_dict, ocr: bool = False) -> dict:
    """Fused NetWarp / NetWarp_ocr checkpoint (reference: models/netwarp.py:
    67-107 / netwarp_ocr.py:121-163 — raft.*, encoder.*, decoder.*
    (PPMDeepsup_clip or SpatialOCRNetasDec), flowcnn.conv{1-4}.{0,1},
    conv_last_.{0,1,4} / head, w0_0/w0_1/w1_0/w1_1) → flax variables for
    models.netwarp.NetWarp."""
    buckets, rest = _split_fused(state_dict,
                                 ("raft", "encoder", "decoder", "flowcnn"))
    sub = {
        "raft": import_raft_state_dict(buckets["raft"]),
        "encoder": import_resnet_state_dict(buckets["encoder"]),
        "decoder": (import_ocr_decoder_state_dict(buckets["decoder"]) if ocr
                    else import_ppm_decoder_state_dict(buckets["decoder"])),
    }
    params = {k: v["params"] for k, v in sub.items()}
    stats = {k: v["batch_stats"] for k, v in sub.items()}

    for name, tensor in buckets["flowcnn"].items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        parts = name.split(".")  # conv{n}.{0|1}.<leaf>
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[1] == "0":
            _set(params, ["flowcnn", parts[0], "0", "conv",
                          "kernel" if leaf == "weight" else "bias"],
                 _conv_kernel(t) if leaf == "weight" else t)
        else:
            _emit_bn(params, stats, ["flowcnn", parts[0], "1"], leaf, t)

    for name, tensor in rest.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] in ("w0_0", "w0_1", "w1_0", "w1_1"):
            _set(params, [parts[0]], t)
        elif parts[0] == "head":  # netwarp_ocr classifier
            _set(params, ["head", "conv",
                          "kernel" if leaf == "weight" else "bias"],
                 _conv_kernel(t) if leaf == "weight" else t)
        elif parts[0] == "conv_last_":
            sub_i = parts[1]
            if sub_i == "0":
                _set(params, ["conv_last_0", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            elif sub_i == "1":
                _emit_bn(params, stats, ["conv_last_1"], leaf, t)
            elif sub_i == "4":
                _set(params, ["conv_last_cls", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
        # mean/std buffers carry no params
    return {"params": params, "batch_stats": stats}


def import_etc_state_dict(state_dict, ocr: bool = False) -> dict:
    """Fused ETC / ETC_ocr checkpoint (reference: models/ETC.py:51-80 /
    ETC_ocr.py:93-115 — raft.*, encoder.*, decoder.*, conv_last_.{0,1,4}
    or single conv_last_ for the OCR variant) → flax variables for
    models.etc.ETC."""
    buckets, rest = _split_fused(state_dict, ("raft", "encoder", "decoder"))
    sub = {
        "raft": import_raft_state_dict(buckets["raft"]),
        "encoder": import_resnet_state_dict(buckets["encoder"]),
        "decoder": (import_ocr_decoder_state_dict(buckets["decoder"]) if ocr
                    else import_ppm_decoder_state_dict(buckets["decoder"])),
    }
    params = {k: v["params"] for k, v in sub.items()}
    stats = {k: v["batch_stats"] for k, v in sub.items()}

    for name, tensor in rest.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked" or parts[0] != "conv_last_":
            continue
        if ocr:  # single 1x1 conv classifier (ETC_ocr.py:114)
            _set(params, ["conv_last_cls", "conv",
                          "kernel" if leaf == "weight" else "bias"],
                 _conv_kernel(t) if leaf == "weight" else t)
        else:
            sub_i = parts[1]
            if sub_i == "0":
                _set(params, ["conv_last_0", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
            elif sub_i == "1":
                _emit_bn(params, stats, ["conv_last_1"], leaf, t)
            elif sub_i == "4":
                _set(params, ["conv_last_cls", "conv",
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_kernel(t) if leaf == "weight" else t)
    return {"params": params, "batch_stats": stats}


def _emit_conv(params, flax_path, leaf, t):
    _set(params, flax_path + ["conv", "kernel" if leaf == "weight" else "bias"],
         _conv_kernel(t) if leaf == "weight" else t)


def import_clip_warp_state_dict(state_dict) -> dict:
    """Fused our_warp (ClipWarpNet) checkpoint (reference: models.py:116-129
    + warp_our.py:85-100 — encoder.*, decoder.*, prop_clip.{emb,emb_2}.{0,1},
    prop_clip.w{i}, prop_clip.last_layer.1, last_layer.1) → flax variables
    for models.warp_our.ClipWarpNet."""
    buckets, rest = _split_fused(state_dict, ("encoder", "decoder"))
    sub = {
        "encoder": import_resnet_state_dict(buckets["encoder"]),
        "decoder": import_ppm_decoder_state_dict(buckets["decoder"]),
    }
    params = {k: v["params"] for k, v in sub.items()}
    stats = {k: v["batch_stats"] for k, v in sub.items()}

    for name, tensor in rest.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "prop_clip":
            sub_n = parts[1]
            if sub_n in ("emb", "emb_2"):
                if parts[2] == "0":
                    _emit_conv(params, ["prop_clip", sub_n, "0"], leaf, t)
                else:
                    _emit_bn(params, stats, ["prop_clip", sub_n, "1"], leaf, t)
            elif sub_n == "last_layer":  # Sequential(drop, conv): idx 1
                _emit_conv(params, ["prop_clip", "last_conv"], leaf, t)
            elif sub_n.startswith("w"):  # linear-combine blend params w{i}
                _set(params, ["prop_clip", sub_n], t)
        elif parts[0] == "last_layer":  # all-frame supervision head
            _emit_conv(params, ["last_layer"], leaf, t)
    return {"params": params, "batch_stats": stats}


def import_propnet_state_dict(state_dict) -> dict:
    """Fused PropNet checkpoint (reference: propnet.py:105-138 — encoder.*,
    decoder.*, segblock.conv{1-4}.{conv1,bn1,conv2,bn2} + segblock.last_layer,
    emb.{0,1}, emb2.{0,1}, last_layer.1) → flax variables for
    models.propnet.PropNet."""
    buckets, rest = _split_fused(state_dict, ("encoder", "decoder"))
    sub = {
        "encoder": import_resnet_state_dict(buckets["encoder"]),
        "decoder": import_ppm_decoder_state_dict(buckets["decoder"]),
    }
    params = {k: v["params"] for k, v in sub.items()}
    stats = {k: v["batch_stats"] for k, v in sub.items()}

    for name, tensor in rest.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "segblock":
            sub_n = parts[1]
            if sub_n == "last_layer":
                _emit_conv(params, ["segblock", "last_layer"], leaf, t)
            else:  # conv{1-4}: _split_separable_conv2d members
                member = parts[2]
                if member in ("conv1", "conv2"):
                    _emit_conv(params, ["segblock", sub_n, member], leaf, t)
                else:
                    _emit_bn(params, stats, ["segblock", sub_n, member],
                             leaf, t)
        elif parts[0] in ("emb", "emb2"):
            if parts[1] == "0":
                _emit_conv(params, [parts[0], "0"], leaf, t)
            else:
                _emit_bn(params, stats, [parts[0], "1"], leaf, t)
        elif parts[0] == "last_layer":
            _emit_conv(params, ["last_layer"], leaf, t)
    return {"params": params, "batch_stats": stats}


def import_clip_ocr_state_dict(state_dict) -> dict:
    """Fused Clip_OCR checkpoint (reference: clip_ocr.py:25-63 — encoder.*,
    conv_3x3.{0,1}, dsn_head.{0,1,4}, spatial_ocr_head.*, head) → flax
    variables for models.clip_ocr.ClipOCRNet.

    The non-encoder keys share the SpatialOCRNet layout, so they route
    through import_ocr_decoder_state_dict; ClipOCRNet flattens the dsn
    Sequential into dsn_conv/dsn_bn, hence the rename."""
    buckets, rest = _split_fused(state_dict, ("encoder",))
    enc = import_resnet_state_dict(buckets["encoder"])
    dec = import_ocr_decoder_state_dict(rest)
    params, stats = dec["params"], dec["batch_stats"]
    cbr = params.pop("dsn_head_cbr", {})
    if "0" in cbr:
        params["dsn_conv"] = cbr["0"]
    if "1" in cbr:
        params["dsn_bn"] = cbr["1"]
    cbr_s = stats.pop("dsn_head_cbr", {})
    if "1" in cbr_s:
        stats["dsn_bn"] = cbr_s["1"]
    params["encoder"] = enc["params"]
    stats["encoder"] = enc["batch_stats"]
    return {"params": params, "batch_stats": stats}


def import_nonlocal3d_state_dict(state_dict) -> dict:
    """Fused Non_local3d checkpoint (reference: non_local_models.py:9-17 —
    encoder.*, emb, nonlocalblock.{g,theta,phi,W_z.{0,1}}, last_layer) →
    flax variables for models.nonlocal3d.NonLocal3D.

    The reference's 1x1 Conv3d projections are Dense layers on our side:
    torch (out, in, 1, 1, 1) kernels → (in, out) matrices."""
    buckets, rest = _split_fused(state_dict, ("encoder", "nonlocalblock"))
    enc = import_resnet_state_dict(buckets["encoder"])
    params = {"encoder": enc["params"]}
    stats = {"encoder": enc["batch_stats"]}

    def dense_kernel(w):
        return w.reshape(w.shape[0], w.shape[1]).T

    for name, tensor in buckets["nonlocalblock"].items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] in ("g", "theta", "phi"):
            _set(params, ["nonlocalblock", parts[0],
                          "kernel" if leaf == "weight" else "bias"],
                 dense_kernel(t) if leaf == "weight" else t)
        elif parts[0] == "W_z":
            if parts[1] == "0":  # Sequential(conv, bn) when bn_layer
                _set(params, ["nonlocalblock", "W_z",
                              "kernel" if leaf == "weight" else "bias"],
                     dense_kernel(t) if leaf == "weight" else t)
            else:
                _emit_bn(params, stats, ["nonlocalblock", "W_z_bn"], leaf, t)

    for name, tensor in rest.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if parts[0] in ("emb", "last_layer"):
            _emit_conv(params, [parts[0]], leaf, t)
    return {"params": params, "batch_stats": stats}


def import_nonlocal2d_decoder_state_dict(state_dict) -> dict:
    """Bare Non_local2d decoder checkpoint (reference:
    non_local_models.py:115-151 — emb, nonlocalblock.{g,theta,phi,
    W_z.{0,1}}, last_layer; the test.py ``--load_de`` surface for
    ``arch_decoder=nonlocal2d``) → flax variables for
    models.nonlocal_blocks.NonLocal2d.  Same layout as the fused
    Non_local3d importer's decoder half: 1x1 torch convs inside the NL
    block are Dense layers here ((out, in, 1, 1) → (in, out))."""
    params: dict = {}
    stats: dict = {}

    def dense_kernel(w):
        return w.reshape(w.shape[0], w.shape[1]).T

    for name, tensor in state_dict.items():
        name = name.removeprefix("module.")
        t = np.asarray(tensor.detach().cpu().numpy()
                       if hasattr(tensor, "detach") else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] in ("emb", "last_layer"):
            _emit_conv(params, [parts[0]], leaf, t)
        elif parts[0] == "nonlocalblock":
            if parts[1] in ("g", "theta", "phi"):
                _set(params, ["nonlocalblock", parts[1],
                              "kernel" if leaf == "weight" else "bias"],
                     dense_kernel(t) if leaf == "weight" else t)
            elif parts[1] == "W_z":
                if parts[2] == "0":  # Sequential(conv, bn) when bn_layer
                    _set(params, ["nonlocalblock", "W_z",
                                  "kernel" if leaf == "weight" else "bias"],
                         dense_kernel(t) if leaf == "weight" else t)
                else:
                    _emit_bn(params, stats, ["nonlocalblock", "W_z_bn"],
                             leaf, t)
    return {"params": params, "batch_stats": stats}


def import_warp_merge_state_dict(state_dict) -> dict:
    """Fused OurWarpMerge checkpoint (reference: warp_our_merge.py:53-66,
    178-192 — encoder.*, decoder.* (PPM_clip), prop_clip.{emb,emb2}.{0,1},
    prop_clip.last_layer.1, prop_clip.last_layer2.1, last_layer.1) → flax
    variables for models.warp_our_merge.OurWarpMerge.

    PPM_clip constructs-but-never-uses cbr_deepsup (models.py:1062); those
    keys are dropped."""
    buckets, rest = _split_fused(state_dict, ("encoder", "decoder"))
    dec_sd = {k: v for k, v in buckets["decoder"].items()
              if not k.startswith("cbr_deepsup")}
    sub = {
        "encoder": import_resnet_state_dict(buckets["encoder"]),
        "decoder": import_ppm_decoder_state_dict(dec_sd),
    }
    params = {k: v["params"] for k, v in sub.items()}
    stats = {k: v["batch_stats"] for k, v in sub.items()}

    for name, tensor in rest.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                       else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "prop_clip":
            sub_n = parts[1]
            if sub_n in ("emb", "emb2"):
                if parts[2] == "0":
                    _emit_conv(params, ["prop_clip", sub_n, "0"], leaf, t)
                else:
                    _emit_bn(params, stats, ["prop_clip", sub_n, "1"], leaf, t)
            elif sub_n in ("last_layer", "last_layer2"):
                _emit_conv(params, ["prop_clip", sub_n], leaf, t)
        elif parts[0] == "last_layer":
            _emit_conv(params, ["last_layer"], leaf, t)
    return {"params": params, "batch_stats": stats}


def import_td4_encoders(state_dict) -> dict:
    """Replicate a deep-stem ResNet checkpoint into TDNet's four path
    encoders (the reference loads the same pretrained weights into
    pretrained1..4 — td4_psp.py:207-212 pretrained_init)."""
    enc = import_resnet_state_dict(state_dict)
    return {
        "params": {f"paths_{i}": enc["params"] for i in range(4)},
        "batch_stats": {f"paths_{i}": enc["batch_stats"] for i in range(4)},
    }


def import_td4_state_dict(state_dict) -> dict:
    """Fused td4_psp checkpoint (reference layout: pretrained{1-4}.* deep-stem
    resnet18 paths, psp{1-4}.conv{1-4}.{0,1}, enc{1-4}.w_{q,k}s.{0,1}.conv/bn
    + w_vs.0.conv, atn{a}_{b}.fc.0.conv, layer_norm{1-4}.ln,
    head{1-4}/auxlayer{1-4}.conv5.{0,1,4} — models/td4_psp/td4_psp.py:107-183)
    → flax variables for models.td4_psp.TD4PSP."""
    import re

    params: dict = {}
    stats: dict = {}
    enc_sds: dict = {i: {} for i in range(4)}

    def put_conv(flax, leaf, t, dense=False):
        if leaf == "weight":
            _set(params, flax + ["kernel"],
                 t[:, :, 0, 0].T if dense else _conv_kernel(t))
        else:
            _set(params, flax + ["bias"], t)

    for name, tensor in state_dict.items():
        name = name.removeprefix("module.")
        m = re.match(r"pretrained(\d)\.(.*)", name)
        if m:
            enc_sds[int(m.group(1)) - 1][m.group(2)] = tensor
            continue
        t = np.asarray(tensor.detach().cpu().numpy()
                       if hasattr(tensor, "detach") else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if (m := re.match(r"psp(\d)", parts[0])):
            i = int(m.group(1)) - 1
            j = parts[1]  # conv1..conv4
            if parts[2] == "0":
                put_conv([f"psps_{i}", f"{j}_conv", "conv"], leaf, t)
            else:
                _emit_bn(params, stats, [f"psps_{i}", f"{j}_bn"], leaf, t)
        elif (m := re.match(r"enc(\d)", parts[0])):
            i = int(m.group(1)) - 1
            proj = parts[1]  # w_qs | w_ks | w_vs
            flax_name = "w_vs" if proj == "w_vs" else f"{proj}_{parts[2]}"
            if parts[3] == "conv":
                put_conv([f"encs_{i}", flax_name, "conv", "conv"], leaf, t)
            else:  # bn (only on the first ConvBNReLU of w_qs/w_ks)
                _emit_bn(params, stats, [f"encs_{i}", flax_name, "bn"],
                         leaf, t)
        elif (m := re.match(r"atn(\d)_(\d)", parts[0])):
            a, b = int(m.group(1)) - 1, int(m.group(2)) - 1
            # fc.0.conv: 1x1 conv applied per token == Dense
            put_conv([f"atns_{a}_{b}", "fc"], leaf, t, dense=True)
        elif (m := re.match(r"layer_norm(\d)", parts[0])):
            i = int(m.group(1)) - 1
            _set(params, [f"lns_{i}", "scale" if leaf == "weight" else "bias"],
                 t)
        elif (m := re.match(r"(head|auxlayer)(\d)", parts[0])):
            kind = "heads" if m.group(1) == "head" else "auxs"
            i = int(m.group(2)) - 1
            sub = parts[2]  # conv5.{0,1,4}
            if sub == "0":
                put_conv([f"{kind}_{i}", "conv", "conv"], leaf, t)
            elif sub == "1":
                _emit_bn(params, stats, [f"{kind}_{i}", "bn"], leaf, t)
            elif sub == "4":
                put_conv([f"{kind}_{i}", "cls", "conv"], leaf, t)
        # loss_fn etc. carry no params

    for i in range(4):
        enc = import_resnet_state_dict(enc_sds[i])
        params[f"paths_{i}"] = enc["params"]
        stats[f"paths_{i}"] = enc["batch_stats"]
    return {"params": params, "batch_stats": stats}


def _netwarp_ocr(sd):
    return import_netwarp_state_dict(sd, ocr=True)


def _etc_ocr(sd):
    return import_etc_state_dict(sd, ocr=True)


#: --method name → fused-checkpoint importer (the reference's clip trainer
#: saves one nn.Module per method — train_clip2.py:404-489)
FUSED_IMPORTERS = {
    "clip_psp": import_clip_psp_state_dict,
    "clip_ocr": import_clip_ocr_state_dict,
    "netwarp": import_netwarp_state_dict,
    "netwarp_ocr": _netwarp_ocr,
    "ETC": import_etc_state_dict,
    "etc_ocr": _etc_ocr,
    "our_warp": import_clip_warp_state_dict,
    "our_warp_merge": import_warp_merge_state_dict,
    "propnet": import_propnet_state_dict,
    "nonlocal3d": import_nonlocal3d_state_dict,
    "tdnet": import_td4_state_dict,
}


def load_raft_checkpoint(path: str) -> dict:
    """Load raft-things.pth (torch) → flax variables for models.raft.RAFT."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return import_raft_state_dict(sd)


def merge_variables(init_vars: dict, imported: dict) -> dict:
    """Overlay imported params/batch_stats onto an init tree (strict=False:
    missing keys keep their init values, like the reference's
    load_state_dict(strict=False) at models/models.py:582-583)."""
    import jax

    def overlay(base, over):
        out = dict(base)
        for k, v in over.items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = overlay(out[k], v)
            elif isinstance(v, dict):
                # subtree absent from the init tree (e.g. train-only deepsup
                # params when the model was lazily init'd in eval mode) —
                # keep it whole; flax ignores unused extra entries
                out[k] = jax.tree_util.tree_map(jax.numpy.asarray, v)
            else:
                out[k] = jax.numpy.asarray(v)
        return out

    merged = dict(init_vars)
    for coll in imported:
        if coll in merged:
            merged[coll] = overlay(merged[coll], imported[coll])
        else:
            merged[coll] = jax.tree_util.tree_map(jax.numpy.asarray,
                                                  imported[coll])
    return merged


def import_convlstm_head_state_dict(state_dict) -> dict:
    """Conv_LSTM_Model temporal head (reference: models/models.py:283-312 —
    embed, convlstm.cell_list.0.{conv,conv_concat}, last_layer) → flax
    variables for models.biconvlstm.ConvLSTMModel.

    The reference runs ONE cell for both directions (BiConvLSTM.py:109-127);
    our BiConvLSTM shares the same single cell, so the mapping is direct.
    """
    params = {}
    for name, tensor in state_dict.items():
        name = name.removeprefix("module.").removeprefix("prop_clip.")
        t = np.asarray(tensor.detach().cpu().numpy()
                       if hasattr(tensor, "detach") else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if parts[0] == "embed":
            _emit_conv(params, ["embed"], leaf, t)
        elif parts[0] == "convlstm":
            # convlstm.cell_list.0.{conv,conv_concat}.{weight,bias}
            _emit_conv(params, ["convlstm", "cell", parts[3]], leaf, t)
        elif parts[0] == "last_layer":
            _emit_conv(params, ["last_layer"], leaf, t)
    return {"params": params}


def import_nonlocal_clip_head_state_dict(state_dict) -> dict:
    """Non_local temporal head (reference: models/models.py:315-341 — emb,
    nonlocalblock.{g,theta,phi,W_z.{0,1}}, last_layer) → flax variables for
    models.biconvlstm.NonLocalClipHead."""
    params, stats = {}, {}

    def dense_kernel(w):
        return w.reshape(w.shape[0], w.shape[1]).T

    for name, tensor in state_dict.items():
        name = name.removeprefix("module.").removeprefix("prop_clip.")
        t = np.asarray(tensor.detach().cpu().numpy()
                       if hasattr(tensor, "detach") else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] in ("emb", "last_layer"):
            _emit_conv(params, [parts[0]], leaf, t)
        elif parts[0] == "nonlocalblock":
            if parts[1] in ("g", "theta", "phi"):
                _set(params, ["nonlocalblock", parts[1],
                              "kernel" if leaf == "weight" else "bias"],
                     dense_kernel(t) if leaf == "weight" else t)
            elif parts[1] == "W_z":
                if parts[2] == "0":
                    _set(params, ["nonlocalblock", "W_z",
                                  "kernel" if leaf == "weight" else "bias"],
                         dense_kernel(t) if leaf == "weight" else t)
                else:
                    _emit_bn(params, stats, ["nonlocalblock", "W_z_bn"],
                             leaf, t)
    return {"params": params, "batch_stats": stats}


def import_hrnet_clip_state_dict(state_dict) -> dict:
    """torch HRNetV2_clip state_dict (reference: models/hrnet_clip.py:297-475
    — plain HRNet trunk names + ``time_atten.conv1``) → flax variables for
    models.hrnet_clip.HRNetV2Clip (same stem/stages layout as HRNetV2, plus
    the TimeAtten 1x1 fuse conv)."""
    trunk = {k: v for k, v in state_dict.items()
             if not k.removeprefix("module.").startswith("time_atten.")}
    out = import_hrnet_state_dict(trunk)
    params = out["params"]
    for name, tensor in state_dict.items():
        name = name.removeprefix("module.")
        if not name.startswith("time_atten."):
            continue
        t = np.asarray(tensor.detach().cpu().numpy()
                       if hasattr(tensor, "detach") else tensor)
        leaf = name.split(".")[-1]
        _emit_conv(params, ["time_atten", "conv1"], leaf, t)
    return out


def import_encoder_by_arch(arch: str, state_dict) -> dict:
    """Dispatch a torch encoder state_dict to the right importer by arch
    string (the reference's ``--pre_enc`` / ``--load_en`` checkpoints,
    train_clip2.py:465,511 / test.py dispatch)."""
    arch = arch.lower()
    if arch.startswith("hrnetv2_clip"):
        return import_hrnet_clip_state_dict(state_dict)
    if arch.startswith("hrnet"):
        return import_hrnet_state_dict(state_dict)
    if arch.startswith("mobilenet"):
        return import_mobilenet_state_dict(state_dict)
    return import_resnet_state_dict(state_dict)


def import_decoder_by_arch(arch_dec: str, state_dict) -> dict:
    """Dispatch a torch decoder state_dict by decoder arch string
    (the reference's ``--pre_dec`` / ``--load_de`` checkpoints)."""
    arch_dec = arch_dec.lower()
    if "nonlocal2d" in arch_dec:
        return import_nonlocal2d_decoder_state_dict(state_dict)
    if "ocr" in arch_dec:
        return import_ocr_decoder_state_dict(state_dict)
    if "deeplab" in arch_dec:
        return import_deeplab_decoder_state_dict(state_dict)
    if "upernet" in arch_dec:
        return import_upernet_decoder_state_dict(state_dict)
    if arch_dec.startswith("c1"):
        return import_c1_state_dict(state_dict,
                                    deepsup="deepsup" in arch_dec)
    return import_ppm_decoder_state_dict(state_dict,
                                         deepsup="deepsup" in arch_dec)


def apply_pretrained_init(variables, cfg, args, logger=None) -> dict:
    """Reference pretrained-init: ``--pre_enc`` / ``--pre_dec`` (or
    cfg.MODEL.weights_encoder/decoder) torch checkpoints overwrite the
    encoder/decoder subtrees before training (reference train_clip2.py:
    511-512 → ModelBuilder weights=; the paper recipe initializes temporal
    training from per-frame-pretrained encoders/decoders)."""
    pre_enc = getattr(args, "pre_enc", "") or cfg.MODEL.weights_encoder
    pre_dec = getattr(args, "pre_dec", "") or cfg.MODEL.weights_decoder
    if not pre_enc and not pre_dec:
        return variables
    import torch
    if pre_enc:
        imported = import_encoder_by_arch(
            cfg.MODEL.arch_encoder, torch.load(pre_enc, map_location="cpu"))
        variables = merge_variables(
            dict(variables), {c: {"encoder": v} for c, v in imported.items()})
        if logger:
            logger.info(f"pretrained init: encoder from {pre_enc}")
    if pre_dec:
        if "decoder" not in variables.get("params", {}):
            if logger:
                logger.info(f"pretrained init: --pre_dec ignored — "
                            f"this method has no 'decoder' subtree")
        else:
            imported = import_decoder_by_arch(
                cfg.MODEL.arch_decoder,
                torch.load(pre_dec, map_location="cpu"))
            variables = merge_variables(
                dict(variables),
                {c: {"decoder": v} for c, v in imported.items()})
            if logger:
                logger.info(f"pretrained init: decoder from {pre_dec}")
    return variables
