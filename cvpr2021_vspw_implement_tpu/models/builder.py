"""String-keyed model factory (reference: models/models.py:512-656).

Maps the reference's ``arch_encoder`` / ``arch_decoder`` names onto flax
modules.  Decoder init differences from flax defaults are baked into the
modules themselves (kaiming conv init, BN bias 1e-4 — reference
``ModelBuilder.weights_init`` models/models.py:514-521).
"""

from __future__ import annotations

from typing import Any

from . import decoders, mobilenet, resnet


class ModelBuilder:
    @staticmethod
    def build_encoder(arch: str = "resnet50dilated", fc_dim: int = 512,
                      dtype: Any = None, remat: bool = False, args=None,
                      pipeline_stages: int = 0, pipeline_micro: int = 1,
                      pipeline_schedule: str = "gpipe"):
        arch = arch.lower()
        common = dict(dtype=dtype, remat=remat)
        if pipeline_stages:
            common.update(pipeline_stages=pipeline_stages,
                          pipeline_micro=pipeline_micro,
                          pipeline_schedule=pipeline_schedule)
        if arch == "mobilenetv2dilated":
            return mobilenet.MobileNetV2Dilated(dilate_scale=8, dtype=dtype)
        if arch == "resnet18":
            return resnet.resnet18(**common)
        if arch == "resnet18dilated":
            return resnet.resnet18(dilate_scale=8, **common)
        if arch == "resnet50":
            return resnet.resnet50(**common)
        if arch == "resnet50dilated":
            return resnet.resnet50(dilate_scale=8, **common)
        if arch == "resnet101":
            return resnet.resnet101(**common)
        if arch == "resnet101dilated":
            return resnet.resnet101(dilate_scale=8, **common)
        if arch == "resnext101":
            return resnet.resnext101(**common)
        if arch == "hrnetv2":
            from .hrnet import HRNetV2
            return HRNetV2(dtype=dtype)
        if arch == "hrnetv2_clip":
            from .hrnet_clip import HRNetV2Clip
            return HRNetV2Clip(dtype=dtype, args=args)
        raise Exception("Architecture undefined!")

    @staticmethod
    def build_decoder(arch: str = "ppm_deepsup", fc_dim: int = 512,
                      num_class: int = 150, dtype: Any = None):
        arch = arch.lower()
        if arch == "c1_deepsup":
            return decoders.C1DeepSup(num_class, fc_dim, dtype=dtype)
        if arch == "c1":
            return decoders.C1(num_class, fc_dim, dtype=dtype)
        if arch == "ppm":
            return decoders.PPM(num_class, fc_dim, dtype=dtype)
        if arch == "ppm_deepsup":
            return decoders.PPMDeepsup(num_class, fc_dim, dtype=dtype)
        if arch == "ppm_deepsup_clip":
            return decoders.PPMDeepsupClip(num_class, fc_dim, dtype=dtype)
        if arch == "ppm_clip":
            return decoders.PPMClip(num_class, fc_dim, dtype=dtype)
        if arch == "upernet_lite":
            return decoders.UPerNet(num_class, fc_dim, fpn_dim=256, dtype=dtype)
        if arch == "upernet":
            return decoders.UPerNet(num_class, fc_dim, fpn_dim=512, dtype=dtype)
        if arch == "deeplab":
            from .deeplab import DeepLab
            return DeepLab(num_class=num_class, fc_dim=fc_dim, dtype=dtype)
        if arch == "nonlocal2d":
            from .nonlocal_blocks import NonLocal2d
            return NonLocal2d(num_class=num_class, dtype=dtype)
        if arch == "ocrnet_deepsup":
            from .ocr import SpatialOCRNet
            return SpatialOCRNet(num_class=num_class, dtype=dtype)
        raise Exception("Architecture undefined!")
