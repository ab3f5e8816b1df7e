import textwrap

from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
from cvpr2021_vspw_implement_tpu.config.args import (
    build_train_clip_parser, build_train_parser, postprocess_args)


def test_defaults_shape():
    cfg = default_cfg.clone()
    assert cfg.MODEL.arch_encoder == "resnet50dilated"
    assert cfg.TRAIN.lr_pow == 0.9
    assert cfg.DATASET.num_class == 150


def test_merge_from_file_and_list(tmp_path):
    cfg = default_cfg.clone()
    preset = tmp_path / "p.yaml"
    preset.write_text(textwrap.dedent("""
        DIR: ckpt/x
        MODEL:
          arch_encoder: resnet101dilated
          fc_dim: 2048
        DATASET:
          num_class: 124
    """))
    cfg.merge_from_file(str(preset))
    assert cfg.MODEL.arch_encoder == "resnet101dilated"
    assert cfg.DATASET.num_class == 124
    cfg.merge_from_list(["TRAIN.lr_encoder", "0.002", "MODEL.arch_decoder", "ppm_deepsup_clip"])
    assert cfg.TRAIN.lr_encoder == 0.002
    assert cfg.MODEL.arch_decoder == "ppm_deepsup_clip"
    # dump/reload roundtrip
    dumped = cfg.dump()
    assert "ppm_deepsup_clip" in dumped


def test_train_parser_defaults():
    args = build_train_parser().parse_args([])
    assert args.num_class == 124
    assert args.multi_scale is True
    assert args.cropsize == 531


def test_train_clip_parser_methods_and_postprocess():
    parser = build_train_clip_parser()
    args = parser.parse_args(["--method", "clip_psp", "--dilation2", "3,6,9",
                              "--max_distances", "10,20"])
    postprocess_args(args)
    assert args.method == "clip_psp"
    assert args.dilation2 == [3, 6, 9]
    assert args.max_distances == [10, 20]
