"""hrnetv2_clip eval through the clip CLI driver (capability beyond the
reference: models/models.py:564-565 builds this encoder but no reference
driver evals it; our test_clip.py dispatches SegmentationModuleClip)."""

import argparse

import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw


def _args(root, width_bucket):
    return argparse.Namespace(
        dataroot=root, split="val", num_class=5, method="hrnetv2_clip",
        clip_num=3, dilation_num=0, dilation2="1,2", vc_clip_num=4,
        lesslabel=False, use_memory=False, memory_num=8, clipocr_all=False,
        psp_weight=False, deepsup_scale=0.4, st_weight=0.1, allsup=False,
        allsup_scale=0.3, linear_combine=False, distsoftmax=False,
        distnearest=False, temp=3.0, max_distances=[10], load="",
        saveroot="", is_save=False, streaming=False, fix=False,
        cropsize=40, multi_scale=False, trainfps=15,
        width_bucket=width_bucket)


def test_hrnetv2_clip_eval_bucketed_matches_exact(tmp_path):
    root = str(tmp_path / "vspw")
    make_synthetic_vspw(root, num_videos=1, frames_per_video=6,
                        size=(40, 56), num_class=5, seed=17)
    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "hrnetv2_clip"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 720
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False

    import jax
    import jax.numpy as jnp
    from cvpr2021_vspw_implement_tpu.methods import build_method
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    model, _ = build_method("hrnetv2_clip", cfg, _args(root, 0))
    key = jax.random.PRNGKey(5)
    sample = jnp.zeros((3, 1, 40, 56, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key},
                           sample[-1], sample[:-1], train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    m_exact, _ = evaluate_clip(cfg, _args(root, 0), variables=variables)
    m_bucket, _ = evaluate_clip(cfg, _args(root, 64), variables=variables)
    assert 0.0 <= m_exact["mIoU"] <= 1.0
    assert np.isfinite(m_exact["Acc"])
    # masked bucketed kernels reproduce the exact-shape predictions
    assert m_bucket["mIoU"] == pytest.approx(m_exact["mIoU"], abs=1e-6)
    assert m_bucket["Acc"] == pytest.approx(m_exact["Acc"], abs=1e-6)
