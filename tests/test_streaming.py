"""Streaming TCB-PSP eval must reproduce the window formulation exactly."""

import argparse

import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw


@pytest.fixture(scope="module")
def vspw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vspw_stream")
    make_synthetic_vspw(str(root), num_videos=1, frames_per_video=12,
                        size=(40, 48), num_class=5, seed=11)
    return str(root)


def _args(root, streaming, method="clip_psp", psp_weight=False):
    return argparse.Namespace(
        dataroot=root, split="val", num_class=5, method=method,
        clip_num=4, dilation_num=0, dilation2="1,2,3", vc_clip_num=4,
        lesslabel=False, use_memory=False, memory_num=8, clipocr_all=False,
        psp_weight=psp_weight, deepsup_scale=0.4, st_weight=0.1, allsup=False,
        allsup_scale=0.3, linear_combine=False, distsoftmax=False,
        distnearest=False, temp=3.0, max_distances=[10], load="",
        saveroot="", is_save=False, streaming=streaming, fix=False,
        cropsize=40, multi_scale=False, trainfps=15)


def test_streaming_matches_window(vspw_root, tmp_path):
    import jax
    from cvpr2021_vspw_implement_tpu.methods import build_method
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False

    model, _ = build_method("clip_psp", cfg, _args(vspw_root, True))
    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    sample = jnp.zeros((4, 1, 40, 48, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, sample, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    m_stream, v_stream = evaluate_clip(cfg, _args(vspw_root, True),
                                       variables=variables)
    m_window, v_window = evaluate_clip(cfg, _args(vspw_root, False),
                                       variables=variables)
    assert m_stream["mIoU"] == pytest.approx(m_window["mIoU"], abs=1e-6)
    assert m_stream["Acc"] == pytest.approx(m_window["Acc"], abs=1e-6)
    assert m_stream["VC"] == pytest.approx(m_window["VC"], abs=1e-6)


def test_streaming_matches_window_psp_weight(vspw_root, tmp_path):
    """psp_weight mode: streaming must replicate the quirky weight pairing."""
    import jax
    import jax.numpy as jnp
    from cvpr2021_vspw_implement_tpu.methods import build_method
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False

    args_s = _args(vspw_root, True, psp_weight=True)
    model, _ = build_method("clip_psp", cfg, args_s)
    key = jax.random.PRNGKey(2)
    sample = jnp.zeros((4, 1, 40, 48, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, sample, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    m_stream, _ = evaluate_clip(cfg, args_s, variables=variables)
    m_window, _ = evaluate_clip(cfg, _args(vspw_root, False, psp_weight=True),
                                variables=variables)
    assert m_stream["mIoU"] == pytest.approx(m_window["mIoU"], abs=1e-6)
    assert m_stream["VC"] == pytest.approx(m_window["VC"], abs=1e-6)


@pytest.mark.parametrize("method", ["netwarp", "netwarp_ocr"])
def test_streaming_matches_window_netwarp(vspw_root, tmp_path, method):
    import jax
    import jax.numpy as jnp
    from cvpr2021_vspw_implement_tpu.methods import build_method
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False

    def nw_args(streaming):
        a = _args(vspw_root, streaming, method=method)
        a.clip_num = 2
        a.dilation_num = 0
        return a

    model, _ = build_method(method, cfg, nw_args(True))
    # tiny RAFT for the CPU test
    model = model.clone(raft_iters=2)
    key = jax.random.PRNGKey(3)
    sample = jnp.zeros((2, 1, 40, 48, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, sample, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    import cvpr2021_vspw_implement_tpu.methods as methods_mod
    orig = methods_mod.METHODS[method]

    def patched(cfg_, args_, dtype=None, **kw):
        m, l = orig(cfg_, args_, dtype, **kw)
        return m.clone(raft_iters=2), l

    methods_mod.METHODS[method] = patched
    try:
        m_stream, _ = evaluate_clip(cfg, nw_args(True), variables=variables)
        m_window, _ = evaluate_clip(cfg, nw_args(False), variables=variables)
    finally:
        methods_mod.METHODS[method] = orig
    assert m_stream["mIoU"] == pytest.approx(m_window["mIoU"], abs=1e-6)
    assert m_stream["VC"] == pytest.approx(m_window["VC"], abs=1e-6)


def test_streaming_matches_window_clip_ocr(vspw_root, tmp_path):
    import jax
    import jax.numpy as jnp
    from cvpr2021_vspw_implement_tpu.methods import build_method
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False

    model, _ = build_method("clip_ocr", cfg, _args(vspw_root, True, "clip_ocr"))
    key = jax.random.PRNGKey(1)
    sample = jnp.zeros((4, 1, 40, 48, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, sample, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    m_stream, _ = evaluate_clip(cfg, _args(vspw_root, True, "clip_ocr"),
                                variables=variables)
    m_window, _ = evaluate_clip(cfg, _args(vspw_root, False, "clip_ocr"),
                                variables=variables)
    assert m_stream["mIoU"] == pytest.approx(m_window["mIoU"], abs=1e-6)
    assert m_stream["VC"] == pytest.approx(m_window["VC"], abs=1e-6)
