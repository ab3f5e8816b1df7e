"""--eval_policy {bucketed,exact,auto}: identical predictions, and the
auto policy routes shapes to exact kernels only when their total frame
count amortizes the compile (VERDICT r4 #1; tools/eval_policy_micro.py
is the on-chip measurement behind the default threshold)."""

import argparse

import pytest

from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw


@pytest.fixture(scope="module")
def vspw_root(tmp_path_factory):
    import os
    import shutil

    root = tmp_path_factory.mktemp("vspw_policy")
    # three videos, two distinct shapes: one "common" shape with 8 frames,
    # one rare shape split over two 3-frame videos
    make_synthetic_vspw(str(root), num_videos=1, frames_per_video=8,
                        size=(40, 48), num_class=5, seed=21)
    tmp2 = tmp_path_factory.mktemp("vspw_policy_rare")
    make_synthetic_vspw(str(tmp2), num_videos=2, frames_per_video=3,
                        size=(40, 56), num_class=5, seed=22)
    for i in range(2):
        shutil.move(os.path.join(str(tmp2), "data", f"video_{i:03d}"),
                    os.path.join(str(root), "data", f"video_{100 + i}"))
    vids = sorted(os.listdir(os.path.join(str(root), "data")))
    with open(os.path.join(str(root), "val.txt"), "w") as f:
        f.write("".join(v + "\n" for v in vids))
    return str(root)


def _args(root, policy, min_frames=6):
    return argparse.Namespace(
        dataroot=root, split="val", num_class=5, method="clip_psp",
        clip_num=4, dilation_num=0, dilation2="1,2,3", vc_clip_num=4,
        lesslabel=False, use_memory=False, memory_num=8, clipocr_all=False,
        psp_weight=False, deepsup_scale=0.4, st_weight=0.1, allsup=False,
        allsup_scale=0.3, linear_combine=False, distsoftmax=False,
        distnearest=False, temp=3.0, max_distances=[10], load="",
        saveroot="", is_save=False, streaming=True, fix=False,
        cropsize=40, multi_scale=False, trainfps=15, width_bucket=64,
        eval_policy=policy, exact_min_frames=min_frames)


def test_eval_policy_variants_agree(vspw_root):
    import jax
    import jax.numpy as jnp
    from cvpr2021_vspw_implement_tpu.methods import build_method
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False

    model, _ = build_method("clip_psp", cfg, _args(vspw_root, "bucketed"))
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((4, 1, 40, 48, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, sample,
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    results = {p: evaluate_clip(cfg, _args(vspw_root, p),
                                variables=variables)[0]
               for p in ("bucketed", "exact", "auto")}
    for p in ("exact", "auto"):
        assert results[p]["mIoU"] == pytest.approx(
            results["bucketed"]["mIoU"], abs=1e-6), p
        assert results[p]["Acc"] == pytest.approx(
            results["bucketed"]["Acc"], abs=1e-6), p


def test_eval_policy_variants_agree_tdnet(vspw_root):
    """The tdnet branch honours --eval_policy too (VERDICT r4 #9): its
    bucket tax is the worst of the serving rows, so exact/auto must be
    reachable and prediction-identical there as well."""
    import jax
    import jax.numpy as jnp
    from cvpr2021_vspw_implement_tpu.methods import build_method
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False

    args0 = _args(vspw_root, "bucketed")
    args0.method = "tdnet"
    model, _ = build_method("tdnet", cfg, args0)
    key = jax.random.PRNGKey(2)
    sample = jnp.zeros((4, 1, 40, 48, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, sample,
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    results = {}
    for p in ("bucketed", "exact", "auto"):
        a = _args(vspw_root, p)
        a.method = "tdnet"
        results[p] = evaluate_clip(cfg, a, variables=variables)[0]
    for p in ("exact", "auto"):
        assert results[p]["mIoU"] == pytest.approx(
            results["bucketed"]["mIoU"], abs=1e-6), p
        assert results[p]["Acc"] == pytest.approx(
            results["bucketed"]["Acc"], abs=1e-6), p


def test_auto_policy_amortization_split(vspw_root):
    """The census routes the 8-frame shape to exact and the 2x3-frame
    shape to bucketed at threshold 6."""
    from cvpr2021_vspw_implement_tpu.data import list_videos
    from cvpr2021_vspw_implement_tpu.serving import video_shape_census

    videos = list_videos(vspw_root, "val")
    census, shapes = video_shape_census(vspw_root, videos)
    assert census[(40, 48)] == 8 and census[(40, 56)] == 6
    exact_shapes = {s for s, n in census.items() if n >= 7}
    assert exact_shapes == {(40, 48)}


def test_exact_engine_shares_kernels_across_videos(vspw_root):
    """One compiled encode/fuse pair per distinct shape, not per video."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cvpr2021_vspw_implement_tpu.methods import build_method
    from cvpr2021_vspw_implement_tpu.serving import ExactShapeEngine

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    model, _ = build_method("clip_psp", cfg, _args(vspw_root, "exact"))
    key = jax.random.PRNGKey(1)
    sample = jnp.zeros((4, 1, 40, 48, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, sample,
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    eng = ExactShapeEngine(model, variables)
    rng = np.random.default_rng(0)
    for _video in range(3):
        for _frame in range(2):
            f = rng.standard_normal((40, 48, 3)).astype(np.float32)
            c5, stats = eng.encode(f)
            pred = eng.fuse(c5, [s for s in stats], (40, 48))
            assert pred.shape == (40, 48)
    assert eng.encode_shapes == [(40, 48)]
