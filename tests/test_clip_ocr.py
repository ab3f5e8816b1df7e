"""TCB-OCR (ClipOCRNet) contract tests incl. streaming memory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
from cvpr2021_vspw_implement_tpu.models.clip_ocr import (
    ClipOCRNet, clip_ocr_loss, init_memory)

KEY = jax.random.PRNGKey(0)


def _model(clipocr_all=False):
    enc = ModelBuilder.build_encoder("resnet18dilated")
    return ClipOCRNet(encoder=enc, num_class=7, clipocr_all=clipocr_all)


# resnet18 C4/C5 are 256/512 wide — the module's heads adapt via flax shape
# inference, so a small encoder suffices for contract tests.
@pytest.mark.parametrize("clipocr_all", [False, True])
def test_clip_ocr_train_and_loss(clipocr_all):
    model = _model(clipocr_all)
    rng = np.random.default_rng(0)
    t1, b, h, w = 3, 2, 32, 32
    imgs = jnp.asarray(rng.standard_normal((t1, b, h, w, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 7, (t1, b, h, w)), jnp.int32)

    variables = model.init({"params": KEY, "dropout": KEY}, imgs, train=True)
    outs, _ = model.apply(variables, imgs, train=True,
                          mutable=["batch_stats"], rngs={"dropout": KEY})
    main, dsn = outs
    assert dsn.shape == (t1 * b, h // 8, w // 8, 7)
    assert main.shape == ((t1 * b, h // 8, w // 8, 7) if clipocr_all
                          else (b, h // 8, w // 8, 7))
    loss, acc = clip_ocr_loss(outs, {"labels": labels},
                              clipocr_all=clipocr_all)
    assert np.isfinite(float(loss))

    eval_outs = model.apply(variables, imgs, train=False)
    assert eval_outs[0].shape == (b, h // 8, w // 8, 7)


def test_clip_ocr_streaming_memory():
    model = _model()
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((3, 1, 32, 32, 3), np.float32))
    variables = model.init({"params": KEY, "dropout": KEY}, imgs, train=True)

    mem = init_memory(memory_num=4, batch=1, num_class=7)
    (out1,), mem = model.apply(variables, imgs, train=False, memory=mem)
    assert int(mem[1]) == 3  # 3 contexts pushed
    (out2,), mem = model.apply(variables, imgs * 1.1, train=False, memory=mem)
    assert int(mem[1]) == 5  # capped at memory_num+1 buffer size
    # memory changes the blend → outputs differ from the memoryless path
    (out_nomem,) = model.apply(variables, imgs * 1.1, train=False)
    assert float(jnp.abs(out2 - out_nomem).max()) > 1e-6
