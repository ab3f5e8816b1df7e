import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.utils import (
    Evaluator, confusion_matrix_jax, confusion_matrix_np, get_common,
    pixel_acc, video_consistency, vspw_palette, colorEncode, parse_devices,
)


def test_confusion_matrix_hand_example():
    gt = np.array([[0, 0, 1], [1, 2, 255]])
    pred = np.array([[0, 1, 1], [1, 2, 0]])
    cm = confusion_matrix_np(gt, pred, 3)
    # gt=0: pred 0 once, pred 1 once; gt=1: pred 1 twice; gt=2: pred 2 once.
    expected = np.array([[1, 1, 0], [0, 2, 0], [0, 0, 1]])
    np.testing.assert_array_equal(cm, expected)
    # ignore pixel (255) dropped entirely
    assert cm.sum() == 5


def test_confusion_matrix_jax_matches_np():
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 5, size=(4, 17, 13))
    gt[rng.random(gt.shape) < 0.1] = 255
    pred = rng.integers(0, 5, size=(4, 17, 13))
    cm_np = confusion_matrix_np(gt, pred, 5)
    cm_jx = np.asarray(confusion_matrix_jax(gt, pred, 5))
    np.testing.assert_allclose(cm_np, cm_jx)


def test_evaluator_miou_restricted_to_present_classes():
    ev = Evaluator(4)
    gt = np.array([0, 0, 1, 1])
    pred = np.array([0, 1, 1, 1])
    ev.add_batch(gt, pred)
    # class0: i=1 u=2 -> 0.5 ; class1: i=2 u=3 -> 2/3 ; classes 2,3 absent
    assert ev.Mean_Intersection_over_Union() == pytest.approx((0.5 + 2 / 3) / 2)
    assert ev.Pixel_Accuracy() == pytest.approx(3 / 4)
    # class-mean acc: class0 1/2, class1 2/2
    assert ev.Pixel_Accuracy_Class() == pytest.approx((0.5 + 1.0) / 2)


def test_pixel_acc_ignores_negative_labels():
    import jax.numpy as jnp
    logits = jnp.zeros((1, 2, 2, 3)).at[..., 1].set(1.0)  # predicts class 1
    label = jnp.array([[[1, 1], [0, -1]]])
    acc = float(pixel_acc(logits, label))
    assert acc == pytest.approx(2 / 3, abs=1e-6)


def test_vc_hand_example():
    # 3 frames 2x2, window 2: windows are (0,1) and not (1,2) [len-clip = 1]
    gt = [np.array([[1, 1], [2, 2]]),
          np.array([[1, 1], [2, 3]]),
          np.array([[1, 1], [3, 3]])]
    pred = [np.array([[1, 1], [2, 2]]),
            np.array([[1, 2], [2, 3]]),
            np.array([[1, 1], [3, 3]])]
    accs = get_common(gt, pred, 2, 2, 2)
    assert len(accs) == 1
    # window 0-1: gt agrees at 3 px, pred agrees at 2 of those ([0,0],[1,0])
    assert accs[0] == pytest.approx(2 / 3)

    accs_vec = video_consistency(np.stack(gt), np.stack(pred), 2)
    np.testing.assert_allclose(accs, accs_vec)


def test_vc_vectorized_matches_reference_loop():
    rng = np.random.default_rng(1)
    gt = rng.integers(0, 3, size=(10, 6, 5))
    pred = rng.integers(0, 3, size=(10, 6, 5))
    for clip_num in (2, 4, 8):
        a = get_common(list(gt), list(pred), clip_num, 6, 5)
        b = video_consistency(gt, pred, clip_num)
        np.testing.assert_allclose(a, b)


def test_palette_structure():
    p = vspw_palette()
    assert len(p) == 768
    assert p[:6] == [0, 0, 0, 128, 0, 0]
    assert p[9 * 3:10 * 3] == [191, 0, 0]       # VOC 192 level remapped to 191
    assert p[16 * 3:17 * 3] == [0, 64, 0]
    assert p[22 * 3:23 * 3] == [22, 22, 22]      # grayscale tail
    assert p[255 * 3:] == [255, 255, 255]


def test_color_encode():
    colors = np.array([[10, 0, 0], [0, 20, 0]], dtype=np.uint8)
    lab = np.array([[0, 1], [1, 0]])
    out = colorEncode(lab, colors)
    assert out[0, 0].tolist() == [10, 0, 0]
    assert out[0, 1].tolist() == [0, 20, 0]


def test_parse_devices():
    assert parse_devices("0-3") == ["gpu0", "gpu1", "gpu2", "gpu3"]
    assert parse_devices("gpu0,gpu2") == ["gpu0", "gpu2"]
    assert parse_devices("1") == ["gpu1"]
