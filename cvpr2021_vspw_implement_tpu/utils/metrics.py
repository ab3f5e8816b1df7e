"""Segmentation / video-consistency metrics.

Re-implements the reference metric surface (reference: utils.py:37-107,
VC_perclip.py:7-71) with vectorized numpy on the host and a jittable JAX
confusion-matrix kernel for on-device accumulation.

Conventions match the reference exactly:
  * labels are int, ignore label is >= num_class (255 after remap), pixels
    with gt outside [0, num_class) are dropped from the confusion matrix;
  * mIoU is averaged only over classes present in the ground truth
    (reference: utils.py:78-79);
  * VC over a window of size ``clip_num`` is the fraction of pixels whose
    prediction agrees across the whole window among pixels whose GT agrees
    across the whole window (reference: utils.py:37-53).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Confusion matrix
# ---------------------------------------------------------------------------
def confusion_matrix_np(gt: np.ndarray, pred: np.ndarray, num_class: int) -> np.ndarray:
    """Host-side confusion-matrix increment (reference: utils.py:91-100)."""
    gt = np.asarray(gt)
    pred = np.asarray(pred)
    mask = (gt >= 0) & (gt < num_class)
    label = num_class * gt[mask].astype(np.int64) + pred[mask].astype(np.int64)
    count = np.bincount(label, minlength=num_class ** 2)
    return count.reshape(num_class, num_class)


@functools.partial(jax.jit, static_argnames=("num_class",))
def confusion_matrix_jax(gt: jax.Array, pred: jax.Array, num_class: int) -> jax.Array:
    """On-device confusion-matrix increment.

    TPU-native formulation: a one-hot scatter-add via ``segment_sum`` over the
    flattened joint index (``num_class * gt + pred``); invalid pixels are
    routed to a trash bin (index num_class**2) that is dropped.
    """
    gt = gt.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_class)
    joint = jnp.where(valid, num_class * gt + jnp.clip(pred, 0, num_class - 1),
                      num_class * num_class)
    counts = jax.ops.segment_sum(
        jnp.ones_like(joint, dtype=jnp.float32), joint,
        num_segments=num_class * num_class + 1)
    return counts[:-1].reshape(num_class, num_class)


class Evaluator:
    """Confusion-matrix metrics (reference: utils.py:55-107)."""

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.confusion_matrix = np.zeros((num_class, num_class), dtype=np.float64)

    def add_batch(self, gt_image, pre_image):
        assert np.shape(gt_image) == np.shape(pre_image)
        self.confusion_matrix += confusion_matrix_np(gt_image, pre_image, self.num_class)

    def add_confusion(self, cm):
        """Accumulate a precomputed (possibly device-side) confusion matrix."""
        self.confusion_matrix += np.asarray(cm, dtype=np.float64)

    def beforeval(self):
        isval = np.sum(self.confusion_matrix, axis=1) > 0
        self.confusion_matrix = self.confusion_matrix * isval

    def Pixel_Accuracy(self):
        return np.diag(self.confusion_matrix).sum() / self.confusion_matrix.sum()

    def Pixel_Accuracy_Class(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(self.confusion_matrix) / self.confusion_matrix.sum(axis=1)
        return np.nanmean(acc)

    def Mean_Intersection_over_Union(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = np.diag(self.confusion_matrix) / (
                np.sum(self.confusion_matrix, axis=1)
                + np.sum(self.confusion_matrix, axis=0)
                - np.diag(self.confusion_matrix))
        isval = np.sum(self.confusion_matrix, axis=1) > 0
        return np.nansum(iou * isval) / isval.sum()

    def Frequency_Weighted_Intersection_over_Union(self):
        freq = np.sum(self.confusion_matrix, axis=1) / np.sum(self.confusion_matrix)
        with np.errstate(divide="ignore", invalid="ignore"):
            iu = np.diag(self.confusion_matrix) / (
                np.sum(self.confusion_matrix, axis=1)
                + np.sum(self.confusion_matrix, axis=0)
                - np.diag(self.confusion_matrix))
        return (freq[freq > 0] * iu[freq > 0]).sum()

    def reset(self):
        self.confusion_matrix = np.zeros((self.num_class, self.num_class),
                                         dtype=np.float64)


# ---------------------------------------------------------------------------
# Pixel accuracy (training metric)
# ---------------------------------------------------------------------------
def pixel_acc(pred_logits: jax.Array, label: jax.Array) -> jax.Array:
    """Training pixel accuracy (reference: models/models.py:65-71).

    pred_logits: [N, H, W, C] (any monotone score; argmax taken over C)
    label:       [N, H, W] int, negative = ignore
    """
    preds = jnp.argmax(pred_logits, axis=-1)
    valid = (label >= 0)
    acc_sum = jnp.sum(valid & (preds == label))
    pixel_sum = jnp.sum(valid)
    return acc_sum.astype(jnp.float32) / (pixel_sum.astype(jnp.float32) + 1e-10)


# ---------------------------------------------------------------------------
# Video consistency (VC)
# ---------------------------------------------------------------------------
def get_common(gt_list, pred_list, clip_num: int, h: int, w: int):
    """Sliding-window VC accuracies (reference: utils.py:37-53).

    For each window start i, pixels whose GT is identical across the whole
    window form the denominator; among them, those whose prediction is also
    identical across the window form the numerator.
    """
    accs = []
    n = len(gt_list)
    for i in range(n - clip_num):
        gt_common = np.ones((h, w), dtype=bool)
        pred_common = np.ones((h, w), dtype=bool)
        for j in range(1, clip_num):
            gt_common &= (gt_list[i] == gt_list[i + j])
            pred_common &= (pred_list[i] == pred_list[i + j])
        agree = pred_common & gt_common
        denom = gt_common.sum()
        # empty-denominator windows are nan (the reference relies on
        # divide-by-zero + nanmean; we guard explicitly)
        accs.append(agree.sum() / denom if denom else np.nan)
    return accs


def video_consistency(gt_frames: np.ndarray, pred_frames: np.ndarray,
                      clip_num: int) -> list[float]:
    """Vectorized VC over a whole video.

    gt_frames / pred_frames: [T, H, W] stacked masks.  Equivalent to
    ``get_common`` but computed with cumulative logical-ands so each window
    is O(1) instead of O(clip_num) full-frame passes.
    """
    t = gt_frames.shape[0]
    if t <= clip_num:
        return []
    # adj[k] = frame k == frame k+... consistency is not decomposable into
    # adjacent pairs (equality across window needs all-pairs vs first frame),
    # window equality == all frames equal to the first frame of the window.
    accs = []
    for i in range(t - clip_num):
        ref_gt = gt_frames[i]
        ref_pr = pred_frames[i]
        gt_common = np.all(gt_frames[i + 1:i + clip_num] == ref_gt, axis=0)
        pred_common = np.all(pred_frames[i + 1:i + clip_num] == ref_pr, axis=0)
        denom = gt_common.sum()
        accs.append((pred_common & gt_common).sum() / denom
                    if denom else np.nan)
    return accs


def intersectionAndUnion(imPred, imLab, numClass):
    """Per-class intersection/union histograms (reference: utils.py:238-258)."""
    imPred = np.asarray(imPred).copy() + 1
    imLab = np.asarray(imLab).copy() + 1
    imPred = imPred * (imLab > 0)
    intersection = imPred * (imPred == imLab)
    area_intersection, _ = np.histogram(intersection, bins=numClass,
                                        range=(1, numClass))
    area_pred, _ = np.histogram(imPred, bins=numClass, range=(1, numClass))
    area_lab, _ = np.histogram(imLab, bins=numClass, range=(1, numClass))
    return area_intersection, area_pred + area_lab - area_intersection


def accuracy(preds, label):
    """Valid-pixel accuracy on host arrays (reference: utils.py:230-235)."""
    valid = (label >= 0)
    acc_sum = (valid * (preds == label)).sum()
    valid_sum = valid.sum()
    return float(acc_sum) / (valid_sum + 1e-10), valid_sum
