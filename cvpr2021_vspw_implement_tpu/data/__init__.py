from .datasets import (ClipDataset, FrameDataset, LongClipDataset,
                       TestClipDataset, TestFrameDataset, TestLongClipDataset,
                       TwoDataset, dilation_lists, list_frames, list_videos,
                       normalize_image, remap_label)
from .loader import (PrefetchLoader, collate_clips_in_order,
                     collate_clips_target_last, collate_frames,
                     make_collate_target_last)
from .synthetic import make_synthetic_vspw

__all__ = [
    "ClipDataset", "FrameDataset", "LongClipDataset", "TestClipDataset",
    "TestFrameDataset", "TestLongClipDataset", "TwoDataset",
    "dilation_lists", "list_frames", "list_videos", "normalize_image",
    "remap_label", "PrefetchLoader", "collate_clips_in_order",
    "collate_clips_target_last", "collate_frames", "make_synthetic_vspw",
]
