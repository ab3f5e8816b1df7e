from .metrics import (
    Evaluator,
    accuracy,
    confusion_matrix_jax,
    confusion_matrix_np,
    get_common,
    intersectionAndUnion,
    pixel_acc,
    video_consistency,
)
from .misc import (
    AverageMeter,
    NotSupportedCliException,
    colorEncode,
    find_recursive,
    parse_devices,
    setup_logger,
    vspw_palette,
)

__all__ = [
    "Evaluator", "accuracy", "confusion_matrix_jax", "confusion_matrix_np",
    "get_common", "intersectionAndUnion", "pixel_acc", "video_consistency",
    "AverageMeter", "NotSupportedCliException", "colorEncode",
    "find_recursive", "parse_devices", "setup_logger", "vspw_palette",
]
