from .builder import ModelBuilder
from .segmentation import (SegmentationModule, inference_pred,
                           inference_probs, nll_loss, segmentation_loss)

__all__ = ["ModelBuilder", "SegmentationModule", "inference_pred",
           "inference_probs", "nll_loss", "segmentation_loss"]
