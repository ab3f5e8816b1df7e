from .corr import (all_pairs_correlation, build_corr_pyramid,
                   lookup_corr_pyramid)
from .extractor import BasicEncoder, InstanceNorm, ResidualBlock
from .raft import RAFT, coords_grid, pad_to_multiple_of_8, unpad, upflow8
from .update import BasicUpdateBlock, SepConvGRU

__all__ = ["RAFT", "BasicEncoder", "InstanceNorm", "ResidualBlock",
           "BasicUpdateBlock", "SepConvGRU", "all_pairs_correlation",
           "build_corr_pyramid", "lookup_corr_pyramid", "coords_grid",
           "pad_to_multiple_of_8", "unpad", "upflow8"]
