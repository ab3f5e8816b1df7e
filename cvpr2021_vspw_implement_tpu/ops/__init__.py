from .interpolate import resize_bilinear, resize_nearest
from .pooling import adaptive_avg_pool2d, global_avg_pool, max_pool_3x3_s2_p1
from .warp import flowwarp, grid_sample

__all__ = ["resize_bilinear", "resize_nearest", "adaptive_avg_pool2d",
           "global_avg_pool", "max_pool_3x3_s2_p1", "flowwarp", "grid_sample"]
