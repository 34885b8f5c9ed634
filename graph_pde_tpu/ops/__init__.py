from .segment import (
    segment_sum,
    masked_segment_sum,
    masked_segment_mean,
    segment_degrees,
)
from .dense import (
    linear_init,
    pyg_uniform_init,
    dense_init,
    dense_apply,
    dense_sin_apply,
)
from .edge_conv import edge_kernel_conv, edge_conv_gaussian
from .cached_contraction import (cached_contraction,
                                 apply_cached_kernel,
                                 contraction_supported)
from .pooling import upsample_nearest_1d, avg_pool_1d

__all__ = [
    "segment_sum", "masked_segment_sum", "masked_segment_mean",
    "segment_degrees",
    "linear_init", "pyg_uniform_init", "dense_init", "dense_apply",
    "dense_sin_apply",
    "edge_kernel_conv", "edge_conv_gaussian",
    "cached_contraction", "apply_cached_kernel",
    "contraction_supported",
    "upsample_nearest_1d", "avg_pool_1d",
]
