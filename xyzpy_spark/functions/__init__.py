from .profile import profile_table
from .sketch import (
    approx_distinct,
    approx_quantiles,
    bloom_build,
    bloom_contains,
    bloom_positions,
    frequent_items,
    heavy_hitters,
)
from .stats import (
    RunningStatistics,
    covariance_matrix,
    estimate_from_repeats,
    format_number_with_error,
    running_stats,
)

__all__ = [
    "profile_table",
    "approx_distinct",
    "approx_quantiles",
    "bloom_build",
    "bloom_contains",
    "bloom_positions",
    "frequent_items",
    "heavy_hitters",
    "RunningStatistics",
    "covariance_matrix",
    "estimate_from_repeats",
    "format_number_with_error",
    "running_stats",
]
