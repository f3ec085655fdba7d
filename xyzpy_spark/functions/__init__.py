from .stats import (
    RunningStatistics,
    covariance_matrix,
    estimate_from_repeats,
    format_number_with_error,
    running_stats,
)

__all__ = [
    "RunningStatistics",
    "covariance_matrix",
    "estimate_from_repeats",
    "format_number_with_error",
    "running_stats",
]
