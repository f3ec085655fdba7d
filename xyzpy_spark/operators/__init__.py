from .reductions import (
    aggregate_over,
    check_runs,
    fuse_dims,
    heatmap_table,
    histogram,
    trimna,
)
from .temporal import (
    asof_join,
    cohort_retention,
    funnel_counts,
    range_join,
    time_rollup,
)

__all__ = [
    "aggregate_over",
    "asof_join",
    "check_runs",
    "cohort_retention",
    "funnel_counts",
    "fuse_dims",
    "heatmap_table",
    "histogram",
    "range_join",
    "time_rollup",
    "trimna",
]
