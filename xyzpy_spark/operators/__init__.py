from .reductions import (
    aggregate_over,
    check_runs,
    fuse_dims,
    heatmap_table,
    histogram,
    trimna,
)

__all__ = [
    "aggregate_over",
    "check_runs",
    "fuse_dims",
    "heatmap_table",
    "histogram",
    "trimna",
]
