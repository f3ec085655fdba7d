"""xyzpy_spark — a PySpark-native parameter-sweep analytics engine.

A ground-up re-expression of the capabilities of jcmgray/xyzpy
(labelled parameter sweeps -> labelled datasets) on top of Spark
DataFrames.  The canonical representation is a **long-format
DataFrame**: one row per evaluated grid point, with one column per
parameter dimension plus one column per output variable (dense
xarray-style views are derived presentations, never the storage
format).  This makes every reference operator a standard Spark
join / aggregation / filter and scales from a 36-point quick-start
sweep to a 100 TB persisted result store.

Layout
------
- ``prepare``    : combos/cases/var-schema normalization (reference
  semantics: ``xyzpy/gen/prepare.py``)
- ``grid``       : distributed cartesian-grid builder
  (``spark.range`` + stride arithmetic; reference semantics:
  ``xyzpy/gen/combo_runner.py:201-218``)
- ``runner``     : the UDF evaluation harness (``mapInPandas``) —
  ``combo_runner_to_df`` / ``case_runner_to_df``
- ``missing``    : missing-point anti-joins (reference:
  ``xyzpy/gen/case_runner.py:217-344``)
- ``merge``      : outer-merge with conflict policies (reference:
  ``xyzpy/gen/farming.py:602-670``)
- ``farming``    : ``Runner`` / ``Harvester`` / ``Sampler`` / ``label``
- ``cropping``   : sow/grow/reap staged (decoupled) execution
- ``operators.reductions`` : aggregate-over-dims, error ranges,
  histogram, heatmap pivot (reference: ``xyzpy/plot/infiniplot.py``)
- ``functions.stats``      : running/Welford statistics analogs
- ``pipeline``   : beyond-reference LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal)
"""

from .prepare import (
    parse_combos,
    parse_cases,
    parse_constants,
    parse_var_names,
    parse_var_dims,
    parse_var_coords,
)
from .grid import combo_grid, case_grid, grid_size
from .runner import (
    combo_runner_to_df,
    case_runner_to_df,
    to_dense_pandas,
    to_dense_arrays,
    to_xarray,
)
from .missing import find_missing_cases, is_case_missing, parse_into_cases
from .merge import merge_datasets, MergeConflictError
from .farming import Runner, Harvester, Sampler, label
from .session import get_spark
from .cropping import Crop, load_crops

# reference top-level parity: every name a jcmgray/xyzpy user reaches
# for via `import xyzpy` resolves here too (reference
# xyzpy/__init__.py exports; plot/SLURM names are out of engine scope
# — see COVERAGE.md §2.3/§2.6)
from .functions.benchmark import Benchmarker, benchmark
from .functions.stats import (
    RunningStatistics,
    covariance_matrix,
    estimate_from_repeats,
    format_number_with_error,
    running_stats,
    to_uncertainties,
)
from .manage import (
    auto_xyz_df,
    cache_to_disk,
    compact_table,
    merge_sync_conflict_tables,
    save_merge_df,
    sort_dims,
)
from .operators.reductions import check_runs, post_fix, run_gaps, trimna
from .sources.tables import load_df, save_df
from .utils import (
    Timer,
    autocorrect_kwargs,
    flatten,
    prod,
    report_memory,
    report_memory_gpu,
    unzip,
)

__all__ = [
    "parse_combos",
    "parse_cases",
    "parse_constants",
    "parse_var_names",
    "parse_var_dims",
    "parse_var_coords",
    "combo_grid",
    "case_grid",
    "grid_size",
    "combo_runner_to_df",
    "case_runner_to_df",
    "to_dense_pandas",
    "to_dense_arrays",
    "to_xarray",
    "find_missing_cases",
    "is_case_missing",
    "parse_into_cases",
    "merge_datasets",
    "MergeConflictError",
    "Runner",
    "Harvester",
    "Sampler",
    "label",
    "get_spark",
    "Crop",
    "load_crops",
    "Benchmarker",
    "benchmark",
    "RunningStatistics",
    "covariance_matrix",
    "estimate_from_repeats",
    "format_number_with_error",
    "running_stats",
    "to_uncertainties",
    "auto_xyz_df",
    "cache_to_disk",
    "compact_table",
    "merge_sync_conflict_tables",
    "save_merge_df",
    "sort_dims",
    "check_runs",
    "post_fix",
    "run_gaps",
    "trimna",
    "load_df",
    "save_df",
    "Timer",
    "autocorrect_kwargs",
    "flatten",
    "prod",
    "report_memory",
    "report_memory_gpu",
    "unzip",
]

__version__ = "0.1.0"
