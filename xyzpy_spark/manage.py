"""Dataset management utilities.

Spark analogs of ``xyzpy/manage.py``: load/save across formats,
load-merge-save, sync-conflict reconciliation, function-level result
caching, and small coercion helpers.  (``trimna``/``post_fix``/
``check_runs`` live in :mod:`xyzpy_spark.operators.reductions`.)
"""

from __future__ import annotations

import functools
import hashlib

from pyspark.sql import DataFrame, SparkSession

from . import fsutil
from .farming import _publish_parquet, load_attrs
from .merge import merge_datasets


def save_merge_df(
    df: DataFrame,
    path: str,
    dims,
    *,
    overwrite: bool | None = None,
) -> None:
    """Load-if-exists, merge under the conflict policy, save atomically.

    Reference: ``save_merge_ds`` (``manage.py:172-208``).
    """
    spark = df.sparkSession
    had = fsutil.exists(spark, path)
    if had:
        old = spark.read.parquet(path)
        df = merge_datasets(old, df, dims, overwrite=overwrite)
    _publish_parquet(df, path, load_attrs(path, spark) if had else None)


def merge_sync_conflict_tables(
    spark: SparkSession,
    pattern: str,
    dims,
    *,
    overwrite: bool | None = None,
    delete_extras: bool = True,
) -> str | None:
    """Reconcile sync-conflict copies of a result store.

    Reference: ``merge_sync_conflict_datasets`` (``manage.py:349-402``)
    — glob the conflicted copies (file-sync services rename one side),
    merge them all, keep the shortest-named path as canonical, delete
    the rest.  Returns the canonical path.
    """
    paths = sorted(
        fsutil.glob_paths(spark, pattern), key=lambda p: (len(p), p)
    )
    if not paths:
        return None
    canonical, extras = paths[0], paths[1:]
    merged = spark.read.parquet(canonical)
    for p in extras:
        merged = merge_datasets(
            merged, spark.read.parquet(p), dims, overwrite=overwrite
        )
    _publish_parquet(merged, canonical, load_attrs(canonical, spark))
    if delete_extras:
        for p in extras:
            fsutil.delete(spark, p)
    return canonical


def cache_to_disk(cache_dir: str):
    """Memoize a DataFrame-producing function to parquet, keyed by the
    repr-hash of its arguments.

    Reference: ``cache_to_disk`` (``manage.py:15-29``, a joblib.Memory
    wrapper).  The wrapped fn must take a SparkSession first and return
    a DataFrame; repeat calls with equal args read the stored table
    instead of recomputing.
    """

    def decorate(fn):
        @functools.wraps(fn)
        def wrapper(spark: SparkSession, *args, **kwargs):
            key = hashlib.sha256(
                repr((fn.__name__, args, sorted(kwargs.items()))).encode()
            ).hexdigest()[:24]
            path = fsutil.join(cache_dir, f"{fn.__name__}-{key}.parquet")
            if fsutil.exists(spark, path):
                return spark.read.parquet(path)
            df = fn(spark, *args, **kwargs)
            df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)

        return wrapper

    return decorate


def sort_dims(df: DataFrame, dims, var_names=None) -> DataFrame:
    """Canonical column order: dims first (given order), then vars.

    Reference: ``sort_dims`` (``manage.py:230-247``) — in long format,
    dimension *transposition* is just column ordering.
    """
    dims = [d for d in dims if d in df.columns]
    if var_names is None:
        var_names = [c for c in df.columns if c not in dims]
    return df.select(*dims, *var_names)


def auto_xyz_df(spark: SparkSession, x, y, z=None) -> DataFrame:
    """Coerce raw x/y(/z) arrays into a long-format table.

    Reference: ``auto_xyz_ds`` (``manage.py:313-346``) — y (optionally
    2-d over z) is aligned against x by size, auto-transposing when
    the orientation is flipped.
    """
    import numpy as np

    x = np.asarray(x)
    y = np.asarray(y)
    if y.ndim == 1:
        if len(x) != len(y):
            raise ValueError(f"size mismatch: x{len(x)} vs y{len(y)}")
        rows = [(float(a), float(b)) for a, b in zip(x, y)]
        return spark.createDataFrame(rows, ["x", "y"])
    if y.ndim != 2:
        raise ValueError("y must be 1-d or 2-d")
    if z is None:
        z = np.arange(y.shape[0])
    z = np.asarray(z)
    if y.shape != (len(z), len(x)):
        if y.T.shape == (len(z), len(x)):
            y = y.T
        else:
            raise ValueError(
                f"shape mismatch: y{y.shape} vs (z{len(z)}, x{len(x)})"
            )
    rows = [
        (float(zv), float(xv), float(y[i, j]))
        for i, zv in enumerate(z)
        for j, xv in enumerate(x)
    ]
    return spark.createDataFrame(rows, ["z", "x", "y"])


def compact_table(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    sort_by=None,
) -> int:
    """Rewrite a parquet table into ~``target_file_mb`` files.

    Long-running stores accumulate small files — every harvest top-up,
    streaming micro-batch, or incremental append adds a few — and at
    cluster scale the resulting per-file open/footer overhead dominates
    scan time long before the data itself does.  Compaction is the
    standard maintenance pass: coalesce to ``ceil(bytes/target)`` files
    (optionally re-sorted so range predicates prune row groups) and
    republish atomically via the write-audit-publish swap used by the
    harvest stores.

    Returns the new file count.
    """
    total = fsutil.content_size(spark, path, ".parquet")
    n_files = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    attrs = load_attrs(path, spark) or None
    if sort_by is not None:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        # one range shuffle gives globally sorted output: min/max row-
        # group stats become disjoint, so predicate pushdown on the
        # sort key prunes whole files
        df = df.repartitionByRange(int(n_files), *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        df = df.coalesce(int(n_files))
    _publish_parquet(df, path, attrs)
    return int(n_files)
