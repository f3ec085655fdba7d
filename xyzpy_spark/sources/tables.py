"""Source layer: parquet/csv/json readers with schema normalization.

The reference's source matrix is netcdf/zarr/joblib datasets and
pickle/csv/hdf/json dataframes (``xyzpy/manage.py:32-37, 405-453``);
on Spark the primary store is parquet (driver testdata), with csv/json
as secondary formats.

One real-world wrinkle handled here: pandas-written parquet carries
INT64 TIMESTAMP(NANOS) columns, which Spark 4 refuses by default.  We
flip the legacy read conf (nanos arrive as raw int64) and rebuild a
proper ``timestamp_ntz`` column — truncation to micros matches what
any µs-based consumer (including DuckDB's python fetch) observes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import fsutil


def _read_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    try:
        df = spark.read.parquet(path)
        # force schema resolution now so the fallback can trigger
        df.schema  # noqa: B018
        return df
    except Exception as exc:  # noqa: BLE001
        if "NANOS" not in str(exc):
            raise
        # NOTE: session-wide side effect, kept deliberately — the conf
        # must still be set when the lazy plan executes, so it cannot
        # be scoped to this read.  Every later nanos-timestamp parquet
        # in the session reads as bigint; read_table normalizes the
        # tables listed in _NANOS_TS_COLS, others surface raw int64.
        import warnings

        warnings.warn(
            f"parquet at {path!r} carries NANOS timestamps: enabling "
            "spark.sql.legacy.parquet.nanosAsLong for the session — "
            "later nanos columns will read as bigint",
            RuntimeWarning,
            stacklevel=2,
        )
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


# tables whose ns-timestamp columns need rebuilding after nanosAsLong
_NANOS_TS_COLS = {"events": ["ts"]}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing timestamp columns."""
    df = _read_parquet_nanos_safe(
        spark, os.path.join(sf_dir, f"{name}.parquet")
    )
    for col in _NANOS_TS_COLS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(
                col,
                F.expr(f"cast(timestamp_micros({col} div 1000) as timestamp_ntz)"),
            )
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, names=None
) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the dict."""
    if names is None:
        names = (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split()
    out = {}
    for n in names:
        p = os.path.join(sf_dir, f"{n}.parquet")
        if fsutil.exists(spark, p):
            df = read_table(spark, sf_dir, n)
            df.createOrReplaceTempView(n)
            out[n] = df
    return out


def save_df(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """Write a result table (reference ``save_df``, ``manage.py:405-431``)."""
    df.write.mode("overwrite").format(fmt).options(**options).save(path)


def load_df(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    """Read a result table (reference ``load_df``, ``manage.py:434-453``)."""
    return spark.read.format(fmt).options(**options).load(path)


def save_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    by,
    sorted_by=None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table.

    Bucketing pre-shuffles the data ONCE at write time: every join or
    aggregation on the bucket key thereafter is co-located, so the
    repeated joins of a harvest/dedup workload skip their exchanges
    entirely (asserted in tests/test_plans.py).  Both sides of a join
    must use the same key and bucket count.  Requires ``saveAsTable``
    (bucket metadata lives in the catalog, not the files).
    """
    by = [by] if isinstance(by, str) else list(by)
    sorted_by = (
        by
        if sorted_by is None
        else [sorted_by]
        if isinstance(sorted_by, str)
        else list(sorted_by)
    )
    writer = (
        df.write.mode(mode).bucketBy(buckets, *by).sortBy(*sorted_by)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
