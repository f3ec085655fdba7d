"""SparkSession helper tuned for the sweep workload.

Local testing runs ``local[N]``; the confs chosen here are the ones
that matter at cluster scale too: AQE for runtime re-planning (skew
joins, partition coalescing), Arrow for every pandas-UDF boundary,
and a shuffle-partition count sized for the box rather than the
200-partition default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xyzpy_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with sweep-friendly defaults.

    Parameters mirror what a cluster deployment would set via
    ``spark-submit``; in-process tests call this with defaults.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", max(cpus, 8))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow on every pandas <-> JVM boundary (the UDF harness).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Timestamps in testdata are ns-precision; keep them faithful.
        .config("spark.sql.session.timeZone", "UTC")
        # pandas-written parquet carries INT64 TIMESTAMP(NANOS) which
        # Spark 4 refuses by default; accept as int64 up front so the
        # first events.parquet read doesn't burn a failed schema job
        # (sources.read_table rebuilds proper timestamp_ntz columns).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Quieter local runs.
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
