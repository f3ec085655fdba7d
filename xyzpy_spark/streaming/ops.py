"""Structured Streaming operators over the events stream.

The reference is batch-only; its nearest streaming analogs are
incremental harvesting (merge per run), ``Reaper(wait=True)`` polling,
and convergence-driven sampling (SURVEY §2.7 "Streaming").  This
module is the Structured-Streaming story those patterns point at:

- tumbling/sliding windowed aggregation with watermarked late-data
  handling (``windowed_agg``),
- session windows (``sessionize_stream`` — the streaming twin of the
  batch ``user_sessions`` query),
- incremental Welford statistics (``streaming_running_stats`` — the
  streaming twin of ``RunningStatistics``; Spark's agg state IS the
  Welford accumulator, maintained per trigger).

Tests drive these with a file source over the parquet testdata and
``trigger(availableNow=True)`` into a memory sink, then assert exact
equality with the batch equivalents — the streaming plans are the same
logical plans, so batch parity is the correctness oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import read_table


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The events table as a file-source stream.

    Parquet file source with an explicit schema (streams cannot infer);
    the ns-timestamp column is rebuilt exactly as the batch reader does,
    so batch and stream plans see identical data.
    """
    # batch-probe the schema (streams cannot infer); read_table also
    # flips the nanosAsLong conf when the file carries ns timestamps
    read_table(spark, sf_dir, "events")
    reader = spark.readStream.schema(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the file source needs a directory; select just the events file
    raw = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    if dict(raw.dtypes).get("ts") == "bigint":
        # plain TIMESTAMP (not NTZ): watermarks require an event-time
        # column with timezone semantics; session tz is pinned to UTC
        # so wall values match the batch reader's NTZ column exactly.
        raw = raw.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return raw


def windowed_agg(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    by=("event_type",),
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation.

    Late rows beyond ``watermark`` are dropped and window state is
    evicted — the property that lets this run forever at 100 TB/day.
    """
    w = (
        F.window("ts", window, slide)
        if slide
        else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), *by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *by,
            "n",
            "sum_value",
            "avg_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    silence (streaming twin of the batch lag-based sessionization)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_running_stats(
    events: DataFrame, var: str = "value", by=("event_type",)
) -> DataFrame:
    """Incrementally-maintained mean/std/err per group.

    Spark keeps (count, sum, M2)-style state across triggers — the
    distributed Welford update — so the result after any prefix of the
    stream equals the batch statistics over that prefix.
    """
    cnt = F.count(var).cast("double")
    return events.groupBy(*by).agg(
        F.count(var).alias("count"),
        F.avg(var).alias("mean"),
        F.stddev_samp(var).alias("std"),
        (F.stddev_samp(var) / F.sqrt(cnt)).alias("err"),
    )


def run_stream_to_memory(
    df: DataFrame,
    name: str,
    *,
    output_mode: str = "complete",
    timeout: int = 120,
) -> DataFrame:
    """Execute a streaming plan to completion over available data.

    ``trigger(availableNow=True)`` processes everything currently in
    the source then stops — the batch-parity harness used by tests.
    Returns the memory-sink table.
    """
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout)
        q.stop()
    return df.sparkSession.table(name)
