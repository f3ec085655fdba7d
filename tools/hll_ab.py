#!/usr/bin/env python
"""Same-session A/B of the r14 HLL scan fusion (r13 verdict ask #5).

Variant A = the r13 shapes, inlined:
  - batch: two independent hll_distinct passes over events (two scans)
  - stream: two concurrent hll_stream_distinct streams (one per column)
Variant B = the shipped r14 code:
  - batch: q_hll_distinct (ONE fused hll_registers_multi pass)
  - stream: q_stream_hll (ONE fused stream, kind-keyed state)

Parity-checks both variants' collected rows, then interleaves timed
runs (noop sink for the batch row; the stream row's own wrapper
materializes) with clearCache as untimed setup — the bench protocol.

    python tools/hll_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from xyzpy_spark.session import get_spark
from xyzpy_spark.functions.sketch import hll_distinct


def batch_a(spark, sf_dir):
    ev = entrymod._t(spark, sf_dir, "events")
    users = hll_distinct(ev, "user_id", "event_type", p=8).select(
        "event_type",
        F.col("registers_hit").alias("users_hit"),
        F.col("n_distinct_hll").alias("n_users_hll"),
    )
    events = hll_distinct(ev, "event_id", "event_type", p=8).select(
        "event_type",
        F.col("registers_hit").alias("events_hit"),
        F.col("n_distinct_hll").alias("n_events_hll"),
    )
    return users.join(events, "event_type")


def batch_c(spark, sf_dir):
    """Pivot shape: ONE fused register pass, ONE estimate grouped by
    (event_type, kind), pivot to columns — no persist, no join."""
    from xyzpy_spark.functions.sketch import (
        hll_estimate,
        hll_registers_multi,
    )

    ev = entrymod._t(spark, sf_dir, "events")
    est = hll_estimate(
        hll_registers_multi(
            ev, {"u": "user_id", "e": "event_id"}, "event_type", p=8
        ),
        ["event_type", "kind"],
        p=8,
    )
    u, e = F.col("kind") == "u", F.col("kind") == "e"
    out = (
        est.where(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(
            F.min(F.when(u, F.col("registers_hit"))).alias("users_hit"),
            F.min(F.when(u, F.col("n_distinct_hll"))).alias("n_users_hll"),
            F.min(F.when(e, F.col("registers_hit"))).alias("events_hit"),
            F.min(F.when(e, F.col("n_distinct_hll"))).alias(
                "n_events_hll"
            ),
        )
        .where(
            F.col("users_hit").isNotNull()
            & F.col("events_hit").isNotNull()
        )
    )
    return out.select(
        "event_type", "users_hit", "n_users_hll", "events_hit",
        "n_events_hll",
    )


def stream_a(spark, sf_dir):
    from concurrent.futures import ThreadPoolExecutor

    from xyzpy_spark.streaming.ops import (
        hll_stream_distinct,
        read_events_stream,
    )

    tmp = tempfile.mkdtemp(prefix="xyzpy_ab_hll_")
    try:
        def _run(kind_col):
            kind, col = kind_col
            out = f"{tmp}/{kind}/out"
            hll_stream_distinct(
                read_events_stream(spark, sf_dir),
                col,
                out,
                f"{tmp}/{kind}/state",
                by="event_type",
                p=8,
                state_partitions=8,
            )
            est = spark.read.parquet(out)
            last = est.agg(F.max("epoch_id")).first()[0]
            return kind, est.where(F.col("epoch_id") == last)

        with ThreadPoolExecutor(max_workers=2) as pool:
            parts = dict(
                pool.map(_run, (("u", "user_id"), ("e", "event_id")))
            )
        users = parts["u"].select(
            "event_type",
            F.col("registers_hit").alias("users_hit"),
            F.col("n_distinct_hll").alias("n_users_hll"),
        )
        events = parts["e"].select(
            "event_type",
            F.col("registers_hit").alias("events_hit"),
            F.col("n_distinct_hll").alias("n_events_hll"),
        )
        return entrymod._finish_local(
            spark, users.join(events, "event_type")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="hll_ab")
    queries = entrymod.queries()

    # parity: batch and stream, old vs new
    pa = sorted(map(tuple, batch_a(spark, sf_dir).collect()))
    spark.catalog.clearCache()
    pb = sorted(map(tuple, queries["hll_distinct"](spark, sf_dir).collect()))
    spark.catalog.clearCache()
    print("batch parity:", "OK" if pa == pb else "MISMATCH", len(pa))
    pc = sorted(map(tuple, batch_c(spark, sf_dir).collect()))
    spark.catalog.clearCache()
    print("pivot parity:", "OK" if pa == pc else "MISMATCH", len(pc))
    if pa != pc:
        sys.exit(1)
    sa = sorted(map(tuple, stream_a(spark, sf_dir).collect()))
    spark.catalog.clearCache()
    sb = sorted(map(tuple, queries["stream_hll"](spark, sf_dir).collect()))
    spark.catalog.clearCache()
    print("stream parity:", "OK" if sa == sb else "MISMATCH", len(sa))
    if pa != pb or sa != sb:
        sys.exit(1)

    units = (
        ("batchA", lambda: batch_a(spark, sf_dir)),
        ("batchB", lambda: queries["hll_distinct"](spark, sf_dir)),
        ("batchC", lambda: batch_c(spark, sf_dir)),
        ("streamA", lambda: stream_a(spark, sf_dir)),
        ("streamB", lambda: queries["stream_hll"](spark, sf_dir)),
    )
    for r in range(rounds):
        for name, fn in units:
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            print(
                f"run{r} {name}: {dt:.3f}s load={os.getloadavg()[0]:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
