#!/usr/bin/env python
"""Interleaved same-session A/B for the r13 dsir_weights rewrite.

A = the OLD wiring (raw pool's feature stream derived twice: once for
the q-model fit, once for scoring), inlined below exactly as dsir.py
had it before this round.  B = the new shared persisted bucketed
stream (`dsir_weights` at HEAD).  Alternates A,B,A,B,... in ONE Spark
session with `spark.catalog.clearCache()` between runs so box-epoch
drift cannot masquerade as a win, checks the row multisets are
identical, and prints per-run wall seconds (construction + count jobs
+ noop action — the same work the gate row pays).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from xyzpy_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def old_dsir_weights(raw_df, target_df, *, n_buckets, n=2, add_k=0.5,
                     text_col="text", id_col="doc_id"):
    from xyzpy_spark.pipeline.dsir import (
        _bucket,
        _bucketed_feats,
        _counts_from_feats,
        dsir_bucket_counts,
        _feature_stream,
    )
    from xyzpy_spark.pipeline.text import _round_det

    p_counts, p_total = dsir_bucket_counts(
        target_df, n_buckets=n_buckets, n=n,
        text_col=text_col, id_col=id_col)
    q_counts, q_total = dsir_bucket_counts(
        raw_df, n_buckets=n_buckets, n=n,
        text_col=text_col, id_col=id_col)
    k = float(add_k)
    kb = k * n_buckets
    ratio = (
        q_counts.join(p_counts.withColumnRenamed("cnt", "p_cnt"),
                      "bucket", "left")
        .select(
            "bucket",
            (
                F.log(F.coalesce(F.col("p_cnt"), F.lit(0)).cast("double")
                      + F.lit(k))
                - F.log(F.lit(float(p_total) + kb))
                - F.log(F.col("cnt").cast("double") + F.lit(k))
                + F.log(F.lit(float(q_total) + kb))
            ).alias("lr"),
        )
    )
    ratio = F.broadcast(ratio)
    feats = _feature_stream(raw_df, id_col, text_col, n).select(
        "__doc", _bucket(F.col("ngram"), n_buckets).alias("bucket")
    )
    return (
        feats.join(ratio, "bucket")
        .groupBy("__doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lr").alias("__lw"),
        )
        .select(
            F.col("__doc").alias(id_col),
            "n_feats",
            _round_det(F.col("__lw")).alias("logw"),
        )
    )


def main():
    spark = get_spark(app_name="dsir_ab")
    spark.sparkContext.setJobDescription("dsir_ab")

    def split():
        docs = entrymod._t(spark, SF_DIR, "documents")
        target = docs.where(F.col("doc_id") % 10 == 0)
        raw = docs.where(F.col("doc_id") % 10 != 0)
        return raw, target

    def run(kind):
        spark.catalog.clearCache()
        raw, target = split()
        t0 = time.monotonic()
        if kind == "A":
            df = old_dsir_weights(raw, target, n_buckets=1024)
        else:
            from xyzpy_spark.pipeline.dsir import dsir_weights
            df = dsir_weights(raw, target, n_buckets=1024)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0, df

    # parity once at the start
    _, da = run("A")
    _, db = run("B")
    rows_a = sorted(map(tuple, da.collect()))
    rows_b = sorted(map(tuple, db.collect()))
    print("identical =", rows_a == rows_b, f"({len(rows_a)} rows)")

    times = {"A": [], "B": []}
    for i in range(ROUNDS):
        for kind in ("A", "B"):
            sec, _ = run(kind)
            times[kind].append(sec)
            print(f"{kind} run {i}: {sec:.2f}s", flush=True)
    for kind in ("A", "B"):
        ts = sorted(times[kind])
        print(f"{kind}: median {ts[len(ts) // 2]:.2f}s  all "
              + " ".join(f"{t:.2f}" for t in times[kind]))


if __name__ == "__main__":
    main()
