#!/usr/bin/env python
"""Stage-attributed timing of the two streaming probe-then-extend
ingest gate rows (r13 optimization round, guide §1: measure first —
the top two bench rows, 15.1 s + 10.2 s in bench_r13_opt_before).

Replicates each gate's lifecycle with a wall timer around every
phase.  The stream run itself is one opaque wall (availableNow to
completion); the per-epoch internals are additionally attributed by
driving the EXACT sink code path sequentially (the pytest parity
tests pin stream == sequential loop bit-for-bit, so the sequential
attribution prices the same work).

    python tools/ingest_stages.py [sf_dir] [runs]
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xyzpy_spark.session import get_spark


def _timed(rec, key, fn):
    t0 = time.time()
    out = fn()
    rec[key] = round(time.time() - t0, 3)
    return out


def winnow_ingest_stages(spark, sf_dir, rec):
    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        save_winnow_index,
    )
    from xyzpy_spark.streaming.ops import winnow_ingest_stream

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .repartition(32)
    )
    hist = docs.where(F.col("doc_id") % 10 != 0)
    ep0 = docs.where(F.col("doc_id") % 20 == 0)
    ep1 = docs.where(F.col("doc_id") % 20 == 10)
    tmp = tempfile.mkdtemp(prefix="wingest_stages_")
    try:
        p = f"{tmp}/widx"

        def _build_save():
            index, dropped = build_winnow_index(
                hist, k=6, w=5, max_fp_freq=50, hash_fn="md5"
            )
            save_winnow_index(index, dropped, p, fp_buckets=32)

        _timed(rec, "build_save", _build_save)

        def _stage_src():
            src = f"{tmp}/src"
            ep0.coalesce(1).write.parquet(src)
            f0 = set(_glob.glob(src + "/*.parquet"))
            ep1.coalesce(1).write.mode("append").parquet(src)
            f1 = set(_glob.glob(src + "/*.parquet")) - f0
            now = time.time()
            for fp_ in f0:
                os.utime(fp_, (now - 100,) * 2)
            for fp_ in f1:
                os.utime(fp_, (now - 50,) * 2)
            return src

        src = _timed(rec, "stage_src", _stage_src)

        def _stream():
            st = (
                spark.readStream.schema(
                    spark.read.parquet(src).schema
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            winnow_ingest_stream(
                st, p, f"{tmp}/annotated", k=6, w=5, max_fp_freq=50,
                threshold=0.2, hash_fn="md5", state_partitions=8,
            )

        _timed(rec, "stream_run", _stream)

        def _readback():
            spark.read.parquet(f"{tmp}/annotated").select(
                "doc_id", "dup_kind", "dup_of", "fp_jaccard"
            ).write.format("noop").mode("overwrite").save()

        _timed(rec, "readback", _readback)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def dedup_ingest_stages(spark, sf_dir, rec):
    from xyzpy_spark.pipeline.dedup import (
        band_dedup_index,
        build_dedup_index,
        save_dedup_index,
    )
    from xyzpy_spark.streaming.ops import dedup_ingest_stream

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 10 != 0)
    ep0 = docs.where(F.col("doc_id") % 20 == 0)
    ep1 = docs.where(F.col("doc_id") % 20 == 10)
    tmp = tempfile.mkdtemp(prefix="dingest_stages_")
    try:
        p = f"{tmp}/didx"

        def _build_save():
            index = build_dedup_index(hist, n=2, hash_fn="md5")
            save_dedup_index(
                index,
                band_dedup_index(index, n=2, hash_fn="md5"),
                p,
                fp_buckets=16,
                bb_buckets=16,
            )

        _timed(rec, "build_save", _build_save)

        def _stage_src():
            src = f"{tmp}/src"
            ep0.coalesce(1).write.parquet(src)
            f0 = set(_glob.glob(src + "/*.parquet"))
            ep1.coalesce(1).write.mode("append").parquet(src)
            f1 = set(_glob.glob(src + "/*.parquet")) - f0
            now = time.time()
            for fp_ in f0:
                os.utime(fp_, (now - 100,) * 2)
            for fp_ in f1:
                os.utime(fp_, (now - 50,) * 2)
            return src

        src = _timed(rec, "stage_src", _stage_src)

        def _stream():
            st = (
                spark.readStream.schema(
                    spark.read.parquet(src).schema
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            dedup_ingest_stream(
                st, p, f"{tmp}/annotated", n=2, threshold=0.4,
                hash_fn="md5", state_partitions=8,
            )

        _timed(rec, "stream_run", _stream)

        def _readback():
            spark.read.parquet(f"{tmp}/annotated").select(
                "doc_id", "dup_kind", "dup_of", "est_jaccard"
            ).write.format("noop").mode("overwrite").save()

        _timed(rec, "readback", _readback)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def dedup_epoch_internals(spark, sf_dir, rec):
    """Sequential drive of the dedup_ingest sink's per-epoch stages
    (the parity-pinned twin of the stream loop) so each stage gets
    its own wall."""
    from xyzpy_spark.pipeline.dedup import (
        band_dedup_index,
        build_dedup_index,
        dedup_against_index,
        extend_dedup_index,
        load_dedup_index,
        save_dedup_index,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 10 != 0)
    eps = [
        docs.where(F.col("doc_id") % 20 == 0),
        docs.where(F.col("doc_id") % 20 == 10),
    ]
    tmp = tempfile.mkdtemp(prefix="dingest_internals_")
    try:
        p = f"{tmp}/didx"
        index = build_dedup_index(hist, n=2, hash_fn="md5")
        save_dedup_index(
            index,
            band_dedup_index(index, n=2, hash_fn="md5"),
            p,
            fp_buckets=16,
            bb_buckets=16,
        )
        for e, batch in enumerate(eps):
            ek = f"ep{e}"
            batch = _timed(
                rec, f"{ek}_stage_batch",
                lambda b=batch: b.localCheckpoint(eager=True),
            )
            idx, bands = _timed(
                rec, f"{ek}_load", lambda: load_dedup_index(spark, p)
            )
            batch_idx = _timed(
                rec, f"{ek}_sign",
                lambda b=batch: build_dedup_index(
                    b, n=2, hash_fn="md5"
                ).localCheckpoint(eager=True),
            )

            def _guard(bi=batch_idx, ix=idx):
                fps = bi.select(
                    "doc_id", F.col("fingerprint").alias("__fp")
                )
                return (
                    ix.join(F.broadcast(fps), "doc_id")
                    .where(F.col("fingerprint") != F.col("__fp"))
                    .limit(1)
                    .count()
                )

            _timed(rec, f"{ek}_guard", _guard)
            ids = batch.select("doc_id")
            idx2 = idx.join(F.broadcast(ids), "doc_id", "left_anti")
            bands2 = bands.join(F.broadcast(ids), "doc_id", "left_anti")

            def _probe(b=batch, ix=idx2, bd=bands2, bi=batch_idx):
                ann = dedup_against_index(
                    b, ix, index_bands=bd, cache=False,
                    prebuilt_index=bi, n=2, threshold=0.4,
                    hash_fn="md5",
                )
                ann.write.mode("overwrite").parquet(
                    os.path.join(tmp, f"annotated/epoch_id={e}")
                )

            _timed(rec, f"{ek}_probe_write", _probe)

            def _extend(b=batch, bi=batch_idx, e=e):
                novel_ids = (
                    spark.read.parquet(
                        os.path.join(tmp, f"annotated/epoch_id={e}")
                    )
                    .where(F.col("dup_kind").isNull())
                    .select("doc_id")
                )
                novel = b.join(
                    F.broadcast(novel_ids), "doc_id", "left_semi"
                ).select("doc_id", "text")
                extend_dedup_index(
                    novel, p,
                    prebuilt_index=bi.join(
                        F.broadcast(novel_ids), "doc_id", "left_semi"
                    ),
                )

            _timed(rec, f"{ek}_extend", _extend)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="ingest_stages")
    # warm the JVM (bench protocol is warm)
    spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).limit(100).write.format("noop").mode("overwrite").save()
    out = []
    for r in range(runs):
        rec: dict = {"run": r, "load_avg": round(os.getloadavg()[0], 2)}
        t0 = time.time()
        winnow_ingest_stages(spark, sf_dir, w := {})
        rec["winnow_ingest"] = w
        rec["winnow_total"] = round(time.time() - t0, 3)
        t0 = time.time()
        dedup_ingest_stages(spark, sf_dir, d := {})
        rec["dedup_ingest"] = d
        rec["dedup_total"] = round(time.time() - t0, 3)
        t0 = time.time()
        dedup_epoch_internals(spark, sf_dir, i := {})
        rec["dedup_internals"] = i
        rec["dedup_internals_total"] = round(time.time() - t0, 3)
        out.append(rec)
        print(json.dumps(rec))
    print(json.dumps({"runs": out}))


if __name__ == "__main__":
    main()
