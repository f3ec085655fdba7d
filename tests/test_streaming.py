import pytest
from pyspark.sql import functions as F

from xyzpy_spark.sources.tables import read_table
from xyzpy_spark.streaming.ops import (
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    streaming_running_stats,
    windowed_agg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return read_table(spark, SF_DIR, "events")


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, SF_DIR)


def test_stream_is_streaming(events_stream):
    assert events_stream.isStreaming


def test_windowed_agg_matches_batch(spark, events_batch, events_stream):
    """Streaming windowed agg over availableNow == batch groupBy."""
    got = run_stream_to_memory(
        windowed_agg(events_stream, window="1 hour"), "win_agg"
    ).collect()
    want = (
        events_batch.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
            "avg_value",
        )
        .collect()
    )
    key = lambda r: (r["window_start"], r["event_type"])
    got_m = {key(r): (r["n"], round(r["sum_value"], 6)) for r in got}
    want_m = {key(r): (r["n"], round(r["sum_value"], 6)) for r in want}
    assert got_m == want_m
    assert len(got_m) > 10


def test_sliding_window(spark, events_stream):
    out = run_stream_to_memory(
        windowed_agg(events_stream, window="2 hours", slide="1 hour"),
        "slide_agg",
    )
    rows = out.collect()
    assert len(rows) > 0
    # every event lands in exactly 2 sliding windows
    total_batch = 1000
    assert sum(r["n"] for r in rows if r["event_type"] is not None) == 2 * total_batch


def test_sessionize_stream(spark, events_batch, events_stream):
    got = run_stream_to_memory(
        sessionize_stream(events_stream, gap="30 minutes"), "sessions"
    )
    # session count per user must match the batch lag-based count
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    batch_sessions = (
        events_batch.select(
            "user_id",
            (
                F.lag("ts").over(w).isNull()
                | (
                    F.col("ts") - F.lag("ts").over(w)
                    > F.expr("INTERVAL '30' MINUTE")
                )
            ).cast("long").alias("s"),
        )
        .groupBy("user_id")
        .agg(F.sum("s").alias("n_sessions"))
    )
    got_counts = {
        r["user_id"]: r["cnt"]
        for r in got.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    want_counts = {
        r["user_id"]: r["n_sessions"] for r in batch_sessions.collect()
    }
    assert got_counts == want_counts


def test_streaming_running_stats_matches_batch(
    spark, events_batch, events_stream
):
    got = run_stream_to_memory(
        streaming_running_stats(events_stream), "rstats"
    ).collect()
    want = {
        r["event_type"]: r
        for r in events_batch.groupBy("event_type")
        .agg(
            F.count("value").alias("count"),
            F.avg("value").alias("mean"),
            F.stddev_samp("value").alias("std"),
        )
        .collect()
    }
    assert len(got) == len(want)
    for r in got:
        w = want[r["event_type"]]
        assert r["count"] == w["count"]
        assert r["mean"] == pytest.approx(w["mean"])
        assert r["std"] == pytest.approx(w["std"])


def test_stateful_running_stats_multi_trigger_parity(spark, events_batch, tmp_path):
    """Explicit-state Welford across SEVERAL triggers == one-pass batch
    statistics: split events into 4 files, feed one file per trigger,
    take each key's LAST update."""
    import os

    from xyzpy_spark.streaming.ops import stateful_running_stats

    src = str(tmp_path / "ev_parts")
    events_batch.select("event_type", "value").repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_stream_to_memory(
        stateful_running_stats(stream, "value", by=("event_type",)),
        "stateful_stats",
        output_mode="update",
    )
    # update-mode sink appends one row per key per trigger that saw the
    # key; the final state is the last row (memory sink preserves order)
    pdf = out.toPandas()
    final = pdf.groupby("event_type").last()
    want = {
        r["event_type"]: r
        for r in events_batch.groupBy("event_type")
        .agg(
            F.count("value").alias("count"),
            F.avg("value").alias("mean"),
            F.stddev_samp("value").alias("std"),
        )
        .collect()
    }
    assert set(final.index) == set(want)
    n_triggers = pdf.groupby("event_type").size()
    assert (n_triggers > 1).all(), "state must be exercised across triggers"
    for k, row in final.iterrows():
        assert row["count"] == want[k]["count"]
        assert abs(row["mean"] - want[k]["mean"]) < 1e-9
        assert abs(row["std"] - want[k]["std"]) < 1e-9


def test_corpus_scrub_composes_with_streams(spark):
    """The map-only corpus stack (scrub_pii + quality) is
    stream-composable as-is: running it over a documents file stream
    must equal the batch result row for row."""
    import os

    from xyzpy_spark.pipeline.text import add_quality, scrub_pii

    batch = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    want = {
        r["doc_id"]: (r["text"], r["n_email"], r["quality"])
        for r in add_quality(scrub_pii(batch)).collect()
    }
    stream = (
        spark.readStream.schema(
            spark.read.parquet(
                os.path.join(SF_DIR, "documents.parquet")
            ).schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .select("doc_id", "text")
    )
    out = run_stream_to_memory(
        add_quality(scrub_pii(stream)),
        "scrub_stream_t",
        output_mode="append",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_email"], r["quality"])
        for r in out.collect()
    }
    assert got == want


def test_multimodal_features_compose_with_streams(spark):
    """The Arrow-batched multimodal stages (attach/decode/resize/
    features are all mapInPandas) are stream-composable as-is: a
    documents file stream through decode+features must equal the
    batch result row for row — the shape of a streaming media-ingest
    pipeline."""
    import os

    from pyspark.sql import functions as F

    from xyzpy_spark.pipeline.multimodal import (
        attach_sample_png,
        image_features,
        resize_image,
    )

    def pipe(df):
        feat = image_features(attach_sample_png(df))
        rz = resize_image(feat, 2, 2)
        return rz.select(
            "doc_id",
            F.col("img.n_pixels").alias("n_pixels"),
            F.col("img.mean_pixel").alias("mean_pixel"),
            F.aggregate(
                "resized.pixels", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("rz_sum"),
        )

    batch = read_table(spark, SF_DIR, "documents").select("doc_id")
    want = {
        r["doc_id"]: (r["n_pixels"], r["mean_pixel"], r["rz_sum"])
        for r in pipe(batch).collect()
    }
    stream = (
        spark.readStream.schema(
            spark.read.parquet(
                os.path.join(SF_DIR, "documents.parquet")
            ).schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .select("doc_id")
    )
    out = run_stream_to_memory(
        pipe(stream), "media_stream_t", output_mode="append"
    )
    got = {
        r["doc_id"]: (r["n_pixels"], r["mean_pixel"], r["rz_sum"])
        for r in out.collect()
    }
    assert got == want and len(got) > 0


def test_dedup_stream_drops_duplicate_arrivals(spark, events_batch, events_stream):
    from xyzpy_spark.streaming.ops import dedup_stream

    # at-least-once delivery: every event arrives twice
    doubled = events_stream.union(events_stream)
    out = run_stream_to_memory(
        dedup_stream(doubled, keys="event_id", watermark="1 hour"),
        "dedup_stream_t",
        output_mode="append",
    )
    n_unique = events_batch.select("event_id").distinct().count()
    assert out.count() == n_unique
    # every key exactly once
    assert (
        out.groupBy("event_id").count().where(F.col("count") > 1).count() == 0
    )


def test_windowed_agg_custom_aggs(spark, events_stream):
    """The aggs override (used by the stream_window_hourly contract
    query for decimal-exact sums) flows through to the output."""
    out = run_stream_to_memory(
        windowed_agg(
            events_stream,
            window="1 hour",
            aggs=[
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
            ],
        ),
        "win_agg_custom",
    )
    assert set(out.columns) == {
        "window_start", "window_end", "event_type", "n", "sum_value",
    }
    assert out.count() > 0


def test_no_exact_gap_boundary_in_testdata(spark, events_batch):
    """Precondition for oracle-checking streaming session_window
    against the lag-based SQL twin: the two session formulations
    disagree only when an inter-event gap equals the session gap
    exactly — assert the data has no such boundary collision."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = events_batch.select(
        (F.col("ts") - F.lag("ts").over(w)).alias("gap")
    )
    n = gaps.where(F.col("gap") == F.expr("INTERVAL '30' MINUTE")).count()
    assert n == 0


def test_windowed_agg_column_typed_keys(spark, events_stream):
    """Group keys may be Column objects, not just names."""
    out = run_stream_to_memory(
        windowed_agg(events_stream, by=(F.col("event_type"),)),
        "win_agg_colkeys",
    )
    assert "event_type" in out.columns and out.count() > 0


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Durability: a dedup stream with a persistent checkpoint is
    stopped and RESTARTED with more data, including duplicates of keys
    first seen before the stop.  Recovered state must still drop them,
    the file sink must not double-write phase-1 output, and an idle
    third restart must append nothing (exactly-once end to end)."""
    import datetime as dt
    import os

    from xyzpy_spark.streaming.ops import dedup_stream

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def event(i, phase):
        # value is a pure function of the id, so whichever arrival is
        # kept the surviving row is identical
        return (i, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=i), float(i) * 1.5, phase)

    cols = ["event_id", "ts", "value", "phase"]
    phase1 = [event(i, 1) for i in range(50)] + [event(i, 1) for i in range(0, 50, 5)]
    phase2 = [event(i, 2) for i in range(30, 80)]  # 30..49 replay phase-1 keys

    def run_once(rows):
        if rows:
            spark.createDataFrame(rows, cols).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        deduped = dedup_stream(stream, keys="event_id", watermark="24 hours")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish"
        q.stop()
        return spark.read.parquet(sink)

    out1 = run_once(phase1)
    assert out1.count() == 50  # in-phase dups dropped
    out2 = run_once(phase2)
    rows = out2.groupBy("event_id").count().collect()
    assert len(rows) == 80  # ids 0..79 exactly once
    assert all(r["count"] == 1 for r in rows)  # replayed keys dropped by RESTORED state
    # phase-1 rows were not rewritten by the restart
    kept = {r["event_id"]: r["phase"] for r in spark.read.parquet(sink).collect()}
    assert all(kept[i] == 1 for i in range(30, 50))  # first arrival won
    assert all(kept[i] == 2 for i in range(50, 80))
    # idle restart: no new data -> nothing appended
    out3 = run_once([])
    assert out3.count() == 80


def test_curate_stream_matches_batch_gates(spark):
    """The stateless curation gates must produce IDENTICAL results
    through the real streaming engine (append mode, availableNow) and
    the batch plan — zero state means batch/stream parity is exact."""
    from xyzpy_spark.pipeline.text import add_quality, filter_blocklist
    from xyzpy_spark.streaming.ops import (
        curate_stream,
        read_documents_stream,
        run_stream_to_memory,
    )

    sf = "/root/testdata/sf0.001"
    streamed = run_stream_to_memory(
        curate_stream(
            read_documents_stream(spark, sf),
            min_tokens=20,
            min_quality=0.5,
            blocklist=["merge"],
            max_block_hits=1,
        ).select("doc_id", "n_tokens", "quality"),
        "t_curate_stream",
        output_mode="append",
    )
    batch = spark.read.parquet(sf + "/documents.parquet")
    want = filter_blocklist(
        add_quality(batch)
        .where((F.col("n_tokens") >= 20) & (F.col("quality") >= 0.5)),
        ["merge"],
        max_hits=1,
    ).select("doc_id", "n_tokens", "quality")
    got = sorted(tuple(r) for r in streamed.collect())
    exp = sorted(tuple(r) for r in want.collect())
    assert got == exp and len(got) > 0


def test_curate_quality_model_gate_stream_batch_parity(spark):
    """The trained-quality gate keeps the same documents through
    curate_stream (rowwise scorer, real engine) and curate_corpus
    (broadcast-join scorer) — the two serving paths agree on keep
    decisions for the same model."""
    from xyzpy_spark.pipeline.curate import curate_corpus
    from xyzpy_spark.pipeline.text import train_quality_classifier
    from xyzpy_spark.streaming.ops import (
        curate_stream,
        read_documents_stream,
        run_stream_to_memory,
    )

    sf = "/root/testdata/sf0.001"
    batch_docs = spark.read.parquet(sf + "/documents.parquet")
    labeled = batch_docs.limit(40).select(
        "doc_id", "text", (F.col("doc_id") % 2).cast("int").alias("label")
    )
    model = train_quality_classifier(labeled, n_buckets=1 << 14)

    streamed = run_stream_to_memory(
        curate_stream(
            read_documents_stream(spark, sf),
            min_tokens=20,
            min_quality=0.5,
            quality_model=model,
        ).select("doc_id"),
        "t_curate_quality_stream",
        output_mode="append",
    )
    batch = curate_corpus(
        batch_docs,
        dedup=None,
        min_tokens=20,
        min_quality=0.5,
        max_top_bigram_frac=None,
        quality_model=model,
    )
    got = sorted(r["doc_id"] for r in streamed.collect())
    exp = sorted(r["doc_id"] for r in batch.select("doc_id").collect())
    assert got == exp and 0 < len(got) < batch_docs.count()
    with pytest.raises(ValueError, match="quality_model"):
        curate_stream(batch_docs, quality_model=(model[0],))


def test_curate_gates_reject_model_without_languages(spark):
    """Passing langid_model= without languages= must raise in BOTH
    the batch and stream curators — silently skipping the gate would
    let every language through while the caller believes the trained
    classifier is active (r6 review catch)."""
    import pytest

    from xyzpy_spark.pipeline.curate import curate_corpus
    from xyzpy_spark.streaming.ops import curate_stream

    docs = spark.createDataFrame([(1, "hello")], "doc_id LONG, text STRING")
    weights = spark.createDataFrame(
        [("en", 1, 0.5, 4096, 3)],
        "lang string, bucket long, weight double, n_buckets long, ngram int",
    )
    with pytest.raises(ValueError, match="languages"):
        curate_corpus(docs, langid_model=(weights, {"en": 0.0}))
    with pytest.raises(ValueError, match="languages"):
        curate_stream(docs, langid_model=(weights, {"en": 0.0}))


def test_curate_stream_langid_gate_matches_batch(spark):
    """The streaming language-ID gate (trained model served through
    the map-literal row-wise scorer) must keep exactly the documents
    the batch broadcast-join gate keeps — stream/batch parity for the
    r5-verdict streaming-gate seam."""
    import __spark_entry__ as em
    from xyzpy_spark.pipeline.text import add_quality, score_langid_trained
    from xyzpy_spark.streaming.ops import (
        curate_stream,
        read_documents_stream,
        run_stream_to_memory,
    )

    weights = spark.createDataFrame(
        [(lang, b, w, 4096, 3, "md5") for lang, b, w in em._langid_frozen_rows()],
        "lang string, bucket long, weight double, "
        "n_buckets long, ngram int, hash_fn string",
    )
    icepts = dict(em._LANGID_FROZEN_INTERCEPTS)
    langs = ("en", "de")
    sf = "/root/testdata/sf0.001"
    streamed = run_stream_to_memory(
        curate_stream(
            read_documents_stream(spark, sf),
            min_tokens=20,
            min_quality=0.5,
            languages=langs,
            langid_model=(weights, icepts),
        ).select("doc_id", "n_tokens", "quality"),
        "t_curate_stream_langid",
        output_mode="append",
    )
    batch = add_quality(
        spark.read.parquet(sf + "/documents.parquet")
    ).where((F.col("n_tokens") >= 20) & (F.col("quality") >= 0.5))
    want = (
        score_langid_trained(batch, weights, icepts)
        .where(F.col("lang_pred").isin(*langs))
        .select("doc_id", "n_tokens", "quality")
    )
    got = sorted(tuple(r) for r in streamed.collect())
    exp = sorted(tuple(r) for r in want.collect())
    assert got == exp and 0 < len(got) < batch.count()


def test_interval_join_stream_matches_batch_inner(spark):
    """STREAM-STREAM interval join (watermarked, time-range-bounded)
    must emit exactly the batch inner range-join pairs — inner
    matches emit on arrival, not on watermark, so availableNow replay
    is lossless."""
    from xyzpy_spark.operators.temporal import range_join
    from xyzpy_spark.streaming.ops import (
        interval_join_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    sf = "/root/testdata/sf0.001"
    ev_s = read_events_stream(spark, sf)
    errors_s = ev_s.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks_s = ev_s.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    streamed = run_stream_to_memory(
        interval_join_stream(
            errors_s, clicks_s,
            lower="0 seconds", upper="15 minutes",
        ).select("l_event_id", "user_id", "r_ts", "r_value"),
        "t_interval_join",
        output_mode="append",
    )
    from xyzpy_spark.sources.tables import read_table

    ev = read_table(spark, sf, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    want = range_join(
        errors, clicks, on="ts", by="user_id",
        lower=F.expr("INTERVAL '0' SECOND"),
        upper=F.expr("INTERVAL '15' MINUTE"),
        how="inner",
    ).select(
        F.col("event_id").alias("l_event_id"), "user_id",
        "r_ts", "r_value",
    )
    got = sorted(tuple(r) for r in streamed.collect())
    exp = sorted(tuple(r) for r in want.collect())
    assert got == exp and len(got) > 0


def test_dedup_stream_against_index_matches_batch(spark, tmp_path):
    """Continuous-ingest dedup: the foreachBatch probe over a file
    stream must annotate exactly like the batch operator against the
    same saved index — one code path, parity by construction, but the
    wiring (static index + streamed batches + append sink +
    availableNow) is what this test drives end to end."""
    from xyzpy_spark.pipeline.dedup import (
        band_dedup_index,
        build_dedup_index,
        dedup_against_index,
    )
    from xyzpy_spark.streaming.ops import (
        dedup_stream_against_index,
        read_documents_stream,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet")
    # historical corpus = 70% of docs; the stream replays the full
    # table as "new" ingest (so exact dups of history MUST be flagged)
    hist = docs.where(F.col("doc_id") % 10 < 7)
    idx_path = str(tmp_path / "index")
    build_dedup_index(hist, n=2, hash_fn="md5").write.parquet(
        idx_path + "/main"
    )
    index = spark.read.parquet(idx_path + "/main")
    band_dedup_index(index, n=2, hash_fn="md5").write.parquet(
        idx_path + "/bands"
    )
    bands = spark.read.parquet(idx_path + "/bands")

    out_path = str(tmp_path / "annotated")
    dedup_stream_against_index(
        read_documents_stream(spark, sf),
        index,
        out_path,
        index_bands=bands,
        n=2,
        hash_fn="md5",
        threshold=0.5,
    )
    got = {
        r["doc_id"]: (r["dup_kind"], r["dup_of"], r["est_jaccard"])
        for r in spark.read.parquet(out_path).select(
            "doc_id", "dup_kind", "dup_of", "est_jaccard"
        ).collect()
    }
    want = {
        r["doc_id"]: (r["dup_kind"], r["dup_of"], r["est_jaccard"])
        for r in dedup_against_index(
            docs, index, index_bands=bands, n=2, hash_fn="md5",
            threshold=0.5,
        ).select("doc_id", "dup_kind", "dup_of", "est_jaccard").collect()
    }
    assert got == want
    assert sum(1 for k, _, _ in got.values() if k == "exact") >= 1

    # idempotent sink (r6 advice): a full REPLAY of the same source —
    # what a restart after a crashed-but-written micro-batch does —
    # must overwrite its epoch partitions in place, never append
    # duplicates.  Fresh default checkpoint => epochs renumber from 0,
    # which is exactly the at-least-once rerun case.
    n_once = spark.read.parquet(out_path).count()
    dedup_stream_against_index(
        read_documents_stream(spark, sf),
        index,
        out_path,
        index_bands=bands,
        n=2,
        hash_fn="md5",
        threshold=0.5,
    )
    again = spark.read.parquet(out_path)
    assert again.count() == n_once
    assert "epoch_id" in again.columns
    got2 = {
        r["doc_id"]: (r["dup_kind"], r["dup_of"], r["est_jaccard"])
        for r in again.select(
            "doc_id", "dup_kind", "dup_of", "est_jaccard"
        ).collect()
    }
    assert got2 == want


def test_stateful_stats_all_null_key_matches_sql(spark, tmp_path):
    """A key whose values are all NULL must emit count=0 with NULL
    mean/std/err — SQL aggregate semantics — never mean=0.0 (r5
    code-review finding)."""
    import pandas as pd

    from xyzpy_spark.streaming.ops import (
        read_events_stream,
        run_stream_to_memory,
        stateful_running_stats,
    )

    src = str(tmp_path / "sf")
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2026-01-01", "2026-01-01", "2026-01-01"]
            ),
            "user_id": [1, 1, 2],
            "event_type": ["nullish", "nullish", "ok"],
            "value": [None, None, 1.5],
            "props": ["{}", "{}", "{}"],
        }
    )
    df = spark.createDataFrame(pdf)
    import os

    os.makedirs(src, exist_ok=True)
    df.write.mode("overwrite").parquet(
        os.path.join(src, "events.parquet")
    )
    ev = read_events_stream(spark, src)
    out = run_stream_to_memory(
        stateful_running_stats(ev),
        "t_stateful_nulls",
        output_mode="update",
    )
    rows = {r["event_type"]: r for r in out.collect()}
    assert rows["nullish"]["count"] == 0.0
    assert rows["nullish"]["mean"] is None
    assert rows["nullish"]["std"] is None
    assert rows["ok"]["count"] == 1.0 and rows["ok"]["mean"] == 1.5


def test_stream_source_reads_directory_shaped_tables(spark, tmp_path):
    """Spark-written tables are DIRECTORIES of part files; the stream
    source must read them (the old pathGlobFilter-on-parent form
    matched only leaf names and streamed zero files — the r5 scale
    rows measured an empty source)."""
    import os

    from xyzpy_spark.streaming.ops import (
        read_events_stream,
        run_stream_to_memory,
        streaming_running_stats,
    )

    src = str(tmp_path / "sfdir")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.limit(100).repartition(3).write.mode("overwrite").parquet(
        os.path.join(src, "events.parquet")
    )
    stream = read_events_stream(spark, src)
    out = run_stream_to_memory(
        streaming_running_stats(stream), "t_dir_shape"
    )
    assert out.agg({"count": "sum"}).collect()[0][0] == 100


def test_winnow_stream_against_index_matches_batch(spark, tmp_path):
    """Continuous-ingest WINNOWED dedup: the foreachBatch probe over
    a file stream must annotate exactly like the batch operator
    against the same saved index (one code path), through the
    epoch-idempotent sink."""
    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        winnow_against_index,
    )
    from xyzpy_spark.streaming.ops import (
        read_documents_stream,
        winnow_stream_against_index,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet")
    hist = docs.where(F.col("doc_id") % 10 < 7)
    idx_path = str(tmp_path / "windex")
    index_df, dropped_df = build_winnow_index(
        hist, k=6, w=5, max_fp_freq=50, hash_fn="md5"
    )
    index_df.write.parquet(idx_path + "/main")
    dropped_df.write.parquet(idx_path + "/dropped")
    index = spark.read.parquet(idx_path + "/main")
    dropped = spark.read.parquet(idx_path + "/dropped")

    out_path = str(tmp_path / "annotated")
    winnow_stream_against_index(
        read_documents_stream(spark, sf),
        index,
        out_path,
        dropped=dropped,
        k=6,
        w=5,
        max_fp_freq=50,
        hash_fn="md5",
        threshold=0.2,
    )
    got = {
        r["doc_id"]: (r["dup_kind"], r["dup_of"], r["fp_jaccard"])
        for r in spark.read.parquet(out_path).select(
            "doc_id", "dup_kind", "dup_of", "fp_jaccard"
        ).collect()
    }
    want = {
        r["doc_id"]: (r["dup_kind"], r["dup_of"], r["fp_jaccard"])
        for r in winnow_against_index(
            docs, index, dropped=dropped, k=6, w=5, max_fp_freq=50,
            hash_fn="md5", threshold=0.2,
        ).collect()
    }
    assert got == want
    # history replayed through the stream must self-match at 1.0
    assert sum(
        1 for k_, _, j in got.values() if k_ == "near" and j == 1.0
    ) >= 1


def test_ann_stream_topk_matches_batch(spark, tmp_path):
    """Streaming ANN serving: a query-vector file stream probed
    against a static IVF-assigned corpus via foreachBatch must return
    exactly the batch ivf_topk results (one code path), through the
    epoch-idempotent sink — the serve side of the save_ivf artifact
    workflow."""
    from xyzpy_spark.pipeline.similarity import ivf_build, ivf_topk
    from xyzpy_spark.streaming.ops import (
        ann_stream_topk,
        read_embeddings_stream,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(sf + "/embeddings.parquet")
    assigned, cents = ivf_build(emb, n_cells=8, kmeans_iters=1)
    assigned = assigned.persist()
    out = str(tmp_path / "matches")
    ann_stream_topk(
        read_embeddings_stream(spark, sf).where(F.col("vec_id") < 8),
        assigned,
        cents,
        out,
        k=5,
        nprobe=4,
    )
    got = sorted(
        (r["query_id"], r["nbr_id"], r["rank"], round(r["cosine"], 9))
        for r in spark.read.parquet(out).select(
            "query_id", "nbr_id", "rank", "cosine"
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["nbr_id"], r["rank"], round(r["cosine"], 9))
        for r in ivf_topk(
            assigned, cents, emb.where(F.col("vec_id") < 8), k=5, nprobe=4
        ).collect()
    )
    assigned.unpersist()
    assert got == want and len(got) == 8 * 5


def test_bm25_stream_search_matches_batch(spark, tmp_path):
    """Streaming corpus search: a query stream probed against the
    saved BM25 index via foreachBatch must rank exactly like the
    batch index probe (one code path), through the epoch-idempotent
    sink."""
    from xyzpy_spark.pipeline.ir import (
        bm25_against_index,
        build_bm25_index,
    )
    from xyzpy_spark.streaming.ops import bm25_stream_search

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet").select(
        "doc_id", "text"
    )
    idx_path = str(tmp_path / "bm25")
    build_bm25_index(docs).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    queries = spark.createDataFrame(
        [(1, ["spark", "shuffle"]), (2, ["join", "hash", "scan"]),
         (3, ["window"])],
        "query_id long, terms array<string>",
    )
    qsrc = str(tmp_path / "queries")
    queries.write.parquet(qsrc)
    qstream = spark.readStream.schema(
        spark.read.parquet(qsrc).schema
    ).parquet(qsrc)

    out = str(tmp_path / "hits")
    bm25_stream_search(qstream, index, out, top_k=5)
    got = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in spark.read.parquet(out).select(
            "query_id", "doc_id", "score", "rank"
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_against_index(queries, index, top_k=5).collect()
    )
    assert got == want and len(got) > 0


def test_cap_stream_per_group_single_epoch_matches_batch(
    spark, tmp_path
):
    """Streaming domain capping (r7 verdict ask #7): with all data in
    one micro-batch the admitted set must be EXACTLY cap_per_group —
    shared _group_rank, one selection rule, two engine paths."""
    from xyzpy_spark.pipeline.sampling import cap_per_group
    from xyzpy_spark.streaming.ops import cap_stream_per_group

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet").select(
        "doc_id", "source", "text"
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    schema = spark.read.parquet(src).schema
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    cap_stream_per_group(
        spark.readStream.schema(schema).parquet(src),
        25,
        out,
        state,
        by="source",
        key="doc_id",
    )
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in cap_per_group(
            docs, 25, by="source", key="doc_id"
        ).collect()
    )
    assert got == want and len(got) > 0
    # saved quota state matches the admitted output exactly
    st = {
        r["source"]: r["n_admitted"]
        for r in spark.read.parquet(state).collect()
    }
    from collections import Counter

    adm = Counter(
        r["source"] for r in spark.read.parquet(out).collect()
    )
    assert st == dict(adm)


def test_cap_stream_per_group_quota_fills_across_epochs(
    spark, tmp_path
):
    """Multi-epoch semantics: each micro-batch fills only the REMAINING
    per-group quota (first-arrival-wins), totals never exceed the cap,
    and the whole run equals the sequential batch simulation (cap
    epoch-1, then admit epoch-2 rows under the leftover quota with the
    same deterministic rank)."""
    from xyzpy_spark.pipeline.sampling import _group_rank, cap_per_group
    from xyzpy_spark.streaming.ops import cap_stream_per_group

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet").select(
        "doc_id", "source", "text"
    )
    half1 = docs.where(F.col("doc_id") % 2 == 0)
    half2 = docs.where(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    half1.coalesce(1).write.parquet(src)
    half2.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    cap_stream_per_group(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        40,
        out,
        state,
        by="source",
        key="doc_id",
    )
    result = spark.read.parquet(out)
    epochs = sorted(
        r["epoch_id"]
        for r in result.select("epoch_id").distinct().collect()
    )
    assert len(epochs) == 2, epochs
    # per-group totals: never above the cap, equal to min(n, cap)
    totals = {
        r["source"]: r["n"]
        for r in result.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    avail = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert totals == {s: min(n, 40) for s, n in avail.items()}
    # exact equality with the sequential batch simulation
    e1_files = sorted(
        r["f"]
        for r in result.where(F.col("epoch_id") == epochs[0])
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    assert e1_files  # sanity: epoch dirs resolved
    first_batch, second_batch = half1, half2
    got_e1 = sorted(
        r["doc_id"]
        for r in result.where(
            F.col("epoch_id") == epochs[0]
        ).collect()
    )
    want_e1_df = cap_per_group(
        first_batch, 40, by="source", key="doc_id"
    )
    want_e1 = sorted(r["doc_id"] for r in want_e1_df.collect())
    if got_e1 != want_e1:
        # file order is not guaranteed: epoch 0 may have taken half2
        first_batch, second_batch = half2, half1
        want_e1_df = cap_per_group(
            first_batch, 40, by="source", key="doc_id"
        )
        want_e1 = sorted(r["doc_id"] for r in want_e1_df.collect())
    assert got_e1 == want_e1
    taken = want_e1_df.groupBy("source").agg(
        F.count(F.lit(1)).alias("__adm")
    )
    want_e2 = sorted(
        r["doc_id"]
        for r in _group_rank(
            second_batch, by="source", key="doc_id"
        )
        .join(taken, "source", "left")
        .where(
            F.col("__r")
            <= F.lit(40) - F.coalesce(F.col("__adm"), F.lit(0))
        )
        .collect()
    )
    got_e2 = sorted(
        r["doc_id"]
        for r in result.where(
            F.col("epoch_id") == epochs[1]
        ).collect()
    )
    assert got_e2 == want_e2


def test_cap_stream_per_group_order_col_single_epoch(spark, tmp_path):
    """order_col (quality-capping) mode rides the same seam: one
    epoch must equal the batch top-k-per-group selection."""
    from xyzpy_spark.pipeline.sampling import cap_per_group
    from xyzpy_spark.streaming.ops import cap_stream_per_group

    sf = "/root/testdata/sf0.001"
    docs = (
        spark.read.parquet(sf + "/documents.parquet")
        .select("doc_id", "source", F.length("text").alias("quality"))
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    schema = spark.read.parquet(src).schema
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    cap_stream_per_group(
        spark.readStream.schema(schema).parquet(src),
        10,
        out,
        state,
        by="source",
        key="doc_id",
        order_col="quality",
    )
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in cap_per_group(
            docs, 10, by="source", key="doc_id", order_col="quality"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_lm_stream_score_matches_batch(spark, tmp_path):
    """Streaming LM perplexity: a document stream scored per
    micro-batch against the saved n-gram LM must produce exactly the
    batch score_ngram_nll rows (one code path), through the
    epoch-idempotent sink — the serve side of the CCNet signal."""
    from xyzpy_spark.pipeline.lm import (
        load_lm,
        save_lm,
        score_ngram_nll,
        train_ngram_lm,
    )
    from xyzpy_spark.streaming.ops import (
        lm_stream_score,
        read_documents_stream,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet").select(
        "doc_id", "text"
    )
    ref = docs.where(F.col("doc_id") % 10 == 0)
    lm_path = str(tmp_path / "lm")
    save_lm(*train_ngram_lm(ref, 2), lm_path, n=2)
    contexts, ngrams, vocab, n = load_lm(spark, lm_path)

    out = str(tmp_path / "nll")
    lm_stream_score(
        read_documents_stream(spark, sf),
        contexts,
        ngrams,
        vocab,
        out,
        n=n,
    )
    got = sorted(
        (r["doc_id"], r["n_bigrams"], r["nll"])
        for r in spark.read.parquet(out).select(
            "doc_id", "n_bigrams", "nll"
        ).collect()
    )
    want = sorted(
        (r["doc_id"], r["n_bigrams"], r["nll"])
        for r in score_ngram_nll(
            docs, contexts, ngrams, vocab, n=n
        ).collect()
    )
    assert got == want and len(got) > 0


def test_hll_stream_distinct_matches_batch(spark, tmp_path):
    """Streaming distinct counting via the saved mergeable register
    state: after the final micro-batch, the estimate table must equal
    the batch hll_distinct of EVERYTHING seen — same registers, same
    estimate, exactly (the HLL merge law end to end through the real
    engine), across multiple epochs."""
    from xyzpy_spark.functions.sketch import hll_distinct
    from xyzpy_spark.streaming.ops import hll_stream_distinct

    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select("event_id", "event_type", "user_id")
    half1 = ev.where(F.col("event_id") % 2 == 0)
    half2 = ev.where(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    half1.coalesce(1).write.parquet(src)
    half2.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    hll_stream_distinct(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        "user_id",
        out,
        state,
        by="event_type",
        p=8,
    )
    est = spark.read.parquet(out)
    epochs = sorted(
        r["epoch_id"]
        for r in est.select("epoch_id").distinct().collect()
    )
    assert len(epochs) == 2, epochs
    final = {
        r["event_type"]: (r["registers_hit"], r["n_distinct_hll"])
        for r in est.where(F.col("epoch_id") == epochs[-1]).collect()
    }
    want = {
        r["event_type"]: (r["registers_hit"], r["n_distinct_hll"])
        for r in hll_distinct(ev, "user_id", "event_type", p=8).collect()
    }
    assert final == want and len(final) > 0
    # the saved state is bounded: <= 2^p register rows per group
    st = spark.read.parquet(state).where(
        F.col("epoch_id") == epochs[-1]
    )
    mx = (
        st.groupBy("event_type")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert mx <= 256


def test_hll_stream_distinct_multi_matches_batch(spark, tmp_path):
    """The fused multi-column stream (r14, one source scan per epoch
    for N sketches — the 100-TB path) ends on per-kind estimates
    bit-identical to the batch hll_distinct of everything seen, per
    column, across multiple epochs."""
    from xyzpy_spark.functions.sketch import hll_distinct
    from xyzpy_spark.streaming.ops import hll_stream_distinct

    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select("event_id", "event_type", "user_id")
    half1 = ev.where(F.col("event_id") % 2 == 0)
    half2 = ev.where(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    half1.coalesce(1).write.parquet(src)
    half2.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    hll_stream_distinct(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        {"u": "user_id", "e": "event_id"},
        out,
        state,
        by="event_type",
        p=8,
    )
    est = spark.read.parquet(out)
    epochs = sorted(
        r["epoch_id"]
        for r in est.select("epoch_id").distinct().collect()
    )
    assert len(epochs) == 2, epochs
    fin = est.where(F.col("epoch_id") == epochs[-1])
    for kind, col in (("u", "user_id"), ("e", "event_id")):
        final = {
            r["event_type"]: (r["registers_hit"], r["n_distinct_hll"])
            for r in fin.where(F.col("kind") == kind).collect()
        }
        want = {
            r["event_type"]: (r["registers_hit"], r["n_distinct_hll"])
            for r in hll_distinct(ev, col, "event_type", p=8).collect()
        }
        assert final == want and len(final) > 0
    # bounded state: <= kinds x 2^p register rows per group
    st = spark.read.parquet(state).where(
        F.col("epoch_id") == epochs[-1]
    )
    mx = (
        st.groupBy("event_type", "kind")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert mx <= 256


def test_stale_epoch_state_rejected_on_path_reuse(spark, tmp_path):
    """Reusing a state/out path with a FRESH checkpoint (epoch ids
    restart at 0) must fail fast, not silently merge the prior run's
    snapshots as 'earlier' state (r8 ADVICE).  Replays of the same
    run stay legal: only epoch dirs BEYOND the current epoch are
    stale by construction."""
    from xyzpy_spark.streaming.ops import (
        cap_stream_per_group,
        hll_stream_distinct,
    )

    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select("event_id", "event_type", "user_id")
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def _stream():
        return spark.readStream.schema(schema).parquet(src)

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    hll_stream_distinct(
        _stream(), "user_id", out, state, by="event_type", p=8
    )
    # plant a prior-run leftover beyond any epoch this run reaches
    spark.read.parquet(state).limit(1).write.parquet(
        state + "/epoch_id=7"
    )
    with pytest.raises(Exception, match="prior run"):
        hll_stream_distinct(
            _stream(), "user_id", out, state, by="event_type", p=8
        )

    out2, state2 = str(tmp_path / "o2"), str(tmp_path / "s2")
    cap_stream_per_group(
        _stream(), 5, out2, state2, by="event_type", key="event_id"
    )
    spark.read.parquet(state2).limit(1).write.parquet(
        state2 + "/epoch_id=9"
    )
    with pytest.raises(Exception, match="prior run"):
        cap_stream_per_group(
            _stream(), 5, out2, state2, by="event_type", key="event_id"
        )


# ---- late / out-of-order data semantics (r9 verdict ask #5) ----------
#
# The gate rows replay in-order file epochs, so none of them pins what
# a LATE row (older than the watermark) does.  These tests feed
# deliberately late rows through the three stateful shapes and assert
# the documented drop/admit behavior: batch semantics MINUS the
# watermark horizon, with watermark propagation lagging one trigger
# (the watermark for batch N is computed from data seen through batch
# N-1, so a late row is reliably dropped from the SECOND batch after
# its horizon passed).


def _epoch_stream(spark, tmp_path, dfs, name):
    """A file-source stream that replays ``dfs`` one per micro-batch:
    each frame is one parquet file, mtimes stamped in write order so
    FileStreamSource's modification-time ordering is deterministic,
    maxFilesPerTrigger=1 makes each file its own trigger."""
    import glob
    import os
    import time

    src = str(tmp_path / name)
    for i, e in enumerate(dfs):
        e.coalesce(1).write.mode("append" if i else "overwrite").parquet(
            src
        )
    now = time.time()
    files = sorted(glob.glob(src + "/*.parquet"), key=os.path.getmtime)
    for i, f in enumerate(files):
        os.utime(f, (now - 100 + i * 10,) * 2)
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _ts_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, "
        "event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_windowed_agg_drops_late_rows_after_horizon(spark, tmp_path):
    """A row older than the watermark must neither re-open its evicted
    window nor update it: epoch 1 closes window [10:00,11:00) (max ts
    12:45 -> watermark 12:15), epoch 2 advances the watermark past it,
    epoch 3's 10:20 straggler is dropped — the final window counts are
    the batch counts MINUS the late row, and no update row for the
    closed window ever carries its contribution."""
    TS = lambda s: f"2024-01-01 {s}:00"
    epochs = [
        _ts_events(spark, [
            (1, 1, TS("10:05"), "view", 1.0),
            (2, 1, TS("10:15"), "view", 1.0),
            (3, 1, TS("12:45"), "view", 1.0),
        ]),
        _ts_events(spark, [(4, 1, TS("13:10"), "view", 1.0)]),
        _ts_events(spark, [
            (5, 1, TS("10:20"), "view", 1.0),   # LATE: horizon passed
            (6, 1, TS("13:20"), "view", 1.0),
        ]),
    ]
    st = _epoch_stream(spark, tmp_path, epochs, "late_win")
    out = run_stream_to_memory(
        windowed_agg(st, window="1 hour", watermark="30 minutes"),
        "late_win_t",
        output_mode="update",
    ).collect()
    # last update per window = the final streaming answer
    final = {}
    for r in out:
        final[str(r["window_start"])] = r["n"]
    assert final["2024-01-01 10:00:00"] == 2          # late row DROPPED
    assert final["2024-01-01 13:00:00"] == 2          # on-time admitted
    # the late row never surfaced anywhere: no n=3 update for 10:00 and
    # no resurrected n=1 window
    tens = sorted(
        r["n"] for r in out
        if str(r["window_start"]) == "2024-01-01 10:00:00"
    )
    assert tens == [2], tens
    # batch-minus-horizon: the batch twin over ALL rows counts the
    # straggler; streaming differs from batch EXACTLY by it
    allrows = epochs[0].unionAll(epochs[1]).unionAll(epochs[2])
    batch = {
        str(r["ws"]): r["n"]
        for r in allrows.groupBy(
            F.window("ts", "1 hour").start.alias("ws")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert batch["2024-01-01 10:00:00"] == 3
    assert {
        k: v for k, v in batch.items() if k != "2024-01-01 10:00:00"
    } == {k: v for k, v in final.items() if k != "2024-01-01 10:00:00"}


def test_dedup_stream_drops_all_late_rows(spark, tmp_path):
    """dropDuplicatesWithinWatermark late semantics, pinned: a row
    older than the watermark is dropped WHOLESALE — both a late
    duplicate (correct: its first arrival already passed) and a late
    FIRST arrival (the horizon cost: batch dedup would keep it).
    Within the horizon, first arrival wins."""
    from xyzpy_spark.streaming.ops import dedup_stream

    TS = lambda s: f"2024-01-01 {s}:00"
    epochs = [
        _ts_events(spark, [
            (10, 1, TS("10:00"), "view", 1.0),
            (11, 1, TS("14:00"), "view", 1.0),
        ]),
        _ts_events(spark, [(99, 1, TS("14:05"), "view", 1.0)]),
        _ts_events(spark, [
            (10, 1, TS("10:10"), "view", 1.0),  # late DUPLICATE
            (12, 1, TS("10:20"), "view", 1.0),  # late FIRST arrival
            (13, 1, TS("14:10"), "view", 1.0),  # on-time
        ]),
    ]
    st = _epoch_stream(spark, tmp_path, epochs, "late_dd")
    out = run_stream_to_memory(
        dedup_stream(st, keys=("event_id",), watermark="30 minutes"),
        "late_dd_t",
        output_mode="append",
    )
    kept = sorted(r["event_id"] for r in out.collect())
    assert kept == [10, 11, 13, 99], kept
    # the batch twin keeps the late first arrival (12): the streaming
    # result is batch dedup minus rows beyond the horizon
    batch_ids = sorted(
        r["event_id"]
        for r in epochs[0].unionAll(epochs[1]).unionAll(epochs[2])
        .dropDuplicates(["event_id"]).collect()
    )
    assert batch_ids == [10, 11, 12, 13, 99]


def test_interval_join_stream_late_left_loses_match(spark, tmp_path):
    """STREAM-STREAM interval join late semantics, pinned: a left row
    arriving after the watermark evicted its matching right state
    emits NO pair (the batch range join would match it); on-time
    pairs are unaffected.  This is the state-bounding trade the
    docstring promises — eviction is what lets the join run forever."""
    from xyzpy_spark.streaming.ops import interval_join_stream

    TS = lambda s: f"2024-01-01 {s}:00"
    mk = lambda rows: spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    L = [
        mk([(20, 7, TS("14:00"))]),
        mk([(22, 7, TS("14:10"))]),
        mk([(21, 7, TS("10:00")), (23, 7, TS("14:20"))]),  # 21 is LATE
    ]
    R = [
        mk([(30, 7, TS("10:05")), (31, 7, TS("14:00"))]),
        mk([(33, 7, TS("14:10"))]),
        mk([(32, 7, TS("14:30"))]),
    ]
    out = run_stream_to_memory(
        interval_join_stream(
            _epoch_stream(spark, tmp_path, L, "late_jl"),
            _epoch_stream(spark, tmp_path, R, "late_jr"),
            on="ts", by="user_id", upper="15 minutes",
            watermark="30 minutes",
        ),
        "late_j_t",
        output_mode="append",
    )
    got = sorted(
        (r["l_event_id"], r["r_event_id"]) for r in out.collect()
    )
    assert got == [(20, 33), (23, 32)], got
    # batch twin over the full replay (brute-force python range join,
    # same (lower, upper] bounds): the late left row 21 matches right
    # 30 — streaming == batch minus late-arrival pairs
    lall = L[0].unionAll(L[1]).unionAll(L[2])
    rall = R[0].unionAll(R[1]).unionAll(R[2])
    batch = sorted(
        (lr["event_id"], rr["event_id"])
        for lr in lall.collect()
        for rr in rall.collect()
        if lr["user_id"] == rr["user_id"]
        and 0 < (rr["ts"] - lr["ts"]).total_seconds() <= 900
    )
    assert batch == [(20, 33), (21, 30), (23, 32)]


def test_drift_stream_monitor_accumulates_across_epochs(spark, tmp_path):
    """Cumulative-state semantics (one oracle, two engine paths): after
    epoch 1 the drift report equals the batch corpus_divergence of
    (reference, first half); after the final epoch it equals the batch
    answer over EVERYTHING streamed — token counts merge by grouped
    sum, so the streaming path is exactly the batch math."""
    from xyzpy_spark.pipeline.drift import (
        corpus_divergence,
        token_distribution,
    )
    from xyzpy_spark.streaming.ops import drift_stream_monitor

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    ref = docs.where(F.col("lang") == "en")
    streamed = docs.where(F.col("lang") == "de")
    half1 = streamed.where(F.col("doc_id") % 2 == 0)
    half2 = streamed.where(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    half1.coalesce(1).write.parquet(src)
    half2.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    ref_counts = token_distribution(ref).persist()
    drift_stream_monitor(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        ref_counts,
        out,
        state,
        top_k=10,
    )
    result = spark.read.parquet(out)
    epochs = sorted(
        r["epoch_id"]
        for r in result.select("epoch_id").distinct().collect()
    )
    assert len(epochs) == 2, epochs

    def _rows(df):
        return sorted(
            (
                r["token"], r["cnt_a"], r["cnt_b"], r["p_a"], r["p_b"],
                r["js_contrib_e9"], r["js_total_e9"],
            )
            for r in df.collect()
        )

    # epoch 1: reference vs the first half only
    got_e1 = _rows(
        result.where(F.col("epoch_id") == epochs[0]).drop("epoch_id")
    )
    want_e1 = _rows(corpus_divergence(ref, half1, top_k=10))
    assert got_e1 == want_e1
    # final epoch: reference vs everything streamed == the batch twin
    got_e2 = _rows(
        result.where(F.col("epoch_id") == epochs[1]).drop("epoch_id")
    )
    want_e2 = _rows(corpus_divergence(ref, streamed, top_k=10))
    assert got_e2 == want_e2
    ref_counts.unpersist()


def test_drift_stream_monitor_rejects_stale_state(spark, tmp_path):
    """A reused state path with a fresh checkpoint must fail fast, not
    silently fold a prior run's counts into this stream's state."""
    import pytest as _pytest

    from xyzpy_spark.pipeline.drift import token_distribution
    from xyzpy_spark.streaming.ops import drift_stream_monitor

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    ref_counts = token_distribution(
        docs.where(F.col("lang") == "en")
    ).persist()
    src = str(tmp_path / "src")
    docs.where(F.col("lang") == "de").coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    # seed a STALE epoch >= the first epoch id the fresh run will use
    spark.createDataFrame(
        [("ghost", 5)], "token string, cnt long"
    ).write.parquet(state + "/epoch_id=7")
    with _pytest.raises(Exception, match="stale|drift_stream_monitor"):
        drift_stream_monitor(
            spark.readStream.schema(schema).parquet(src),
            ref_counts,
            out,
            state,
        )
    ref_counts.unpersist()


def test_value_drift_stream_monitor_accumulates_across_epochs(
    spark, tmp_path
):
    """The numeric sibling's cumulative-state semantics (r11, shared
    _drift_monitor_core): after epoch 1 the report equals the batch
    numeric_divergence of (reference, first half); after the final
    epoch it equals the batch answer over EVERYTHING streamed — bin
    counts merge by grouped sum, state bounded at n_bins forever."""
    from xyzpy_spark.pipeline.drift import (
        numeric_distribution,
        numeric_divergence,
    )
    from xyzpy_spark.streaming.ops import value_drift_stream_monitor

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(sf + "/events.parquet").select(
        "event_id", "value"
    )
    ref = ev.where(F.col("event_id") % 3 == 0)
    streamed = ev.where(F.col("event_id") % 3 != 0)
    half1 = streamed.where(F.col("event_id") % 2 == 0)
    half2 = streamed.where(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    half1.coalesce(1).write.parquet(src)
    half2.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    kw = dict(lo=0.0, hi=512.0, n_bins=16)
    ref_counts = numeric_distribution(ref, "value", **kw).persist()
    value_drift_stream_monitor(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        ref_counts,
        out,
        state,
        value_col="value",
        top_k=16,
        **kw,
    )
    result = spark.read.parquet(out)
    epochs = sorted(
        r["epoch_id"]
        for r in result.select("epoch_id").distinct().collect()
    )
    assert len(epochs) == 2, epochs
    # cumulative state stays bin-bounded
    st = spark.read.parquet(state)
    assert st.select("token").distinct().count() <= 16

    def _rows(df):
        return sorted(
            (
                r["token"], r["cnt_a"], r["cnt_b"], r["p_a"], r["p_b"],
                r["js_contrib_e9"], r["js_total_e9"],
            )
            for r in df.collect()
        )

    got_e1 = _rows(
        result.where(F.col("epoch_id") == epochs[0]).drop("epoch_id")
    )
    want_e1 = _rows(
        numeric_divergence(ref, half1, "value", top_k=16, **kw)
    )
    assert got_e1 == want_e1
    got_e2 = _rows(
        result.where(F.col("epoch_id") == epochs[1]).drop("epoch_id")
    )
    want_e2 = _rows(
        numeric_divergence(ref, streamed, "value", top_k=16, **kw)
    )
    assert got_e2 == want_e2
    ref_counts.unpersist()


def test_value_drift_stream_monitor_validates_and_rejects_stale(
    spark, tmp_path
):
    """The numeric monitor validates bin params up front and inherits
    the stale-state fail-fast from the shared core."""
    import pytest as _pytest

    from xyzpy_spark.pipeline.drift import numeric_distribution
    from xyzpy_spark.streaming.ops import value_drift_stream_monitor

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(sf + "/events.parquet").select(
        "event_id", "value"
    )
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    ref_counts = numeric_distribution(
        ev, "value", lo=0.0, hi=512.0, n_bins=16
    ).persist()
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    with _pytest.raises(ValueError, match="lo < hi"):
        value_drift_stream_monitor(
            stream, ref_counts, out, state, lo=5.0, hi=5.0
        )
    spark.createDataFrame(
        [(3, 5)], "token long, cnt long"
    ).write.parquet(state + "/epoch_id=7")
    with _pytest.raises(
        Exception, match="stale|value_drift_stream_monitor"
    ):
        value_drift_stream_monitor(
            stream, ref_counts, out, state, lo=0.0, hi=512.0
        )
    ref_counts.unpersist()


def test_winnow_ingest_stream_matches_sequential_batch(spark, tmp_path):
    """Probe-then-extend ingest (r12): a two-epoch stream must equal
    the SEQUENTIAL batch loop (probe against as-of index state, then
    extend with the epoch's novel docs) bit-for-bit — including a
    cross-epoch duplicate: a doc novel in epoch 0 whose near-copy
    arrives in epoch 1 must be flagged against the GROWN index, which
    the static-snapshot probe can't do."""
    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        extend_winnow_index,
        load_winnow_index,
        save_winnow_index,
        winnow_against_index,
    )
    from xyzpy_spark.streaming.ops import winnow_ingest_stream

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 10 < 5)
    ep0 = docs.where(F.col("doc_id") % 10 == 5)
    # epoch 1 re-sends epoch 0's docs under shifted ids: duplicates
    # of docs the index only holds because epoch 0's extend ran
    ep1 = ep0.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    kw = dict(k=6, w=5, max_fp_freq=50, hash_fn="md5")
    pkw = dict(threshold=0.2, **kw)

    # streaming side
    p = str(tmp_path / "widx")
    index, dropped = build_winnow_index(hist, **kw)
    save_winnow_index(index, dropped, p, fp_buckets=32)
    st = _epoch_stream(spark, tmp_path, [ep0, ep1], "ingest_src")
    out = str(tmp_path / "ann")
    winnow_ingest_stream(st, p, out, **pkw)

    # sequential batch twin on a second copy of the index
    p2 = str(tmp_path / "widx2")
    save_winnow_index(index, dropped, p2, fp_buckets=32)
    want = {}
    for eid, batch in enumerate([ep0, ep1]):
        idx, drp = load_winnow_index(spark, p2)
        ann = winnow_against_index(batch, idx, dropped=drp, **pkw)
        for r in ann.collect():
            want[r["doc_id"]] = (r["dup_kind"], r["dup_of"], r["fp_jaccard"])
        novel_ids = ann.where(F.col("dup_of").isNull()).select("doc_id")
        novel = batch.join(novel_ids, "doc_id", "left_semi").select(
            "doc_id", "text"
        )
        extend_winnow_index(novel, p2, seg=eid)

    got = {
        r["doc_id"]: (r["dup_kind"], r["dup_of"], r["fp_jaccard"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want
    # the cross-epoch duplicates were caught against the GROWN index
    shifted = {
        d: v for d, v in got.items() if d >= 1000000 and v[0] == "near"
    }
    assert len(shifted) > 0
    # at least one shifted doc matched its epoch-0 original — a doc
    # that is ONLY in the index because epoch 0's extend ran (an
    # original that was itself a dup may lose ties to older history)
    assert any(v[1] == d - 1000000 for d, v in shifted.items())
    # final index state: bit-for-bit vs the sequential twin
    sidx = sorted(map(tuple, load_winnow_index(spark, p)[0].collect()))
    bidx = sorted(map(tuple, load_winnow_index(spark, p2)[0].collect()))
    assert sidx == bidx

    # replay idempotence: re-running the whole stream with a FRESH
    # checkpoint but the same out_path/index re-bases... is a NEW run
    # and must be blocked from silently shifting state — the epoch-0
    # overwrite plus committed-seg no-op make a same-checkpoint replay
    # safe instead; simulate one by re-invoking the sink path directly
    from xyzpy_spark.pipeline.dedup import _read_ingest_base

    base = _read_ingest_base(spark, p)
    before = sorted(map(tuple, load_winnow_index(spark, p)[0].collect()))
    assert extend_winnow_index(ep0, p, seg=base + 0) == base + 0  # no-op
    after = sorted(map(tuple, load_winnow_index(spark, p)[0].collect()))
    assert after == before


def test_winnow_ingest_stream_resume_same_run(spark, tmp_path):
    """A SUSPENDED ingest run resumed with the same checkpoint +
    out_path (more data arrived while it was down) must re-read its
    own base marker, rebuild the pre-run cache, and fold the earlier
    epochs' segments — ending bit-for-bit where an uninterrupted run
    ends (r13: the resumed branch now exercises token verification
    AND the fold path end to end)."""
    import glob as _glob
    import os as _os
    import time as _time

    from xyzpy_spark.pipeline.dedup import (
        _read_ingest_base,
        build_winnow_index,
        extend_winnow_index,
        load_winnow_index,
        save_winnow_index,
        winnow_against_index,
    )
    from xyzpy_spark.streaming.ops import winnow_ingest_stream

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 10 < 5)
    ep0 = docs.where(F.col("doc_id") % 10 == 5)
    ep1 = ep0.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    kw = dict(k=6, w=5, max_fp_freq=50, hash_fn="md5")
    pkw = dict(threshold=0.2, **kw)

    p = str(tmp_path / "widx")
    index, dropped = build_winnow_index(hist, **kw)
    save_winnow_index(index, dropped, p, fp_buckets=32)

    # run leg 1: only ep0's file exists; the stream drains it and stops
    src = str(tmp_path / "resume_src")
    ep0.coalesce(1).write.parquet(src)
    now = _time.time()
    for f in _glob.glob(src + "/*.parquet"):
        _os.utime(f, (now - 100,) * 2)
    ckpt = str(tmp_path / "resume_ckpt")
    out = str(tmp_path / "resume_ann")
    schema = spark.read.parquet(src).schema

    def _stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    winnow_ingest_stream(_stream(), p, out, checkpoint=ckpt, **pkw)
    base = _read_ingest_base(spark, p)
    assert base is not None

    # suspension: ep1 lands while the run is down; leg 2 resumes with
    # the SAME checkpoint + out_path (epoch dirs exist → resumed branch)
    before = set(_glob.glob(src + "/*.parquet"))
    ep1.coalesce(1).write.mode("append").parquet(src)
    for f in set(_glob.glob(src + "/*.parquet")) - before:
        _os.utime(f, (now - 50,) * 2)
    winnow_ingest_stream(_stream(), p, out, checkpoint=ckpt, **pkw)
    assert _read_ingest_base(spark, p) == base  # mapping kept

    # the sequential batch twin over a second index copy
    p2 = str(tmp_path / "widx2")
    save_winnow_index(index, dropped, p2, fp_buckets=32)
    want = {}
    for eid, batch in enumerate([ep0, ep1]):
        idx, drp = load_winnow_index(spark, p2)
        ann = winnow_against_index(batch, idx, dropped=drp, **pkw)
        for r in ann.collect():
            want[r["doc_id"]] = (r["dup_kind"], r["dup_of"], r["fp_jaccard"])
        novel = batch.join(
            ann.where(F.col("dup_of").isNull()).select("doc_id"),
            "doc_id",
            "left_semi",
        ).select("doc_id", "text")
        extend_winnow_index(novel, p2, seg=eid)

    got = {
        r["doc_id"]: (r["dup_kind"], r["dup_of"], r["fp_jaccard"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want
    # epoch 1's cross-run duplicates matched through the RESUMED fold
    assert any(
        d >= 1000000 and v[0] == "near" and v[1] == d - 1000000
        for d, v in got.items()
    )
    sidx = sorted(
        map(tuple, load_winnow_index(spark, p)[0].collect())
    )
    bidx = sorted(
        map(tuple, load_winnow_index(spark, p2)[0].collect())
    )
    assert sidx == bidx


def test_winnow_ingest_lease_and_run_token(spark, tmp_path):
    """Single-writer enforcement around the ingest marker (r13 verdict
    ask #4 + r12 ADVICE): compact refuses while the lease is live; a
    second run cannot steal the marker; a resumed run detects a stolen
    marker; release_ingest_lease retires the run and compact then
    folds the segments."""
    from xyzpy_spark.pipeline.dedup import (
        _ingest_run_token,
        _list_segments,
        _read_ingest_base,
        _write_ingest_base,
        build_winnow_index,
        compact_winnow_index,
        load_winnow_index,
        release_ingest_lease,
        save_winnow_index,
    )
    from xyzpy_spark.streaming.ops import winnow_ingest_stream

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 10 < 5)
    ep0 = docs.where(F.col("doc_id") % 10 == 5)
    kw = dict(k=6, w=5, max_fp_freq=50, hash_fn="md5")

    p = str(tmp_path / "widx")
    index, dropped = build_winnow_index(hist, **kw)
    save_winnow_index(index, dropped, p, fp_buckets=32)
    out = str(tmp_path / "ann")
    st = _epoch_stream(spark, tmp_path, [ep0], "lease_src")
    winnow_ingest_stream(st, p, out, threshold=0.2, **kw)

    # the run's lease is live: compact mid-run must refuse...
    with pytest.raises(ValueError, match="leased"):
        compact_winnow_index(spark, p, fp_buckets=32)
    # ...and a SECOND run (different out_path → different token)
    # cannot claim the index underneath it
    with pytest.raises(ValueError, match="leased"):
        _write_ingest_base(
            spark, p, 99, run_token=_ingest_run_token(str(tmp_path / "b"))
        )
    # a resumed run verifies the marker is its own: a foreign token
    # (the r12 ADVICE stolen-marker scenario) fails fast
    assert (
        _read_ingest_base(
            spark, p, run_token=_ingest_run_token(out)
        )
        is not None
    )
    with pytest.raises(ValueError, match="different\\s+run"):
        _read_ingest_base(
            spark, p, run_token=_ingest_run_token(str(tmp_path / "b"))
        )

    # retire the run: release clears the lease, compact then folds
    # (logical columns only — the compacted layout adds fp_bucket)
    cols = ["doc_id", "fingerprint", "n_fp"]
    probe_before = sorted(
        map(tuple, load_winnow_index(spark, p)[0].select(*cols).collect())
    )
    assert release_ingest_lease(spark, p)
    assert not release_ingest_lease(spark, p)  # idempotent
    compact_winnow_index(spark, p, fp_buckets=32)
    assert _list_segments(spark, p) == ([], [])
    probe_after = sorted(
        map(tuple, load_winnow_index(spark, p)[0].select(*cols).collect())
    )
    assert probe_after == probe_before


def test_dedup_ingest_stream_matches_sequential_batch(spark, tmp_path):
    """MinHash probe-then-extend ingest (r12, winnow_ingest's twin):
    a two-epoch stream must equal the sequential batch loop (probe
    the saved index, extend with the epoch's novels) bit-for-bit —
    including a cross-epoch EXACT duplicate (epoch 1 re-sends an
    epoch-0 novel verbatim under a new id) that only the grown index
    can flag — and the as-of view must hold: re-probing epoch 0's
    batch against the final index minus the batch's own ids (the
    replay exclusion) reproduces epoch 0's recorded annotations."""
    from xyzpy_spark.pipeline.dedup import (
        band_dedup_index,
        build_dedup_index,
        dedup_against_index,
        extend_dedup_index,
        load_dedup_index,
        save_dedup_index,
    )
    from xyzpy_spark.streaming.ops import dedup_ingest_stream

    # cache isolation: an earlier test's persisted index fragment
    # would otherwise substitute into the builds (test_plans prior
    # art — order-dependent flake class)
    spark.catalog.clearCache()
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 10 < 5)
    ep0 = docs.where(F.col("doc_id") % 10 == 5)
    ep1 = docs.where(F.col("doc_id") % 10 == 6).unionByName(
        # verbatim copies of epoch 0 under shifted ids: exact dups of
        # docs the index only holds because epoch 0's extend ran
        ep0.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    kw = dict(n=2, hash_fn="md5")
    pkw = dict(threshold=0.4, **kw)

    def save_at(path):
        index = build_dedup_index(hist, **kw)
        save_dedup_index(
            index, band_dedup_index(index, **kw), path,
            fp_buckets=16, bb_buckets=16,
        )

    p = str(tmp_path / "didx")
    save_at(p)
    st = _epoch_stream(spark, tmp_path, [ep0, ep1], "dingest_src")
    out = str(tmp_path / "ann")
    dedup_ingest_stream(st, p, out, **pkw)

    # sequential batch twin on a second copy
    p2 = str(tmp_path / "didx2")
    save_at(p2)
    want = {}
    for batch in (ep0, ep1):
        idx, bands = load_dedup_index(spark, p2)
        ann = dedup_against_index(
            batch, idx, index_bands=bands, cache=False, **pkw
        )
        for r in ann.collect():
            want[r["doc_id"]] = (r["dup_kind"], r["dup_of"], r["est_jaccard"])
        novel = batch.join(
            ann.where(F.col("dup_kind").isNull()).select("doc_id"),
            "doc_id", "left_semi",
        )
        extend_dedup_index(novel, p2)

    got = {
        r["doc_id"]: (r["dup_kind"], r["dup_of"], r["est_jaccard"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want
    # cross-epoch exact dups caught against the GROWN index, each
    # matching its epoch-0 original
    shifted = {d: v for d, v in got.items() if d >= 1000000}
    exact = {d: v for d, v in shifted.items() if v[0] == "exact"}
    assert len(exact) > 0
    assert all(v[1] == d - 1000000 or v[1] < 1000000 for d, v in exact.items())
    # final index state matches the sequential twin (compare through
    # a canonical column order: a parquet dir's read schema takes its
    # COLUMN ORDER from whichever part file gets sampled, so raw
    # tuple comparison is listing-order flaky under the full suite)
    for sub in ("main", "bands"):
        da = spark.read.parquet(p + "/" + sub)
        db = spark.read.parquet(p2 + "/" + sub)
        cols = sorted(da.columns)
        assert sorted(db.columns) == cols
        a = sorted(map(tuple, da.select(*cols).collect()))
        b = sorted(map(tuple, db.select(*cols).collect()))
        assert a == b

    # the as-of replay view: final index minus epoch-0's ids probes
    # epoch 0 exactly as its original attempt did
    idx, bands = load_dedup_index(spark, p)
    ids = ep0.select("doc_id")
    idx = idx.join(ids, "doc_id", "left_anti")
    bands = bands.join(ids, "doc_id", "left_anti")
    replay = {
        r["doc_id"]: (r["dup_kind"], r["dup_of"], r["est_jaccard"])
        for r in dedup_against_index(
            ep0, idx, index_bands=bands, cache=False, **pkw
        ).collect()
    }
    ep0_ids = {r["doc_id"] for r in ids.collect()}
    assert replay == {d: v for d, v in got.items() if d in ep0_ids}


def test_dedup_ingest_stream_rejects_id_reuse(spark, tmp_path):
    """The replay exclusion's guard (r12 ADVICE, winnow's
    foreign-segment twin): a batch redelivering an id that exists in
    the index with DIFFERENT text is ID REUSE, not a replay — the
    sink must fail fast instead of silently hiding the historical
    rows from the probe and half-merging the extend."""
    from xyzpy_spark.pipeline.dedup import (
        band_dedup_index,
        build_dedup_index,
        save_dedup_index,
    )
    from xyzpy_spark.streaming.ops import dedup_ingest_stream

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 10 < 5)
    kw = dict(n=3, num_perm=16, hash_fn="xxhash64")
    idx = build_dedup_index(hist, **kw)
    bands = band_dedup_index(idx, bands=4, **kw)
    p = str(tmp_path / "didx")
    save_dedup_index(idx, bands, p, fp_buckets=8, bb_buckets=8)

    # one historical id comes back carrying entirely different text
    bad = hist.limit(1).select(
        "doc_id",
        F.lit(
            "an entirely different document body that shares nothing "
            "with the original text stored under this identifier"
        ).alias("text"),
    )
    st = _epoch_stream(spark, tmp_path, [bad], "reuse_src")
    with pytest.raises(Exception) as exc:
        dedup_ingest_stream(
            st, p, str(tmp_path / "reuse_out"), bands=4, **kw
        )
    assert "id reuse" in str(exc.value)


def test_drift_monitor_respects_caller_cache(spark, tmp_path):
    """_drift_monitor_core persists the frozen reference for the run
    and releases it on exit — but must NOT release a cache the
    CALLER created (the pre-r12 documented pattern persists one
    reference across several monitors)."""
    from pyspark import StorageLevel

    from xyzpy_spark.pipeline.drift import token_distribution
    from xyzpy_spark.streaming.ops import drift_stream_monitor

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    ref = token_distribution(docs.where(F.col("lang") == "en")).persist()
    ref.count()
    st = _epoch_stream(
        spark, tmp_path,
        [docs.where(F.col("doc_id") % 50 == 1).select("doc_id", "text")],
        "drift_cache_src",
    )
    drift_stream_monitor(
        st,
        ref,
        str(tmp_path / "out"),
        str(tmp_path / "state"),
        state_partitions=4,
    )
    # the caller's cache survives the monitor's exit path
    assert ref.storageLevel != StorageLevel.NONE
    ref.unpersist()
