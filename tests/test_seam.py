"""seam() durability modes and OverlapPool scheduler labels (r14).

The library cuts lineage at plan seams with ``localCheckpoint`` by
default (guide §3.3); ``spark.xyzpy.seam.mode`` switches the seams to
reliable checkpoints or replicated persists for preemptible fleets
(r13 verdict "What's wrong" #2).  These tests pin that every mode
returns the same rows, that the default stays the local checkpoint,
and that OverlapPool labels its worker threads' jobs with a
scheduler pool while leaving results untouched.
"""

import tempfile

from pyspark import StorageLevel
from pyspark.sql import functions as F

from xyzpy_spark.utils import OverlapPool, seam


def _demo(spark):
    return spark.range(100).withColumn("v", F.col("id") * 2)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_seam_default_is_local_checkpoint(spark):
    spark.conf.unset("spark.xyzpy.seam.mode")
    df = _demo(spark)
    out = seam(df, eager=True)
    assert _rows(out) == _rows(df)
    # a checkpointed seam replaces the Range source with an RDD scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan


def test_seam_replicated_mode_same_rows_and_storage(spark):
    spark.conf.set("spark.xyzpy.seam.mode", "replicated")
    try:
        df = _demo(spark)
        out = seam(df, eager=True)
        assert _rows(out) == _rows(df)
        assert out.storageLevel == StorageLevel.MEMORY_AND_DISK_2
        out.unpersist()
    finally:
        spark.conf.unset("spark.xyzpy.seam.mode")


def test_seam_reliable_mode_same_rows(spark):
    with tempfile.TemporaryDirectory() as d:
        spark.sparkContext.setCheckpointDir(d)
        spark.conf.set("spark.xyzpy.seam.mode", "reliable")
        try:
            df = _demo(spark)
            out = seam(df, eager=True)
            assert _rows(out) == _rows(df)
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "ExistingRDD" in plan or "LogicalRDD" in plan
        finally:
            spark.conf.unset("spark.xyzpy.seam.mode")


def test_seam_mode_threads_through_an_operator(spark):
    """A seam-bearing operator returns identical results under every
    durability mode (curate's decontaminate stage exercises
    _lineage_seam: the hit census and the probe share one seam)."""
    from xyzpy_spark.pipeline.curate import curate_corpus

    docs = spark.createDataFrame(
        # mostly-clean corpus plus a handful of contaminated docs (they
        # contain the eval text verbatim, so their 3-gram shingles hit)
        [
            (i, f"clean{i} tokens{i} words{i} body{i} tail{i} end{i}")
            for i in range(36)
        ]
        + [
            (100 + i, f"alpha beta gamma delta epsilon zeta {i}")
            for i in range(4)
        ],
        "doc_id int, text string",
    )
    evals = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta 3")],
        "doc_id int, text string",
    )

    def _run():
        return _rows(
            curate_corpus(
                docs,
                min_tokens=None,
                min_quality=None,
                eval_df=evals,
                decontaminate_n=3,
            )
        )

    spark.conf.unset("spark.xyzpy.seam.mode")
    base = _run()
    assert base, "fixture should keep some rows"
    with tempfile.TemporaryDirectory() as d:
        spark.sparkContext.setCheckpointDir(d)
        for mode in ("replicated", "reliable"):
            spark.conf.set("spark.xyzpy.seam.mode", mode)
            try:
                assert _run() == base, mode
            finally:
                spark.conf.unset("spark.xyzpy.seam.mode")


def test_overlap_pool_labels_and_results(spark):
    seen = {}

    def _task(k):
        seen[k] = spark.sparkContext.getLocalProperty(
            "spark.scheduler.pool"
        )
        return spark.range(10 * k).count()

    with OverlapPool(spark, name="xyzpy-test-pool") as pool:
        futs = [pool.submit(_task, k) for k in (1, 2)]
        results = [f.result() for f in futs]
    assert results == [10, 20]
    assert seen == {1: "xyzpy-test-pool", 2: "xyzpy-test-pool"}
    # the label is thread-local: the caller's thread is untouched
    assert (
        spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        is None
    )


def test_overlap_pool_name_conf_override(spark):
    spark.conf.set("spark.xyzpy.scheduler.pool", "ops-batch")
    try:
        seen = []

        def _task():
            seen.append(
                spark.sparkContext.getLocalProperty(
                    "spark.scheduler.pool"
                )
            )

        with OverlapPool(spark, name="ignored-default") as pool:
            pool.submit(_task).result()
        assert seen == ["ops-batch"]
    finally:
        spark.conf.unset("spark.xyzpy.scheduler.pool")
