import math

import pytest
from pyspark.sql import Row

from xyzpy_spark.accessor import xyz
from xyzpy_spark.operators.facet import (
    check_excess_dims,
    facet_data,
    facet_values,
    xy_points,
)
from xyzpy_spark.utils import Timer, autocorrect_kwargs, flatten, prod, unzip


def test_prod_unzip_flatten():
    assert prod([2, 3, 4]) == 24
    assert unzip([(1, "a"), (2, "b")]) == ((1, 2), ("a", "b"))
    assert list(flatten([[1, [2, 3]], [4]], 1)) == [1, [2, 3], 4]
    assert list(flatten([[1, [2, 3]], [4]], 2)) == [1, 2, 3, 4]


def test_autocorrect_kwargs():
    @autocorrect_kwargs
    def f(alpha=1, beta=2):
        return alpha + beta

    assert f(alpha=3) == 5
    with pytest.raises(TypeError, match="did you mean 'alpha'"):
        f(alpa=3)


def test_timer():
    with Timer() as t:
        sum(range(1000))
    assert t.t >= 0


@pytest.fixture(scope="module")
def grid_df(spark):
    rows = [
        Row(a=a, b=b, y=float(a * 10 + b), z=float("nan") if b == 1 else 1.0)
        for a in range(3)
        for b in range(2)
    ]
    return spark.createDataFrame(rows)


def test_stage_metrics_nonzero_peaks(spark):
    """S10: the status-store metrics helper reports real nonzero
    execution-memory peaks for a shuffling job."""
    from pyspark.sql import functions as F

    from xyzpy_spark.utils import peak_memory_report, stage_metrics

    spark.range(0, 2_000_000, 1, 8).groupBy(
        (F.col("id") % 1000).alias("k")
    ).count().collect()
    stages = stage_metrics(spark)
    assert len(stages) > 0
    assert any(s["peak_execution_memory"] > 0 for s in stages)
    assert any(s["shuffle_write"] > 0 for s in stages)
    report = peak_memory_report(spark)
    assert report["peak_execution_memory"] > 0
    assert report["n_stages"] == len(stages)


def test_report_memory_host_and_gpu_gate():
    """S10/GPU gap (r2 verdict): host reporter returns real figures
    from /proc; the GPU reporter degrades to a report string (never
    raises) on a GPU-less box — same contract as the reference's
    exception path."""
    from xyzpy_spark.utils import report_memory, report_memory_gpu

    rep = report_memory()
    assert "Process memory:" in rep and "Total memory:" in rep
    # figures are real: process RSS > 0.001 GB, total >= used
    import re

    nums = [float(x) for x in re.findall(r"([\d.]+)GB", rep)]
    assert len(nums) == 3
    assert nums[0] > 0.001
    assert nums[2] >= nums[1] > 0

    gpu = report_memory_gpu()
    assert isinstance(gpu, str)
    assert ("GPU Process memory:" in gpu) or gpu.startswith(
        "failed to read gpu memory:"
    )


def test_executor_memory_reports(spark):
    """Cluster-wide reporter: one report per executor host, each a
    well-formed host-memory line (local mode: exactly this host)."""
    import socket

    from xyzpy_spark.utils import executor_memory_reports

    reports = executor_memory_reports(spark)
    assert socket.gethostname() in reports
    assert "Process memory:" in reports[socket.gethostname()]


def test_facet_values(grid_df):
    assert facet_values(grid_df, ["a"]) == [(0,), (1,), (2,)]


def test_facet_data(grid_df):
    facets = list(facet_data(grid_df, "a", "b"))
    assert len(facets) == 6
    for rv, cv, sub in facets:
        rows = sub.collect()
        assert len(rows) == 1
        assert rows[0]["a"] == rv and rows[0]["b"] == cv


def test_facet_data_row_only(grid_df):
    facets = list(facet_data(grid_df, "a"))
    assert len(facets) == 3
    assert all(sub.count() == 2 for _, _, sub in facets)


def test_check_excess_dims(grid_df):
    check_excess_dims(grid_df, ["a", "b"], ["a", "b"])
    with pytest.raises(ValueError, match="unmapped"):
        check_excess_dims(grid_df, ["a"], ["a", "b"])


def test_xy_points_drops_nonfinite(grid_df):
    pts = xy_points(grid_df, "y", "z").collect()
    assert len(pts) == 3  # the b==1 rows carry NaN z and are dropped
    assert all(not math.isnan(r["z"]) for r in pts)


def test_xy_points_jitter(grid_df):
    base = xy_points(grid_df, "y", "z")
    jit = xy_points(grid_df, "y", "z", jitter_x=0.1)
    ys0 = sorted(r["y"] for r in base.collect())
    ys1 = sorted(r["y"] for r in jit.collect())
    assert ys0 != ys1
    assert all(abs(a - b) < 1.0 for a, b in zip(ys0, ys1))


def test_accessor_chaining(spark, grid_df):
    out = (
        xyz(grid_df)
        .aggregate_over(["a"], "y", method="mean")
        .orderBy("a")
    )
    rows = out.collect()
    assert [r["y"] for r in rows] == [0.5, 10.5, 20.5]
    # passthrough returns wrapped frames
    assert isinstance(out, xyz)
    assert out.count() == 3


def test_accessor_union_grid(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=10, x=1.0), Row(a=2, b=20, x=2.0)]
    )
    dense = xyz(df).union_grid(["a", "b"], ["x"])
    assert dense.count() == 4


def test_accessor_corpus_pipeline_chain(spark):
    from xyzpy_spark.accessor import xyz
    from xyzpy_spark.sources.tables import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    out = (
        xyz(docs)
        .quality()
        .repetition()
        .hash_sample("doc_id", 0.5)
        .df
    )
    cols = set(out.columns)
    assert {"quality", "top_bigram_frac", "dup_token_frac"} <= cols
    n = out.count()
    assert 0 < n < docs.count()


def test_accessor_scrub_and_decontaminate_chain(spark):
    from pyspark.sql import functions as F

    from xyzpy_spark.accessor import xyz
    from xyzpy_spark.sources.tables import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    ev = docs.where(F.col("doc_id") % 10 == 0)
    out = (
        xyz(docs.where(F.col("doc_id") % 10 != 0))
        .scrub_pii()
        .decontaminate(ev, n=5)
        .df
    )
    assert {"n_email", "n_ipv4", "n_phone"} <= set(out.columns)
    assert 0 < out.count() < docs.count()


def test_unzip_recursive_matches_reference_example():
    """unzip at ndim=3 reproduces the reference's zip_level=2 doc
    example (xyzpy utils.py:40-47)."""
    from xyzpy_spark.utils import unzip

    x = [[(1, True), (2, False), (3, True)],
         [(7, True), (8, False), (9, True)]]
    nums, bools = unzip(x, ndim=3)
    assert tuple(tuple(n) for n in nums) == ((1, 2, 3), (7, 8, 9))
    assert tuple(tuple(b) for b in bools) == (
        (True, False, True), (True, False, True))


def test_reference_top_level_parity():
    """Every engine-scope name the reference exports at `import xyzpy`
    resolves at `import xyzpy_spark` too (plot/SLURM names are out of
    engine scope — COVERAGE.md)."""
    import xyzpy_spark as x

    for name in [
        "label", "combo_runner_to_df", "case_runner_to_df",
        "Runner", "Harvester", "Sampler", "Crop", "load_crops",
        "find_missing_cases", "is_case_missing", "parse_into_cases",
        "benchmark", "Benchmarker", "estimate_from_repeats",
        "format_number_with_error", "RunningStatistics",
        "save_df", "load_df", "save_merge_df",
        "merge_sync_conflict_tables", "cache_to_disk", "sort_dims",
        "auto_xyz_df", "trimna", "check_runs", "post_fix",
        "Timer", "unzip", "flatten", "autocorrect_kwargs",
        "report_memory", "report_memory_gpu",
    ]:
        assert hasattr(x, name), name
        assert name in x.__all__ or name in (
            "is_case_missing",
        ), name


def test_pipeline_package_exports_round4_ops():
    """Every round-4 operator is importable from xyzpy_spark.pipeline
    (the surface the README examples use)."""
    from xyzpy_spark import pipeline as p

    for name in [
        "add_gopher_rules", "gopher_filter", "strip_html",
        "chunk_documents", "strip_duplicate_lines", "dedup_against",
        "dsir_weights", "dsir_select", "packing_stats",
        "temperature_mixture_weights", "vocab_coverage",
        "resample_audio", "save_lm", "load_lm", "save_merges",
        "load_merges",
    ]:
        assert hasattr(p, name), name
        assert name in p.__all__, name


def test_accessor_sampling_sketch_and_temporal_methods(spark):
    """The r8/r9 operator families ride the xyz() namespace too:
    per-group capping, weighted sampling, HLL distinct, funnels and
    cohort retention chain like every other method (each delegates to
    its oracled operator — semantics are pinned there)."""
    from pyspark.sql import functions as F

    from xyzpy_spark.accessor import xyz
    from xyzpy_spark.sources.tables import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source"
    )
    capped = xyz(docs).cap_per_group(3, by="source", key="doc_id").df
    assert (
        capped.groupBy("source").count().agg(F.max("count")).first()[0]
        <= 3
    )
    w = docs.withColumn("w", (F.col("doc_id") % 4 + 1).cast("double"))
    picked = xyz(w).weighted_sample(5, "w", key="doc_id").df
    assert picked.count() == 5

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    hll = xyz(ev).hll_distinct("user_id", "event_type").df
    assert {"event_type", "n_distinct_hll"} <= set(hll.columns)
    f1 = xyz(ev).funnel(["view", "click"]).df
    f2 = xyz(ev).funnel(
        ["view", "click"], sequential=True, within="30 days"
    ).df
    n1 = {r["step"]: r["n_users"] for r in f1.collect()}
    n2 = {r["step"]: r["n_users"] for r in f2.collect()}
    # sequential-match reaches at least the first-touch count at step 2
    assert n2[2] >= n1[2] and n1[1] == n2[1]
    coh = xyz(ev).cohort_retention(granularity="week").df
    assert {"cohort", "period_offset", "n_active"} <= set(coh.columns)
