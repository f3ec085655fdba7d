"""Unit tests for profile_table (functions/profile.py) and the C4
blocklist ops (pipeline/text.keyword_hits / filter_blocklist)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def mixed_df(spark):
    rows = [
        (1, "alpha", 1.5, dt.datetime(2024, 1, 1, 0, 0, 0)),
        (2, "beta", 2.5, dt.datetime(2024, 1, 2, 0, 0, 0)),
        (2, None, None, dt.datetime(2024, 1, 3, 0, 0, 0)),
        (None, "alpha", -1.0, None),
    ]
    return spark.createDataFrame(
        rows, "k LONG, s STRING, v DOUBLE, t TIMESTAMP"
    )


def test_profile_counts_nulls_distincts_exact(spark, mixed_df):
    from xyzpy_spark.functions.profile import profile_table

    prof = {
        r["col_name"]: r
        for r in profile_table(mixed_df, distinct="exact").collect()
    }
    assert set(prof) == {"k", "s", "v", "t"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    k = prof["k"]
    assert (k["n_nulls"], k["n_distinct"]) == (1, 2)
    assert (k["min_num"], k["max_num"]) == (1.0, 2.0)
    assert k["mean"] == pytest.approx((1 + 2 + 2) / 3)
    assert k["min_str"] is None
    s = prof["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("alpha", "beta")
    assert s["min_num"] is None and s["mean"] is None
    v = prof["v"]
    assert (v["min_num"], v["max_num"]) == (-1.0, 2.5)
    assert v["mean"] == pytest.approx(1.0)
    t = prof["t"]
    assert t["n_nulls"] == 1
    micros = [
        dt.datetime(2024, 1, d, tzinfo=dt.timezone.utc).timestamp() * 1e6
        for d in (1, 2, 3)
    ]
    assert t["min_num"] == micros[0]
    assert t["max_num"] == micros[2]
    assert t["mean"] == pytest.approx(sum(micros) / 3)


def test_profile_approx_within_rsd(spark):
    from xyzpy_spark.functions.profile import profile_table

    df = spark.range(5000).select(
        (F.col("id") % 1000).alias("m"), F.col("id").alias("u")
    )
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    assert prof["m"]["n_distinct"] == pytest.approx(1000, rel=0.1)
    assert prof["u"]["n_distinct"] == pytest.approx(5000, rel=0.1)


def test_profile_column_subset_and_empty_raises(spark, mixed_df):
    from xyzpy_spark.functions.profile import profile_table

    out = profile_table(mixed_df, ["k"], distinct="exact").collect()
    assert [r["col_name"] for r in out] == ["k"]
    with pytest.raises(ValueError, match="no columns"):
        profile_table(mixed_df, [])


def test_profile_single_aggregation_plan(spark, mixed_df):
    from xyzpy_spark.functions.profile import profile_table
    from xyzpy_spark.plans.inspect import executed_plan

    plan = executed_plan(profile_table(mixed_df))
    # approx mode: no Expand, no join — one aggregation pass
    assert "Expand" not in plan
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# blocklist
# ---------------------------------------------------------------------------

KW = ["bad", "worse"]


@pytest.fixture(scope="module")
def kw_df(spark):
    rows = [
        (0, "all clean text here"),
        (1, "one bad token"),
        (2, "bad bad worse"),
        (3, "BAD capitals and badness substring"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_keyword_hits_token_boundaries_and_case(spark, kw_df):
    from xyzpy_spark.pipeline.text import keyword_hits

    got = {
        r["doc_id"]: (r["n_hits"], r["n_distinct_hits"])
        for r in keyword_hits(kw_df, KW).collect()
    }
    assert got[0] == (0, 0)
    assert got[1] == (1, 1)
    assert got[2] == (3, 2)
    # case-folded match; "badness" is NOT a token match
    assert got[3] == (1, 1)
    assert got[4] == (0, 0)


def test_keyword_hits_case_sensitive_mode(spark, kw_df):
    from xyzpy_spark.pipeline.text import keyword_hits

    got = {
        r["doc_id"]: r["n_hits"]
        for r in keyword_hits(kw_df, KW, lowercase=False).collect()
    }
    assert got[3] == 0  # "BAD" no longer folds


def test_filter_blocklist_drops_hits(spark, kw_df):
    from xyzpy_spark.pipeline.text import filter_blocklist

    kept = {
        r["doc_id"] for r in filter_blocklist(kw_df, KW).collect()
    }
    assert kept == {0, 4}
    kept1 = {
        r["doc_id"]
        for r in filter_blocklist(kw_df, KW, max_hits=1).collect()
    }
    assert kept1 == {0, 1, 3, 4}


def test_blocklist_empty_keywords_raise(spark, kw_df):
    from xyzpy_spark.pipeline.text import filter_blocklist, keyword_hits

    with pytest.raises(ValueError):
        keyword_hits(kw_df, [])
    with pytest.raises(ValueError):
        filter_blocklist(kw_df, [])


def test_keyword_hits_map_only_plan(spark, kw_df):
    from xyzpy_spark.pipeline.text import keyword_hits
    from xyzpy_spark.plans.inspect import has_exchange

    assert not has_exchange(keyword_hits(kw_df, KW))


def test_profile_dirty_doubles_survive_ansi(spark):
    """|x| >= 1e21 / inf / NaN must not abort the census (ANSI casts);
    they drop out of mean but still count in min/max."""
    from xyzpy_spark.functions.profile import profile_table

    df = spark.createDataFrame(
        [(1.0,), (1e22,), (float("inf"),), (float("nan"),), (2.0,)],
        "v DOUBLE",
    )
    r = profile_table(df, distinct="exact").collect()[0]
    assert r["n_rows"] == 5 and r["n_nulls"] == 0
    assert r["min_num"] == 1.0
    assert r["mean"] == pytest.approx(1.5)  # only the clean values


def test_profile_distinct_mode_validated(spark, mixed_df):
    from xyzpy_spark.functions.profile import profile_table

    with pytest.raises(ValueError, match="distinct"):
        profile_table(mixed_df, distinct="Exact")


def test_keyword_hits_null_text_zero_and_kept(spark):
    from xyzpy_spark.pipeline.text import filter_blocklist, keyword_hits

    df = spark.createDataFrame(
        [(0, None), (1, "bad stuff")], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["n_distinct_hits"])
        for r in keyword_hits(df, ["bad"]).collect()
    }
    assert got[0] == (0, 0)
    kept = {r["doc_id"] for r in filter_blocklist(df, ["bad"]).collect()}
    assert kept == {0}  # NULL text kept, hit doc dropped


def test_profile_quoted_column_name(spark):
    """Column names are interpolated as SQL string literals into the
    stack() unpivot — an embedded single quote must be escaped, not
    break the parse (or worse, inject)."""
    from xyzpy_spark.functions.profile import profile_table

    df = spark.createDataFrame([(1, "x"), (2, "y")], ["a", "o'brien"])
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"a", "o'brien"}
    assert rows["o'brien"]["n_rows"] == 2
