from pyspark.sql import Row

from xyzpy_spark.missing import (
    find_missing_cases,
    full_coord_grid,
    is_case_missing,
    parse_into_cases,
)


def _fixture_df(spark):
    """3x2 grid with x non-null only at (1,40),(2,50) — FIXTURES §4
    (reference tests/test_gen/test_case_runner.py:212-227)."""
    rows = [
        Row(a=1, b=40, x=10.0),
        Row(a=2, b=50, x=20.0),
        Row(a=1, b=50, x=None),
        Row(a=2, b=40, x=None),
        Row(a=3, b=40, x=None),
        Row(a=3, b=50, x=None),
    ]
    return spark.createDataFrame(rows)


def test_full_coord_grid(spark):
    df = _fixture_df(spark)
    assert full_coord_grid(df, ["a", "b"]).count() == 6


def test_find_missing_cases(spark):
    df = _fixture_df(spark)
    missing = {
        (r["a"], r["b"])
        for r in find_missing_cases(df, ["a", "b"], ["x"]).collect()
    }
    assert missing == {(1, 50), (2, 40), (3, 40), (3, 50)}


def test_is_case_missing(spark):
    df = _fixture_df(spark)
    assert not is_case_missing(df, {"a": 1, "b": 40}, ["x"])
    assert is_case_missing(df, {"a": 3, "b": 50}, ["x"])
    assert is_case_missing(df, {"a": 99, "b": 40}, ["x"])  # absent row


def test_ignore_dims(spark):
    """Internal dim t projected away: point present if any t has data
    (reference tests/test_gen/test_case_runner.py:250-277)."""
    rows = [
        Row(a=1, t=0, x=1.0),
        Row(a=1, t=1, x=None),
        Row(a=2, t=0, x=None),
        Row(a=2, t=1, x=None),
    ]
    df = spark.createDataFrame(rows)
    missing = {
        r["a"]
        for r in find_missing_cases(
            df, ["a", "t"], ["x"], ignore_dims=["t"]
        ).collect()
    }
    assert missing == {2}


def test_parse_into_cases_filters_to_missing(spark):
    df = _fixture_df(spark)
    todo = parse_into_cases(
        spark,
        combos={"a": [1, 2, 3], "b": [40, 50]},
        df=df,
        var_names=["x"],
    )
    assert {(r["a"], r["b"]) for r in todo.collect()} == {
        (1, 50),
        (2, 40),
        (3, 40),
        (3, 50),
    }


def test_parse_into_cases_no_existing(spark):
    todo = parse_into_cases(spark, combos={"a": [1, 2]}, cases=[{"b": 9}])
    assert {(r["a"], r["b"]) for r in todo.collect()} == {(1, 9), (2, 9)}


def test_nan_point_counts_as_missing(spark):
    """A stored all-NaN numeric point must be re-run (reference
    is_case_missing treats NaN as missing)."""
    from xyzpy_spark.missing import find_missing_cases, non_null_points

    df = spark.createDataFrame(
        [(1, float("nan")), (2, 3.0)], ["a", "y"]
    )
    present = {r["a"] for r in non_null_points(df, ["a"], ["y"]).collect()}
    assert present == {2}


def test_parse_into_cases_without_var_names(spark):
    """df given but no var_names: any stored row counts as present
    (review regression: reduce() over empty iterable crashed)."""
    from xyzpy_spark.missing import parse_into_cases

    df = spark.createDataFrame([(1, 10.0)], ["a", "y"]).select("a")
    todo = parse_into_cases(spark, {"a": [1, 2, 3]}, df=df)
    assert {r["a"] for r in todo.collect()} == {2, 3}
