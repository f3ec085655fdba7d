import numpy as np

from conftest import TEST_COMBOS1
from xyzpy_spark.grid import LOC_COL, case_grid, combo_grid, grid_size


def test_grid_size():
    assert grid_size(TEST_COMBOS1) == 24


def test_combo_grid_row_major_order(spark):
    df = combo_grid(spark, TEST_COMBOS1)
    rows = {r[LOC_COL]: (r["a"], r["b"], r["c"]) for r in df.collect()}
    assert len(rows) == 24
    # row-major, last arg fastest (reference settings order)
    import itertools

    expected = list(itertools.product([1, 2], [10, 20, 30], [100, 200, 300, 400]))
    for loc, point in enumerate(expected):
        assert rows[loc] == point


def test_combo_grid_value_types(spark):
    df = combo_grid(spark, {"s": ["x", "y"], "f": [0.5, 1.5], "i": [1, 2]})
    schema = dict(df.dtypes)
    assert schema["s"] == "string"
    assert schema["f"] == "double"
    assert schema["i"] == "bigint"


def test_combo_grid_mixed_int_float_promotes(spark):
    df = combo_grid(spark, {"x": [1, 2.5]})
    assert dict(df.dtypes)["x"] == "double"
    vals = sorted(r["x"] for r in df.collect())
    assert vals == [1.0, 2.5]


def test_combo_grid_shuffle_keeps_all_points(spark):
    df = combo_grid(spark, TEST_COMBOS1, shuffle=7)
    assert df.count() == 24
    assert sorted(r[LOC_COL] for r in df.collect()) == list(range(24))


def test_case_grid_plain(spark):
    df = case_grid(spark, [{"a": 1, "b": 20}, {"a": 3, "b": 40}])
    rows = {r[LOC_COL]: (r["a"], r["b"]) for r in df.collect()}
    assert rows == {0: (1, 20), 1: (3, 40)}


def test_case_grid_all_none_column_maps_to_double(spark):
    df = case_grid(spark, [{"a": 1, "b": None}, {"a": 3, "b": None}])
    assert dict(df.dtypes)["b"] == "double"
    rows = {r[LOC_COL]: (r["a"], r["b"]) for r in df.collect()}
    assert rows == {0: (1, None), 1: (3, None)}


def test_case_grid_crossed_with_combos(spark):
    df = case_grid(
        spark,
        [{"a": 1, "c": 3}, {"a": 2, "c": 4}],
        combos={"b": [5, 6], "d": [7, 8]},
    )
    rows = df.collect()
    assert len(rows) == 8
    pts = {(r["a"], r["c"], r["b"], r["d"]) for r in rows}
    assert pts == {
        (a, c, b, d)
        for (a, c) in [(1, 3), (2, 4)]
        for b in (5, 6)
        for d in (7, 8)
    }
    # loc deterministic: case-major then combo row-major
    by_loc = sorted(rows, key=lambda r: r[LOC_COL])
    assert (by_loc[0]["a"], by_loc[0]["b"], by_loc[0]["d"]) == (1, 5, 7)
    assert (by_loc[4]["a"], by_loc[4]["b"], by_loc[4]["d"]) == (2, 5, 7)


def test_grid_plan_has_no_shuffle(spark):
    """The grid build must stay a narrow range scan — no exchange."""
    df = combo_grid(spark, TEST_COMBOS1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
