import math

import numpy as np
import pytest
from pyspark.sql import Row

from xyzpy_spark.operators.reductions import (
    aggregate_over,
    auto_bins,
    check_runs,
    fuse_dims,
    heatmap_table,
    histogram,
    post_fix,
    trimna,
)


@pytest.fixture(scope="module")
def grid_df(spark):
    """3d sweep-style table: x[7], z[4], y = deterministic values."""
    rows = [
        Row(x=float(x), z=float(z), y=float(x * 10 + z))
        for x in range(7)
        for z in range(4)
    ]
    return spark.createDataFrame(rows)


def test_aggregate_over_median(spark, grid_df):
    out = aggregate_over(grid_df, ["x"], "y", method="median")
    rows = {r["x"]: r["y"] for r in out.collect()}
    for x in range(7):
        assert rows[float(x)] == pytest.approx(x * 10 + 1.5)


def test_aggregate_over_mean_with_stderr(spark, grid_df):
    out = aggregate_over(grid_df, ["x"], "y", method="mean", err="stderr")
    r = {r["x"]: r for r in out.collect()}[0.0]
    vals = np.array([0.0, 1.0, 2.0, 3.0])
    assert r["y"] == pytest.approx(vals.mean())
    assert r["y_err"] == pytest.approx(vals.std(ddof=1) / 2)


def test_aggregate_over_quantile_band(spark, grid_df):
    out = aggregate_over(grid_df, ["x"], "y", method="median", err=0.5)
    r = {r["x"]: r for r in out.collect()}[0.0]
    assert r["y_lo"] == pytest.approx(np.quantile([0, 1, 2, 3], 0.25))
    assert r["y_hi"] == pytest.approx(np.quantile([0, 1, 2, 3], 0.75))


def test_aggregate_over_approx_median(spark, grid_df):
    """approx=True (percentile_approx sketch) stays close to exact."""
    exact = aggregate_over(grid_df, ["x"], "y", method="median")
    approx = aggregate_over(grid_df, ["x"], "y", method="median", approx=True)
    e = {r["x"]: r["y"] for r in exact.collect()}
    a = {r["x"]: r["y"] for r in approx.collect()}
    for x in e:
        assert abs(e[x] - a[x]) <= 1.0  # within one coordinate step


def test_aggregate_over_all_dims(spark, grid_df):
    out = aggregate_over(grid_df, [], "y", method="max")
    assert out.collect()[0]["y"] == 63.0


def test_auto_bins():
    assert auto_bins(4) == 3
    assert auto_bins(100) == 10
    assert auto_bins(10**6) == 50


def test_histogram_counts(spark):
    df = spark.createDataFrame([Row(v=float(i)) for i in range(100)])
    out = histogram(df, "v", bins=10, x_range=(0.0, 100.0))
    rows = sorted(out.collect(), key=lambda r: r["bin"])
    assert len(rows) == 10
    assert all(r["count"] == 10 for r in rows)
    assert rows[0]["v"] == pytest.approx(5.0)  # bin center


def test_histogram_density_sums_to_one(spark):
    df = spark.createDataFrame([Row(v=float(i % 17)) for i in range(100)])
    out = histogram(df, "v", bins=5, density=True)
    total = sum(r["prob"] * (16.0 / 5) for r in out.collect())  # width = (max-min)/bins
    assert total == pytest.approx(1.0)


def test_histogram_max_value_in_last_bin(spark):
    df = spark.createDataFrame([Row(v=0.0), Row(v=10.0)])
    out = histogram(df, "v", bins=2)
    rows = {r["bin"]: r["count"] for r in out.collect()}
    assert rows == {0: 1, 1: 1}


def test_heatmap_table(spark, grid_df):
    out = heatmap_table(grid_df, "z", "x", "y", x_values=[0.0, 1.0, 2.0, 3.0])
    rows = out.collect()
    assert len(rows) == 7
    assert rows[0]["x"] == 0.0
    assert rows[0]["0.0"] == 0.0
    assert rows[0]["3.0"] == 3.0
    assert rows[6]["2.0"] == 62.0


def test_fuse_dims(spark, grid_df):
    out = fuse_dims(grid_df, ["x", "z"], "key")
    rows = out.collect()
    assert len(rows) == 28
    r0 = min(rows, key=lambda r: (r["x"], r["z"]))
    assert r0["key"] == "0.0, 0.0"
    assert r0["key_idx"] == 0
    assert len({r["key_idx"] for r in rows}) == 28


def test_style_indices(spark):
    from xyzpy_spark.operators.reductions import style_indices

    df = spark.createDataFrame(
        [Row(alg=a, size=s, rep=r, v=1.0)
         for a in ("qmc", "mc") for s in (8, 16, 32) for r in (0, 1)]
    )
    out = style_indices(df, {"hue": "alg", "marker": ["size", "rep"]})
    rows = out.collect()
    hues = {r["hue"]: r["hue_idx"] for r in rows}
    assert hues == {"mc": 0, "qmc": 1}  # sorted channel values
    markers = {r["marker"]: r["marker_idx"] for r in rows}
    assert len(markers) == 6
    assert markers["8, 0"] == 0 and markers["32, 1"] == 5


def test_trimna(spark):
    rows = [
        Row(a=1, b=10, v=1.0),
        Row(a=1, b=20, v=None),
        Row(a=2, b=10, v=None),
        Row(a=2, b=20, v=None),
    ]
    df = spark.createDataFrame(rows)
    out = trimna(df, ["a", "b"], ["v"])
    kept = {(r["a"], r["b"]) for r in out.collect()}
    assert kept == {(1, 10)}  # a=2 slice all-null, b=20 slice all-null


def test_post_fix(spark):
    df = spark.createDataFrame([Row(a=1, x=2.0)])
    out = post_fix(df, "run1", ["x"])
    assert set(out.columns) == {"a", "x_run1"}


def test_check_runs_gaps(spark):
    df = spark.createDataFrame(
        [Row(run=i, v=1.0) for i in [1, 2, 3, 7, 8, 12]]
    )
    r = check_runs(df, "run", ["v"]).collect()[0]
    assert (r["min"], r["max"], r["count"]) == (1, 12, 6)
    assert sorted(map(list, r["gaps"])) == [[4, 6], [9, 11]]


def test_style_indices_conflicting_channel_raises(spark):
    """A preexisting column with the channel's name that is not the
    mapped dim must raise, not silently skip the {ch}_idx contract."""
    import pytest
    from xyzpy_spark.operators.reductions import style_indices

    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], ["hue", "alg"]
    )
    with pytest.raises(ValueError, match="hue"):
        style_indices(df, {"hue": "alg"})


def test_histogram_x_range_excludes_outliers(spark):
    """np.histogram semantics: values outside x_range are dropped,
    not clamped into edge bins (review regression)."""
    from xyzpy_spark.operators.reductions import histogram

    df = spark.createDataFrame(
        [(v,) for v in [-3.0, 0.1, 0.5, 0.9, 5.0, 1.0]], ["v"]
    )
    out = {r["bin"]: r["count"] for r in
           histogram(df, "v", bins=2, x_range=(0.0, 1.0)).collect()}
    # -3 and 5 excluded; 1.0 == hi clamps into last bin; matches
    # np.histogram([0.1, 0.5, 0.9, 1.0], bins=2, range=(0, 1)) == [1, 3]
    assert out == {0: 1, 1: 3}
    assert all(b >= 0 for b in out)


def test_histogram_empty_input_clear_error(spark):
    import pytest
    from pyspark.sql import functions as F
    from xyzpy_spark.operators.reductions import histogram

    df = spark.createDataFrame([(1.0,)], ["v"]).where(F.lit(False))
    with pytest.raises(ValueError, match="no non-null"):
        histogram(df, "v")


def test_aggregate_over_invalid_err_raises(spark):
    import pytest
    from xyzpy_spark.operators.reductions import aggregate_over

    df = spark.createDataFrame([(1, 2.0)], ["a", "v"])
    with pytest.raises(ValueError, match="err"):
        aggregate_over(df, [], ["v"], err="sdt")


def test_fuse_dims_label_collision_no_fanout(spark):
    """Two distinct dim tuples with the same concatenated label must
    not fan rows out through the idx join (review regression)."""
    from xyzpy_spark.operators.reductions import fuse_dims

    df = spark.createDataFrame(
        [("x, y", "z", 1.0), ("x", "y, z", 2.0)], ["a", "b", "v"]
    )
    out = fuse_dims(df, ["a", "b"], "ch")
    assert out.count() == 2
    rows = {r["v"]: r["ch_idx"] for r in out.collect()}
    assert set(rows.values()) == {0, 1}  # distinct tuples, distinct idx
