import numpy as np
import pytest

from conftest import (
    TEST_COMBOS1,
    fn3_fba,
    foo2_array,
    foo2_array_array,
    foo2_dataset,
    foo2_zarray1_zarray2,
    foo3_float_bool,
    foo3_scalar,
)
from xyzpy_spark.runner import combo_runner_to_df, case_runner_to_df, to_dense_pandas
from xyzpy_spark.missing import union_grid_view


def test_scalar_grid_matches_closed_form(spark):
    """Mirrors reference tests/test_gen/test_combo_runner.py:29-46."""
    df = combo_runner_to_df(spark, foo3_scalar, TEST_COMBOS1, var_names="x")
    rows = df.collect()
    assert len(rows) == 24
    expect = {
        (a, b, c): a + b + c
        for a in [1, 2]
        for b in [10, 20, 30]
        for c in [100, 200, 300, 400]
    }
    for r in rows:
        assert r["x"] == expect[(r["a"], r["b"], r["c"])]
    assert dict(df.dtypes)["x"] == "bigint"


@pytest.mark.parametrize("shuffle", [False, True, 123])
def test_shuffle_does_not_change_results(spark, shuffle):
    df = combo_runner_to_df(
        spark, foo3_scalar, TEST_COMBOS1, var_names="x", shuffle=shuffle
    )
    vals = sorted((r["a"], r["b"], r["c"], r["x"]) for r in df.collect())
    assert len(vals) == 24
    assert all(x == a + b + c for a, b, c, x in vals)


def test_multi_output_split(spark):
    df = combo_runner_to_df(
        spark, foo3_float_bool, TEST_COMBOS1, var_names=["sum", "even"]
    )
    schema = dict(df.dtypes)
    assert schema["sum"] == "bigint"
    assert schema["even"] == "boolean"
    for r in df.collect():
        assert r["sum"] == r["a"] + r["b"] + r["c"]
        assert r["even"] == (r["a"] % 2 == 0)


def test_array_output_wide_mode(spark):
    df = combo_runner_to_df(
        spark,
        foo2_array,
        {"a": [1, 2], "b": [10, 20]},
        var_names="x",
        var_dims={"x": ["time"]},
        explode=False,
    )
    assert dict(df.dtypes)["x"] == "array<double>"
    for r in df.collect():
        np.testing.assert_allclose(
            r["x"], [r["b"] + r["a"] + 0.1 * i for i in range(10)]
        )


def test_array_output_explode_mode(spark):
    df = combo_runner_to_df(
        spark,
        foo2_array,
        {"a": [1, 2], "b": [10, 20]},
        var_names="x",
        var_dims={"x": ["time"]},
        var_coords={"time": np.arange(10)},
        explode=True,
    )
    rows = df.collect()
    assert len(rows) == 2 * 2 * 10
    for r in rows:
        assert r["x"] == pytest.approx(r["b"] + r["a"] + 0.1 * r["time"])


def test_shared_internal_dim(spark):
    """Two array vars sharing one internal dim (foo2_array_array)."""
    df = combo_runner_to_df(
        spark,
        foo2_array_array,
        {"a": [1, 2], "b": [10, 20]},
        var_names=["x", "y"],
        var_dims={("x", "y"): "seed"},
        explode=True,
    )
    rows = df.collect()
    assert len(rows) == 2 * 2 * 5
    for r in rows:
        assert r["x"] == r["b"] + r["seed"] * r["a"]
        assert r["y"] == r["b"] - r["seed"] * r["a"]


def test_complex_output_struct(spark):
    df = combo_runner_to_df(
        spark,
        foo2_zarray1_zarray2,
        {"a": [1, 2], "b": [10, 20]},
        var_names=["zx", "zy"],
        var_dims={("zx", "zy"): "i"},
        explode=True,
    )
    assert dict(df.dtypes)["zx"] == "struct<re:double,im:double>"
    for r in df.collect():
        assert r["zx"]["re"] == pytest.approx(r["b"] + r["a"])
        assert r["zx"]["im"] == pytest.approx(0.1 * r["i"])
        assert r["zy"]["im"] == pytest.approx(-0.1 * r["i"])


def test_dict_returning_fn_infers_var_names(spark):
    df = combo_runner_to_df(spark, foo2_dataset, {"a": [1, 2], "b": [10, 20]})
    assert set(df.columns) == {"a", "b", "sum", "diff"}
    for r in df.collect():
        assert r["sum"] == r["a"] + r["b"]
        assert r["diff"] == r["a"] - r["b"]


def test_constants_and_resources(spark):
    calls = {}

    def f(a, b, c, big):
        assert big == "RESOURCE"
        return a + b + c

    df = combo_runner_to_df(
        spark,
        f,
        {"a": [1, 2]},
        var_names="x",
        constants={"b": 10, "c": 100},
        resources={"big": "RESOURCE"},
    )
    # constants/resources are not dimensioned: only combo cols + output
    assert set(df.columns) == {"a", "x"}
    assert sorted(r["x"] for r in df.collect()) == [111, 112]


def test_cases_union_grid_view(spark):
    """Sparse cases -> union grid with null holes (reference
    tests/test_gen/test_case_runner.py:63-74)."""
    df = case_runner_to_df(
        spark,
        foo3_scalar,
        [(1, 20, 300), (3, 20, 100)],
        fn_args=["a", "b", "c"],
        var_names="x",
    )
    assert df.count() == 2
    dense = union_grid_view(df, ["a", "b", "c"], ["x"])
    rows = {(r["a"], r["b"], r["c"]): r["x"] for r in dense.collect()}
    assert len(rows) == 4  # union grid a in {1,3} x b {20} x c {100,300}
    assert rows[(1, 20, 300)] == 321
    assert rows[(3, 20, 100)] == 123
    assert rows[(1, 20, 100)] is None
    assert rows[(3, 20, 300)] is None


def test_error_policy_keep(spark):
    def f(a):
        if a == 2:
            raise RuntimeError("boom")
        return a * 10

    df = combo_runner_to_df(
        spark, f, {"a": [1, 2, 3]}, var_names="x", on_error="keep"
    )
    rows = {r["a"]: (r["x"], r["_error"]) for r in df.collect()}
    assert rows[1] == (10, None)
    assert rows[3] == (30, None)
    assert rows[2][0] is None
    assert "boom" in rows[2][1]


def test_error_policy_raise(spark):
    def f(a):
        raise RuntimeError("kaput")

    # sample call for schema inference already raises
    with pytest.raises(RuntimeError, match="kaput"):
        combo_runner_to_df(spark, f, {"a": [1]}, var_names="x")


def test_golden_fn3_fba(spark):
    """Golden dataset (FIXTURES.md §3): long-format equivalent of
    fn3_fba_ds — reference tests/test_gen/test_farming.py:65-81."""
    df = combo_runner_to_df(
        spark,
        fn3_fba,
        {"a": [1, 2], "b": [3, 4]},
        var_names=["sum", "even", "array"],
        var_dims={"array": ["time"]},
        var_coords={"time": np.linspace(0, 1, 3)},
        constants={"c": 100},
    )
    rows = df.collect()
    assert len(rows) == 2 * 2 * 3
    assert set(df.columns) == {"a", "b", "time", "sum", "even", "array"}
    for r in rows:
        assert r["sum"] == r["a"] + r["b"] + 100
        assert r["even"] == (r["a"] % 2 == 0)
        assert r["array"] == pytest.approx(r["a"] * (r["b"] * r["time"] + 100))


def test_to_dense_pandas(spark):
    df = case_runner_to_df(
        spark,
        foo3_scalar,
        [(1, 20, 300), (3, 20, 100)],
        fn_args=["a", "b", "c"],
        var_names="x",
    )
    dense = to_dense_pandas(df, ["a", "b", "c"])
    assert dense.shape == (4, 1)
    assert dense.loc[(1, 20, 300), "x"] == 321
    assert np.isnan(dense.loc[(1, 20, 100), "x"])


def test_vectorized_internal_dims_matches_per_point(spark):
    """vectorized=True now unrolls internal-dim outputs in the same
    pass; result must equal the per-point path row for row."""
    import numpy as np

    t_coords = [0.0, 0.5, 1.0]

    def kern_point(a, b):
        t = np.array(t_coords)
        return a * (b * t + 100), a + b  # (array over time, scalar)

    def kern_vec(a, b):
        t = np.array(t_coords)
        return a[:, None] * (b[:, None] * t[None, :] + 100), a + b

    common = dict(
        combos={"a": [1, 2, 3], "b": [10, 20]},
        var_names=["arr", "s"],
        var_dims={"arr": ["time"]},
        var_coords={"time": t_coords},
        var_types={"arr": float, "s": int},
    )
    ref = combo_runner_to_df(spark, kern_point, **common).collect()
    vec = combo_runner_to_df(
        spark, kern_vec, vectorized=True, **common
    ).collect()
    key = lambda r: (r["a"], r["b"], r["time"])  # noqa: E731
    ref_m = {key(r): (r["arr"], r["s"]) for r in ref}
    vec_m = {key(r): (r["arr"], r["s"]) for r in vec}
    assert len(ref_m) == 3 * 2 * 3
    assert ref_m == vec_m


def test_to_dense_arrays_matches_dense_pandas(spark):
    from xyzpy_spark.runner import to_dense_arrays

    df = case_runner_to_df(
        spark,
        foo3_scalar,
        [(1, 20, 300), (3, 20, 100)],
        fn_args=["a", "b", "c"],
        var_names="x",
    )
    dense = to_dense_pandas(df, ["a", "b", "c"])
    coords, arrays = to_dense_arrays(df, ["a", "b", "c"])
    assert coords == {"a": [1, 3], "b": [20], "c": [100, 300]}
    vdims, arr = arrays["x"]
    assert vdims == ("a", "b", "c")
    assert arr.shape == (2, 1, 2)
    # same values, same hole pattern as the MultiIndex frame
    np.testing.assert_array_equal(
        arr.ravel(), dense["x"].to_numpy()
    )
    assert arr[0, 0, 1] == 321          # (1, 20, 300)
    assert np.isnan(arr[0, 0, 0])       # (1, 20, 100) hole


def test_to_dense_arrays_var_dims_reduction(spark):
    """A var that only varies over a subset of dims is reduced to its
    own dims (reference results_to_ds per-var dims)."""
    from xyzpy_spark.runner import to_dense_arrays

    def kern(a, b):
        return a * 10 + b, a * 1.0  # second output ignores b

    df = combo_runner_to_df(
        spark, kern, {"a": [1, 2, 3], "b": [10, 20]},
        var_names=["y", "a_only"],
    )
    coords, arrays = to_dense_arrays(
        df, ["a", "b"], var_dims={"a_only": ["a"]}
    )
    vdims, arr = arrays["a_only"]
    assert vdims == ("a",)
    assert arr.tolist() == [1.0, 2.0, 3.0]
    ydims, yarr = arrays["y"]
    assert ydims == ("a", "b") and yarr.shape == (3, 2)
    assert yarr[2, 1] == 50


def test_to_xarray_roundtrip(spark):
    xr = pytest.importorskip("xarray")

    from xyzpy_spark.runner import to_xarray

    def kern(a, b):
        return a + b

    df = combo_runner_to_df(
        spark, kern, {"a": [1, 2], "b": [10, 20]}, var_names="s"
    )
    ds = to_xarray(df, ["a", "b"])
    assert isinstance(ds, xr.Dataset)
    assert list(ds["s"].dims) == ["a", "b"]
    assert ds["s"].sel(a=2, b=10).item() == 12


def test_vectorized_fast_path(spark):
    """vectorized=True: fn sees numpy arrays, one call per batch."""
    import numpy as np

    calls = []

    def kern(a, b):
        assert isinstance(a, np.ndarray) and isinstance(b, np.ndarray)
        return a * 1.5 + b * b, a - b

    df = combo_runner_to_df(
        spark,
        kern,
        {"a": range(20), "b": range(30)},
        var_names=["y", "z"],
        var_types={"y": float, "z": int},
        vectorized=True,
    )
    rows = df.collect()
    assert len(rows) == 600
    for r in rows:
        assert r["y"] == pytest.approx(r["a"] * 1.5 + r["b"] ** 2)
        assert r["z"] == r["a"] - r["b"]


def test_vectorized_internal_dims_requires_explode(spark):
    def kern(a):
        return a

    with pytest.raises(ValueError, match="explode=True"):
        combo_runner_to_df(
            spark,
            kern,
            {"a": [1]},
            var_names="y",
            var_dims={"y": ["t"]},
            var_types={"y": float},
            var_coords={"t": [0, 1]},
            vectorized=True,
            explode=False,
        )


def test_vs_reference_quickstart(spark):
    """docs/index.md quick-start: sum/diff over a 36-point grid."""

    def sumdiff(a, b):
        return a + b, a - b

    df = combo_runner_to_df(
        spark,
        sumdiff,
        {"a": range(1, 10), "b": range(23, 27)},
        var_names=["sum", "diff"],
    )
    assert df.count() == 36
    assert df.where("sum != a + b OR diff != a - b").count() == 0


def test_vectorized_on_error_keep(spark):
    """vectorized=True + on_error='keep': a failing batch falls back
    to per-point isolation — good points keep values, bad points get
    NULL outputs and the error string (review regression: _error was
    in the schema but never emitted -> KeyError)."""
    from xyzpy_spark.runner import combo_runner_to_df

    def kernel(a, b):
        import numpy as np

        if np.any(a == 3):
            raise ValueError("bad a")
        return a * 10 + b

    df = combo_runner_to_df(
        spark, kernel, {"a": [1, 2, 3], "b": [5]},
        var_names="y", vectorized=True, on_error="keep",
    )
    rows = {(r["a"], r["b"]): r for r in df.collect()}
    assert len(rows) == 3
    assert rows[(1, 5)]["y"] == 15 and rows[(1, 5)]["_error"] is None
    assert rows[(3, 5)]["y"] is None
    assert "bad a" in rows[(3, 5)]["_error"]
