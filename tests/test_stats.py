import math

import numpy as np
import pytest
from pyspark.sql import Row

from xyzpy_spark.functions.stats import (
    RunningStatistics,
    covariance_matrix,
    estimate_from_repeats,
    format_number_with_error,
    running_stats,
)


def test_running_stats_vs_numpy(spark):
    rng = np.random.default_rng(0)
    xs = rng.normal(10.0, 2.0, size=200)
    df = spark.createDataFrame([Row(x=float(v)) for v in xs])
    r = running_stats(df, "x").collect()[0]
    assert r["mean"] == pytest.approx(xs.mean())
    assert r["var"] == pytest.approx(xs.var(ddof=1))
    assert r["std"] == pytest.approx(xs.std(ddof=1))
    assert r["err"] == pytest.approx(xs.std(ddof=1) / math.sqrt(200))
    assert r["count"] == 200


def test_covariance_matrix_vs_numpy(spark):
    """Reference cross-check: Welford covariance == np.cov
    (tests/test_utils.py:129-149)."""
    rng = np.random.default_rng(1)
    a = rng.normal(size=100)
    b = 2 * a + rng.normal(size=100)
    c = rng.normal(size=100)
    df = spark.createDataFrame(
        [Row(a=float(x), b=float(y), c=float(z)) for x, y, z in zip(a, b, c)]
    )
    r = covariance_matrix(df, ["a", "b", "c"]).collect()[0]
    expect = np.cov(np.vstack([a, b, c]))
    assert r["cov_a_a"] == pytest.approx(expect[0, 0])
    assert r["cov_a_b"] == pytest.approx(expect[0, 1])
    assert r["cov_b_c"] == pytest.approx(expect[1, 2])
    assert r["cov_c_c"] == pytest.approx(expect[2, 2])


def test_to_uncertainties_reference_example(spark):
    """The reference's documented example (utils.py:617-636): perfectly
    correlated sequences (1,3,2) and (2,6,4) -> x+y has the full
    propagated error, x/y has exactly zero."""
    from xyzpy_spark.functions.stats import to_uncertainties

    df = spark.createDataFrame([(1.0, 2.0), (3.0, 6.0), (2.0, 4.0)],
                               ["x", "y"])
    x, y = to_uncertainties(df, ["x", "y"])  # bias=True: population cov
    s = x + y
    assert s.nominal_value == pytest.approx(6.0)
    assert s.std_dev == pytest.approx(2.4494897427831783)
    r = x / y
    assert r.nominal_value == pytest.approx(0.5)
    assert r.std_dev == pytest.approx(0.0, abs=1e-12)


def test_uvar_propagation_vs_sampled():
    """Delta-method errors match direct statistics of the transformed
    sample for linear combinations."""
    from xyzpy_spark.functions.stats import correlated_values

    rng = np.random.default_rng(0)
    a = rng.normal(5, 1, 20000)
    b = 0.5 * a + rng.normal(1, 0.5, 20000)
    cov = np.cov(np.vstack([a, b]), bias=True)
    x, y = correlated_values([a.mean(), b.mean()], cov)
    z = 2 * x - 3 * y + 1
    direct = 2 * a - 3 * b + 1
    assert z.nominal_value == pytest.approx(direct.mean())
    assert z.std_dev == pytest.approx(direct.std(), rel=1e-9)
    # nonlinear: first-order error for x**2 is 2|x|*std(x)
    q = x**2
    assert q.std_dev == pytest.approx(2 * abs(a.mean()) * np.sqrt(cov[0, 0]))


def test_running_statistics_accumulator_matches_numpy():
    rng = np.random.default_rng(2)
    xs = rng.normal(5.0, 1.0, size=500)
    acc = RunningStatistics()
    for chunk in np.array_split(xs, 7):
        acc.update(chunk)
    assert acc.mean == pytest.approx(xs.mean())
    assert acc.var == pytest.approx(xs.var(ddof=1))
    assert acc.count == 500


def test_estimate_from_repeats_converges(spark):
    """fn = sum of 10 uniform rands -> mean ~5 within 10%
    (reference tests/test_utils.py:152-159)."""

    def ten_rands(seed):
        rng = np.random.default_rng(seed)
        return float(rng.uniform(size=10).sum())

    stats = estimate_from_repeats(
        spark, ten_rands, rtol=0.02, batch_size=64, max_samples=4096
    )
    assert stats.converged(0.02)
    assert stats.mean == pytest.approx(5.0, rel=0.1)


@pytest.mark.parametrize(
    "x,err,expect",
    [
        (0.15432, 0.0634, "0.154(63)"),
        (-14.321, 0.4, "-14.32(40)"),
        (5.9, 0.0, "5.9"),
        (123.456, 12.3, "123(12)"),
    ],
)
def test_format_number_with_error(x, err, expect):
    assert format_number_with_error(x, err) == expect


def test_running_stats_string_by(spark):
    """by='col' must group by that one column, not its characters."""
    from xyzpy_spark.functions.stats import running_stats

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], ["g", "v"]
    )
    rows = {r["g"]: r["mean"] for r in running_stats(df, "v", by="g").collect()}
    assert rows == {"a": 2.0, "b": 5.0}


def test_to_uncertainties_too_few_rows_clear_error(spark):
    import pytest

    from xyzpy_spark.functions.stats import to_uncertainties

    df = spark.createDataFrame([(1.0, 2.0)], ["x", "y"])
    with pytest.raises(ValueError, match="rows"):
        to_uncertainties(df, ["x", "y"], bias=False)


def test_covariance_matrix_alias_collision_raises(spark):
    import pytest

    from xyzpy_spark.functions.stats import covariance_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 4.0)], ["a_b", "c", "a", "b_c"]
    )
    with pytest.raises(ValueError, match="collide"):
        covariance_matrix(df, ["a_b", "c", "a", "b_c"])


def test_benchmarker_unnamed_lambdas_disambiguated(spark):
    from xyzpy_spark.functions.benchmark import Benchmarker

    b = Benchmarker([lambda n: n, lambda n: n * 2], spark=spark)
    assert len(set(b.names)) == 2
