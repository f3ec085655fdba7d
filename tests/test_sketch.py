"""Sketch aggregates: error-bounded against their exact twins."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from xyzpy_spark.functions.sketch import (
    approx_distinct,
    approx_quantiles,
    frequent_items,
    heavy_hitters,
)


def _skewed(spark, n=20000, seed=11):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 4, n),
            # zipf-ish: a few heavy values + a long uniform tail
            "v": np.where(
                rng.uniform(size=n) < 0.3,
                rng.integers(0, 5, n),
                rng.integers(0, 5000, n),
            ).astype("int64"),
            "x": rng.normal(50, 10, n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_approx_distinct_within_rsd(spark):
    df, pdf = _skewed(spark)
    got = approx_distinct(df, "v", by="g", rsd=0.02).toPandas()
    exact = pdf.groupby("g").v.nunique()
    for _, r in got.iterrows():
        e = exact[r.g]
        assert abs(r.v_approx_distinct - e) / e < 0.1, (r.v_approx_distinct, e)


def test_approx_quantiles_rank_error(spark):
    df, pdf = _skewed(spark)
    got = approx_quantiles(df, "x", (0.1, 0.5, 0.9), accuracy=10000).toPandas()
    xs = np.sort(pdf.x.to_numpy())
    for p, c in [(0.1, "q_0_1"), (0.5, "q_0_5"), (0.9, "q_0_9")]:
        # value must sit within +-1% rank of the exact quantile
        rank = np.searchsorted(xs, got[c].iloc[0]) / len(xs)
        assert abs(rank - p) < 0.01, (p, rank)


def test_frequent_items_exact_topk(spark):
    df, pdf = _skewed(spark)
    got = frequent_items(df, "v", k=5).toPandas()
    exp = pdf.v.value_counts()
    assert len(got) == 5
    # the five heavy planted values dominate; counts must be exact
    for _, r in got.iterrows():
        assert exp[r.v] == r.n
    assert set(got.n) == set(exp.iloc[:5])


def test_frequent_items_grouped(spark):
    df, pdf = _skewed(spark)
    got = frequent_items(df, "v", by="g", k=3).toPandas()
    assert set(got.g) == {0, 1, 2, 3}
    for g, sub in got.groupby("g"):
        exp = pdf[pdf.g == g].v.value_counts()
        assert sub.n.max() == exp.iloc[0]
        assert len(sub) == 3


def test_heavy_hitters_finds_planted_values(spark):
    df, pdf = _skewed(spark)
    hh = heavy_hitters(df, "v", threshold=0.03)
    vals = {v for v, _ in hh}
    exact = pdf.v.value_counts()
    expected = {str(v) for v, c in exact.items() if c > 0.03 * len(pdf)}
    assert expected <= vals  # no false negatives
    true_counts = {str(v): c for v, c in exact.items()}
    for v, est in hh:
        assert est >= true_counts.get(v, 0)  # CMS overestimates only
        assert est <= true_counts.get(v, 0) + 0.001 * len(pdf)
