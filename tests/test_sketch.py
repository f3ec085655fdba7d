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


def test_hll_distinct_error_bound_and_branches(spark):
    """Portable HLL: estimates within the theoretical error envelope
    (~1.04/sqrt(m); we assert 3x slack) on cardinalities spanning the
    linear-counting ln branch AND the raw harmonic branch, at p=8 and
    p=12."""
    from xyzpy_spark.functions.sketch import hll_distinct

    rows = [(n, i) for n in (40, 600, 20000) for i in range(n)]
    df = spark.createDataFrame(rows, "n long, v long").withColumn(
        "v", F.concat(F.col("n"), F.lit(":"), F.col("v"))
    )
    for p in (8, 12):
        m = 1 << p
        got = {
            r["n"]: r["n_distinct_hll"]
            for r in hll_distinct(df, "v", "n", p=p).collect()
        }
        for n, est in got.items():
            assert abs(est - n) <= 3 * 1.04 / (m ** 0.5) * n + 3, (
                p, n, est,
            )
    # NULLs excluded per the COUNT DISTINCT contract
    with_null = spark.createDataFrame(
        [(1, "a"), (1, None), (1, "b")], "g long, v string"
    )
    one = hll_distinct(with_null, "v", "g", p=8).collect()[0]
    assert one["registers_hit"] == 2


def test_hll_merge_law_exact(spark):
    """sketch(A U B) == merge(sketch(A), sketch(B)) EXACTLY — max is
    associative/commutative/idempotent over the registers, which is
    what makes the sketch a saved mergeable artifact (count the
    corpus once, merge each ingest increment)."""
    from xyzpy_spark.functions.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select("event_type", "user_id", "event_id")
    a = ev.where(F.col("event_id") % 3 != 0)
    b = ev.where(F.col("event_id") % 3 == 0)
    whole = hll_registers(ev, "user_id", "event_type", p=8)
    merged = hll_merge(
        [
            hll_registers(a, "user_id", "event_type", p=8),
            hll_registers(b, "user_id", "event_type", p=8),
        ],
        "event_type",
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # estimates from merged registers equal whole-input estimates
    e1 = sorted(map(tuple, hll_estimate(whole, "event_type").collect()))
    e2 = sorted(map(tuple, hll_estimate(merged, "event_type").collect()))
    assert e1 == e2 and len(e1) > 0


def test_hll_registers_multi_matches_per_column(spark):
    """The fused multi-column register pass (r14, the 100-TB one-scan
    path) is per-kind ROW-IDENTICAL to hll_registers per column —
    same md5 math, same NULL exclusion, same grouped max — so
    estimates off either path agree bit-for-bit."""
    from xyzpy_spark.functions.sketch import (
        hll_estimate,
        hll_registers,
        hll_registers_multi,
    )

    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select("event_type", "user_id", "event_id")
    fused = hll_registers_multi(
        ev, {"u": "user_id", "e": "event_id"}, "event_type", p=8
    )
    for kind, col in (("u", "user_id"), ("e", "event_id")):
        single = hll_registers(ev, col, "event_type", p=8)
        part = fused.where(F.col("kind") == kind).drop("kind")
        assert sorted(map(tuple, part.collect())) == sorted(
            map(tuple, single.collect())
        )
        e1 = sorted(
            map(tuple, hll_estimate(part, "event_type", p=8).collect())
        )
        e2 = sorted(
            map(tuple, hll_estimate(single, "event_type", p=8).collect())
        )
        assert e1 == e2 and len(e1) > 0
    # NULL exclusion: a row whose column is NULL contributes no
    # register for that kind but still contributes the other kinds
    with_null = spark.createDataFrame(
        [(1, "a", None), (1, "b", "x")], "g long, v string, w string"
    )
    regs = hll_registers_multi(with_null, {"v": "v", "w": "w"}, "g", p=8)
    per_kind = {
        r["kind"]: r["n"]
        for r in regs.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }
    assert per_kind == {"v": 2, "w": 1}


def test_hll_validates_p(spark):
    import pytest

    from xyzpy_spark.functions.sketch import hll_estimate, hll_registers

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(df, "v", p=3)
    with pytest.raises(ValueError, match="p must be"):
        hll_estimate(df, p=17)
    from xyzpy_spark.functions.sketch import hll_merge

    with pytest.raises(ValueError, match="at least one"):
        hll_merge([])
