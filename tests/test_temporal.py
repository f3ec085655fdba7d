"""Temporal operators (asof_join / range_join / time_rollup) and
deterministic sampling — verified against pandas merge_asof, naive
non-equi joins, and per-level aggregation."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xyzpy_spark.operators.temporal import asof_join, range_join, time_rollup
from xyzpy_spark.pipeline.sampling import (
    hash_sample,
    split_train_eval,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ticks(spark):
    """Per-key irregular numeric time series: left probes, right quotes."""
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_l),
            "t": rng.integers(0, 1000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_r),
            "t": rng.integers(0, 1000, n_r).astype("int64"),
            "rid": np.arange(n_r, dtype="int64"),
            "px": np.round(rng.normal(100, 5, n_r), 3),
        }
    )
    # merge_asof needs unique right (k, t) for a deterministic answer
    right = right.drop_duplicates(["k", "t"], keep="last")
    return left, right


def test_asof_join_matches_pandas_merge_asof(spark, ticks):
    lpd, rpd = ticks
    got = (
        asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="t",
            by="k",
            value_cols=["px", "rid"],
            tiebreak=["rid"],
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpd.sort_values("t"),
        rpd.sort_values("t"),
        on="t",
        by="k",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    assert len(got) == len(lpd)
    pd.testing.assert_series_equal(
        got["px"], exp["px"], check_names=False
    )
    pd.testing.assert_series_equal(
        got["rid"].astype("float64"),
        exp["rid"].astype("float64"),
        check_names=False,
    )


def test_asof_join_strict_excludes_equal(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1, 1], "t": [10, 20]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [10, 15], "v": [1.0, 2.0]})
    )
    loose = asof_join(
        left, right, on="t", by="k", value_cols="v"
    ).toPandas().sort_values("t")
    strict = asof_join(
        left, right, on="t", by="k", value_cols="v", strict=True
    ).toPandas().sort_values("t")
    assert loose["v"].tolist() == [1.0, 2.0]
    # strict: the t=10 left row must NOT see the t=10 right row
    assert strict["v"].isna().tolist() == [True, False]
    assert strict["v"].tolist()[1] == 2.0


def _naive_range_join(spark, left, right, lo, hi):
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    return left.join(
        r,
        (F.col("r_t") > F.col("t") + F.lit(lo))
        & (F.col("r_t") <= F.col("t") + F.lit(hi)),
        "inner",
    )


def test_range_join_keyed(spark, ticks):
    lpd, rpd = ticks
    left, right = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    got = (
        range_join(left, right, on="t", by="k", lower=0, upper=50)
        .select("lid", "r_rid")
        .toPandas()
        .sort_values(["lid", "r_rid"])
        .reset_index(drop=True)
    )
    exp = (
        _naive_range_join(spark, left, right, 0, 50)
        .where(F.col("k") == F.col("r_k"))
        .select("lid", "r_rid")
        .toPandas()
        .sort_values(["lid", "r_rid"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp)


def test_range_join_keyless_bucketed_matches_naive(spark, ticks):
    lpd, rpd = ticks
    left = spark.createDataFrame(lpd[["lid", "t"]])
    right = spark.createDataFrame(rpd[["rid", "t"]])
    got = (
        range_join(left, right, on="t", lower=0, upper=37, bin_width=37)
        .select("lid", "r_rid")
        .toPandas()
        .sort_values(["lid", "r_rid"])
        .reset_index(drop=True)
    )
    exp = (
        _naive_range_join(spark, left, right, 0, 37)
        .select("lid", "r_rid")
        .toPandas()
        .sort_values(["lid", "r_rid"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp)


def test_range_join_keyless_binned_left_matches_naive(spark, ticks):
    lpd, rpd = ticks
    left = spark.createDataFrame(lpd[["lid", "t"]])
    right = spark.createDataFrame(rpd[["rid", "t"]])
    got = (
        range_join(left, right, on="t", lower=0, upper=37, bin_width=37,
                   how="left")
        .select("lid", "r_rid")
        .toPandas()
        .sort_values(["lid", "r_rid"])
        .reset_index(drop=True)
    )
    r = right.select(F.col("rid").alias("r_rid"), F.col("t").alias("r_t"))
    exp = (
        left.join(
            r,
            (F.col("r_t") > F.col("t")) & (F.col("r_t") <= F.col("t") + 37),
            "left",
        )
        .select("lid", "r_rid")
        .toPandas()
        .sort_values(["lid", "r_rid"])
        .reset_index(drop=True)
    )
    # every left row survives, unmatched ones exactly once with null
    assert set(got["lid"]) == set(lpd["lid"])
    pd.testing.assert_frame_equal(got, exp)


def test_range_join_binned_rejects_unsupported_how(spark, ticks):
    lpd, rpd = ticks
    left = spark.createDataFrame(lpd[["lid", "t"]])
    right = spark.createDataFrame(rpd[["rid", "t"]])
    with pytest.raises(ValueError, match="inner.*left"):
        range_join(left, right, on="t", lower=0, upper=37, bin_width=37,
                   how="full")


def test_time_rollup_levels_match_single_pass_aggs(spark):
    rng = np.random.default_rng(3)
    n = 500
    ev = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 72 * 3600, n), unit="s"),
            "v": np.round(rng.uniform(0, 10, n), 2),
        }
    )
    df = spark.createDataFrame(ev)
    out = time_rollup(
        df,
        "ts",
        {"n": F.count(F.lit(1)), "s": F.sum(F.col("v").cast("decimal(18,2)")).cast("double")},
        levels=("hour", "day"),
    ).toPandas()

    hours = out[out.level == "hour"]
    days = out[out.level == "day"]
    total = out[out.level == "total"]
    exp_h = (
        ev.groupby(ev.ts.dt.floor("h"))
        .agg(n=("v", "size"), s=("v", "sum"))
        .reset_index()
    )
    assert len(hours) == len(exp_h)
    assert len(days) == ev.ts.dt.floor("d").nunique()
    assert len(total) == 1 and total.bucket.isna().all()
    assert int(total.n.iloc[0]) == n
    assert hours.n.sum() == days.n.sum() == n
    got_s = hours.sort_values("bucket").s.to_numpy()
    np.testing.assert_allclose(
        got_s, exp_h.sort_values("ts").s.to_numpy(), atol=1e-9
    )


def test_time_rollup_with_by_keys(spark):
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-03-01 00:10", "2024-03-01 00:40", "2024-03-02 05:00"]
            ),
            "g": ["a", "a", "b"],
        }
    )
    out = time_rollup(
        spark.createDataFrame(ev),
        "ts",
        {"n": F.count(F.lit(1))},
        levels=("day",),
        by="g",
    ).toPandas()
    # day rows at full g detail, per-g totals, one grand total
    day = out[(out.level == "day") & out.g.notna()]
    assert set(zip(day.g, day.n)) == {("a", 2), ("b", 1)}
    per_g_tot = out[(out.level == "total") & out.g.notna()]
    assert set(zip(per_g_tot.g, per_g_tot.n)) == {("a", 2), ("b", 1)}
    grand = out[(out.level == "total") & out.g.isna()]
    assert len(grand) == 1 and int(grand.n.iloc[0]) == 3


def test_hash_sample_deterministic_and_partition_independent(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    a = set(
        r.k for r in hash_sample(df, "k", 0.25).collect()
    )
    b = set(
        r.k
        for r in hash_sample(df.repartition(13), "k", 0.25).collect()
    )
    assert a == b
    # fraction lands near 25%
    assert 0.23 < len(a) / 20000 < 0.27
    # distinct salt -> a different (nearly independent) sample
    c = set(r.k for r in hash_sample(df, "k", 0.25, salt="x").collect())
    assert c != a
    overlap = len(a & c) / len(a)
    assert 0.15 < overlap < 0.35  # ~25% expected under independence


def test_stratified_sample_fractions(spark):
    df = (
        spark.range(0, 30000)
        .withColumnRenamed("id", "k")
        .withColumn(
            "s",
            F.when(F.col("k") % 3 == 0, "a")
            .when(F.col("k") % 3 == 1, "b")
            .otherwise("c"),
        )
    )
    out = (
        stratified_sample(df, "k", "s", {"a": 1.0, "b": 0.2})
        .groupBy("s")
        .count()
        .toPandas()
        .set_index("s")["count"]
    )
    assert out.get("a") == 10000  # fraction 1.0 keeps everything
    assert 1700 < out.get("b") < 2300
    assert "c" not in out.index  # default 0.0 drops unlisted strata


def test_split_train_eval_disjoint_complete(spark):
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    train, ev = split_train_eval(df, "k", eval_fraction=0.2)
    nt, ne = train.count(), ev.count()
    assert nt + ne == 10000
    assert 1700 < ne < 2300
    assert train.join(ev, "k", "inner").count() == 0


# -- skew: salted joins ------------------------------------------------


def _skew_tables(spark):
    import pandas as pd

    left = pd.DataFrame(
        {
            # key 0 is pathologically hot (90% of rows)
            "k": [0] * 9000 + list(range(1, 1001)),
            "lv": range(10000),
        }
    )
    right = pd.DataFrame(
        {"k": list(range(0, 1001)) * 3, "rv": range(3003)}
    )
    return spark.createDataFrame(left), spark.createDataFrame(right)


def test_salted_join_equals_plain_join(spark):
    from xyzpy_spark.operators.skew import salted_join

    left, right = _skew_tables(spark)
    plain = {
        (r.k, r.lv, r.rv)
        for r in left.join(right, "k", "inner").collect()
    }
    salted = {
        (r.k, r.lv, r.rv)
        for r in salted_join(left, right, "k", salt=8).collect()
    }
    assert salted == plain and len(plain) == 9000 * 3 + 3000


def test_salted_join_hot_keys_only(spark):
    from xyzpy_spark.operators.skew import salted_join

    left, right = _skew_tables(spark)
    hot = spark.createDataFrame([(0,)], "k long")
    for how in ("inner", "left"):
        plain = {
            (r.k, r.lv, r.rv)
            for r in left.join(right, "k", how).collect()
        }
        salted = {
            (r.k, r.lv, r.rv)
            for r in salted_join(
                left, right, "k", salt=8, how=how, hot_keys=hot
            ).collect()
        }
        assert salted == plain


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must actually land on several salt values."""
    from pyspark.sql import functions as F

    from xyzpy_spark.operators.skew import salted_join  # noqa: F401  (api)

    left, _ = _skew_tables(spark)
    n_salts = (
        left.withColumn("_salt", (F.rand(42) * 8).cast("int"))
        .where(F.col("k") == 0)
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 8


def test_hot_keys_feeds_salted_join(spark):
    from xyzpy_spark.operators.skew import hot_keys, salted_join

    left, right = _skew_tables(spark)
    hot = hot_keys(left, "k", threshold=0.05)
    got = [r.k for r in hot.collect()]
    assert got == [0]  # only the 90% key crosses 5%
    assert dict(hot.dtypes)["k"] == "bigint"  # type preserved
    plain = {
        (r.k, r.lv, r.rv) for r in left.join(right, "k").collect()
    }
    salted = {
        (r.k, r.lv, r.rv)
        for r in salted_join(left, right, "k", salt=8, hot_keys=hot).collect()
    }
    assert salted == plain


def test_funnel_counts_first_touch_semantics(spark):
    """First-touch funnel: a user converts through step i only when
    every earlier step's FIRST occurrence is time-ordered — verified
    against a hand-computed fixture covering out-of-order first
    touches, missing steps, equal timestamps, and step validation."""
    from xyzpy_spark.operators.temporal import funnel_counts

    rows = [
        # u1: view < click < buy  -> reaches 3
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "click"),
        (1, "2024-01-01 12:00:00", "buy"),
        # u2: click BEFORE first view -> reaches only step 1
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 11:00:00", "buy"),
        # u3: view only -> step 1
        (3, "2024-01-01 08:00:00", "view"),
        # u4: equal timestamps count as ordered (>=)
        (4, "2024-01-01 10:00:00", "view"),
        (4, "2024-01-01 10:00:00", "click"),
        # u5: no view at all -> reaches nothing
        (5, "2024-01-01 10:00:00", "buy"),
    ]
    ev = spark.createDataFrame(
        [(u, t, e) for u, t, e in rows],
        "user_id long, ts_s string, event_type string",
    ).select(
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
    )
    got = {
        r["step"]: (r["event_type"], r["n_users"])
        for r in funnel_counts(ev, ["view", "click", "buy"]).collect()
    }
    assert got == {
        1: ("view", 4),   # u1 u2 u3 u4
        2: ("click", 2),  # u1 u4 (u2's click precedes its view)
        3: ("buy", 1),    # u1
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        funnel_counts(ev, [])
    with _pytest.raises(ValueError, match="distinct"):
        funnel_counts(ev, ["view", "view"])


def test_cohort_retention_matrix(spark):
    """Cohort = period of first event; per-offset distinct active
    users; n_cohort constant per cohort row — hand-computed weekly
    fixture spanning three ISO weeks (date_trunc weeks start
    Monday)."""
    from xyzpy_spark.operators.temporal import cohort_retention

    # 2024-01-01 is a Monday; weeks are Jan 1, Jan 8, Jan 15
    rows = [
        (1, "2024-01-02"), (1, "2024-01-09"), (1, "2024-01-16"),
        (2, "2024-01-03"), (2, "2024-01-17"),
        (3, "2024-01-10"),
        (3, "2024-01-10"),  # duplicate activity same week: counted once
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {
        (str(r["cohort"])[:10], r["period_offset"]): (
            r["n_active"], r["n_cohort"]
        )
        for r in cohort_retention(ev, granularity="week").collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2),  # u1 u2 week0
        ("2024-01-01", 1): (1, 2),  # u1
        ("2024-01-01", 2): (2, 2),  # u1 u2
        ("2024-01-08", 0): (1, 1),  # u3
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="granularity"):
        cohort_retention(ev, granularity="month")


def test_funnel_counts_conversion_window(spark):
    """within= bounds the WHOLE chain to first-touch + interval: a
    user whose later steps are ordered but slow falls out of the
    bounded funnel while staying in the unbounded one."""
    from xyzpy_spark.operators.temporal import funnel_counts

    rows = [
        # u1 converts within an hour
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:30:00", "buy"),
        # u2 converts, but 3 days later
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-04 10:00:00", "buy"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).select(
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
    )
    unbounded = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev, ["view", "buy"]).collect()
    }
    bounded = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            ev, ["view", "buy"], within="1 day"
        ).collect()
    }
    assert unbounded == {1: 2, 2: 2}
    assert bounded == {1: 2, 2: 1}


def test_funnel_sequential_matches_exists_semantics(spark):
    """The sequential funnel's DP must equal the declarative
    EXISTS-chain semantics (strict ts order, window from chain start)
    on an adversarial fixture: same-timestamp events (strictness),
    an early unconverted anchor whose LATER re-anchor converts inside
    the window (the resettable case first-touch cannot express), and
    random traffic checked against a python brute force."""
    import datetime as dt
    import random

    from xyzpy_spark.operators.temporal import funnel_counts_sequential

    random.seed(3)
    T0 = dt.datetime(2024, 1, 1)
    steps = ["view", "click", "purchase"]
    rows = []
    for u in range(40):
        for _ in range(random.randint(0, 12)):
            rows.append(
                (
                    u,
                    T0 + dt.timedelta(hours=random.randint(0, 2000)),
                    random.choice(steps + ["other"]),
                )
            )
    # strictness: same-ts view+click can't chain; purchase ties click
    rows += [
        (100, T0, "view"),
        (100, T0, "click"),
        (100, T0 + dt.timedelta(1), "click"),
        (100, T0 + dt.timedelta(1), "purchase"),
    ]
    # resettable: the 100-day-later view anchors a windowed conversion
    rows += [
        (101, T0, "view"),
        (101, T0 + dt.timedelta(days=100), "view"),
        (101, T0 + dt.timedelta(days=101), "click"),
        (101, T0 + dt.timedelta(days=102), "purchase"),
    ]

    def brute(within_days):
        from collections import defaultdict

        by_u = defaultdict(list)
        for u, t, s in rows:
            by_u[u].append((t, s))
        counts = [0] * len(steps)
        for evs in by_u.values():
            evs.sort()
            best = 0

            def go(level, last_t, start_t):
                nonlocal best
                best = max(best, level)
                if level == len(steps):
                    return
                for t, s in evs:
                    if s == steps[level] and (level == 0 or t > last_t):
                        st = t if level == 0 else start_t
                        if (
                            level == 0
                            or within_days is None
                            or (t - st).total_seconds()
                            <= within_days * 86400
                        ):
                            go(level + 1, t, st)

            go(0, None, None)
            for i in range(best):
                counts[i] += 1
        return {i + 1: counts[i] for i in range(len(steps))}

    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    for within, wd in [(None, None), ("7 days", 7), ("30 days", 30)]:
        got = {
            r["step"]: r["n_users"]
            for r in funnel_counts_sequential(
                df, steps, within=within
            ).collect()
        }
        assert got == brute(wd), (within, got)
    # user 100: strictness keeps it at level 2 under any window
    one = spark.createDataFrame(
        [r for r in rows if r[0] == 100],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts_sequential(one, steps).collect()
    }
    assert got == {1: 1, 2: 1, 3: 0}
    # user 101 under a 7-day window: only the re-anchored chain works
    two = spark.createDataFrame(
        [r for r in rows if r[0] == 101],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts_sequential(
            two, steps, within="7 days"
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_funnel_sequential_validates_params(spark):
    from xyzpy_spark.operators.temporal import funnel_counts_sequential

    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string"
    )
    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts_sequential(ev, [])
    with pytest.raises(ValueError, match="distinct"):
        funnel_counts_sequential(ev, ["a", "a"])
    with pytest.raises(ValueError, match="INTERVAL"):
        funnel_counts_sequential(ev, ["a", "b"], within="bogus xx")
    # the PARSED interval's sign is validated, not the string prefix:
    # an embedded negative unit is net-negative and must raise (r8
    # ADVICE — it would silently empty the funnel beyond step 1)
    with pytest.raises(ValueError, match="positive"):
        funnel_counts_sequential(
            ev, ["a", "b"], within="1 day -25 hours"
        )
    with pytest.raises(ValueError, match="positive"):
        funnel_counts_sequential(ev, ["a", "b"], within="-7 days")
    with pytest.raises(ValueError, match="positive"):
        funnel_counts_sequential(ev, ["a", "b"], within="0 seconds")
    # the r9 ADVICE scenario — anchor-dependent calendar mixes like
    # '1 month -30 days' (+1 day from January, -2 days from
    # February) — is UNREPRESENTABLE: Spark's typed interval literals
    # (the form every within= consumer uses) forbid mixing year-month
    # with day-time fields, so the eager parse probe rejects the
    # string outright instead of letting an anchor-dependent sign
    # through
    with pytest.raises(ValueError, match="INTERVAL"):
        funnel_counts_sequential(
            ev, ["a", "b"], within="1 month -30 days"
        )
    # net-positive mixed-sign intervals WITHIN one field class are
    # legal, day-time...
    funnel_counts_sequential(ev, ["a", "b"], within="2 days -25 hours")
    # ...and year-month alike; net-negative year-month still raises
    funnel_counts_sequential(ev, ["a", "b"], within="1 year -11 months")
    with pytest.raises(ValueError, match="positive"):
        funnel_counts_sequential(
            ev, ["a", "b"], within="1 year -12 months"
        )
    # empty input: zero counts, not NULLs
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts_sequential(ev, ["a", "b"]).collect()
    }
    assert got == {1: 0, 2: 0}
