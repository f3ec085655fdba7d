"""Temporal joins and rollups — as-of join, range join, multi-resolution
rollup.

The reference is a batch parameter-sweep engine with no native temporal
algebra; its closest analogs are coordinate-aligned merges
(``xyzpy/manage.py`` save/merge layer) and the time-series outputs users
sweep into datasets.  These operators supply the time-dimension queries
a large-scale (100 TB) event/training-data pipeline needs, expressed
Spark-first:

- ``asof_join`` — "latest right row at or before each left row", the
  point-in-time join used for feature lookup.  Implemented with the
  union + last-value-window trick: ONE shuffle on the key, no non-equi
  join, no per-row Python.  A sort-merge as-of would need a custom
  physical operator; the union-window form gets the same O(n log n)
  per-partition cost from existing codegen'd operators.
- ``range_join`` — interval/range join (events within a window after an
  anchor).  With equi keys it is a plain SMJ + residual predicate;
  without keys it buckets time into range-width bins and equi-joins on
  the bin (each left row probes exactly two bins), which is the shape
  that avoids the O(n*m) nested-loop a raw non-equi join degenerates to.
- ``time_rollup`` — hypertable-style multi-resolution aggregation
  (hour/day/total) in ONE pass via ROLLUP grouping sets: partial
  map-side aggregation at every resolution, a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from ..utils import local_df, seam

__all__ = [
    "asof_join",
    "cohort_retention",
    "funnel_counts",
    "funnel_counts_sequential",
    "range_join",
    "time_rollup",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by,
    value_cols,
    tiebreak=(),
    strict: bool = False,
    suffix: str = "",
) -> DataFrame:
    """For each left row attach the most recent right row with
    ``right.on <= left.on`` (``<`` when ``strict``), matching ``by`` keys.

    Semantics match DuckDB/pandas ``ASOF LEFT JOIN`` (backward
    direction): left rows with no prior right row keep nulls.

    Plan shape: tag both sides, union, then ``last(value, ignoreNulls)``
    over (by) ordered by (on, side-tag, tiebreak) — a single hash
    exchange on ``by`` plus a per-partition sort.  At 100 TB this is the
    minimal-movement plan: no broadcast of an unbounded right side, no
    non-equi join, and AQE handles key skew by splitting oversized
    partitions of the sort.

    ``tiebreak`` columns (right side) break equal-timestamp ties
    deterministically — required for oracle-stable output when the
    right side can carry duplicate (by, on) pairs.
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = (
        [value_cols] if isinstance(value_cols, str) else list(value_cols)
    )
    tiebreak = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak)

    # right side sorts BEFORE left at equal `on` iff ties match (<=)
    rtag, ltag = (0, 1) if not strict else (1, 0)

    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.lit(ltag).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}")
          for v in value_cols],
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"__tb_{t}")
          for t in tiebreak],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in by + [on] else F.col(c)
          for c in lcols],
        F.lit(rtag).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
        *[F.col(t).alias(f"__tb_{t}") for t in tiebreak],
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col(on).asc(),
            F.col("__side").asc(),
            *[F.col(f"__tb_{t}").asc() for t in tiebreak],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        F.col("__side"),
        *[
            F.last(f"__r_{v}", ignorenulls=True)
            .over(w)
            .alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )
    # strict mode: right rows at the same `on` sort AFTER left, so they
    # are naturally excluded; no extra filter needed either way.
    return carried.where(F.col("__side") == ltag).drop("__side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by=(),
    lower,
    upper,
    bin_width=None,
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose ``on`` falls in ``(left.on + lower,
    left.on + upper]`` (half-open, exclusive lower / inclusive upper).

    ``lower``/``upper`` are Column offsets (e.g.
    ``F.expr("INTERVAL 0 SECONDS")`` / ``F.expr("INTERVAL 15 MINUTES")``)
    or numerics for numeric ``on`` columns.

    With ``by`` keys: a plain equi-join on the keys with the range as a
    residual predicate — sort-merge on the keys, no cartesian blow-up
    as long as per-key groups are bounded.

    Without keys, a raw non-equi join is a nested loop; pass
    ``bin_width`` (a numeric width or seconds for timestamps) to bucket
    ``on`` into range-width bins and equi-join on the bin id: each left
    interval spans at most ``ceil((upper-lower)/bin_width)+1`` bins, so
    the join stays hash-based and scales linearly.  Rows are
    deduplicated by the exact predicate afterwards.
    """
    from pyspark.sql import Column

    by = [by] if isinstance(by, str) else list(by)
    lo = lower if isinstance(lower, Column) else F.lit(lower)
    hi = upper if isinstance(upper, Column) else F.lit(upper)

    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    pred = (F.col(f"r_{on}") > F.col(on) + lo) & (
        F.col(f"r_{on}") <= F.col(on) + hi
    )
    if by:
        cond = pred
        for k in by:
            cond = (F.col(k) == F.col(f"r_{k}")) & cond
        return left.join(r, cond, how)

    if bin_width is None:
        return left.join(r, pred, how)

    how_n = how.lower().replace("_", "").replace("outer", "")
    if how_n not in ("inner", "left"):
        raise ValueError(
            f"range_join with bin_width supports how='inner'/'left', got {how!r}"
        )

    # keyless: bucket into bins of `bin_width`; each left anchor's
    # window (on+lo, on+hi] covers a contiguous bin range
    binw = float(bin_width)
    base = left
    if how_n == "left":
        # row identity for restoring unmatched lefts.  The id is only
        # consistent if every consumer sees the SAME evaluation — the
        # matched subtree, the anti-join probe, and the unmatched
        # subtree would otherwise each recompute `base` and a
        # nondeterministic upstream (round-robin repartition, task
        # retry) could reassign ids, duplicating or dropping rows.
        # localCheckpoint (lazy) pins one materialization for all
        # three; unlike persist()+CacheManager its blocks are released
        # by the ContextCleaner once the result is dereferenced, so
        # repeated left-range-joins in a long session don't accumulate
        # cached partitions.  Tradeoff: lineage is truncated, so a
        # lost executor (dynamic allocation scale-down, OOM kill)
        # fails the job with a missing-checkpoint-block error instead
        # of recomputing — on clusters that decommission executors
        # mid-job, disable dynamic allocation for this stage or use
        # reliable checkpointing (spark.sparkContext.setCheckpointDir
        # + .checkpoint()) at the cost of a write to shared storage.
        base = seam(
            left.withColumn("__lid", F.monotonically_increasing_id()),
            eager=False,
        )
    l_binned = base.withColumn(
        "__bin_lo", F.floor((F.col(on) + lo).cast("double") / binw).cast("long")
    ).withColumn(
        "__bin_hi", F.floor((F.col(on) + hi).cast("double") / binw).cast("long")
    )
    l_exploded = l_binned.withColumn(
        "__bin", F.explode(F.sequence("__bin_lo", "__bin_hi"))
    ).drop("__bin_lo", "__bin_hi")
    r_binned = r.withColumn(
        "__bin", F.floor(F.col(f"r_{on}").cast("double") / binw).cast("long")
    )
    matched = l_exploded.join(r_binned, ["__bin"], "inner").where(pred).drop(
        "__bin"
    )
    if how_n == "inner":
        return matched

    # left semantics: matched pairs + unmatched left rows with null
    # right columns (anti-join on the row id — shuffles only the id)
    unmatched = base.join(
        matched.select("__lid").distinct(), "__lid", "left_anti"
    )
    for f in r.schema.fields:
        unmatched = unmatched.withColumn(
            f.name, F.lit(None).cast(f.dataType)
        )
    return matched.unionByName(unmatched).drop("__lid")


def time_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: dict,
    *,
    levels=("hour", "day"),
    by=(),
) -> DataFrame:
    """Multi-resolution time aggregation in ONE pass (hypertable
    continuous-aggregate shape).

    Produces one row per (level, bucket[, by...]) for every level in
    ``levels`` plus a ``'total'`` grand-total row, using ROLLUP grouping
    sets — Spark computes all resolutions with map-side partial
    aggregation and a single exchange, instead of one scan+shuffle per
    resolution.

    ``aggs`` maps output column name -> Column aggregate expression.
    Output: ``level`` (resolution name, or 'total' for per-``by`` and
    grand totals), ``bucket`` (truncated timestamp, null at 'total'),
    ``by`` cols (null only on the grand-total row), the aggregates.

    ``by`` columns lead the ROLLUP, so every time level is at full
    ``by`` detail and the rollup tail gives per-``by`` totals + one
    grand total — the grouping-set order that makes the coarser levels
    reuse the finer partial aggregates in a single exchange.
    """
    by = [by] if isinstance(by, str) else list(by)
    # coarsest-first so ROLLUP's suffix-dropping yields each level
    order = [lv for lv in ("year", "month", "week", "day", "hour", "minute")
             if lv in levels]
    gcols = [f"__t_{lv}" for lv in order]
    rolled = df.withColumns(
        {f"__t_{lv}": F.date_trunc(lv, F.col(ts_col)) for lv in order}
    )
    grouped = rolled.rollup(*by, *gcols).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    # level = finest non-null trunc (coarse -> fine, later wins)
    finest = F.lit("total")
    for lv in order:
        finest = F.when(F.col(f"__t_{lv}").isNotNull(), F.lit(lv)).otherwise(
            finest
        )
    bucket = F.coalesce(*[F.col(f"__t_{lv}") for lv in reversed(order)])
    return grouped.select(
        finest.alias("level"),
        bucket.alias("bucket"),
        *by,
        *[F.col(name) for name in aggs],
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """First-touch funnel: how many users reached each step, where a
    user reaches step i when every step 1..i occurred for them and
    the FIRST occurrences are time-ordered
    (``min_ts(step_1) <= min_ts(step_2) <= ... <= min_ts(step_i)``,
    and — when ``within`` is an INTERVAL string like ``'7 days'`` —
    the whole chain completes inside ``min_ts(step_1) + within``,
    the standard conversion-window bound) —
    the classic product-analytics conversion funnel in its
    order-of-first-touch form (deterministic and exactly
    SQL-expressible, unlike resettable sequential-match variants).

    Plan: ONE user-keyed aggregation computes every step's
    conditional first-touch (min with a CASE — map-side partials, a
    single shuffle on the user key), the chain comparison is pure
    column arithmetic on the per-user row, and the per-step counts
    are a tiny second aggregation over ``len(steps)`` booleans.
    Output: ``(step, event_type, n_users)`` with step 1-indexed;
    n_users is non-increasing by construction.
    """
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_counts: steps must be distinct")
    firsts = events.groupBy(user_col).agg(
        *[
            F.min(
                F.when(F.col(type_col) == s, F.col(ts_col))
            ).alias(f"__t{i}")
            for i, s in enumerate(steps)
        ]
    )
    deadline = None
    if within is not None:
        w = _validated_interval(events.sparkSession, within)
        deadline = F.col("__t0") + F.expr(f"INTERVAL '{w}'")
    reached = F.col("__t0").isNotNull()
    flags = [reached]
    for i in range(1, len(steps)):
        reached = (
            reached
            & F.col(f"__t{i}").isNotNull()
            & (F.col(f"__t{i}") >= F.col(f"__t{i - 1}"))
        )
        if deadline is not None:
            reached = reached & (F.col(f"__t{i}") <= deadline)
        flags.append(reached)
    # coalesce: a global sum over ZERO users is NULL, but the count
    # contract is 0 (r7 code-review)
    counted = firsts.agg(
        *[
            F.coalesce(
                F.sum(flags[i].cast("long")), F.lit(0).cast("long")
            ).alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    spark = events.sparkSession
    names = local_df(
        spark,
        [(i + 1, s) for i, s in enumerate(steps)],
        "step int, event_type string",
    )
    return (
        names.crossJoin(F.broadcast(counted))
        .select(
            "step",
            "event_type",
            F.coalesce(
                *[
                    F.when(F.col("step") == i + 1, F.col(f"__n{i}"))
                    for i in range(len(steps))
                ]
            ).alias("n_users"),
        )
    )


def _validated_interval(spark, within) -> str:
    """Eagerly validate a ``within=`` INTERVAL string (the module's
    contract): a malformed interval would otherwise surface as an
    opaque ParseException deep inside a later action, and a negative
    one silently empties the funnel beyond step 1."""
    w = str(within).strip()
    if "'" in w:
        raise ValueError(
            f"within must be a positive INTERVAL string, got {within!r}"
        )
    try:
        # probe the PARSED interval's sign, not the string's prefix: an
        # embedded negative unit ('1 day -25 hours') passes any prefix
        # check but is net-negative and silently empties the funnel
        # beyond step 1 (r8 ADVICE).  Anchor-dependent signs (the r9
        # ADVICE scenario, '1 month -30 days': +1 day from January,
        # -2 days from February) are UNREPRESENTABLE here: every
        # within= consumer uses the typed literal ``INTERVAL '{w}'``,
        # and Spark's ANSI interval types forbid mixing year-month
        # with day-time fields in one literal — such strings fail THIS
        # parse probe (ParseException -> the eager ValueError below;
        # pinned in test_funnel_sequential_validates_params).  Pure
        # year-month and pure day-time intervals are sign-definite,
        # so one anchor decides the sign for all anchors.
        probe = spark.sql(
            f"SELECT TIMESTAMP '2000-01-01 00:00:00' + INTERVAL '{w}' "
            "<= TIMESTAMP '2000-01-01 00:00:00' AS nonpos"
        ).first()
    except Exception as exc:
        raise ValueError(
            f"within is not a valid INTERVAL string: {within!r}"
        ) from exc
    if probe is not None and probe["nonpos"]:
        raise ValueError(
            f"within must be a NET-positive INTERVAL, got {within!r} "
            "(a zero or net-negative window empties the funnel beyond "
            "step 1)"
        )
    return w


def funnel_counts_sequential(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Sequential-match funnel (the ClickHouse ``windowFunnel`` shape,
    strict ordering): a user reaches step i when a chain of events
    with types ``steps[0..i-1]`` exists whose timestamps STRICTLY
    increase — each step's event happens after the previous step's
    matched event, not merely after its first touch — and, when
    ``within`` is given, the whole chain completes inside
    ``chain_start + within``.  Any qualifying event can start a chain
    (the "resettable" behavior the first-touch form can't express:
    a view AFTER an early unconverted view can still anchor a
    conversion inside the window).

    Semantics are the declarative EXISTS-chain (which is what the
    SQL twin checks); the engine computes it in ONE pass per user via
    a dynamic program folded over the user's time-sorted events: for
    each level keep the LATEST chain-start among chains reaching it
    (the window constraint binds only the start, so the latest start
    dominates), reading only strictly-earlier state for same-timestamp
    events (a carried ``prev`` snapshot), which makes the fold exact
    for the strict-order semantics.  Plan: one user-keyed aggregation
    (collect + fold inside the same shuffle — map-side partials for
    the collect), then a tiny global count; per-user memory is the
    user's event count, the same contract every windowFunnel
    implementation has.  Output matches :func:`funnel_counts`:
    ``(step, event_type, n_users)``, n_users non-increasing.
    """
    if not steps:
        raise ValueError("funnel_counts_sequential: steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_counts_sequential: steps must be distinct")
    k = len(steps)
    spark = events.sparkSession
    wlit = None
    if within is not None:
        wlit = _validated_interval(spark, within)

    # map event type -> 0-based step index, keep only funnel events
    step_idx = F.lit(None).cast("int")
    for i in range(k - 1, -1, -1):
        step_idx = F.when(
            F.col(type_col) == steps[i], F.lit(i)
        ).otherwise(step_idx)
    ev = (
        events.select(
            F.col(user_col).alias("__u"),
            F.col(ts_col).alias("__ts"),
            step_idx.alias("__s"),
        )
        # NULL users can't form a journey and NULL timestamps can't
        # order a chain — excluded EXPLICITLY (groupBy would otherwise
        # pool all NULL users into one phantom journey, and the
        # declarative EXISTS twin drops NULL keys at its joins)
        .where(
            F.col("__s").isNotNull()
            & F.col("__u").isNotNull()
            & F.col("__ts").isNotNull()
        )
    )
    # per-user sorted event array; struct sort is (ts, step) lexicographic
    per_user = ev.groupBy("__u").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__ts").alias("t"),
                                    F.col("__s").alias("s")))
        ).alias("__evs")
    )

    null_ts = F.lit(None).cast(ev.schema["__ts"].dataType.simpleString())
    empty_levels = F.array(*([null_ts] * k))

    def _step(state, e):
        # same-timestamp events must read only strictly-earlier state:
        # `prev` snapshots the levels as of the previous distinct ts
        prev2 = F.when(e["t"] != state["ts"], state["cur"]).otherwise(
            state["prev"]
        )
        # F.get is 0-based and NULL out-of-bounds (s=0 -> index -1)
        anchor = F.get(prev2, e["s"] - 1)
        ok = anchor.isNotNull()
        if wlit is not None:
            ok = ok & (e["t"] <= anchor + F.expr(f"INTERVAL '{wlit}'"))
        cand = F.when(e["s"] == 0, e["t"]).otherwise(
            F.when(ok, anchor)
        )
        new_cur = F.transform(
            state["cur"],
            lambda v, j: F.when(
                j == e["s"], F.greatest(v, cand)
            ).otherwise(v),
        )
        return F.struct(
            new_cur.alias("cur"),
            prev2.alias("prev"),
            e["t"].alias("ts"),
        )

    levels = F.aggregate(
        F.col("__evs"),
        F.struct(
            empty_levels.alias("cur"),
            empty_levels.alias("prev"),
            null_ts.alias("ts"),
        ),
        _step,
        lambda st: st["cur"],
    )
    flags = per_user.select(
        *[
            F.element_at(levels, i + 1).isNotNull().alias(f"__f{i}")
            for i in range(k)
        ]
    )
    counted = flags.agg(
        *[
            F.coalesce(
                F.sum(F.col(f"__f{i}").cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"__n{i}")
            for i in range(k)
        ]
    )
    names = local_df(
        spark,
        [(i + 1, s) for i, s in enumerate(steps)],
        "step int, event_type string",
    )
    return names.crossJoin(F.broadcast(counted)).select(
        "step",
        "event_type",
        F.coalesce(
            *[
                F.when(F.col("step") == i + 1, F.col(f"__n{i}"))
                for i in range(k)
            ]
        ).alias("n_users"),
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention: users grouped by the period of their FIRST
    event, with per-offset active counts — the standard growth
    matrix (``cohort``, ``period_offset``, ``n_active``,
    ``n_cohort``).

    Plan: one user-keyed aggregation finds each user's cohort period
    (single shuffle, map-side partials), a user-keyed join tags every
    event with its user's cohort (the join key is the user — a keyed
    shuffle join; the cohort table is user-sized, so AQE may
    broadcast it at small scale), one distinct over
    ``(cohort, offset, user)`` and one count aggregation.  Offsets
    are exact integers (day difference floor-divided by the period
    length), so the whole output is engine-exact.
    """
    days = {"week": 7, "day": 1}.get(granularity)
    if days is None:
        raise ValueError("granularity must be 'week' or 'day'")
    cohorts = events.groupBy(user_col).agg(
        F.date_trunc(granularity, F.min(ts_col)).alias("cohort")
    )
    sized = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    active = (
        events.join(cohorts, user_col)
        .select(
            "cohort",
            (
                F.datediff(
                    F.date_trunc(granularity, F.col(ts_col)),
                    F.col("cohort"),
                )
                / days
            )
            .cast("int")
            .alias("period_offset"),
            F.col(user_col),
        )
        .distinct()
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return active.join(F.broadcast(sized), "cohort").select(
        "cohort", "period_offset", "n_active", "n_cohort"
    )
