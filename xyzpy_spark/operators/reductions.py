"""Dimension reductions — the GROUP BY / PIVOT layer of the engine.

These re-express the reference's plot-layer data preparation
(``xyzpy/plot/infiniplot.py`` — aggregate-over-dims with error ranges,
histogram, heatmap pivot, facet/aesthetic fusing) plus the dataset
maintenance reductions of ``xyzpy/manage.py`` (trimna, check_runs) as
pure Spark aggregations.  Everything here is a single declarative
groupBy/window plan: Catalyst gets partial (map-side) aggregation,
pushdown, and AQE re-planning for free, so each operator is one
shuffle at most — the shape that survives a 100 TB input.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

# methods usable for aggregate_over; exact (not approx) variants chosen
# so results are oracle-checkable against ANSI SQL.
_AGG_METHODS = {
    "mean": F.avg,
    "median": F.median,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "count": F.count,
    "first": F.first,
}


def aggregate_over(
    df: DataFrame,
    keep_dims,
    var_names,
    *,
    method: str = "median",
    err: str | float | None = None,
    approx: bool = False,
) -> DataFrame:
    """Reduce all dims except ``keep_dims`` for each output variable.

    Reference: the plotter's implicit aggregation
    (``plot/infiniplot.py:639-680``; default method median at ``:224``)
    with error ranges (``:646-671``):

    - ``err='std'``    -> ``<v>_err`` = sample std dev
    - ``err='stderr'`` -> std / sqrt(count of non-null)
    - ``err=q`` float  -> quantile band columns ``<v>_lo``/``<v>_hi``
      at ``0.5 -/+ q/2``

    One groupBy -> one shuffle; partial aggregation happens map-side.

    ``approx=True`` swaps exact order statistics (sort-based, the
    right choice when an oracle must match) for ``percentile_approx``
    sketches — mergeable, single-pass, the 100-TB path.
    """
    if isinstance(var_names, str):
        var_names = [var_names]
    keep_dims = list(keep_dims)
    if method not in _AGG_METHODS:
        raise ValueError(
            f"unknown aggregation method {method!r}; "
            f"choose from {sorted(_AGG_METHODS)}"
        )
    if approx and method == "median":
        agg_fn = lambda c: F.percentile_approx(c, F.lit(0.5))  # noqa: E731
    else:
        agg_fn = _AGG_METHODS[method]

    def _quantile(col, q):
        if approx:
            return F.percentile_approx(col, F.lit(q))
        return F.percentile(col, F.lit(q))

    if err is not None and err not in ("std", "stderr") and not isinstance(
        err, float
    ):
        raise ValueError(
            f"err must be 'std', 'stderr', a float quantile width, or "
            f"None — got {err!r}"
        )
    aggs = []
    for v in var_names:
        aggs.append(agg_fn(F.col(v)).alias(v))
        if err == "std":
            aggs.append(F.stddev_samp(F.col(v)).alias(f"{v}_err"))
        elif err == "stderr":
            aggs.append(
                (
                    F.stddev_samp(F.col(v))
                    / F.sqrt(F.count(F.col(v)).cast("double"))
                ).alias(f"{v}_err")
            )
        elif isinstance(err, float):
            ql, qu = 0.5 - err / 2, 0.5 + err / 2
            aggs.append(_quantile(F.col(v), ql).alias(f"{v}_lo"))
            aggs.append(_quantile(F.col(v), qu).alias(f"{v}_hi"))
    if not keep_dims:
        return df.agg(*aggs)
    return df.groupBy(*keep_dims).agg(*aggs)


def auto_bins(n: int) -> int:
    """Reference's auto bin count: min(max(3, sqrt(n)), 50)
    (``plot/infiniplot.py:583-586``)."""
    return int(min(max(3, round(math.sqrt(n))), 50))


def histogram(
    df: DataFrame,
    x: str,
    *,
    bins: int | None = None,
    by=(),
    density: bool = False,
    x_range: tuple[float, float] | None = None,
) -> DataFrame:
    """Histogram of ``x``, optionally per ``by`` facet.

    Reference: ``plot/infiniplot.py:573-625`` — stack everything not
    faceted, ``np.histogram`` with auto bins, emit counts (or density)
    on bin-center coordinates.

    Plan shape: one min/max scan (skipped when ``x_range`` given), then
    one groupBy(bucket) — two jobs max, each a single shuffle.  Returns
    columns: ``by...``, ``bin`` (0-based), ``x`` (bin center),
    ``count`` (and ``prob`` when ``density``).  Empty bins are absent
    rows (sparse long format).
    """
    by = list(by)
    work = df.where(F.col(x).isNotNull() & ~F.isnan(F.col(x)))
    if x_range is None or bins is None:
        stats = work.agg(
            F.min(x).alias("lo"),
            F.max(x).alias("hi"),
            F.count(x).alias("n"),
        ).collect()[0]
        if stats["n"] == 0 or stats["lo"] is None:
            raise ValueError(
                f"histogram: no non-null finite values in column {x!r} "
                "— supply both bins and x_range to histogram an "
                "empty/unknown-range frame"
            )
        lo, hi, n = float(stats["lo"]), float(stats["hi"]), int(stats["n"])
        if x_range is not None:
            lo, hi = map(float, x_range)
        if bins is None:
            bins = auto_bins(n)
    else:
        lo, hi = map(float, x_range)
    if x_range is not None:
        # np.histogram semantics: out-of-range values are EXCLUDED
        # (x == hi lands in the last bin via the least() clamp below);
        # without this, v > hi silently inflated the last bin and
        # v < lo emitted phantom negative-bin rows
        work = work.where(
            (F.col(x) >= F.lit(lo)) & (F.col(x) <= F.lit(hi))
        )
    width = (hi - lo) / bins or 1.0
    bucket = F.least(
        F.floor((F.col(x) - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(bins - 1),
    ).alias("bin")
    out = (
        work.select(*by, bucket)
        .groupBy(*by, "bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn(
            x, (F.lit(lo) + (F.col("bin") + 0.5) * F.lit(width)).alias(x)
        )
    )
    if density:
        total = Window.partitionBy(*by) if by else Window.partitionBy()
        out = out.withColumn(
            "prob",
            F.col("count") / (F.sum("count").over(total) * F.lit(width)),
        )
    return out.select(*by, "bin", x, "count", *(["prob"] if density else []))


def heatmap_table(
    df: DataFrame,
    x: str,
    y: str,
    z: str,
    *,
    agg: str = "first",
    x_values=None,
) -> DataFrame:
    """Pivot ``z`` to a (y, x) matrix — the heatmap data prep.

    Reference: ``plot/infiniplot.py:1235-1308`` / ``plot/core.py:443-463``.
    ``x_values`` — pass the known x coordinate values to skip the
    distinct-scan Spark otherwise needs to enumerate pivot columns
    (always pass it at scale).
    """
    agg_fn = _AGG_METHODS[agg]
    g = df.groupBy(y)
    p = g.pivot(x, list(x_values)) if x_values is not None else g.pivot(x)
    return p.agg(agg_fn(F.col(z))).orderBy(y)


def fuse_dims(df: DataFrame, dims, name: str, *, sep: str = ", ") -> DataFrame:
    """Fuse several dims into one composite key column + dense index.

    Reference: mapped-dim fusing for aesthetic channels
    (``plot/infiniplot.py:744-754``) — multiple dims mapped to one
    hue/marker channel are stacked into a single labelled dim.  Adds
    ``name`` (string label) and ``name_idx`` (0-based dense rank over
    the label order).
    """
    dims = list(dims)
    label_col = F.concat_ws(sep, *[F.col(d).cast("string") for d in dims])
    df = df.withColumn(name, label_col)
    w = Window.orderBy(*[F.col(d) for d in dims])
    # dense_rank over the dim ordering gives a stable 0-based style
    # index; the lookup joins back on the DIM TUPLE, not the label —
    # two distinct tuples can collide on the concatenated string
    # (e.g. ('x, y', 'z') vs ('x', 'y, z')) and a label join would
    # fan rows out
    lookup = (
        df.select(*dims)
        .distinct()
        .withColumn(f"{name}_idx", F.dense_rank().over(w) - 1)
    )
    return df.join(F.broadcast(lookup), dims, "left")


def style_indices(df: DataFrame, channels: dict) -> DataFrame:
    """Per-aesthetic-channel dense style indices.

    Reference: infiniplot's dim→aesthetic mapping
    (``plot/infiniplot.py:700-760``): each channel (hue, marker,
    linestyle, ...) maps its dim(s) to a 0-based dense index over the
    sorted values, so color/marker assignment is stable across facets
    and engines.  ``channels`` maps channel name -> dim or list of
    dims; several dims fuse into one labelled channel
    (:func:`fuse_dims`).  Adds ``{channel}`` (label) and
    ``{channel}_idx`` columns.  Lookups are distinct-value-sized and
    broadcast — no full-data shuffle.
    """
    for ch, dims in channels.items():
        dims = [dims] if isinstance(dims, str) else list(dims)
        if ch not in df.columns:
            # fuse_dims adds both {ch} and {ch}_idx
            df = fuse_dims(df, dims, ch)
            continue
        if dims != [ch]:
            raise ValueError(
                f"channel {ch!r} already exists as a column but maps "
                f"dims {dims}; rename the channel or drop the column — "
                "silently skipping would break the {channel}_idx contract"
            )
        if f"{ch}_idx" not in df.columns:
            w = Window.orderBy(F.col(ch))
            lookup = (
                df.select(ch)
                .distinct()
                .withColumn(f"{ch}_idx", F.dense_rank().over(w) - 1)
            )
            df = df.join(F.broadcast(lookup), ch, "left")
    return df


def trimna(df: DataFrame, dims, var_names, *, cache: bool = True) -> DataFrame:
    """Drop coordinate slices that are all-null, per dim.

    Reference: ``trimna`` (``manage.py:211-227``) — for each dim, keep
    only coordinate values where at least one variable is non-null
    somewhere in that slice.  Expressed as a cascade of broadcast
    semi-joins against per-dim keep-lists (each keep-list is an
    aggregation over parameter coordinates — tiny by construction).

    The input feeds 1 + len(dims) subplans, so it is persisted by
    default — without it Spark recomputes the whole upstream plan per
    keep-list (pass ``cache=False`` when the input is a raw scan).
    """
    if cache:
        df = df.persist()
    any_nonnull = reduce(
        lambda a, b: a | b, (F.col(v).isNotNull() for v in var_names)
    )
    out = df
    for d in dims:
        keep = (
            df.where(any_nonnull).select(d).distinct()
        )
        out = out.join(F.broadcast(keep), d, "left_semi")
    return out


def post_fix(df: DataFrame, postfix: str, var_names=None) -> DataFrame:
    """Rename data variables ``v`` -> ``v_postfix`` (reference
    ``manage.py:250-265``) — used to merge otherwise-colliding runs."""
    if var_names is None:
        var_names = df.columns
    mapping = {v: f"{v}_{postfix}" for v in var_names}
    return df.withColumnsRenamed(mapping)


def run_gaps(df: DataFrame, dim: str, var_names=()) -> DataFrame:
    """Gap ranges of an integer dim, one row per hole.

    Row-form companion of :func:`check_runs` (reference
    ``manage.py:303-306``).  Scale-safe plan: gap *boundaries* are
    found by distributed anti-joins (``v+1`` missing -> a gap starts at
    ``v+1``; ``v-1`` missing -> that gap ends at ``v-1``) — no global
    sort over the full value set.  Only the boundary sets themselves
    (tiny: one row per hole) pass through an ordered window to pair
    starts with ends.
    """
    work = df
    if var_names:
        any_nonnull = reduce(
            lambda a, b: a | b, (F.col(v).isNotNull() for v in var_names)
        )
        work = df.where(any_nonnull)
    vals = work.select(F.col(dim).cast("long").alias("v")).distinct()
    bounds = vals.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    succ = vals.select((F.col("v") + 1).alias("v"))
    pred = vals.select((F.col("v") - 1).alias("v"))
    starts = (
        succ.join(vals, "v", "left_anti")
        .crossJoin(F.broadcast(bounds))
        .where(F.col("v") <= F.col("hi"))
        .select(F.col("v").alias("gap_start"))
    )
    ends = (
        pred.join(vals, "v", "left_anti")
        .crossJoin(F.broadcast(bounds))
        .where(F.col("v") >= F.col("lo"))
        .select(F.col("v").alias("gap_end"))
    )
    ws = Window.orderBy("gap_start")
    we = Window.orderBy("gap_end")
    s = starts.withColumn("_i", F.row_number().over(ws))
    e = ends.withColumn("_i", F.row_number().over(we))
    return s.join(e, "_i").select("gap_start", "gap_end")


def check_runs(df: DataFrame, dim: str, var_names=()) -> DataFrame:
    """Report min/max/count and gap ranges of an integer dim.

    Reference: ``check_runs`` (``manage.py:268-310``) — after dropping
    all-null slices, summarize which runs exist and where the holes
    are.  Gap detection = ``lag()`` over the ordered distinct values
    (the one place the reference's workload needs a window function).
    Returns one row: min, max, count, and an array of [gap_start,
    gap_end] inclusive ranges of missing integers.
    """
    work = df
    if var_names:
        any_nonnull = reduce(
            lambda a, b: a | b, (F.col(v).isNotNull() for v in var_names)
        )
        work = df.where(any_nonnull)
    vals = work.select(F.col(dim).cast("long").alias(dim)).distinct()
    summary = vals.agg(
        F.min(dim).alias("min"),
        F.max(dim).alias("max"),
        F.count(dim).alias("count"),
    )
    # collect_list order after an aggregation shuffle is NOT the input
    # order — sort the assembled array instead of the rows ([start,end]
    # pairs sort lexicographically = ascending by gap_start)
    gap_list = run_gaps(df, dim, var_names).agg(
        F.array_sort(
            F.collect_list(F.array("gap_start", "gap_end"))
        ).alias("gaps")
    )
    return summary.crossJoin(gap_list)
