"""Single-pass table profiling — the data-QA census a pipeline runs
before trusting a new table.

The reference's analog capability is the ad-hoc inspection its users
do on harvested xarray datasets (``ds.isnull().sum()`` etc.); at
corpus scale that becomes one declarative aggregation pass producing a
per-column report: row/null/distinct counts, numeric ranges and means,
string ranges.

Scale design: the approx mode (default) is ONE aggregation over the
table (map-side partials, one shuffle of a single constant-size row),
then a JVM-side ``stack`` unpivot of that row into the per-column
report — no per-column jobs, no second scan; distinct counts are
HyperLogLog++ (constant state per column).  ``'exact'`` adds one
column-pruned two-level hash aggregation PER COLUMN (k extra scans,
each reading a single parquet column) joined back as 1-row
broadcasts — measured 3x faster than Spark's Expand-based
multi-distinct plan at sf0.1 and hash- instead of sort-bound, but
still k+1 jobs: use it for oracle-grade audits, not 100 TB sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DateType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

__all__ = ["profile_table"]


def _num_view(col: F.Column, dtype) -> tuple[F.Column, F.Column] | None:
    """``(double_view, exact_decimal_view)`` for range/mean stats, or
    None for non-orderable-as-number types.

    Timestamps become epoch MICROSECONDS (exact in int64 — the
    float64 epoch-seconds view would already round below the
    microsecond at current dates) — portable as ``epoch_us`` in
    DuckDB under the session's UTC timezone.  Dates become days since
    epoch.

    The decimal view exists because the MEAN cannot be a float AVG:
    at epoch-µs magnitude (~2e15) float sum-reordering noise between
    engines (~µs-scale) dwarfs the 1e-6 rounding canon.  Exact
    decimal SUM ÷ count is one deterministic double division on both
    sides — the same DECIMAL recipe the money aggregates use.
    Fractional inputs are truncated to 6 decimals by the cast
    (deterministic: an arbitrary double is never an exact decimal
    half at the 6th place, so HALF_UP vs nearest cannot disagree).
    """
    from pyspark.sql.types import FractionalType

    if isinstance(dtype, NumericType):
        if isinstance(dtype, FractionalType):
            # try_cast: ANSI mode (Spark 4 default) aborts a plain
            # cast on |x| >= 1e21 / NaN / inf — dirty values drop out
            # of the mean instead of killing the census
            return col.cast("double"), col.try_cast("decimal(27,6)")
        return col.cast("double"), col.cast("decimal(38,0)")
    if isinstance(dtype, TimestampNTZType):
        # NTZ -> TZ cast interprets in the session zone (pinned UTC
        # by get_spark), making unix_micros the naive-UTC epoch
        mic = F.unix_micros(col.cast("timestamp"))
        return mic.cast("double"), mic.cast("decimal(38,0)")
    if isinstance(dtype, TimestampType):
        mic = F.unix_micros(col)
        return mic.cast("double"), mic.cast("decimal(38,0)")
    if isinstance(dtype, DateType):
        days = F.datediff(col, F.lit("1970-01-01"))
        return days.cast("double"), days.cast("decimal(38,0)")
    return None


def profile_table(
    df: DataFrame,
    cols=None,
    *,
    distinct: str = "approx",
) -> DataFrame:
    """Per-column profile: one row per column with
    ``(col_name, n_rows, n_nulls, n_distinct, min_num, max_num, mean,
    min_str, max_str)``.

    ``min_num``/``max_num``/``mean`` are populated for numeric,
    timestamp (epoch µs) and date (epoch days) columns; ``min_str``/
    ``max_str`` for strings (binary collation — portable).  ``mean``
    is exact-sum ÷ count — deterministic without a rounding canon.

    ``distinct='approx'`` (default, HLL++ rsd 2%) is the scale mode;
    ``'exact'`` runs one pruned per-column distinct aggregation each
    (see module docstring) and is bit-portable across engines.

    Values a ``DOUBLE`` column holds beyond the decimal(27,6) range
    (|x| >= 1e21, NaN, inf) are excluded from ``mean`` via
    ``try_cast`` (they still count in ``min``/``max``/distincts) —
    under ANSI mode (the Spark 4 default) a plain cast would abort
    the whole census on exactly the dirty data it exists to audit.
    """
    if distinct not in ("approx", "exact"):
        raise ValueError(
            f"profile_table: distinct must be 'approx' or 'exact', "
            f"got {distinct!r}"
        )
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        dtype = df.schema[c].dataType
        cc = F.col(c)
        aggs.append(F.count(cc).alias(f"__nn_{i}"))
        if distinct != "exact":
            aggs.append(
                F.approx_count_distinct(c, rsd=0.02).alias(f"__nd_{i}")
            )
        num = _num_view(cc, dtype)
        if num is not None:
            dbl, dec = num
            aggs += [
                F.min(dbl).alias(f"__mn_{i}"),
                F.max(dbl).alias(f"__mx_{i}"),
                # NO float rounding canon here: the division of two
                # exact values (decimal sum, count) is already
                # deterministic, and floor(x*1e6) overflows LONG at
                # epoch-µs magnitude (Spark floor clamps to Long.MAX)
                # divide by the CASTABLE count: try_cast NULLs out
                # dirty doubles (inf/NaN/|x|>=1e21), which must leave
                # the mean's denominator too
                (F.sum(dec).cast("double") / F.count(dec)).alias(
                    f"__av_{i}"
                ),
            ]
        else:
            aggs += [
                F.lit(None).cast("double").alias(f"__mn_{i}"),
                F.lit(None).cast("double").alias(f"__mx_{i}"),
                F.lit(None).cast("double").alias(f"__av_{i}"),
            ]
        if isinstance(dtype, StringType):
            aggs += [
                F.min(cc).alias(f"__ms_{i}"),
                F.max(cc).alias(f"__xs_{i}"),
            ]
        else:
            aggs += [
                F.lit(None).cast("string").alias(f"__ms_{i}"),
                F.lit(None).cast("string").alias(f"__xs_{i}"),
            ]
    wide = df.agg(*aggs)
    if distinct == "exact":
        # one pruned two-level hash aggregation per column instead of
        # the multi-count_distinct form: Spark plans the latter as an
        # Expand (k× row re-emission) into a full-width SortAggregate
        # keyed on every profiled column — 2-3x slower at sf0.1 and
        # sort-bound at scale.  Per-column passes each scan ONE parquet
        # column (pruning makes the IO comparable to the single pass),
        # aggregate map-side, and join back as 1-row broadcasts.
        for i, c in enumerate(cols):
            nd = (
                df.select(F.col(c).alias("__v"))
                .where(F.col("__v").isNotNull())
                .distinct()
                .agg(F.count(F.lit(1)).alias(f"__nd_{i}"))
            )
            wide = wide.crossJoin(F.broadcast(nd))
    # column names become SQL string literals inside the stack() —
    # escape embedded backslashes THEN quotes so an exotic schema
    # can't break the parse (or inject expressions through it): a
    # name ending in a backslash would otherwise escape the closing
    # quote, and a literal backslash would be eaten as an escape
    stack_rows = ", ".join(
        "'{}', __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}, __av_{i}, "
        "__ms_{i}, __xs_{i}".format(
            c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.col("__n"),
        F.expr(
            f"stack({len(cols)}, {stack_rows}) AS "
            "(col_name, __nn, n_distinct, min_num, max_num, mean, "
            "min_str, max_str)"
        ),
    ).select(
        "col_name",
        F.col("__n").cast("long").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_num",
        "max_num",
        "mean",
        "min_str",
        "max_str",
    )
