"""Outer-merge of result tables with conflict policies.

Reference semantics (``xyzpy/gen/farming.py:602-670`` and
``manage.py:172-208``):

- ``overwrite=None`` — merge with *no conflicts allowed*: error if any
  cell is non-null on both sides with different values
  (``xr.merge(compat="no_conflicts")``).
- ``overwrite=True``  — new data wins where both present
  (``new.combine_first(old)``).
- ``overwrite=False`` — old data wins (``old.combine_first(new)``).

Spark expression: ONE full-outer join on the dim columns +
per-variable ``coalesce``.  The no-conflicts check does not cost a
second job: conflicting cells route through ``raise_error`` inside the
same projection, so the merge job itself fails on first conflict
(SURVEY §7 risk #3 — "make it one job").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class MergeConflictError(ValueError):
    """Both sides define different non-null values for the same cell."""


def _neq(a: F.Column, b: F.Column) -> F.Column:
    # NaN counts as MISSING for numeric merges — the reference stores
    # missing points as NaN (xarray has no NULL), so xr.merge's
    # no-conflicts rule never flags NaN-vs-value; a conflict needs two
    # SET (non-null, non-NaN) unequal values.
    return (
        a.isNotNull()
        & b.isNotNull()
        & ~F.isnan(a)
        & ~F.isnan(b)
        & ~a.eqNullSafe(b)
    )


def _neq_simple(a: F.Column, b: F.Column) -> F.Column:
    return a.isNotNull() & b.isNotNull() & ~a.eqNullSafe(b)


def _nan_as_null(c: F.Column) -> F.Column:
    # numeric combine_first: a NaN cell must LOSE to a set value (and
    # two NaNs merge to null — the engine's canonical missing marker)
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def merge_datasets(
    old: DataFrame,
    new: DataFrame,
    dims,
    *,
    overwrite: bool | None = None,
    var_names=None,
) -> DataFrame:
    """Merge two long-format result tables on their dim columns.

    Variables present on only one side pass through (schema grows, as
    with ``xr.merge`` / ``Harvester.expand_dims``).  Returns the merged
    table; under ``overwrite=None`` the returned plan *raises*
    ``org.apache.spark.SparkRuntimeException`` (message prefixed
    ``MERGE CONFLICT``) at execution time if a conflicting cell exists.
    """
    dims = list(dims)
    old_vars = [c for c in old.columns if c not in dims]
    new_vars = [c for c in new.columns if c not in dims]
    if var_names is not None:
        old_vars = [v for v in old_vars if v in var_names]
        new_vars = [v for v in new_vars if v in var_names]
    shared = [v for v in old_vars if v in new_vars]
    only_old = [v for v in old_vars if v not in new_vars]
    only_new = [v for v in new_vars if v not in old_vars]

    o = old.select(
        *dims, *[F.col(v).alias(f"__old_{v}") for v in old_vars]
    )
    n = new.select(
        *dims, *[F.col(v).alias(f"__new_{v}") for v in new_vars]
    )
    joined = o.join(n, dims, "full_outer")

    cols: list[F.Column] = [F.col(d) for d in dims]
    for v in shared:
        ov, nv = F.col(f"__old_{v}"), F.col(f"__new_{v}")
        is_num = dict(joined.dtypes)[f"__old_{v}"] in ("double", "float")
        neq = _neq(ov, nv) if is_num else _neq_simple(ov, nv)
        if is_num:
            ov, nv = _nan_as_null(ov), _nan_as_null(nv)
        if overwrite is None:
            # conflict -> fail inside this very job (no second pass).
            merged = F.when(
                neq,
                F.raise_error(
                    F.concat(
                        F.lit(f"MERGE CONFLICT in variable '{v}' at "),
                        F.concat_ws(
                            ", ",
                            *[
                                F.concat(F.lit(f"{d}="), F.col(d).cast("string"))
                                for d in dims
                            ],
                        ),
                    )
                ).cast(dict(joined.dtypes)[f"__old_{v}"]),
            ).otherwise(F.coalesce(nv, ov))
        elif overwrite:
            merged = F.coalesce(nv, ov)
        else:
            merged = F.coalesce(ov, nv)
        cols.append(merged.alias(v))
    for v in only_old:
        cols.append(F.col(f"__old_{v}").alias(v))
    for v in only_new:
        cols.append(F.col(f"__new_{v}").alias(v))
    return joined.select(*cols)


def count_conflicts(old: DataFrame, new: DataFrame, dims, var_names=None) -> int:
    """Eagerly count conflicting cells (diagnostic companion to the
    in-job raise of :func:`merge_datasets`)."""
    dims = list(dims)
    old_vars = [c for c in old.columns if c not in dims]
    new_vars = [c for c in new.columns if c not in dims]
    shared = [
        v
        for v in old_vars
        if v in new_vars and (var_names is None or v in var_names)
    ]
    o = old.select(*dims, *[F.col(v).alias(f"__old_{v}") for v in shared])
    n = new.select(*dims, *[F.col(v).alias(f"__new_{v}") for v in shared])
    joined = o.join(n, dims, "inner")
    conds = []
    for v in shared:
        is_num = dict(joined.dtypes)[f"__old_{v}"] in ("double", "float")
        fn = _neq if is_num else _neq_simple
        conds.append(
            F.sum(
                fn(F.col(f"__old_{v}"), F.col(f"__new_{v}")).cast("long")
            ).alias(v)
        )
    row = joined.agg(*conds).collect()[0]
    return int(sum(x or 0 for x in row))
