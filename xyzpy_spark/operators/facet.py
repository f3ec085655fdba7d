"""Faceting and point-cloud preparation — the remaining plot-layer
data operators (SURVEY §2.6 P5/P8/P9).

Rendering is out of engine scope (reference matplotlib/bokeh backends);
what the engine owes the plot layer is *data shaping*: facet slicing,
finite-pair masking, and jitter.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, functions as F


def facet_values(df: DataFrame, dims) -> list[tuple]:
    """Sorted distinct coordinate combinations of the facet dims
    (reference ``calc_row_col_datasets``, ``plot/core.py:752-768``)."""
    rows = df.select(*dims).distinct().orderBy(*dims).collect()
    return [tuple(r) for r in rows]


def facet_data(
    df: DataFrame, row_dim: str | None = None, col_dim: str | None = None
):
    """Iterate ``(row_value, col_value, sub_df)`` facets.

    Reference: the row/col subplot-grid mapping
    (``plot/infiniplot.py:559-560, 686-693``).  Each sub-DataFrame is a
    filter on the parent plan — Catalyst pushes the facet predicate
    into the scan, so iterating facets does not re-shuffle.
    """
    dims = [d for d in (row_dim, col_dim) if d is not None]
    if not dims:
        yield (None, None, df)
        return
    values = [
        [r[0] for r in df.select(d).distinct().orderBy(d).collect()]
        for d in dims
    ]
    for combo in itertools.product(*values):
        cond = None
        for d, v in zip(dims, combo):
            c = F.col(d).eqNullSafe(F.lit(v))
            cond = c if cond is None else cond & c
        rv = combo[0] if row_dim is not None else None
        cv = (
            combo[-1]
            if col_dim is not None and len(combo) > (1 if row_dim else 0)
            else (combo[0] if row_dim is None else None)
        )
        yield (rv, cv, df.where(cond))


def check_excess_dims(df: DataFrame, mapped_dims, all_dims) -> None:
    """Error when >1-sized dims remain unmapped — the reference forces
    explicit reduction or selection first (``plot/core.py:127-148``)."""
    unmapped = [d for d in all_dims if d not in set(mapped_dims)]
    if not unmapped:
        return
    sizes = df.agg(
        *[F.countDistinct(d).alias(d) for d in unmapped]
    ).collect()[0]
    excess = [d for d in unmapped if sizes[d] > 1]
    if excess:
        raise ValueError(
            f"dims {excess} are unmapped but have >1 coordinate — reduce "
            "over them (aggregate_over) or select a value first"
        )


def xy_points(
    df: DataFrame,
    x: str,
    y: str,
    *,
    extra=(),
    jitter_x: float = 0.0,
    jitter_y: float = 0.0,
    log_jitter: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Finite (x, y) point pairs, optionally jittered.

    Reference: broadcast + flatten + finite-mask + jitter
    (``plot/core.py:308-419``) — rows where either coordinate is
    null/NaN are dropped; jitter is additive gaussian (multiplicative
    when ``log_jitter``, for log-scale axes).
    """

    def finite(c):
        col = F.col(c)
        cond = col.isNotNull()
        if dict(df.dtypes).get(c) in ("double", "float"):
            cond = cond & ~F.isnan(col)
        return cond

    out = df.where(finite(x) & finite(y)).select(x, y, *extra)
    for cname, scale in ((x, jitter_x), (y, jitter_y)):
        if scale:
            noise = F.randn(seed) * F.lit(scale)
            if log_jitter:
                out = out.withColumn(
                    cname, F.col(cname) * F.exp(noise)
                )
            else:
                out = out.withColumn(cname, F.col(cname) + noise)
    return out
