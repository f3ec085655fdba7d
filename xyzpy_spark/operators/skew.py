"""Skew mitigation — salted joins for hot keys.

Spark's own toolbox covers most skew: AQE splits oversized partitions
of a sort-merge join at runtime, and broadcast joins sidestep key
distribution entirely.  The gap is a shuffled join whose *probe side*
has a handful of pathologically hot keys (the web-corpus reality:
dedup buckets for boilerplate text, the null-ish sentinel key, the
one user that is a bot) when the build side is too large to
broadcast.  Salting fixes that shape: spread each hot left key over
``salt`` synthetic sub-keys, replicate the matching right rows once
per sub-key, and join on (key, salt) — every reducer gets at most
1/salt of the hottest key.

Cost model: right side is replicated ``salt``x *only* for the keys
being salted — pass ``hot_keys`` (or let AQE handle mild skew and use
this for the extreme tail).  Result set is identical to the unsalted
join; a test asserts equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hot_keys", "salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on,
    *,
    salt: int = 16,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with hot-key salting.

    ``on``: join key column name(s).  ``salt``: fan-out per hot key.
    ``hot_keys``: optional small DataFrame of the keys to salt (same
    key columns); when given, only those keys are spread/replicated
    (it is broadcast into both sides), everything else joins on salt 0
    with no replication.  When omitted, EVERY key is salted — simple,
    but replicates the whole right side ``salt``x; prefer passing the
    hot tail (e.g. from ``functions.sketch.heavy_hitters``).

    Only the row-preserving join types make sense here ('inner',
    'left'); right/full-outer would need dedup of the replicated
    right-side null matches.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)

    if hot_keys is not None:
        hot = F.broadcast(
            hot_keys.select(*on).distinct().withColumn("_hot", F.lit(True))
        )
        l_mark = left.join(hot, on, "left")
        r_mark = right.join(hot, on, "left")
        l_salted = l_mark.withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                (F.rand(seed) * salt).cast("int"),
            ).otherwise(F.lit(0)),
        ).drop("_hot")
        r_salted = r_mark.withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(salt - 1)),
            ).otherwise(F.array(F.lit(0))),
        ).drop("_hot")
    else:
        l_salted = left.withColumn(
            "_salt", (F.rand(seed) * salt).cast("int")
        )
        r_salted = right.withColumn(
            "_salts", F.sequence(F.lit(0), F.lit(salt - 1))
        )
    r_exploded = r_salted.withColumn("_salt", F.explode("_salts")).drop(
        "_salts"
    )
    return l_salted.join(r_exploded, on + ["_salt"], how).drop("_salt")


def hot_keys(
    df: DataFrame,
    col: str,
    *,
    threshold: float = 0.001,
    **sketch_kwargs,
) -> DataFrame:
    """The keys worth salting: values of ``col`` exceeding ``threshold``
    frequency, as a small type-preserving DataFrame.

    Bridges :func:`~xyzpy_spark.functions.sketch.heavy_hitters` (one
    CMS pass, KB-sized state) to :func:`salted_join`'s ``hot_keys``
    argument::

        salted_join(big, big2, "user_id",
                    hot_keys=hot_keys(big, "user_id"))

    The sketch identifies hitter values as strings; a filtered
    ``distinct`` over the original column recovers them in the
    column's own type so the downstream join keys line up.
    """
    from ..functions.sketch import heavy_hitters

    hitters = heavy_hitters(df, col, threshold=threshold, **sketch_kwargs)
    strs = [v for v, _ in hitters]
    if not strs:
        return df.select(col).limit(0)
    return (
        df.select(col)
        .where(F.col(col).cast("string").isin(strs))
        .distinct()
    )
