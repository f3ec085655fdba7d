"""Training-shard export: deterministic, resumable corpus writes.

The last stage of a training-data pipeline is materializing the
filtered/deduped corpus as a fixed number of shards that downstream
loaders can address individually ("shard 17 of 512").  Two properties
matter at 100 TB and are easy to get wrong with a bare
``df.write.parquet``:

- **Deterministic assignment** — a row's shard must depend only on its
  key (``xxhash64(key, seed) mod n_shards``), never on input
  partitioning or task scheduling, so re-runs and incremental top-ups
  land rows in the same shard.
- **Deterministic intra-shard order** — loaders that stream a shard
  sequentially see a stable, seeded pseudo-random order (sorting by a
  second hash), so resuming a crashed export or comparing two exports
  is byte-reproducible.

``partitionBy`` on the shard column gives one directory per shard
(``shard=NNN/``), each written by exactly one task after the
``repartition`` — so the output is n_shards files, not
n_shards x n_tasks fragments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["write_training_shards", "read_training_shards"]


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    key: str,
    n_shards: int = 64,
    seed: int = 42,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` deterministic shards under ``path``.

    ``key`` must be a stable unique row identifier.  Shard assignment
    is ``pmod(xxhash64(key, seed), n_shards)``; rows within a shard are
    ordered by an independent hash of the same key (seed+1), i.e. a
    seeded global shuffle that is byte-reproducible across runs and
    input layouts ON SPARK.  (xxhash64's seeded form is not portable
    to other SQL engines — for a cross-engine-verifiable assignment
    derive the shard from ``sampling.hash_unit``'s md5 instead; the
    xxhash64 default is kept for hot-path speed on the write.)
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(n_shards))
    order = F.xxhash64(F.col(key), F.lit(seed + 1))
    (
        df.withColumn("shard", shard)
        # one task per shard -> one file per shard directory
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", order)
        .write.mode("overwrite")
        .format(fmt)
        .partitionBy("shard")
        .save(path)
    )


def read_training_shards(
    spark: SparkSession,
    path: str,
    *,
    shards: list[int] | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Read an exported corpus; ``shards`` selects a subset by number.

    Shard pruning happens at the source (partition-column filter), so
    reading 1 of 512 shards scans 1/512 of the data.
    """
    df = spark.read.format(fmt).load(path)
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df
