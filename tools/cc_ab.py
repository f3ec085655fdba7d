#!/usr/bin/env python
"""Same-session A/B of the dedup_clusters label-propagation loop
(r13 optimization round, guide §1: interleaved measurement beats
cross-session comparison on a drifting box).

Variant A = the shipped dedup_clusters.  Variant B = the candidate:
  - edges from ONE scan of the pairs subtree (explode of a 2-struct
    array instead of fwd.union(rev), which plants the whole pairs
    pipeline in the plan twice);
  - edges pre-partitioned by dst before persist, so the per-round
    message join reuses the cached partitioning instead of
    re-exchanging the (largest) edge table every round.

Runs A,B,A,B... interleaved over the same ngram_jaccard_pairs input at
the given SF, checks both return identical (doc_id, cluster_id) sets,
prints per-run walls.

    python tools/cc_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from xyzpy_spark.session import get_spark
from xyzpy_spark.pipeline.dedup import dedup_clusters, ngram_jaccard_pairs


def cc_b(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    checkpoint_every: int = 5,
    shortcut: bool = True,
) -> DataFrame:
    spark = pairs.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                ),
                F.struct(
                    F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    edges = both.distinct().repartition(nparts, "dst").persist()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    cached = labels.persist()
    labels = cached
    converged = False
    for i in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = labels.join(
            nbr_min, labels.id == nbr_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("label"), F.coalesce("nbr_label", "label")
            ).alias("label"),
            F.col("label").alias("__old"),
        )
        if shortcut:
            lbl_of = labels.select(
                F.col("id").alias("__lid"), F.col("label").alias("__llbl")
            )
            new_labels = new_labels.join(
                lbl_of, new_labels.label == lbl_of.__lid, "left"
            ).select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("__llbl", "label")
                ).alias("label"),
                "__old",
            )
        new_labels = new_labels.select(
            "id", "label", (F.col("label") < F.col("__old")).alias("__chg")
        )
        if (i + 1) % checkpoint_every == 0:
            new_cached = new_labels.localCheckpoint(eager=False)
        else:
            new_cached = new_labels.persist()
        changed = (
            new_cached.agg(F.max(F.col("__chg").cast("int"))).first()[0] or 0
        )
        cached.unpersist()
        cached = new_cached
        labels = new_cached.drop("__chg")
        if not changed:
            converged = True
            break
    edges.unpersist()
    if not converged:
        warnings.warn("cc_b: no fixpoint", RuntimeWarning)
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="cc_ab")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def pairs():
        return ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, max_shingle_freq=None
        )

    # parity check once
    a = {tuple(r) for r in dedup_clusters(pairs()).collect()}
    spark.catalog.clearCache()
    b = {tuple(r) for r in cc_b(pairs()).collect()}
    spark.catalog.clearCache()
    print("parity:", "OK" if a == b else "MISMATCH", len(a), len(b))
    if a != b:
        sys.exit(1)

    for r in range(rounds):
        for name, fn in (("A", dedup_clusters), ("B", cc_b)):
            t0 = time.time()
            fn(pairs()).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            spark.catalog.clearCache()
            print(
                f"run{r} {name}: {dt:.3f}s load={os.getloadavg()[0]:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
