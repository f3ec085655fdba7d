#!/usr/bin/env python
"""Measure the duplicated-subtree cost of the winnow/MinHash index
build+save paths (r13 optimization round, guide §1).

Hypothesis: save_winnow_index(index, dropped, ...) computes the
md5-per-k-gram winnowing pass TWICE (main write + dropped write each
embed the whole fps subtree), and save_dedup_index(index,
band_dedup_index(index), ...) signs the corpus twice (main + bands).
Variant B materializes the shared subtree once (eager localCheckpoint)
before the writes.

    python tools/save_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xyzpy_spark.session import get_spark
from xyzpy_spark.pipeline.dedup import (
    band_dedup_index,
    build_dedup_index,
    build_winnow_index,
    save_dedup_index,
    save_winnow_index,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="save_ab")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .repartition(32)
    )
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    # warm
    corpus.limit(100).write.format("noop").mode("overwrite").save()

    def winnow_a(tmp):
        index, dropped = build_winnow_index(
            corpus, k=6, w=5, max_fp_freq=50, hash_fn="md5"
        )
        save_winnow_index(index, dropped, tmp + "/w", fp_buckets=32)

    def winnow_b(tmp):
        index, dropped = build_winnow_index(
            corpus, k=6, w=5, max_fp_freq=50, hash_fn="md5"
        )
        index = index.localCheckpoint(eager=True)
        dropped = dropped.localCheckpoint(eager=True)
        save_winnow_index(index, dropped, tmp + "/w", fp_buckets=32)

    def dedup_a(tmp):
        index = build_dedup_index(corpus, n=2, hash_fn="md5")
        save_dedup_index(
            index,
            band_dedup_index(index, n=2, hash_fn="md5"),
            tmp + "/d",
            fp_buckets=16,
            bb_buckets=16,
        )

    def dedup_b(tmp):
        index = build_dedup_index(
            corpus, n=2, hash_fn="md5"
        ).localCheckpoint(eager=True)
        save_dedup_index(
            index,
            band_dedup_index(index, n=2, hash_fn="md5"),
            tmp + "/d",
            fp_buckets=16,
            bb_buckets=16,
        )

    for r in range(rounds):
        for name, fn in (
            ("winnow_A", winnow_a),
            ("winnow_B", winnow_b),
            ("dedup_A", dedup_a),
            ("dedup_B", dedup_b),
        ):
            tmp = tempfile.mkdtemp(prefix="save_ab_")
            t0 = time.time()
            fn(tmp)
            dt = time.time() - t0
            shutil.rmtree(tmp, ignore_errors=True)
            print(
                f"run{r} {name}: {dt:.3f}s load={os.getloadavg()[0]:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
