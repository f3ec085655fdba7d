#!/usr/bin/env python
"""Interleaved A/B of the segmented winnow-index load consolidation
(r13): A = the pre-change full re-aggregation, B = the fold-based
load_winnow_index now in the package.  Same staged layout, same
materialization (persist + count of index, collect of dropped),
parity-checked.

    python tools/load_ab.py [sf_dir] [rounds]
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
    build_winnow_index,
    extend_winnow_index,
    load_winnow_index,
    read_committed_segments,
    save_winnow_index,
)


def load_old(spark, path):
    """The pre-r13 consolidation: full re-aggregation over main+segs."""
    main = spark.read.parquet(path + "/main")
    dropped = spark.read.parquet(path + "/dropped")
    segs = read_committed_segments(spark, path)
    if segs is None:
        return main, dropped
    meta = main.select("k", "w", "hash_fn", "max_fp_freq").first()
    if meta is None:
        return main, dropped
    idc = main.columns[0]
    rows = main.select(idc, "fingerprint").unionByName(
        segs.select(idc, "fingerprint")
    )
    cap = int(meta["max_fp_freq"])
    if cap:
        extra = (
            rows.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("__f"))
            .where(F.col("__f") > cap)
            .select("fingerprint")
        )
        dropped = (
            dropped.select("fingerprint").unionByName(extra).distinct()
        )
    kept = rows.join(F.broadcast(dropped), "fingerprint", "left_anti")
    sizes = kept.groupBy(idc).agg(F.count(F.lit(1)).alias("n_fp"))
    index = kept.join(sizes, idc).select(
        idc,
        "fingerprint",
        "n_fp",
        F.lit(int(meta["k"])).alias("k"),
        F.lit(int(meta["w"])).alias("w"),
        F.lit(str(meta["hash_fn"])).alias("hash_fn"),
        F.lit(cap).alias("max_fp_freq"),
    )
    return index, dropped


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="load_ab")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .repartition(32)
    )
    initial = docs.where((F.col("doc_id") % 10).between(1, 4))
    delta = docs.where(F.col("doc_id") % 10 >= 5)
    tmp = tempfile.mkdtemp(prefix="load_ab_")
    p = f"{tmp}/widx"
    try:
        index, dropped = build_winnow_index(
            initial, k=6, w=5, max_fp_freq=50, hash_fn="md5"
        )
        save_winnow_index(index, dropped, p, fp_buckets=32)
        extend_winnow_index(delta, p)

        def run(loader):
            idx, drp = loader(spark, p)
            idx = idx.persist()
            idx.count()
            drp.write.format("noop").mode("overwrite").save()
            idx.unpersist()

        # parity once
        ia, da = load_old(spark, p)
        a = {
            tuple(r)
            for r in ia.select(
                "doc_id", "fingerprint", "n_fp"
            ).collect()
        }
        da_s = {r[0] for r in da.collect()}
        ib, db = load_winnow_index(spark, p)
        b = {
            tuple(r)
            for r in ib.select(
                "doc_id", "fingerprint", "n_fp"
            ).collect()
        }
        db_s = {r[0] for r in db.collect()}
        print(
            "parity:",
            "OK" if (a == b and da_s == db_s) else "MISMATCH",
            len(a), len(b), len(da_s), len(db_s),
        )
        if a != b or da_s != db_s:
            sys.exit(1)

        for r in range(rounds):
            for name, loader in (
                ("A_full_reagg", load_old),
                ("B_fold_load", load_winnow_index),
            ):
                t0 = time.time()
                run(loader)
                print(
                    f"run{r} {name}: {time.time()-t0:.3f}s "
                    f"load={os.getloadavg()[0]:.2f}",
                    flush=True,
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
