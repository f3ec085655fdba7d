#!/usr/bin/env python
"""Stage-attributed timing of the winnow_index_extended lifecycle
(r13 optimization round: measure-first evidence for the most
expensive bench row).  Each stage is timed separately with a noop
sink where it returns a DataFrame; file counts of the written layout
are recorded (guide §6 small-files check).

    python tools/wext_stages.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xyzpy_spark.session import get_spark


def count_files(root: str) -> int:
    n = 0
    for _, _, files in os.walk(root):
        n += sum(1 for f in files if not f.startswith(("_", "."))
                 and f.endswith(".parquet"))
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="wext_stages")
    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        extend_winnow_index,
        load_winnow_index,
        save_winnow_index,
        winnow_against_index,
    )

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .repartition(32)
    )
    initial = docs.where((F.col("doc_id") % 10).between(1, 4))
    delta = docs.where(F.col("doc_id") % 10 >= 5)
    batch = docs.where(F.col("doc_id") % 10 == 0)

    # warm the JVM/codegen once (bench protocol is warm)
    warm = tempfile.mkdtemp(prefix="wext_warm_")
    try:
        i0, d0 = build_winnow_index(
            docs.limit(200), k=6, w=5, max_fp_freq=50, hash_fn="md5"
        )
        save_winnow_index(i0, d0, warm + "/w", fp_buckets=32)
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    out: list[dict] = []
    for r in range(runs):
        spark.catalog.clearCache()
        tmp = tempfile.mkdtemp(prefix="wext_stages_")
        rec: dict = {}
        try:
            p = f"{tmp}/widx"
            t0 = time.time()
            index, dropped = build_winnow_index(
                initial, k=6, w=5, max_fp_freq=50, hash_fn="md5"
            )
            rec["plan_build"] = round(time.time() - t0, 3)

            t0 = time.time()
            save_winnow_index(index, dropped, p, fp_buckets=32)
            rec["build_save"] = round(time.time() - t0, 3)
            rec["main_files"] = count_files(p + "/main")

            t0 = time.time()
            extend_winnow_index(delta, p)
            rec["extend"] = round(time.time() - t0, 3)
            rec["seg_files"] = count_files(p + "/segments")

            t0 = time.time()
            idx, drp = load_winnow_index(spark, p)
            idx = idx.persist()
            idx.count()
            rec["load_consolidate"] = round(time.time() - t0, 3)

            t0 = time.time()
            ann = winnow_against_index(
                batch, idx, dropped=drp, k=6, w=5, max_fp_freq=50,
                threshold=0.2, hash_fn="md5",
            )
            ann.write.format("noop").mode("overwrite").save()
            rec["probe"] = round(time.time() - t0, 3)
            idx.unpersist()
            rec["total"] = round(sum(
                v for k, v in rec.items()
                if k in ("plan_build", "build_save", "extend",
                         "load_consolidate", "probe")
            ), 3)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        rec["load_avg"] = round(os.getloadavg()[0], 2)
        out.append(rec)
        print(json.dumps(rec))
    print(json.dumps({"runs": out}))


if __name__ == "__main__":
    main()
