#!/usr/bin/env python
"""Per-job wall breakdown of one extend_dedup_index call (r13, guide
§1): stamp .first() reads vs bucket collects vs append writes.

    python tools/extend_internals.py [sf_dir]
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
    save_dedup_index,
)


def t(rec, key, fn):
    t0 = time.time()
    out = fn()
    rec[key] = round(time.time() - t0, 3)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="extend_internals")
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 10 != 0)
    delta_raw = docs.where(F.col("doc_id") % 20 == 0)
    tmp = tempfile.mkdtemp(prefix="extint_")
    p = f"{tmp}/didx"
    try:
        idx = build_dedup_index(hist, n=2, hash_fn="md5").localCheckpoint(
            eager=True
        )
        save_dedup_index(
            idx, band_dedup_index(idx, n=2, hash_fn="md5"), p,
            fp_buckets=16, bb_buckets=16,
        )
        for rnd in range(3):
            rec = {"round": rnd}
            batch = t(
                rec, "stage_batch",
                lambda: delta_raw.localCheckpoint(eager=True),
            )
            bi = t(
                rec, "sign",
                lambda: build_dedup_index(
                    batch, n=2, hash_fn="md5"
                ).localCheckpoint(eager=True),
            )
            # --- extend_dedup_index internals, inlined with timers ---
            bands_tbl = t(
                rec, "read_bands",
                lambda: spark.read.parquet(os.path.join(p, "bands")),
            )
            main_tbl = t(
                rec, "read_main",
                lambda: spark.read.parquet(os.path.join(p, "main")),
            )
            meta = t(
                rec, "first_meta",
                lambda: bands_tbl.select(
                    "num_perm", "bands", "n", "hash_fn"
                ).first(),
            )
            fp_buckets = t(
                rec, "first_fpb",
                lambda: int(
                    main_tbl.select("fp_buckets").first()["fp_buckets"]
                ),
            )
            bb_buckets = t(
                rec, "first_bbb",
                lambda: int(
                    bands_tbl.select("bb_buckets").first()["bb_buckets"]
                ),
            )
            idc = bi.columns[0]
            delta_ids = bi.select(idc)
            bands_d = band_dedup_index(
                bi, num_perm=int(meta["num_perm"]),
                bands=int(meta["bands"]), n=int(meta["n"]),
                hash_fn=str(meta["hash_fn"]),
            ).withColumn(
                "bb_bucket",
                F.pmod(
                    F.xxhash64(F.col("band"), F.col("bucket")),
                    F.lit(bb_buckets),
                ),
            ).withColumn("bb_buckets", F.lit(bb_buckets))
            main_d = bi.withColumn(
                "fp_bucket",
                F.pmod(F.xxhash64("fingerprint"), F.lit(fp_buckets)),
            ).withColumn("fp_buckets", F.lit(fp_buckets))
            for delta, tbl, sub, bucket_col, keys in (
                (main_d, main_tbl, "main", "fp_bucket", [idc]),
                (bands_d, bands_tbl, "bands", "bb_bucket", [idc, "band"]),
            ):
                bkts = t(
                    rec, f"collect_bkts_{sub}",
                    lambda d=delta, bc=bucket_col: [
                        r[0]
                        for r in d.select(bc).distinct().collect()
                    ],
                )
                appended = (
                    tbl.where(F.col(bucket_col).isin(bkts))
                    .join(F.broadcast(delta_ids), idc, "left_semi")
                    .select(*keys)
                    .distinct()
                )
                fresh = delta.join(
                    F.broadcast(appended), keys, "left_anti"
                )
                t(
                    rec, f"append_{sub}",
                    lambda f=fresh, bc=bucket_col, s=sub: f.repartition(
                        F.col(bc)
                    )
                    .write.mode("append")
                    .partitionBy(bc)
                    .parquet(os.path.join(p, s)),
                )
            print(rec, flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
