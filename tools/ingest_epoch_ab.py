#!/usr/bin/env python
"""Same-session A/B of the r14 dedup-ingest epoch internals (r13
verdict ask #2): per-epoch cost of the OLD sink body (limit(1) guard,
report write -> read-back -> extend with retry anti-joins) vs the NEW
one (census guard, overlap(report write, extend with intent-marker
skip)).  The stream engine wrapper is identical either way, so pricing
the sink body prices the change (the pytest parity tests pin stream ==
sequential loop bit-for-bit).

Each timed run gets a FRESH COPY of the saved index (untimed setup —
the extend appends, so state must reset) and a fresh out dir.

    python tools/ingest_epoch_ab.py [sf_dir] [rounds]
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
    dedup_against_index,
    extend_dedup_index,
    load_dedup_index,
    save_dedup_index,
)


def run_epoch(spark, idx_path, out_dir, batch_df, batch_idx, new: bool,
              stamps_probe, stamps_ext, token):
    id_col, text_col = "doc_id", "text"
    index, bands = load_dedup_index(spark, idx_path)
    raw_index, raw_bands = index, bands
    ids = batch_df.select(id_col)
    batch_fps = batch_idx.select(id_col, F.col("fingerprint").alias("__fp"))
    present_ids = []
    if new:
        pres = (
            index.join(F.broadcast(batch_fps), id_col)
            .select(id_col, (F.col("fingerprint") != F.col("__fp")).alias("__r"))
            .collect()
        )
        assert not any(r["__r"] for r in pres)
        present_ids = [r[id_col] for r in pres if not r["__r"]]
    else:
        reused = (
            index.join(F.broadcast(batch_fps), id_col)
            .where(F.col("fingerprint") != F.col("__fp"))
            .limit(1)
            .count()
        )
        assert not reused
    index = index.join(F.broadcast(ids), id_col, "left_anti")
    bands = bands.join(F.broadcast(ids), id_col, "left_anti")
    ann = dedup_against_index(
        batch_df, index, index_bands=bands, cache=False,
        id_col=id_col, text_col=text_col, prebuilt_index=batch_idx,
        stamps=stamps_probe, n=2, hash_fn="md5", threshold=0.3,
    )
    ep_dir = os.path.join(out_dir, "epoch_id=0")
    if new:
        ann = ann.localCheckpoint(eager=True)
        novel_ids = ann.where(F.col("dup_kind").isNull()).select(id_col)
        if present_ids:
            novel_ids = novel_ids.where(~F.col(id_col).isin(present_ids))
        novel = batch_df.join(
            F.broadcast(novel_ids), id_col, "left_semi"
        ).select(id_col, text_col)
        from concurrent.futures import ThreadPoolExecutor

        def _w():
            ann.write.mode("overwrite").parquet(ep_dir)

        def _e():
            extend_dedup_index(
                novel, idx_path, id_col=id_col, text_col=text_col,
                prebuilt_index=batch_idx.join(
                    F.broadcast(novel_ids), id_col, "left_semi"
                ),
                layout=(raw_index, raw_bands), stamps=stamps_ext,
                intent=token,
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(_w), pool.submit(_e)]:
                f.result()
    else:
        ann.write.mode("overwrite").parquet(ep_dir)
        novel_ids = (
            spark.read.parquet(ep_dir)
            .where(F.col("dup_kind").isNull())
            .select(id_col)
        )
        novel = batch_df.join(
            F.broadcast(novel_ids), id_col, "left_semi"
        ).select(id_col, text_col)
        extend_dedup_index(
            novel, idx_path, id_col=id_col, text_col=text_col,
            prebuilt_index=batch_idx.join(
                F.broadcast(novel_ids), id_col, "left_semi"
            ),
            layout=(raw_index, raw_bands), stamps=stamps_ext,
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ingest_epoch_ab")
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 10 != 0)
    ep0 = docs.where(F.col("doc_id") % 20 == 0)
    tmp = tempfile.mkdtemp(prefix="ingest_epoch_ab_")
    try:
        p = f"{tmp}/didx"
        index = build_dedup_index(hist, n=2, hash_fn="md5").localCheckpoint(
            eager=True
        )
        save_dedup_index(
            index, band_dedup_index(index, n=2, hash_fn="md5"), p,
            fp_buckets=16, bb_buckets=16,
        )
        batch = ep0.localCheckpoint(eager=True)
        batch_idx = build_dedup_index(
            batch, n=2, hash_fn="md5"
        ).localCheckpoint(eager=True)
        # warm both code paths once (codegen/JIT), then time
        n = [0]

        def setup():
            n[0] += 1
            cp = f"{tmp}/idx_{n[0]}"
            shutil.copytree(p, cp)
            return cp, f"{tmp}/out_{n[0]}"

        for name, new in (("warmA", False), ("warmB", True)):
            cp, od = setup()
            run_epoch(spark, cp, od, batch, batch_idx, new, {}, {},
                      f"t{n[0]}")
        for r in range(rounds):
            for name, new in (("A-old", False), ("B-new", True)):
                cp, od = setup()
                t0 = time.time()
                run_epoch(spark, cp, od, batch, batch_idx, new, {}, {},
                          f"t{n[0]}")
                dt = time.time() - t0
                print(
                    f"run{r} {name}: {dt:.3f}s "
                    f"load={os.getloadavg()[0]:.2f}",
                    flush=True,
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
