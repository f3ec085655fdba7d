#!/usr/bin/env python
"""Same-session A/B for the q_stream_hll gate row (r13 optimization,
guide §2.6 "overlap independent jobs"): the row runs TWO independent
availableNow streaming queries (user_id and event_id sketches) back to
back, so each pays the full stream-machinery fixed cost serially.

Variant A = shipped: sequential streams.
Variant B = candidate: the same two hll_stream_distinct calls running
concurrently from a 2-thread pool (separate checkpoints/outputs —
the operators themselves are untouched).

Checks both variants produce identical final-epoch estimate rows.

    python tools/stream_overlap_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xyzpy_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def _final_rows(spark, out):
    est = spark.read.parquet(out)
    last = est.agg(F.max("epoch_id")).first()[0]
    return sorted(
        tuple(r) for r in est.where(F.col("epoch_id") == last).collect()
    )


def run(spark, overlap: bool):
    from xyzpy_spark.streaming.ops import (
        hll_stream_distinct,
        read_events_stream,
        scoped_shuffle_partitions,
    )

    tmp = tempfile.mkdtemp(prefix="xyzpy_hllab_")
    try:
        def one(kind_col):
            kind, col = kind_col
            out = f"{tmp}/{kind}/out"
            hll_stream_distinct(
                read_events_stream(spark, SF_DIR),
                col,
                out,
                f"{tmp}/{kind}/state",
                by="event_type",
                p=8,
                # width set ONCE around the pool: per-stream scoped
                # save/restore would race between concurrent threads
                state_partitions=None,
            )
            return kind, out

        jobs = [("u", "user_id"), ("e", "event_id")]
        t0 = time.time()
        with scoped_shuffle_partitions(spark, 8):
            if overlap:
                with ThreadPoolExecutor(max_workers=2) as pool:
                    outs = dict(pool.map(one, jobs))
            else:
                outs = dict(one(j) for j in jobs)
        rows = {k: _final_rows(spark, v) for k, v in outs.items()}
        return time.time() - t0, rows
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="stream_overlap_ab")
    # warm up stream machinery once
    run(spark, False)
    for r in range(ROUNDS):
        ta, rows_a = run(spark, False)
        tb, rows_b = run(spark, True)
        same = rows_a == rows_b
        print(
            f"round {r}: A(seq) {ta:.2f}s  B(overlap) {tb:.2f}s  "
            f"identical={same}",
            flush=True,
        )
        if not same:
            raise SystemExit("PARITY FAILURE: variants differ")


if __name__ == "__main__":
    main()
