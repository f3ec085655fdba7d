#!/usr/bin/env python
"""Harvest top-up cost vs store size: the bytes-rewritten receipt.

The Harvester's ``partition_by=`` layout exists so an incremental
harvest pays O(touched partitions), not O(store).  Wall-clock at test
scale is fixed-overhead-bound, so the honest receipt signal is BYTES
REWRITTEN: build a store of ``--coords`` coordinates of a sweep dim
(``--rows-per-coord`` rows each, precomputed column math — evaluation
is excluded so the receipt isolates merge+publish), then run ONE
single-coordinate top-up through ``add_df`` and measure the bytes of
store files whose mtime is newer than the top-up start.

Run it at two store sizes (e.g. --coords 8 and --coords 800) for the
paired 1x-vs-100x fraction table in BASELINE.md §5::

    python tools/harvest_scale.py --coords 8 --coords 800
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from xyzpy_spark.farming import Harvester, Runner
from xyzpy_spark.session import get_spark


def _store_bytes(path: str, newer_than: float | None = None) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            if newer_than is None or os.path.getmtime(p) >= newer_than:
                total += os.path.getsize(p)
    return total


def _result_df(spark, coords, rows_per_coord: int):
    """A precomputed sweep-result table for the given 'a' coordinates:
    b sweeps rows_per_coord//3 values, time sweeps 3 — pure column
    math, no python kernel (the receipt isolates merge+publish)."""
    n_b = rows_per_coord // 3
    a = spark.createDataFrame([(c,) for c in coords], "a long")
    b = spark.range(n_b).select(F.col("id").alias("b"))
    t = spark.createDataFrame(
        [(0.0,), (0.5,), (1.0,)], "time double"
    )
    return (
        a.crossJoin(b)
        .crossJoin(t)
        .select(
            "a",
            "b",
            "time",
            (F.col("a") + F.col("b")).alias("s"),
            (F.col("a") * (F.col("time") + 1.0)).alias("arr"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--coords", type=int, action="append", default=None,
        help="store sizes (number of 'a' coordinates); repeatable",
    )
    ap.add_argument("--rows-per-coord", type=int, default=6000)
    args = ap.parse_args()
    sizes = args.coords or [8, 80]

    spark = get_spark(app_name="xyzpy_harvest_scale")
    # a Runner whose dims match the result table (the kernel is never
    # called: every add goes through add_df with precomputed results)
    r = Runner(
        lambda a, b: None, var_names=["s"], spark=spark,
        fn_args=["a", "b"],
    )
    out = tempfile.mkdtemp(prefix="xyzpy_harvest_scale_")
    rows = []
    try:
        for n_coords in sizes:
            for layout in ("full", "partition_by"):
                store = os.path.join(
                    out, f"store_{n_coords}_{layout}"
                )
                h = Harvester(
                    r, store,
                    partition_by=(
                        "a" if layout == "partition_by" else None
                    ),
                )
                base = _result_df(
                    spark, list(range(n_coords)), args.rows_per_coord
                )
                h.add_df(base, ["a", "b", "time"])
                size_before = _store_bytes(store)
                # filesystem mtime granularity: make the cut unambiguous
                time.sleep(1.1)
                t0 = time.time()
                topup = _result_df(
                    spark, [n_coords], args.rows_per_coord
                )
                wall0 = time.time()
                h.add_df(topup, ["a", "b", "time"])
                wall = time.time() - wall0
                wrote = _store_bytes(store, newer_than=t0)
                rows.append(
                    {
                        "coords": n_coords,
                        "layout": layout,
                        "store_mb": round(size_before / 1e6, 2),
                        "topup_wrote_mb": round(wrote / 1e6, 2),
                        "fraction": round(
                            wrote / max(size_before, 1), 4
                        ),
                        "topup_wall_s": round(wall, 2),
                    }
                )
                print(f"# {rows[-1]}", file=sys.stderr)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    print(
        json.dumps(
            {"metric": "harvest_topup_bytes_rewritten", "rows": rows}
        )
    )


if __name__ == "__main__":
    main()
