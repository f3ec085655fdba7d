#!/usr/bin/env python
"""Incremental index-growth scale receipt (r12, r11 verdict ask #1).

The r11 100x streaming receipts leaned on "production pays the index
build incrementally" — `extend_winnow_index` / `extend_dedup_index`
are that path, correctness-pinned bit-for-bit in pytest, but the
O(delta) claim itself had no measured receipt against a grown index.
This tool produces it:

1. Replicate the sf0.1 documents table ``--mult``x (default 100; the
   scale_bench perturbation — every 3rd token tagged per replica, so
   replicas are new content at the same dup density) and build + save
   each index over the replica (the full-rebuild cost anchor: a
   rebuild over corpus+delta is >= this wall by construction).
2. Construct a 1x DELTA with fresh doc ids and its own token tag (new
   content, the honest ingest shape), split into 16 sub-deltas.
3. WINNOW: extend segment by segment, recording per-extend wall and
   bytes written; at 1, 4 and 16 accumulated segments, record the
   consolidated-load materialization wall (the cap/size aggregation a
   serve process pays once per snapshot) and the consolidated-probe
   wall; then `compact_winnow_index` (wall recorded) and re-probe the
   flat layout, asserting dynamic partition pruning is back in the
   probe plan.
4. MINHASH: extend once with the whole 1x delta (wall + bytes
   appended into the fp_bucket/bb_bucket dirs), probe before/after
   (DPP asserted on both — appends land inside the partitioned
   layout), and re-extend the SAME delta to record the retry/no-op
   wall (the r12 anti-join retry-safety cost).

Every wall carries the 1-minute load average next to it; this is a
single-session absolute-cost receipt (not a paired 1x/Nx ratio), so
read the walls against the build anchor, not against each other
across load spikes.

    python tools/extend_scale.py [--mult 100] [--out scale_r12_extend.json]
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

from xyzpy_spark.plans.inspect import executed_plan
from xyzpy_spark.session import get_spark

REP = "__rep"


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _load() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def _timed(fn):
    ld = _load()
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), ld, out


def _tagged_docs(spark, src: str, mult: int, base_id: int, tag: str):
    """documents replicated mult-x with fresh ids and per-replica
    token tags — the scale_bench perturbation (new content, same
    internal dup density)."""
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    docs = docs.withColumn(
        REP, F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
    ).withColumn(
        "doc_id",
        F.col("doc_id") + F.lit(base_id)
        + F.col(REP).cast("long") * F.lit(1_000_000_000),
    )
    perturbed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w, i: F.when(
                i % 3 == 0,
                F.concat(w, F.lit("_" + tag), F.col(REP).cast("string")),
            ).otherwise(w),
        ),
        " ",
    )
    return docs.withColumn("text", perturbed).drop(REP)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="scale_r12_extend.json")
    args = ap.parse_args()

    spark = get_spark(app_name="xyzpy_extend_scale")
    tmp = tempfile.mkdtemp(prefix="xyzpy_extend_scale_")
    rec: dict = {
        "metric": "incremental_index_growth",
        "mult": args.mult,
        "src": args.src,
        "load_avg_at_start": _load(),
    }
    try:
        from xyzpy_spark.pipeline.dedup import (
            band_dedup_index,
            build_dedup_index,
            build_winnow_index,
            compact_winnow_index,
            dedup_against_index,
            extend_dedup_index,
            extend_winnow_index,
            load_dedup_index,
            load_winnow_index,
            save_dedup_index,
            save_winnow_index,
            winnow_against_index,
        )

        # --- corpus at mult-x, delta at 1x (fresh ids, new content),
        # probe batch small (an ingest micro-batch)
        corpus_path = os.path.join(tmp, "corpus")
        _tagged_docs(spark, args.src, args.mult, 0, "c").repartition(
            64
        ).write.parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        delta_path = os.path.join(tmp, "delta")
        _tagged_docs(spark, args.src, 1, 500_000_000_000, "d").repartition(
            8
        ).write.parquet(delta_path)
        delta = spark.read.parquet(delta_path)
        rec["corpus_docs"] = corpus.count()
        rec["delta_docs"] = delta.count()
        batch = delta.where(F.col("doc_id") % 50 == 0)
        rec["probe_batch_docs"] = batch.count()

        # the gate rows use max_fp_freq=50 on a 5k-doc corpus; the
        # cap is a boilerplate threshold ("in more than N docs"), so
        # it scales with corpus size — a fixed 50 at 100x drops
        # nearly every fingerprint (common 6-gram collisions across
        # 500k docs) and the receipt would measure a degenerate
        # near-empty index instead of the production shape
        wkw = dict(
            k=6, w=5, max_fp_freq=50 * args.mult, hash_fn="xxhash64"
        )
        pkw = dict(threshold=0.2, **wkw)

        # ---------------- winnow family ----------------
        wp = os.path.join(tmp, "widx")

        def _wbuild():
            idx, drp = build_winnow_index(corpus, **wkw)
            save_winnow_index(idx, drp, wp, fp_buckets=1024)

        sec, ld, _ = _timed(_wbuild)
        rec["winnow_build_save_100x_sec"] = sec
        rec["winnow_build_save_100x_load"] = ld
        rec["winnow_index_bytes"] = _du(wp)

        # O(delta) anchor: the SAME build over just the 1x delta
        wp1 = os.path.join(tmp, "widx_1x")
        sec, ld, _ = _timed(
            lambda: save_winnow_index(
                *build_winnow_index(delta, **wkw), wp1, fp_buckets=1024
            )
        )
        rec["winnow_build_save_1x_sec"] = sec
        rec["winnow_build_save_1x_load"] = ld
        shutil.rmtree(wp1, ignore_errors=True)

        extends = []
        seg_points = {}
        for j in range(16):
            sub = delta.where(F.col("doc_id") % 16 == j)
            before = _du(os.path.join(wp, "segments")) if j else 0
            sec, ld, _ = _timed(lambda s=sub: extend_winnow_index(s, wp))
            extends.append(
                {
                    "seg": j,
                    "sec": sec,
                    "load": ld,
                    "bytes_written": _du(os.path.join(wp, "segments"))
                    - before,
                }
            )
            if j + 1 in (1, 4, 16):
                # consolidation cost: materialize the consolidated
                # index (global cap + per-doc size aggregation)
                sec, ld, n = _timed(
                    lambda: load_winnow_index(spark, wp)[0].count()
                )
                # consolidated probe (load + flat probe, noop-style)
                def _probe():
                    idx, drp = load_winnow_index(spark, wp)
                    return winnow_against_index(
                        batch, idx, dropped=drp, **pkw
                    ).count()

                psec, pld, pn = _timed(_probe)
                seg_points[str(j + 1)] = {
                    "consolidate_count_sec": sec,
                    "consolidate_load": ld,
                    "index_rows": n,
                    "probe_sec": psec,
                    "probe_load": pld,
                    "probe_rows": pn,
                }
        rec["winnow_extends"] = extends
        rec["winnow_seg_points"] = seg_points

        sec, ld, _ = _timed(lambda: compact_winnow_index(spark, wp))
        rec["winnow_compact_sec"] = sec
        rec["winnow_compact_load"] = ld

        def _flat_probe_df():
            idx, drp = load_winnow_index(spark, wp)
            return winnow_against_index(batch, idx, dropped=drp, **pkw)

        plan = executed_plan(_flat_probe_df())
        rec["winnow_probe_dpp_after_compact"] = (
            "dynamicpruning" in plan.lower()
        )
        sec, ld, n = _timed(lambda: _flat_probe_df().count())
        rec["winnow_probe_after_compact_sec"] = sec
        rec["winnow_probe_after_compact_load"] = ld

        # ---------------- minhash family ----------------
        dkw = dict(n=3, num_perm=64, hash_fn="xxhash64")
        dp = os.path.join(tmp, "didx")

        def _dbuild():
            idx = build_dedup_index(corpus, **dkw)
            bands = band_dedup_index(idx, num_perm=64, bands=16, **{
                "n": 3, "hash_fn": "xxhash64",
            })
            save_dedup_index(idx, bands, dp, fp_buckets=64, bb_buckets=64)

        sec, ld, _ = _timed(_dbuild)
        rec["dedup_build_save_100x_sec"] = sec
        rec["dedup_build_save_100x_load"] = ld
        rec["dedup_index_bytes"] = _du(dp)

        dp1 = os.path.join(tmp, "didx_1x")

        def _dbuild1():
            idx = build_dedup_index(delta, **dkw)
            bands = band_dedup_index(idx, num_perm=64, bands=16, **{
                "n": 3, "hash_fn": "xxhash64",
            })
            save_dedup_index(idx, bands, dp1, fp_buckets=64, bb_buckets=64)

        sec, ld, _ = _timed(_dbuild1)
        rec["dedup_build_save_1x_sec"] = sec
        rec["dedup_build_save_1x_load"] = ld
        shutil.rmtree(dp1, ignore_errors=True)

        dpkw = dict(bands=16, threshold=0.5, **dkw)

        def _dprobe_df():
            idx, bands = load_dedup_index(spark, dp)
            return dedup_against_index(
                batch, idx, index_bands=bands, cache=False, **dpkw
            )

        plan = executed_plan(_dprobe_df())
        rec["dedup_probe_dpp_before_extend"] = (
            plan.lower().count("dynamicpruning") >= 2
        )
        sec, ld, _ = _timed(lambda: _dprobe_df().count())
        rec["dedup_probe_before_extend_sec"] = sec
        rec["dedup_probe_before_extend_load"] = ld

        before = _du(dp)
        sec, ld, _ = _timed(lambda: extend_dedup_index(delta, dp))
        rec["dedup_extend_sec"] = sec
        rec["dedup_extend_load"] = ld
        rec["dedup_extend_bytes_written"] = _du(dp) - before

        # retry/no-op cost of the r12 anti-join safety (redelivered
        # delta: both sides must append nothing)
        before = _du(dp)
        sec, ld, _ = _timed(lambda: extend_dedup_index(delta, dp))
        rec["dedup_extend_replay_sec"] = sec
        rec["dedup_extend_replay_load"] = ld
        rec["dedup_extend_replay_bytes_written"] = _du(dp) - before

        plan = executed_plan(_dprobe_df())
        rec["dedup_probe_dpp_after_extend"] = (
            plan.lower().count("dynamicpruning") >= 2
        )
        sec, ld, _ = _timed(lambda: _dprobe_df().count())
        rec["dedup_probe_after_extend_sec"] = sec
        rec["dedup_probe_after_extend_load"] = ld

        rec["load_avg_at_end"] = _load()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    line = json.dumps(rec)
    with open(args.out, "w") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
