#!/usr/bin/env python
"""Per-epoch ingest serve-cost receipt (r13, r12 verdict ask #2).

The r12 receipt (scale_r12_extend.json) priced the winnow ingest's
per-epoch as-of load at ~44-50 s at 100x REGARDLESS of segment count —
the full consolidation aggregation `winnow_ingest_stream` used to pay
every micro-batch.  r13 replaces that with a one-time pre-run
consolidation (persisted MEMORY_AND_DISK) plus a per-epoch
`fold_winnow_segments` over only this run's committed segments.  This
tool measures the claim at scale, driving the EXACT code path the
streaming sink runs (same functions, same order — the sink's loop with
the stream scaffolding removed so each stage can be timed):

1. Build + save the winnow index over a ``--mult``x replicated corpus
   (the extend_scale.py perturbation), then extend it with
   ``--prerun`` pre-run segments so the run-start consolidation is
   real work, not a no-op.
2. Record the RUN-START cost the new path pays once:
   ``load_winnow_index(before_seg=base)`` + persist + materialize.
3. For each of ``--epochs`` micro-batches record, side by side:
   - ``old_sec``  — the r12 per-epoch cost: a fresh
     ``load_winnow_index(before_seg=base+e)`` consolidation + probe;
   - ``new_sec``  — the r13 per-epoch cost: ``fold_winnow_segments``
     over the run's committed segments (against the persisted pre-run
     state) + the same probe;
   - ``extend_sec`` and the fold/old row-count equality (the parity
     law is pinned bit-for-bit in pytest; the count here is a receipt
     sanity line).
4. Record the compact-probe anchor (flat layout, before any
   segments) the verdict asks the new per-epoch cost to approximate.

Every wall carries the 1-minute load average; single-session absolute
costs — read walls against the anchors, not across load spikes.

    python tools/ingest_epoch_scale.py [--mult 100] [--epochs 4]
        [--prerun 4] [--out scale_r13_ingest.json]
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

from pyspark import StorageLevel
from pyspark.sql import functions as F

from xyzpy_spark.session import get_spark

REP = "__rep"


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
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--prerun", type=int, default=4)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="scale_r13_ingest.json")
    args = ap.parse_args()

    spark = get_spark(app_name="xyzpy_ingest_epoch_scale")
    tmp = tempfile.mkdtemp(prefix="xyzpy_ingest_scale_")
    rec: dict = {
        "metric": "ingest_per_epoch_serve_cost",
        "mult": args.mult,
        "epochs": args.epochs,
        "prerun_segments": args.prerun,
        "src": args.src,
        "load_avg_at_start": _load(),
    }
    try:
        from xyzpy_spark.pipeline.dedup import (
            build_winnow_index,
            extend_winnow_index,
            fold_winnow_segments,
            load_winnow_index,
            read_committed_segments,
            save_winnow_index,
            winnow_against_index,
        )

        corpus_path = os.path.join(tmp, "corpus")
        _tagged_docs(spark, args.src, args.mult, 0, "c").repartition(
            64
        ).write.parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        delta_path = os.path.join(tmp, "delta")
        _tagged_docs(
            spark, args.src, 1, 500_000_000_000, "d"
        ).repartition(8).write.parquet(delta_path)
        delta = spark.read.parquet(delta_path)
        rec["corpus_docs"] = corpus.count()
        rec["delta_docs"] = delta.count()

        wkw = dict(
            k=6, w=5, max_fp_freq=50 * args.mult, hash_fn="xxhash64"
        )
        pkw = dict(threshold=0.2, **wkw)
        wp = os.path.join(tmp, "widx")

        sec, ld, _ = _timed(
            lambda: save_winnow_index(
                *build_winnow_index(corpus, **wkw), wp, fp_buckets=1024
            )
        )
        rec["build_save_sec"] = sec
        rec["build_save_load"] = ld

        # the compact-probe anchor: flat layout, one micro-batch
        nslices = args.prerun + args.epochs + 1
        batch = delta.where(F.col("doc_id") % nslices == nslices - 1)
        rec["probe_batch_docs"] = batch.count()

        def _flat_probe():
            idx, drp = load_winnow_index(spark, wp)
            return winnow_against_index(
                batch, idx, dropped=drp, **pkw
            ).count()

        sec, ld, _ = _timed(_flat_probe)
        rec["probe_flat_anchor_sec"] = sec
        rec["probe_flat_anchor_load"] = ld

        # pre-run segments: the index this run RESUMES onto
        for j in range(args.prerun):
            sub = delta.where(F.col("doc_id") % nslices == j)
            extend_winnow_index(sub, wp)
        base = args.prerun

        # run-start (once per run): consolidate pre-run state + pin
        def _prep():
            idx0, drp0 = load_winnow_index(spark, wp, before_seg=base)
            idx0 = idx0.persist(StorageLevel.MEMORY_AND_DISK)
            drp0 = drp0.persist(StorageLevel.MEMORY_AND_DISK)
            idx0.count()
            drp0.count()
            return idx0, drp0

        sec, ld, (idx0, drp0) = _timed(_prep)
        rec["run_start_consolidate_persist_sec"] = sec
        rec["run_start_consolidate_persist_load"] = ld

        def _run_segs(upto_seg):
            return read_committed_segments(
                spark, wp, lo=base, hi=upto_seg
            )

        epochs = []
        for e in range(args.epochs):
            seg = base + e
            sub = delta.where(F.col("doc_id") % nslices == args.prerun + e)

            # r12 path: fresh full consolidation per epoch
            def _old():
                idx, drp = load_winnow_index(spark, wp, before_seg=seg)
                return winnow_against_index(
                    sub, idx, dropped=drp, **pkw
                ).count()

            old_sec, old_ld, old_n = _timed(_old)

            # r13 path: fold this run's segments into the pinned state
            def _new():
                segs = _run_segs(seg)
                idx, drp = (
                    fold_winnow_segments(idx0, drp0, segs)
                    if segs is not None
                    else (idx0, drp0)
                )
                return winnow_against_index(
                    sub, idx, dropped=drp, **pkw
                ).count()

            new_sec, new_ld, new_n = _timed(_new)

            xsec, xld, _ = _timed(
                lambda s=sub, g=seg: extend_winnow_index(s, wp, seg=g)
            )
            epochs.append(
                {
                    "epoch": e,
                    "run_segments_folded": e,
                    "old_consolidate_probe_sec": old_sec,
                    "old_load": old_ld,
                    "new_fold_probe_sec": new_sec,
                    "new_load": new_ld,
                    "rows_equal": old_n == new_n,
                    "extend_sec": xsec,
                    "extend_load": xld,
                }
            )
        rec["epochs_detail"] = epochs
        rec["load_avg_at_end"] = _load()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    line = json.dumps(rec)
    with open(args.out, "w") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
