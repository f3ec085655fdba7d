#!/usr/bin/env python
"""Same-session stage-attributed breakdown of dedup_corpus (r12,
r11 verdict ask #5): the heaviest registry row composes three stages
(near-dup PAIRS -> connected COMPONENTS -> winner ELECTION) that were
only ever benched as separate queries with different inputs.  This
records, in ONE session at the bench protocol (clearCache before each
sample, median of 3), cumulative walls for

  pairs   = ngram_jaccard_pairs(...)          (the gate config)
  labels  = dedup_clusters(pairs)             (pairs + propagation)
  total   = dedup_corpus(...)                 (everything)

so stage attribution reads: pairs, components = labels - pairs,
election = total - labels — and a future receipt drift on the row is
attributable in-record instead of needing ad-hoc re-derivation.

    python tools/dedup_corpus_stages.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from xyzpy_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="bench_r12_dedup_corpus_stages.json")
    args = ap.parse_args()

    spark = get_spark(app_name="xyzpy_dedup_corpus_stages")
    from xyzpy_spark.pipeline.dedup import (
        dedup_clusters,
        dedup_corpus,
        ngram_jaccard_pairs,
    )
    from xyzpy_spark.sources.tables import read_table

    docs = read_table(spark, args.sf_dir, "documents").select(
        "doc_id", "text"
    )
    kw = dict(n=3, threshold=0.5, max_shingle_freq=None)

    units = {
        "pairs": lambda: ngram_jaccard_pairs(docs, **kw),
        "labels": lambda: dedup_clusters(
            ngram_jaccard_pairs(docs, **kw)
        ),
        "total": lambda: dedup_corpus(docs, method="jaccard", **kw),
    }

    def _ld():
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return None

    # warm the JVM/codegen on the full plan first (bench protocol)
    units["total"]().write.format("noop").mode("overwrite").save()

    rec = {"metric": "dedup_corpus_stage_breakdown",
           "sf_dir": args.sf_dir, "config": str(kw),
           "load_avg_at_start": _ld(), "samples": {}}
    med = {}
    for name, mk in units.items():
        ss, lds = [], []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            lds.append(_ld())
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            ss.append(round(time.time() - t0, 4))
        rec["samples"][name] = [[s, ld] for s, ld in zip(ss, lds)]
        med[name] = round(statistics.median(ss), 4)
    rec["cumulative_sec"] = med
    rec["attributed_sec"] = {
        "pairs": med["pairs"],
        "components": round(med["labels"] - med["pairs"], 4),
        "election": round(med["total"] - med["labels"], 4),
    }
    rec["load_avg_at_end"] = _ld()
    line = json.dumps(rec)
    with open(args.out, "w") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
