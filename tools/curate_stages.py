#!/usr/bin/env python
"""Prefix-timing attribution for the curate_corpus gate rows (r13
optimization, guide §1): times each PREFIX of the five-stage recipe
with the noop sink, so the deltas attribute wall-clock to stages —
including the cost of the plan-subtree duplication each
``out.join(f(out))`` stage introduces (the before-plan holds 58
documents scans / 118 Exchanges at the full recipe).

    python tools/curate_stages.py [sf_dir] [rounds] [broadcast|bloom]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xyzpy_spark.session import get_spark
import __spark_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
VIA = sys.argv[3] if len(sys.argv) > 3 else "broadcast"


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def build(docs, ref, *, dedup, rules, block, lm_tail, decon):
    from xyzpy_spark.pipeline.curate import curate_corpus

    return curate_corpus(
        docs,
        reference_df=ref,
        hash_fn="md5",
        dedup="exact" if dedup else None,
        min_tokens=20 if rules else None,
        min_quality=0.5 if rules else None,
        max_top_bigram_frac=0.12 if rules else None,
        blocklist=["merge", "spark"] if block else None,
        max_block_hits=2,
        lm_tail=lm_tail,
        lm_buckets=3,
        decontaminate_n=5 if decon else None,
        decontaminate_via=VIA,
    ).select("doc_id", "text", "lang", "source")


def main() -> None:
    spark = get_spark(app_name="curate_stages")
    docs = entrymod._t(spark, SF_DIR, "documents")
    ref = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    _noop(docs)  # warm reader

    prefixes = [
        ("dedup", dict(dedup=True, rules=False, block=False, lm_tail=False, decon=False)),
        ("+rules", dict(dedup=True, rules=True, block=False, lm_tail=False, decon=False)),
        ("+block", dict(dedup=True, rules=True, block=True, lm_tail=False, decon=False)),
        ("+lm_tail", dict(dedup=True, rules=True, block=True, lm_tail=True, decon=False)),
        ("+decon", dict(dedup=True, rules=True, block=True, lm_tail=True, decon=True)),
    ]
    for r in range(ROUNDS):
        line = []
        for name, kw in prefixes:
            t0 = time.time()
            _noop(build(corpus, ref, **kw))
            line.append(f"{name} {time.time()-t0:.2f}")
        print(f"round {r}: " + "  ".join(line), flush=True)


if __name__ == "__main__":
    main()
