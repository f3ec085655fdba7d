#!/usr/bin/env python
"""Interleaved A/B for the r13 curate_corpus restructure (guide §1):

A = the r12 composition, inlined here verbatim — semi-join dedup_exact,
    unseamed lm_tail / decontaminate self-joins (the 29-scan plan).
B = pipeline.curate.curate_corpus at HEAD — window dedup stage +
    non-eager localCheckpoint seams.

Runs A and B alternately in the same session (box drift hits both),
noop-sink timed, and checks the surviving row multisets are identical.

    python tools/curate_ab.py [sf_dir] [rounds] [broadcast|bloom]
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


def old_curate(df, ref, via):
    """The r12 wiring, stage for stage (no seams, semi-join dedup)."""
    from xyzpy_spark.pipeline.dedup import dedup_exact
    from xyzpy_spark.pipeline.text import (
        decontaminate,
        filter_blocklist,
        filter_corpus,
    )
    from xyzpy_spark.pipeline.lm import ccnet_buckets, train_bigram_lm

    cols = list(df.columns)
    out = df
    keep = dedup_exact(out, "text", "doc_id", hash_fn="md5").select(
        F.col("keep_id").alias("doc_id")
    )
    out = out.join(keep, "doc_id", "left_semi")
    out = filter_corpus(
        out, text_col="text", min_tokens=20, min_quality=0.5,
        max_top_bigram_frac=0.12,
    ).select(*cols)
    out = filter_blocklist(
        out, ["merge", "spark"], max_hits=2, text_col="text",
        id_col="doc_id",
    )
    unigrams, bigrams, vocab = train_bigram_lm(
        ref, text_col="text", id_col="doc_id"
    )
    kept = (
        ccnet_buckets(
            out, unigrams, bigrams, vocab, n=2, n_buckets=3,
            text_col="text", id_col="doc_id", lang_col="lang",
        )
        .where(F.col("bucket") < 3)
        .select("doc_id")
    )
    out = out.join(kept, "doc_id", "left_semi")
    out = decontaminate(
        out, ref, n=5, text_col="text", id_col="doc_id",
        min_hits=1, via=via,
    )
    return out.select("doc_id", "text", "lang", "source")


def new_curate(df, ref, via):
    from xyzpy_spark.pipeline.curate import curate_corpus

    return curate_corpus(
        df,
        reference_df=ref,
        hash_fn="md5",
        min_tokens=20,
        min_quality=0.5,
        max_top_bigram_frac=0.12,
        blocklist=["merge", "spark"],
        max_block_hits=2,
        lm_tail=True,
        lm_buckets=3,
        decontaminate_n=5,
        decontaminate_via=via,
    ).select("doc_id", "text", "lang", "source")


def main() -> None:
    spark = get_spark(app_name="curate_ab")
    docs = entrymod._t(spark, SF_DIR, "documents")
    ref = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    _noop(docs)  # warm reader

    for r in range(ROUNDS):
        spark.sparkContext.setJobDescription(f"curate A(old) round {r}")
        t0 = time.time()
        a = old_curate(corpus, ref, VIA)
        _noop(a)
        ta = time.time() - t0
        spark.sparkContext.setJobDescription(f"curate B(new) round {r}")
        t0 = time.time()
        b = new_curate(corpus, ref, VIA)
        _noop(b)
        tb = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        ra = sorted(tuple(x) for x in a.collect())
        rb = sorted(tuple(x) for x in b.collect())
        print(
            f"round {r} via={VIA}: A(old) {ta:.2f}s  B(new) {tb:.2f}s  "
            f"identical={ra == rb}  rows={len(ra)}/{len(rb)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
