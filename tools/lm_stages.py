#!/usr/bin/env python
"""Stage attribution for the q_lm_stream_score gate row (r13
optimization round, guide §1: decide where the 5.6 s actually goes
before touching anything).

Times, in one session over the same SF:
  train   train_ngram_lm(ref, 2) — the contexts agg + vocab count job
  save    save_lm(...) — contexts/ngrams/meta writes (re-runs the aggs)
  stream  load_lm + lm_stream_score over the %10!=0 file stream
  read    read-back + top-64 TakeOrdered + collect

    python tools/lm_stages.py [sf_dir] [rounds]
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
import __spark_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    spark = get_spark(app_name="lm_stages")
    from xyzpy_spark.pipeline.lm import load_lm, save_lm, train_ngram_lm
    from xyzpy_spark.streaming.ops import (
        lm_stream_score,
        read_documents_stream,
    )

    docs = entrymod._t(spark, SF_DIR, "documents")
    ref = docs.where(F.col("doc_id") % 10 == 0)

    # warm up JVM/readers once
    docs.write.format("noop").mode("overwrite").save()

    for r in range(ROUNDS):
        tmp = tempfile.mkdtemp(prefix="xyzpy_lmstages_")
        try:
            t0 = time.time()
            model = train_ngram_lm(ref, 2)
            t1 = time.time()
            lm_path = tmp + "/lm"
            save_lm(*model, lm_path, n=2)
            t2 = time.time()
            contexts, ngrams, vocab, n = load_lm(spark, lm_path)
            out = tmp + "/nll"
            lm_stream_score(
                read_documents_stream(spark, SF_DIR).where(
                    F.col("doc_id") % 10 != 0
                ),
                contexts,
                ngrams,
                vocab,
                out,
                n=n,
                state_partitions=8,
            )
            t3 = time.time()
            rows = (
                spark.read.parquet(out)
                .select("doc_id", "n_bigrams", "nll")
                .orderBy(F.desc("nll"), F.asc("doc_id"))
                .limit(64)
                .collect()
            )
            t4 = time.time()
            print(
                f"round {r}: train {t1-t0:.2f}  save {t2-t1:.2f}  "
                f"stream {t3-t2:.2f}  read {t4-t3:.2f}  "
                f"total {t4-t0:.2f}  ({len(rows)} rows)",
                flush=True,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
