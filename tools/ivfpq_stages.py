#!/usr/bin/env python
"""Attribution + A/B for the similarity_ivf_pq / similarity_pq gate
rows (r13 optimization, guide §1/§2.3).

Times the three jobs the portable residual-IVF-PQ row runs —
(1) the centroid sample collect, (2) the codeword-residual sample
collect, (3) the main assign+encode+LUT+re-rank query — and A/Bs the
candidate sampling rewrite: take the md5-digest top-k over IDS ONLY
first (cheap scan), then evaluate the heavy quantize/assign/residual
expressions over just those k rows (guide §2.3: project before the
expensive compute; the digest order is preserved by re-sorting the
filtered rows on the same key).

    python tools/ivfpq_stages.py [sf_dir] [rounds]
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


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="ivfpq_stages")
    from xyzpy_spark.pipeline.dedup import _qvec
    from xyzpy_spark.pipeline.similarity import ivf_pq_topk_portable

    emb = entrymod._t(spark, SF_DIR, "embeddings").repartition(32)
    _noop(emb)
    id_col, vec_col, seed, n_cells, quantize = "vec_id", "embedding", 42, 8, 1 << 20

    def _md5key(tag):
        return F.md5(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{tag}")).cast(
                "binary"
            )
        )

    for r in range(ROUNDS):
        # A: shipped sampling — qvec evaluated for every row under the sort
        t0 = time.time()
        cents_a = (
            emb.select(F.col(id_col), _qvec(vec_col, quantize).alias("qv"))
            .orderBy(_md5key(seed))
            .limit(n_cells)
            .collect()
        )
        t1 = time.time()
        # B: ids first, then qvec over the 8 surviving rows
        ids = [
            row[0]
            for row in emb.select(F.col(id_col))
            .orderBy(_md5key(seed))
            .limit(n_cells)
            .collect()
        ]
        cents_b = (
            emb.where(F.col(id_col).isin(ids))
            .select(F.col(id_col), _qvec(vec_col, quantize).alias("qv"))
            .orderBy(_md5key(seed))
            .collect()
        )
        t2 = time.time()
        same = [(row[0], list(row[1])) for row in cents_a] == [
            (row[0], list(row[1])) for row in cents_b
        ]
        # full query for scale
        queries = emb.where(F.col("vec_id") < 5)
        out = ivf_pq_topk_portable(
            emb, queries, k=5, n_cells=8, nprobe=4, m=8, ksub=8,
            shortlist=20,
        )
        t3 = time.time()
        _noop(out)
        t4 = time.time()
        print(
            f"round {r}: sampleA {t1-t0:.2f}  sampleB {t2-t1:.2f} "
            f"identical={same}  full-plan-build {t3-t2:.2f}  "
            f"full-exec {t4-t3:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
