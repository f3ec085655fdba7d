"""Interleaved A/B of dedup_clusters' lineage-truncation cadence:
checkpoint_every=5 (current default — the plan triples per round via
the 3 label references, ~3^5 subtree copies between seams) vs
every-round truncation (constant plan size; the per-round convergence
probe materializes the round anyway, so the seam adds no job).

Usage: python tools/cc_every_ab.py [sf_dir] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xyzpy_spark.session import get_spark  # noqa: E402
from xyzpy_spark.pipeline.dedup import (  # noqa: E402
    dedup_clusters,
    ngram_jaccard_pairs,
)
from xyzpy_spark.sources.tables import read_table  # noqa: E402

spark = get_spark(app_name="cc_every_ab")
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")


def run(every: int):
    pairs = ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_shingle_freq=None, cache=True
    )
    t0 = time.monotonic()
    out = dedup_clusters(pairs, checkpoint_every=every)
    rows = sorted(map(tuple, out.collect()))
    return time.monotonic() - t0, rows


_, ra = run(5)
_, rb = run(1)
print("identical =", ra == rb, f"({len(ra)} label rows)")

times: dict = {5: [], 1: []}
for i in range(reps):
    for every in (5, 1):
        spark.catalog.clearCache()
        sec, _ = run(every)
        times[every].append(sec)
        print(f"every={every} run{i}: {sec:.3f}s", flush=True)

import statistics  # noqa: E402

for every in (5, 1):
    print(f"every={every}: median {statistics.median(times[every]):.3f}s "
          f"all {[f'{t:.2f}' for t in times[every]]}")
spark.stop()
