"""Interleaved A/B of suspected-regressed rows: r13-close code vs the
current tree on the same box (the cross-box BENCH numbers cannot
separate code from box epoch).

Usage: PYTHONPATH=<checkout> python tools/regress_ab.py <checkout> [reps]
"""

import os
import sys
import time

root = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sys.path.insert(0, root)
os.environ["PYTHONPATH"] = root

import __spark_entry__ as entry  # noqa: E402
from xyzpy_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="regress_ab")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs = entry.queries()

ROWS = [
    "similarity_ivf_pq",
    "stream_ann_topk",
    "curate_corpus_bloom",
    "stream_dedup_index",
    "lm_stream_score",
    "stream_follow_clicks",
]

qs["topk_orders"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()

for i in range(reps):
    for name in ROWS:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"{name} run{i}: {time.monotonic() - t0:.3f}s", flush=True)
spark.stop()
