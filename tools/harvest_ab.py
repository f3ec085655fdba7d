"""Interleaved A/B for the r14 harvest FS-metadata batching: time the
two harvest gate rows (noop sink, warm JVM) under whichever checkout
PYTHONPATH points at.  Run alternately against the pre-change worktree
and the working tree; compare warm medians (first in-process run is
cold and reported separately).

Usage: PYTHONPATH=<checkout> python tools/harvest_ab.py <checkout> [reps]
"""

import os
import sys
import time

root = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
sys.path.insert(0, root)
os.environ["PYTHONPATH"] = root

import __spark_entry__ as entry  # noqa: E402
from xyzpy_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="harvest_ab")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs = entry.queries()

# warm the session with an unrelated row
qs["topk_orders"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()

for i in range(reps):
    for name in ("harvest_partitioned", "harvest_partitioned_2d"):
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"{name} run{i}: {time.monotonic() - t0:.3f}s", flush=True)
spark.stop()
