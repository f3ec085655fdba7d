"""In-session A/B of spark.sql.join.preferSortMergeJoin=false (+ the
AQE sort-merge->shuffled-hash rewrite threshold) across join-heavy
bench rows (guide §3.1/§9).  The conf is a planning-time SQL conf, so
one warm session alternates it per rep — perfectly interleaved.

Usage: python tools/shj_ab.py [sf_dir] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYTHONPATH", "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from xyzpy_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="shj_ab")
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
qs = entry.queries()

ROWS = [
    "product_profit",
    "star_join_revenue",
    "market_share",
    "important_stock",
    "min_cost_supplier",
    "excess_stock_suppliers",
    "order_priority_check",
    "large_volume_customers",
    "nation_trade_volume",
    "dedup_clusters",
    "dedup_corpus",
    "winnow_dedup_pairs",
    "dedup_ngram_jaccard",
    "dsir_select",
]

MODES = {
    "smj": {
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
    },
    "shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    },
}

qs["topk_orders"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()

times: dict = {}
for i in range(reps):
    for mode, conf in MODES.items():
        for k, v in conf.items():
            spark.conf.set(k, v)
        for name in ROWS:
            spark.catalog.clearCache()
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.setdefault(name, {}).setdefault(mode, []).append(
                time.monotonic() - t0
            )
            print(f"{name} {mode} run{i}: {times[name][mode][-1]:.3f}s",
                  flush=True)

import statistics  # noqa: E402

print(f"\n{'row':24s} {'smj med':>8s} {'shj med':>8s} {'delta':>7s}")
for name in ROWS:
    a = statistics.median(times[name]["smj"])
    b = statistics.median(times[name]["shj"])
    print(f"{name:24s} {a:8.3f} {b:8.3f} {100*(b-a)/a:+6.1f}%")
spark.stop()
