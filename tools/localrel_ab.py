#!/usr/bin/env python
"""Measure the fixed cost of spark.createDataFrame(list) (Python-RDD
backed, `Scan ExistingRDD` + applySchemaToPythonRDD) vs an Arrow
LocalRelation (createDataFrame(pandas) with arrow enabled) vs a pure
VALUES LocalRelation — and its effect on the funnel_steps gate row.

    python tools/localrel_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from xyzpy_spark.session import get_spark
import __spark_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="localrel_ab")
    ev = entrymod._t(spark, SF_DIR, "events")
    _noop(ev)  # warm reader

    data = [(i + 1, s) for i, s in enumerate(["view", "click", "purchase"])]
    schema = "step int, event_type string"

    # micro: materialize each small-DF construction 5x
    for label, build in [
        ("rdd-list", lambda: spark.createDataFrame(data, schema)),
        (
            "arrow-pandas",
            lambda: spark.createDataFrame(
                pd.DataFrame(data, columns=["step", "event_type"]),
                schema,
            ),
        ),
    ]:
        ts = []
        for _ in range(5):
            t0 = time.time()
            df = build()
            df.collect()
            ts.append(time.time() - t0)
        print(f"micro {label}: {['%.3f' % t for t in ts]}", flush=True)
        print(f"  plan: {build()._jdf.queryExecution().executedPlan().nodeName()}", flush=True)

    from xyzpy_spark.operators.temporal import funnel_counts

    def variant_b(events, steps):
        """funnel_counts with the names table as an Arrow LocalRelation."""
        firsts = events.groupBy("user_id").agg(
            *[
                F.min(
                    F.when(F.col("event_type") == s, F.col("ts"))
                ).alias(f"__t{i}")
                for i, s in enumerate(steps)
            ]
        )
        reached = F.col("__t0").isNotNull()
        flags = [reached]
        for i in range(1, len(steps)):
            reached = (
                reached
                & F.col(f"__t{i}").isNotNull()
                & (F.col(f"__t{i}") >= F.col(f"__t{i - 1}"))
            )
            flags.append(reached)
        counted = firsts.agg(
            *[
                F.coalesce(
                    F.sum(flags[i].cast("long")), F.lit(0).cast("long")
                ).alias(f"__n{i}")
                for i in range(len(steps))
            ]
        )
        names = spark.createDataFrame(
            pd.DataFrame(
                [(i + 1, s) for i, s in enumerate(steps)],
                columns=["step", "event_type"],
            ),
            "step int, event_type string",
        )
        return names.crossJoin(F.broadcast(counted)).select(
            "step",
            "event_type",
            F.coalesce(
                *[
                    F.when(F.col("step") == i + 1, F.col(f"__n{i}"))
                    for i in range(len(steps))
                ]
            ).alias("n_users"),
        )

    steps = ["view", "click", "purchase"]
    rows_a = rows_b = None
    for r in range(ROUNDS):
        t0 = time.time()
        a = funnel_counts(ev, steps)
        _noop(a)
        ta = time.time() - t0
        t0 = time.time()
        b = variant_b(ev, steps)
        _noop(b)
        tb = time.time() - t0
        rows_a = sorted(tuple(x) for x in a.collect())
        rows_b = sorted(tuple(x) for x in b.collect())
        print(
            f"round {r}: A(shipped) {ta:.2f}s  B(localrel) {tb:.2f}s  "
            f"identical={rows_a == rows_b}",
            flush=True,
        )


if __name__ == "__main__":
    main()
