#!/usr/bin/env python
"""Plan-shape audit over gate queries: counts the anti-pattern node
classes from the optimization guide (duplicated parquet scans of the
same path, pickled-RDD scans, Python eval stages, cartesian products,
exchanges, sort-merge joins, generates) in each query's
explain("formatted") text, one line per query.

    python tools/plan_audit.py <query> [query ...]

InMemoryRelation build subtrees are excluded (they run once at
construction); the count reflects the plan that executes at action
time.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from xyzpy_spark.session import get_spark

SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def strip_cached(plan: str) -> str:
    """Drop InMemoryRelation build subtrees and AQE 'Initial Plan'
    echoes from the tree section so counts reflect executed work."""
    out = []
    depth_skip = None
    for line in plan.splitlines():
        if "== Initial Plan ==" in line:
            depth_skip = -1  # skip until next section at low indent
            continue
        stripped = line.rstrip()
        indent = len(line) - len(line.lstrip(" :+-*"))
        if depth_skip == -1:
            if stripped.startswith("(") or "== " in line:
                depth_skip = None
            else:
                continue
        m = re.search(r"InMemoryRelation", line)
        if m and depth_skip is None:
            depth_skip = indent
            continue
        if depth_skip is not None and depth_skip >= 0:
            if indent > depth_skip:
                continue
            depth_skip = None
        out.append(line)
        if stripped.startswith("(1) ") or re.match(r"^\(\d+\) ", stripped):
            break
    return "\n".join(out)


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="plan_audit")
    queries = entrymod.queries()
    print(
        f"{'query':34s} scans dup rdd py gen exch smj cart win"
    )
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            plan = strip_cached(formatted_plan(df))
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} ERROR {type(e).__name__}: {e}")
            continue
        scans = re.findall(r"Scan parquet\s*(\S*)", plan)
        paths = re.findall(
            r"Location: \S+ \[([^\]]*)\]", formatted_plan(df)
        )
        dup = len(paths) - len(set(paths)) if paths else 0
        counts = dict(
            scans=len(re.findall(r"\+- \*?\s*Scan parquet", plan)),
            rdd=len(re.findall(r"Scan ExistingRDD", plan)),
            py=len(
                re.findall(r"ArrowEvalPython|BatchEvalPython|MapInPandas", plan)
            ),
            gen=len(re.findall(r"\bGenerate\b", plan)),
            exch=len(re.findall(r"\bExchange\b", plan))
            - len(re.findall(r"BroadcastExchange", plan)),
            smj=len(re.findall(r"SortMergeJoin", plan)),
            cart=len(re.findall(r"CartesianProduct|BroadcastNestedLoop", plan)),
            win=len(re.findall(r"\bWindow\b", plan)),
        )
        print(
            f"{name:34s} {counts['scans']:5d} {dup:3d} {counts['rdd']:3d}"
            f" {counts['py']:2d} {counts['gen']:3d} {counts['exch']:4d}"
            f" {counts['smj']:3d} {counts['cart']:4d} {counts['win']:3d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
