#!/usr/bin/env python
"""Dump ``explain("formatted")`` snapshots for the r13 optimization
round's before/after evidence.

    python tools/opt_plans.py <suffix> <query> [query ...]

writes ``plans/r13/<query>_<suffix>.txt`` for each named query (the
optimization-round deliverable: the judge checks plan claims against
these files).  Queries whose gate wrapper materializes intermediate
state (index builds, temp dirs) run that state exactly as the gate
does — the dumped plan is the FINAL returned DataFrame's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from xyzpy_spark.session import get_spark

SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLAN_ROUND", "r14"),
)


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="opt_plans")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = formatted_plan(df)
        plan = "".join(
            c if c == "\n" or c.isprintable() else f"\\x{ord(c):02x}"
            for c in plan
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain(formatted) at {SF_DIR}\n")
            fh.write(plan.rstrip() + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
