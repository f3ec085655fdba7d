"""Physical-plan introspection helpers.

The scale discipline of this engine (SURVEY §4, BASELINE north star)
is enforced in *tests*: grid builds must not shuffle, scans must show
pushed filters and pruned schemas, hot paths must stay inside
whole-stage codegen.  These helpers turn ``df.explain()`` text into
assertable facts so regressions in plan shape fail CI, not just the
benchmark.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle exchange."""
    return "Exchange" in executed_plan(df)


def count_exchanges(df: DataFrame) -> int:
    # AQE may label them AQEShuffleRead/ShuffleQueryStage; count the
    # Exchange operators themselves.
    return len(re.findall(r"\bExchange\b", executed_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the data source scans (PushedFilters: [...])."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema struct fields) —
    the column-pruning check."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def wholestage_codegen_ids(df: DataFrame) -> set[int]:
    """Distinct WholeStageCodegen span ids in the plan (wider spans =
    more of the plan fused into generated code).  The plan string
    marks codegen stages with a ``*(n)`` operator prefix."""
    plan = executed_plan(df)
    if "isFinalPlan=false" in plan:
        # AQE annotates codegen stages only in the final (post-run)
        # plan; materialize once so the markers appear.
        df.collect()
        plan = executed_plan(df)
    ids = {int(m.group(1)) for m in re.finditer(r"\*\((\d+)\)", plan)}
    ids |= {
        int(m.group(1))
        for m in re.finditer(r"WholeStageCodegen \((\d+)\)", plan)
    }
    return ids
