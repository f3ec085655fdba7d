"""Plan-shape regression tests: the scale discipline, asserted.

A correct-but-badly-planned operator is a failure at 100 TB; these
tests pin the plan properties that matter (SURVEY §4): no shuffle in
grid builds, filter pushdown + column pruning reaching the parquet
scans, broadcast joins for small dimension tables.
"""

import pytest
from pyspark.sql import functions as F

from xyzpy_spark.grid import combo_grid
from xyzpy_spark.plans.inspect import (
    count_exchanges,
    executed_plan,
    has_exchange,
    pushed_filters,
    scan_columns,
    wholestage_codegen_ids,
)
from xyzpy_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_grid_build_is_shuffle_free(spark):
    df = combo_grid(spark, {"a": list(range(10)), "b": list(range(10))})
    assert not has_exchange(df)


def test_filter_pushdown_reaches_scan(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    q = li.where(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    pushed = pushed_filters(q)
    assert any("l_orderkey" in p for p in pushed), pushed


def test_column_pruning_reaches_scan(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    cols = scan_columns(q)
    assert set(cols) == {"l_returnflag", "l_quantity"}, cols


def test_single_shuffle_aggregation(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    assert count_exchanges(q) == 1


def test_small_dim_join_broadcasts(spark):
    nat = read_table(spark, SF_DIR, "nation")
    cust = read_table(spark, SF_DIR, "customer")
    q = cust.join(nat, cust.c_nationkey == nat.n_nationkey)
    assert "BroadcastHashJoin" in executed_plan(q)


def test_aggregation_stays_in_codegen(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.avg("l_quantity").alias("m"))
    assert len(wholestage_codegen_ids(q)) >= 1


def test_pipeline_ops_avoid_python(spark):
    """Text/dedup hot paths must contain no python UDF evaluators."""
    from xyzpy_spark.pipeline.dedup import minhash_signatures
    from xyzpy_spark.pipeline.text import add_quality

    docs = read_table(spark, SF_DIR, "documents")
    for q in [add_quality(docs), minhash_signatures(docs, num_perm=8)]:
        plan = executed_plan(q)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan
