"""local_df: small driver-side tables as Arrow LocalRelations.

``spark.createDataFrame(list, schema)`` plants a ``Scan ExistingRDD``
(pickled Python RDD) in the plan — every downstream action pays a
Python-worker round trip for a constant table.  ``local_df`` routes
explicit-schema rows through pandas/Arrow into a ``LocalTableScan``
with identical values; anything Arrow would change (NaN payloads,
name-list inference schemas) falls back to the classic path.
"""

import math

from pyspark.sql import types as T

from xyzpy_spark.plans.inspect import executed_plan
from xyzpy_spark.utils import local_df


def test_local_df_is_local_relation_not_python_rdd(spark):
    rows = [(1, "a"), (2, None)]
    df = local_df(spark, rows, "k int, v string")
    plan = executed_plan(df)
    assert "LocalTableScan" in plan, plan
    assert "ExistingRDD" not in plan, plan
    assert [tuple(r) for r in df.collect()] == rows


def test_local_df_matches_classic_values(spark):
    rows = [(1, "a", 1.5), (2, None, -0.0), (3, "c", None)]
    schema = "k int, v string, x double"
    a = local_df(spark, rows, schema).collect()
    b = spark.createDataFrame(rows, schema).collect()
    assert a == b
    assert [r.v for r in a] == ["a", None, "c"]
    assert a[2].x is None  # None stays NULL, not NaN


def test_local_df_nan_payload_takes_classic_path(spark):
    # Arrow's from_pandas would turn a float NaN into NULL; the
    # guard must keep it a NaN (classic path).
    df = local_df(spark, [(1, float("nan"))], "k int, x double")
    [r] = df.collect()
    assert r.x is not None and math.isnan(r.x)


def test_local_df_empty_and_structtype_schema(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )
    df = local_df(spark, [], schema)
    assert df.columns == ["a", "b"]
    assert df.count() == 0
    assert df.schema == schema


def test_local_df_name_list_schema_falls_back(spark):
    # name-list schemas rely on classic row-level inference; the
    # helper must not change their typing.
    a = local_df(spark, [(1, "x")], ["k", "v"]).collect()
    b = spark.createDataFrame([(1, "x")], ["k", "v"]).collect()
    assert a == b
