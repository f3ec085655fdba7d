import pytest
from pyspark.sql import Row

from xyzpy_spark.sources.tables import (
    load_df,
    read_table,
    register_tables,
    save_df,
)

SF_DIR = "/root/testdata/sf0.001"


def test_read_table_normalizes_ns_timestamps(spark):
    ev = read_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    assert ev.count() == 1000


def test_register_tables(spark):
    tables = register_tables(spark, SF_DIR)
    assert "lineitem" in tables and "events" in tables
    assert spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"] == 6000


@pytest.mark.parametrize("fmt,options", [
    ("parquet", {}),
    ("json", {}),
    ("csv", {"header": "true", "inferSchema": "true"}),
    ("orc", {}),
])
def test_save_load_roundtrip(spark, tmp_path, fmt, options):
    df = spark.createDataFrame(
        [Row(a=1, x=1.5, s="hi"), Row(a=2, x=2.5, s="yo")]
    )
    p = str(tmp_path / f"t.{fmt}")
    save_df(df, p, fmt, **options)
    back = load_df(spark, p, fmt, **options)
    got = sorted((r["a"], r["x"], r["s"]) for r in back.collect())
    assert got == [(1, 1.5, "hi"), (2, 2.5, "yo")]
