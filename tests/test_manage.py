import numpy as np
import pytest
from pyspark.sql import Row

from xyzpy_spark.manage import (
    auto_xyz_df,
    cache_to_disk,
    merge_sync_conflict_tables,
    save_merge_df,
    sort_dims,
)


def test_save_merge_df_accumulates(spark, tmp_path):
    p = str(tmp_path / "store.parquet")
    df1 = spark.createDataFrame([Row(a=1, x=10.0)])
    df2 = spark.createDataFrame([Row(a=2, x=20.0)])
    save_merge_df(df1, p, ["a"])
    save_merge_df(df2, p, ["a"])
    out = {r["a"]: r["x"] for r in spark.read.parquet(p).collect()}
    assert out == {1: 10.0, 2: 20.0}


def test_save_merge_df_conflict_raises(spark, tmp_path):
    p = str(tmp_path / "store.parquet")
    save_merge_df(spark.createDataFrame([Row(a=1, x=10.0)]), p, ["a"])
    with pytest.raises(Exception, match="MERGE CONFLICT"):
        save_merge_df(spark.createDataFrame([Row(a=1, x=99.0)]), p, ["a"])
    # overwrite policy resolves it
    save_merge_df(
        spark.createDataFrame([Row(a=1, x=99.0)]), p, ["a"], overwrite=True
    )
    assert spark.read.parquet(p).collect()[0]["x"] == 99.0


def test_merge_sync_conflict_tables(spark, tmp_path):
    base = tmp_path / "data.parquet"
    conflict = tmp_path / "data (sync conflict).parquet"
    spark.createDataFrame([Row(a=1, x=1.0)]).write.parquet(str(base))
    spark.createDataFrame([Row(a=2, x=2.0)]).write.parquet(str(conflict))
    canon = merge_sync_conflict_tables(
        spark, str(tmp_path / "data*.parquet"), ["a"]
    )
    assert canon == str(base)
    assert not conflict.exists()
    assert spark.read.parquet(canon).count() == 2


def test_cache_to_disk(spark, tmp_path):
    calls = []

    @cache_to_disk(str(tmp_path / "cache"))
    def expensive(spark_, n):
        calls.append(n)
        return spark_.range(n)

    assert expensive(spark, 5).count() == 5
    assert expensive(spark, 5).count() == 5  # cached
    assert expensive(spark, 7).count() == 7  # different key
    assert calls == [5, 7]


def test_sort_dims(spark):
    df = spark.createDataFrame([Row(x=1.0, b=2, a=3)])
    assert sort_dims(df, ["a", "b"]).columns == ["a", "b", "x"]


def test_auto_xyz_df_1d(spark):
    out = auto_xyz_df(spark, [1, 2, 3], [10, 20, 30])
    assert out.columns == ["x", "y"]
    assert out.count() == 3


def test_auto_xyz_df_2d_transpose(spark):
    y = np.arange(6).reshape(3, 2)  # (x=3, z=2) -> needs transpose
    out = auto_xyz_df(spark, [1, 2, 3], y, z=[0, 1])
    assert out.count() == 6
    rows = {(r["z"], r["x"]): r["y"] for r in out.collect()}
    assert rows[(0.0, 1.0)] == 0.0
    assert rows[(1.0, 1.0)] == 1.0


def test_benchmarker(spark):
    from xyzpy_spark.functions.benchmark import Benchmarker

    def lin(n):
        return sum(range(n))

    def quad(n):
        return sum(i * j for i in range(n) for j in range(n))

    b = Benchmarker([lin, quad], spark=spark, min_t=0.001)
    df = b.run([100, 400, 1600], repeats=1)
    assert df.count() == 6
    exps = {r["kernel"]: r["exponent"] for r in b.scaling().collect()}
    assert exps["quad"] > exps["lin"]
    assert exps["quad"] > 1.5  # ~2


def test_compact_table_reduces_files_and_keeps_rows(spark, tmp_path):
    import os

    from xyzpy_spark.manage import compact_table

    path = str(tmp_path / "store")
    # simulate many small appends
    spark.range(0, 5000).withColumnRenamed("id", "k").repartition(
        40
    ).write.parquet(path)
    n_before = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    assert n_before >= 40
    n = compact_table(spark, path, target_file_mb=128, sort_by="k")
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == n == 1
    back = spark.read.parquet(path)
    assert back.count() == 5000
    assert back.agg({"k": "min"}).first()[0] == 0


def test_compact_table_preserves_attrs(spark, tmp_path):
    from xyzpy_spark.farming import _publish_parquet, load_attrs
    from xyzpy_spark.manage import compact_table

    path = str(tmp_path / "store")
    _publish_parquet(
        spark.range(100).repartition(10), path, {"note": "hello"}
    )
    compact_table(spark, path, target_file_mb=64)
    assert load_attrs(path).get("note") == "hello"
