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


def test_save_load_avro_if_available(spark, tmp_path):
    """Avro rides on the external spark-avro package; round-trip when
    present, otherwise assert the failure names the format."""
    df = spark.createDataFrame([Row(a=1, s="hi")])
    p = str(tmp_path / "t.avro")
    try:
        save_df(df, p, "avro")
    except Exception as exc:  # noqa: BLE001 - AnalysisException w/o jar
        assert "avro" in str(exc).lower()
        return
    back = load_df(spark, p, "avro")
    assert back.collect()[0]["a"] == 1


def test_import_xyzpy_store_pandas_formats(spark, tmp_path):
    """Migration path for the reference's frame stores
    (manage.py:405-453): pickle / csv / json load into a Spark DF."""
    import pandas as pd

    from xyzpy_spark.sources import import_xyzpy_store

    pdf = pd.DataFrame({"a": [1, 2], "b": [10, 20], "y": [11.0, 22.0]})
    for fmt, ext, writer in [
        ("pickle", "pkl", pdf.to_pickle),
        ("csv", "csv", lambda p: pdf.to_csv(p, index=False)),
        ("json", "json", lambda p: pdf.to_json(p)),
    ]:
        p = str(tmp_path / f"store.{ext}")
        writer(p)
        df = import_xyzpy_store(spark, p)
        got = sorted((r["a"], r["b"], r["y"]) for r in df.collect())
        assert got == [(1, 10, 11.0), (2, 20, 22.0)], fmt


def test_import_xyzpy_store_netcdf_roundtrip(spark, tmp_path):
    """Dense Dataset -> long rows (runs where xarray is installed)."""
    xr = pytest.importorskip("xarray")

    from xyzpy_spark.sources import import_xyzpy_store

    ds = xr.Dataset(
        {"y": (["a", "b"], [[1.0, 2.0], [3.0, 4.0]])},
        coords={"a": [1, 2], "b": [10, 20]},
    )
    p = str(tmp_path / "store.nc")
    ds.to_netcdf(p)
    df = import_xyzpy_store(spark, p)
    got = sorted((r["a"], r["b"], r["y"]) for r in df.collect())
    assert got == [(1, 10, 1.0), (1, 20, 2.0), (2, 10, 3.0), (2, 20, 4.0)]


def test_import_xyzpy_store_gates_missing_xarray(spark, tmp_path):
    from xyzpy_spark.sources import import_xyzpy_store

    try:
        import xarray  # noqa: F401

        pytest.skip("xarray installed — gating not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="xarray"):
        import_xyzpy_store(spark, str(tmp_path / "s.nc"))


def test_export_import_store_roundtrip_pandas_formats(spark, tmp_path):
    """Long table -> reference store format -> back, values intact."""
    from xyzpy_spark.sources import export_xyzpy_store, import_xyzpy_store

    df = spark.createDataFrame(
        [Row(a=1, b=10, y=11.0), Row(a=2, b=20, y=22.0)]
    )
    for ext in ("pkl", "csv", "json"):
        p = str(tmp_path / f"out.{ext}")
        export_xyzpy_store(df, p, ["a", "b"])
        back = import_xyzpy_store(spark, p)
        got = sorted((r["a"], r["b"], r["y"]) for r in back.collect())
        assert got == [(1, 10, 11.0), (2, 20, 22.0)], ext


def test_export_store_netcdf_roundtrip(spark, tmp_path):
    pytest.importorskip("xarray")

    from xyzpy_spark.sources import export_xyzpy_store, import_xyzpy_store

    df = spark.createDataFrame(
        [Row(a=1, b=10, y=11.0), Row(a=1, b=20, y=12.0),
         Row(a=2, b=10, y=21.0), Row(a=2, b=20, y=22.0)]
    )
    p = str(tmp_path / "out.nc")
    export_xyzpy_store(df, p, ["a", "b"])
    back = import_xyzpy_store(spark, p)
    got = sorted((r["a"], r["b"], r["y"]) for r in back.collect())
    assert got == [(1, 10, 11.0), (1, 20, 12.0), (2, 10, 21.0), (2, 20, 22.0)]


def test_infer_store_format():
    from xyzpy_spark.sources import infer_store_format

    assert infer_store_format("x.nc") == "netcdf"
    assert infer_store_format("x.zarr") == "zarr"
    assert infer_store_format("x.pkl") == "pickle"
    assert infer_store_format("x.h5") == "hdf"
    with pytest.raises(ValueError):
        infer_store_format("x.unknown")
