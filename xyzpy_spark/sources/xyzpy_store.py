"""One-way migration path for existing xyzpy on-disk stores.

The reference persists results as dense ``xr.Dataset`` files —
netcdf / zarr / joblib (``xyzpy/manage.py:32-37, 61-169``) — and as
pandas frames in pickle / csv / hdf / json (``manage.py:405-453``).
``import_xyzpy_store`` reads any of those and returns the engine's
canonical LONG-format Spark DataFrame (dims become columns, one row
per grid point), so a migrating user runs one call and keeps working.

Heavy scientific-format readers (xarray / netCDF4 / zarr / pytables)
are import-gated: they are driver-only dependencies, needed just for
the ingest step, and the clear ImportError tells the user what to
install.  The pandas-native formats (pickle/csv/json) work with no
extra dependencies.

Scope: this adapter is DRIVER-LOCAL-filesystem only, by design — the
xarray/pandas readers it wraps open plain local paths, exactly where
a reference user's store lives.  It is the one persistence surface
deliberately outside the scheme-aware fsutil sweep (r13): migrate
from a local copy, then the engine's own stores (parquet via
fsutil/Spark writers) carry the data on hdfs://s3a:// from there.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _require_xarray(what: str):
    try:
        import xarray as xr

        return xr
    except ImportError as exc:
        raise ImportError(
            f"importing a {what} store needs xarray on the driver "
            "(pip install xarray; plus netCDF4 for .nc / zarr for .zarr)"
        ) from exc


def _dataset_to_long(ds) -> pd.DataFrame:
    """Dense Dataset -> long frame: dims become columns, one row per
    grid point (NaN holes preserved — ``trimna`` drops them on
    request, matching the reference's sparse-grid semantics)."""
    pdf = ds.to_dataframe().reset_index()
    return pdf


def infer_store_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".nc", ".cdf", ".nc4", ".h5nc"):
        return "netcdf"
    if ext == ".zarr" or (
        os.path.isdir(path) and os.path.exists(os.path.join(path, ".zgroup"))
    ):
        return "zarr"
    if ext in (".pkl", ".pickle"):
        return "pickle"
    if ext == ".csv":
        return "csv"
    if ext == ".json":
        return "json"
    if ext in (".h5", ".hdf", ".hdf5"):
        return "hdf"
    if ext in (".jbdmp", ".joblib"):
        return "joblib"
    raise ValueError(f"cannot infer xyzpy store format from {path!r}")


def import_xyzpy_store(
    spark: SparkSession, path: str, *, fmt: str | None = None
) -> DataFrame:
    """Read a reference xyzpy store and return a long-format Spark DF.

    ``fmt``: ``netcdf | zarr | joblib | pickle | csv | json | hdf``
    (inferred from the extension when omitted).  Dataset formats are
    un-pivoted from the dense grid to long rows; frame formats load
    as-is.  Everything runs on the driver (stores are driver-sized by
    construction in the reference); the returned DataFrame is the
    distributed copy to write to parquet and scale from.
    """
    fmt = fmt or infer_store_format(path)
    if fmt in ("netcdf", "zarr"):
        xr = _require_xarray(fmt)
        ds = (
            xr.open_dataset(path)
            if fmt == "netcdf"
            else xr.open_zarr(path)
        )
        pdf = _dataset_to_long(ds)
    elif fmt == "joblib":
        try:
            import joblib
        except ImportError as exc:
            raise ImportError(
                "importing a joblib store needs joblib on the driver"
            ) from exc
        obj = joblib.load(path)
        pdf = (
            _dataset_to_long(obj)
            if hasattr(obj, "to_dataframe")
            else pd.DataFrame(obj)
        )
    elif fmt == "pickle":
        obj = pd.read_pickle(path)
        pdf = (
            _dataset_to_long(obj)
            if hasattr(obj, "to_dataframe")
            else pd.DataFrame(obj)
        )
    elif fmt == "csv":
        pdf = pd.read_csv(path)
    elif fmt == "json":
        pdf = pd.read_json(path)
    elif fmt == "hdf":
        pdf = pd.read_hdf(path)  # needs pytables; pandas raises clearly
    else:
        raise ValueError(f"unknown store format {fmt!r}")
    return spark.createDataFrame(pdf)


def export_xyzpy_store(
    df: DataFrame,
    path: str,
    dims: list[str],
    *,
    fmt: str | None = None,
    var_names: list[str] | None = None,
    var_dims: dict | None = None,
) -> None:
    """Write a long-format result back out as a reference-compatible
    store, so results computed here remain readable by unmigrated
    xyzpy/xarray tooling.

    Dataset formats (``netcdf``/``zarr``) densify via
    :func:`xyzpy_spark.runner.to_xarray` (xarray required, driver-only,
    driver-sized slices); frame formats (``pickle``/``csv``/``json``)
    write the long table as pandas.  The engine's canonical at-scale
    sink stays parquet (``save_df``) — this is the interchange path.
    """
    fmt = fmt or infer_store_format(path)
    if fmt in ("netcdf", "zarr"):
        from ..runner import to_xarray

        ds = to_xarray(df, dims, var_names=var_names, var_dims=var_dims)
        if fmt == "netcdf":
            ds.to_netcdf(path)
        else:
            ds.to_zarr(path, mode="w")
        return
    pdf = df.toPandas()
    if fmt == "pickle":
        pdf.to_pickle(path)
    elif fmt == "csv":
        pdf.to_csv(path, index=False)
    elif fmt == "json":
        pdf.to_json(path)
    elif fmt == "hdf":
        pdf.to_hdf(path, key="xyzpy")
    else:
        raise ValueError(f"unknown store format {fmt!r}")
