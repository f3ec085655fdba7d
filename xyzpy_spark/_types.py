"""Python/numpy value -> Spark DataType inference.

The reference infers output dtypes dynamically from the first result
(``xyzpy/gen/combo_runner.py:25-74``).  Spark needs a declared schema
before execution, so the harness makes ONE driver-side sample call and
maps the result here.  Callers can always bypass inference by passing
explicit ``var_types``.

Complex numbers have no Spark type; they map to
``struct<re: double, im: double>`` (SURVEY §7 risk #1).
"""

from __future__ import annotations

import datetime as _dt
from functools import reduce

import numpy as np
from pyspark.sql import types as T

# struct encoding for python complex — no native Spark complex type.
COMPLEX_TYPE = T.StructType(
    [T.StructField("re", T.DoubleType()), T.StructField("im", T.DoubleType())]
)


def is_complex_type(dtype: T.DataType) -> bool:
    return isinstance(dtype, T.StructType) and [f.name for f in dtype.fields] == [
        "re",
        "im",
    ]


def spark_type_of_scalar(value) -> T.DataType:
    if isinstance(value, np.generic):
        value = value.item()
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, complex):
        return COMPLEX_TYPE
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, bytes):
        return T.BinaryType()
    if isinstance(value, _dt.datetime):
        return T.TimestampType()
    if isinstance(value, _dt.date):
        return T.DateType()
    if value is None:
        # unknown — default to double (NaN-able), matching the
        # reference's float-NaN missing sentinel.
        return T.DoubleType()
    raise TypeError(f"cannot map value {value!r} ({type(value)}) to a Spark type")


def infer_spark_type(value, depth_hint: int | None = None) -> T.DataType:
    """Infer a (possibly nested-array) Spark type from a sample value.

    ``depth_hint`` — number of internal dims declared for this variable;
    used to distinguish "array output" from "scalar output that happens
    to be a numpy 0-d".
    """
    if isinstance(value, np.ndarray):
        if value.ndim == 0:
            return spark_type_of_scalar(value.item())
        elem = infer_spark_type(value[0] if len(value) else 0.0)
        return T.ArrayType(elem)
    if isinstance(value, (list, tuple)):
        if len(value) == 0:
            return T.ArrayType(T.DoubleType())
        return T.ArrayType(infer_spark_type(value[0]))
    return spark_type_of_scalar(value)


def nested_array_type(elem: T.DataType, depth: int) -> T.DataType:
    return reduce(lambda t, _: T.ArrayType(t), range(depth), elem)


def to_storable(value, dtype: T.DataType):
    """Convert one UDF result value into Arrow/Spark-storable form."""
    if value is None:
        return None
    if is_complex_type(dtype):
        if isinstance(value, np.generic):
            value = value.item()
        c = complex(value)
        if np.isnan(c.real) and np.isnan(c.imag):
            return None
        return {"re": c.real, "im": c.imag}
    if isinstance(dtype, T.ArrayType):
        if isinstance(value, np.ndarray):
            value = value.tolist()
        return [to_storable(v, dtype.elementType) for v in value]
    if isinstance(value, np.generic):
        value = value.item()
    if isinstance(value, float) and np.isnan(value):
        # normalize NaN -> NULL: absent-point semantics are uniform
        # across float/bool/str in the Spark build (SURVEY §1.2).
        return None
    return value


def infer_values_type(values) -> T.DataType:
    """Common Spark type for a sequence of parameter values (grid coords)."""
    types = {type(spark_type_of_scalar(v)) for v in values}
    if types <= {T.LongType}:
        return T.LongType()
    if types <= {T.LongType, T.DoubleType}:
        return T.DoubleType()
    if len(types) == 1:
        return spark_type_of_scalar(values[0])
    raise TypeError(f"mixed parameter value types in {values!r}")
