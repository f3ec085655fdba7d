import os
import sys

import pytest

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_TESTS_DIR)
sys.path.insert(0, _REPO_DIR)

# spark python workers are subprocesses inheriting this env — they need
# the repo + tests dirs importable to unpickle UDF closures by reference.
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_REPO_DIR, _TESTS_DIR, os.environ.get("PYTHONPATH", "")]
)

from xyzpy_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="xyzpy_spark_tests", master="local[4]", shuffle_partitions=4
    )
    yield s


# ---------------------------------------------------------------------------
# Sweep kernels mirroring the reference's test fixtures (FIXTURES.md §1;
# reference: tests/test_gen/__init__.py:1-76).  Each kernel asserts its
# inputs lie in a distinct decade so wrong argument routing fails loudly.
# ---------------------------------------------------------------------------
import numpy as np  # noqa: E402


def _decade(x, lo, hi):
    assert lo <= abs(x) < hi, f"got {x!r}, expected |x| in [{lo}, {hi})"


def foo3_scalar(a, b, c):
    _decade(a, 0, 10)
    _decade(b, 10, 100)
    _decade(c, 100, 1000)
    return a + b + c


def foo3_float_bool(a, b, c):
    _decade(a, 0, 10)
    _decade(b, 10, 100)
    _decade(c, 100, 1000)
    return a + b + c, a % 2 == 0


def foo2_scalar(a, b):
    _decade(a, 0, 10)
    _decade(b, 10, 100)
    return a + b


def foo2_array(a, b):
    _decade(a, 0, 10)
    _decade(b, 10, 100)
    return [b + a + 0.1 * i for i in range(10)]


def foo2_array_bool(a, b):
    _decade(a, 0, 10)
    _decade(b, 10, 100)
    return [b + a + 0.1 * i for i in range(10)], a % 2 == 0


def foo2_array_array(a, b):
    _decade(a, 0, 10)
    _decade(b, 10, 100)
    return [b + i * a for i in range(5)], [b - i * a for i in range(5)]


def foo2_zarray1_zarray2(a, b):
    _decade(a, 0, 10)
    _decade(b, 10, 100)
    x = [b + a + 0.1j * i for i in range(5)]
    y = [b + a - 0.1j * i for i in range(5)]
    return x, y


def foo2_dataset(a, b):
    _decade(a, 0, 10)
    _decade(b, 10, 100)
    return {"sum": a + b, "diff": a - b}


def fn3_fba(a, b, c):
    """The golden-dataset kernel (reference tests/test_gen/test_farming.py:44)."""
    return (
        a + b + c,
        a % 2 == 0,
        a * (b * np.linspace(0, 1, 3) + c),
    )


TEST_COMBOS1 = {"a": [1, 2], "b": [10, 20, 30], "c": [100, 200, 300, 400]}
