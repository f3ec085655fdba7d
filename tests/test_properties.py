"""Property-based tests (hypothesis) for the pure-Python core.

The reference tests with fixed fixtures only (SURVEY §5); properties
here pin the invariants those fixtures sample: grid enumeration is a
bijection, batch assignment partitions the grid evenly, moment
accumulation is order-independent, and parsing normalization is
idempotent.  Kept Spark-free so they run in milliseconds.
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xyzpy_spark.functions.stats import (
    RunningStatistics,
    format_number_with_error,
)
from xyzpy_spark.grid import grid_size, _strides
from xyzpy_spark.prepare import parse_cases, parse_combos
from xyzpy_spark.utils import flatten, prod, unzip

combos_strategy = st.dictionaries(
    st.text("abcdefg", min_size=1, max_size=3),
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=6, unique=True),
    min_size=1,
    max_size=4,
)


@given(combos_strategy)
def test_grid_size_is_product(combos):
    assert grid_size(combos) == prod(len(v) for v in combos.values())


@given(combos_strategy)
def test_stride_enumeration_is_bijective(combos):
    """loc -> (value indices) decoding covers every point exactly once
    (the distributed grid builder's arithmetic, driver-checked)."""
    parsed = parse_combos(combos)
    strides = _strides(parsed)
    n = grid_size(combos)
    seen = set()
    for loc in range(n):
        point = tuple(
            (loc // stride) % len(vals)
            for (_, vals), stride in zip(parsed, strides)
        )
        seen.add(point)
    assert len(seen) == n


@given(st.integers(1, 500), st.integers(1, 60))
def test_batch_assignment_partitions_evenly(n, nb):
    """batch = loc*nb//n: contiguous, total n, sizes differ by <= 1
    (the crop batching rule)."""
    nb = min(nb, n)
    batches = [loc * nb // n for loc in range(n)]
    assert batches == sorted(batches)
    sizes = [batches.count(b) for b in range(nb)]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1


@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, width=32),
        min_size=2,
        max_size=200,
    ),
    st.integers(1, 7),
)
def test_running_statistics_chunking_invariant(xs, k):
    """Merging per-chunk moments == single-pass moments, any split."""
    whole = RunningStatistics()
    whole.update(xs)
    chunked = RunningStatistics()
    for chunk in np.array_split(np.array(xs, dtype=float), k):
        chunked.update(chunk)
    assert chunked.count == whole.count
    assert math.isclose(chunked.mean, whole.mean, rel_tol=1e-9, abs_tol=1e-6)
    if whole.count > 1 and not math.isnan(whole.var):
        assert math.isclose(
            chunked.var, whole.var, rel_tol=1e-6, abs_tol=1e-6
        )


@given(st.floats(-1e6, 1e6, allow_nan=False), st.floats(1e-9, 1e5))
@settings(max_examples=200)
def test_format_number_with_error_roundtrip(x, err):
    """Formatted value parses back within one error bar of x."""
    s = format_number_with_error(x, err)
    assert "(" in s and s.endswith(")")
    val = float(s[: s.index("(")])
    assert abs(val - x) <= err * 1.01 + 1e-12


@given(combos_strategy)
def test_parse_combos_idempotent(combos):
    once = parse_combos(combos)
    assert parse_combos(dict(once)) == once


@given(
    st.lists(
        st.tuples(st.integers(), st.text(max_size=3)),
        min_size=1,
        max_size=20,
    )
)
def test_unzip_roundtrip(pairs):
    a, b = unzip(pairs)
    assert list(zip(a, b)) == pairs


@given(st.lists(st.lists(st.integers(), max_size=5), max_size=5))
def test_flatten_one_level(nested):
    assert list(flatten(nested, 1)) == [x for sub in nested for x in sub]
