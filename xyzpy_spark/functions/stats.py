"""Statistics operators: running/Welford aggregates and convergence
sampling.

Reference (``xyzpy/utils.py``):

- ``RunningStatistics``      (``utils.py:411-508``): streaming
  mean/var/std/err-of-mean + ``converged(rtol, atol)``.
- ``RunningCovariance[Matrix]`` (``utils.py:511-645``).
- ``estimate_from_repeats``  (``utils.py:648-758``): repeat a stochastic
  fn until the standard error of the mean beats a tolerance.

On Spark the "streaming" part is free: ``avg``/``var_pop``/``covar_samp``
are already single-pass distributed (partial aggregation map-side,
numerically-stable merge combine — the same Chan/Welford update the
reference hand-rolls).  ``RunningStatistics`` here is the driver-side
mergeable accumulator used to combine *across jobs* (batches of a
convergence loop), not across rows.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def running_stats(df: DataFrame, var: str, by=()) -> DataFrame:
    """One-pass mean/var/std/stderr/rel_err/count for ``var``.

    Column set mirrors the reference accessor surface
    (``utils.py:449-508``): mean, var (sample), std, err (std-err of
    mean), rel_err, count, min, max.
    """
    by = [by] if isinstance(by, str) else list(by)
    cnt = F.count(var).cast("double")
    aggs = [
        F.avg(var).alias("mean"),
        F.var_samp(var).alias("var"),
        F.stddev_samp(var).alias("std"),
        (F.stddev_samp(var) / F.sqrt(cnt)).alias("err"),
        (
            F.stddev_samp(var) / F.sqrt(cnt) / F.abs(F.avg(var))
        ).alias("rel_err"),
        F.count(var).alias("count"),
        F.min(var).alias("min"),
        F.max(var).alias("max"),
    ]
    return df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)


def covariance_matrix(df: DataFrame, var_names, by=()) -> DataFrame:
    """Pairwise sample-covariance matrix in ONE aggregation pass.

    Reference: ``RunningCovarianceMatrix`` (``utils.py:543-645``).
    Output columns ``cov_<i>_<j>`` for i<=j plus per-var means —
    n*(n+1)/2 aggregate expressions, single shuffle.
    """
    var_names = (
        [var_names] if isinstance(var_names, str) else list(var_names)
    )
    by = [by] if isinstance(by, str) else list(by)
    names = [f"mean_{v}" for v in var_names]
    aggs = [F.avg(v).alias(f"mean_{v}") for v in var_names]
    for i, vi in enumerate(var_names):
        for j, vj in enumerate(var_names):
            if j < i:
                continue
            names.append(f"cov_{vi}_{vj}")
            aggs.append(F.covar_samp(vi, vj).alias(f"cov_{vi}_{vj}"))
    if len(set(names)) != len(names):
        # "a_b"+"c" and "a"+"b_c" both alias cov_a_b_c: row[name]
        # would silently return the wrong pair
        raise ValueError(
            "covariance_matrix: underscore-joined aliases collide for "
            f"var_names={var_names}; rename the variables"
        )
    return df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)


class UVar:
    """A value carrying first-order (delta-method) uncertainty that is
    COVARIANCE-aware: each ``UVar`` holds a gradient w.r.t. the base
    correlated variables, and any derived quantity's error is
    ``sqrt(g^T C g)``.

    Dependency-free analog of ``uncertainties.correlated_values`` as
    used by the reference's ``RunningCovarianceMatrix.to_uncertainties``
    (``utils.py:601-645``): perfectly correlated x, y=2x give
    ``(x + y).std_dev == sqrt(var(x+y))`` while ``(x / y).std_dev == 0``.
    Supports +, -, *, /, ** (scalar exponent) and negation, linearized
    at the central value.
    """

    __slots__ = ("nominal_value", "_grad", "_cov")

    def __init__(self, value: float, grad, cov):
        self.nominal_value = float(value)
        self._grad = np.asarray(grad, dtype=float)
        self._cov = cov  # shared, not copied

    @property
    def std_dev(self) -> float:
        g = self._grad
        return float(math.sqrt(max(g @ self._cov @ g, 0.0)))

    def _lift(self, other):
        if isinstance(other, UVar):
            return other
        return UVar(float(other), np.zeros_like(self._grad), self._cov)

    def __add__(self, other):
        o = self._lift(other)
        return UVar(
            self.nominal_value + o.nominal_value,
            self._grad + o._grad, self._cov,
        )

    __radd__ = __add__

    def __neg__(self):
        return UVar(-self.nominal_value, -self._grad, self._cov)

    def __sub__(self, other):
        return self + (-self._lift(other))

    def __rsub__(self, other):
        return self._lift(other) + (-self)

    def __mul__(self, other):
        o = self._lift(other)
        return UVar(
            self.nominal_value * o.nominal_value,
            self._grad * o.nominal_value + o._grad * self.nominal_value,
            self._cov,
        )

    __rmul__ = __mul__

    def __truediv__(self, other):
        o = self._lift(other)
        v = self.nominal_value / o.nominal_value
        return UVar(
            v,
            (self._grad - v * o._grad) / o.nominal_value,
            self._cov,
        )

    def __rtruediv__(self, other):
        return self._lift(other) / self

    def __pow__(self, p: float):
        v = self.nominal_value ** p
        return UVar(v, p * self.nominal_value ** (p - 1) * self._grad,
                    self._cov)

    def __repr__(self) -> str:
        return f"{self.nominal_value}+/-{self.std_dev}"


def correlated_values(means, cov) -> tuple[UVar, ...]:
    """Base correlated variables from a mean vector + covariance
    matrix (the ``uncertainties.correlated_values`` surface)."""
    cov = np.asarray(cov, dtype=float)
    means = np.asarray(means, dtype=float)
    n = means.size
    if cov.shape != (n, n):
        raise ValueError(f"cov shape {cov.shape} != ({n}, {n})")
    eye = np.eye(n)
    return tuple(UVar(means[i], eye[i], cov) for i in range(n))


def to_uncertainties(
    df: DataFrame, var_names, *, bias: bool = True
) -> tuple[UVar, ...]:
    """ONE Spark aggregation pass -> correlated uncertainty variables.

    Reference: ``RunningCovarianceMatrix.to_uncertainties``
    (``utils.py:601-645``).  ``bias=True`` uses the population
    covariance (the reference default), ``False`` the sample one.
    """
    var_names = list(var_names)
    cov_fn = F.covar_pop if bias else F.covar_samp
    # INDEX-based aliases: name-joined ones collide for names that
    # themselves contain underscores
    aggs = [F.avg(v).alias(f"m_{i}") for i, v in enumerate(var_names)]
    for i in range(len(var_names)):
        for j in range(i, len(var_names)):
            aggs.append(
                cov_fn(var_names[i], var_names[j]).alias(f"c_{i}_{j}")
            )
    row = df.agg(*aggs).first()
    n = len(var_names)
    cov = np.empty((n, n))
    for i in range(n):
        for j in range(n):
            v = row[f"c_{i}_{j}"] if j >= i else row[f"c_{j}_{i}"]
            if v is None:
                raise ValueError(
                    "to_uncertainties: covariance is undefined — the "
                    "frame needs at least "
                    + ("1 row" if bias else "2 rows (or pass bias=True)")
                )
            cov[i, j] = v
    return correlated_values(
        [row[f"m_{i}"] for i in range(n)], cov
    )


@dataclass
class RunningStatistics:
    """Mergeable moment accumulator (driver-side, across Spark jobs).

    Update formula is the parallel Chan et al. combine — the same
    algebra Spark uses internally to merge partial aggregates; the
    reference's per-sample Welford loop (``utils.py:429-447``) is the
    n=1 special case.
    """

    count: float = 0.0
    mean: float = 0.0
    _m2: float = 0.0

    def update(self, xs) -> None:
        xs = np.asarray(list(xs), dtype=float)
        if xs.size == 0:
            return
        self.merge(xs.size, float(xs.mean()), float(((xs - xs.mean()) ** 2).sum()))

    def merge(self, n: float, mean: float, m2: float) -> None:
        if n == 0:
            return
        delta = mean - self.mean
        tot = self.count + n
        self._m2 += m2 + delta**2 * self.count * n / tot
        self.mean += delta * n / tot
        self.count = tot

    @property
    def var(self) -> float:
        return self._m2 / (self.count - 1) if self.count > 1 else math.nan

    @property
    def std(self) -> float:
        return math.sqrt(self.var)

    @property
    def err(self) -> float:
        return self.std / math.sqrt(self.count) if self.count > 1 else math.nan

    @property
    def rel_err(self) -> float:
        return self.err / abs(self.mean) if self.mean else math.inf

    def converged(self, rtol: float = 0.01, atol: float | None = None) -> bool:
        """Reference semantics ``utils.py:496-505``: err-of-mean below
        rtol*|mean| (or atol absolutely)."""
        if self.count < 2:
            return False
        if atol is not None and self.err <= atol:
            return True
        return self.err <= rtol * abs(self.mean)


def estimate_from_repeats(
    spark: SparkSession,
    fn,
    *,
    rtol: float = 0.02,
    atol: float | None = None,
    batch_size: int = 64,
    min_samples: int = 16,
    max_samples: int = 16384,
    seed: int = 42,
) -> RunningStatistics:
    """Repeat a stochastic scalar fn distributed until the standard
    error of the mean converges.

    Reference: ``estimate_from_repeats`` (``utils.py:648-758``), which
    loops one call at a time on the driver.  Here each round is ONE
    Spark job evaluating a whole batch in parallel and returning only
    the per-partition (count, mean, M2) triples; the driver merges
    them into the running accumulator and stops when
    ``converged(rtol, atol)`` — a driver-loop-of-jobs, the Spark
    expression of convergence-driven sampling (SURVEY §4: no Catalyst
    analog, by design).
    """
    stats = RunningStatistics()
    offset = 0
    while stats.count < max_samples:
        n = batch_size
        grid = spark.range(offset, offset + n)
        offset += n

        def _partition_moments(iterator):
            import pandas as pd

            for pdf in iterator:
                vals = np.array(
                    [fn(seed=int(seed) * 1_000_003 + int(i)) for i in pdf["id"]],
                    dtype=float,
                )
                if vals.size:
                    m = vals.mean()
                    yield pd.DataFrame(
                        {
                            "n": [float(vals.size)],
                            "mean": [float(m)],
                            "m2": [float(((vals - m) ** 2).sum())],
                        }
                    )

        parts = grid.mapInPandas(
            _partition_moments, schema="n double, mean double, m2 double"
        ).collect()
        for row in parts:
            stats.merge(row["n"], row["mean"], row["m2"])
        if stats.count >= min_samples and stats.converged(rtol, atol):
            break
    return stats


def format_number_with_error(x: float, err: float) -> str:
    """``0.154(63)``-style significant-figure formatting.

    Reference: ``format_number_with_error`` (``utils.py:358-408``) —
    round the error to two significant digits, the value to the same
    decimal place, and append the error digits in parentheses.
    """
    if err is None or not math.isfinite(err) or err == 0:
        return f"{x}"
    # decimal exponent of the 2-significant-digit error
    exponent = math.floor(math.log10(abs(err)))
    places = -(exponent - 1)
    err_scaled = round(abs(err) * 10**places)
    if err_scaled >= 100:  # rounding pushed it to 3 digits (e.g. 0.0999)
        err_scaled = round(err_scaled / 10)
        places -= 1
    x_rounded = round(x, places)
    if places > 0:
        return f"{x_rounded:.{places}f}({err_scaled})"
    return f"{int(x_rounded)}({int(err_scaled * 10 ** (-places))})"
