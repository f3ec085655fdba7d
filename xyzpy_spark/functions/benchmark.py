"""Kernel benchmarking: timing sweeps over (kernel, size) grids.

Spark analogs of the reference's user-facing benchmarking tools
(``xyzpy/utils.py``): ``benchmark`` (``utils.py:198-259``) — min/mean
wall time of a callable with automatic repetition — and ``Benchmarker``
(``utils.py:262-355``) — compare kernels across problem sizes via an
internal sweep (combos = {kernel, n}), producing the long table that
log-log scaling analysis reads off.
"""

from __future__ import annotations

import math
import timeit

from pyspark.sql import DataFrame, SparkSession, functions as F


def benchmark(
    fn,
    *args,
    min_t: float = 0.05,
    repeats: int = 3,
    get: str = "min",
    **kwargs,
):
    """Time one callable: auto-scale the inner loop count until a
    repeat takes ``min_t`` seconds, then report over ``repeats``.

    Reference semantics: ``benchmark`` (``utils.py:198-259``).
    """
    number = 1
    while True:
        t = timeit.timeit(lambda: fn(*args, **kwargs), number=number)
        if t >= min_t or number > 2**24:
            break
        number *= 2
    times = [
        timeit.timeit(lambda: fn(*args, **kwargs), number=number) / number
        for _ in range(repeats)
    ]
    if get == "min":
        return min(times)
    if get == "mean":
        return sum(times) / len(times)
    return times


class Benchmarker:
    """Compare kernels over sizes: one distributed sweep, one long table.

    Reference: ``Benchmarker`` (``utils.py:262-355``) — kernels x ns
    grid through a Harvester.  Here the (kernel, n) grid is a normal
    combo sweep whose UDF times the kernel on the worker; results
    accumulate in ``self.df`` (merged across ``run`` calls).
    """

    def __init__(
        self,
        kernels,
        *,
        setup=None,
        names=None,
        spark: SparkSession | None = None,
        min_t: float = 0.02,
    ):
        self.kernels = list(kernels)
        if names:
            self.names = list(names)
        else:
            # two unnamed lambdas both report __name__ '<lambda>';
            # disambiguate with the index so the kernel combo stays a
            # valid (duplicate-free) grid coordinate
            raw = [
                getattr(k, "__name__", f"kernel{i}")
                for i, k in enumerate(self.kernels)
            ]
            self.names = [
                n if raw.count(n) == 1 else f"{n}_{i}"
                for i, n in enumerate(raw)
            ]
        self.setup = setup
        self.min_t = min_t
        self._spark = spark
        self.df: DataFrame | None = None

    @property
    def spark(self) -> SparkSession:
        if self._spark is None:
            self._spark = SparkSession.builder.getOrCreate()
        return self._spark

    def run(self, ns, *, repeats: int = 3) -> DataFrame:
        """Benchmark every kernel at every size n (distributed: each
        (kernel, n) cell is one task)."""
        from ..runner import combo_runner_to_df

        kernel_by_name = dict(zip(self.names, self.kernels))
        setup = self.setup
        min_t = self.min_t

        def time_kernel(kernel: str, n: int) -> float:
            fn = kernel_by_name[kernel]
            arg = setup(n) if setup is not None else n
            return benchmark(
                fn, arg, min_t=min_t, repeats=repeats, get="min"
            )

        new = combo_runner_to_df(
            self.spark,
            time_kernel,
            {"kernel": self.names, "n": list(ns)},
            var_names="time",
            var_types={"time": float},
        )
        self.df = new if self.df is None else self.df.unionByName(new)
        return self.df

    def scaling(self) -> DataFrame:
        """Log-log scaling exponent per kernel: the OLS slope of
        log(time) on log(n) — ``covar/var`` as one aggregation."""
        if self.df is None:
            raise RuntimeError("run() first")
        lg = self.df.select(
            "kernel",
            F.log("n").alias("ln_n"),
            F.log("time").alias("ln_t"),
        )
        return lg.groupBy("kernel").agg(
            (
                F.covar_samp("ln_n", "ln_t") / F.var_samp("ln_n")
            ).alias("exponent"),
            F.count(F.lit(1)).alias("points"),
        )
