"""Small utilities mirrored from the reference's ``xyzpy/utils.py``.

Pure-Python helpers (S8-S11 in SURVEY §2.5): nested-iterable
reshaping, did-you-mean kwarg checking, and a wall-clock timer.  The
statistics utilities live in :mod:`xyzpy_spark.functions.stats`.
"""

from __future__ import annotations

import difflib
import functools
import operator
import time
from collections.abc import Iterable


def prod(values) -> int:
    """Product of an iterable (reference ``utils.py:22-24``)."""
    return functools.reduce(operator.mul, values, 1)


def unzip(pairs, ndim: int = 2):
    """Transpose a nested iterable at the outermost level: the inverse
    of zip (reference ``unzip``, ``utils.py:27-57``).

    >>> unzip([(1, 'a'), (2, 'b')])
    ((1, 2), ('a', 'b'))
    """
    if ndim <= 1:
        return tuple(pairs)
    if ndim == 2:
        return tuple(zip(*pairs))
    # recursive: unzip each inner level first (reference semantics)
    return tuple(
        zip(*(unzip(inner, ndim - 1) for inner in pairs))
    )


def flatten(nested, levels: int = 1):
    """Flatten ``levels`` levels of nesting (reference ``flatten``,
    ``utils.py:60-75``)."""
    if levels == 0:
        yield from nested
        return
    for item in nested:
        if isinstance(item, Iterable) and not isinstance(
            item, (str, bytes)
        ):
            yield from flatten(item, levels - 1)
        else:
            yield item


def autocorrect_kwargs(func=None, *, valid=None):
    """Reject unknown kwargs with a did-you-mean suggestion.

    Reference: ``autocorrect_kwargs`` (``utils.py:945-988``).  Usable
    as ``@autocorrect_kwargs`` (valid = the function's signature) or
    ``@autocorrect_kwargs(valid=[...])``.
    """

    def decorate(fn):
        import inspect

        sig_params = valid
        if sig_params is None:
            sig = inspect.signature(fn)
            has_var_kw = any(
                p.kind == inspect.Parameter.VAR_KEYWORD
                for p in sig.parameters.values()
            )
            sig_params = None if has_var_kw else set(sig.parameters)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if sig_params is not None:
                unknown = set(kwargs) - set(sig_params)
                if unknown:
                    msgs = []
                    for k in sorted(unknown):
                        close = difflib.get_close_matches(
                            k, sig_params, n=1
                        )
                        hint = f" (did you mean {close[0]!r}?)" if close else ""
                        msgs.append(f"{k!r}{hint}")
                    raise TypeError(
                        f"{fn.__name__} got unexpected keyword argument(s): "
                        + ", ".join(msgs)
                    )
            return fn(*args, **kwargs)

        return wrapper

    if func is not None:
        return decorate(func)
    return decorate


class Timer:
    """Context-manager wall timer (reference ``Timer``,
    ``utils.py:155-177``).

    >>> with Timer() as t:
    ...     work()
    >>> t.t   # elapsed seconds
    """

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.stop = time.perf_counter()
        self.t = self.interval = self.stop - self.start
        return False


def stage_metrics(spark) -> list[dict]:
    """Per-stage resource metrics from Spark's app status store —
    the cluster analog of the reference's RSS ``MemoryMonitor``
    (``utils.py:761-855``): on Spark, memory pressure is per-task
    execution memory + spill, tracked by the engine itself.

    Returns one dict per completed/running stage: ``stage_id, name,
    peak_execution_memory, memory_spilled, disk_spilled,
    shuffle_write, shuffle_read, input_bytes, output_bytes``.
    Task-event-driven (exact, no heartbeat lag).  Works with the UI
    server disabled — reads the in-process status store via py4j
    (the Scala default-argument stubs are called explicitly).
    """
    store = spark.sparkContext._jsc.sc().statusStore()
    jlist = spark.sparkContext._jvm.java.util.ArrayList()
    defaults = [
        getattr(store, f"stageList$default${i}")() for i in range(2, 6)
    ]
    stages = store.stageList(jlist, *defaults)
    out = []
    for i in range(stages.size()):
        s = stages.apply(i)
        out.append(
            {
                "stage_id": int(s.stageId()),
                "name": str(s.name()),
                "peak_execution_memory": int(s.peakExecutionMemory()),
                "memory_spilled": int(s.memoryBytesSpilled()),
                "disk_spilled": int(s.diskBytesSpilled()),
                "shuffle_write": int(s.shuffleWriteBytes()),
                "shuffle_read": int(s.shuffleReadBytes()),
                "input_bytes": int(s.inputBytes()),
                "output_bytes": int(s.outputBytes()),
            }
        )
    return out


def peak_memory_report(spark) -> dict:
    """Aggregate peak-memory / spill summary across all stages, plus
    per-executor JVM peaks where the heartbeat has populated them
    (executor metrics lag by the 10s heartbeat; stage numbers do not).
    """
    stages = stage_metrics(spark)
    report = {
        "peak_execution_memory": max(
            (s["peak_execution_memory"] for s in stages), default=0
        ),
        "total_memory_spilled": sum(s["memory_spilled"] for s in stages),
        "total_disk_spilled": sum(s["disk_spilled"] for s in stages),
        "total_shuffle_write": sum(s["shuffle_write"] for s in stages),
        "n_stages": len(stages),
        "executors": {},
    }
    store = spark.sparkContext._jsc.sc().statusStore()
    execs = store.executorList(True)
    for i in range(execs.size()):
        e = execs.apply(i)
        pmm = e.peakMemoryMetrics()
        if pmm.isDefined():
            m = pmm.get()
            report["executors"][str(e.id())] = {
                name: int(m.getMetricValue(name))
                for name in (
                    "JVMHeapMemory",
                    "OnHeapExecutionMemory",
                    "OnHeapStorageMemory",
                )
            }
    return report
