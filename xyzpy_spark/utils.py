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
    return tuple(zip(*pairs))


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
