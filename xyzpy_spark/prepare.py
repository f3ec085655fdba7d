"""Normalization of sweep declarations: combos, cases, output schema.

Pure-Python input validation, independent of Spark.  Semantics follow
the reference parsers (``/root/reference/xyzpy/gen/prepare.py:23-218``):

- *combos*: ordered mapping ``arg -> sequence of values``; the full
  cartesian product defines the run grid; duplicate values within one
  arg are rejected (they would silently double compute and collide on
  merge — ``gen/prepare.py:34-42``).
- *cases*: an explicit sequence of parameter points — each a mapping,
  or a tuple zipped against ``fn_args`` (``gen/prepare.py:76-102``).
- *var_names / var_dims / var_coords*: the declared output schema:
  output variable names, per-variable internal dimensions, and
  coordinate values for those internal dims
  (``gen/prepare.py:115-212``).
"""

from __future__ import annotations

import inspect
from collections.abc import Iterable, Mapping, Sequence


def _as_value_tuple(values) -> tuple:
    """Normalize a combo's value spec to a tuple (scalars allowed)."""
    if isinstance(values, str) or not isinstance(values, Iterable):
        return (values,)
    return tuple(values)


def check_for_duplicates(combos) -> None:
    """Reject duplicate values within a single combo arg.

    Numeric values compare by VALUE across int/float (``1`` vs
    ``1.0``): Spark coerces a mixed int/float combo column to double,
    so such a pair would silently collapse to the same grid
    coordinate — exactly the double-compute/merge collision this
    check exists to reject.  Bools keep their own identity.
    """
    for arg, values in combos:
        # float keys only when the combo actually mixes ints with
        # floats (that is when Spark coerces the column to double);
        # an all-int combo stays int64, where exact repr keys avoid
        # falsely colliding >2^53 integers
        mixed = any(
            isinstance(v, float) for v in values
        ) and any(
            isinstance(v, int) and not isinstance(v, bool)
            for v in values
        )
        seen = set()
        for v in values:
            if (
                mixed
                and isinstance(v, (int, float))
                and not isinstance(v, bool)
            ):
                key = ("num", float(v))
            else:
                key = ("repr", repr(v))
            if key in seen:
                raise ValueError(
                    f"combo arg {arg!r} contains duplicate value {v!r}; "
                    "each grid coordinate must be unique"
                )
            seen.add(key)


def parse_combos(combos) -> tuple[tuple[str, tuple], ...]:
    """Normalize combos to ``((arg, (v, ...)), ...)`` preserving order."""
    if combos is None:
        return ()
    if isinstance(combos, Mapping):
        items = list(combos.items())
    else:
        items = [(arg, values) for arg, values in combos]
    parsed = tuple((str(arg), _as_value_tuple(values)) for arg, values in items)
    check_for_duplicates(parsed)
    for arg, values in parsed:
        if len(values) == 0:
            raise ValueError(f"combo arg {arg!r} has no values")
    return parsed


def parse_cases(cases, fn_args: Sequence[str] | None = None) -> tuple[dict, ...]:
    """Normalize cases to a tuple of dicts.

    Accepts a single mapping, a sequence of mappings, or a sequence of
    tuples zipped against ``fn_args``.  All cases must share the same
    key set (they form columns of one table).
    """
    if cases is None:
        return ()
    if isinstance(cases, Mapping):
        cases = [cases]
    parsed = []
    for case in cases:
        if isinstance(case, Mapping):
            parsed.append({str(k): v for k, v in case.items()})
        else:
            if isinstance(case, str) or not isinstance(case, Iterable):
                case = (case,)
            else:
                case = tuple(case)
            if fn_args is None:
                raise ValueError(
                    "cases given as bare tuples require fn_args to name them"
                )
            if len(case) != len(fn_args):
                raise ValueError(
                    f"case {case!r} length {len(case)} != fn_args {tuple(fn_args)!r}"
                )
            parsed.append(dict(zip(map(str, fn_args), case)))
    if parsed:
        keys0 = set(parsed[0])
        for c in parsed[1:]:
            if set(c) != keys0:
                raise ValueError(
                    f"inconsistent case keys: {sorted(keys0)} vs {sorted(c)}"
                )
    return tuple(parsed)


def parse_constants(constants) -> dict:
    if constants is None:
        return {}
    return {str(k): v for k, v in dict(constants).items()}


def parse_fn_args(fn, fn_args=None) -> tuple[str, ...]:
    """Infer argument names from the function signature if not given."""
    if fn_args is not None:
        if isinstance(fn_args, str):
            return (fn_args,)
        return tuple(map(str, fn_args))
    sig = inspect.signature(fn)
    return tuple(
        p.name
        for p in sig.parameters.values()
        if p.kind
        in (inspect.Parameter.POSITIONAL_OR_KEYWORD, inspect.Parameter.KEYWORD_ONLY)
    )


def parse_var_names(var_names) -> tuple[str, ...] | None:
    """``None`` means "function returns a mapping / labelled object"."""
    if var_names is None:
        return None
    if isinstance(var_names, str):
        return (var_names,)
    return tuple(map(str, var_names))


def parse_var_dims(var_dims, var_names) -> dict[str, tuple[str, ...]]:
    """Normalize to ``{var_name: (dim, ...)}`` for every var.

    Keys in the input mapping may be a single var name or a tuple of
    var names sharing the same internal dims (reference:
    ``gen/prepare.py:126-212``, exercised by ``foo2_array_array``).
    """
    out: dict[str, tuple[str, ...]] = {}
    if var_names is not None:
        for v in var_names:
            out[v] = ()
    if var_dims is None:
        return out
    for key, dims in dict(var_dims).items():
        if isinstance(dims, str):
            dims = (dims,)
        else:
            dims = tuple(map(str, dims))
        names = (key,) if isinstance(key, str) else tuple(key)
        for name in names:
            name = str(name)
            if var_names is not None and name not in out:
                raise ValueError(
                    f"var_dims names unknown variable {name!r}; "
                    f"var_names = {var_names}"
                )
            out[name] = dims
    return out


def parse_var_coords(var_coords) -> dict[str, tuple]:
    """Normalize to ``{dim: (coord values, ...)}``."""
    if var_coords is None:
        return {}
    return {str(dim): _as_value_tuple(vals) for dim, vals in dict(var_coords).items()}


def check_combo_case_disjoint(combos, cases) -> None:
    """A parameter may be swept by combos OR fixed per-case, not both
    (reference: ``gen/combo_runner.py:183-199``)."""
    if not combos or not cases:
        return
    combo_args = {arg for arg, _ in combos}
    case_args = set(cases[0])
    overlap = combo_args & case_args
    if overlap:
        raise ValueError(
            f"parameters {sorted(overlap)} appear in both combos and cases"
        )
