import pytest

from xyzpy_spark.prepare import (
    check_combo_case_disjoint,
    parse_cases,
    parse_combos,
    parse_fn_args,
    parse_var_dims,
    parse_var_names,
)


def test_parse_combos_dict_and_pairs():
    assert parse_combos({"a": [1, 2]}) == (("a", (1, 2)),)
    assert parse_combos([("a", [1, 2]), ("b", range(3))]) == (
        ("a", (1, 2)),
        ("b", (0, 1, 2)),
    )
    # scalar promoted to 1-tuple
    assert parse_combos({"a": 7}) == (("a", (7,)),)


def test_parse_combos_rejects_duplicates():
    with pytest.raises(ValueError, match="duplicate"):
        parse_combos({"a": [1, 1, 2]})


def test_parse_combos_rejects_empty():
    with pytest.raises(ValueError, match="no values"):
        parse_combos({"a": []})


def test_parse_cases_mappings_and_tuples():
    assert parse_cases([{"a": 1}, {"a": 2}]) == ({"a": 1}, {"a": 2})
    assert parse_cases([(1, 2), (3, 4)], fn_args=["a", "b"]) == (
        {"a": 1, "b": 2},
        {"a": 3, "b": 4},
    )
    assert parse_cases({"a": 1}) == ({"a": 1},)


def test_parse_cases_inconsistent_keys():
    with pytest.raises(ValueError, match="inconsistent"):
        parse_cases([{"a": 1}, {"b": 2}])


def test_parse_fn_args_inference():
    def f(a, b, *, c=1):
        return a

    assert parse_fn_args(f) == ("a", "b", "c")
    assert parse_fn_args(f, ["a"]) == ("a",)


def test_parse_var_names():
    assert parse_var_names("x") == ("x",)
    assert parse_var_names(["x", "y"]) == ("x", "y")
    assert parse_var_names(None) is None


def test_parse_var_dims_shared_tuple_key():
    out = parse_var_dims({("x", "y"): "t"}, ("x", "y", "z"))
    assert out == {"x": ("t",), "y": ("t",), "z": ()}


def test_parse_var_dims_unknown_var():
    with pytest.raises(ValueError, match="unknown"):
        parse_var_dims({"q": "t"}, ("x",))


def test_combo_case_disjoint():
    with pytest.raises(ValueError, match="both"):
        check_combo_case_disjoint(
            parse_combos({"a": [1]}), parse_cases([{"a": 2}])
        )


def test_duplicate_check_catches_int_float_collision():
    """1 and 1.0 collapse to one coordinate after Spark's double
    coercion — must be rejected (review regression)."""
    import pytest

    from xyzpy_spark.prepare import parse_combos

    with pytest.raises(ValueError, match="duplicate"):
        parse_combos({"a": [1, 1.0, 2]})
    # all-int combos keep exact identity (no false positives > 2^53)
    parse_combos({"a": [2**53, 2**53 + 1]})
