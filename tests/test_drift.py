"""Corpus drift monitoring (pipeline/drift.py) vs an independent
pure-python JS-divergence twin: same whitespace tokenization, same
add-alpha smoothing over the union vocabulary, same e9 fixed-point
quantization — recomputed flat, no Spark."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _pytokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text) if t]


def _pydrift(side_a, side_b, alpha=0.5):
    """Flat reimplementation of corpus_divergence's documented
    semantics: returns ({token: contrib_e9}, total_e9)."""
    ca = Counter(t for x in side_a for t in _pytokens(x))
    cb = Counter(t for x in side_b for t in _pytokens(x))
    vocab = set(ca) | set(cb)
    a_tot, b_tot = sum(ca.values()), sum(cb.values())
    contribs = {}
    for t in vocab:
        p = (ca.get(t, 0) + alpha) / (float(a_tot) + alpha * len(vocab))
        q = (cb.get(t, 0) + alpha) / (float(b_tot) + alpha * len(vocab))
        c = 0.5 * p * math.log2(2.0 * p / (p + q)) + 0.5 * q * math.log2(
            2.0 * q / (p + q)
        )
        contribs[t] = math.floor(c * 1e9 + 0.5)
    return contribs, sum(contribs.values())


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_distributions_zero(spark):
    from xyzpy_spark.pipeline.drift import corpus_divergence

    rows = [(i, "alpha beta gamma delta") for i in range(8)]
    out = corpus_divergence(
        _docs(spark, rows), _docs(spark, rows), top_k=4
    ).collect()
    assert len(out) == 4
    assert all(r["js_total_e9"] == 0 for r in out)
    assert all(r["js_contrib_e9"] == 0 for r in out)
    # identical sides: p_a == p_b per token
    assert all(r["p_a"] == r["p_b"] for r in out)


def test_disjoint_support_near_one_bit(spark):
    """Disjoint vocabularies: JSD -> 1 bit as smoothing mass -> 0.
    With alpha=0.5 over a small vocab the smoothed value stays close
    to but strictly below 1."""
    from xyzpy_spark.pipeline.drift import corpus_divergence

    a = [(i, "aa bb cc dd " * 50) for i in range(4)]
    b = [(i, "ww xx yy zz " * 50) for i in range(4)]
    out = corpus_divergence(_docs(spark, a), _docs(spark, b), top_k=2).collect()
    total = out[0]["js_total_e9"] / 1e9
    assert 0.9 < total < 1.0


def test_matches_python_twin(spark):
    """Full-surface parity on a mixed corpus: per-token contributions,
    counts, the exact total, and the top-k ordering (contrib desc,
    token asc)."""
    from xyzpy_spark.pipeline.drift import corpus_divergence

    a_rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the cat sat on the mat"),
        (3, "spark shuffles the partitioned data"),
        (4, None),
        (5, "   "),
    ]
    b_rows = [
        (1, "der schnelle braune fuchs the the"),
        (2, "die katze sat auf der matte"),
        (3, "spark spark spark data"),
    ]
    contribs, total = _pydrift(
        [t for _, t in a_rows if t], [t for _, t in b_rows if t]
    )
    out = corpus_divergence(
        _docs(spark, a_rows), _docs(spark, b_rows), top_k=10
    ).collect()
    assert all(r["js_total_e9"] == total for r in out)
    expect = sorted(contribs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["token"], r["js_contrib_e9"]) for r in out]
    assert got == expect
    # count columns agree with flat counters
    ca = Counter(t for _, x in a_rows if x for t in _pytokens(x))
    cb = Counter(t for _, x in b_rows if x for t in _pytokens(x))
    for r in out:
        assert r["cnt_a"] == ca.get(r["token"], 0)
        assert r["cnt_b"] == cb.get(r["token"], 0)


def test_validates_params(spark):
    from xyzpy_spark.pipeline.drift import corpus_divergence

    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="top_k"):
        corpus_divergence(d, d, top_k=0)
    with pytest.raises(ValueError, match="alpha"):
        corpus_divergence(d, d, alpha=0.0)


def test_numeric_divergence_matches_python_twin(spark):
    """Binned-JSD feature drift: bucketing (incl. clamping and NULL
    drop) and the shared divergence math vs a flat reimplementation."""
    import math as _math
    from collections import Counter as _Counter

    from xyzpy_spark.pipeline.drift import numeric_divergence

    nan = float("nan")
    # NaN must drop like NULL (Spark's floor(NaN)->0 vs DuckDB's
    # NaN-sorts-greatest disagree, so it may never reach the bucket);
    # ±Inf clamps into the edge bins like any outlier
    a_vals = [0.0, 1.5, 7.99, 8.0, 63.9, -5.0, 120.0, None, 33.3, 8.1,
              nan, float("inf")]
    b_vals = [2.0, 2.0, 2.0, 40.0, 40.0, 999.0, None, -0.001, nan,
              float("-inf")]
    lo, hi, n_bins = 0.0, 64.0, 8  # width 8.0

    def _bins(vals):
        out = _Counter()
        for v in vals:
            if v is None or v != v:
                continue
            if _math.isinf(v):
                out[n_bins - 1 if v > 0 else 0] += 1
                continue
            b = _math.floor((v - lo) / 8.0)
            out[min(max(b, 0), n_bins - 1)] += 1
        return out

    ca, cb = _bins(a_vals), _bins(b_vals)
    union = set(ca) | set(cb)
    at, bt = sum(ca.values()), sum(cb.values())
    want = {}
    total = 0
    for t in union:
        p = (ca.get(t, 0) + 0.5) / (float(at) + 0.5 * len(union))
        q = (cb.get(t, 0) + 0.5) / (float(bt) + 0.5 * len(union))
        c = 0.5 * p * _math.log2(2.0 * p / (p + q)) + 0.5 * q * _math.log2(
            2.0 * q / (p + q)
        )
        want[t] = _math.floor(c * 1e9 + 0.5)
        total += want[t]

    da = spark.createDataFrame([(v,) for v in a_vals], "value double")
    db = spark.createDataFrame([(v,) for v in b_vals], "value double")
    out = numeric_divergence(
        da, db, "value", lo=lo, hi=hi, n_bins=n_bins, top_k=n_bins
    ).collect()
    assert {r["token"]: r["js_contrib_e9"] for r in out} == want
    assert all(r["js_total_e9"] == total for r in out)
    # clamped mass is visible in the edge bins
    got = {r["token"]: (r["cnt_a"], r["cnt_b"]) for r in out}
    assert got[0] == (ca[0], cb[0])          # includes -5.0 / -0.001
    assert got[n_bins - 1] == (ca[7], cb[7])  # includes 120.0 / 999.0


def test_numeric_divergence_validates_params(spark):
    from xyzpy_spark.pipeline.drift import numeric_divergence

    d = spark.createDataFrame([(1.0,)], "value double")
    with pytest.raises(ValueError, match="lo < hi"):
        numeric_divergence(d, d, "value", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="n_bins"):
        numeric_divergence(d, d, "value", lo=0.0, hi=1.0, n_bins=1)


def test_accessor_divergence(spark):
    """The .xyz accessor exposes both drift monitors; results equal the
    direct calls."""
    from xyzpy_spark.accessor import xyz
    from xyzpy_spark.pipeline.drift import corpus_divergence

    a = _docs(spark, [(1, "aa bb cc"), (2, "aa dd")])
    b = _docs(spark, [(1, "aa bb"), (2, "ee ee ee")])
    via_acc = xyz(a).divergence_from(xyz(b), top_k=5).df.collect()
    direct = corpus_divergence(a, b, top_k=5).collect()
    assert via_acc == direct
    nd = (
        xyz(spark.createDataFrame([(1.0,), (9.0,)], "v double"))
        .value_divergence_from(
            spark.createDataFrame([(1.0,), (1.5,)], "v double"),
            "v", lo=0.0, hi=16.0, n_bins=4, top_k=4,
        )
        .df.collect()
    )
    assert {r["token"] for r in nd} == {0, 2}
    md = (
        xyz(spark.createDataFrame([(1.0, 3.0), (9.0, 3.0)], "u double, v double"))
        .multi_divergence_from(
            spark.createDataFrame([(1.0, 15.0), (1.5, 3.0)], "u double, v double"),
            {"u": (0.0, 16.0), "v": (0.0, 16.0)},
            n_bins=4, top_k=4,
        )
        .df.collect()
    )
    assert {r["col"] for r in md} == {"u", "v"}


def test_numeric_divergence_multi_matches_single(spark):
    """The one-scan multi-column monitor is column-for-column
    identical to k single-column calls (same bucket core, same JSD
    core, same fixed-point totals) — with per-column NULL/NaN
    patterns exercising the projection-context guard that replaces
    the single-column path's pushed-down filter."""
    from xyzpy_spark.pipeline.drift import (
        numeric_divergence,
        numeric_divergence_multi,
    )

    nan = float("nan")
    rows_a = [
        (0.0, 5.0), (7.99, None), (63.9, nan), (None, 2.0),
        (nan, 999.0), (-5.0, -1.0), (120.0, 3.0), (33.3, 3.0),
    ]
    rows_b = [
        (2.0, None), (40.0, 1.0), (None, 1.0), (8.0, nan),
        (float("inf"), 2.5), (999.0, float("-inf")),
    ]
    da = spark.createDataFrame(rows_a, "x double, y double")
    db = spark.createDataFrame(rows_b, "x double, y double")
    specs = {"x": (0.0, 64.0), "y": (0.0, 4.0)}
    multi = numeric_divergence_multi(da, db, specs, n_bins=8, top_k=8)
    assert multi.columns == [
        "col", "token", "cnt_a", "cnt_b", "p_a", "p_b",
        "js_contrib_e9", "js_total_e9",
    ]
    mrows = multi.collect()
    # specs insertion order is the output order contract
    seen_order = []
    for r in mrows:
        if r["col"] not in seen_order:
            seen_order.append(r["col"])
    assert seen_order == ["x", "y"]
    for col, (lo, hi) in specs.items():
        single = {
            r["token"]: r
            for r in numeric_divergence(
                da, db, col, lo=lo, hi=hi, n_bins=8, top_k=8
            ).collect()
        }
        got = {r["token"]: r for r in mrows if r["col"] == col}
        assert set(got) == set(single), col
        for t, s in single.items():
            m = got[t]
            assert (
                m["cnt_a"], m["cnt_b"], m["p_a"], m["p_b"],
                m["js_contrib_e9"], m["js_total_e9"],
            ) == (
                s["cnt_a"], s["cnt_b"], s["p_a"], s["p_b"],
                s["js_contrib_e9"], s["js_total_e9"],
            ), (col, t)


def test_numeric_divergence_multi_python_twin(spark):
    """Direct flat-python parity for the multi monitor (not just
    consistency with the single-column path): per-column binning with
    clamp + NULL/NaN drop, add-alpha smoothing over each column's
    union bin support, e9 fixed-point contributions and totals."""
    import math as _math
    from collections import Counter as _Counter

    from xyzpy_spark.pipeline.drift import numeric_divergence_multi

    nan = float("nan")
    rows_a = [(1.0, 10.0), (2.5, None), (None, 30.0), (nan, 10.0),
              (-9.0, 500.0), (3.0, 10.0)]
    rows_b = [(1.0, 20.0), (1.0, 20.0), (7.5, nan), (None, None),
              (99.0, -3.0)]
    specs = {"u": (0.0, 8.0), "v": (0.0, 40.0)}
    n_bins = 4

    def _bins(vals, lo, hi):
        width = (hi - lo) / n_bins
        out = _Counter()
        for v in vals:
            if v is None or v != v:
                continue
            b = _math.floor((v - lo) / width)
            out[min(max(b, 0), n_bins - 1)] += 1
        return out

    want = {}
    for i, (col, (lo, hi)) in enumerate(specs.items()):
        ca = _bins([r[i] for r in rows_a], lo, hi)
        cb = _bins([r[i] for r in rows_b], lo, hi)
        union = set(ca) | set(cb)
        at, bt = sum(ca.values()), sum(cb.values())
        contribs = {}
        for t in union:
            p = (ca.get(t, 0) + 0.5) / (float(at) + 0.5 * len(union))
            q = (cb.get(t, 0) + 0.5) / (float(bt) + 0.5 * len(union))
            c = 0.5 * p * _math.log2(2.0 * p / (p + q)) \
                + 0.5 * q * _math.log2(2.0 * q / (p + q))
            contribs[t] = _math.floor(c * 1e9 + 0.5)
        want[col] = (contribs, sum(contribs.values()))

    da = spark.createDataFrame(rows_a, "u double, v double")
    db = spark.createDataFrame(rows_b, "u double, v double")
    out = numeric_divergence_multi(
        da, db, specs, n_bins=n_bins, top_k=n_bins
    ).collect()
    for col, (contribs, total) in want.items():
        got = {r["token"]: r for r in out if r["col"] == col}
        assert {t: r["js_contrib_e9"] for t, r in got.items()} == contribs
        assert all(r["js_total_e9"] == total for r in got.values()), col


def test_numeric_divergence_multi_validates(spark):
    from xyzpy_spark.pipeline.drift import (
        numeric_distribution_multi,
        numeric_divergence_multi,
    )

    d = spark.createDataFrame([(1.0,)], "value double")
    with pytest.raises(ValueError, match="empty"):
        numeric_distribution_multi(d, {})
    with pytest.raises(ValueError, match="lo < hi"):
        numeric_divergence_multi(d, d, {"value": (3.0, 3.0)})
    with pytest.raises(ValueError, match="n_bins"):
        numeric_divergence_multi(d, d, {"value": (0.0, 1.0)}, n_bins=1)


def test_grouped_divergence_rejects_lazy(spark):
    """group_col= results are bounded and always localized; the
    lazy-plan escape hatch only exists for the single-table path."""
    from xyzpy_spark.pipeline.drift import divergence_from_counts

    d = spark.createDataFrame([("v", 0, 1)], "col string, token int, cnt long")
    with pytest.raises(ValueError, match="localize"):
        divergence_from_counts(
            d, d, group_col="col", localize=False
        )


def test_grouped_topk_tie_order_matches_ungrouped(spark):
    """Within-group row ORDER of the grouped path equals a per-group
    divergence_from_counts call even for ties on non-string tokens
    (r12 ADVICE: the presentation used to break ties by str(token) —
    str-sorted, 10 < 2 — while the window and the ungrouped path
    order by the native token asc)."""
    from xyzpy_spark.pipeline.drift import divergence_from_counts

    # identical distributions → every contribution ties at 0, so the
    # whole ordering rests on the token tie-break
    rows = [
        ("g", 10, 5), ("g", 2, 5), ("g", 333, 5),
        ("h", 100, 1), ("h", 3, 1),
    ]
    ca = spark.createDataFrame(rows, "col string, token int, cnt long")
    grouped = divergence_from_counts(ca, ca, group_col="col").collect()
    for g in ("g", "h"):
        sub = ca.where(F.col("col") == g).drop("col")
        single = divergence_from_counts(sub, sub).collect()
        got = [r["token"] for r in grouped if r["col"] == g]
        want = [r["token"] for r in single]
        assert got == want, g
