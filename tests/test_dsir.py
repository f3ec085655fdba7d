"""DSIR importance resampling (pipeline/dsir.py) vs an independent
pure-python model: same md5 feature hashing, same add-k bag model,
same Gumbel top-k — recomputed flat, no Spark."""

from __future__ import annotations

import hashlib
import math

import pytest


def _pyhash(gram: str, n_buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % n_buckets


def _pyfeats(text: str, n: int = 2) -> list[str]:
    toks = [t for t in __import__("re").split(r"[ \t\n\x0b\f\r]+", text) if t]
    feats = list(toks)
    for order in range(2, n + 1):
        feats += [
            " ".join(toks[i : i + order])
            for i in range(len(toks) - order + 1)
        ]
    return feats


def _round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _pyweights(raw, target, n_buckets=64, add_k=0.5):
    """Flat reimplementation of dsir_weights' documented semantics."""
    from collections import Counter

    p = Counter(
        _pyhash(g, n_buckets) for _, t in target for g in _pyfeats(t)
    )
    q = Counter(
        _pyhash(g, n_buckets) for _, t in raw for g in _pyfeats(t)
    )
    pt, qt = sum(p.values()), sum(q.values())
    kb = add_k * n_buckets
    out = {}
    for i, t in raw:
        feats = [_pyhash(g, n_buckets) for g in _pyfeats(t)]
        if not feats:
            continue
        lw = sum(
            math.log(p.get(b, 0) + add_k)
            - math.log(pt + kb)
            - math.log(q[b] + add_k)
            + math.log(qt + kb)
            for b in feats
        )
        out[i] = (len(feats), _round6(lw))
    return out


RAW = [
    (1, "the cat sat on the mat with the hat"),
    (2, "stock market crash panic sell sell sell"),
    (3, "the dog sat on the log with the cat"),
    (4, "buy stock panic market crash numbers 123 456"),
    (5, ""),
]
TARGET = [
    (100, "the cat and the dog sat on the mat"),
    (101, "a cat a dog a mat a log the hat"),
]


def _dfs(spark):
    raw = spark.createDataFrame(RAW, "doc_id LONG, text STRING")
    tgt = spark.createDataFrame(TARGET, "doc_id LONG, text STRING")
    return raw, tgt


def test_dsir_weights_match_python_model(spark):
    from xyzpy_spark.pipeline.dsir import dsir_weights

    raw, tgt = _dfs(spark)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir_weights(raw, tgt, n_buckets=64).collect()
    }
    want = _pyweights(RAW, TARGET, n_buckets=64)
    assert set(got) == set(want)  # empty doc 5 absent from both
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)


def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs sharing the target's n-grams must outweigh off-domain
    docs — the whole point of importance reweighting."""
    from xyzpy_spark.pipeline.dsir import dsir_weights

    raw, tgt = _dfs(spark)
    w = {
        r["doc_id"]: r["logw"] / r["n_feats"]
        for r in dsir_weights(raw, tgt, n_buckets=1024).collect()
    }
    assert min(w[1], w[3]) > max(w[2], w[4])


def test_dsir_select_matches_python_gumbel_topk(spark):
    from xyzpy_spark.pipeline.dsir import dsir_select

    raw, tgt = _dfs(spark)
    sel = dsir_select(raw, tgt, 2, n_buckets=64, salt="dsir").collect()
    # python twin of the deterministic Gumbel perturbation
    want = _pyweights(RAW, TARGET, n_buckets=64)
    scored = []
    for i, (_, lw) in want.items():
        u = (
            int(hashlib.md5(f"{i}dsir".encode()).hexdigest()[:8], 16)
            + 0.5
        ) / 4294967296.0
        scored.append((_round6(lw + -math.log(-math.log(u))), -i))
    scored.sort(reverse=True)
    want_ids = [-i for _, i in scored[:2]]
    assert [r["doc_id"] for r in sel] == sorted(
        want_ids,
        key=lambda d: (-dict((x["doc_id"], x["score"]) for x in sel)[d], d),
    )
    assert len(sel) == 2


def test_dsir_select_deterministic_and_salted(spark):
    from xyzpy_spark.pipeline.dsir import dsir_select

    raw, tgt = _dfs(spark)
    a = {r["doc_id"] for r in dsir_select(raw, tgt, 2).collect()}
    b = {r["doc_id"] for r in dsir_select(raw, tgt, 2).collect()}
    assert a == b  # same salt -> same sample
    c = {
        r["doc_id"]
        for r in dsir_select(raw, tgt, 2, salt="other").collect()
    }
    assert len(c) == 2  # a different salt is a valid resample


def test_dsir_select_plans_distributed_topk(spark):
    """Selection must plan as TakeOrdered (per-partition heaps), not
    a global single-partition window sort."""
    from xyzpy_spark.pipeline.dsir import dsir_select
    from xyzpy_spark.plans.inspect import executed_plan

    raw, tgt = _dfs(spark)
    plan = executed_plan(dsir_select(raw, tgt, 2))
    assert "TakeOrdered" in plan
    # no rank window over the scored stream (the only Windows allowed
    # are the bounded lead-frames inside the n-gram assembly)
    assert "row_number" not in plan
    assert "GlobalLimit" not in plan  # TakeOrdered subsumes the limit


def test_dsir_bucket_counts_contract(spark):
    """Direct contract of the public sufficient-statistics helper
    (used inside dsir_weights, but exported on its own): counts sum
    to the total feature count, bucket ids stay inside [0, n_buckets),
    and the output is deterministic."""
    from xyzpy_spark.pipeline.dsir import dsir_bucket_counts

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x"), (3, None)],
        "doc_id LONG, text STRING",
    )
    counts, total = dsir_bucket_counts(df, n_buckets=64, n=2)
    rows = sorted((r["bucket"], r["cnt"]) for r in counts.collect())
    assert sum(c for _, c in rows) == total
    assert all(0 <= b < 64 for b, _ in rows)
    # unigrams + bigrams of the two non-null docs: (4+3) + (3+2) = 12
    assert total == 12
    counts2, total2 = dsir_bucket_counts(df, n_buckets=64, n=2)
    assert total2 == total
    assert sorted(
        (r["bucket"], r["cnt"]) for r in counts2.collect()
    ) == rows
