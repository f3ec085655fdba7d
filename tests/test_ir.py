"""pipeline/ir.py: PMI collocations, TF-IDF keywords, BM25 search —
each pinned against an independent pure-python twin on a small corpus
with known structure, plus edge cases (NULL text, empty query)."""

import math

import pytest
from pyspark.sql import functions as F

from xyzpy_spark.pipeline.ir import (
    bm25_search,
    pmi_collocations,
    tfidf_top_terms,
)


def _round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "new york is a big city"),
        (2, "new york has a big port"),
        (3, "the city has a port"),
        (4, "big data needs a big cluster"),
        (5, "new york new york"),
        (6, None),
        (7, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _tok(rows):
    out = {}
    for i, t in rows:
        if t is None:
            continue
        w = [x for x in t.split() if x]
        if w:
            out[i] = w
    return out


CORPUS_ROWS = [
    (1, "new york is a big city"),
    (2, "new york has a big port"),
    (3, "the city has a port"),
    (4, "big data needs a big cluster"),
    (5, "new york new york"),
    (6, None),
    (7, "   "),
]


def test_pmi_matches_python_twin(corpus):
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi"])
        for r in pmi_collocations(
            corpus, min_count=2, top_k=50
        ).collect()
    }
    docs = _tok(CORPUS_ROWS)
    uni, bi = {}, {}
    n_tok = n_bi = 0
    for w in docs.values():
        for t in w:
            uni[t] = uni.get(t, 0) + 1
            n_tok += 1
        for a, b in zip(w, w[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            n_bi += 1
    want = {}
    for (a, b), n in bi.items():
        if n >= 2:
            pmi = math.log(
                (n / n_bi) / ((uni[a] / n_tok) * (uni[b] / n_tok))
            )
            want[(a, b)] = (n, _round6(pmi))
    assert got == want
    # top-1 must agree with the twin's argmax (pmi desc, pair asc)
    top = pmi_collocations(corpus, min_count=2, top_k=1).collect()[0]
    want_top = min(want.items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert (top["w1"], top["w2"]) == want_top[0]


def test_tfidf_matches_python_twin(corpus):
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["score"])
        for r in tfidf_top_terms(corpus, k=2).collect()
    }
    docs = _tok(CORPUS_ROWS)
    n = len(docs)
    dfreq = {}
    for w in docs.values():
        for t in set(w):
            dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for i, w in docs.items():
        tf = {}
        for t in w:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            (
                (
                    t,
                    _round6(
                        c * (math.log((n + 1.0) / (dfreq[t] + 1.0)) + 1.0)
                    ),
                )
                for t, c in tf.items()
            ),
            key=lambda x: (-x[1], x[0]),
        )
        for rank, (t, s) in enumerate(scored[:2], start=1):
            want[(i, rank)] = (t, s)
    assert got == want


def test_bm25_matches_python_twin(corpus):
    q = ["big", "port"]
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_search(corpus, q, top_k=10).collect()
    ]
    docs = _tok(CORPUS_ROWS)
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    dfreq = {
        t: sum(1 for w in docs.values() if t in w) for t in q
    }
    k1, b = 1.2, 0.75
    want = []
    for i, w in docs.items():
        s = 0.0
        hit = False
        for t in q:
            tf = w.count(t)
            if not tf:
                continue
            hit = True
            idf = math.log(
                1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            )
            s += (
                idf
                * (tf * (k1 + 1.0))
                / (tf + k1 * (1.0 - b + b * len(w) / avgdl))
            )
        if hit:
            want.append((i, _round6(s)))
    want.sort(key=lambda x: (-x[1], x[0]))
    assert got == want
    # docs without any query term never appear
    assert all(i not in (6, 7) for i, _ in got)


def test_bm25_empty_query_raises(corpus):
    with pytest.raises(ValueError, match="term"):
        bm25_search(corpus, [])


def test_ir_plan_shapes(spark, corpus):
    """Scale discipline: top-k through TakeOrdered (PMI/BM25), the
    TF-IDF rank window partitioned by document (never global), no
    Python stage anywhere."""
    from xyzpy_spark.plans.inspect import executed_plan

    p1 = executed_plan(pmi_collocations(corpus, top_k=5))
    assert "TakeOrdered" in p1 and "Python" not in p1
    p2 = executed_plan(bm25_search(corpus, ["big"], top_k=5))
    assert "TakeOrdered" in p2 and "Python" not in p2
    p3 = executed_plan(tfidf_top_terms(corpus, k=2))
    assert "Python" not in p3
    lines = p3.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            ctx = "\n".join(lines[max(0, i - 3):i])
            assert "Window" not in ctx and "Sort" not in ctx, p3


def test_bm25_index_single_query_matches_live_scan(spark, corpus):
    """The saved-index probe must score EXACTLY like the live
    full-scan bm25_search for the same query — one semantics, two
    plans (index-at-rest vs per-query corpus scan)."""
    from xyzpy_spark.pipeline.ir import (
        bm25_against_index,
        build_bm25_index,
    )

    terms = ["spark", "data", "the"]
    live = [
        (r["doc_id"], r["score"])
        for r in bm25_search(corpus, terms, top_k=5).collect()
    ]
    index = build_bm25_index(corpus).persist()
    queries = spark.createDataFrame(
        [(1, terms)], "query_id long, terms array<string>"
    )
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_against_index(queries, index, top_k=5)
        .orderBy("rank")
        .collect()
    ]
    index.unpersist()
    assert got == live and len(got) > 0


def test_bm25_index_multi_query_and_missing_terms(spark, corpus):
    """Multiple queries answer independently in one pass; terms
    absent from the index contribute nothing (never NULL a score);
    duplicate terms in a query count once (array_distinct, matching
    bm25_search's set semantics)."""
    from xyzpy_spark.pipeline.ir import (
        bm25_against_index,
        build_bm25_index,
    )

    index = build_bm25_index(corpus).persist()
    queries = spark.createDataFrame(
        [
            (1, ["spark", "spark", "data"]),
            (2, ["zzznotaterm"]),
            (3, ["the", "zzznotaterm"]),
        ],
        "query_id long, terms array<string>",
    )
    rows = bm25_against_index(queries, index, top_k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # dedup'd terms == plain terms
    single = spark.createDataFrame(
        [(9, ["spark", "data"])], "query_id long, terms array<string>"
    )
    want1 = {
        (r["doc_id"], r["score"])
        for r in bm25_against_index(single, index, top_k=3).collect()
    }
    index.unpersist()
    assert {(r["doc_id"], r["score"]) for r in by_q[1]} == want1
    assert 2 not in by_q  # no postings at all -> no rows
    assert all(r["score"] > 0 for r in by_q[3])  # 'the' still scores


def test_tfidf_n_counts_distinct_documents(spark):
    """N (documents with >= 1 token) must be the DISTINCT doc count —
    the r9 rlike shortcut initially counted ROWS, silently shifting
    every idf when id_col carries duplicate rows (review catch)."""
    rows = [
        (1, "alpha beta"),
        (1, "alpha beta"),   # duplicate row, same document
        (2, "alpha gamma"),
        (3, "   "),          # token-less: not a document for N
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"]): r["score"]
        for r in tfidf_top_terms(df, k=3).collect()
    }
    # N = 2 (docs 1 and 2); doc 3 has no tokens
    def idf(df_t, n=2):
        return math.log((n + 1.0) / (df_t + 1.0)) + 1.0

    # doc 1's rows are duplicated, so its tf for each term is 2
    assert got[(1, "alpha")] == pytest.approx(2 * idf(2), abs=1e-6)
    assert got[(1, "beta")] == pytest.approx(2 * idf(1), abs=1e-6)
    assert got[(2, "gamma")] == pytest.approx(1 * idf(1), abs=1e-6)
