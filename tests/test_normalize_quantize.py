"""Unit tests for normalize_text (Unicode canonicalization) and
quantize_embeddings (int8 symmetric quantization)."""

from __future__ import annotations

import math
import unicodedata

import numpy as np
import pytest


def test_normalize_text_nfc_equivalence(spark):
    from xyzpy_spark.pipeline.text import normalize_text

    nfd = unicodedata.normalize("NFD", "école")  # e + combining accent
    nfc = unicodedata.normalize("NFC", "école")
    assert nfd != nfc  # the raw strings differ...
    df = spark.createDataFrame(
        [(0, nfd), (1, nfc)], "doc_id LONG, text STRING"
    )
    out = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(df).collect()
    }
    # ...but normalize to the same canonical form
    assert out[0] == out[1] == nfc


def test_normalize_text_full_stack(spark):
    from xyzpy_spark.pipeline.text import normalize_text

    df = spark.createDataFrame(
        [
            (0, "  ÉCOLE   franç̧aise \t x "),
            (1, None),
            (2, "øß unchanged"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(
            df,
            strip_accents=True,
            lowercase=True,
            collapse_whitespace=True,
        ).collect()
    }
    # c + combining cedilla strips to plain c; runs collapse; trim
    assert out[0] == "ecole francaise x"
    assert out[1] is None
    # standalone letters are not folded (DuckDB strip_accents parity)
    assert out[2] == "øß unchanged"


def test_normalize_text_bad_form_raises(spark):
    from xyzpy_spark.pipeline.text import normalize_text

    df = spark.createDataFrame([(0, "x")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="unknown form"):
        normalize_text(df, form="NFX")


def test_normalize_then_fingerprint_merges_dups(spark):
    """The motivating composition: NFC vs NFD spellings of the same
    text must exact-dedup after normalization."""
    from xyzpy_spark.pipeline.text import add_fingerprint, normalize_text

    nfd = unicodedata.normalize("NFD", "même texte")
    nfc = unicodedata.normalize("NFC", "même texte")
    df = spark.createDataFrame(
        [(0, nfd), (1, nfc)], "doc_id LONG, text STRING"
    )
    norm = normalize_text(df).drop("text").withColumnRenamed(
        "text_norm", "text"
    )
    fps = {r["fingerprint"] for r in add_fingerprint(norm).collect()}
    assert len(fps) == 1


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------


def test_quantize_matches_numpy_twin(spark):
    from xyzpy_spark.pipeline.similarity import quantize_embeddings

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {
        r["vec_id"]: (r["q_scale"], list(r["qvec"]))
        for r in quantize_embeddings(df).collect()
    }
    for i in range(30):
        x = vecs[i].astype("float64")
        s = float(np.max(np.abs(x)))
        q = [math.floor(v / s * 127) for v in x]
        assert got[i][0] == pytest.approx(s, abs=0)
        assert got[i][1] == q
        assert all(-128 <= v <= 127 for v in q)


def test_quantize_zero_vector(spark):
    from xyzpy_spark.pipeline.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert r["q_scale"] == 0.0
    assert list(r["qvec"]) == [0, 0, 0]


def test_quantized_cosine_recall(spark):
    """int8 dequantized cosine top-10 must recall >= 0.95 of the
    float top-10 — the property that licenses the 4x memory cut."""
    from xyzpy_spark.pipeline.similarity import quantize_embeddings

    rng = np.random.default_rng(5)
    corpus = rng.normal(size=(300, 32)).astype("float32")
    q = corpus[7] + rng.normal(scale=0.05, size=32).astype("float32")

    def topk(mat, qv, k=10):
        sims = (mat @ qv) / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(qv) + 1e-12
        )
        return set(np.argsort(-sims)[:k])

    df = spark.createDataFrame(
        [(i, [float(x) for x in corpus[i]]) for i in range(300)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = quantize_embeddings(df).collect()
    deq = np.zeros_like(corpus, dtype="float64")
    for r in rows:
        deq[r["vec_id"]] = np.array(r["qvec"]) * r["q_scale"] / 127.0
    exact = topk(corpus.astype("float64"), q.astype("float64"))
    approx = topk(deq, q.astype("float64"))
    assert len(exact & approx) / len(exact) >= 0.95


def test_quantize_map_only_plan(spark):
    from xyzpy_spark.pipeline.similarity import quantize_embeddings
    from xyzpy_spark.plans.inspect import has_exchange

    df = spark.createDataFrame(
        [(0, [1.0, -2.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    assert not has_exchange(quantize_embeddings(df))


def test_normalize_collapse_is_ascii_whitespace_only(spark):
    """Collapse must match Java/RE2 ASCII \\s, not Python Unicode \\s:
    U+00A0 survives NFC collapse (and folds under NFKC)."""
    from xyzpy_spark.pipeline.text import normalize_text

    df = spark.createDataFrame(
        [(0, "a b"), (1, "a  \t b")], "doc_id LONG, text STRING"
    )
    out = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(df, collapse_whitespace=True).collect()
    }
    assert out[0] == "a b"  # exotic space untouched under NFC
    assert out[1] == "a b"
    nfkc = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(
            df, form="NFKC", collapse_whitespace=True
        ).collect()
    }
    assert nfkc[0] == "a b"  # NFKC folds U+00A0 first
