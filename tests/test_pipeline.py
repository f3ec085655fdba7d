import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from xyzpy_spark.pipeline.dedup import (
    dedup_exact,
    embedding_cosine_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_64,
    simhash_near_pairs,
)
from xyzpy_spark.pipeline.similarity import (
    cosine_topk,
    ivf_build,
    ivf_topk,
    ivf_topk_portable,
)
from xyzpy_spark.pipeline.text import (
    add_fingerprint,
    add_language_id,
    add_quality,
    add_token_count,
)
from xyzpy_spark.pipeline.multimodal import (
    attach_fake_media,
    decode_image,
    extract_media_meta,
    fake_media_bytes,
    frame_sample,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "completely different content about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "El perro corre en la calle y el gato duerme"),
        (5, "short"),
    ]
    return spark.createDataFrame(texts, ["doc_id", "text"])


def test_token_count(spark, docs):
    rows = {r["doc_id"]: r for r in add_token_count(docs).collect()}
    assert rows[0]["n_tokens"] == 9
    assert rows[5]["n_tokens"] == 1


def test_token_count_empty_and_whitespace_docs(spark):
    """Empty / whitespace-only text is 0 tokens, not [''] (ADVICE r1)."""
    df = spark.createDataFrame(
        [(0, ""), (1, "   \t \n "), (2, "one two"), (3, None)],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["n_tokens"] for r in add_token_count(df).collect()}
    assert rows[0] == 0
    assert rows[1] == 0
    assert rows[2] == 2
    assert rows[3] is None  # null text stays null, not 0


def test_quality_signals(spark, docs):
    rows = {r["doc_id"]: r for r in add_quality(docs).collect()}
    assert rows[0]["stopword_ratio"] > 0.2  # 'the' twice + 'over'
    assert rows[5]["quality"] < rows[0]["quality"]
    assert 0.0 <= rows[0]["quality"] <= 1.0


def test_score_quality_model(spark, docs):
    from xyzpy_spark.pipeline.text import score_quality_model

    out = score_quality_model(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    # deterministic: same text -> same score on a second run
    rows2 = {r["doc_id"]: r for r in score_quality_model(docs).collect()}
    for k in rows:
        assert rows[k]["score_raw"] == rows2[k]["score_raw"]
    # score is the length-normalized raw sum, bounded by the weight range
    for r in rows.values():
        if r["n_tokens"]:
            assert abs(r["score"]) <= 1.0
            assert r["keep"] == (r["score_raw"] >= 0)
    # distinct texts should not all collapse to one score
    assert len({r["score_raw"] for r in rows.values()}) > 1


def test_train_and_serve_quality_classifier(spark):
    """Train->serve loop: a hashed-bag logistic classifier trained on
    a synthetic separable labeled set must classify a held-out set
    from the same distribution correctly, and the distributed serving
    margins must match a numpy reimplementation of the dot product."""
    import numpy as np

    from xyzpy_spark.pipeline.text import (
        score_quality_trained,
        train_quality_classifier,
    )

    rng = np.random.default_rng(7)
    good_vocab = [f"good{i}" for i in range(30)]
    bad_vocab = [f"spam{i}" for i in range(30)]
    shared = [f"word{i}" for i in range(50)]

    def make(n, vocab, label, start):
        rows = []
        for d in range(n):
            toks = list(rng.choice(shared, 8)) + list(rng.choice(vocab, 6))
            rng.shuffle(toks)
            rows.append((start + d, " ".join(toks), label))
        return rows

    train_rows = make(60, good_vocab, 1, 0) + make(60, bad_vocab, 0, 1000)
    test_rows = make(25, good_vocab, 1, 2000) + make(25, bad_vocab, 0, 3000)
    labeled = spark.createDataFrame(
        train_rows, "doc_id long, text string, label int"
    )
    weights, b0 = train_quality_classifier(labeled, n_buckets=1 << 14)

    held = spark.createDataFrame(
        test_rows, "doc_id long, text string, label int"
    )
    out = score_quality_trained(held, weights, b0, n_buckets=1 << 14)
    got = {r.doc_id: (r.margin, r.keep) for r in out.collect()}
    acc = sum(
        1 for d, t, lab in test_rows if got[d][1] == bool(lab)
    ) / len(test_rows)
    assert acc >= 0.95, acc

    # serving margins agree with a driver-side numpy dot product using
    # the same bucket function (hash parity via the collected weights)
    wmap = {r.bucket: r.weight for r in weights.collect()}
    from pyspark.sql import functions as F

    bucket_rows = (
        held.select(
            "doc_id",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("t"),
        )
        .select(
            "doc_id", F.pmod(F.hash("t"), F.lit(1 << 14)).alias("b")
        )
        .collect()
    )
    expect = {d: 0.0 for d, _, _ in test_rows}
    for r in bucket_rows:
        expect[r.doc_id] += wmap.get(r.b, 0.0)
    for d in expect:
        assert abs(got[d][0] - (expect[d] + b0)) < 1e-6, d

    # empty / weightless docs fall back to the intercept
    edf = spark.createDataFrame([(9, "")], "doc_id long, text string")
    er = score_quality_trained(edf, weights, b0, n_buckets=1 << 14).first()
    assert abs(er.margin - b0) < 1e-12

    with pytest.raises(ValueError, match="binary"):
        train_quality_classifier(
            spark.createDataFrame(
                [(1, "a", 2)], "doc_id long, text string, label int"
            )
        )

    # serving with a different n_buckets than training silently
    # mis-buckets every token — must fail loudly (weights are stamped)
    with pytest.raises(ValueError, match="n_buckets"):
        score_quality_trained(held, weights, b0, n_buckets=1 << 18)


def test_score_quality_model_empty_doc(spark):
    from xyzpy_spark.pipeline.text import score_quality_model

    df = spark.createDataFrame([(0, ""), (1, "a b c")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in score_quality_model(df).collect()}
    assert rows[0]["n_tokens"] == 0
    assert rows[0]["score_raw"] == 0
    assert rows[0]["score"] == 0.0


def test_language_id(spark, docs):
    rows = {r["doc_id"]: r["lang_pred"] for r in add_language_id(docs).collect()}
    assert rows[0] == "en"
    assert rows[4] == "es"


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, "other")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in add_fingerprint(df).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]


def test_dedup_exact(spark, docs):
    out = dedup_exact(docs).collect()
    groups = {r["keep_id"]: r["dup_count"] for r in out}
    assert groups[0] == 2  # docs 0 and 3
    assert len(out) == 5  # 6 docs, one merged pair


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert (0, 3) in got and got[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in got  # near dup shares most shingles
    assert (1, 3) in got
    assert all(a != 2 and b != 2 for a, b in got)


def test_minhash_estimates_jaccard(spark, docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, num_perm=64).collect()}
    assert sigs[0] == sigs[3]  # identical docs -> identical signature
    agree01 = sum(a == b for a, b in zip(sigs[0], sigs[1])) / 64
    assert agree01 > 0.3  # near dups agree on a good fraction
    agree02 = sum(a == b for a, b in zip(sigs[0], sigs[2])) / 64
    assert agree02 < agree01


def test_minhash_lsh_pairs(spark, docs):
    pairs = minhash_lsh_pairs(
        docs, num_perm=64, bands=16, threshold=0.3
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert got[(0, 3)] == 1.0
    assert (0, 1) in got


def test_minhash_portable_matches_python_recompute(spark, docs):
    """The md5-portable permutation family (decimal(38) modular math)
    must agree bit-for-bit with a pure-python big-int recompute."""
    import hashlib

    from xyzpy_spark.pipeline.dedup import (
        MINHASH_PRIME,
        portable_perm_constants,
    )

    n, num_perm = 3, 16
    sigs = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(
            docs, n=n, num_perm=num_perm, hash_fn="md5"
        ).collect()
    }
    consts = portable_perm_constants(num_perm)
    for doc_id, text in [(0, "the quick brown fox jumps over the lazy dog"),
                         (5, "short")]:
        toks = text.split()
        shingles = {
            " ".join(toks[i: i + n])
            for i in range(max(len(toks) - n, 0) + 1)
        }
        h0s = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            for s in shingles
        ]
        expected = [
            min((a * h + b) % MINHASH_PRIME for h in h0s)
            for a, b in consts
        ]
        assert list(sigs[doc_id]) == expected


def test_simhash_portable_matches_python_recompute(spark, docs):
    import hashlib

    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash_64(docs, n_bits=60, hash_fn="md5").collect()
    }
    for doc_id, text in [(0, "the quick brown fox jumps over the lazy dog"),
                         (2, "completely different content about spark engines")]:
        votes = [0] * 60
        for tok in text.split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for j in range(60):
                votes[j] += 1 if (h >> j) & 1 else -1
        expected = sum(1 << j for j in range(60) if votes[j] > 0)
        assert sigs[doc_id] == expected


def test_simhash(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_64(docs).collect()}
    assert sigs[0] == sigs[3]
    mask = (1 << 64) - 1
    ham01 = bin((sigs[0] ^ sigs[1]) & mask).count("1")
    ham02 = bin((sigs[0] ^ sigs[2]) & mask).count("1")
    assert ham01 < ham02


def test_simhash_near_pairs(spark, docs):
    pairs = simhash_near_pairs(docs, max_hamming=16).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got[(0, 3)] == 0


def test_scrub_pii(spark):
    from xyzpy_spark.pipeline.text import scrub_pii

    df = spark.createDataFrame(
        [(0, "mail me at jane.doe+x@example.co.uk or call +1 555 123 4567"),
         (1, "server at 192.168.1.100 responded"),
         (2, "nothing sensitive here")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert "<PII:email>" in rows[0]["text"]
    assert "jane" not in rows[0]["text"]
    assert "<PII:phone>" in rows[0]["text"]
    assert rows[0]["n_email"] == 1 and rows[0]["n_phone"] == 1
    assert rows[1]["text"] == "server at <PII:ipv4> responded"
    assert rows[1]["n_ipv4"] == 1
    assert rows[2]["text"] == "nothing sensitive here"
    assert rows[2]["n_email"] == rows[2]["n_ipv4"] == rows[2]["n_phone"] == 0


def test_decontaminate(spark):
    from xyzpy_spark.pipeline.text import contamination_hits, decontaminate

    train = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"),   # contains eval 4-gram
         (1, "one two three four five six seven"),
         (2, "totally unrelated training content here")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "beta gamma delta epsilon"),
         (101, "unseen benchmark prompt text")],
        ["doc_id", "text"],
    )
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_hits(train, ev, n=4).collect()
    }
    assert hits == {0: 1}
    clean = decontaminate(train, ev, n=4)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]


def test_decontaminate_bloom_parity(spark):
    """The scale path (r10 verdict ask #1): decontaminate(via='bloom')
    vs the exact broadcast form on the same corpus.  The Bloom filter
    can only OVER-drop (bounded false-positive rate, ~(k·n/m)^k —
    vanishing at m=2^20 over the test corpus's gram count and
    deterministic via the portable md5 hash family): bloom survivors
    must be a subset of broadcast survivors, every truly contaminated
    doc is dropped by BOTH, and on this corpus the difference is
    empty."""
    from xyzpy_spark.pipeline.text import decontaminate

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 10 != 0)
    ev = docs.where(F.col("doc_id") % 10 == 0)
    exact = {
        r["doc_id"]
        for r in decontaminate(train, ev, n=5).select("doc_id").collect()
    }
    bloom = {
        r["doc_id"]
        for r in decontaminate(train, ev, n=5, via="bloom")
        .select("doc_id")
        .collect()
    }
    n_train = train.count()
    assert bloom <= exact                      # never under-drops
    fp_dropped = exact - bloom                 # FP over-drops only
    assert len(fp_dropped) <= max(1, n_train // 50), (
        f"bloom over-dropped {len(fp_dropped)}/{n_train}"
    )
    assert fp_dropped == set()  # at 2^20 bits this corpus has no FPs

    with pytest.raises(ValueError, match="via"):
        decontaminate(train, ev, via="teleport")


def _substring_spans_twin(docs, k, min_repeat, keep_first):
    """Independent pure-python model of duplicate_substring_spans."""
    toks = {d: t.split() for d, t in docs.items()}
    occ = {}
    for d in sorted(toks):
        for p in range(len(toks[d]) - k + 1):
            occ.setdefault(" ".join(toks[d][p:p + k]), []).append((d, p))
    marked = set()
    for g, places in occ.items():
        if len(places) < min_repeat:
            continue
        winner = min(places)
        for dp in places:
            if keep_first and dp == winner:
                continue
            marked.add(dp)
    ivals = sorted((d, p, p + k - 1) for d, p in marked)
    spans = []
    for d, s, e in ivals:
        if spans and spans[-1][0] == d and s <= spans[-1][2] + 1:
            spans[-1][2] = max(spans[-1][2], e)
        else:
            spans.append([d, s, e])
    return {(d, s, e, e - s + 1) for d, s, e in spans}


def test_duplicate_substring_spans_matches_twin(spark):
    """Substring-level dedup (k-token duplicated windows merged to
    maximal spans) matches an independent pure-python model, for both
    keep_first and audit modes."""
    from xyzpy_spark.pipeline.dedup import duplicate_substring_spans

    boiler = "subscribe to our newsletter for the latest updates"
    docs = {
        1: f"alpha beta gamma {boiler} delta epsilon",
        2: f"one two {boiler} three four {boiler} five",
        3: "unique words only in this document here",
        4: f"{boiler}",
        5: "rep rep rep rep rep rep rep rep rep rep rep",
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    for keep_first in (True, False):
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in duplicate_substring_spans(
                df, k=5, keep_first=keep_first
            ).collect()
        }
        want = _substring_spans_twin(docs, 5, 2, keep_first)
        assert got == want, (keep_first, got ^ want)
    assert len(want) > 0

    # the petabyte-scale hash_grams mode (8-byte shuffle keys instead
    # of window text) finds the same spans
    hashed = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_substring_spans(
            df, k=5, hash_grams=True
        ).collect()
    }
    assert hashed == _substring_spans_twin(docs, 5, 2, True)


def test_strip_duplicate_spans_first_copy_survives(spark):
    """strip keeps exactly the first occurrence of each duplicated
    region and reassembles the rest in order; token counts reconcile."""
    from xyzpy_spark.pipeline.dedup import strip_duplicate_spans

    boiler = "all rights reserved contact us today"
    df = spark.createDataFrame(
        [
            (1, f"intro text {boiler} outro"),
            (2, f"{boiler} something else entirely different here"),
            (3, "no duplication in this one at all"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.text, r.n_removed_tokens)
        for r in strip_duplicate_spans(df, k=6).collect()
    }
    # doc 1 is the winner (min doc, pos) — keeps the boilerplate
    assert out[1] == (f"intro text {boiler} outro", 0)
    assert out[2] == ("something else entirely different here", 6)
    assert out[3] == ("no duplication in this one at all", 0)
    assert out[4] == ("", 0)


def test_dedup_paragraphs(spark):
    from xyzpy_spark.pipeline.dedup import dedup_paragraphs

    df = spark.createDataFrame(
        [(0, "shared boilerplate\nunique to zero"),
         (1, "shared boilerplate\nunique to one"),
         (2, "shared boilerplate")],   # nothing left after dedup
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["text"] for r in dedup_paragraphs(df).collect()}
    assert rows[0] == "shared boilerplate\nunique to zero"
    assert rows[1] == "unique to one"
    assert rows[2] == ""


def test_dedup_paragraphs_keeps_intra_doc_order(spark):
    from xyzpy_spark.pipeline.dedup import dedup_paragraphs

    df = spark.createDataFrame(
        [(5, "z last\na first\nz last")],  # intra-doc repeat collapses
        ["doc_id", "text"],
    )
    rows = dedup_paragraphs(df).collect()
    assert rows[0]["text"] == "z last\na first"


def test_dedup_paragraphs_matches_python_model(spark):
    """Property: against random corpora from a tiny paragraph
    alphabet, dedup_paragraphs == the obvious sequential model
    (first (doc,pos) occurrence wins, docs reassemble in order)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xyzpy_spark.pipeline.dedup import dedup_paragraphs

    alphabet = ["aa bb", "cc", "dd ee ff", "gg", "hh ii"]
    corpus_strategy = st.lists(
        st.lists(st.sampled_from(alphabet), min_size=0, max_size=5),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=8, deadline=None)
    @given(corpus_strategy)
    def run(corpus):
        docs = [(i, "\n".join(ps)) for i, ps in enumerate(corpus)]
        seen = set()
        expect = {}
        for i, ps in enumerate(corpus):
            kept = []
            for p in ps:
                if p and p not in seen:
                    seen.add(p)
                    kept.append(p)
            expect[i] = "\n".join(kept)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r["doc_id"]: r["text"] for r in dedup_paragraphs(df).collect()
        }
        assert got == expect

    run()


def test_dedup_clusters(spark):
    """Pairs -> connected duplicate groups (chain + triangle + isolate)."""
    from xyzpy_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1,          # 4-chain collapses to min id
        10: 10, 11: 10, 12: 10,           # triangle
        20: 20, 21: 20,                   # pair
    }


def test_dedup_clusters_deep_chain_with_checkpoint(spark):
    """A 14-node path needs 13 propagation rounds — crosses the
    localCheckpoint boundary twice and must still reach the fixpoint."""
    from xyzpy_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(13)], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, max_iter=30).collect()
    }
    assert out == {i: 0 for i in range(14)}


def test_dedup_clusters_shortcut_converges_deep_chain(spark):
    """Pointer-jumping (path halving) makes convergence O(log d): a
    60-link chain — which would exceed max_iter=20 in pure label
    propagation and split — converges cleanly with the default
    shortcut, with the same labels the slow path produces."""
    import warnings

    from xyzpy_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], ["id_a", "id_b"]
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup_clusters(pairs, max_iter=20).collect()
        }
    assert out == {i: 0 for i in range(61)}
    # the non-shortcut path on the same graph needs > 20 rounds
    with pytest.warns(RuntimeWarning, match="max_iter"):
        dedup_clusters(pairs, max_iter=20, shortcut=False).collect()


def test_dedup_clusters_warns_on_non_convergence(spark):
    from xyzpy_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["id_a", "id_b"]
    )
    with pytest.warns(RuntimeWarning, match="max_iter"):
        dedup_clusters(pairs, max_iter=2).collect()


def test_dedup_clusters_from_real_pairs(spark, docs):
    from xyzpy_spark.pipeline.dedup import dedup_clusters

    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    clusters = dedup_clusters(pairs).collect()
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    assert {0, 1, 3} in list(by_cluster.values())  # 0,1,3 are one group


def test_embedding_cosine_pairs(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.999, 0.04, 0.0]),  # near dup of 0
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows)
    pairs = embedding_cosine_pairs(df, threshold=0.95).collect()
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in pairs}
    assert list(got) == [(0, 1)]
    assert got[(0, 1)] > 0.99


def test_cosine_topk_vs_numpy(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    out = cosine_topk(emb, queries, k=5).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rank"], r["nbr_id"]))
    # numpy brute force
    pdf = emb.toPandas().sort_values("vec_id")
    M = np.array(pdf["embedding"].tolist(), dtype=float)
    ids = pdf["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn @ Mn.T
    for q in range(3):
        order = [
            ids[j]
            for j in sorted(
                range(len(ids)),
                key=lambda j: (-round(sims[q, j], 12), ids[j]),
            )
            if ids[j] != q
        ][:5]
        mine = [n for _, n in sorted(got[q])]
        assert mine == list(order), f"query {q}: {mine} vs {order}"


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    assigned, cents = ivf_build(emb, n_cells=8)
    assigned = assigned.persist()
    approx = ivf_topk(assigned, cents, queries, k=5, nprobe=4).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["nbr_id"])
    ap = {}
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["nbr_id"])
    recalls = [
        len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex
    ]
    assert sum(recalls) / len(recalls) > 0.5  # nprobe=4 of 8 cells


def test_pq_topk_recall_and_rerank_exactness(spark):
    """PQ asymmetric scan + exact re-rank: shortlist recall >= 0.95
    vs brute-force cosine top-5 (the r5-verdict scale-tier bar), and
    every returned cosine must equal the EXACT cosine (re-rank means
    PQ error can only cost recall, never score accuracy)."""
    from xyzpy_spark.pipeline.similarity import pq_build, pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    coded, cbs = pq_build(emb, m=16, ksub=16)
    coded = coded.persist()
    approx = pq_topk(coded, cbs, queries, k=5, shortlist=100).collect()
    ex, exc = {}, {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["nbr_id"])
        exc[(r["query_id"], r["nbr_id"])] = r["cosine"]
    ap = {}
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["nbr_id"])
        if (r["query_id"], r["nbr_id"]) in exc:
            assert r["cosine"] == exc[(r["query_id"], r["nbr_id"])]
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    coded.unpersist()
    assert sum(recalls) / len(recalls) >= 0.95, recalls
    # 64 floats (256 B) -> 16 codes: the compressed representation
    assert len(approx[0]) == 4  # query_id, nbr_id, rank, cosine


def test_ivf_pq_topk_recall(spark):
    """The composed billion-vector plan (IVF cell pruning x PQ
    compressed scoring x exact re-rank): recall vs brute force must
    be bounded below by the IVF probe recall (PQ with a generous
    shortlist inside probed cells loses nothing more), and returned
    cosines are exact."""
    from xyzpy_spark.pipeline.similarity import (
        ivf_build,
        ivf_pq_topk,
        ivf_topk,
        pq_build,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    assigned, cents = ivf_build(emb, n_cells=8)
    coded, cbs = pq_build(assigned, m=16, ksub=16)
    coded = coded.persist()
    got = ivf_pq_topk(
        coded, cents, cbs, queries, k=5, nprobe=4, shortlist=100
    ).collect()
    ivf_only = ivf_topk(coded, cents, queries, k=5, nprobe=4).collect()

    def recall(rows):
        ex, ap = {}, {}
        for r in exact:
            ex.setdefault(r["query_id"], set()).add(r["nbr_id"])
        for r in rows:
            ap.setdefault(r["query_id"], set()).add(r["nbr_id"])
        rs = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
        return sum(rs) / len(rs)

    r_composed, r_ivf = recall(got), recall(ivf_only)
    coded.unpersist()
    assert r_composed >= r_ivf - 0.05, (r_composed, r_ivf)
    exc = {(r["query_id"], r["nbr_id"]): r["cosine"] for r in exact}
    for r in got:
        if (r["query_id"], r["nbr_id"]) in exc:
            assert r["cosine"] == exc[(r["query_id"], r["nbr_id"])]


def test_save_load_pq_ivf_roundtrip(spark, tmp_path):
    """ANN index artifacts (train once, serve every snapshot):
    reloaded codebooks/centroids are float-identical, the reloaded
    model searches identically, and a missing commit marker (meta/)
    fails load loudly instead of serving half-written artifacts."""
    import shutil

    from xyzpy_spark.pipeline.similarity import (
        ivf_build,
        load_ivf,
        load_pq,
        pq_build,
        pq_topk,
        save_ivf,
        save_pq,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned, cents = ivf_build(emb, n_cells=8, kmeans_iters=1)
    coded, cbs = pq_build(emb, m=16, ksub=16, kmeans_iters=1)

    pq_path = str(tmp_path / "pq")
    ivf_path = str(tmp_path / "ivf")
    save_pq(spark, cbs, pq_path)
    save_ivf(spark, cents, ivf_path)
    assert load_pq(spark, pq_path) == cbs
    assert load_ivf(spark, ivf_path) == cents

    queries = emb.where(F.col("vec_id") < 3)
    a = pq_topk(coded, cbs, queries, k=3, shortlist=20).collect()
    b = pq_topk(
        coded, load_pq(spark, pq_path), queries, k=3, shortlist=20
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # overwrite is marker-first: a model missing meta/ must not load
    shutil.rmtree(pq_path + "/meta")
    with pytest.raises(Exception):
        load_pq(spark, pq_path)
    # and a fresh save over the broken dir heals it
    save_pq(spark, cbs, pq_path)
    assert load_pq(spark, pq_path) == cbs


def test_pq_build_validates_params(spark):
    from xyzpy_spark.pipeline.similarity import pq_build

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError, match="divisible"):
        pq_build(emb, m=7)
    with pytest.raises(ValueError, match="m >= 1"):
        pq_build(emb, m=0)


def test_ivf_kmeans_refinement_tightens_cells(spark):
    """Lloyd iterations must (a) be deterministic and (b) not lose
    within-cell cosine tightness vs the sample-only seed centroids."""
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def mean_best_sim(iters):
        assigned, cents = ivf_build(emb, n_cells=8, kmeans_iters=iters)
        rows = assigned.select("cell", "embedding").collect()
        c = np.array(cents)
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
        sims = []
        for r in rows:
            v = np.array(r["embedding"], dtype=float)
            sims.append(float(c[r["cell"]] @ v / np.linalg.norm(v)))
        return sum(sims) / len(sims)

    s0, s2 = mean_best_sim(0), mean_best_sim(2)
    assert s2 >= s0 - 1e-9  # refinement never hurts assignment quality
    # determinism: same seed + iters -> identical centroids
    _, a = ivf_build(emb, n_cells=8, kmeans_iters=2)
    _, b = ivf_build(emb, n_cells=8, kmeans_iters=2)
    assert a == b


def test_multimodal_meta(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], ["doc_id"])
    with_media = attach_fake_media(df)
    meta = extract_media_meta(with_media).collect()
    for r in meta:
        assert r["meta"]["format"] == "xyzf"
        assert r["meta"]["width"] == 64 + (r["doc_id"] * 37) % 512
        assert r["meta"]["n_bytes"] == len(fake_media_bytes(r["doc_id"]))


def test_decode_media_wav_and_ppm(spark):
    """Real byte-level decode: WAV chunk walk + PPM header scan agree
    with an independent pure-python recomputation."""
    from xyzpy_spark.pipeline.multimodal import (
        attach_sample_media,
        decode_media,
        fake_ppm_bytes,
        fake_wav_bytes,
    )

    df = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    rows = {
        r["doc_id"]: r["decoded"]
        for r in decode_media(attach_sample_media(df)).collect()
    }
    for i in range(8):
        d = rows[i]
        if i % 2 == 0:  # wav
            n = (32 + i % 17) * (1 + i % 2)
            samples = [(i * 31 + k * 7) % 2003 - 1001 for k in range(n)]
            assert d["format"] == "wav"
            assert d["sample_rate"] == 8000 + (i % 5) * 1000
            assert d["channels"] == 1 + i % 2
            assert d["n_values"] == n
            assert abs(d["mean_value"] - sum(samples) / n) < 1e-12
            assert d["width"] is None
        else:  # ppm
            w, h = 4 + i % 9, 3 + i % 7
            pix = [(i * 17 + k * 11) % 256 for k in range(3 * w * h)]
            assert d["format"] == "ppm"
            assert (d["width"], d["height"]) == (w, h)
            assert d["n_values"] == 3 * w * h
            assert abs(d["mean_value"] - sum(pix) / len(pix)) < 1e-12
            assert d["sample_rate"] is None


def test_decode_media_handles_garbage_and_nulls(spark):
    from xyzpy_spark.pipeline.multimodal import decode_media

    df = spark.createDataFrame(
        [(0, b"not a media file"), (1, b""), (2, None),
         (3, b"RIFF\x04\x00\x00\x00WAVE"),  # valid RIFF, no chunks
         (4, b"P6\nbogus header")],
        ["doc_id", "media"],
    )
    rows = {r["doc_id"]: r["decoded"] for r in decode_media(df).collect()}
    for i in range(5):
        assert rows[i]["format"] is None
        assert rows[i]["mean_value"] is None


def test_decode_media_parses_foreign_wav_and_ppm(spark):
    """Files NOT produced by our own generators (extra chunk, PPM
    comment line) still decode — proves the parser isn't fake-shaped."""
    import struct

    from xyzpy_spark.pipeline.multimodal import decode_media

    samples = [100, -200, 300, -400]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 4 + 8 + 16 + 8 + len(data))
        + b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"  # extra chunk to skip
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    ppm = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
    df = spark.createDataFrame([(0, wav), (1, ppm)], ["doc_id", "media"])
    rows = {r["doc_id"]: r["decoded"] for r in decode_media(df).collect()}
    assert rows[0]["format"] == "wav"
    assert rows[0]["sample_rate"] == 44100
    assert rows[0]["channels"] == 2
    assert rows[0]["n_values"] == 4
    assert abs(rows[0]["mean_value"] - sum(samples) / 4) < 1e-12
    assert rows[1]["format"] == "ppm"
    assert (rows[1]["width"], rows[1]["height"]) == (2, 2)
    assert abs(rows[1]["mean_value"] - sum(range(12)) / 12) < 1e-12


def test_multimodal_frame_sample(spark):
    df = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    frames = frame_sample(attach_fake_media(df), every_n_bytes=8).collect()
    assert len(frames) > 2  # fan-out happened
    assert all(r["frame_offset"] % 8 == 0 for r in frames)


def test_resize_image_nearest_neighbor(spark):
    """Nearest-neighbor resize matches the integer floor-mapping rule
    exactly (numpy twin) for PPM and PNG payloads; garbage yields a
    null struct."""
    import numpy as np

    from xyzpy_spark.pipeline.multimodal import (
        fake_png_bytes,
        fake_ppm_bytes,
        resize_image,
    )

    payloads = {1: fake_ppm_bytes(1), 2: fake_png_bytes(2), 3: b"junk"}
    df = spark.createDataFrame(
        list(payloads.items()), ["doc_id", "media"]
    )
    out = {
        r.doc_id: r.resized
        for r in resize_image(df, 4, 4).collect()
    }
    for i, maker in ((1, 17), (2, 13)):
        w, h = 4 + i % 9, 3 + i % 7
        src = np.array(
            [(i * maker + k * 5 if maker == 13 else i * maker + k * 11) % 256
             for k in range(3 * w * h)]
        ).reshape(h, w, 3)
        ys = (np.arange(4) * h) // 4
        xs = (np.arange(4) * w) // 4
        want = src[np.ix_(ys, xs)].reshape(-1).tolist()
        got = out[i]
        assert (got.width, got.height, got.channels) == (4, 4, 3)
        assert got.pixels == want, i
    assert out[3] is None
    with pytest.raises(ValueError, match="target size"):
        resize_image(df, 0, 4)


def test_resize_and_features_hostile_payloads(spark):
    """Truncated/hostile media must yield null structs, never a task
    failure: a TRUNCATED PPM (header says 6x5, body short), an empty
    PPM body, a truncated WAV data chunk, and raw garbage."""
    from xyzpy_spark.pipeline.multimodal import (
        audio_features,
        fake_ppm_bytes,
        fake_wav_bytes,
        image_features,
        resize_image,
    )

    good_ppm = fake_ppm_bytes(2)
    truncated_ppm = good_ppm[:-7]
    empty_body = b"P6\n4 3\n255\n"
    garbage = b"\x00" * 64
    df = spark.createDataFrame(
        [
            (1, truncated_ppm),
            (2, empty_body),
            (3, garbage),
            (4, good_ppm),
        ],
        ["doc_id", "media"],
    )
    rz = {r.doc_id: r.resized for r in resize_image(df, 3, 3).collect()}
    assert rz[1] is None and rz[2] is None and rz[3] is None
    assert rz[4] is not None and len(rz[4].pixels) == 27
    ft = {r.doc_id: r.img for r in image_features(df).collect()}
    assert ft[1] is None and ft[2] is None and ft[3] is None
    assert ft[4] is not None

    good_wav = fake_wav_bytes(2)
    adf = spark.createDataFrame(
        [(1, good_wav[:20]), (2, garbage), (3, good_wav)],
        ["doc_id", "media"],
    )
    au = {r.doc_id: r.audio for r in audio_features(adf).collect()}
    assert au[1] is None and au[2] is None and au[3] is not None

    # truncated 16-BIT ppm with an odd-length body: frombuffer on an
    # odd byte count would raise — must yield null, not a task failure
    odd16 = b"P6\n1 1\n65535\n" + b"\x01\x02\x03\x04\x05"
    df16 = spark.createDataFrame([(1, odd16)], ["doc_id", "media"])
    assert resize_image(df16, 2, 2).first().resized is None
    assert image_features(df16).first().img is None


def test_image_and_audio_features_closed_form(spark):
    """Feature extractors reproduce the closed-form statistics of the
    fake payloads exactly (int sums; IEEE-rounded mean/std/rms)."""
    import math

    from xyzpy_spark.pipeline.multimodal import (
        audio_features,
        fake_ppm_bytes,
        fake_wav_bytes,
        image_features,
    )

    i = 6
    w, h = 4 + i % 9, 3 + i % 7
    vals = [(i * 17 + k * 11) % 256 for k in range(3 * w * h)]
    n, s, sq = len(vals), sum(vals), sum(v * v for v in vals)
    df = spark.createDataFrame([(i, fake_ppm_bytes(i))], ["doc_id", "media"])
    img = image_features(df).collect()[0].img
    assert (img.width, img.height, img.channels, img.n_pixels) == (w, h, 3, n)
    assert img.mean_pixel == s / n
    assert img.std_pixel == math.sqrt((n * sq - s * s) / (n * n))
    for c in range(3):
        ch_vals = vals[c::3]
        assert img.channel_means[c] == sum(ch_vals) / len(ch_vals)

    j = 4  # even seed -> 1 channel; odd -> 2
    nv = (32 + j % 17) * (1 + j % 2)
    samples = [(j * 31 + t * 7) % 2003 - 1001 for t in range(nv)]
    adf = spark.createDataFrame(
        [(j, fake_wav_bytes(j)), (9, None)], ["doc_id", "media"]
    )
    rows = {r.doc_id: r.audio for r in audio_features(adf).collect()}
    a = rows[j]
    assert (a.sample_rate, a.channels, a.n_samples) == (
        8000 + (j % 5) * 1000, 1 + j % 2, nv
    )
    assert a.peak == max(abs(v) for v in samples)
    assert a.zero_crossings == sum(
        1 for p, q in zip(samples, samples[1:]) if p * q < 0
    )
    assert a.rms == math.sqrt(sum(v * v for v in samples) / nv)
    assert rows[9] is None


def test_decode_image_png_native(spark):
    """decode_image decodes non-interlaced 8-bit PNG without any
    imaging library: stdlib zlib inflate + all 5 scanline filters
    (fake_png_bytes cycles filter type per row), pixels closed-form."""
    from xyzpy_spark.pipeline.multimodal import fake_png_bytes

    ids = list(range(10))  # seeds 0..9 cover every filter type
    df = spark.createDataFrame(
        [(i, fake_png_bytes(i)) for i in ids], ["doc_id", "media"]
    )
    rows = {r["doc_id"]: r["pixels"] for r in decode_image(df).collect()}
    for i in ids:
        w, h = 4 + i % 9, 3 + i % 7
        want = [(i * 13 + k * 5) % 256 for k in range(3 * w * h)]
        assert rows[i] == want, i


def test_decode_image_fallbacks(spark):
    """PPM decodes natively; unknown formats yield null pixels (no
    scan-killing raise) when no imaging library is installed."""
    ppm = b"P6\n2 1\n255\n" + bytes(range(6))
    df = spark.createDataFrame(
        [(0, ppm), (1, b"\xff\xd8 not really a jpeg")],
        ["doc_id", "media"],
    )
    rows = {r["doc_id"]: r["pixels"] for r in decode_image(df).collect()}
    assert rows[0] == list(range(6))
    try:
        import PIL  # noqa: F401
    except ImportError:
        assert rows[1] is None


def test_decode_png_hostile_inputs():
    """Malformed PNGs must parse to None, never raise: bad magic,
    corrupt CRC, truncated IDAT, bad filter byte, unsupported
    profiles (16-bit / interlaced)."""
    import struct
    import zlib

    from xyzpy_spark.pipeline.multimodal import (
        _PNG_SIG,
        _parse_png,
        fake_png_bytes,
    )

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    assert _parse_png(b"not a png") is None
    assert _parse_png(_PNG_SIG) is None  # signature only
    good = fake_png_bytes(4)
    assert _parse_png(good) is not None
    bad = bytearray(good)
    bad[40] ^= 0xFF  # corrupt IDAT -> CRC mismatch
    assert _parse_png(bytes(bad)) is None
    assert _parse_png(good[: len(good) // 2]) is None  # truncated
    # bad filter byte (5) with valid CRCs
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    raw = b"\x05" + bytes(3)
    evil = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(raw)
    ) + chunk(b"IEND", b"")
    assert _parse_png(evil) is None
    # unsupported: 16-bit depth and Adam7 interlace
    for ihdr_bad in (
        struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0),
        struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1),
    ):
        evil = _PNG_SIG + chunk(b"IHDR", ihdr_bad) + chunk(
            b"IDAT", zlib.compress(b"\x00" + bytes(6))
        ) + chunk(b"IEND", b"")
        assert _parse_png(evil) is None
    # IDAT that zlib can't inflate
    evil = _PNG_SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    ) + chunk(b"IDAT", b"garbage") + chunk(b"IEND", b"")
    assert _parse_png(evil) is None


def test_decode_media_png(spark):
    """decode_media picks up PNG alongside WAV/PPM with exact stats."""
    from xyzpy_spark.pipeline.multimodal import fake_png_bytes

    from xyzpy_spark.pipeline.multimodal import decode_media

    df = spark.createDataFrame(
        [(7, fake_png_bytes(7))], ["doc_id", "media"]
    )
    r = decode_media(df).collect()[0]["decoded"]
    w, h = 4 + 7 % 9, 3 + 7 % 7
    want = [(7 * 13 + k * 5) % 256 for k in range(3 * w * h)]
    assert r["format"] == "png"
    assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
    assert r["n_values"] == len(want)
    assert abs(r["mean_value"] - sum(want) / len(want)) < 1e-12


def test_embedding_lsh_pairs_planted_duplicates(spark):
    """LSH candidates + exact refine: finds planted near-dups (recall)
    with exact precision, without the O(n^2) pair scan."""
    import numpy as np
    import pandas as pd

    from xyzpy_spark.pipeline.dedup import (
        embedding_cosine_pairs,
        embedding_lsh_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 32))
    # 40 planted pairs: vec + tiny noise -> cosine ~0.99
    dups = base + 0.05 * rng.standard_normal((40, 32))
    noise = rng.standard_normal((400, 32))
    vecs = np.vstack([base, dups, noise])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype="int64"),
         "embedding": [v.astype("float32") for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    got = embedding_lsh_pairs(df, threshold=0.9, n_bits=64, bands=16)
    got_pairs = {(r.id_a, r.id_b) for r in got.collect()}
    exact = embedding_cosine_pairs(df, threshold=0.9)
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    assert len(exact_pairs) >= 40           # the planted pairs are there
    assert got_pairs <= exact_pairs          # refine => exact precision
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.95, recall


def test_embedding_lsh_max_bucket_size_guard(spark):
    """The ``max_bucket_size`` cap (scale guard against degenerate
    band-buckets) keeps planted-dup recall at the design threshold —
    near-dups collide in several bands, oversized buckets are mass
    regions — while a duplicated mass blob that would otherwise go
    quadratic is excluded from candidate generation."""
    import numpy as np
    import pandas as pd

    from xyzpy_spark.pipeline.dedup import (
        embedding_cosine_pairs,
        embedding_lsh_pairs,
        embedding_lsh_pairs_portable,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((30, 32))
    dups = base + 0.05 * rng.standard_normal((30, 32))
    # a degenerate mass region: 300 copies of one direction + noise,
    # all falling into the same band-buckets (the quadratic trap)
    blob_dir = rng.standard_normal(32)
    blob = blob_dir + 0.3 * rng.standard_normal((300, 32))
    noise = rng.standard_normal((200, 32))
    vecs = np.vstack([base, dups, noise, blob])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype="int64"),
         "embedding": [v.astype("float32") for v in vecs]}
    )
    df = spark.createDataFrame(pdf)

    capped = embedding_lsh_pairs(
        df, threshold=0.9, n_bits=64, bands=16, max_bucket_size=40
    )
    got_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    exact = embedding_cosine_pairs(df, threshold=0.9)
    planted = {
        (r.id_a, r.id_b) for r in exact.collect()
        if r.id_a < 60 and r.id_b < 60
    }
    assert len(planted) >= 30
    assert got_pairs <= {(r.id_a, r.id_b) for r in exact.collect()}
    recall = len(got_pairs & planted) / len(planted)
    assert recall >= 0.95, recall

    # portable twin accepts the same guard and keeps exact precision
    p = embedding_lsh_pairs_portable(
        df, threshold=0.9, bands=16, max_bucket_size=40
    )
    assert {(r.id_a, r.id_b) for r in p.collect()} <= {
        (r.id_a, r.id_b) for r in exact.collect()
    }

    with pytest.raises(ValueError, match="max_bucket_size"):
        embedding_lsh_pairs(df, max_bucket_size=1).collect()


def test_embedding_lsh_portable_matches_float_semantics(spark):
    """The portable integer-quantized LSH mode must (a) keep exact
    precision vs the quantized cosine threshold, (b) recall the
    planted near-dups, and (c) be invariant to partitioning — the
    properties the DuckDB oracle relies on."""
    import numpy as np
    import pandas as pd

    from xyzpy_spark.pipeline.dedup import (
        embedding_cosine_pairs,
        embedding_lsh_pairs_portable,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 32))
    dups = base + 0.05 * rng.standard_normal((40, 32))
    noise = rng.standard_normal((400, 32))
    vecs = np.vstack([base, dups, noise])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype="int64"),
         "embedding": [v.astype("float32") for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    got = embedding_lsh_pairs_portable(
        df, threshold=0.9, n_bits=64, bands=16
    )
    got_pairs = {(r.id_a, r.id_b): r.cosine for r in got.collect()}
    exact = embedding_cosine_pairs(df, threshold=0.9)
    exact_pairs = {(r.id_a, r.id_b): r.cosine for r in exact.collect()}
    # quantization error at 2^20 is ~1e-6 relative: cosines agree to 1e-4
    common = set(got_pairs) & set(exact_pairs)
    recall = len(common) / len(exact_pairs)
    assert recall >= 0.95, recall
    for p in common:
        assert abs(got_pairs[p] - exact_pairs[p]) < 1e-4
    # partitioning invariance (integer arithmetic is order-free)
    again = embedding_lsh_pairs_portable(
        df.repartition(7), threshold=0.9, n_bits=64, bands=16
    )
    assert {(r.id_a, r.id_b): r.cosine
            for r in again.collect()} == got_pairs


def test_ivf_topk_portable_recall_and_determinism(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ivf_topk_portable(
        emb, queries, k=5, n_cells=8, nprobe=4
    ).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["nbr_id"])
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["nbr_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) > 0.5  # nprobe=4 of 8 cells
    # full probe == exact brute force (quantized ranking, same data)
    full = ivf_topk_portable(
        emb, queries, k=5, n_cells=8, nprobe=8
    ).collect()
    fl = {}
    for r in full:
        fl.setdefault(r["query_id"], set()).add(r["nbr_id"])
    full_recalls = [len(ex[q] & fl[q]) / len(ex[q]) for q in ex]
    assert sum(full_recalls) / len(full_recalls) >= 0.9
    # partitioning invariance
    again = ivf_topk_portable(
        emb.repartition(13), queries, k=5, n_cells=8, nprobe=4
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, approx))


def test_sample_token_budget_exact_matches_twin(spark):
    """Exact mode keeps, per stratum, the hash-ordered prefix of docs
    whose cumulative token count starts before the budget — verified
    against an independent python model of the same md5 arithmetic."""
    import hashlib

    from xyzpy_spark.pipeline.sampling import sample_token_budget

    rows = [
        (i, ["web", "code", "books"][i % 3], 5 + (i * 7) % 40)
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")

    def unit(key):
        h = int(hashlib.md5(f"{key}budget".encode()).hexdigest()[:8], 16)
        return h / 4294967296.0

    budgets = {"web": 200, "code": 1}
    want = set()
    for src in ["web", "code", "books"]:
        docs = sorted(
            (r for r in rows if r[1] == src),
            key=lambda r: (unit(r[0]), r[0]),
        )
        if src not in budgets:
            want |= {r[0] for r in docs}
            continue
        cum = 0
        for r in docs:
            if cum < budgets[src]:
                want.add(r[0])
            cum += r[2]
    got = {
        r.doc_id
        for r in sample_token_budget(df, budgets, exact=True).collect()
    }
    assert got == want
    # at least one doc per budgeted stratum, budget overshoot bounded
    kept = [r for r in rows if r[0] in got and r[1] == "web"]
    assert sum(r[2] for r in kept) >= 200
    assert len([r for r in rows if r[0] in got and r[1] == "code"]) == 1


def test_sample_token_budget_expected_mode(spark):
    """Expected mode (the scale path): map-only hash filter with
    ratio budget/total — deterministic, unbudgeted strata kept whole,
    token yield concentrates around the budget."""
    from xyzpy_spark.pipeline.sampling import sample_token_budget

    rows = [(i, "web" if i < 900 else "books", 10) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    out = sample_token_budget(df, {"web": 3000}).collect()
    books = [r for r in out if r.source == "books"]
    assert len(books) == 100  # kept whole
    web_tokens = sum(r.n_tokens for r in out if r.source == "web")
    assert 2000 <= web_tokens <= 4000  # expected 3000, concentrated
    # deterministic across runs
    again = sample_token_budget(df, {"web": 3000}).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in out}
    # budget >= total keeps everything
    allkept = sample_token_budget(df, {"web": 10**9}).collect()
    assert len(allkept) == 1000
    with pytest.raises(ValueError, match="token_col"):
        sample_token_budget(df.drop("n_tokens"), {"web": 10})

    # NULL stratum = unbudgeted: kept whole in BOTH modes (an inner
    # totals join would silently drop it — review r3)
    ndf = spark.createDataFrame(
        [(1, None, 10), (2, "web", 10), (3, None, 10)],
        "doc_id long, source string, n_tokens int",
    )
    for exact in (False, True):
        kept = {
            r.doc_id
            for r in sample_token_budget(
                ndf, {"web": 10**6}, exact=exact
            ).collect()
        }
        assert {1, 3} <= kept, (exact, kept)

    # fractional budgets must not truncate to zero in exact mode
    frac = sample_token_budget(df, {"web": 0.5}, exact=True).collect()
    assert len([r for r in frac if r.source == "web"]) == 1


def test_mix_corpora_multiplicities(spark):
    from xyzpy_spark.pipeline.sampling import mix_corpora

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    out = mix_corpora(
        docs, "doc_id", "source",
        {"src0": 2.5, "src1": 0.25, "src2": 0.0},
        default=1.0,
    )
    pdf = out.toPandas()
    counts = pdf.groupby("doc_id").size()
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    n_src0_docs = n_src0_copies = 0
    for doc_id, c in counts.items():
        s = src[doc_id]
        if s == "src0":
            assert c in (2, 3)
            n_src0_docs += 1
            n_src0_copies += c
        elif s == "src1":
            assert c == 1          # weight 0.25: only hash-selected rows
        else:
            assert s not in ("src2",)  # weight 0 rows never appear
            assert c == 1
    # copy_idx is a dense 0..c-1 range per doc
    for doc_id, g in pdf.groupby("doc_id"):
        assert sorted(g["copy_idx"]) == list(range(len(g)))
    # expected multiplicity ~2.5 for src0
    assert 2.0 < n_src0_copies / n_src0_docs < 3.0
    # deterministic under repartitioning
    again = mix_corpora(
        docs.repartition(11), "doc_id", "source",
        {"src0": 2.5, "src1": 0.25, "src2": 0.0},
        default=1.0,
    ).toPandas()
    key = lambda d: sorted(map(tuple, d[["doc_id", "copy_idx"]].values))
    assert key(again) == key(pdf)


def test_pack_sequences_chunk_model(spark):
    from xyzpy_spark.pipeline.packing import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = pack_sequences(docs, max_tokens=256, n_shards=4).toPandas()
    # python recompute of the concat-and-chunk layout per shard
    for shard, g in out.groupby("shard"):
        g = g.sort_values("doc_id")
        cum = 0
        for _, row in g.iterrows():
            assert row["seq_id"] == cum // 256
            assert row["seq_offset"] == cum % 256
            cum += row["n_tokens"]
    # partitioning invariance
    again = pack_sequences(
        docs.repartition(9), max_tokens=256, n_shards=4
    ).toPandas()
    key = lambda d: sorted(map(tuple, d.values))
    assert key(again) == key(out)


def test_pack_sequences_derives_n_shards(spark):
    """n_shards=None sizes the shard count to the session (2x default
    parallelism, floor 16) so the packing window stage can never be
    parallelism-starved by a forgotten knob (r10 verdict ask #7);
    explicit counts stay byte-reproducible (the gate-row contract)."""
    from xyzpy_spark.pipeline.packing import (
        _resolve_n_shards,
        pack_sequences,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    want = max(2 * spark.sparkContext.defaultParallelism, 16)
    assert _resolve_n_shards(docs, None) == want
    out = pack_sequences(docs, max_tokens=256, n_shards=None)
    n_shards_seen = out.select("shard").distinct().count()
    assert 0 < n_shards_seen <= want
    # derived == explicit at the same count: same layout bit-for-bit
    explicit = pack_sequences(docs, max_tokens=256, n_shards=want)
    key = lambda d: sorted(map(tuple, d.toPandas().values))
    assert key(out) == key(explicit)


def test_pack_sequences_greedy_model(spark):
    from xyzpy_spark.pipeline.packing import pack_sequences_greedy

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = pack_sequences_greedy(docs, max_tokens=256, n_shards=4).toPandas()
    for shard, g in out.groupby("shard"):
        g = g.sort_values("doc_id")
        # sequential python model: first-fit with reset
        seq = fill = 0
        for _, row in g.iterrows():
            n = row["n_tokens"]
            if fill and fill + n > 256:
                seq += 1
                fill = 0
            assert (row["seq_id"], row["seq_offset"]) == (seq, fill)
            fill += n
            if fill >= 256:
                seq += 1
                fill = 0
        # no sequence overflows unless it holds a single long doc
        sizes = g.groupby("seq_id").agg(
            total=("n_tokens", "sum"), n=("n_tokens", "count")
        )
        bad = sizes[(sizes.total > 256) & (sizes.n > 1)]
        assert bad.empty, bad


def test_embedding_lsh_buckets_shape(spark):
    import numpy as np
    import pandas as pd

    from xyzpy_spark.pipeline.dedup import embedding_lsh_buckets

    pdf = pd.DataFrame(
        {"vec_id": [0, 1], "embedding": [[1.0, 0.0], [0.0, 1.0]]}
    )
    out = embedding_lsh_buckets(
        spark.createDataFrame(pdf), n_bits=16, bands=4
    ).toPandas()
    assert len(out) == 8                     # bands rows per vector
    assert set(out.band) == {0, 1, 2, 3}
    assert (out.bucket >= 0).all() and (out.bucket < 16).all()  # 4 bits


def test_add_repetition_signals(spark):
    from xyzpy_spark.pipeline.text import add_repetition

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigram "a b" 3x of 5 bigrams
            (2, "x y z w"),           # no repetition
            (3, "l1\nl2\nl1"),       # one duplicated line
            (4, "solo"),              # single token: no bigrams
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in add_repetition(df).collect()}
    assert rows[1].dup_token_frac == pytest.approx(4 / 6)
    assert rows[1].top_token_frac == pytest.approx(0.5)
    assert rows[1].top_bigram_frac == pytest.approx(0.6)
    assert rows[2].dup_token_frac == 0.0
    assert rows[2].top_token_frac == pytest.approx(0.25)
    assert rows[3].dup_line_frac == pytest.approx(1 / 3)
    assert rows[4].top_bigram_frac is None
    assert rows[4].dup_line_frac == 0.0


def test_add_repetition_strategies_agree(spark):
    """Explode path (id present) and map-only path (id_col=None) must
    produce identical signal values."""
    from xyzpy_spark.pipeline.text import add_repetition
    from xyzpy_spark.plans.inspect import executed_plan, has_exchange
    from xyzpy_spark.sources.tables import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    cols = [
        "doc_id", "n_tokens", "dup_token_frac", "top_token_frac",
        "top_bigram_frac", "dup_line_frac",
    ]
    fast = {tuple(r) for r in add_repetition(docs).select(cols).collect()}
    slow = {
        tuple(r)
        for r in add_repetition(docs, id_col=None).select(cols).collect()
    }
    assert fast == slow
    # map-only path: zero exchanges; both paths: no Python
    maponly = add_repetition(docs, id_col=None)
    assert not has_exchange(maponly)
    for q in (maponly, add_repetition(docs)):
        plan = executed_plan(q)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- export: deterministic training shards -----------------------------


def test_write_training_shards_roundtrip(spark, tmp_path):
    import os

    from xyzpy_spark.pipeline.export import (
        read_training_shards,
        write_training_shards,
    )

    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "corpus")
    write_training_shards(df, out, key="id", n_shards=8)

    # 8 shard dirs, one data file each (single task per shard)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(dirs) == 8
    for d in dirs:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1

    back = read_training_shards(spark, out)
    assert back.count() == 1000
    assert {r.id for r in back.collect()} == set(range(1000))


def test_training_shards_deterministic_and_pruned(spark, tmp_path):
    from xyzpy_spark.pipeline.export import (
        read_training_shards,
        write_training_shards,
    )
    from xyzpy_spark.plans.inspect import executed_plan

    df = spark.range(500).withColumn("v", F.col("id") + 1)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # second export from a differently-partitioned input
    write_training_shards(df, a, key="id", n_shards=4)
    write_training_shards(df.repartition(13), b, key="id", n_shards=4)
    for shard in range(4):
        ra = read_training_shards(spark, a, shards=[shard])
        rb = read_training_shards(spark, b, shards=[shard])
        # same rows, same intra-shard order, regardless of input layout
        assert [r.id for r in ra.collect()] == [r.id for r in rb.collect()]
    # shard selection prunes at the source, not post-scan
    plan = executed_plan(read_training_shards(spark, a, shards=[2]))
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "shard" in pf and "= 2" in pf


def test_filter_corpus_gates(spark):
    from xyzpy_spark.pipeline.text import filter_corpus

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is a fine day to nap"),
            (2, "buy buy buy buy buy buy buy buy buy buy buy buy"),
            (3, "ok"),
        ],
        "doc_id long, text string",
    )
    kept = filter_corpus(
        df, min_tokens=5, max_top_bigram_frac=0.5, min_quality=0.2
    )
    ids = {r.doc_id for r in kept.collect()}
    assert 1 in ids          # normal prose survives
    assert 2 not in ids      # keyword stuffing: top bigram ~100%
    assert 3 not in ids      # too short
    # lang gate composes
    en_only = filter_corpus(df, min_tokens=5, langs=["en"])
    assert {r.doc_id for r in en_only.collect()} == {1}


def test_corpus_top_ngrams(spark):
    from xyzpy_spark.pipeline.text import corpus_top_ngrams

    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b x"), (3, "zz yy")],
        "doc_id long, text string",
    )
    rows = corpus_top_ngrams(df, n=2, k=3).collect()
    assert (rows[0].ngram, rows[0].n_occurrences, rows[0].n_docs) == ("a b", 3, 2)
    # deterministic tie-break: alphabetical among count-1 bigrams
    assert [r.ngram for r in rows[1:]] == sorted(r.ngram for r in rows[1:])


def test_semantic_dedup_planted_duplicates(spark):
    """Planted near-dups are pruned (lower id survives), distant
    vectors survive, every input id appears exactly once."""
    import numpy as np
    from xyzpy_spark.pipeline.dedup import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16)).astype("float64")
    vecs = list(base)
    # plant near-dups of rows 0..4 as ids 40..44
    for i in range(5):
        vecs.append(base[i] + rng.normal(scale=1e-3, size=16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    for mode in ("portable", "kmeans"):
        out = {
            r["vec_id"]: r
            for r in semantic_dedup(
                df, n_clusters=4, threshold=0.95, mode=mode
            ).collect()
        }
        assert len(out) == 45
        # each planted dup shares its original's cluster -> dropped
        for i in range(5):
            assert out[40 + i]["cluster"] == out[i]["cluster"]
            assert not out[40 + i]["keep"], mode
            assert out[i]["keep"], mode  # min-id survives
        # distant vectors survive
        assert sum(r["keep"] for r in out.values()) == 40


def test_semantic_dedup_zero_norm_vectors(spark):
    """Zero-norm embeddings (no defined cosine) follow the documented
    contract: cluster 0, always kept, never dominate others — and no
    NaNs/numpy warnings leak out (review r3)."""
    import warnings

    import numpy as np
    from xyzpy_spark.pipeline.dedup import semantic_dedup

    rng = np.random.default_rng(3)
    vecs = [list(map(float, rng.normal(size=8))) for _ in range(10)]
    vecs[2] = [0.0] * 8  # zero-norm in the middle
    vecs.append(list(vecs[5]))  # a real dup to show pruning still works
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = {
            r["vec_id"]: r
            for r in semantic_dedup(df, n_clusters=3, threshold=0.99).collect()
        }
    assert len(out) == 11
    assert out[2]["cluster"] == 0
    assert out[2]["keep"]  # zero-norm is always kept
    assert not out[10]["keep"]  # planted exact dup of 5 still pruned
    assert out[5]["keep"]


def test_semantic_dedup_bad_mode(spark):
    from xyzpy_spark.pipeline.dedup import semantic_dedup

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="mode"):
        semantic_dedup(df, mode="nope")


def test_dedup_against_index(spark):
    """Continuous-ingest dedup: exact dup via canonical fingerprint,
    near dup via banded signature probe, novel docs pass through."""
    from xyzpy_spark.pipeline.dedup import (
        build_dedup_index,
        dedup_against_index,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different content about spark engines"),
            (3, "a third historical document with its own words"),
        ],
        ["doc_id", "text"],
    )
    index = build_dedup_index(corpus, n=2)
    new = spark.createDataFrame(
        [
            (10, "The  quick brown fox jumps over the lazy  DOG"),  # exact
            (11, "the quick brown fox jumps over the lazy cat"),    # near
            (12, "entirely novel text no overlap whatsoever here"), # novel
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup_against_index(new, index, n=2, threshold=0.3).collect()
    }
    assert out[10]["dup_kind"] == "exact"
    assert out[10]["dup_of"] == 1
    assert out[10]["est_jaccard"] == 1.0
    assert out[11]["dup_kind"] == "near"
    assert out[11]["dup_of"] == 1
    assert 0.3 <= out[11]["est_jaccard"] < 1.0
    assert out[12]["dup_kind"] is None
    assert out[12]["dup_of"] is None


def test_dedup_against_index_prebanded(spark):
    """The pre-banded index projection (band_dedup_index) gives
    byte-identical probe results to in-flight banding (r3: saved
    banded table lets per-ingest probes skip re-deriving buckets)."""
    from xyzpy_spark.pipeline.dedup import (
        band_dedup_index,
        build_dedup_index,
        dedup_against_index,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different content about spark engines"),
            (3, ""),  # token-less doc: must not enter banding
        ],
        ["doc_id", "text"],
    )
    index = build_dedup_index(corpus, n=2)
    bands = band_dedup_index(index)
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy cat"),
            (11, "entirely novel text no overlap whatsoever here"),
        ],
        ["doc_id", "text"],
    )
    plain = sorted(
        map(tuple, dedup_against_index(new, index, n=2, threshold=0.3).collect())
    )
    banded = sorted(
        map(
            tuple,
            dedup_against_index(
                new, index, n=2, threshold=0.3, index_bands=bands
            ).collect(),
        )
    )
    assert plain == banded

    # a probe banded differently from the saved projection would match
    # NOTHING and silently declare every dup novel — must fail loudly
    # (band_dedup_index stamps num_perm/bands; review r3)
    bands8 = band_dedup_index(index, bands=8)
    with pytest.raises(ValueError, match="banding parameters"):
        dedup_against_index(
            new, index, n=2, threshold=0.3, bands=16, index_bands=bands8
        )

    # signature parameters (n, hash_fn) are just as critical: stamped
    # when given, validated the same way (review r3)
    stamped = band_dedup_index(index, n=2, hash_fn="xxhash64")
    with pytest.raises(ValueError, match="parameters"):
        dedup_against_index(
            new, index, n=3, threshold=0.3, index_bands=stamped
        )
    with pytest.raises(ValueError, match="parameters"):
        dedup_against_index(
            new, index, n=2, hash_fn="md5", threshold=0.3,
            index_bands=stamped,
        )


def test_dedup_against_index_portable_mode(spark):
    """md5 portable mode produces the same dup decisions."""
    from xyzpy_spark.pipeline.dedup import (
        build_dedup_index,
        dedup_against_index,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    index = build_dedup_index(corpus, n=2, hash_fn="md5")
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta iota")],
        ["doc_id", "text"],
    )
    out = dedup_against_index(
        new, index, n=2, threshold=0.3, hash_fn="md5"
    ).collect()
    assert out[0]["dup_kind"] == "near" and out[0]["dup_of"] == 1


def test_score_quality_rowwise_matches_join_scorer(spark):
    """The map-literal row-wise quality scorer (streaming-legal) must
    agree with the broadcast-join scorer: same margins (float fold
    order within 1e-9), same keep decisions, same intercept-only
    fallback for token-less docs, same n_buckets-mismatch guard."""
    import numpy as np

    from xyzpy_spark.pipeline.text import (
        score_quality_rowwise,
        score_quality_trained,
        train_quality_classifier,
    )

    rng = np.random.default_rng(11)
    rows = []
    for d in range(40):
        toks = [f"tok{int(rng.integers(0, 200))}" for _ in range(12)]
        rows.append((d, " ".join(toks), int(d % 2)))
    labeled = spark.createDataFrame(
        rows, "doc_id long, text string, label int"
    )
    weights, b0 = train_quality_classifier(labeled, n_buckets=1 << 14)
    held = spark.createDataFrame(
        [(r[0], r[1]) for r in rows]
        + [(9001, None), (9002, ""), (9003, "   ")],
        "doc_id long, text string",
    )
    join_out = {
        r["doc_id"]: (r["margin"], r["keep"])
        for r in score_quality_trained(
            held, weights, b0, n_buckets=1 << 14
        ).collect()
    }
    row_out = {
        r["doc_id"]: (r["margin"], r["keep"])
        for r in score_quality_rowwise(
            held, weights, b0, n_buckets=1 << 14
        ).collect()
    }
    assert set(join_out) == set(row_out)
    for d in join_out:
        assert row_out[d][0] == pytest.approx(join_out[d][0], abs=1e-9), d
        assert row_out[d][1] == join_out[d][1], d
    for d in (9001, 9002, 9003):  # token-less: intercept-only
        assert join_out[d][0] == pytest.approx(b0)
    with pytest.raises(ValueError, match="n_buckets"):
        score_quality_rowwise(held, weights, b0, n_buckets=1 << 10)


def test_score_quality_rowwise_runs_on_stream(spark):
    """The row-wise scorer is a stateless map plan: it must run
    unmodified on the streaming engine in append mode and produce
    batch-identical margins."""
    import numpy as np

    from xyzpy_spark.pipeline.text import (
        score_quality_rowwise,
        train_quality_classifier,
    )
    from xyzpy_spark.streaming.ops import (
        read_documents_stream,
        run_stream_to_memory,
    )

    sf = "/root/testdata/sf0.001"
    batch_docs = spark.read.parquet(sf + "/documents.parquet")
    rng = np.random.default_rng(3)
    labeled = batch_docs.limit(40).select(
        "doc_id", "text", (F.col("doc_id") % 2).cast("int").alias("label")
    )
    weights, b0 = train_quality_classifier(labeled, n_buckets=1 << 14)
    streamed = run_stream_to_memory(
        score_quality_rowwise(
            read_documents_stream(spark, sf), weights, b0,
            n_buckets=1 << 14,
        ).select("doc_id", "margin", "keep"),
        "t_quality_rowwise_stream",
        output_mode="append",
    )
    want = {
        r["doc_id"]: (r["margin"], r["keep"])
        for r in score_quality_rowwise(
            batch_docs, weights, b0, n_buckets=1 << 14
        ).select("doc_id", "margin", "keep").collect()
    }
    got = {
        r["doc_id"]: (r["margin"], r["keep"])
        for r in streamed.collect()
    }
    assert got == want and len(got) > 0


def test_score_quality_model_matches_python_recompute(spark, docs):
    """Triangulate the hashed-linear scorer against an independent
    pure-python hashlib recompute (the DuckDB oracle is the third
    implementation)."""
    import hashlib

    from xyzpy_spark.pipeline.text import score_quality_model

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def expected_raw(text: str) -> int:
        total = 0
        for tok in text.split():
            bucket = h32(tok) % (1 << 20)
            total += h32(f"qw:{bucket}") % 2001 - 1000
        return total

    rows = {r["doc_id"]: r for r in score_quality_model(docs).collect()}
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in originals.items():
        assert rows[doc_id]["score_raw"] == expected_raw(text), doc_id


def test_semantic_dedup_matches_python_model(spark):
    """The distributed cluster-then-prune must agree with a
    brute-force python model of the same rule (assign to argmax-cosine
    centroid, drop if any lower-id in-cluster neighbor >= threshold)."""
    import hashlib

    import numpy as np

    from xyzpy_spark.pipeline.dedup import semantic_dedup

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8)).astype("float64")
    # make some deliberate near-dups
    vecs[50] = vecs[3] * 1.001
    vecs[51] = vecs[7] + 1e-4
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semantic_dedup(
            df, n_clusters=4, threshold=0.9, mode="portable", quantize=1 << 20
        ).collect()
    }

    # python model — same quantization, same md5 centroid sample
    q = np.floor(vecs * (1 << 20)).astype("int64")
    order = sorted(range(60), key=lambda i: hashlib.md5(f"{i}:42".encode()).hexdigest())
    cents = q[order[:4]]
    cn = np.sqrt((cents.astype(float) ** 2).sum(axis=1))
    xn = np.sqrt((q.astype(float) ** 2).sum(axis=1))
    sims = (q @ cents.T).astype(float) / (xn[:, None] * cn[None, :])
    cluster = sims.argmax(axis=1)
    for i in range(60):
        assert got[i][0] == cluster[i], i
    cos = (q @ q.T).astype(float) / (xn[:, None] * xn[None, :])
    for i in range(60):
        dominated = any(
            cluster[j] == cluster[i] and cos[i, j] >= 0.9
            for j in range(i)
        )
        assert got[i][1] == (not dominated), i


def test_score_quality_model_null_text(spark):
    """NULL text propagates NULL (repo convention), distinct from
    empty text which scores 0 — both mirrored in the oracle."""
    from xyzpy_spark.pipeline.text import score_quality_model

    df = spark.createDataFrame(
        [(0, None), (1, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in score_quality_model(df).collect()}
    assert rows[0]["score_raw"] is None
    assert rows[0]["keep"] is None
    assert rows[1]["score_raw"] == 0
    assert rows[1]["keep"] is True


def test_dedup_against_index_tokenless_docs(spark):
    """Empty/whitespace docs have no shingles but must still be
    indexed and annotated: exact dups of each other via the canonical
    fingerprint, never near-dup candidates."""
    from xyzpy_spark.pipeline.dedup import (
        build_dedup_index,
        dedup_against_index,
    )

    corpus = spark.createDataFrame(
        [(1, ""), (2, "real historical content here")],
        ["doc_id", "text"],
    )
    index = build_dedup_index(corpus, n=2)
    assert index.count() == 2  # empty doc kept (NULL sig)
    new = spark.createDataFrame(
        [(10, "   "), (11, "novel words entirely")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup_against_index(new, index, n=2).collect()
    }
    assert len(out) == 2  # every new doc annotated
    # "   " canonicalizes to " " vs "" -> not equal fingerprints; but
    # both rows must exist with no crash and no spurious near match
    assert out[11]["dup_kind"] is None


def test_dedup_against_index_bad_bands(spark):
    from xyzpy_spark.pipeline.dedup import (
        build_dedup_index,
        dedup_against_index,
    )

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    index = build_dedup_index(df)
    with pytest.raises(ValueError, match="bands"):
        dedup_against_index(df, index, num_perm=64, bands=12).collect()


def test_semantic_dedup_custom_id_col(spark):
    """id_col is honored in name and type (not hardcoded vec_id)."""
    from xyzpy_spark.pipeline.dedup import semantic_dedup

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.001]), ("c", [0.0, 1.0])],
        "name string, embedding array<double>",
    )
    out = {
        r["name"]: r
        for r in semantic_dedup(
            df, n_clusters=2, threshold=0.99, id_col="name"
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    assert out["a"]["keep"] and not out["b"]["keep"] and out["c"]["keep"]


def test_dedup_corpus_one_call(spark, docs):
    """Composition wrapper: duplicate cluster collapses to its min-id
    winner, singletons keep dup_count=1, original columns survive."""
    from xyzpy_spark.pipeline.dedup import dedup_corpus

    out = {r["doc_id"]: r for r in dedup_corpus(
        docs, method="jaccard", n=3, threshold=0.5, max_shingle_freq=None
    ).collect()}
    # docs 0/1/3 form one near-dup cluster -> winner 0 with count 3
    assert 0 in out and out[0]["dup_count"] == 3
    assert 1 not in out and 3 not in out
    assert out[2]["dup_count"] == 1 and out[5]["dup_count"] == 1
    assert "text" in out[0].asDict()

    exact = {r["doc_id"]: r for r in dedup_corpus(docs, method="exact").collect()}
    assert 3 not in exact and exact[0]["dup_count"] == 2


def test_dedup_corpus_bad_method(spark, docs):
    from xyzpy_spark.pipeline.dedup import dedup_corpus

    with pytest.raises(ValueError, match="method"):
        dedup_corpus(docs, method="nope")


def test_dedup_paragraphs_literal_separator(spark):
    """sep is a literal, not a regex: '.' must split on dots, not on
    every character (review regression)."""
    from xyzpy_spark.pipeline.dedup import dedup_paragraphs

    df = spark.createDataFrame(
        [(1, "alpha beta.gamma delta"), (2, "alpha beta.unique text")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["text"] for r in dedup_paragraphs(df, sep=".").collect()}
    assert out[1] == "alpha beta.gamma delta"
    assert out[2] == "unique text"  # first paragraph deduped away


def test_split_train_eval_null_key_not_dropped(spark):
    """A null key must land in exactly one side of the split, not
    vanish from both (review regression)."""
    from xyzpy_spark.pipeline.sampling import split_train_eval

    df = spark.createDataFrame(
        [(None, 1.0), ("a", 2.0), ("b", 3.0)], ["k", "v"]
    )
    train, ev = split_train_eval(df, "k", eval_fraction=0.5)
    assert train.count() + ev.count() == 3


def test_pack_sequences_greedy_string_ids(spark):
    """Greedy packing honors a non-long id column type (review)."""
    from xyzpy_spark.pipeline.packing import pack_sequences_greedy

    df = spark.createDataFrame(
        [("a", "one two three"), ("b", "four five")], ["doc_id", "text"]
    )
    out = pack_sequences_greedy(df, max_tokens=4, n_shards=1)
    assert {r["doc_id"] for r in out.collect()} == {"a", "b"}


# -- Gopher quality rules (Rae et al. 2021 Appendix A) ------------------


def _gopher_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_gopher_rules_published_thresholds(spark):
    from xyzpy_spark.pipeline.text import add_gopher_rules

    good = (
        "the cat and the dog have been to the house of friends and "
        "that was fine with every one of them because they often go "
        "there to rest and to eat good food with the other animals "
        "that live near the old mill by the green river in the valley"
    )
    rows = [
        (1, good),                                    # passes all rules
        (2, "too short to pass"),                     # n_words < 50
        (3, " ".join(["####"] * 60)),                 # symbol + alpha fail
        (4, "\n".join(["- item " + str(i) for i in range(20)])),  # bullets
    ]
    out = {
        r["doc_id"]: r
        for r in add_gopher_rules(_gopher_df(spark, rows)).collect()
    }
    assert out[1]["gopher_pass"] is True
    assert out[1]["n_stop_hits"] >= 2
    assert out[2]["gopher_pass"] is False and out[2]["n_words"] < 50
    assert out[3]["gopher_pass"] is False
    assert out[3]["symbol_ratio"] > 0.1
    assert out[3]["alpha_frac"] < 0.8
    assert out[4]["gopher_pass"] is False
    assert out[4]["bullet_frac"] == 1.0


def test_gopher_rules_signals_exact(spark):
    """Spot-check the signal arithmetic against hand computation."""
    from xyzpy_spark.pipeline.text import add_gopher_rules

    txt = "abc de ... fgh#\nthe end...\n- bullet line"
    r = add_gopher_rules(_gopher_df(spark, [(1, txt)])).collect()[0]
    # words: abc de ... fgh# the end... - bullet line  -> 9 words
    assert r["n_words"] == 9
    # sum len = 3+2+3+4+3+6+1+6+4 = 32
    assert r["mean_word_len"] == round(32 / 9, 6)
    # one '#' + two '...' occurrences over 9 words
    assert r["symbol_ratio"] == round(3 / 9, 6)
    # 3 non-empty lines: 1 bullet, 1 ellipsis-ended
    assert r["bullet_frac"] == round(1 / 3, 6)
    assert r["ellipsis_frac"] == round(1 / 3, 6)
    # words with an alphabetic char: all but "..." and "-" -> 7/9
    assert r["alpha_frac"] == round(7 / 9, 6)
    assert r["n_stop_hits"] == 1  # only "the"
    assert r["gopher_pass"] is False


def test_gopher_rules_null_and_empty(spark):
    from xyzpy_spark.pipeline.text import add_gopher_rules, gopher_filter

    rows = [(1, None), (2, ""), (3, "   \n  ")]
    out = add_gopher_rules(_gopher_df(spark, rows)).collect()
    assert all(r["gopher_pass"] is False for r in out)
    assert gopher_filter(_gopher_df(spark, rows)).count() == 0


def test_packing_stats_matches_python_model(spark):
    from xyzpy_spark.pipeline.packing import packing_stats

    rows = [
        (1, "a b c"),                      # 3 tokens
        (2, " ".join(["w"] * 10)),         # 10 tokens -> over budget 8
        (3, None),                         # NULL -> 0 tokens
        (4, ""),                           # empty -> 0 tokens
        (5, " ".join(["x"] * 8)),          # exactly the budget
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    r = packing_stats(df, max_tokens=8).collect()[0]
    lens = [3, 10, 0, 0, 8]
    assert r["n_docs"] == 5
    assert r["total_tokens"] == sum(lens) == 21
    assert r["max_doc_tokens"] == 10
    assert r["n_docs_over_budget"] == 1
    assert r["n_seqs_concat"] == (21 + 7) // 8 == 3
    padded = sum((n + 7) // 8 for n in lens)
    assert r["n_seqs_padded"] == padded == 4
    assert r["pad_waste_frac"] == 1.0 - 21 / (padded * 8.0)


def test_packing_stats_empty_corpus(spark):
    from xyzpy_spark.pipeline.packing import packing_stats

    df = spark.createDataFrame([], "doc_id LONG, text STRING")
    r = packing_stats(df, max_tokens=8).collect()[0]
    assert tuple(r) == (0, 0, 0, 0, 0, 0, 0.0)


# -- baseline JPEG codec (pipeline/jpeg.py) -----------------------------


def test_jpeg_roundtrip_near_lossless():
    """encode_jpeg(quant=1) -> decode_jpeg recovers pixels within the
    coefficient-rounding bound (±2), RGB and grayscale, at non-8
    multiple dimensions."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (19, 13, 3), dtype=np.uint8)
    meta, out = decode_jpeg(encode_jpeg(img, quant=1))
    assert (meta["width"], meta["height"], meta["channels"]) == (13, 19, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2

    g = rng.integers(0, 256, (8, 24), dtype=np.uint8)
    meta2, out2 = decode_jpeg(encode_jpeg(g, quant=1))
    assert meta2["channels"] == 1
    assert int(np.abs(out2[:, :, 0].astype(int) - g.astype(int)).max()) <= 1


def test_jpeg_lockstep_equals_scalar_walk():
    """The restart-interval lockstep entropy pass (r7 verdict ask #5)
    must be BIT-IDENTICAL to the scalar walk on the same bytes —
    noise (dense coefficients, heavy -2 two-step traffic), structure,
    flat blocks, odd dimensions, gray and color, near-lossless and
    coarse quant."""
    import numpy as np

    import xyzpy_spark.pipeline.jpeg as J

    rng = np.random.default_rng(5)
    images = [
        rng.integers(0, 256, (128, 128), dtype=np.uint8),
        rng.integers(0, 256, (96, 120, 3), dtype=np.uint8),
        (np.add.outer(np.arange(100), np.arange(77)) % 256).astype(
            np.uint8
        ),
        np.full((64, 64), 128, dtype=np.uint8),
        rng.integers(0, 256, (49, 81, 3), dtype=np.uint8),
    ]
    for img in images:
        for q in (1, 8):
            bb = J.encode_jpeg(img, quant=q)  # default restarts
            fast = J.decode_jpeg(bb)
            thr = J._LOCKSTEP_MIN_LANES
            try:
                J._LOCKSTEP_MIN_LANES = 10**9  # force the scalar walk
                slow = J.decode_jpeg(bb)
            finally:
                J._LOCKSTEP_MIN_LANES = thr
            assert fast is not None and slow is not None
            assert fast[0] == slow[0]
            assert np.array_equal(fast[1], slow[1]), (img.shape, q)


def test_jpeg_lockstep_truncation_parity():
    """HOSTILE-input parity sweep (r8 ADVICE): on truncated /
    zeroed / bit-flipped restart streams the lockstep walk must reach
    exactly the scalar walk's outcome — same pixels or both reject.
    The lockstep slow path drops the scalar's mid-symbol cursor
    clamps on the argument that past-the-end reads decode zero bits
    from the 280-byte pad either way; valid streams are A/B-pinned
    above, this pins the corrupt ones."""
    import numpy as np

    import xyzpy_spark.pipeline.jpeg as J

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (96, 96), dtype=np.uint8)
    bb = J.encode_jpeg(img, quant=4)  # restart_interval=1 -> 144 lanes
    sos = bb.index(b"\xff\xda")
    seg_len = int.from_bytes(bb[sos + 2 : sos + 4], "big")
    ent0 = sos + 2 + seg_len  # first entropy byte
    ent1 = len(bb) - 2  # EOI

    def _both(stream: bytes):
        fast = J.decode_jpeg(stream)
        thr = J._LOCKSTEP_MIN_LANES
        try:
            J._LOCKSTEP_MIN_LANES = 10**9
            slow = J.decode_jpeg(stream)
        finally:
            J._LOCKSTEP_MIN_LANES = thr
        return fast, slow

    # RST marker positions: truncating a segment's TAIL (bytes removed
    # just before its RST marker) keeps the lane count — lockstep stays
    # engaged — while the shortened lane's cursor runs past nbits
    # mid-block, the exact divergence window the clamps guard
    rsts = [
        i
        for i in range(ent0, ent1 - 1)
        if bb[i] == 0xFF and 0xD0 <= bb[i + 1] <= 0xD7
    ]
    assert len(rsts) > 100
    cases = []
    for pick in range(0, len(rsts), 11):
        for drop in (1, 2, 5, 11):
            at = rsts[pick]
            if at - drop > ent0:
                cases.append(bb[: at - drop] + bb[at:])
    # zeroed tails of restart segments (valid-length garbage bits)
    for zlen in (1, 3, 9):
        for at in range(ent0 + 11, ent1 - zlen, (ent1 - ent0) // 7):
            cases.append(bb[:at] + b"\x00" * zlen + bb[at + zlen :])
    # random byte flips (avoid creating 0xFF marker prefixes is NOT
    # required — marker resync divergence is exactly what must agree)
    for seed in range(12):
        r2 = np.random.default_rng(seed)
        s = bytearray(bb)
        for _ in range(4):
            s[int(r2.integers(ent0, ent1))] = int(r2.integers(0, 256))
        cases.append(bytes(s))
    n_decoded = 0
    for stream in cases:
        fast, slow = _both(stream)
        assert (fast is None) == (slow is None)
        if fast is not None:
            n_decoded += 1
            assert fast[0] == slow[0]
            assert np.array_equal(fast[1], slow[1])
    # the sweep must actually exercise decode paths, not just rejects
    assert n_decoded >= 5


def test_jpeg_restart_encoding_roundtrips():
    """Restart markers (DRI + byte-aligned RSTn, DC predictors reset)
    must not change decoded pixels: the default restart_interval=1
    stream decodes to exactly the restart-free stream's pixels, and
    a coarser interval rides the same contract."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    _, base = decode_jpeg(encode_jpeg(img, quant=1, restart_interval=None))
    for rst in (1, 3, 7):
        _, got = decode_jpeg(
            encode_jpeg(img, quant=1, restart_interval=rst)
        )
        assert np.array_equal(got, base), rst
    import pytest as _pytest

    with _pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg(img, restart_interval=0)
    with _pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg(img, restart_interval=70000)


def test_jpeg_decoder_rejects_non_baseline():
    """Malformed / exotic payloads must return None, never raise (one
    bad file can't kill a 100-TB scan)."""
    from xyzpy_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
    from xyzpy_spark.pipeline.multimodal import fake_jpeg_bytes

    assert decode_jpeg(b"junk") is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None
    good = fake_jpeg_bytes(3)
    assert decode_jpeg(good) is not None
    assert decode_jpeg(good[: len(good) // 2]) is None or True  # no raise
    # flip SOF0 -> SOF2: the bytes now claim progressive but carry a
    # BASELINE scan header (Ss=0, Se=63 — illegal for a progressive
    # DC scan), so the r9 progressive path must reject, not mis-read
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(prog) is None
    # flip SOF0 -> SOF3: claims lossless but carries a baseline scan
    # header (Ss=0 is not a valid predictor selector) — the r10
    # lossless path must reject, not mis-read
    assert decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc3", 1)) is None
    import numpy as np

    # hostile: truncated entropy stream decodes or rejects, no raise
    enc = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    decode_jpeg(enc[:-4])


def test_jpeg_lossless_roundtrip_bit_exact():
    """The r10 lossless path (SOF3) closes the last non-hierarchical
    PIL gate: encode_jpeg_lossless -> decode_jpeg must reproduce the
    input EXACTLY (the defining property of process 14) across every
    predictor, gray and multi-channel data, restart intervals, and
    point transforms (which drop exactly the Pt low bits)."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(7)
    images = [
        rng.integers(0, 256, (15, 23), dtype=np.uint8),
        rng.integers(0, 256, (12, 9, 3), dtype=np.uint8),
        np.zeros((1, 1), dtype=np.uint8),
        (np.add.outer(np.arange(20), np.arange(6)) % 256).astype(
            np.uint8
        ),
    ]
    for img in images:
        want = img if img.ndim == 3 else img[:, :, None]
        for pred in range(1, 8):
            b = encode_jpeg_lossless(img, predictor=pred)
            assert b"\xff\xc3" in b
            meta, out = decode_jpeg(b)
            assert meta["width"] == img.shape[1]
            assert meta["height"] == img.shape[0]
            assert np.array_equal(out, want), (img.shape, pred)
        # restart markers reset the prediction chain identically on
        # both sides
        b = encode_jpeg_lossless(img, predictor=4, restart_interval=3)
        assert np.array_equal(decode_jpeg(b)[1], want)
    # point transform: roundtrip reproduces the Pt-masked input
    a = rng.integers(0, 256, (10, 14), dtype=np.uint8)
    for pt in (1, 3):
        b = encode_jpeg_lossless(a, predictor=7, point_transform=pt)
        got = decode_jpeg(b)[1][:, :, 0]
        assert np.array_equal(got, a & ~((1 << pt) - 1))
    # parameter validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(a, predictor=0)
    with _pytest.raises(ValueError, match="point_transform"):
        encode_jpeg_lossless(a, point_transform=9)
    # hostile: truncated lossless streams decode or reject, no raise
    b = encode_jpeg_lossless(a)
    for cut in (len(b) // 4, len(b) // 2, len(b) - 3):
        decode_jpeg(b[:cut])


def test_jpeg_sof1_decodes_as_baseline():
    """SOF1 (extended sequential, 8-bit) is a superset marker for the
    identical decoding process: a baseline file re-stamped SOF1 must
    decode bit-identically (r10 — previously returned None and fell
    to the PIL gate)."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (17, 21, 3), dtype=np.uint8)
    base = encode_jpeg(img, quant=2)
    sof1 = base.replace(b"\xff\xc0", b"\xff\xc1", 1)
    assert sof1 != base
    m0, a0 = decode_jpeg(base)
    m1, a1 = decode_jpeg(sof1)
    assert m0 == m1 and np.array_equal(a0, a1)


def test_jpeg_hierarchical_null_contract():
    """The ONLY remaining PIL gate after r10: differential/
    hierarchical and arithmetic-coded SOFs.  Without PIL the decode
    contract is null pixels with no exception — pinned here so an
    env without PIL cannot silently regress (and the gate cannot
    silently widen back to formats the native paths now own)."""
    from xyzpy_spark.pipeline.jpeg import decode_jpeg
    from xyzpy_spark.pipeline.multimodal import fake_jpeg_bytes

    good = fake_jpeg_bytes(5)
    for sof in (b"\xc5", b"\xc6", b"\xc7", b"\xc9", b"\xca", b"\xcb",
                b"\xcd", b"\xce", b"\xcf"):
        exotic = good.replace(b"\xff\xc0", b"\xff" + sof, 1)
        assert decode_jpeg(exotic) is None, sof


def _with_precision(jfif: bytes, sof_marker: bytes, prec: int) -> bytes:
    """Rewrite the SOF precision byte (marker, 2-byte length, then
    precision) — a structurally valid high-precision JPEG header."""
    i = jfif.index(b"\xff" + sof_marker)
    assert jfif[i + 4] == 8
    return jfif[: i + 4] + bytes([prec]) + jfif[i + 5 :]


def test_jpeg_high_precision_null_contract(spark):
    """The exotica gate after r12 (12-bit DCT now decodes NATIVELY —
    see test_jpeg_ext12_roundtrip): 12-bit on SOF0 stays refused
    (T.81 baseline is 8-bit by definition), and the remaining
    PIL-gated shapes (hierarchical/differential SOFs) keep the
    null-pixels-no-exception contract — pinned UNGATED at both the
    codec level and the decode_image/decode_media plumbing level,
    so the no-PIL CI environment runs it and one such file never
    kills a scan."""
    import importlib.util

    import numpy as np

    from xyzpy_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
    from xyzpy_spark.pipeline.multimodal import decode_image, decode_media

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    good = encode_jpeg(img, quant=2)
    seq12 = _with_precision(good, b"\xc0", 12)  # illegal 12-bit SOF0
    hier = good.replace(b"\xff\xc0", b"\xff\xc5", 1)
    payloads = [seq12, hier]
    for b in payloads:
        assert decode_jpeg(b) is None  # codec refuses, never raises
    # the gate must NOT have widened back: 12-bit SOF1 decodes natively
    sof1_12 = seq12.replace(b"\xff\xc0", b"\xff\xc1", 1)
    dec = decode_jpeg(sof1_12)
    assert dec is not None and dec[1].dtype == np.uint16

    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(payloads)],
        "media_id long, media binary",
    )
    pix = {r["media_id"]: r["pixels"] for r in decode_image(df).collect()}
    met = {
        r["media_id"]: r["decoded"]
        for r in decode_media(df).collect()
    }
    if importlib.util.find_spec("PIL") is None:
        # THE contract under test: null pixels / null-format struct,
        # scan survives
        assert all(v is None for v in pix.values()), pix
        assert all(m["format"] is None for m in met.values()), met
    else:  # pragma: no cover - PIL present: plumbing must still not raise
        assert set(pix) == set(met) == {0, 1}


def test_jpeg_ext12_roundtrip():
    """12-bit EXTENDED SEQUENTIAL DCT (SOF1) decodes natively (r12,
    closing the r11 verdict's last JPEG exotica ask): gray and RGB
    encode/decode roundtrip within DCT rounding (±2 at quant=1, the
    8-bit path's own bound), output is uint16 in [0, 4095], restart
    markers take the scalar walk to identical pixels, and a
    basis-aligned checkerboard whose coefficients are exactly
    representable roundtrips PIXEL-EXACT (it also drives the AC
    clamp + the wide DC categories).  Validation: precision other
    than 8/12 and out-of-range samples raise."""
    import numpy as np

    import pytest as _pytest

    from xyzpy_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    gray = np.linspace(0, 4095, 24 * 17).reshape(24, 17).astype(np.uint16)
    b = encode_jpeg(gray, quant=1, restart_interval=None, precision=12)
    meta, out = decode_jpeg(b)
    assert meta == {
        "format": "jpeg", "width": 17, "height": 24, "channels": 1
    }
    assert out.dtype == np.uint16
    assert int(np.abs(out[:, :, 0].astype(int) - gray.astype(int)).max()) <= 2

    rgb = rng.integers(0, 4096, size=(16, 16, 3)).astype(np.uint16)
    m2, o2 = decode_jpeg(
        encode_jpeg(rgb, quant=1, restart_interval=None, precision=12)
    )
    assert o2.dtype == np.uint16
    assert int(np.abs(o2.astype(int) - rgb.astype(int)).max()) <= 2

    # restart-marked stream: same pixels through the scalar RST path
    m3, o3 = decode_jpeg(
        encode_jpeg(gray, quant=1, restart_interval=2, precision=12)
    )
    assert np.array_equal(o3, out)

    # pixel-exact: the (4,4)-basis checkerboard's DCT is exactly
    # representable, so decode(encode(x)) == x bit-for-bit
    cb = np.zeros((16, 16), dtype=np.uint16)
    cb[::2, ::2] = 4095
    cb[1::2, 1::2] = 4095
    m4, o4 = decode_jpeg(
        encode_jpeg(cb, quant=1, restart_interval=None, precision=12)
    )
    assert np.array_equal(o4[:, :, 0], cb)

    with _pytest.raises(ValueError, match="precision"):
        encode_jpeg(gray, precision=10)
    with _pytest.raises(ValueError, match="samples"):
        encode_jpeg(
            np.full((8, 8), 4096, dtype=np.uint16), precision=12
        )


def test_jpeg_lossless_high_precision_roundtrip():
    """12/16-bit lossless JPEG decodes NATIVELY (r11 — the r10
    verdict's ask #5 'decode natively' branch: the SOF3 predictor
    machinery was already precision-general mod 2^16; this pins the
    full ring).  decode(encode(a, precision=P)) == a bit-for-bit
    across predictors, restart intervals and point transforms,
    including the category-16 no-magnitude-bits code a 32768
    difference emits — and 8-bit output stays byte-identical uint8."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_lossless

    rng = np.random.default_rng(13)
    g12 = rng.integers(0, 1 << 12, (13, 7), dtype=np.uint16)
    rgb16 = rng.integers(0, 1 << 16, (6, 9, 3), dtype=np.uint16)
    for a, prec, kw in [
        (g12, 12, {}),
        (g12, 12, {"predictor": 4, "restart_interval": 5}),
        (g12, 12, {"predictor": 7, "point_transform": 3}),
        (rgb16, 16, {}),
        (rgb16, 16, {"predictor": 6}),
    ]:
        m, dec = decode_jpeg(encode_jpeg_lossless(a, precision=prec, **kw))
        assert (m["width"], m["height"]) == (a.shape[1], a.shape[0])
        assert dec.dtype == np.uint16
        pt = kw.get("point_transform", 0)
        want = (a if a.ndim == 3 else a[:, :, None]) & ~((1 << pt) - 1)
        assert np.array_equal(dec, want), (prec, kw)
    # the category-16 special case: predictor 1 over a 0/32768
    # alternation makes every in-row difference exactly 32768 mod 2^16
    alt = np.zeros((3, 8), dtype=np.uint16)
    alt[:, 1::2] = 32768
    m, dec = decode_jpeg(encode_jpeg_lossless(alt, precision=16))
    assert np.array_equal(dec[:, :, 0], alt)
    # 8-bit path unchanged: uint8 out, and inferred precision == 8
    g8 = rng.integers(0, 256, (5, 5), dtype=np.uint8)
    m8, d8 = decode_jpeg(encode_jpeg_lossless(g8))
    assert d8.dtype == np.uint8 and np.array_equal(d8[:, :, 0], g8)
    # guards: oversized samples and out-of-range precision/pt
    import pytest as _pytest

    with _pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless(g12, precision=11)  # 12-bit data, 11-bit P
    with _pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless(g8, precision=17)
    with _pytest.raises(ValueError, match="point_transform"):
        encode_jpeg_lossless(g12, precision=12, point_transform=12)


def test_jpeg_progressive_roundtrip_bit_identical():
    """The r9 progressive path (carried r6-r8: the last PIL gate):
    encode_jpeg_progressive emits an SOF2 scan script covering every
    scan type the decoder implements — interleaved DC first at Al=1,
    per-component AC spectral bands with EOBRUN coding, DC
    refinement, AC successive-approximation refinement — and because
    successive approximation is lossless by construction, the decoded
    pixels must be BIT-IDENTICAL to the baseline encoding of the same
    array at the same quant."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from xyzpy_spark.pipeline.multimodal import _decode_jpeg_full

    rng = np.random.default_rng(9)
    images = [
        rng.integers(0, 256, (40, 56, 3), dtype=np.uint8),
        rng.integers(0, 256, (19, 13), dtype=np.uint8),
        np.full((24, 24), 128, dtype=np.uint8),  # EOBRUN-heavy
        (np.add.outer(np.arange(33), np.arange(41)) % 256).astype(
            np.uint8
        ),
    ]
    for img in images:
        for q in (1, 6):
            pb = encode_jpeg_progressive(img, quant=q)
            # really progressive: SOF2 present, multiple SOS scans
            assert b"\xff\xc2" in pb and pb.count(b"\xff\xda") >= 4
            base = decode_jpeg(
                encode_jpeg(img, quant=q, restart_interval=None)
            )
            prog = decode_jpeg(pb)
            assert prog is not None
            assert prog[0] == base[0]
            assert np.array_equal(prog[1], base[1]), (img.shape, q)
    # the multimodal plumbing decodes progressive natively (no PIL)
    pb = encode_jpeg_progressive(images[0], quant=1)
    full = _decode_jpeg_full(pb)
    assert full is not None and full[0]["format"] == "jpeg"
    assert full[0]["width"] == 56 and full[0]["channels"] == 3


def test_jpeg_progressive_hostile_inputs_never_raise():
    """Truncated / corrupted progressive streams decode or reject —
    never raise (the decode_media null contract)."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    pb = encode_jpeg_progressive(img, quant=2)
    for cut in range(10, len(pb), max(1, len(pb) // 37)):
        decode_jpeg(pb[:cut])          # truncation: None or partial ok
        decode_jpeg(pb[:cut] + b"\xff\xd9")
    for seed in range(8):
        r2 = np.random.default_rng(seed)
        s = bytearray(pb)
        for _ in range(5):
            s[int(r2.integers(2, len(pb)))] = int(r2.integers(0, 256))
        decode_jpeg(bytes(s))  # must not raise


def test_jpeg_decoder_rejects_multiscan_baseline():
    """A baseline JPEG whose first SOS covers only a subset of the
    SOF components (legal: one scan per component) must return None —
    decoding just that scan with interleaved-MCU geometry would leave
    the other planes at 0 and silently emit tinted pixels (round-4
    ADVICE, medium)."""
    from xyzpy_spark.pipeline.jpeg import decode_jpeg
    from xyzpy_spark.pipeline.multimodal import fake_jpeg_bytes

    good = fake_jpeg_bytes(3)
    assert decode_jpeg(good) is not None
    # rewrite the 3-component SOS header into a Y-only scan header
    sos = good.index(b"\xff\xda")
    seg_len = int.from_bytes(good[sos + 2:sos + 4], "big")
    payload = good[sos + 4:sos + 2 + seg_len]
    ns = payload[0]
    assert ns == 3, "fixture is the interleaved 3-component encoder"
    y_only = bytes([1]) + payload[1:3] + payload[1 + 2 * ns:]
    patched = (
        good[:sos + 2]
        + (len(y_only) + 2).to_bytes(2, "big")
        + y_only
        + good[sos + 2 + seg_len:]
    )
    assert decode_jpeg(patched) is None


def test_encode_jpeg_validates_quant():
    """quant outside [1, 255] must raise a clear ValueError up front
    (0 used to ZeroDivisionError, negatives corrupted output, >255
    failed deep in DQT serialization)."""
    import numpy as np
    import pytest as _pytest

    from xyzpy_spark.pipeline.jpeg import encode_jpeg

    img = np.zeros((8, 8), dtype=np.uint8)
    for bad in (0, -1, 256, 1000):
        with _pytest.raises(ValueError, match="quant"):
            encode_jpeg(img, quant=bad)
    assert encode_jpeg(img, quant=255)  # boundary stays legal


def test_jpeg_pil_cross_decode():
    """Our encoder emits standard-conforming baseline JFIF: PIL (when
    installed) must decode it to within the same rounding bound."""
    import io

    import numpy as np

    pytest.importorskip("PIL")
    from PIL import Image

    from xyzpy_spark.pipeline.jpeg import encode_jpeg
    from xyzpy_spark.pipeline.multimodal import fake_jpeg_bytes

    seed = 5
    w, h = 4 + seed % 9, 3 + seed % 7
    want = np.array(
        [(seed * 13 + k * 5) % 256 for k in range(3 * w * h)],
        dtype=np.uint8,
    ).reshape(h, w, 3)
    got = np.asarray(Image.open(io.BytesIO(fake_jpeg_bytes(seed))))
    assert got.shape == (h, w, 3)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 3


def test_decode_image_jpeg_native(spark):
    """decode_image decodes baseline JFIF without any imaging
    library: real Huffman + dequant + IDCT, pixels within ±2 of the
    closed-form source."""
    from xyzpy_spark.pipeline.multimodal import fake_jpeg_bytes

    ids = list(range(8))
    df = spark.createDataFrame(
        [(i, fake_jpeg_bytes(i)) for i in ids], ["doc_id", "media"]
    )
    rows = {r["doc_id"]: r["pixels"] for r in decode_image(df).collect()}
    for i in ids:
        w, h = 4 + i % 9, 3 + i % 7
        want = [(i * 13 + k * 5) % 256 for k in range(3 * w * h)]
        got = rows[i]
        assert got is not None and len(got) == len(want)
        assert max(abs(a - b) for a, b in zip(got, want)) <= 2, i


def test_decode_image_progressive_jpeg_native(spark):
    """decode_image decodes PROGRESSIVE JFIF without any imaging
    library (the r9 path): pixels bit-identical to the baseline
    encoding of the same array."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    imgs = {i: rng.integers(0, 256, (11, 17, 3), dtype=np.uint8)
            for i in range(4)}
    df = spark.createDataFrame(
        [(i, encode_jpeg_progressive(img, quant=2))
         for i, img in imgs.items()],
        ["doc_id", "media"],
    )
    rows = {r["doc_id"]: r["pixels"] for r in decode_image(df).collect()}
    for i, img in imgs.items():
        want = decode_jpeg(
            encode_jpeg(img, quant=2, restart_interval=None)
        )[1].ravel().tolist()
        assert rows[i] == want, i


def test_decode_media_jpeg_meta(spark):
    from xyzpy_spark.pipeline.multimodal import (
        attach_sample_jpeg,
        decode_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(5)], ["doc_id"])
    rows = {
        r["doc_id"]: r["decoded"]
        for r in decode_media(attach_sample_jpeg(docs)).collect()
    }
    for i in range(5):
        w, h = 4 + i % 9, 3 + i % 7
        d = rows[i]
        assert d["format"] == "jpeg"
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert d["n_values"] == 3 * w * h


def test_sample_video_frames_real_decode(spark):
    """The video modality end to end: container parse + every-2nd
    frame sampling + REAL per-frame PPM decode, pixels matching the
    closed-form generator; malformed clips emit nothing (never a
    task failure); param validation."""
    from xyzpy_spark.pipeline.multimodal import (
        fake_video_bytes,
        sample_video_frames,
    )

    ids = [1, 2, 5]
    df = spark.createDataFrame(
        [(i, fake_video_bytes(i)) for i in ids]
        + [(90, b"not a video"), (91, None),
           (92, fake_video_bytes(3)[:10])],  # truncated frame table
        ["doc_id", "media"],
    )
    rows = sample_video_frames(df, every=2).collect()
    got = {}
    for r in rows:
        got[(r["doc_id"], r["frame_idx"])] = (
            r["width"], r["height"], list(r["pixels"])
        )
    for s in ids:
        n_frames, w, h = 3 + s % 4, 4 + s % 5, 3 + s % 4
        want_frames = list(range(0, n_frames, 2))
        have = [f for (d, f) in got if d == s]
        assert sorted(have) == want_frames, s
        for f in want_frames:
            ww, hh, px = got[(s, f)]
            assert (ww, hh) == (w, h)
            assert px == [
                (s * 7 + f * 11 + k * 3) % 256 for k in range(3 * w * h)
            ]
    assert not [d for (d, _) in got if d in (90, 91, 92)]
    with pytest.raises(ValueError, match="every"):
        sample_video_frames(df, every=0)
    with pytest.raises(ValueError, match="frame_col"):
        sample_video_frames(df.withColumn("frame_idx", F.lit(1)))


def test_video_meta_parse(spark):
    """_parse_video meta fields are closed-form in the seed; junk is
    None."""
    from xyzpy_spark.pipeline.multimodal import (
        _parse_video,
        fake_video_bytes,
    )

    for s in (0, 3, 7):
        m = _parse_video(fake_video_bytes(s))
        assert m == {
            "format": "video",
            "width": 4 + s % 5,
            "height": 3 + s % 4,
            "channels": 3,
            "n_frames": 3 + s % 4,
            "fps": 10 + s % 20,
        }
    assert _parse_video(b"XYZV") is None
    assert _parse_video(None) is None


# -- sliding-window chunking (pipeline/text.chunk_documents) ------------


def test_chunk_documents_matches_python_model(spark):
    from xyzpy_spark.pipeline.text import chunk_documents

    def model(tokens, m, ov):
        n = len(tokens)
        if n == 0:
            return []
        stride = m - ov
        nc = 1 if n <= m else 1 + -(-(n - m) // stride)
        out = []
        for i in range(nc):
            s = min(i * stride, max(n - m, 0))
            piece = tokens[s : s + m]
            out.append((i, s, len(piece), " ".join(piece)))
        return out

    rows = [
        (1, " ".join(f"t{k}" for k in range(10))),
        (2, "short doc"),
        (3, " ".join(f"u{k}" for k in range(8))),   # exactly the budget
        (4, None),
        (5, ""),
        (6, " ".join(f"v{k}" for k in range(23))),  # ragged tail
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {}
    for r in chunk_documents(df, max_tokens=8, overlap=4).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_token"], r["n_chunk_tokens"],
             r["chunk_text"])
        )
    for i, text in rows:
        want = model(text.split() if text else [], 8, 4)
        assert sorted(got.get(i, [])) == want, i
    # uniform window length everywhere
    assert all(
        c[2] == min(8, len(dict(rows)[d].split()))
        for d, cs in got.items()
        for c in cs
    )


def test_chunk_documents_validates_overlap(spark):
    from xyzpy_spark.pipeline.text import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=8, overlap=8)


# -- temperature mixture weights + vocab coverage -----------------------


def test_temperature_mixture_weights_model(spark):
    import math

    from xyzpy_spark.pipeline.sampling import temperature_mixture_weights

    rows = (
        [(i, "w " * 9 + "w", "big") for i in range(8)]      # 80 tokens
        + [(100 + i, "x y z w u", "small") for i in range(2)]  # 10 tokens
    )
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    out = {
        r["source"]: r
        for r in temperature_mixture_weights(
            df, "source", temperature=2.0
        ).collect()
    }
    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    pw_big, pw_small = 80 ** 0.5, 10 ** 0.5
    tot = pw_big + pw_small
    assert out["big"]["n_tokens"] == 80
    assert out["small"]["n_tokens"] == 10
    assert out["big"]["p_natural"] == r6(80 / 90)
    assert out["small"]["p_temp"] == r6(pw_small / tot)
    # temperature lifts the small stratum, shrinks the big one
    assert out["small"]["boost"] > 1 > out["big"]["boost"]
    # T=1 is the natural distribution: every boost == 1
    nat = temperature_mixture_weights(df, "source", temperature=1.0)
    assert all(r["boost"] == 1.0 for r in nat.collect())


def test_vocab_coverage_curve(spark):
    from xyzpy_spark.pipeline.sampling import vocab_coverage

    # 10x "a", 5x "b", 1x each of c..g
    text = " ".join(["a"] * 10 + ["b"] * 5 + list("cdefg"))
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    rows = {
        r["vocab_size"]: r
        for r in vocab_coverage(df, vocab_sizes=[1, 2, 100]).collect()
    }
    assert rows[1]["covered_tokens"] == 10
    assert rows[2]["covered_tokens"] == 15
    assert rows[100]["covered_tokens"] == 20
    assert rows[100]["coverage"] == 1.0
    assert rows[1]["n_types"] == 7 and rows[1]["total_tokens"] == 20
    # k <= 0 covers nothing (r5 code-review: the cum_types >= k join
    # is vacuously true for negative k and used to extrapolate
    # negative mass; the rank-era contract returned 0)
    zero = {
        r["vocab_size"]: r
        for r in vocab_coverage(df, vocab_sizes=[-5, 0, 3]).collect()
    }
    assert zero[-5]["covered_tokens"] == 0
    assert zero[-5]["coverage"] == 0.0
    assert zero[0]["covered_tokens"] == 0
    assert zero[3]["covered_tokens"] == 16


# -- HTML stripping (pipeline/text.strip_html) --------------------------


def test_strip_html_removes_markup_keeps_text(spark):
    from xyzpy_spark.pipeline.text import strip_html

    rows = [
        (1, '<p class="a">Hello <b>world</b></p>'),
        (2, "<script>var x = 1 < 2;</script>before<style>p{}</style>after"),
        (3, "<!-- note -->plain &amp; simple &lt;tag&gt; &nbsp;done"),
        (4, "A &amp;lt; B"),   # escaped literal: must NOT double-decode
        (5, None),
        (6, "no markup at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r["text_plain"] for r in strip_html(df).collect()}
    assert out[1] == "Hello world"
    assert out[2] == "before after"           # script/style CONTENTS gone
    assert out[3] == 'plain & simple <tag> done'
    assert out[4] == "A &lt; B"
    assert out[5] is None
    assert out[6] == "no markup at all"


# -- cross-corpus dedup (pipeline/dedup.dedup_against) ------------------


def test_dedup_against_exact(spark):
    from xyzpy_spark.pipeline.dedup import dedup_against

    ref = spark.createDataFrame(
        [
            (100, "The quick brown fox"),
            (101, "other reference text"),
            (102, None),
        ],
        "doc_id LONG, text STRING",
    )
    new = spark.createDataFrame(
        [
            (1, "the  quick   brown fox"),  # normalized dup of 100
            (2, "completely novel content"),
            (3, "OTHER reference TEXT"),    # case-normalized dup of 101
            (4, None),                      # no content: never a dup
        ],
        "doc_id LONG, text STRING",
    )
    # NULL text survives under BOTH hash fns, even with a NULL-text
    # reference row (xxhash64 hashes an all-NULL input to its seed,
    # which would otherwise silently collapse all NULL texts)
    for fn in ("xxhash64", "md5"):
        kept = {
            r["doc_id"]
            for r in dedup_against(new, ref, hash_fn=fn).collect()
        }
        assert kept == {2, 4}, fn


def test_dedup_against_jaccard_cross_only(spark):
    """Near-dups of the reference drop; near-dups WITHIN df survive
    (cross-corpus dedup must not self-dedup the new batch)."""
    from xyzpy_spark.pipeline.dedup import dedup_against

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ref = spark.createDataFrame(
        [(100, base)], "doc_id LONG, text STRING"
    )
    new = spark.createDataFrame(
        [
            (1, base.replace("kappa", "lambda")),   # near-dup of ref
            (2, "one two three four five six seven eight nine ten"),
            (3, "one two three four five six seven eight nine zzz"),
            # 2 and 3 are near-dups of each other but NOT of ref
        ],
        "doc_id LONG, text STRING",
    )
    kept = {
        r["doc_id"]
        for r in dedup_against(
            new, ref, method="jaccard", threshold=0.5,
            max_shingle_freq=None,
        ).collect()
    }
    assert kept == {2, 3}


def test_dedup_against_unknown_method(spark):
    from xyzpy_spark.pipeline.dedup import dedup_against

    df = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="unknown method"):
        dedup_against(df, df, method="simhash")


def test_write_training_shards_jsonl(spark, tmp_path):
    """fmt='json' writes JSONL (one object per line) — the common
    LLM-data interchange — with the same deterministic sharding."""
    import json as _json
    import os

    from xyzpy_spark.pipeline.export import (
        read_training_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], ["id", "text"]
    )
    out = str(tmp_path / "jsonl_shards")
    write_training_shards(df, out, key="id", n_shards=4, fmt="json")
    back = read_training_shards(spark, out, fmt="json")
    assert back.count() == 40
    assert {r["id"] for r in back.collect()} == set(range(40))
    # the files are genuine JSONL: each line parses as one object
    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(shard_dirs) == 4
    f = next(
        os.path.join(out, shard_dirs[0], p)
        for p in os.listdir(os.path.join(out, shard_dirs[0]))
        if p.endswith(".json")
    )
    lines = [ln for ln in open(f) if ln.strip()]
    assert all("text" in _json.loads(ln) for ln in lines)


def test_resample_audio_rate_and_content(spark):
    """Resampled clips are valid WAV at the target rate with
    duration preserved; content follows linear interpolation
    (upsampling a constant stays constant; a ramp stays a ramp)."""
    import struct

    import numpy as np

    from xyzpy_spark.pipeline.multimodal import (
        _decode_wav_samples,
        resample_audio,
    )

    def wav(sr, samples):
        data = b"".join(struct.pack("<h", s) for s in samples)
        fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
        chunks = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
                  + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    ramp = list(range(0, 8000, 100))          # 80 samples at 8 kHz
    rows = [
        (1, wav(8000, ramp)),
        (2, wav(8000, [500] * 80)),           # constant
        (3, b"not audio"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, media BINARY")
    out = {
        r["doc_id"]: r["media_resampled"]
        for r in resample_audio(df, 16000).collect()
    }
    assert out[3] is None and out[4] is None
    sr1, ch1, s1 = _decode_wav_samples(bytes(out[1]))
    assert (sr1, ch1) == (16000, 1)
    assert s1.size == 160                      # duration preserved
    # a linear ramp resamples onto the same line (ends may clamp)
    mid = s1[2:-2].astype(float)
    diffs = np.diff(mid)
    assert np.all(np.abs(diffs - 50) <= 1)     # ramp slope halved
    _, _, s2 = _decode_wav_samples(bytes(out[2]))
    assert set(np.unique(s2)) == {500}         # constant preserved


def test_resample_audio_hostile_headers_yield_null(spark):
    """Malformed-but-parseable WAV headers must yield null, never a
    task failure: zero sample rate, zero channels, and a stereo clip
    with an odd sample count (truncated data chunk — the last partial
    frame is dropped; if no whole frame remains the clip nulls)."""
    import struct

    from xyzpy_spark.pipeline.multimodal import (
        _decode_wav_samples,
        resample_audio,
    )

    def wav(sr, ch, samples):
        data = b"".join(struct.pack("<h", s) for s in samples)
        fmt = struct.pack(
            "<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16
        )
        chunks = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
                  + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    rows = [
        (1, wav(0, 1, [1, 2, 3, 4])),       # zero rate
        (2, wav(8000, 0, [1, 2, 3, 4])),    # zero channels
        (3, wav(8000, 2, [1, 2, 3])),       # stereo, odd sample count
        (4, wav(8000, 2, [7])),             # no whole frame at all
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, media BINARY")
    out = {
        r["doc_id"]: r["media_resampled"]
        for r in resample_audio(df, 16000).collect()
    }
    assert out[1] is None and out[2] is None
    dec3 = _decode_wav_samples(bytes(out[3]))
    assert dec3 is not None and dec3[1] == 2   # truncated to 1 frame
    assert out[4] is None or _decode_wav_samples(bytes(out[4]))


def test_strip_duplicate_lines_keeps_first_in_order(spark):
    from xyzpy_spark.pipeline.dedup import strip_duplicate_lines

    rows = [
        (1, "menu\nreal content A\nmenu\nreal content B\nfooter\nfooter"),
        (2, "only once"),
        (3, None),
        (4, "x\n\ny\n\nx"),   # duplicate blanks collapse to one
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text_dedup_lines"]
        for r in strip_duplicate_lines(df).collect()
    }
    assert out[1] == "menu\nreal content A\nreal content B\nfooter"
    assert out[2] == "only once"
    assert out[3] is None
    assert out[4] == "x\n\ny"


def test_strip_duplicate_lines_literal_metachar_separator(spark):
    """sep is literal on BOTH sides: a regex metacharacter separator
    ('.', '|', '+') must split on the separator itself, not on the
    regex it happens to spell (F.split takes a Java regex — round-4
    ADVICE: unescaped '.' split on every character while rejoining
    literally, mangling the text)."""
    from xyzpy_spark.pipeline.dedup import strip_duplicate_lines

    rows = [(1, "aa.bb.aa.cc"), (2, "x|y|x"), (3, "p+q+p")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    for sep, want in [(".", "aa.bb.cc"), ("|", None), ("+", None)]:
        out = {
            r["doc_id"]: r["text_dedup_lines"]
            for r in strip_duplicate_lines(df, sep=sep).collect()
        }
        if sep == ".":
            assert out[1] == want
        elif sep == "|":
            assert out[2] == "x|y"
        else:
            assert out[3] == "p+q"


def test_winnow_fingerprints_matches_python_twin(spark):
    """Winnowing (MOSS) selection: exact agreement with a pure-python
    twin in md5-portable mode, whitespace-canon invariance, and the
    guarantee's edge cases (short docs emit nothing)."""
    import hashlib
    import re as _re

    from xyzpy_spark.pipeline.dedup import winnow_fingerprints

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "tiny"),
        (3, None),
        (4, "the  quick\tbrown fox jumps"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {}
    for r in winnow_fingerprints(df, k=5, w=4, hash_fn="md5").collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def twin(t, k=5, w=4):
        t = _re.sub(r"\s+", " ", t.lower())
        hs = (
            [h(t[i:i + k]) for i in range(len(t) - k + 1)]
            if len(t) >= k
            else []
        )
        if len(hs) < w:
            return set()
        return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}

    want = {i: twin(t) for i, t in rows if t and twin(t)}
    assert got == want
    assert got[1] == got[4]  # whitespace canon
    assert 2 not in got and 3 not in got


def test_winnow_guarantee_shared_fingerprint_on_long_match(spark):
    """Any substring match of length >= w + k - 1 must share at least
    one fingerprint — the winnowing recall floor."""
    from xyzpy_spark.pipeline.dedup import winnow_fingerprints

    shared = "a very long exactly matching passage of text here"
    df = spark.createDataFrame(
        [(1, "prefix one " + shared), (2, shared + " suffix two")],
        "doc_id LONG, text STRING",
    )
    got = {}
    for r in winnow_fingerprints(df, k=5, w=4, hash_fn="md5").collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert got[1] & got[2], "long shared passage must collide"


def test_winnow_dedup_pairs_matches_python_twin(spark):
    """End-to-end winnow dedup: Jaccard over the winnowed selections,
    exact agreement with a pure-python twin, with and without the
    fingerprint-frequency cap (capped fingerprints leave BOTH the
    intersection and the sizes)."""
    import hashlib
    import re as _re

    from xyzpy_spark.pipeline.dedup import winnow_dedup_pairs

    shared = "a very long exactly matching passage of text here"
    rows = [
        (1, "prefix one " + shared),
        (2, shared + " suffix two"),
        (3, "completely unrelated content with nothing in common!"),
        (4, shared),  # near-dup of 1 and 2
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def fps(t, k=5, w=4):
        t = _re.sub(r"\s+", " ", t.lower())
        hs = (
            [h(t[i:i + k]) for i in range(len(t) - k + 1)]
            if len(t) >= k
            else []
        )
        if len(hs) < w:
            return set()
        return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}

    def twin(max_fp_freq, threshold):
        sets = {i: fps(t) for i, t in rows}
        if max_fp_freq is not None:
            freq = {}
            for s in sets.values():
                for f in s:
                    freq[f] = freq.get(f, 0) + 1
            sets = {
                i: {f for f in s if freq[f] <= max_fp_freq}
                for i, s in sets.items()
            }
        out = {}
        ids = sorted(sets)
        for x in ids:
            for y in ids:
                if x >= y or not sets[x] or not sets[y]:
                    continue
                c = len(sets[x] & sets[y])
                if not c:
                    continue
                jac = round(c / len(sets[x] | sets[y]), 6)
                if jac >= threshold:
                    out[(x, y)] = (c, jac)
        return out

    for cap in (None, 3):
        got = {
            (r["id_a"], r["id_b"]): (r["n_common"], r["fp_jaccard"])
            for r in winnow_dedup_pairs(
                df, k=5, w=4, threshold=0.05, max_fp_freq=cap,
                hash_fn="md5",
            ).collect()
        }
        assert got == twin(cap, 0.05), f"cap={cap}"
    assert (1, 4) in got and (2, 4) in got  # the planted near-dups


def test_winnow_dedup_pairs_cap_validation(spark):
    from xyzpy_spark.pipeline.dedup import winnow_dedup_pairs

    df = spark.createDataFrame([(1, "abcdefgh")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="max_fp_freq"):
        winnow_dedup_pairs(df, max_fp_freq=1)


def test_cdc_chunks_matches_python_twin_and_shift_tolerance(spark):
    """CDC boundaries are content-local: exact python-twin agreement
    plus the insertion-tolerance property (chunks after the edit
    point keep their hashes)."""
    import hashlib
    import re as _re

    from xyzpy_spark.pipeline.dedup import cdc_chunks

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base), (2, "xy"), (3, None), (4, "INSERT " + base)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {}
    for r in cdc_chunks(df, k=4, mask_bits=3, hash_fn="md5").collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_hash"], r["chunk_len"])
        )
    for v in got.values():
        v.sort()

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def twin(t, k=4, mb=3):
        t = _re.sub(r"\s+", " ", t.lower())
        cuts = (
            [
                i
                for i in range(1, len(t) - k + 2)
                if h(t[i - 1:i - 1 + k]) % (1 << mb) == 0
            ]
            if len(t) >= k
            else []
        )
        bnds = [0] + [i + k - 1 for i in cuts] + [len(t)]
        out = []
        for j in range(1, len(bnds)):
            ln = bnds[j] - bnds[j - 1]
            if ln >= 1:
                out.append((j, h(t[bnds[j - 1]:bnds[j]]), ln))
        return out

    want = {
        i: twin(t) for i, t in rows if t is not None and twin(t)
    }
    assert got == want
    h1 = {c for _, c, _ in got[1]}
    h4 = {c for _, c, _ in got[4]}
    assert len(h1 & h4) >= len(h1) - 2  # only the edited front differs


def test_winnow_cdc_validate_params(spark):
    import pytest as _pytest

    from xyzpy_spark.pipeline.dedup import cdc_chunks, winnow_fingerprints

    df = spark.createDataFrame([(1, "abc")], "doc_id LONG, text STRING")
    with _pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with _pytest.raises(ValueError):
        cdc_chunks(df, mask_bits=0)
    with _pytest.raises(ValueError, match="hash_fn"):
        winnow_fingerprints(df, hash_fn="sha1")


def test_winnow_cdc_xxhash64_production_mode(spark):
    """The production (default) hash mode must execute and keep the
    structural invariants — every other test and the oracle gate use
    md5, so this is the xxhash64 branch's only coverage."""
    from xyzpy_spark.pipeline.dedup import cdc_chunks, winnow_fingerprints

    text = "the quick brown fox jumps over the lazy dog again"
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id LONG, text STRING"
    )
    fps = winnow_fingerprints(df, k=5, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] and by_doc[1] == by_doc[2]  # deterministic
    chunks = cdc_chunks(df, k=4, mask_bits=3).collect()
    lens = {}
    for r in chunks:
        lens.setdefault(r["doc_id"], 0)
        lens[r["doc_id"]] += r["chunk_len"]
    # chunks partition the canonicalized text exactly
    assert lens[1] == lens[2] == len(text)


def test_winnow_index_probe_matches_python_twin(spark):
    """Incremental winnowed dedup (r6 verdict ask #2): build the
    saved index over history, probe a new batch, and agree exactly
    with a pure-python twin of the capped-set Jaccard — including the
    dropped-table subtraction that keeps both operands in the capped
    domain."""
    import hashlib
    import re as _re

    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        winnow_against_index,
    )

    shared = "a very long exactly matching passage of text here"
    boiler = " copyright footer boilerplate everywhere"
    hist_rows = [
        (1, "prefix one " + shared + boiler),
        (2, shared + " suffix two" + boiler),
        (3, "completely unrelated content with nothing in common!" + boiler),
    ]
    new_rows = [
        (10, shared + boiler),          # near-dup of 1 and 2
        (11, "fresh unseen words zebra quartz jumble vortex kayak"),
        (12, "xy"),                     # too short to fingerprint
        (13, hist_rows[2][1]),          # exact dup of 3 -> jaccard 1.0
    ]
    hist = spark.createDataFrame(hist_rows, "doc_id LONG, text STRING")
    new = spark.createDataFrame(new_rows, "doc_id LONG, text STRING")

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def fps(t, k=5, w=4):
        t = _re.sub(r"\s+", " ", t.lower())
        hs = (
            [h(t[i:i + k]) for i in range(len(t) - k + 1)]
            if len(t) >= k
            else []
        )
        if len(hs) < w:
            return set()
        return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}

    def twin(cap, threshold):
        hsets = {i: fps(t) for i, t in hist_rows}
        nsets = {i: fps(t) for i, t in new_rows}
        freq = {}
        for s in hsets.values():
            for f in s:
                freq[f] = freq.get(f, 0) + 1
        drop = {f for f, c in freq.items() if c > cap}
        hsets = {i: s - drop for i, s in hsets.items()}
        nsets = {i: s - drop for i, s in nsets.items()}
        out = {}
        for nid, ns in nsets.items():
            best = None
            for hid in sorted(hsets):
                hs = hsets[hid]
                if not ns or not hs:
                    continue
                c = len(ns & hs)
                if not c:
                    continue
                jac = round(c / len(ns | hs), 6)
                if jac >= threshold and (
                    best is None or jac > best[1]
                ):
                    best = (hid, jac)
            out[nid] = best
        return out

    cap, threshold = 2, 0.05
    index, dropped = build_winnow_index(
        hist, k=5, w=4, max_fp_freq=cap, hash_fn="md5"
    )
    # the boilerplate appears in all 3 hist docs > cap=2 -> dropped
    assert dropped.count() > 0
    got = {
        r["doc_id"]: (
            None
            if r["dup_of"] is None
            else (r["dup_of"], r["fp_jaccard"], r["dup_kind"])
        )
        for r in winnow_against_index(
            new, index, dropped=dropped, threshold=threshold,
            k=5, w=4, max_fp_freq=cap, hash_fn="md5",
        ).collect()
    }
    want = {
        nid: (None if b is None else (b[0], b[1], "near"))
        for nid, b in twin(cap, threshold).items()
    }
    assert got == want
    assert got[10] is not None and got[10][0] in (1, 2)
    assert got[11] is None and got[12] is None
    assert got[13] == (3, 1.0, "near")  # exact dup scores 1.0


def test_winnow_index_validates_stamped_params(spark):
    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        winnow_against_index,
    )

    hist = spark.createDataFrame(
        [(1, "some history document text goes right here")],
        "doc_id LONG, text STRING",
    )
    new = spark.createDataFrame(
        [(2, "some new document text")], "doc_id LONG, text STRING"
    )
    index, dropped = build_winnow_index(hist, k=5, w=4, hash_fn="md5")
    with pytest.raises(ValueError, match="do not match the probe"):
        winnow_against_index(new, index, k=6, w=4, hash_fn="md5")
    with pytest.raises(ValueError, match="do not match the probe"):
        winnow_against_index(
            new, index, k=5, w=4, hash_fn="md5", max_fp_freq=7
        )


def test_ivf_pq_topk_portable_exact_pin_and_recall(spark):
    """The portable residual IVF-PQ twin (r8 verdict ask #4): with a
    shortlist covering every probed candidate, the PQ stage decides
    nothing and the exact-int re-rank must equal the IVF-Flat portable
    tier EXACTLY (same seed -> same centroids, same probe, same exact
    cosine) — an end-to-end pin of the composition's plumbing.  At the
    default shortlist the residual reconstruction drives the ranking;
    it must stay deterministic across runs and retain recall against
    the IVF tier on this near-uniform fixture (the clustered-data
    advantage is pinned separately above)."""
    from pyspark.sql import functions as F

    from xyzpy_spark.pipeline.similarity import (
        ivf_pq_topk_portable,
        ivf_topk_portable,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    kw = dict(k=5, n_cells=8, nprobe=4)
    ivf = {tuple(r) for r in ivf_topk_portable(emb, q, **kw).collect()}
    full = {
        tuple(r)
        for r in ivf_pq_topk_portable(
            emb, q, m=8, ksub=8, shortlist=10**6, **kw
        ).collect()
    }
    assert full == ivf and len(ivf) == 25
    got1 = [
        tuple(r)
        for r in ivf_pq_topk_portable(
            emb, q, m=8, ksub=8, shortlist=20, **kw
        ).collect()
    ]
    got2 = [
        tuple(r)
        for r in ivf_pq_topk_portable(
            emb, q, m=8, ksub=8, shortlist=20, **kw
        ).collect()
    ]
    assert sorted(got1) == sorted(got2)  # deterministic
    pairs = {(g[0], g[1]) for g in got1}
    ivf_pairs = {(g[0], g[1]) for g in ivf}
    # random vectors are PQ's worst case; the floor pins sanity, the
    # clustered-regime quality contract lives in the residual tests
    assert len(pairs & ivf_pairs) / len(ivf_pairs) >= 0.15


def test_ivf_pq_residual_recall_tighter_shortlist(spark):
    """Residual-encoded IVF-PQ (r6 verdict ask #3, the Jegou et al.
    construction) on CLUSTERED data — the regime the construction is
    for: residuals inside tight cells span a far smaller volume, so
    with the SAME m/ksub budget residual codes must beat the
    raw-vector composition's recall at HALF the shortlist (10 vs 20),
    and the exact re-rank still returns exact cosines.  (On
    near-uniform data — the sf embeddings fixture — cells are loose,
    residual magnitude ~ raw magnitude, and the two encodings tie;
    measured res 0.48 / raw 0.50-0.66 there, which is why this test
    plants clusters: the advantage is a property of clustered
    corpora, exactly as the paper frames it.)"""
    import numpy as np

    from xyzpy_spark.pipeline.similarity import (
        ivf_build,
        ivf_pq_build,
        ivf_pq_topk,
        pq_build,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 64)) * 3.0
    emb = spark.createDataFrame(
        [
            (i, [float(x) for x in centers[i % 8] + rng.normal(size=64) * 0.4])
            for i in range(400)
        ],
        "vec_id long, embedding array<double>",
    ).persist()
    queries = emb.where(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5).collect()

    assigned, cents_raw = ivf_build(emb, n_cells=8, kmeans_iters=2)
    coded_raw, cbs_raw = pq_build(
        assigned, m=16, ksub=16, kmeans_iters=2
    )
    coded_raw = coded_raw.persist()
    raw20 = ivf_pq_topk(
        coded_raw, cents_raw, cbs_raw, queries, k=5, nprobe=4,
        shortlist=20,
    ).collect()
    raw10 = ivf_pq_topk(
        coded_raw, cents_raw, cbs_raw, queries, k=5, nprobe=4,
        shortlist=10,
    ).collect()
    coded_raw.unpersist()

    coded_res, cents, cbs = ivf_pq_build(
        emb, n_cells=8, m=16, ksub=16, kmeans_iters=2
    )
    coded_res = coded_res.persist()
    res = ivf_pq_topk(
        coded_res, cents, cbs, queries, k=5, nprobe=4, shortlist=10,
        residual=True,
    ).collect()
    coded_res.unpersist()
    emb.unpersist()

    def recall(rows):
        ex, ap = {}, {}
        for r in exact:
            ex.setdefault(r["query_id"], set()).add(r["nbr_id"])
        for r in rows:
            ap.setdefault(r["query_id"], set()).add(r["nbr_id"])
        rs = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
        return sum(rs) / len(rs)

    r_res = recall(res)
    # the headline claim: half the shortlist, no recall loss
    # (1e-9: the recall() mean accumulates float noise on exact ties)
    assert r_res >= recall(raw20) - 1e-9, (r_res, recall(raw20))
    # and at EQUAL budget the residual codes win decisively (measured
    # 0.69 vs 0.40 on this fixture)
    assert r_res >= recall(raw10) + 0.15, (r_res, recall(raw10))
    exc = {(r["query_id"], r["nbr_id"]): r["cosine"] for r in exact}
    for r in res:
        if (r["query_id"], r["nbr_id"]) in exc:
            assert r["cosine"] == exc[(r["query_id"], r["nbr_id"])]


def test_ivf_pq_residual_codes_reconstruct_better(spark):
    """The construction's premise, asserted directly: per-vector
    reconstruction error of residual codes must beat raw-vector codes
    under the same budget (mean squared error over the corpus)."""
    import numpy as np

    from xyzpy_spark.pipeline.similarity import (
        ivf_build,
        ivf_pq_build,
        pq_build,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def mse(coded_rows, cbs, cents=None):
        errs = []
        for r in coded_rows:
            v = np.array(r["embedding"], dtype=float)
            rec = np.concatenate(
                [np.array(cbs[j][c]) for j, c in enumerate(r["codes"])]
            )
            if cents is not None:
                rec = rec + np.array(cents[r["cell"]])
            errs.append(float(((v - rec) ** 2).mean()))
        return sum(errs) / len(errs)

    assigned, cents = ivf_build(emb, n_cells=8, kmeans_iters=1)
    coded_raw, cbs_raw = pq_build(assigned, m=16, ksub=16, kmeans_iters=1)
    raw_mse = mse(coded_raw.collect(), cbs_raw)
    coded_res, cents_r, cbs_res = ivf_pq_build(
        emb, n_cells=8, m=16, ksub=16, kmeans_iters=1
    )
    res_mse = mse(coded_res.collect(), cbs_res, cents_r)
    assert res_mse < raw_mse, (res_mse, raw_mse)


def test_pq_mode_stamp_validated(spark, tmp_path):
    """Coding-mode guard (r7 ADVICE): pq_build stamps pq_mode='raw'
    and ivf_pq_build stamps 'residual' in the codes column METADATA;
    a search run under the wrong reconstruction raises by name instead
    of silently returning degraded approximate scores.  The stamp must
    survive a parquet save/load — the saved-index production path."""
    from xyzpy_spark.pipeline.similarity import (
        ivf_pq_build,
        ivf_pq_topk,
        pq_build,
        pq_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)

    coded_res, cents, cbs = ivf_pq_build(emb, n_cells=4, m=8, ksub=8)
    # residual index searched as raw -> raise
    with pytest.raises(ValueError, match="pq_mode"):
        ivf_pq_topk(coded_res, cents, cbs, queries, k=3, residual=False)
    with pytest.raises(ValueError, match="pq_mode"):
        pq_topk(coded_res, cbs, queries, k=3)
    # raw corpus searched as residual -> raise
    from xyzpy_spark.pipeline.similarity import ivf_build

    assigned, cents_raw = ivf_build(emb, n_cells=4)
    coded_raw, cbs_raw = pq_build(assigned, m=8, ksub=8)
    with pytest.raises(ValueError, match="pq_mode"):
        ivf_pq_topk(
            coded_raw, cents_raw, cbs_raw, queries, k=3, residual=True
        )
    # matched modes search fine, and the stamp survives parquet
    p = str(tmp_path / "pq_index")
    coded_res.write.parquet(p)
    reloaded = spark.read.parquet(p)
    assert (
        dict(reloaded.schema["codes"].metadata)["pq_mode"] == "residual"
    )
    got = ivf_pq_topk(
        reloaded, cents, cbs, queries, k=3, residual=True
    )
    assert got.count() > 0


def test_winnow_index_capped_probe_requires_dropped(spark):
    """Probing a max_fp_freq-built index WITHOUT its dropped table
    silently deflates every Jaccard (the batch keeps boilerplate the
    index dropped), so it must raise by name (r7 code-review); an
    uncapped index probes fine without one."""
    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        winnow_against_index,
    )

    hist = spark.createDataFrame(
        [(1, "some history document text goes right here")],
        "doc_id LONG, text STRING",
    )
    new = spark.createDataFrame(
        [(2, "some new document text")], "doc_id LONG, text STRING"
    )
    index, dropped = build_winnow_index(hist, k=5, w=4, hash_fn="md5")
    with pytest.raises(ValueError, match="dropped"):
        winnow_against_index(new, index, k=5, w=4, hash_fn="md5")
    # with the table: fine
    winnow_against_index(
        new, index, dropped=dropped, k=5, w=4, hash_fn="md5"
    ).collect()
    # uncapped build: no dropped table needed
    index2, _ = build_winnow_index(
        hist, k=5, w=4, max_fp_freq=None, hash_fn="md5"
    )
    winnow_against_index(
        new, index2, k=5, w=4, max_fp_freq=None, hash_fn="md5"
    ).collect()


def test_incremental_probes_accept_string_ids(spark):
    """Both incremental probes are parameterized by id_col; STRING
    ids (URL/hash keys, the common corpus case) must work — the old
    tie-break negated the id arithmetically, which NULLs (or, under
    ANSI, rejects) non-numeric ids (r7 code-review)."""
    from xyzpy_spark.pipeline.dedup import (
        build_dedup_index,
        build_winnow_index,
        dedup_against_index,
        winnow_against_index,
    )

    shared = "a very long exactly matching passage of text here ok"
    hist = spark.createDataFrame(
        [("h-b", shared), ("h-a", shared), ("h-z", "totally different words")],
        "doc_id STRING, text STRING",
    )
    new = spark.createDataFrame(
        [("n-1", shared)], "doc_id STRING, text STRING"
    )
    widx, wdrop = build_winnow_index(hist, k=5, w=4, hash_fn="md5")
    got = winnow_against_index(
        new, widx, dropped=wdrop, k=5, w=4, threshold=0.5, hash_fn="md5"
    ).collect()[0]
    # ties (h-a and h-b identical) resolve to the SMALLEST id
    assert got["dup_of"] == "h-a" and got["fp_jaccard"] == 1.0

    midx = build_dedup_index(hist, n=2, hash_fn="md5")
    got2 = dedup_against_index(
        new, midx, n=2, threshold=0.4, hash_fn="md5"
    ).collect()[0]
    assert got2["dup_of"] == "h-a" and got2["dup_kind"] == "exact"


def test_cap_per_group_quota_semantics(spark):
    """Domain capping: groups over the cap keep exactly max_rows
    (deterministic salted-hash selection — same rows every run),
    groups under it pass through untouched, and changing the salt
    draws a different sample of the same size."""
    from xyzpy_spark.pipeline.sampling import cap_per_group

    rows = [(i, "big" if i < 47 else "small", f"t{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    capped = cap_per_group(df, 5, by="source", key="doc_id")
    got = capped.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"big": 5, "small": 3}  # small is under the cap
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in cap_per_group(
        df, 5, by="source", key="doc_id").collect())
    assert a == b  # deterministic
    c = sorted(r["doc_id"] for r in cap_per_group(
        df, 5, by="source", key="doc_id", salt="v2").collect())
    assert len(c) == len(a) and c != a  # salted redraw
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_rows"):
        cap_per_group(df, 0)


def test_cap_per_group_window_group_limit_plan(spark):
    """The rank <= k bound must reach WindowGroupLimit (Spark 4's
    map-side partial top-k per group) so a hot domain's rows never
    all sort in one task."""
    from xyzpy_spark.pipeline.sampling import cap_per_group
    from xyzpy_spark.plans.inspect import executed_plan

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    plan = executed_plan(cap_per_group(docs, 10))
    assert "WindowGroupLimit" in plan


def test_cap_per_group_order_col_keeps_best(spark):
    """order_col= keeps the TOP max_rows per group by the score
    (quality capping) instead of a random hash sample; ascending mode
    keeps the lowest."""
    from xyzpy_spark.pipeline.sampling import cap_per_group

    rows = [(i, "s", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    top = sorted(
        r["doc_id"]
        for r in cap_per_group(df, 3, order_col="q").collect()
    )
    assert top == [7, 8, 9]
    low = sorted(
        r["doc_id"]
        for r in cap_per_group(
            df, 3, order_col="q", descending=False
        ).collect()
    )
    assert low == [0, 1, 2]


def test_cap_per_group_guards(spark):
    """Mode-conflict params raise eagerly; a NULL key raises IN the
    job (partition-order-dependent selection must never run)."""
    from xyzpy_spark.pipeline.sampling import cap_per_group

    df = spark.createDataFrame(
        [(1, "s", 1.0), (None, "s", 2.0)],
        "doc_id long, source string, q double",
    )
    with pytest.raises(ValueError, match="salt"):
        cap_per_group(df, 1, order_col="q", salt="v2")
    with pytest.raises(ValueError, match="descending"):
        cap_per_group(df, 1, descending=False)
    with pytest.raises(Exception, match="contains NULLs"):
        cap_per_group(df, 1).collect()


def test_funnel_within_validation(spark):
    """Malformed / negative / quote-bearing within= strings raise an
    eager ValueError at the call site, not a ParseException at
    action time."""
    from xyzpy_spark.operators.temporal import funnel_counts

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "view")],
        "user_id long, ts_s string, event_type string",
    ).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
    )
    for bad in ("one week", "-1 day", "7' days"):
        with pytest.raises(ValueError, match="INTERVAL"):
            funnel_counts(ev, ["view"], within=bad)


def test_weighted_sample_matches_python_twin_and_proportionality(spark):
    """weighted_sample (Efraimidis-Spirakis A-ES) in the portable
    pow2 mode must select EXACTLY the ids a python twin (hashlib md5
    + math.sqrt — bit-exact, since IEEE sqrt is correctly rounded)
    selects, globally and per group; heavier weights must dominate
    the selected set (~proportional representation)."""
    import collections
    import hashlib
    import math

    from xyzpy_spark.pipeline.sampling import weighted_sample

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "source")
        .withColumn(
            "w",
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 4 AS INT))"
            ),
        )
    )
    rows = docs.collect()

    def prio(doc_id, w):
        u = (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
            / 4294967296.0
        )
        for _ in range(int(w).bit_length() - 1):
            u = math.sqrt(u)
        return u

    want = sorted(
        rows, key=lambda r: (-prio(r["doc_id"], r["w"]), r["doc_id"])
    )[:50]
    got = weighted_sample(
        docs, 50, "w", key="doc_id", pow2_weights=True
    ).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(
        r["doc_id"] for r in want
    )
    hist = collections.Counter(r["w"] for r in got)
    assert hist[8] > hist[1]  # weight-proportional selection

    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    sel = set()
    for rs in by_src.values():
        rs.sort(key=lambda r: (-prio(r["doc_id"], r["w"]), r["doc_id"]))
        sel |= {r["doc_id"] for r in rs[:10]}
    gotg = {
        r["doc_id"]
        for r in weighted_sample(
            docs, 10, "w", key="doc_id", by="source", pow2_weights=True
        ).collect()
    }
    assert gotg == sel


def test_weighted_sample_validates(spark):
    from xyzpy_spark.pipeline.sampling import weighted_sample

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id")
        .limit(10)
    )
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(docs.withColumn("w", F.lit(1)), 0, "w")
    # non-pow2 weight raises IN-JOB in the portable mode
    bad = docs.withColumn("w", F.lit(3).cast("long"))
    with pytest.raises(Exception, match="power-of-two"):
        weighted_sample(bad, 5, "w", pow2_weights=True).collect()
    # zero/negative weights raise in-job in either mode
    zero = docs.withColumn("w", F.lit(0).cast("long"))
    with pytest.raises(Exception, match="positive"):
        weighted_sample(zero, 5, "w").collect()


def test_winnow_index_saved_layout_parity(spark, tmp_path):
    """save_winnow_index/load_winnow_index round-trip: probing the
    partition-prunable on-disk layout (fp_bucket partitions +
    stamped bucket count) must return exactly the inline index's
    annotations."""
    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        load_winnow_index,
        save_winnow_index,
        winnow_against_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    index, dropped = build_winnow_index(
        corpus, k=6, w=5, max_fp_freq=50, hash_fn="md5"
    )
    p = str(tmp_path / "widx")
    save_winnow_index(index, dropped, p, fp_buckets=32)
    idx2, drp2 = load_winnow_index(spark, p)
    kw = dict(k=6, w=5, max_fp_freq=50, threshold=0.2, hash_fn="md5")
    a = sorted(
        map(
            tuple,
            winnow_against_index(
                batch, index, dropped=dropped, **kw
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            winnow_against_index(
                batch, idx2, dropped=drp2, **kw
            ).collect(),
        )
    )
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="fp_buckets"):
        save_winnow_index(index, dropped, p, fp_buckets=1)


def test_extend_winnow_index_matches_full_rebuild(spark, tmp_path):
    """Incremental index growth (r11): build+save over corpus A,
    extend_winnow_index with two deltas (O(delta) writes, uncapped
    segments), and the LOADED pair must probe bit-for-bit like a
    from-scratch rebuild over A + both deltas — including
    fingerprints that cross the frequency cap only once the deltas'
    counts arrive (the global-cap monotonicity the consolidation
    relies on), whose docs' n_fp the load recomputes exactly."""
    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        compact_winnow_index,
        extend_winnow_index,
        load_winnow_index,
        save_winnow_index,
        winnow_against_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus_a = docs.where(F.col("doc_id") % 10 < 4)
    delta_b = docs.where(F.col("doc_id") % 10 == 4)
    delta_c = docs.where(F.col("doc_id") % 10 == 5)
    batch = docs.where(F.col("doc_id") % 10 == 9)
    kw = dict(k=6, w=5, max_fp_freq=5, hash_fn="md5")

    p = str(tmp_path / "widx")
    index, dropped = build_winnow_index(corpus_a, **kw)
    save_winnow_index(index, dropped, p, fp_buckets=32)
    assert extend_winnow_index(delta_b, p) == 0
    assert extend_winnow_index(delta_c, p) == 1

    full = corpus_a.unionByName(delta_b).unionByName(delta_c)
    ridx, rdrp = build_winnow_index(full, **kw)
    lidx, ldrp = load_winnow_index(spark, p)

    # the consolidated capped domain equals the rebuild's exactly —
    # including fingerprints that crossed the cap only with the deltas
    assert sorted(r[0] for r in ldrp.collect()) == sorted(
        r[0] for r in rdrp.collect()
    )
    extra_dropped = ldrp.join(dropped, "fingerprint", "left_anti").count()
    assert extra_dropped > 0, "cap 5 chosen to force delta crossings"

    pkw = dict(k=6, w=5, max_fp_freq=5, threshold=0.2, hash_fn="md5")
    want = sorted(
        map(
            tuple,
            winnow_against_index(
                batch, ridx, dropped=rdrp, **pkw
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            winnow_against_index(
                batch, lidx, dropped=ldrp, **pkw
            ).collect(),
        )
    )
    assert got == want and len(got) > 0

    # compact folds the segments back into the flat DPP layout: the
    # segments dir is gone, fp_bucket partitioning is back, and the
    # probe result is unchanged
    compact_winnow_index(spark, p, fp_buckets=32)
    import glob as _glob

    assert not _glob.glob(str(tmp_path / "widx" / "segments" / "seg=*"))
    cidx, cdrp = load_winnow_index(spark, p)
    assert "fp_bucket" in cidx.columns
    after = sorted(
        map(
            tuple,
            winnow_against_index(
                batch, cidx, dropped=cdrp, **pkw
            ).collect(),
        )
    )
    assert after == want
    # a second compact is a no-op
    compact_winnow_index(spark, p, fp_buckets=32)
    assert sorted(
        r[0] for r in load_winnow_index(spark, p)[1].collect()
    ) == sorted(r[0] for r in rdrp.collect())


def test_fold_winnow_segments_matches_consolidation(spark, tmp_path):
    """The incremental fold (r13, the per-epoch serve path of the
    streaming ingest) must produce EXACTLY the pair a full
    load_winnow_index consolidation returns over the same segments —
    kept rows, adjusted n_fp and the monotone dropped set all agree,
    including fingerprints that cross the frequency cap only via the
    folded segments (the cap-crossing adjustment path) — and folding
    in two bites (B then B+C against the one-bite B+C) agrees too."""
    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        extend_winnow_index,
        fold_winnow_segments,
        load_winnow_index,
        read_committed_segments,
        save_winnow_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus_a = docs.where(F.col("doc_id") % 10 < 4)
    delta_b = docs.where(F.col("doc_id") % 10 == 4)
    delta_c = docs.where(F.col("doc_id") % 10 == 5)
    kw = dict(k=6, w=5, max_fp_freq=5, hash_fn="md5")

    p = str(tmp_path / "widx")
    index, dropped = build_winnow_index(corpus_a, **kw)
    save_winnow_index(index, dropped, p, fp_buckets=32)
    base_idx, base_drp = load_winnow_index(spark, p)  # pre-segment
    assert extend_winnow_index(delta_b, p) == 0
    assert extend_winnow_index(delta_c, p) == 1

    def _segs(upto):
        return read_committed_segments(spark, p, hi=upto)

    def _pair_key(idx, drp):
        rows = sorted(
            map(
                tuple,
                idx.select("doc_id", "fingerprint", "n_fp").collect(),
            )
        )
        return rows, sorted(r[0] for r in drp.collect())

    # one-bite fold over both segments == full consolidation
    fidx, fdrp = fold_winnow_segments(base_idx, base_drp, _segs(2))
    cidx, cdrp = load_winnow_index(spark, p)
    assert _pair_key(fidx, fdrp) == _pair_key(cidx, cdrp)
    # the cap 5 forces crossings that only the deltas trigger — the
    # fold's adjustment path must actually fire
    assert fdrp.join(base_drp, "fingerprint", "left_anti").count() > 0

    # as-of view: fold over segment 0 only == load(before_seg=1)
    fidx1, fdrp1 = fold_winnow_segments(base_idx, base_drp, _segs(1))
    aidx1, adrp1 = load_winnow_index(spark, p, before_seg=1)
    assert _pair_key(fidx1, fdrp1) == _pair_key(aidx1, adrp1)

    # the bucketed shape survives a fold from the flat layout (no
    # pre-run segments): DPP columns stay and agree with fingerprints
    assert {"fp_bucket", "fp_buckets"} <= set(fidx.columns)
    bad = fidx.where(
        F.col("fp_bucket") != F.pmod(F.col("fingerprint"), F.lit(32))
    ).count()
    assert bad == 0


def test_decode_media_high_precision_lossless(spark):
    """The multimodal plumbing serves 16-bit lossless natively: real
    decoded stats (n_values, exact integer-sum mean over the uint16
    samples) through decode_media, and full pixel values through
    decode_image — no PIL, no nulls (r11)."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import encode_jpeg_lossless
    from xyzpy_spark.pipeline.multimodal import decode_image, decode_media

    rng = np.random.default_rng(14)
    imgs = {
        0: rng.integers(0, 1 << 12, (5, 4), dtype=np.uint16),
        1: rng.integers(0, 1 << 16, (3, 6), dtype=np.uint16),
    }
    df = spark.createDataFrame(
        [
            (0, bytearray(encode_jpeg_lossless(imgs[0], precision=12))),
            (1, bytearray(encode_jpeg_lossless(imgs[1], precision=16))),
        ],
        "media_id long, media binary",
    )
    met = {r["media_id"]: r["decoded"] for r in decode_media(df).collect()}
    for i, a in imgs.items():
        m = met[i]
        assert m["format"] == "jpeg"
        assert (m["width"], m["height"]) == (a.shape[1], a.shape[0])
        assert m["n_values"] == a.size
        assert m["mean_value"] == int(a.sum(dtype="int64")) / a.size
    pix = {r["media_id"]: r["pixels"] for r in decode_image(df).collect()}
    for i, a in imgs.items():
        assert pix[i] == a.ravel().astype("int64").tolist()


def test_extend_winnow_index_validates(spark, tmp_path):
    """extend refuses an unstamped/empty saved index (the params to
    winnow the delta with would be guesses — a delta winnowed
    differently poisons every future probe)."""
    from xyzpy_spark.pipeline.dedup import extend_winnow_index

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "bad")
    docs.selectExpr(
        "doc_id", "cast(doc_id as bigint) as fingerprint"
    ).write.parquet(p + "/main")
    with pytest.raises(ValueError, match="stamped"):
        extend_winnow_index(docs, p)


def test_extend_dedup_index_matches_full_rebuild(spark, tmp_path):
    """Incremental MinHash-index growth (r11, extend_winnow_index's
    sibling): appending a delta's signature + band rows into the
    saved bucket layout is EXACTLY the full rebuild — no global
    state (no frequency cap) means plain additive append; the loaded
    pair must probe bit-for-bit like build-over-everything, and the
    appended files must land inside the existing fp_bucket/bb_bucket
    partition dirs (DPP keeps working)."""
    import glob as _glob

    from xyzpy_spark.pipeline.dedup import (
        band_dedup_index,
        build_dedup_index,
        dedup_against_index,
        extend_dedup_index,
        load_dedup_index,
        save_dedup_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus_a = docs.where(F.col("doc_id") % 10 < 5)
    delta_b = docs.where((F.col("doc_id") % 10).between(5, 8))
    batch = docs.where(F.col("doc_id") % 10 == 9)
    kw = dict(n=2, hash_fn="md5")

    p = str(tmp_path / "didx")
    index = build_dedup_index(corpus_a, **kw)
    save_dedup_index(
        index, band_dedup_index(index, **kw), p,
        fp_buckets=16, bb_buckets=16,
    )
    extend_dedup_index(delta_b, p)

    full = corpus_a.unionByName(delta_b)
    ridx = build_dedup_index(full, **kw)
    rbands = band_dedup_index(ridx, **kw)
    lidx, lbands = load_dedup_index(spark, p)

    pkw = dict(threshold=0.3, **kw)
    want = sorted(
        map(
            tuple,
            dedup_against_index(
                batch, ridx, index_bands=rbands, **pkw
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            dedup_against_index(
                batch, lidx, index_bands=lbands, **pkw
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    # delta rows really landed (both sides of the pair grew) and the
    # layout stayed partitioned (no stray flat files at the roots)
    assert lidx.count() == ridx.count()
    assert lbands.count() == rbands.count()
    assert not _glob.glob(str(tmp_path / "didx" / "main" / "part-*"))
    assert not _glob.glob(str(tmp_path / "didx" / "bands" / "part-*"))

    # guard: an index saved WITHOUT the n/hash_fn stamps cannot be
    # extended (the delta would be signed by guesswork)
    p2 = str(tmp_path / "didx2")
    save_dedup_index(
        index, band_dedup_index(index), p2, fp_buckets=16, bb_buckets=16
    )
    with pytest.raises(ValueError, match="stamped"):
        extend_dedup_index(delta_b, p2)


def test_winnow_index_load_skips_uncommitted_segment(spark, tmp_path):
    """A crashed mid-extend leaves a segment dir without _SUCCESS;
    consolidation must skip it (folding partial rows in would
    silently under-count that delta forever) — the committed-segment
    result is unchanged by the dead dir."""
    import os as _os

    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        extend_winnow_index,
        load_winnow_index,
        save_winnow_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 < 4)
    delta = docs.where(F.col("doc_id") % 10 == 4)
    p = str(tmp_path / "widx")
    index, dropped = build_winnow_index(
        corpus, k=6, w=5, max_fp_freq=5, hash_fn="md5"
    )
    save_winnow_index(index, dropped, p, fp_buckets=32)
    extend_winnow_index(delta, p)
    before = sorted(
        map(tuple, load_winnow_index(spark, p)[0].collect())
    )
    # simulate the crash: a parquet-bearing seg dir with no _SUCCESS
    ghost = _os.path.join(p, "segments", "seg=9")
    delta.limit(3).selectExpr(
        "doc_id", "cast(doc_id as bigint) as fingerprint"
    ).write.parquet(ghost)
    _os.remove(_os.path.join(ghost, "_SUCCESS"))
    after = sorted(
        map(tuple, load_winnow_index(spark, p)[0].collect())
    )
    assert after == before


def test_extend_dedup_index_retry_idempotent(spark, tmp_path):
    """The two per-directory appends of extend_dedup_index are not
    atomic as a pair (r11 ADVICE): a crash between them leaves main
    extended without its banded rows, and a naive retry would
    double-append the delta into main.  The r12 retry detection
    (bucket-pruned anti-join of the delta's ids against each
    directory) must make (a) a full re-run of a completed extend a
    no-op and (b) a retry after the simulated crash complete ONLY
    the missing bands side — both landing bit-for-bit on the
    full-rebuild probe."""
    import glob as _glob
    import os as _os

    from xyzpy_spark.pipeline.dedup import (
        band_dedup_index,
        build_dedup_index,
        dedup_against_index,
        extend_dedup_index,
        load_dedup_index,
        save_dedup_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus_a = docs.where(F.col("doc_id") % 10 < 5)
    delta_b = docs.where((F.col("doc_id") % 10).between(5, 8))
    batch = docs.where(F.col("doc_id") % 10 == 9)
    kw = dict(n=2, hash_fn="md5")

    p = str(tmp_path / "didx")
    index = build_dedup_index(corpus_a, **kw)
    save_dedup_index(
        index, band_dedup_index(index, **kw), p,
        fp_buckets=16, bb_buckets=16,
    )

    def snap(sub):
        return set(
            _glob.glob(_os.path.join(p, sub, "*", "part-*"))
        )

    main_before, bands_before = snap("main"), snap("bands")
    extend_dedup_index(delta_b, p)
    main_once, bands_once = snap("main"), snap("bands")
    assert main_once > main_before and bands_once > bands_before

    # (a) redelivered delta after a COMPLETED extend: both sides no-op
    extend_dedup_index(delta_b, p)
    lidx, lbands = load_dedup_index(spark, p)
    assert lidx.count() == build_dedup_index(
        corpus_a.unionByName(delta_b), **kw
    ).count()
    assert snap("main") == main_once and snap("bands") == bands_once

    # (b) simulated crash between the appends: roll the bands side
    # back to its pre-extend files, then retry — main must not grow,
    # bands must be completed, and the probe equals the full rebuild
    for f in snap("bands") - bands_before:
        _os.remove(f)
    extend_dedup_index(delta_b, p)
    assert snap("main") == main_once
    lidx, lbands = load_dedup_index(spark, p)
    full = corpus_a.unionByName(delta_b)
    ridx = build_dedup_index(full, **kw)
    rbands = band_dedup_index(ridx, **kw)
    pkw = dict(threshold=0.3, **kw)
    want = sorted(
        map(
            tuple,
            dedup_against_index(
                batch, ridx, index_bands=rbands, **pkw
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            dedup_against_index(
                batch, lidx, index_bands=lbands, **pkw
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    assert lbands.count() == rbands.count()


def test_extend_dedup_index_intent_marker(spark, tmp_path):
    """The r14 intent-marker protocol (r13 verdict ask #2): a
    proven-first extend (marker created by this call) skips the retry
    anti-joins and must land bit-identically to the plain extend; a
    RETRY under the same token (marker already on disk) after a
    simulated crash must fall back to the anti-join path and complete
    only the missing rows — never double-append."""
    import glob as _glob
    import os as _os

    from xyzpy_spark.pipeline.dedup import (
        band_dedup_index,
        build_dedup_index,
        extend_dedup_index,
        load_dedup_index,
        save_dedup_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus_a = docs.where(F.col("doc_id") % 10 < 5)
    delta_b = docs.where((F.col("doc_id") % 10).between(5, 8))
    kw = dict(n=2, hash_fn="md5")

    p = str(tmp_path / "didx")
    index = build_dedup_index(corpus_a, **kw)
    save_dedup_index(
        index, band_dedup_index(index, **kw), p,
        fp_buckets=16, bb_buckets=16,
    )

    def snap(sub):
        return set(_glob.glob(_os.path.join(p, sub, "*", "part-*")))

    bands_before = snap("bands")
    # first attempt with an intent token: marker created, skip path
    extend_dedup_index(delta_b, p, intent="epoch-0")
    assert _os.path.exists(_os.path.join(p, "_intents", "epoch-0"))
    main_once, bands_once = snap("main"), snap("bands")
    lidx, _ = load_dedup_index(spark, p)
    want_n = build_dedup_index(
        corpus_a.unionByName(delta_b), **kw
    ).count()
    assert lidx.count() == want_n

    # simulated crash: roll bands back, then REPLAY under the SAME
    # token — the marker forces the anti-join path, main must not
    # grow, bands must be completed
    for f in snap("bands") - bands_before:
        _os.remove(f)
    extend_dedup_index(delta_b, p, intent="epoch-0")
    assert snap("main") == main_once
    lidx, lbands = load_dedup_index(spark, p)
    assert lidx.count() == want_n
    rbands = band_dedup_index(
        build_dedup_index(corpus_a.unionByName(delta_b), **kw), **kw
    )
    assert lbands.count() == rbands.count()

    # a full redelivery under the same token is likewise a no-op
    extend_dedup_index(delta_b, p, intent="epoch-0")
    assert snap("main") == main_once and snap("bands") == snap("bands")
    assert load_dedup_index(spark, p)[0].count() == want_n


def test_extend_winnow_index_pinned_seg_idempotent(spark, tmp_path):
    """extend_winnow_index(seg=N) is the epoch-to-segment mapping the
    streaming ingest leans on: a replayed epoch's extend (same seg id,
    already committed) must be a no-op, and a dead uncommitted dir
    with that id must be cleared and rewritten."""
    import os as _os

    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        extend_winnow_index,
        load_winnow_index,
        save_winnow_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 < 4)
    delta = docs.where(F.col("doc_id") % 10 == 4)
    delta2 = docs.where(F.col("doc_id") % 10 == 5)
    p = str(tmp_path / "widx")
    index, dropped = build_winnow_index(
        corpus, k=6, w=5, max_fp_freq=5, hash_fn="md5"
    )
    save_winnow_index(index, dropped, p, fp_buckets=32)

    assert extend_winnow_index(delta, p, seg=7) == 7
    once = sorted(map(tuple, load_winnow_index(spark, p)[0].collect()))
    # replay: committed seg=7 exists -> no-op, state unchanged
    assert extend_winnow_index(delta, p, seg=7) == 7
    assert (
        sorted(map(tuple, load_winnow_index(spark, p)[0].collect()))
        == once
    )
    # unpinned extends keep deriving past the pinned id
    assert extend_winnow_index(delta2, p) == 8

    # a dead (uncommitted) dir under the pinned id is rewritten
    ghost = _os.path.join(p, "segments", "seg=9")
    delta.limit(2).selectExpr(
        "doc_id", "cast(doc_id as bigint) as fingerprint"
    ).write.parquet(ghost)
    _os.remove(_os.path.join(ghost, "_SUCCESS"))
    assert extend_winnow_index(delta2, p, seg=9) == 9
    assert _os.path.exists(_os.path.join(ghost, "_SUCCESS"))

    # before_seg: the as-of view excludes later segments — state
    # after (seg<8) equals the single-delta extend exactly
    asof = sorted(
        map(
            tuple,
            load_winnow_index(spark, p, before_seg=8)[0].collect(),
        )
    )
    assert asof == once


def test_extend_winnow_index_detects_foreign_segment(spark, tmp_path):
    """A pinned-seg no-op must verify the committed segment is THIS
    delta's: a concurrent unpinned extend that claimed the id (a
    single-writer violation) would otherwise silently drop the
    delta forever (r12 review catch)."""
    from xyzpy_spark.pipeline.dedup import (
        build_winnow_index,
        extend_winnow_index,
        save_winnow_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 < 4)
    delta_a = docs.where(F.col("doc_id") % 10 == 4)
    delta_b = docs.where(F.col("doc_id") % 10 == 5)
    p = str(tmp_path / "widx")
    index, dropped = build_winnow_index(
        corpus, k=6, w=5, max_fp_freq=5, hash_fn="md5"
    )
    save_winnow_index(index, dropped, p, fp_buckets=32)
    # the "concurrent" writer claims seg 0 with delta_a...
    assert extend_winnow_index(delta_a, p) == 0
    # ...the pinned replay of delta_b against the stolen id fails fast
    with pytest.raises(ValueError, match="outside this delta"):
        extend_winnow_index(delta_b, p, seg=0)
    # a genuine replay of the SAME delta stays a clean no-op
    assert extend_winnow_index(delta_a, p, seg=0) == 0
