"""Unit tests for the trainable BPE tokenizer (pipeline/tokenizer.py),
triangulated against an independent pure-python reference BPE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xyzpy_spark.pipeline.tokenizer import EOW


def _ref_bpe(word_freqs: dict[str, int], num_merges: int, min_freq: int = 2):
    """Independent reference implementation (textbook Sennrich BPE)."""
    vocab = {
        tuple(list(w) + [EOW]): n for w, n in word_freqs.items() if w
    }
    merges = []
    for _ in range(num_merges):
        counts = {}
        for sym, freq in vocab.items():
            for p in zip(sym, sym[1:]):
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[pair] < min_freq:
            break
        merges.append(pair)
        new_vocab = {}
        for sym, freq in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and (sym[i], sym[i + 1]) == pair
                ):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest",
    "new newer newest",
    "low low low new new wider",
    "the newest lower deck",
]


@pytest.fixture(scope="module")
def bpe_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)],
        "doc_id LONG, text STRING",
    )


def test_train_bpe_matches_reference_implementation(spark, bpe_df):
    from xyzpy_spark.pipeline.tokenizer import train_bpe

    freqs: dict[str, int] = {}
    for t in TEXTS:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    for nm in (5, 20, 100):
        got = train_bpe(bpe_df, num_merges=nm, min_freq=2)
        want = _ref_bpe(freqs, nm)
        assert got == want, nm


def test_bpe_encode_roundtrip_and_consistency(spark, bpe_df):
    from xyzpy_spark.pipeline.tokenizer import bpe_encode, train_bpe

    merges = train_bpe(bpe_df, num_merges=50, min_freq=2)
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(bpe_df, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        toks = out[i]
        # lossless: stripping EOW and joining reconstructs the text
        rebuilt = "".join(toks).replace(EOW, " ").strip()
        assert rebuilt == t.lower()
        # frequent whole words end merged to a single token
    # 'low' appears 4x -> should be one token "low</w>"
    assert "low" + EOW in out[2]


def test_bpe_encode_null_and_unseen(spark):
    from xyzpy_spark.pipeline.tokenizer import bpe_encode, train_bpe

    train = spark.createDataFrame(
        [(0, "aaa aaa bbb")], "doc_id LONG, text STRING"
    )
    merges = train_bpe(train, num_merges=10, min_freq=1)
    probe = spark.createDataFrame(
        [(1, None), (2, "zzz")], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(probe, merges).collect()
    }
    assert got[1] is None
    # unseen word falls back to characters + EOW (no merge applies)
    assert got[2] == ["z", "z", "z", EOW]


def test_bpe_token_count_monotone_in_merges(spark, bpe_df):
    from xyzpy_spark.pipeline.tokenizer import bpe_token_count, train_bpe

    none = {
        r["doc_id"]: r["n_bpe_trained"]
        for r in bpe_token_count(bpe_df, []).collect()
    }
    many = {
        r["doc_id"]: r["n_bpe_trained"]
        for r in bpe_token_count(
            bpe_df, train_bpe(bpe_df, num_merges=100, min_freq=1)
        ).collect()
    }
    # more merges never increase the token count
    for k in none:
        assert many[k] <= none[k]


def test_train_bpe_cap_warns(spark):
    from xyzpy_spark.pipeline.tokenizer import train_bpe

    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(30)],
        "doc_id LONG, text STRING",
    )
    with pytest.warns(RuntimeWarning, match="max_words"):
        train_bpe(df, num_merges=5, min_freq=1, max_words=10)


def test_incremental_merges_equal_naive_on_random_tables():
    """Driver-only: the incremental pair-index loop must equal the
    naive full-recount loop on arbitrary word tables (including words
    with repeated pairs like 'aaaa')."""
    import random

    from xyzpy_spark.pipeline.tokenizer import _greedy_merges

    rng = random.Random(13)
    for trial in range(25):
        n_words = rng.randint(1, 40)
        freqs = {}
        for _ in range(n_words):
            w = "".join(
                rng.choice("aabbc") for _ in range(rng.randint(1, 8))
            )
            freqs[w] = freqs.get(w, 0) + rng.randint(1, 9)
        nm = rng.randint(1, 30)
        vocab = {
            tuple(list(w) + [EOW]): n for w, n in freqs.items()
        }
        got = _greedy_merges(dict(vocab), nm, 2)
        want = _ref_bpe(freqs, nm)
        assert got == want, (trial, freqs)


def test_bpe_encode_word_boundary_matches_trainer(spark):
    """Encode must split on the SAME ASCII whitespace class as the
    trainer's tokenize: a U+00A0-joined pair stays ONE word."""
    from xyzpy_spark.pipeline.tokenizer import bpe_encode, train_bpe

    df = spark.createDataFrame(
        [(0, "cafe bar cafe bar x")],
        "doc_id LONG, text STRING",
    )
    merges = train_bpe(df, num_merges=60, min_freq=2)
    toks = bpe_encode(df, merges).first()["bpe_tokens"]
    # the whole nbsp-joined word was trained and encodes to one token
    assert "cafe bar" + EOW in toks


def test_tokenized_sequences_match_python_twin(spark, bpe_df):
    """End-to-end text -> packed id sequences vs an independent
    python twin (same shard hash, doc order, vocab id assignment,
    cut points)."""
    import hashlib

    from xyzpy_spark.pipeline.tokenizer import (
        _encode_word,
        bpe_encode,
        tokenized_sequences,
        train_bpe,
    )

    merges = train_bpe(bpe_df, num_merges=30, min_freq=2)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    max_tokens, n_shards = 7, 2

    seqs, vocab = tokenized_sequences(
        bpe_df, merges, max_tokens=max_tokens, n_shards=n_shards
    )
    got = {
        (r["shard"], r["seq_id"]): list(r["input_ids"])
        for r in seqs.collect()
    }
    vid = {r["token"]: r["token_id"] for r in vocab.collect()}

    # python twin
    def enc_doc(t):
        out = []
        for w in t.lower().split():
            out.extend(_encode_word(w, ranks))
        return out

    texts = {i: t for i, t in enumerate(TEXTS)}
    # vocab twin: frequency desc, token asc
    from collections import Counter

    c = Counter()
    for t in texts.values():
        c.update(enc_doc(t))
    order = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    vid_py = {tok: i for i, (tok, _) in enumerate(order)}
    assert vid == vid_py

    def shard_of(doc_id):
        h = hashlib.md5(f"{doc_id}pack".encode()).hexdigest()[:15]
        return int((int(h, 16) / 16**15) * n_shards)

    expect = {}
    for sh in range(n_shards):
        stream = []
        for i in sorted(texts):
            if shard_of(i) == sh:
                stream.extend(vid_py[t] for t in enc_doc(texts[i]))
        for s in range(0, len(stream), max_tokens):
            expect[(sh, s // max_tokens)] = stream[s : s + max_tokens]
    assert got == expect


def test_export_tokenized_roundtrip(spark, bpe_df, tmp_path):
    from xyzpy_spark.pipeline.tokenizer import export_tokenized, train_bpe

    merges = train_bpe(bpe_df, num_merges=20, min_freq=2)
    out = export_tokenized(
        bpe_df, merges, str(tmp_path / "tok"), max_tokens=8, n_shards=2
    )
    rows = out.collect()
    assert rows and all(1 <= r["n_tokens"] <= 8 for r in rows)
    vocab = spark.read.parquet(str(tmp_path / "tok" / "_vocab"))
    assert vocab.count() > 0
    # shard pruning works at the source
    one = spark.read.parquet(str(tmp_path / "tok")).where("shard = 0")
    assert one.count() == sum(1 for r in rows if r["shard"] == 0)


def test_oov_rate_against_frozen_vocab(spark, bpe_df):
    from xyzpy_spark.pipeline.tokenizer import (
        bpe_encode,
        bpe_vocab,
        oov_rate,
        train_bpe,
    )

    merges = train_bpe(bpe_df, num_merges=30, min_freq=2)
    vocab = bpe_vocab(bpe_encode(bpe_df, merges))
    # same corpus -> zero OOV
    r = oov_rate(bpe_df, merges, vocab).collect()[0]
    assert r["n_oov"] == 0 and r["oov_rate"] == 0.0
    # novel characters -> some OOV under the frozen vocab
    novel = spark.createDataFrame(
        [(99, "zq zq xyzzy")], "doc_id LONG, text STRING"
    )
    r2 = oov_rate(novel, merges, vocab).collect()[0]
    assert r2["n_oov"] > 0
    assert 0 < r2["oov_rate"] <= 1.0


def test_save_load_merges_roundtrip(spark, tmp_path):
    from xyzpy_spark.pipeline.tokenizer import (
        bpe_encode,
        load_merges,
        save_merges,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(i, "low lower lowest newer newest " * 3) for i in range(6)],
        "doc_id LONG, text STRING",
    )
    merges = train_bpe(docs, num_merges=20, min_freq=2)
    p = str(tmp_path / "tok" / "merges.json")
    save_merges(merges, p)
    loaded = load_merges(p)
    assert loaded == merges
    a = sorted(
        tuple(r)
        for r in bpe_encode(docs, merges)
        .selectExpr("doc_id", "concat_ws('|', bpe_tokens) AS t")
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in bpe_encode(docs, loaded)
        .selectExpr("doc_id", "concat_ws('|', bpe_tokens) AS t")
        .collect()
    )
    assert a == b


def test_frozen_merges_sequential_consistency():
    """The frozen literal merge list that makes the bpe_token_count
    oracle SQL-expressible is only valid if rank-greedy encoding
    equals one replace-all pass per merge in training order, for ANY
    word.  Two guarantees pin that: (a) structurally, every pair's
    elements are single chars or products of STRICTLY EARLIER merges
    and all products are distinct (so a later pass can never recreate
    an earlier pass's pair), and (b) empirically, the two encoders
    agree on randomized words over the merge alphabet, including
    pathological self-overlap runs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from __spark_entry__ import _FROZEN_MERGES
    from xyzpy_spark.pipeline.tokenizer import EOW, _encode_word

    products = []
    for a, b in _FROZEN_MERGES:
        for el in (a, b):
            assert len(el) == 1 or el == EOW or el in products, (
                f"element {el!r} not a char or earlier product"
            )
        products.append(a + b)
    assert len(set(products)) == len(products), "duplicate products"
    assert not any(len(p) == 1 for p in products)
    assert not any(a.endswith(EOW) for a, _ in _FROZEN_MERGES)

    ranks = {tuple(m): i for i, m in enumerate(_FROZEN_MERGES)}

    def sequential(word):
        sym = list(word) + [EOW]
        for a, b in _FROZEN_MERGES:
            out, i = [], 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == a
                    and sym[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="erstowna", min_size=1, max_size=12))
    def check(word):
        assert sequential(word) == _encode_word(word, ranks)

    check()
    for w in ["erer", "eeee", "owowow", "stst", "ererer", "e", "r"]:
        assert sequential(w) == _encode_word(w, ranks)
