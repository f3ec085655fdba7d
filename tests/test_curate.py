"""Unit tests for the one-call curation recipe (pipeline/curate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away to the old mill by the river where it rests a while"
    )
    rows = [
        (1, base, "en", "web"),
        (2, base, "en", "web"),                       # exact dup of 1
        (3, "tiny doc", "en", "web"),                 # fails min_tokens
        (4, base.replace("fox", "cat"), "en", "web"),  # survives
        (5, "merge merge merge " + base, "en", "web"),  # blocklist hits
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING"
    )


@pytest.fixture(scope="module")
def reference(spark):
    rows = [
        (100, "clean reference prose about rivers and mills", "en", "ref"),
        (101, "more reference text with many common words", "en", "ref"),
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING"
    )


def test_curate_stages_and_report(spark, corpus, reference):
    from xyzpy_spark.pipeline.curate import curate_corpus

    out, stages = curate_corpus(
        corpus,
        reference_df=reference,
        min_tokens=10,
        min_quality=None,
        blocklist=["merge"],
        max_block_hits=0,
        report=True,
    )
    kept = {r["doc_id"] for r in out.collect()}
    # dup 2 dropped (keeper is min id 1); 3 fails min_tokens;
    # 5 fails blocklist
    assert kept == {1, 4}
    names = [s[0] for s in stages]
    assert names == ["input", "dedup_exact", "quality_rules", "blocklist"]
    counts = [s[1] for s in stages]
    assert counts[0] == 5
    # counts are monotone non-increasing through the funnel
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] == 2
    # original columns preserved
    assert out.columns == corpus.columns


def test_curate_lm_tail_drops_worst_bucket(spark, corpus, reference):
    from xyzpy_spark.pipeline.curate import curate_corpus

    full = curate_corpus(
        corpus,
        reference_df=reference,
        dedup=None,
        min_tokens=None,
        min_quality=None,
        lm_tail=True,
        lm_buckets=2,
    )
    kept = {r["doc_id"] for r in full.collect()}
    # all 5 docs are scoreable (even "tiny doc" has one bigram);
    # ntile(2) over 5 docs -> head bucket keeps 3, tail drops 2
    assert len(kept) == 3


def test_curate_decontaminate_uses_reference(spark, corpus):
    from xyzpy_spark.pipeline.curate import curate_corpus

    # reference leaking a 5-gram unique to doc 4 ("cat" variant) —
    # doc 1's "fox" spelling shares no 5-gram with it
    leak = spark.createDataFrame(
        [(999, "quick brown cat jumps over", "en", "ref")],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )
    out = curate_corpus(
        corpus,
        reference_df=leak,
        min_tokens=10,
        min_quality=None,
        decontaminate_n=5,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 4 not in kept
    assert 1 in kept


def test_curate_requires_reference_for_lm_stages(spark, corpus):
    from xyzpy_spark.pipeline.curate import curate_corpus

    with pytest.raises(ValueError, match="reference_df"):
        curate_corpus(corpus, lm_tail=True)
    with pytest.raises(ValueError, match="reference_df"):
        curate_corpus(corpus, decontaminate_n=5)
    with pytest.raises(ValueError, match="unknown dedup"):
        curate_corpus(corpus, dedup="fuzzy")


def test_curate_plan_is_lazy_single_action(spark, corpus, reference):
    """report=False composes one lazy plan — no count() actions."""
    from xyzpy_spark.pipeline.curate import curate_corpus

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = curate_corpus(
        corpus,
        reference_df=reference,
        min_tokens=5,
        min_quality=None,
        decontaminate_n=5,
    )
    # building the plan triggers at most the LM vocab count (none
    # here: lm_tail off) — no full-pipeline actions until we act
    after = len(tracker.getJobIdsForGroup() or [])
    assert after - before <= 1
    assert df.count() >= 0


def test_accessor_curate_report_mode(spark, corpus, reference):
    from xyzpy_spark.accessor import xyz

    wrapped, stages = xyz(corpus).curate(
        reference_df=reference,
        min_tokens=10,
        min_quality=None,
        report=True,
    )
    assert wrapped.df.count() == stages[-1][1]
    assert stages[0] == ("input", 5)


def test_curate_separate_lm_reference_and_eval(spark, corpus, reference):
    """The trusted LM corpus and the decontamination benchmark are
    different corpora in the standard pipeline: eval_df must drive the
    decontamination stage while reference_df only trains the LM (with
    a shared reference_df the API silently decontaminated against the
    LM corpus)."""
    from xyzpy_spark.pipeline.curate import curate_corpus

    # eval set leaks a 5-gram unique to doc 4 ("cat" variant); the LM
    # reference shares no 5-gram with any corpus doc
    evals = spark.createDataFrame(
        [(999, "quick brown cat jumps over", "en", "eval")],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )
    out = curate_corpus(
        corpus,
        reference_df=reference,
        eval_df=evals,
        min_tokens=10,
        min_quality=None,
        decontaminate_n=5,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 4 not in kept   # dropped via eval_df overlap
    assert 1 in kept       # untouched by the LM reference


def test_curate_accepts_pretrained_lm(spark, corpus, reference, tmp_path):
    """lm=(contexts, ngrams, vocab) skips the training job and must
    produce the identical curated set as inline training."""
    from xyzpy_spark.pipeline.curate import curate_corpus
    from xyzpy_spark.pipeline.lm import load_lm, save_lm, train_bigram_lm

    kw = dict(dedup=None, min_tokens=None, min_quality=None,
              lm_tail=True, lm_buckets=2)
    inline = {
        r["doc_id"]
        for r in curate_corpus(
            corpus, reference_df=reference, **kw
        ).collect()
    }
    c, g, v = train_bigram_lm(reference)
    save_lm(c, g, v, str(tmp_path / "lm"))
    c2, g2, v2, _ = load_lm(spark, str(tmp_path / "lm"))
    pre = {
        r["doc_id"]
        for r in curate_corpus(corpus, lm=(c2, g2, v2), **kw).collect()
    }
    assert pre == inline and len(pre) > 0


def test_curate_language_gate_heuristic_and_trained(spark):
    """languages= keeps only docs predicted in the set; the default
    scorer is the 5-language heuristic, and langid_model= routes
    through the trained broadcast-weight path."""
    from pyspark.sql import functions as F

    from xyzpy_spark.pipeline.curate import curate_corpus
    from xyzpy_spark.pipeline.text import train_langid_classifier

    rows = [
        (1, "the cat and the dog in the house", "x"),
        (2, "der hund und die katze ist nicht da", "x"),
        (3, "el perro y el gato en la casa de que", "x"),
        (4, "the dog is in the house and it is big", "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out, stages = curate_corpus(
        df,
        dedup=None,
        min_tokens=None,
        min_quality=None,
        languages=("en",),
        report=True,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {1, 4}
    assert ("language_id", 2) in stages
    assert out.columns == df.columns  # original columns only

    # trained path: a classifier fit on labeled en/de seed docs
    labeled = spark.createDataFrame(
        [
            (10, "en", "the and of to in is it the and of"),
            (11, "en", "that it for was with the and is"),
            (12, "de", "der die und ist das nicht mit sich"),
            (13, "de", "auf für wird eine der die und das"),
        ],
        "doc_id LONG, lang STRING, text STRING",
    )
    w, b = train_langid_classifier(labeled, n_buckets=4096)
    out2 = curate_corpus(
        df.where(F.col("doc_id").isin(1, 2, 4)),
        dedup=None,
        min_tokens=None,
        min_quality=None,
        languages=("de",),
        langid_model=(w, b),
    )
    assert {r["doc_id"] for r in out2.collect()} == {2}


def test_curate_decontaminate_via_bloom(spark, corpus):
    """curate_corpus(decontaminate_via='bloom') — the one-call recipe's
    scale-safe decontamination switch (r10 verdict ask #1).  On this
    corpus the 2^20-bit filter has no false positives, so the bloom
    recipe output equals the broadcast recipe output exactly; the
    general contract (bloom survivors ⊆ broadcast survivors) is pinned
    at corpus scale in test_pipeline.test_decontaminate_bloom_parity."""
    from xyzpy_spark.pipeline.curate import curate_corpus

    leak = spark.createDataFrame(
        [(999, "quick brown cat jumps over", "en", "ref")],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )
    kw = dict(
        reference_df=leak,
        min_tokens=10,
        min_quality=None,
        decontaminate_n=5,
    )
    exact = {
        r["doc_id"]
        for r in curate_corpus(corpus, **kw).collect()
    }
    bloom = {
        r["doc_id"]
        for r in curate_corpus(
            corpus, decontaminate_via="bloom", **kw
        ).collect()
    }
    assert bloom == exact
    assert 4 not in bloom and 1 in bloom

    with pytest.raises(ValueError, match="via"):
        curate_corpus(corpus, decontaminate_via="nope", **kw).collect()
