"""One-call corpus curation — the standard LLM-training-data recipe
as a single composable DataFrame plan.

Composes the individually-tested stages in the order production
pipelines run them (C4 → Gopher → CCNet → GPT-3 decontamination):

1. **Exact dedup** — keep the min-id document per normalized
   fingerprint (:func:`~xyzpy_spark.pipeline.dedup.dedup_exact`).
2. **Quality rule stack** — token count / heuristic quality /
   repetition gates (:func:`~xyzpy_spark.pipeline.text.filter_corpus`),
   map-only.
3. **Blocklist** — C4-style bad-word gate
   (:func:`~xyzpy_spark.pipeline.text.filter_blocklist`), map-only.
4. **LM perplexity tail drop** — CCNet buckets from a reference-corpus
   bigram LM; the worst per-language bucket is dropped
   (:func:`~xyzpy_spark.pipeline.lm.ccnet_buckets`).
5. **Decontamination** — drop documents sharing n-grams with the
   eval/reference set (:func:`~xyzpy_spark.pipeline.text.decontaminate`);
   ``decontaminate_via`` picks the eval-side form — exact broadcast
   n-gram join (default) or the 128 KiB Bloom filter that stays
   constant-size however large the eval set (r11: the measured
   boundary is a ~408 MiB broadcast at a 100x eval set — the recipe
   now has the scale-safe switch built in).

Scale shape: stages 2-3 are pure column filters fused into the scan;
stage 1 is a single window over the content fingerprint, stages 4-5
add one bounded-key shuffle each ((id, lang, nll) triples, n-gram
stream).  The two stages that consume the surviving corpus twice
(4's keep side + probe, 5's hit census + anti-join probe) sit behind
non-eager ``localCheckpoint`` seams so the plan prefix is computed
ONCE per action instead of once per consumer (the unseamed recipe
re-embedded the scan + earlier stages up to ~14x).  Every stage is
optional; the composed plan stays lazy until the caller acts on it
(the seams materialize with the caller's first action).

The whole recipe is oracle-checkable end-to-end (contract query
``curate_corpus`` composes the per-stage DuckDB twins), which is the
guarantee a 100 TB run wants before spending the cluster time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..utils import seam

__all__ = ["curate_corpus"]


def _lineage_seam(frame: DataFrame) -> DataFrame:
    """Cut plan lineage before a stage that consumes its input twice.

    The self-join stages (``lm_tail``'s keep-side, ``decontaminate``'s
    hit census) reference the surviving corpus on BOTH sides of a
    join, so without a seam each one re-embeds the entire plan prefix
    — the composed recipe re-ran the scan + every earlier stage up to
    ~14x (29 parquet scans / 31 exchanges in the r13 before-plan).  A
    non-eager ``localCheckpoint`` keeps the recipe lazy (no job until
    the caller acts) but truncates the logical plan at call time: both
    consumers read the one materialized survivor set instead of
    recomputing the prefix (guide §3.3).  Streams cannot checkpoint
    this way — callers gate the stages that need a seam off streaming
    inputs already, but stay safe here too.  Durability is a session
    option (``spark.xyzpy.seam.mode``, see :func:`~..utils.seam`)."""
    if frame.isStreaming:
        return frame
    return seam(frame, eager=False)


def _quality_n_buckets(weights) -> int:
    """Featurizer modulus for a trained quality model: the stamped
    ``n_buckets`` column when present (what train_quality_classifier
    writes), else the serving default."""
    if "n_buckets" in weights.columns:
        r = weights.select("n_buckets").first()
        if r is not None:
            return int(r["n_buckets"])
    return 1 << 18


def curate_corpus(
    df: DataFrame,
    *,
    reference_df: DataFrame | None = None,
    eval_df: DataFrame | None = None,
    dedup: str | None = "exact",
    hash_fn: str = "xxhash64",
    min_tokens: int | None = 20,
    min_quality: float | None = 0.5,
    max_top_bigram_frac: float | None = None,
    languages=None,
    langid_model: tuple | None = None,
    quality_model: tuple | None = None,
    blocklist=None,
    max_block_hits: int = 0,
    lm_tail: bool = False,
    lm: tuple | None = None,
    lm_buckets: int = 3,
    decontaminate_n: int | None = None,
    min_decontam_hits: int = 1,
    decontaminate_via: str = "broadcast",
    decontam_m_bits: int = 1 << 20,
    decontam_k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    report: bool = False,
):
    """Run the full curation recipe; returns the curated DataFrame
    with the input's original columns.

    ``reference_df`` is the TRUSTED corpus (e.g. Wikipedia) that
    trains the CCNet LM for the ``lm_tail`` stage — or pass a
    pre-trained model as ``lm=(contexts, ngrams, vocab_size[, n])``
    (exactly what :func:`~xyzpy_spark.pipeline.lm.load_lm` returns;
    ``n`` defaults to 2) to skip the training job entirely, the
    production shape for repeated snapshot runs.
    ``eval_df`` is the
    BENCHMARK set whose n-grams the ``decontaminate_n`` stage scrubs;
    ``decontaminate_via="bloom"`` swaps the exact broadcast n-gram
    join for the constant-128-KiB Bloom-filter probe
    (``decontam_m_bits`` / ``decontam_k`` size it) — use it when the
    eval side outgrows a comfortable broadcast (FP-rate-bounded
    over-dropping, never under-dropping).
    In production these are different corpora — pass both.
    ``eval_df`` defaults to ``reference_df`` for the common audit
    setup where one held-out split plays both roles.  ``dedup``
    currently supports ``'exact'`` / ``None`` — run the near-dup
    family (:func:`~xyzpy_spark.pipeline.dedup.dedup_corpus`) as its
    own pass when shingle-level dedup is wanted; exact-first is the
    standard order either way.

    ``quality_model=(weights, intercept)`` (what
    :func:`~xyzpy_spark.pipeline.text.train_quality_classifier`
    returns) adds the TRAINED quality gate after the rule-based
    signals: documents with ``margin < 0`` are dropped (broadcast
    weight join; the stamped ``n_buckets`` drives the featurizer).

    ``languages=('en', ...)`` keeps only documents whose PREDICTED
    language is in the set — the standard crawl-curation gate.  By
    default the prediction comes from the 5-language stopword scorer
    (:func:`~xyzpy_spark.pipeline.text.add_language_id`); pass
    ``langid_model=(weights, intercepts)`` (what
    :func:`~xyzpy_spark.pipeline.text.train_langid_classifier` /
    ``load_langid`` return) to score with a trained classifier of any
    breadth instead — the broadcast-weight serving path.

    ``report=True`` returns ``(curated_df, stages)`` where ``stages``
    is ``[(stage_name, n_docs_after), ...]`` — each count is an
    ACTION over the plan prefix (audit mode; leave off for one-pass
    production runs).

    Docs the LM cannot score (no bigram) are dropped by the
    ``lm_tail`` stage; with the default ``min_tokens=20`` gate ahead
    of it no scoreable document is lost.
    """
    if lm_tail and reference_df is None and lm is None:
        raise ValueError(
            "curate_corpus: lm_tail requires reference_df (to train) "
            "or lm=(contexts, ngrams, vocab_size) (pre-trained — "
            "pipeline.lm.load_lm)"
        )
    if lm is not None and not lm_tail:
        raise ValueError(
            "curate_corpus: lm= is only consumed by the lm_tail "
            "stage — pass lm_tail=True"
        )
    if langid_model is not None and not languages:
        raise ValueError(
            "curate_corpus: langid_model= is only consumed by the "
            "languages gate — pass languages=('en', ...) too"
        )
    if quality_model is not None and len(quality_model) != 2:
        raise ValueError(
            "curate_corpus: quality_model must be (weights_df, "
            "intercept) — what train_quality_classifier returns"
        )
    if eval_df is None:
        eval_df = reference_df
    if decontaminate_n is not None and eval_df is None:
        raise ValueError(
            "curate_corpus: decontaminate_n requires eval_df "
            "(or reference_df as its default)"
        )
    cols = list(df.columns)
    stages: list[tuple[str, int]] = []

    def _note(name: str, frame: DataFrame) -> None:
        if report:
            stages.append((name, frame.count()))

    out = df
    _note("input", out)

    if dedup == "exact":
        # ONE-PASS formulation of the dedup_exact stage (r13, guide
        # §2.4): semi-joining against dedup_exact(out) plants the
        # corpus subtree in the plan twice (fingerprint side + probe
        # side) and pays a second shuffle to re-attach the keep set;
        # the window keeps exactly the same rows — the min-id document
        # per normalized fingerprint — in one scan and one exchange
        # (by the 8/16-byte fingerprint, text never re-shuffles by id).
        norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
        key = F.xxhash64(norm) if hash_fn == "xxhash64" else F.md5(norm)
        out = (
            out.withColumn(
                "__keep_id", F.min(id_col).over(Window.partitionBy(key))
            )
            .where(F.col(id_col) == F.col("__keep_id"))
            .select(*cols)
        )
        _note("dedup_exact", out)
    elif dedup is not None:
        raise ValueError(f"curate_corpus: unknown dedup mode {dedup!r}")

    if any(
        g is not None
        for g in (min_tokens, min_quality, max_top_bigram_frac)
    ):
        from .text import filter_corpus

        out = filter_corpus(
            out,
            text_col=text_col,
            min_tokens=min_tokens,
            min_quality=min_quality,
            max_top_bigram_frac=max_top_bigram_frac,
        ).select(*cols)
        _note("quality_rules", out)

    if languages:
        wanted = [str(lang) for lang in languages]
        if langid_model is not None:
            from .text import score_langid_trained

            scored = score_langid_trained(
                out,
                langid_model[0],
                langid_model[1],
                text_col=text_col,
                id_col=id_col,
            )
        else:
            from .text import add_language_id

            scored = add_language_id(out, text_col)
        out = scored.where(
            F.col("lang_pred").isin(wanted)
        ).select(*cols)
        _note("language_id", out)

    if quality_model is not None:
        from .text import score_quality_trained

        out = score_quality_trained(
            out,
            quality_model[0],
            quality_model[1],
            text_col=text_col,
            id_col=id_col,
            n_buckets=_quality_n_buckets(quality_model[0]),
        )
        out = out.where(F.col("keep")).select(*cols)
        _note("quality_model", out)

    if blocklist:
        from .text import filter_blocklist

        out = filter_blocklist(
            out,
            blocklist,
            max_hits=max_block_hits,
            text_col=text_col,
            id_col=id_col,
        )
        _note("blocklist", out)

    if lm_tail:
        from .lm import ccnet_buckets, train_bigram_lm

        if lm is not None:
            # pre-trained model (pipeline.lm.save_lm/load_lm): the
            # production path — train once, score every snapshot.
            # load_lm returns (contexts, ngrams, vocab_size, n); honor
            # the order so a saved trigram model isn't silently scored
            # as a bigram (every n-gram join would miss and the NLLs
            # would collapse to the smoothing floor).
            unigrams, bigrams, vocab = lm[0], lm[1], int(lm[2])
            lm_n = int(lm[3]) if len(lm) > 3 else 2
        else:
            unigrams, bigrams, vocab = train_bigram_lm(
                reference_df, text_col=text_col, id_col=id_col
            )
            lm_n = 2
        # this stage consumes `out` three ways (ccnet's (id, lang)
        # projection, its scored n-gram stream, and the probe side of
        # the semi-join) — seam first so all three read one
        # materialized survivor set instead of re-running the prefix
        out = _lineage_seam(out)
        kept = (
            ccnet_buckets(
                out,
                unigrams,
                bigrams,
                vocab,
                n=lm_n,
                n_buckets=lm_buckets,
                text_col=text_col,
                id_col=id_col,
                lang_col=lang_col,
            )
            .where(F.col("bucket") < lm_buckets)
            .select(id_col)
        )
        out = out.join(kept, id_col, "left_semi")
        _note("lm_tail", out)

    if decontaminate_n is not None:
        from .text import decontaminate

        # decontaminate anti-joins `out` against a hit census built
        # FROM `out` — seam so census and probe share one computation
        out = _lineage_seam(out)
        out = decontaminate(
            out,
            eval_df,
            n=decontaminate_n,
            text_col=text_col,
            id_col=id_col,
            min_hits=min_decontam_hits,
            via=decontaminate_via,
            m_bits=decontam_m_bits,
            k=decontam_k,
        )
        _note("decontaminate", out)

    return (out, stages) if report else out
