"""Data Selection with Importance Resampling (DSIR) — pick raw-corpus
documents whose hashed n-gram distribution matches a target corpus.

The recipe (Xie et al. 2023, *Data Selection for Language Models via
Importance Resampling*): fit two bag-of-hashed-n-grams models — one on
the high-quality TARGET corpus (e.g. Wikipedia+books), one on the RAW
pool (e.g. CommonCrawl) — weight every raw document by its importance
log-ratio ``Σ_features c_b · (ln p_b − ln q_b)``, then resample
without replacement proportionally to the weights via Gumbel top-k.
This is the principled alternative to threshold quality filters: it
matches the *distribution* of the target rather than gating on a
score.  The reference engine's analog capability is arbitrary
per-record scoring through ``combo_runner``
(``/root/reference/xyzpy/gen/combo_runner.py:77-139``); here the
estimator and the sampler are Spark column plans end to end.

Scale design (100 TB raw pool, 1000 executors):

- **Fitting** is two bounded hash aggregations (one over the target,
  one over the raw pool) producing ``n_buckets``-sized count tables —
  feature hashing caps model size regardless of corpus vocabulary, so
  the log-ratio table always broadcasts.
- **Weighting** is a streaming pass over the raw pool: n-gram stream →
  md5 bucket → ONE broadcast join against the ratio table → one
  per-document sum (a shuffle of (id, double) pairs — never text).
- **Selection** is a distributed top-k (``orderBy ... limit k``,
  planned as TakeOrdered — per-partition heaps + driver merge of k
  rows), NOT a global single-partition window sort.
- Nothing here is Python: hashing, the log arithmetic, and the
  deterministic Gumbel perturbation are all JVM expressions.

Determinism / portability: buckets come from the portable md5→int64
recipe, the Gumbel noise is a pure function of ``id_col`` (md5-uniform
``u``, ``g = −ln(−ln u)``), and both the per-document weight and the
perturbed score go through the package's 6-decimal floor canon before
the rank's (score, id) ordering — so the DuckDB oracle reproduces the
selected set exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import _doc_ngrams, _round_det, tokenize

__all__ = ["dsir_bucket_counts", "dsir_weights", "dsir_select"]


def _bucket(col: F.Column, n_buckets: int) -> F.Column:
    """Portable md5 feature hash: 15 hex digits (< 2^60, positive) so
    ``%`` agrees with any SQL engine's BIGINT arithmetic."""
    from .dedup import _portable_token_hash

    return F.pmod(_portable_token_hash(col), F.lit(int(n_buckets)))


def _feature_stream(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc, feature-gram) rows: unigrams plus orders 2..n (DSIR uses
    hashed unigram+bigram features by default)."""
    parts = [
        df.select(
            F.col(id_col).alias("__doc"),
            F.explode(tokenize(F.col(text_col))).alias("ngram"),
        )
    ]
    for order in range(2, n + 1):
        parts.append(_doc_ngrams(df, id_col, text_col, order))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _bucketed_feats(
    df: DataFrame, id_col: str, text_col: str, n: int, n_buckets: int
) -> DataFrame:
    """Compact ``(__doc, bucket)`` rows — one per feature occurrence;
    the text never leaves this projection."""
    return _feature_stream(df, id_col, text_col, n).select(
        "__doc", _bucket(F.col("ngram"), n_buckets).alias("bucket")
    )


def _counts_from_feats(feats_b: DataFrame) -> tuple[DataFrame, int]:
    counts = (
        feats_b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # n_buckets rows; the total-count action below materializes
        # the cache, so the scoring broadcast (and any re-fit) reads
        # the cached count table instead of re-scanning the corpus
        .persist()
    )
    total = counts.agg(F.sum("cnt")).first()[0] or 0
    return counts, int(total)


def dsir_bucket_counts(
    df: DataFrame,
    *,
    n_buckets: int = 8192,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, int]:
    """Hashed n-gram bucket counts ``(bucket, cnt)`` plus the total
    feature count — the sufficient statistics of one side's
    bag-of-features model.  Output is ``n_buckets``-bounded however
    large the corpus; the total triggers one count job so downstream
    plans can embed it as a literal."""
    return _counts_from_feats(
        _bucketed_feats(df, id_col, text_col, n, n_buckets)
    )


def dsir_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    *,
    n_buckets: int = 8192,
    n: int = 2,
    add_k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight.

    ``logw = Σ_b c_b · (ln p_b − ln q_b)`` with add-k smoothed bucket
    probabilities ``p_b = (cnt_target + k) / (total_target + k·B)``
    (same for ``q`` on the raw side).  Output ``(id_col, n_feats,
    logw)`` for every raw document with at least one feature; ``logw``
    is canon-rounded so ranks are engine-portable.

    The two count tables are ``n_buckets``-bounded → the merged
    log-ratio table broadcasts; the raw pool streams through one
    broadcast join + one per-document aggregation.
    """
    p_counts, p_total = dsir_bucket_counts(
        target_df,
        n_buckets=n_buckets,
        n=n,
        text_col=text_col,
        id_col=id_col,
    )
    # The raw pool is both the q-model's fit corpus AND the corpus
    # being scored — bucket its feature stream ONCE and persist the
    # compact (doc, bigint) pairs, so the scoring join below reads
    # the cache instead of re-paying the tokenize + explode + bigram
    # window shuffle a second time.  (The q-fit count job right after
    # the persist materializes it; cached pairs are strictly smaller
    # than the token-window shuffle the recompute would redo, so the
    # trade holds at any scale.)
    raw_feats = _bucketed_feats(
        raw_df, id_col, text_col, n, n_buckets
    ).persist()
    q_counts, q_total = _counts_from_feats(raw_feats)
    k = float(add_k)
    kb = k * n_buckets
    ratio = (
        q_counts.join(p_counts.withColumnRenamed("cnt", "p_cnt"),
                      "bucket", "left")
        .select(
            "bucket",
            (
                F.log(
                    F.coalesce(F.col("p_cnt"), F.lit(0)).cast("double")
                    + F.lit(k)
                )
                - F.log(F.lit(float(p_total) + kb))
                - F.log(F.col("cnt").cast("double") + F.lit(k))
                + F.log(F.lit(float(q_total) + kb))
            ).alias("lr"),
        )
    )
    if broadcast_model:
        ratio = F.broadcast(ratio)
    return (
        raw_feats.join(ratio, "bucket")
        .groupBy("__doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lr").alias("__lw"),
        )
        .select(
            F.col("__doc").alias(id_col),
            "n_feats",
            _round_det(F.col("__lw")).alias("logw"),
        )
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    *,
    temperature: float = 1.0,
    salt: str = "dsir",
    n_buckets: int = 8192,
    n: int = 2,
    add_k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resample ``k`` raw documents without replacement with
    probability ∝ ``exp(logw / temperature)`` — Gumbel top-k: perturb
    each log-weight with Gumbel noise and take the k largest
    (exactly the without-replacement softmax sample).

    The Gumbel draw is DETERMINISTIC — ``u = md5-uniform(id, salt)``
    in (0,1), ``g = −ln(−ln u)`` — so the same corpus, salt and k
    select the same set on every run, partitioning, and engine (the
    property every other sampler in this package guarantees).  The
    rank orders by the canon-rounded score with ``id_col`` as
    tie-break and plans as a distributed TakeOrdered, never a global
    single-partition window.  Output: ``(id_col, n_feats, logw,
    score)`` for the selected k.
    """
    from .sampling import hash_unit

    w = dsir_weights(
        raw_df,
        target_df,
        n_buckets=n_buckets,
        n=n,
        add_k=add_k,
        text_col=text_col,
        id_col=id_col,
    )
    # (h + 0.5)/2^32 keeps u strictly inside (0,1): u=0 would send
    # the Gumbel to -inf and silently blacklist the document
    u = hash_unit(F.col(id_col), salt) + F.lit(0.5 / 4294967296.0)
    g = -F.log(-F.log(u))
    score = _round_det(
        F.col("logw") / F.lit(float(temperature)) + g
    )
    return (
        w.withColumn("score", score)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
