"""Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016) —
the real version of the package's BPE-ish regex approximation
(``text.bpe_ish_tokens``).

Scale contract (the part that matters at 100 TB):

- **Training** never iterates over the corpus.  One distributed
  word-count aggregation reduces the corpus to its frequency table
  (map-side combined, shuffle carries distinct words); the top
  ``max_words`` rows — the classic BPE training input — come to the
  driver BOUNDED (default 50k words), and the greedy merge loop runs
  driver-side over that table exactly as the reference algorithm
  does.  This is the standard practice (real tokenizers train on a
  word-frequency table, not the raw stream); the cap is the explicit
  knob, and a warning fires when it truncates.
- **Encoding** is one Arrow-batched ``pandas_udf`` stage with the
  merge ranks broadcast in the closure — map-only, no shuffle, linear
  in executors.

Determinism: ties in pair frequency break lexicographically, so the
learned merge list is a pure function of the word-frequency table —
the pytest twin retrains with an independent pure-python
implementation and must produce the identical merges.
"""

from __future__ import annotations

import warnings

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..utils import seam
from .text import tokenize

__all__ = [
    "train_bpe",
    "bpe_encode",
    "bpe_token_count",
    "bpe_vocab",
    "tokenized_sequences",
    "export_tokenized",
    "oov_rate",
    "save_merges",
    "load_merges",
]

#: end-of-word marker (classic BPE: lets merges distinguish suffixes)
EOW = "</w>"


def _apply_merge(sym: tuple, pair: tuple) -> tuple:
    a, b = pair
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _greedy_merges(
    vocab: dict[tuple, int], num_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """The reference greedy loop, made incremental: global pair counts
    and a pair→words index are maintained so each merge touches only
    the words that CONTAIN the merged pair (instead of rebuilding the
    whole table per iteration — O(num_merges × max_words) driver time
    at the 50k/200 defaults).  Identical output to the naive loop by
    construction: the counts after each step equal a full recount
    (the independent-python-twin test retrains naively and requires
    the exact same merge list).
    """
    import heapq

    counts: dict[tuple, int] = {}
    where: dict[tuple, set] = {}
    for sym, freq in vocab.items():
        for p in zip(sym, sym[1:]):
            counts[p] = counts.get(p, 0) + freq
            where.setdefault(p, set()).add(sym)
    # lazy-deletion heap for the argmax: (-count, pair) entries go
    # stale when counts change; a popped entry is used only if it
    # still matches the live count.  Selection is O(log) amortized
    # instead of a full O(|pairs|) scan per merge — the scan was the
    # residual quadratic-ish term after the count updates went
    # incremental.  Tie-break (largest count, lexicographically
    # smallest pair) is preserved by the tuple order.
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pair = None
        while heap:
            negc, cand = heapq.heappop(heap)
            if counts.get(cand) == -negc:
                pair = cand
                break
        if pair is None or counts[pair] < min_freq:
            break
        merges.append(pair)
        for sym in list(where.get(pair, ())):
            freq = vocab.pop(sym)
            for p in zip(sym, sym[1:]):
                counts[p] -= freq
                if counts[p] <= 0:
                    del counts[p]
                else:
                    # the decremented count needs a live heap entry;
                    # the old (bigger) entry goes stale and is skipped
                    # by the liveness check on pop
                    heapq.heappush(heap, (-counts[p], p))
                ws = where.get(p)
                if ws is not None:
                    ws.discard(sym)
                    if not ws:
                        del where[p]
            new_sym = _apply_merge(sym, pair)
            vocab[new_sym] = vocab.get(new_sym, 0) + freq
            for p in zip(new_sym, new_sym[1:]):
                counts[p] = counts.get(p, 0) + freq
                where.setdefault(p, set()).add(new_sym)
                heapq.heappush(heap, (-counts[p], p))
    return merges


def train_bpe(
    df: DataFrame,
    *,
    num_merges: int = 200,
    min_freq: int = 2,
    max_words: int = 50_000,
    text_col: str = "text",
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list (the model — pass it to :func:`bpe_encode`).

    The corpus reduces to a word-frequency table in ONE distributed
    aggregation; the greedy merge loop then runs driver-side over the
    top ``max_words`` words.  Merges stop early when the best pair's
    frequency drops below ``min_freq``.
    """
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    rows = (
        df.select(F.explode(tokenize(text)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(int(max_words) + 1)
        .collect()
    )
    if len(rows) > max_words:
        rows = rows[:max_words]
        warnings.warn(
            f"train_bpe: word table truncated at max_words={max_words}; "
            "merges are learned from the most frequent words only "
            "(standard practice, but raise max_words for long-tail "
            "sensitivity)",
            RuntimeWarning,
            stacklevel=2,
        )
    vocab: dict[tuple, int] = {}
    for r in rows:
        if r["w"]:
            key = tuple(list(r["w"]) + [EOW])
            vocab[key] = vocab.get(key, 0) + int(r["n"])
    return _greedy_merges(vocab, num_merges, min_freq)


def _encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best, best_rank = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        sym[best : best + 2] = [sym[best] + sym[best + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Apply a trained merge list: adds ``out_col`` with the BPE token
    sequence per document.  One Arrow-batched stage, merges broadcast
    in the closure — map-only.  NULL text yields NULL."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    _lower = lowercase

    @F.pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        # per-batch memo: corpora repeat words heavily, and the memo
        # makes encoding amortized O(1) per repeated word
        memo: dict[str, list[str]] = {}

        import re

        # the SAME word-boundary class as Spark's tokenize (Java \s =
        # ASCII [ \t\n\x0b\f\r]); python str.split() is Unicode-aware
        # and would segment words the trainer never saw (e.g. around
        # U+00A0), silently disabling every learned merge there
        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def one(t):
            if t is None:
                return None
            if _lower:
                t = t.lower()
            out: list[str] = []
            for w in ws.split(t):
                if not w:
                    continue
                if w not in memo:
                    memo[w] = _encode_word(w, ranks)
                out.extend(memo[w])
            return out

        return s.map(one)

    return df.withColumn(out_col, _enc(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document token count under a TRAINED tokenizer — the
    number that actually prices a training run (the whitespace and
    regex counts in ``text.add_token_count`` are cheap approximations
    of this)."""
    enc = bpe_encode(
        df, merges, text_col=text_col, lowercase=lowercase
    )
    # NULL text prices at 0 tokens (the package's NULL-count
    # convention, same as keyword_hits) so budget sums never silently
    # exclude rows
    return enc.select(
        id_col,
        F.coalesce(F.size("bpe_tokens"), F.lit(0))
        .cast("long")
        .alias("n_bpe_trained"),
    )


def bpe_vocab(enc_df: DataFrame, *, tokens_col: str = "bpe_tokens") -> DataFrame:
    """Token→id table from an encoded corpus: ids assigned by
    frequency (desc) with lexicographic tie-break — deterministic,
    partitioning-independent.  Vocabulary-sized output (one hash
    aggregation + one tiny window over the distinct tokens)."""
    from pyspark.sql import Window

    counts = (
        enc_df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.col("token").asc())
    return counts.select(
        "token",
        (F.row_number().over(w) - 1).cast("int").alias("token_id"),
        "n",
    )


def tokenized_sequences(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    max_tokens: int = 2048,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
    lowercase: bool = True,
    salt: str = "pack",
) -> tuple[DataFrame, DataFrame]:
    """The training last mile: text → fixed-length token-ID sequences.

    GPT-style packing: within each deterministic shard
    (``md5(id || salt) mod n_shards``), documents are concatenated in
    ``id_col`` order and the id stream is cut every ``max_tokens``.
    Returns ``(sequences, vocab)`` where ``sequences`` is ``(shard,
    seq_id, input_ids array<int>, n_tokens)`` and ``vocab`` the
    ``(token, token_id, n)`` table used (pass ``vocab=`` to reuse a
    frozen table across incremental exports — REQUIRED for appends,
    or new data re-derives different ids).  ``lowercase`` must match
    the flag the merges were TRAINED with.  ``id_col`` must be unique
    per row — duplicate ids make the within-shard order (and so the
    cut points) nondeterministic.

    Plan shape: the Arrow encode stage runs once and is
    ``localCheckpoint``-ed (eager=False), so the vocab derivation and
    the packing read materialized tokens instead of re-running the
    UDF per consumer (blocks release with the frames — no
    CacheManager entry to leak, same rationale as
    ``operators/temporal.py``).  The vocab join broadcasts
    (vocabulary-sized).  Each document's global offset comes from a
    per-shard cumulative sum over ONE ROW PER DOCUMENT — never a
    per-token window, whose ``row_number`` would total-sort a shard's
    whole token stream on a single task; tokens then get
    ``offset + position`` map-side and assemble per sequence with
    bounded ``max_tokens``-element sorts, parallel across sequences.
    The heavy shuffle carries ``(shard, seq, position, token_id)`` —
    one row per token, the honest cost of materializing training
    sequences, linear in corpus size.  Under a frozen ``vocab``,
    tokens absent from it are DROPPED by the inner join — anti-join
    the encoded tokens against the vocab first to audit the
    out-of-vocabulary rate.
    """
    from pyspark.sql import Window

    from .sampling import hash_unit

    enc = bpe_encode(
        df, merges, text_col=text_col, lowercase=lowercase
    ).select(
        F.col(id_col).alias("__doc"),
        F.floor(hash_unit(F.col(id_col), salt) * n_shards)
        .cast("int")
        .alias("shard"),
        "bpe_tokens",
    )
    enc = seam(enc, eager=False)
    if vocab is None:
        vocab = bpe_vocab(enc)
    w_doc = (
        Window.partitionBy("shard")
        .orderBy("__doc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_base = enc.select(
        "shard",
        "bpe_tokens",
        F.coalesce(
            F.sum(F.size("bpe_tokens")).over(w_doc), F.lit(0)
        ).alias("__base"),
    )
    toks = with_base.select(
        "shard",
        "__base",
        F.posexplode("bpe_tokens").alias("__pos", "token"),
    ).select(
        "shard",
        (F.col("__base") + F.col("__pos")).alias("__g"),
        "token",
    )
    with_ids = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token"
    )
    seq = with_ids.select(
        "shard",
        "token_id",
        F.floor(F.col("__g") / F.lit(int(max_tokens)))
        .cast("long")
        .alias("seq_id"),
        "__g",
    )
    sequences = (
        seq.groupBy("shard", "seq_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__g", "token_id"))
                ),
                lambda s: s["token_id"],
            ).alias("input_ids")
        )
        .select(
            "shard",
            "seq_id",
            "input_ids",
            F.size("input_ids").cast("long").alias("n_tokens"),
        )
    )
    return sequences, vocab


def export_tokenized(
    df: DataFrame,
    merges: list[tuple[str, str]],
    path: str,
    **kw,
) -> DataFrame:
    """Materialize :func:`tokenized_sequences` as shard-partitioned
    parquet under ``path`` (one directory per shard — loaders address
    ``shard=NNN/`` individually) and the vocab table next to it under
    ``path + '/_vocab'``.  Returns the sequences DataFrame re-read
    from disk."""
    sequences, vocab = tokenized_sequences(df, merges, **kw)
    (
        sequences.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    vocab.write.mode("overwrite").parquet(path + "/_vocab")
    return df.sparkSession.read.parquet(path)


def oov_rate(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    *,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Out-of-vocabulary audit for frozen-vocab exports: one row with
    ``(n_tokens, n_oov, oov_rate)`` for the corpus encoded under
    ``merges`` against ``vocab``.

    Run this before an incremental :func:`tokenized_sequences` append
    with a frozen vocab — its inner join silently DROPS unknown
    tokens, and this is the number that says whether that loss is
    acceptable or the vocab needs retraining.  One encode pass + one
    broadcast left-join + one global aggregate.
    """
    enc = bpe_encode(df, merges, text_col=text_col, lowercase=lowercase)
    # explode_outer + an explicit NOT NULL on the generate OUTPUT, not
    # plain explode: Catalyst's InferFiltersFromGenerate plants a
    # size(bpe_tokens)>0 filter BELOW the generate, which re-evaluates
    # the encode pandas UDF a second time (two stacked ArrowEvalPython
    # stages).  The rule skips outer generates; BPE token arrays never
    # contain NULL elements, so dropping the NULL rows the outer
    # explode adds for empty/NULL arrays leaves the multiset identical.
    toks = enc.select(F.explode_outer("bpe_tokens").alias("token")).where(
        F.col("token").isNotNull()
    )
    joined = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    )
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("token_id").isNull().cast("long"))
        .cast("long")
        .alias("n_oov"),
    ).select(
        "n_tokens",
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.when(F.col("n_tokens") > 0, F.col("n_oov") / F.col("n_tokens"))
        .otherwise(F.lit(0.0))
        .alias("oov_rate"),
    )


def save_merges(
    merges: list[tuple[str, str]], path: str, spark=None
) -> None:
    """Persist a trained BPE merge list as JSON — train once on the
    reference corpus, encode every future snapshot with the SAME
    tokenizer (mixing tokenizers across snapshots silently changes
    every token count and packed sequence downstream).  Scheme-aware
    (r13, the fsutil sweep): the artifact can live next to the corpus
    on hdfs://s3a:// paths; ``spark`` resolves from the active
    session when omitted."""
    import json

    from pyspark.sql import SparkSession

    from .. import fsutil

    if spark is None:
        spark = SparkSession.builder.getOrCreate()
    tmp = path + ".tmp"
    fsutil.write_text(spark, tmp, json.dumps([[a, b] for a, b in merges]))
    fsutil.replace(spark, tmp, path)


def load_merges(path: str, spark=None) -> list[tuple[str, str]]:
    """Load a :func:`save_merges` merge list (order is the model)."""
    import json

    from pyspark.sql import SparkSession

    from .. import fsutil

    if spark is None:
        spark = SparkSession.builder.getOrCreate()
    return [tuple(m) for m in json.loads(fsutil.read_text(spark, path))]
