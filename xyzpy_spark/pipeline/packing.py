"""Sequence packing: place documents into fixed-token-budget training
sequences.

The reference has no analog (it sweeps functions, not corpora); this is
the standard last step of an LLM data pipeline — turning a cleaned
corpus into context-window-sized training sequences.  Two modes:

- :func:`pack_sequences` — *concat-and-chunk* (GPT-style): documents
  are laid out end-to-end per shard and the stream is cut every
  ``max_tokens``; a document may straddle a cut (downstream tokenizer
  splits it).  Entirely codegen: one hash for the shard, one window
  cumsum — and exactly reproducible in ANSI SQL, so the contract query
  has a bit-exact DuckDB oracle (all-integer arithmetic).
- :func:`pack_sequences_greedy` — *first-fit-sequential* (no document
  splitting): within a shard, a doc opens a new sequence when it would
  overflow the budget.  The per-shard recurrence (running total with
  reset) is not a window function, so it runs as one Arrow batch per
  shard via ``applyInPandas``; verified in pytest against a sequential
  python model.

Scale story: the only shuffle is by ``shard`` (pick ``n_shards`` ≈ a
few × cores at cluster scale); within a shard the window sort is on the
(already clustered) doc id.  Documents longer than ``max_tokens`` are
handled: chunk mode spreads them over multiple cuts, greedy mode gives
them a dedicated sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokenize

__all__ = ["pack_sequences", "pack_sequences_greedy", "packing_stats"]


def _resolve_n_shards(df: DataFrame, n_shards) -> int:
    """``n_shards=None`` -> size to the session: 2x the session's
    default parallelism (floor 16).  The shard window is the packing
    parallelism unit, so shard count must be >= cluster cores at scale
    — an 8-shard layout on a 1000-core cluster caps the window stage
    at 8 tasks.  Pass an EXPLICIT n_shards when shard assignment must
    be reproducible across differently-sized clusters (the gate rows
    do); the derived value trades that for right-sized parallelism."""
    if n_shards is not None:
        return int(n_shards)
    cores = df.sparkSession.sparkContext.defaultParallelism
    return max(2 * int(cores), 16)


def _shard_col(key, n_shards: int, salt: str) -> F.Column:
    """Deterministic md5 shard (portable: any engine reproduces it)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(f":{salt}"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n_shards)).cast("int")


def pack_sequences(
    df: DataFrame,
    *,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int | None = 16,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk packing: per shard, docs are concatenated in
    ``id_col`` order and the token stream is cut every ``max_tokens``.

    Output per doc: ``shard``, ``n_tokens``, ``seq_id`` (which cut its
    first token falls in) and ``seq_offset`` (token offset within that
    sequence).  All integer arithmetic over a single window cumsum —
    partitioning-invariant and oracle-exact.

    ``n_shards`` bounds the packing parallelism (the cumsum window
    partitions by shard): pick ``n_shards >= cluster cores`` at scale,
    or pass ``None`` to derive 2x the session's default parallelism
    (explicit values stay reproducible across clusters — see
    SCALING.md "packing").
    """
    n_shards = _resolve_n_shards(df, n_shards)
    toks = F.size(tokenize(F.col(text_col))).cast("long")
    out = df.select(
        F.col(id_col),
        _shard_col(F.col(id_col), n_shards, salt).alias("shard"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(cum_before / F.lit(max_tokens)).cast("long").alias("seq_id"),
        F.pmod(cum_before, F.lit(max_tokens)).cast("long").alias(
            "seq_offset"
        ),
    )


def pack_sequences_greedy(
    df: DataFrame,
    *,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int | None = 16,
    salt: str = "pack",
) -> DataFrame:
    """First-fit-sequential packing (documents are never split).

    Within a shard (docs in ``id_col`` order) a doc joins the current
    sequence if it fits, else opens the next one; docs longer than the
    budget get a sequence of their own.  The reset-recurrence runs per
    shard in one Arrow batch (``applyInPandas``) — shards are the
    parallelism unit, so size ``n_shards >= cluster cores`` (NOT to
    the corpus), or pass ``None`` to derive 2x the session's default
    parallelism; explicit values stay reproducible across clusters
    (SCALING.md "packing").
    """
    n_shards = _resolve_n_shards(df, n_shards)
    toks = F.size(tokenize(F.col(text_col))).cast("long")
    narrow = df.select(
        F.col(id_col),
        _shard_col(F.col(id_col), n_shards, salt).alias("shard"),
        toks.alias("n_tokens"),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seq_ids, fills = [], []
        seq, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill and fill + n > max_tokens:
                seq += 1
                fill = 0
            seq_ids.append(seq)
            fills.append(fill)
            fill += int(n)
            if fill >= max_tokens:
                seq += 1
                fill = 0
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "shard": pdf["shard"],
                "n_tokens": pdf["n_tokens"],
                "seq_id": seq_ids,
                "seq_offset": fills,
            }
        )

    id_t = dict(df.dtypes)[id_col]
    return narrow.groupBy("shard").applyInPandas(
        pack,
        f"{id_col} {id_t}, shard int, n_tokens long, "
        "seq_id long, seq_offset long",
    )


def packing_stats(
    df: DataFrame,
    *,
    max_tokens: int = 2048,
    text_col: str = "text",
) -> DataFrame:
    """Packing-efficiency report: the number that decides WHICH
    packing mode (and what ``max_tokens``) to run before spending the
    cluster time materializing sequences.

    One row per corpus with:

    - ``n_docs``, ``total_tokens``, ``max_doc_tokens``
    - ``n_docs_over_budget`` — docs longer than ``max_tokens``
      (split in chunk mode, solo sequences in greedy mode)
    - ``n_seqs_concat`` — ceil(total/max): sequences under
      concat-and-chunk (the waste-free lower bound, up to one partial
      tail sequence)
    - ``n_seqs_padded`` — Σ ceil(doc/max): sequences if every doc
      were padded to the budget boundary instead of packed
    - ``pad_waste_frac`` — fraction of padded-mode slots that would
      be padding: ``1 - total / (n_seqs_padded * max)``; the token
      bill packing saves

    All-integer single aggregation (one scan, map-side combined —
    exact at any scale); the division is one IEEE op so the DuckDB
    oracle matches bit-for-bit.  NULL text counts as a zero-token doc
    (the package's NULL-count convention).
    """
    m = int(max_tokens)
    toks = F.coalesce(
        F.size(tokenize(F.col(text_col))), F.lit(0)
    ).cast("long")
    per = df.select(
        toks.alias("__n"),
        F.floor((toks + F.lit(m - 1)) / F.lit(m))
        .cast("long")
        .alias("__ceil"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__n").cast("long").alias("total_tokens"),
        F.max("__n").cast("long").alias("max_doc_tokens"),
        F.sum((F.col("__n") > m).cast("long"))
        .cast("long")
        .alias("n_docs_over_budget"),
        F.sum("__ceil").cast("long").alias("n_seqs_padded"),
    )
    return agg.select(
        "n_docs",
        F.coalesce("total_tokens", F.lit(0)).alias("total_tokens"),
        F.coalesce("max_doc_tokens", F.lit(0)).alias("max_doc_tokens"),
        F.coalesce("n_docs_over_budget", F.lit(0)).alias(
            "n_docs_over_budget"
        ),
        F.floor(
            (F.coalesce("total_tokens", F.lit(0)) + F.lit(m - 1))
            / F.lit(m)
        )
        .cast("long")
        .alias("n_seqs_concat"),
        F.coalesce("n_seqs_padded", F.lit(0)).alias("n_seqs_padded"),
        F.when(
            F.coalesce("n_seqs_padded", F.lit(0)) > 0,
            F.lit(1.0)
            - F.col("total_tokens")
            / (F.col("n_seqs_padded") * F.lit(float(m))),
        )
        .otherwise(F.lit(0.0))
        .alias("pad_waste_frac"),
    )
