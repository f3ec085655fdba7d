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

__all__ = ["pack_sequences", "pack_sequences_greedy"]


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
    n_shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk packing: per shard, docs are concatenated in
    ``id_col`` order and the token stream is cut every ``max_tokens``.

    Output per doc: ``shard``, ``n_tokens``, ``seq_id`` (which cut its
    first token falls in) and ``seq_offset`` (token offset within that
    sequence).  All integer arithmetic over a single window cumsum —
    partitioning-invariant and oracle-exact.
    """
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
    n_shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """First-fit-sequential packing (documents are never split).

    Within a shard (docs in ``id_col`` order) a doc joins the current
    sequence if it fits, else opens the next one; docs longer than the
    budget get a sequence of their own.  The reset-recurrence runs per
    shard in one Arrow batch (``applyInPandas``) — shards are the
    parallelism unit, so size ``n_shards`` to the cluster, not the
    corpus.
    """
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
