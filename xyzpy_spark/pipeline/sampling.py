"""Deterministic sampling for training-data pipelines.

The reference's sampling story is the ``Sampler`` farming class
(``xyzpy/gen/farming.py`` — random case generation with optional
callable distributions); this module adds the dataset-side sampling a
100 TB corpus pipeline needs:

- ``hash_sample`` — keep a deterministic pseudo-random fraction of rows
  keyed on a stable id.  Unlike ``df.sample`` (seeded per-partition
  RNG, resample on re-partitioning), the hash form is reproducible
  across engines, runs, partitionings, and cluster sizes — the property
  that makes train/eval splits stable over reprocessing.  Implemented
  as ``md5(key) -> first 8 hex digits -> uint32 / 2^32 < fraction``:
  pure codegen'd expressions, filter fully pushed past the scan's
  projection, no shuffle, and the SAME rows fall in the sample when the
  oracle (DuckDB) applies the identical arithmetic.
- ``stratified_sample`` — per-stratum fractions (e.g. downsample the
  dominant class, keep all rare ones) via a broadcast map over the
  stratum column; still shuffle-free.
- ``split_train_eval`` — disjoint deterministic splits from the same
  hash, so train/eval never overlap even across separate runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "cap_per_group",
    "hash_unit",
    "hash_sample",
    "stratified_sample",
    "split_train_eval",
    "mix_corpora",
    "temperature_mixture_weights",
    "vocab_coverage",
]

_DENOM = float(1 << 32)


def hash_unit(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform-ish value in [0, 1) from a key column.

    ``md5`` (not ``xxhash64``) so any ANSI-SQL engine reproduces the
    exact bits: DuckDB equivalent is
    ``('0x' || substr(md5(key || salt), 1, 8))::UBIGINT / 4294967296.0``.
    """
    c = F.col(key) if isinstance(key, str) else key
    # null keys hash as a sentinel string, not null: a null hash_unit
    # would drop the row from BOTH sides of a split / zero its mixture
    # copies, breaking the "split partitions the input" guarantee
    key_s = F.coalesce(c.cast("string"), F.lit("\x00null"))
    h = F.conv(
        F.substring(F.md5(F.concat(key_s, F.lit(salt))), 1, 8), 16, 10
    ).cast("long")
    return h / F.lit(_DENOM)


def hash_sample(
    df: DataFrame, key: str, fraction: float, *, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows keyed on ``key``.

    Same key -> same verdict on every run, partitioning, and engine;
    distinct ``salt`` values give independent samples.
    """
    return df.where(hash_unit(key, salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    fractions: dict,
    *,
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling.

    ``fractions`` maps stratum value -> keep fraction; strata not
    listed keep ``default``.  The fraction lookup is a CASE expression
    (broadcast-free, codegen'd), the verdict is the same hash as
    ``hash_sample`` — so a row's membership never depends on which
    strata co-reside in its partition.
    """
    frac = F.lit(float(default))
    for val, f in sorted(fractions.items(), key=lambda kv: str(kv[0])):
        frac = F.when(
            F.col(stratum) == F.lit(val), F.lit(float(f))
        ).otherwise(frac)
    return df.where(hash_unit(key, salt) < frac)


def mix_corpora(
    df: DataFrame,
    key: str,
    stratum: str,
    weights: dict,
    *,
    default: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic weighted corpus mixture (training-mix epochs).

    ``weights`` maps a ``stratum`` value (e.g. ``source``) to a
    sampling weight: ``w < 1`` downsamples, ``w > 1`` upsamples by
    emitting repeated copies — the standard way training mixes
    oversample high-quality sources.  A row with weight ``w`` appears
    ``floor(w)`` times, plus one more copy iff its deterministic hash
    lands below ``w - floor(w)`` — so expected multiplicity is exactly
    ``w``, every copy set is reproducible across runs / partitionings /
    engines (same md5 arithmetic as :func:`hash_sample`), and a doc's
    copies are distinguished by ``copy_idx`` (0-based) so downstream
    shard assignment can decorrelate epochs.

    Map-only + explode: no shuffle, no driver state; the per-row copy
    count is a codegen CASE + comparison, so the scan cost at 100 TB
    is one pass.
    """
    n_copies = F.lit(int(default)) + (
        hash_unit(key, salt) < F.lit(float(default) % 1.0)
    ).cast("int")
    for val, w in sorted(weights.items(), key=lambda kv: str(kv[0])):
        w = float(w)
        whole, frac = int(w), w % 1.0
        n_copies = F.when(
            F.col(stratum) == F.lit(val),
            F.lit(whole)
            + (hash_unit(key, salt) < F.lit(frac)).cast("int"),
        ).otherwise(n_copies)
    return (
        df.withColumn("__n_copies", n_copies)
        .where(F.col("__n_copies") >= 1)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1)),
        )
        .drop("__n_copies")
    )


def split_train_eval(
    df: DataFrame,
    key: str,
    *,
    eval_fraction: float = 0.1,
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """Disjoint (train, eval) split on the same deterministic hash.

    A key is in eval iff ``hash < eval_fraction`` — complementary
    predicates over one hash guarantee the split is a partition of the
    input regardless of parallelism or engine.
    """
    u = hash_unit(key, salt)
    thr = F.lit(float(eval_fraction))
    return df.where(u >= thr), df.where(u < thr)


def sample_token_budget(
    df: DataFrame,
    budgets: dict,
    *,
    stratum: str = "source",
    key: str = "doc_id",
    token_col: str = "n_tokens",
    salt: str = "budget",
    exact: bool = False,
) -> DataFrame:
    """Curate a training mix by TOKEN budget per stratum ("take 10B
    tokens of web, 2B of code") — the unit that matters for training,
    not document count.

    ``budgets`` maps a ``stratum`` value to a token budget; strata
    without an entry are kept whole.  ``token_col`` must already hold
    per-doc token counts (``text.add_token_count``).  Selection is
    keyed on ``hash_unit(key, salt)`` so it is deterministic across
    runs, partitionings and engines, and independent samples come from
    distinct salts.

    Two modes:

    - ``exact=False`` (default, the 100-TB path): one aggregation
      computes total tokens per stratum, then a MAP-ONLY filter keeps
      docs whose hash lands below ``budget / total`` — expected token
      yield equals the budget (concentration: relative error
      ~ 1/sqrt(docs kept)), no per-stratum sort, no skew risk.
    - ``exact=True``: a per-stratum window orders docs by hash and
      keeps the prefix whose cumulative count starts before the
      budget (yield in [budget, budget + max_doc_tokens)).  Exact,
      but the window sorts each stratum inside one partition — use
      for driver-scale curation or small strata, not a 100-TB
      stratum.

    Output: input rows (filtered) + ``tokens_kept`` = running or
    expected contribution bookkeeping is left to the caller; the
    selection itself is the contract.
    """
    if token_col not in df.columns:
        raise ValueError(
            f"token_col {token_col!r} not in columns — run "
            "text.add_token_count first"
        )
    u = hash_unit(key, salt)
    if exact:
        w = (
            Window.partitionBy(stratum)
            .orderBy(u.asc(), F.col(key).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
        budget_col = None
        # float budgets: int() truncation would turn a 0.5-token
        # budget into 0 and silently empty the stratum (expected mode
        # honors fractions, exact mode must agree)
        for val, b in sorted(budgets.items(), key=lambda kv: str(kv[0])):
            cond = F.when(F.col(stratum) == F.lit(val), F.lit(float(b)))
            budget_col = cond if budget_col is None else budget_col.when(
                F.col(stratum) == F.lit(val), F.lit(float(b))
            )
        budget_col = (
            budget_col.otherwise(F.lit(None))
            if budget_col is not None
            else F.lit(None)
        )
        return df.withColumn("__before", before).where(
            budget_col.isNull() | (F.col("__before") < budget_col)
        ).drop("__before")
    totals = (
        df.groupBy(stratum)
        .agg(F.sum(token_col).alias("__total"))
    )
    ratio = None
    for val, b in sorted(budgets.items(), key=lambda kv: str(kv[0])):
        cond_val = F.least(
            F.lit(1.0), F.lit(float(b)) / F.greatest(F.col("__total"), F.lit(1))
        )
        ratio = (
            F.when(F.col(stratum) == F.lit(val), cond_val)
            if ratio is None
            else ratio.when(F.col(stratum) == F.lit(val), cond_val)
        )
    ratio = ratio.otherwise(F.lit(1.0)) if ratio is not None else F.lit(1.0)
    # LEFT join: a NULL stratum value matches no budget key and no
    # totals row — it must be kept whole (ratio falls through to 1.0),
    # not silently dropped by an inner join's null-never-equals-null
    return (
        df.join(F.broadcast(totals), stratum, "left")
        .where(u < ratio)
        .drop("__total")
    )


def temperature_mixture_weights(
    df: DataFrame,
    stratum: str = "source",
    *,
    temperature: float = 2.0,
    text_col: str | None = "text",
    round_places: int = 6,
) -> DataFrame:
    """Temperature-scaled multinomial mixture weights per stratum —
    the multilingual/multi-source rebalancing recipe (mBERT/XLM-R
    style): sample strata with probability ``p_s ∝ n_s^(1/T)``, so
    ``T=1`` keeps the natural distribution and ``T→∞`` approaches
    uniform, lifting low-resource strata without drowning the head.

    Output per stratum: ``(stratum, n_docs, n_tokens, p_natural,
    p_temp, boost)`` where ``p_temp`` is the temperature-scaled
    sampling probability over TOKEN mass (the quantity training mixes
    budget by; falls back to doc counts when ``text_col=None``) and
    ``boost = p_temp / p_natural`` is the per-stratum up/downsampling
    factor to feed :func:`mix_corpora` (scaled to the token budget).

    One bounded aggregation (strata-sized output) + window-free
    normalization via a cross-joined 1-row total — no corpus text
    moves.  ``pow`` and the divisions go through the portable
    6-decimal canon.
    """
    from ..pipeline.text import _round_det, tokenize

    if text_col is not None:
        mass = F.sum(
            F.coalesce(F.size(tokenize(F.col(text_col))), F.lit(0))
        ).alias("n_tokens")
    else:
        mass = F.count(F.lit(1)).alias("n_tokens")
    per = df.groupBy(stratum).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        mass,
    )
    t = float(temperature)
    powed = per.select(
        stratum,
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.pow(F.col("n_tokens").cast("double"), F.lit(1.0 / t)).alias(
            "__pw"
        ),
    )
    totals = powed.agg(
        F.sum("n_tokens").alias("__tot"),
        F.sum("__pw").alias("__pwtot"),
    )
    return (
        powed.crossJoin(F.broadcast(totals))
        .select(
            stratum,
            "n_docs",
            "n_tokens",
            _round_det(
                F.col("n_tokens") / F.col("__tot"), round_places
            ).alias("p_natural"),
            _round_det(
                F.col("__pw") / F.col("__pwtot"), round_places
            ).alias("p_temp"),
            _round_det(
                (F.col("__pw") / F.col("__pwtot"))
                / (F.col("n_tokens") / F.col("__tot")),
                round_places,
            ).alias("boost"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    *,
    text_col: str = "text",
    vocab_sizes=(1000, 10000, 50000),
    round_places: int = 6,
) -> DataFrame:
    """Token-mass coverage curve for vocabulary sizing: for each
    candidate vocab size ``k``, the fraction of the corpus's token
    occurrences covered by its ``k`` most frequent types.

    The number that picks a tokenizer vocab budget before training
    one: if the top 50k types cover 99.5% of mass, a 250k vocab buys
    almost nothing.  Output: ``(vocab_size, n_types, total_tokens,
    covered_tokens, coverage)`` — one row per requested size
    (``n_types`` = distinct types in the corpus, the curve's ceiling).

    Plan — distributed counts-of-counts, NO global rank (round-4
    verdict: the former unpartitioned ``row_number`` window moved the
    whole distinct-type table — 10^8-10^9 rows for a web crawl —
    through one task).  Top-k token mass depends only on the
    frequency multiset, never on which same-frequency type is picked
    (all types at one frequency contribute identically), so the rank
    is replaced by cumulative sums over the counts-of-counts table
    ``(freq, types_at_freq)``:

    1. token counts (the one corpus-sized shuffle);
    2. counts-of-counts: at most ``sqrt(2N)`` rows for ``N`` total
       tokens (distinct frequencies sum to <= N);
    3. log2-frequency buckets: bucket ``b`` holds frequencies in
       ``[2^b, 2^(b+1))`` — at most ``min(2^b, N/2^b) <= sqrt(N)``
       rows each (every frequency in the bucket needs ``>= 2^b``
       mass), across <= 64 buckets;
    4. cross-bucket prefix totals via a broadcast triangular
       self-join over the <= 64 bucket totals; within-bucket
       cumulative sums via a window PARTITIONED by bucket — no
       single-partition exchange anywhere on the path;
    5. per candidate ``k``, the cut frequency (largest ``f`` with
       ``cum_types(f) >= k``) via ``max_by`` after a broadcast
       inequality join of the tiny candidate list against the
       cumulated table; covered mass
       ``= cum_mass(f_cut) - (cum_types(f_cut) - k) * f_cut``.

    tests/test_plans.py::test_vocab_coverage_no_single_partition_window
    pins the no-single-partition-sort property.
    """
    from pyspark.sql import Window

    from ..pipeline.text import _round_det, tokenize

    counts = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cofc = counts.groupBy("n").agg(
        F.count(F.lit(1)).alias("__m")
    ).select(
        "n",
        "__m",
        (F.col("n") * F.col("__m")).alias("__mass"),
        F.floor(F.log2("n")).cast("int").alias("__bkt"),
    )
    totals = cofc.agg(
        F.sum("__mass").alias("__tot"),
        F.sum("__m").alias("__types"),
    )
    bt = cofc.groupBy("__bkt").agg(
        F.sum("__m").alias("__bm"), F.sum("__mass").alias("__bmass")
    )
    higher = F.broadcast(bt.select(
        F.col("__bkt").alias("__hb"),
        F.col("__bm").alias("__hm"),
        F.col("__bmass").alias("__hmass"),
    ))
    prefix = (
        bt.join(higher, F.col("__hb") > F.col("__bkt"), "left")
        .groupBy("__bkt")
        .agg(
            F.coalesce(F.sum("__hm"), F.lit(0)).alias("__types_before"),
            F.coalesce(F.sum("__hmass"), F.lit(0)).alias("__mass_before"),
        )
    )
    w = Window.partitionBy("__bkt").orderBy(F.desc("n")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        cofc.select(
            "n",
            "__bkt",
            F.sum("__m").over(w).alias("__cm"),
            F.sum("__mass").over(w).alias("__cmass"),
        )
        .join(F.broadcast(prefix), "__bkt")
        .select(
            "n",
            (F.col("__cm") + F.col("__types_before")).alias("__cum_types"),
            (F.col("__cmass") + F.col("__mass_before")).alias("__cum_mass"),
        )
    )
    sizes = sorted({int(k) for k in vocab_sizes})
    cands = None
    for k in sizes:
        row = counts.sparkSession.range(1).select(
            F.lit(k).cast("long").alias("vocab_size")
        )
        cands = row if cands is None else cands.unionByName(row)
    covered = (
        # broadcast the RIGHT side: cands is outer-preserved in this
        # left join so a hint on it cannot be honored — the non-equi
        # condition makes this a BroadcastNestedLoopJoin over the
        # sqrt(2N)-bounded cumulated counts-of-counts table (r5 advice)
        cands
        .join(F.broadcast(cum), F.col("__cum_types") >= F.col("vocab_size"), "left")
        .groupBy("vocab_size")
        .agg(
            F.max_by(
                F.col("__cum_mass")
                - (F.col("__cum_types") - F.col("vocab_size"))
                * F.col("n"),
                F.col("n"),
            ).alias("__cov")
        )
    )
    # k <= 0 covers nothing (the cum_types >= k join is vacuously
    # true there and would otherwise extrapolate NEGATIVE mass —
    # the rank-based implementation returned 0, keep that contract)
    cov_expr = F.when(
        F.col("vocab_size") <= 0, F.lit(0)
    ).otherwise(F.coalesce(F.col("__cov"), F.col("__tot"), F.lit(0)))
    return (
        covered.crossJoin(F.broadcast(totals))
        .select(
            "vocab_size",
            F.coalesce(F.col("__types"), F.lit(0))
            .cast("long").alias("n_types"),
            F.col("__tot").cast("long").alias("total_tokens"),
            cov_expr.cast("long").alias("covered_tokens"),
            _round_det(
                cov_expr / F.col("__tot"), round_places
            ).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


def cap_per_group(
    df: DataFrame,
    max_rows: int,
    *,
    by: str = "source",
    key: str = "doc_id",
    salt: str = "",
    order_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Per-group quota — domain capping, the C4/RefinedWeb-style
    guard against one domain (source, site, crawl bucket) dominating
    the training mix: keep at most ``max_rows`` rows per ``by``
    group, selected by the deterministic :func:`hash_unit` rank
    (salted md5 — engine-portable, so the selection has a bit-exact
    SQL twin and is reproducible across runs and engines; change
    ``salt`` to draw a different quota sample).  Pass ``order_col``
    to keep the BEST rows per group instead of a random sample
    (e.g. ``order_col='quality'``: top-``max_rows`` by quality score,
    ``descending`` by default, ties broken by ``key``) — the
    quality-capped variant of the same quota.  ``key`` must be
    UNIQUE and non-null (NULLs raise in-job; duplicate keys tie on
    both sort columns, making the surviving row partition-order
    dependent — dedup first).

    Plan shape: one rank window partitioned by the group — Spark 4's
    WindowGroupLimit pushes the ``rank <= k`` bound into a map-side
    partial top-k per group, so a group's rows never all sort in one
    task's memory; ties are impossible (the hash rank is tiebroken by
    the unique non-null ``key`` (enforced in-job for NULLs)).  Groups already under the cap pass through
    untouched.  At 100 TB the one shuffle is keyed by the group
    column; a pathologically hot group is exactly what the map-side
    partial limit bounds.
    """
    if max_rows < 1:
        raise ValueError("cap_per_group: max_rows must be >= 1")
    return (
        _group_rank(
            df, by=by, key=key, salt=salt,
            order_col=order_col, descending=descending,
        )
        .where(F.col("__r") <= int(max_rows))
        .drop("__r")
    )


def _group_rank(
    df: DataFrame,
    *,
    by: str,
    key: str,
    salt: str = "",
    order_col: str | None = None,
    descending: bool = True,
    caller: str = "cap_per_group",
) -> DataFrame:
    """The deterministic in-group rank (``__r`` column) shared by
    :func:`cap_per_group` and its streaming quota twin
    (:func:`~xyzpy_spark.streaming.ops.cap_stream_per_group`) — one
    selection rule, two engine paths.  Validates the mode params and
    enforces the unique non-null ``key`` contract in-job; ``caller``
    names the operator the user actually invoked in every error."""
    if order_col is not None and salt:
        raise ValueError(
            f"{caller}: salt= only applies to the hash-rank mode "
            "— it would silently do nothing with order_col="
        )
    if order_col is None and not descending:
        raise ValueError(
            f"{caller}: descending= only applies to order_col= "
            "— it would silently do nothing in hash-rank mode"
        )
    # the unique-key contract enforced IN the job (the merge-conflict
    # discipline): a NULL key hashes to one sentinel and ties on both
    # sort columns, making the surviving row partition-order dependent
    checked_key = F.when(
        F.col(key).isNull(),
        F.raise_error(
            F.lit(
                f"{caller}: key column contains NULLs — the "
                "selection would be nondeterministic (ties on both "
                "sort columns); supply a unique non-null key"
            )
        ),
    ).otherwise(F.col(key))
    if order_col is not None:
        lead = (
            F.col(order_col).desc() if descending
            else F.col(order_col).asc()
        )
    else:
        lead = hash_unit(F.col(key), salt)
    w = Window.partitionBy(by).orderBy(lead, checked_key)
    return df.withColumn("__r", F.row_number().over(w))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    *,
    key: str = "doc_id",
    by=(),
    salt: str = "",
    pow2_weights: bool = False,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis,
    "Weighted random sampling with a reservoir"): every row draws the
    priority ``u^(1/w)`` from its deterministic :func:`hash_unit`
    ``u`` and weight ``w``, and the ``k`` highest priorities (per
    ``by`` group, or globally) are exactly a weight-proportional
    sample without replacement — the corpus-subsampling primitive
    (quality-weighted selection, importance-weighted mixing) in a
    form that is reproducible across runs, partitionings, and salts.

    ``pow2_weights=True`` is the PORTABLE mode: weights must be
    integer powers of two (validated in-job), and the priority is
    computed as an ITERATED ``sqrt`` — IEEE-754 requires sqrt to be
    correctly rounded (``pow`` is not), so the priorities, and
    therefore the selected set, are bit-reproducible on any engine
    (the gate-query mode).  The default mode accepts arbitrary
    positive weights via ``pow(u, 1/w)`` (last-ulp pow differences
    could in principle flip a selection boundary across engines —
    fine within one engine, documented for cross-engine use).

    Plan: map-only priority projection; global top-k is TakeOrdered,
    per-group top-k is one rank window (WindowGroupLimit map-side
    partial) — one shuffle either way, never a weight-sized state.
    Non-positive/NULL weights raise in-job; ``key`` must be unique
    non-null (the tie-break; the cap_per_group discipline).
    """
    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")
    by = [by] if isinstance(by, str) else list(by)
    u = hash_unit(key, salt)
    w = F.col(weight_col)
    checked_w = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.lit(
                "weighted_sample: weights must be positive and "
                "non-null — a zero/negative weight has no sampling "
                "probability and NULL would silently drop the row"
            )
        ),
    ).otherwise(w)
    if pow2_weights:
        # j = log2(w) via exact integer bit-length; w must be 2^j
        # with j <= 15 (deeper chains trip a Catalyst expression-tree
        # blow-up around ~25 nested entries; 2^15 spans any sane
        # sampling-weight range)
        wi = checked_w.cast("long")
        jbits = F.length(F.conv(wi, 10, 2)) - 1
        pow2_ok = (
            (wi > 0)
            & (wi <= (1 << 15))
            & (wi.bitwiseAND(wi - 1) == 0)
            # fractional weights must raise, not silently floor
            # (2.5 would otherwise pass as 2 — review catch)
            & (checked_w.cast("double") == wi.cast("double"))
        )
        checked_j = F.when(
            pow2_ok,
            jbits,
        ).otherwise(
            F.raise_error(
                F.lit(
                    "weighted_sample: pow2_weights=True requires "
                    "integer power-of-two weights <= 2^15 (the "
                    "portable iterated-sqrt mode); use "
                    "pow2_weights=False for arbitrary positive "
                    "weights"
                )
            )
        )
        # iterated sqrt chain: entry j holds u^(1/2^j); IEEE sqrt is
        # correctly rounded, so every entry is bit-exact cross-engine
        chain = [u]
        for _ in range(15):
            chain.append(F.sqrt(chain[-1]))
        prio = F.element_at(F.array(*chain), checked_j.cast("int") + 1)
    else:
        prio = F.pow(u, F.lit(1.0) / checked_w.cast("double"))
    staged = df.withColumn("__prio", prio)
    if by:
        # reuse the shared rank (one selection rule, one NULL-key
        # error message — the cap_per_group/_group_rank discipline)
        return (
            _group_rank(
                staged, by=by, key=key,
                order_col="__prio", descending=True,
                caller="weighted_sample",
            )
            .where(F.col("__r") <= int(k))
            .drop("__r", "__prio")
        )
    checked_key = F.when(
        F.col(key).isNull(),
        F.raise_error(
            F.lit(
                "weighted_sample: key column contains NULLs — the "
                "selection would be nondeterministic (ties on both "
                "sort columns); supply a unique non-null key"
            )
        ),
    ).otherwise(F.col(key))
    # global top-k: TakeOrdered (distributed partial top-k, no window)
    return (
        staged.withColumn("__ck", checked_key)
        .orderBy(F.desc_nulls_last("__prio"), F.col("__ck"))
        .limit(int(k))
        .drop("__prio", "__ck")
    )
