"""Sketch-based approximate aggregates — the 100 TB siblings of the
exact statistics in ``functions/stats.py``.

The reference computes exact statistics only (``RunningStatistics``,
``xyzpy/utils.py:119-197``) because it targets single-node sweeps; at
corpus scale the exact order statistics and distinct counts stop
fitting in memory, and the mergeable-sketch versions are the standard
substitute.  All of these are built-in JVM aggregates (HyperLogLog++,
GK/KLL quantiles, count-min): single-pass, map-side partial, one
shuffle, constant state per group — the properties that keep them flat
as the input grows 1000x.

Exactness contract: every function here has an exact twin used by the
unit tests to bound the sketch error (and by the oracle-checked
contract queries, which always use the exact forms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "approx_distinct",
    "approx_quantiles",
    "frequent_items",
    "heavy_hitters",
    "bloom_positions",
    "bloom_build",
    "bloom_contains",
    "hll_registers",
    "hll_registers_multi",
    "hll_merge",
    "hll_estimate",
    "hll_distinct",
]


def approx_distinct(
    df: DataFrame, cols, by=(), *, rsd: float = 0.02
) -> DataFrame:
    """HyperLogLog++ distinct counts per group (one per input col).

    ``rsd`` is the target relative standard deviation (Spark default
    0.05); 0.02 costs ~4 KB of state per (group, column) regardless of
    cardinality — vs the unbounded hash set an exact count needs.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    by = [by] if isinstance(by, str) else list(by)
    aggs = [
        F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_distinct")
        for c in cols
    ]
    return df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)


def approx_quantiles(
    df: DataFrame,
    var: str,
    probabilities=(0.25, 0.5, 0.75),
    by=(),
    *,
    accuracy: int = 10000,
) -> DataFrame:
    """Mergeable quantile sketch per group.

    ``percentile_approx`` (GK-style) gives rank error <= 1/accuracy in
    one pass; the exact ``median``/``percentile`` used by
    ``aggregate_over`` sorts each group.  Output: one row per group
    with ``q_<pct>`` columns.
    """
    by = [by] if isinstance(by, str) else list(by)
    probs = list(probabilities)
    agg = F.percentile_approx(
        var, F.array(*[F.lit(float(p)) for p in probs]), F.lit(accuracy)
    )
    named = [
        F.element_at(agg, i + 1).alias(f"q_{str(p).replace('.', '_')}")
        for i, p in enumerate(probs)
    ]
    return df.groupBy(*by).agg(*named) if by else df.agg(*named)


def frequent_items(
    df: DataFrame, col: str, by=(), *, k: int = 10
) -> DataFrame:
    """Exact top-k most frequent values per group.

    Two-shuffle exact form: count per (group, value), then a top-k
    window per group.  Both aggregations get map-side combine, so the
    shuffle volume is bounded by distinct values, not rows — fine
    whenever the value domain is sub-billion.  For unbounded domains
    use ``heavy_hitters``.
    """
    from pyspark.sql import Window

    by = [by] if isinstance(by, str) else list(by)
    counts = df.groupBy(*by, col).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy(*by)
        if by
        else Window.partitionBy(F.lit(1))
    ).orderBy(F.desc("n"), F.col(col).asc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    threshold: float = 0.001,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
    max_candidates: int = 1024,
) -> list:
    """Values occurring in more than ``threshold`` of rows, via a
    count-min sketch.

    Candidate generation is a deterministic hash-sample of distinct
    values (bounded driver transfer); each candidate's frequency is
    read from a single merged CMS built in one pass over the data —
    overestimate-only error ``eps * n``.  Returns
    ``[(value, est_count)]`` sorted by estimated count descending.

    At most ``max_candidates`` values (the largest by in-sample count)
    are probed: when MORE distinct values than that exceed the
    threshold, the tail beyond the cap is not returned (a
    ``RuntimeWarning`` fires when the cap is hit).  The result is the
    top of the hot tail, not an exhaustive census — exactly what
    salting needs; raise ``max_candidates`` for exhaustive discovery.

    This is the unbounded-domain alternative to ``frequent_items``:
    sketch state is eps/confidence-bounded, never proportional to the
    number of distinct values.  Values are hashed as strings so the
    driver-side probe agrees with the executor-side insert type.

    Plan: one full pass builds the merged CMS (map-side partial
    sketches, one shuffle of ~KB blobs); candidates come from a
    row-level sample — a value with frequency > threshold lands in a
    p-sample w.h.p. once p*n*threshold >> 1 (a value-keyed sample
    would drop whole values and miss hitters), so the sampled-distinct
    driver transfer is small and bounded.
    """
    svals = F.col(col).cast("string")
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.count_min_sketch(
            svals, F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias("cms"),
    ).collect()[0]
    n, blob = int(row["n"]), bytes(row["cms"])
    if n == 0:
        return []
    # sample rate: expect >= ~50 sampled rows per threshold-frequency
    # value -> miss probability (1-p)^(n*threshold) ~ e^-50
    p = min(1.0, 50.0 / (n * threshold))
    # prioritize candidates by their IN-SAMPLE count (distributed
    # groupBy over the sample) and cap the driver transfer: the final
    # CMS probe below is a per-value py4j call (~1 ms each), so an
    # unbounded distinct() here would turn a low threshold into a
    # driver-side loop over every distinct key (r3 fix).  True hitters
    # have the largest sample counts, so the cap keeps them.
    cands = [
        r["v"]
        for r in df.select(svals.alias("v"))
        .where(F.rand(seed) < F.lit(p))
        .groupBy("v")
        .count()
        .orderBy(F.desc("count"), "v")
        .limit(int(max_candidates))
        .collect()
    ]
    if len(cands) == int(max_candidates):
        # the candidate list hit the cap: more than max_candidates
        # distinct values had sampled occurrences, so values beyond the
        # cap (smallest in-sample counts) were never probed — if many
        # keys genuinely exceed `threshold`, some true hitters may be
        # missing from the result.  Raise max_candidates or threshold.
        import warnings

        warnings.warn(
            f"heavy_hitters: candidate probe capped at "
            f"{max_candidates} values; keys beyond the cap were not "
            "probed and true hitters above threshold may be missing — "
            "raise max_candidates (or threshold) for exhaustive "
            "discovery",
            RuntimeWarning,
            stacklevel=2,
        )
    jvm = df.sparkSession._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(blob)
    floor = n * threshold
    out = [
        (v, int(cms.estimateCount(v)))
        for v in cands
        if v is not None and cms.estimateCount(v) > floor
    ]
    return sorted(out, key=lambda t: (-t[1], str(t[0])))


# ---------------------------------------------------------------------------
# Bloom filter — portable, engine-reproducible membership sketch
# ---------------------------------------------------------------------------

def _bloom_position(v: F.Column, m_bits: int, i: int, salt: str) -> F.Column:
    """Position ``i`` of the md5 hash family — THE single definition
    shared by :func:`bloom_positions` (build side) and
    :func:`bloom_contains` (probe side), so tuning it cannot de-sync
    them."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(v.cast("string"), F.lit(f"{salt}:{i}"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(int(m_bits))
    )


def bloom_positions(col, m_bits: int, k: int, salt: str = "") -> F.Column:
    """The ``k`` bit positions a value sets in an ``m_bits`` Bloom
    filter, as ``array<bigint>``.

    Hash family: ``pos_i = int64(md5(value || '{salt}:{i}')[:15 hex])
    mod m_bits`` — plain md5 + hex arithmetic, so any engine can
    reproduce the exact same positions (DuckDB:
    ``('0x' || substr(md5(v || ':0'), 1, 15))::BIGINT % m``).  15 hex
    digits < 2^60 keeps every intermediate non-negative in int64, so
    ``%`` (remainder) and ``mod`` agree across engines.
    """
    v = F.col(col) if isinstance(col, str) else col
    return F.array(
        *[_bloom_position(v, m_bits, i, salt) for i in range(int(k))]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: str = "",
) -> list[int]:
    """Build a Bloom filter over ``df[col]`` as ``m_bits/64`` packed
    int64 words (the driver-side handle you pass to
    :func:`bloom_contains`).

    Distributed build: explode each value's ``k`` positions, map to
    ``(word_index, bit)``, one hash aggregation with map-side partial
    ``bit_or`` — the shuffle carries at most ``m_bits/64`` rows of two
    longs regardless of input size.  The collected words are
    ``m_bits/8`` bytes on the driver (128 KiB at the default 2^20
    bits) — constant, never input-sized.

    Sizing: false-positive rate ≈ ``(1 - e^(-k·n/m))^k``; the default
    (m=2^20, k=4) gives <1% up to n≈130k distinct values.  For a
    100 TB corpus the filter is built over the *small* side (eval
    benchmarks, blocklists) and probed by the big side map-only.
    """
    n_words = (int(m_bits) + 63) // 64
    words_df = (
        df.where(F.col(col).isNotNull())  # NULL hashes to NULL positions
        .select(
            F.explode(
                bloom_positions(F.col(col), m_bits, k, salt)
            ).alias("__p")
        )
        .select(
            F.shiftright(F.col("__p"), 6).cast("int").alias("__w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("__p") % 64).cast("int"),
            ).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
    )
    words = [0] * n_words
    for r in words_df.collect():
        words[r["__w"]] = r["__bits"]
    return words


def bloom_contains(
    col,
    words: list[int],
    *,
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: str = "",
) -> F.Column:
    """Boolean membership probe against a built Bloom filter — a pure
    column expression (map-only, no join, no shuffle): AND over the
    ``k`` per-position bit tests against ONE binary literal.

    The packed words ride the plan as a single BinaryType literal
    (``m_bits/8`` bytes — 128 KiB at the default 2^20 bits; byte ``B``
    of the filter is ``words[B>>3] >> 8*(B&7)``, so bit ``p`` is bit
    ``p&7`` of byte ``p>>3``), extracted per probe with ``substr`` —
    an O(1) byte slice on binary.  The two rejected encodings are
    cautionary: ``lit(list)`` of 16384 words expands to a 16k-node
    CreateArray costing ~8 s of py4j + analysis per query, and a hex
    STRING literal makes every probe pay an O(m_bits) UTF-8
    boundary scan inside ``substr`` (95 s vs ~2 s at sf0.1,
    measured).  False positives only, never false negatives; the rate
    is set by the build's ``m_bits``/``k``.
    """
    buf = bytearray()
    for w in words:
        buf += (int(w) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    blob = F.lit(bytes(buf))
    # the hash family has ONE definition (_bloom_position, shared
    # with the build side); each of the k tests is an independent
    # inline chain so the whole predicate stays in whole-stage
    # codegen.  Rejected forms, both measured slower at sf0.1:
    # element_at(bloom_positions(...), i) re-materializes the whole
    # md5 array per test (k^2 digests, 2.2x), and forall() over the
    # array drops to interpreted HOF evaluation (1.7x).
    v = F.col(col) if isinstance(col, str) else col
    cond = F.lit(True)
    for i in range(int(k)):
        p = _bloom_position(v, m_bits, i, salt)
        byte = F.conv(
            F.hex(
                F.call_function(
                    "substr",
                    blob,
                    (F.shiftright(p, 3) + 1).cast("int"),
                    F.lit(1),
                )
            ),
            16,
            10,
        ).cast("int")
        bit = F.bit_get(byte, (p % 8).cast("int"))
        cond = cond & (bit == F.lit(1).cast("tinyint"))
    return cond


# ---------------------------------------------------------------------------
# Portable HyperLogLog — engine-reproducible distinct-count sketch
# ---------------------------------------------------------------------------
#
# Spark's approx_count_distinct (HLL++) is a JVM-internal sketch: its
# estimates cannot be reproduced by another engine, so it can never be
# driver-hashed.  This family is the PORTABLE twin — the classic
# Flajolet et al. HyperLogLog over the repo's md5 hash recipe
# (15 hex digits -> 60-bit non-negative int64), with the estimator
# arithmetic arranged so every intermediate is either an exact integer
# or a deterministic double expression any engine evaluates
# identically:
#
#   h   = int64(md5(value)[:15 hex])          (60 bits)
#   idx = h >> (60 - p)                        (register, top p bits)
#   w   = h & (2^(60-p) - 1)                   (remaining bits)
#   rho = (60-p) - bitlen(w) + 1, or (60-p)+1 when w = 0
#   S   = sum over all m=2^p registers of 2^(K - M_j), K = 61 - p
#         (EXACT int64: each term <= 2^K, m terms <= 2^61)
#   E   = alpha_m * m^2 * 2^K / S              (one double division)
#   E  <= 2.5m and V empty registers > 0  ->  m * ln(m / V)
#
# bitlen is length(conv(w, 10, 2)) — minimal-width binary, exactly
# DuckDB's length(bin(w)) — so registers, S, V, and the estimate are
# bit-reproducible (ln() last-ulp noise is absorbed by the repo's 6dp
# floor canon).  The register table IS the sketch: mergeable by
# groupBy(idx).max(rho), map-side partial, one shuffle of <= m rows
# per group no matter the input size — the property that makes
# distinct counting free at 100 TB.


def hll_registers(
    df: DataFrame,
    col: str,
    by=(),
    *,
    p: int = 8,
) -> DataFrame:
    """Per-group HyperLogLog register table ``(by..., idx, rho)`` —
    the mergeable sketch state (sparse: absent idx = empty register).

    One map-only projection + one grouped max: the shuffle carries at
    most ``2^p`` rows per group regardless of input rows.  NULL values
    are excluded (the COUNT DISTINCT contract).
    """
    if not 4 <= int(p) <= 16:
        raise ValueError(f"hll_registers: p must be in [4, 16], got {p}")
    by = [by] if isinstance(by, str) else list(by)
    w = 60 - int(p)
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    low = h.bitwiseAND(F.lit((1 << w) - 1))
    bitlen = F.when(
        low > 0, F.length(F.conv(low, 10, 2))
    ).otherwise(F.lit(0))
    staged = (
        df.where(F.col(col).isNotNull())
        .select(
            *by,
            F.shiftright(h, w).alias("idx"),
            (F.lit(w) - bitlen + 1).cast("int").alias("__rho"),
        )
    )
    return staged.groupBy(*by, "idx").agg(F.max("__rho").alias("rho"))


def hll_registers_multi(
    df: DataFrame,
    cols,
    by=(),
    *,
    p: int = 8,
) -> DataFrame:
    """Fused multi-column HLL register tables — ONE pass over ``df``
    yields ``(by..., kind, idx, rho)`` where ``cols`` maps each
    ``kind`` label to a source column (r13 verdict ask #5: sketching
    N columns of the same table ran N full input scans; the fused
    explode runs one).

    Equality contract: the ``kind = k`` slice is row-for-row identical
    to ``hll_registers(df, cols[k], by, p=p)`` — same md5 register
    math, same NULL exclusion (a NULL value contributes no struct to
    the per-row array), same grouped max — so per-kind estimates via
    :func:`hll_estimate` are bit-identical to the per-column path.
    The shuffle carries at most ``len(cols) * 2^p`` rows per group.
    """
    if not 4 <= int(p) <= 16:
        raise ValueError(
            f"hll_registers_multi: p must be in [4, 16], got {p}"
        )
    cols = dict(cols)
    if not cols:
        raise ValueError("hll_registers_multi: need at least one column")
    by = [by] if isinstance(by, str) else list(by)
    w = 60 - int(p)
    entries = []
    for kind, c in cols.items():
        h = F.conv(
            F.substring(F.md5(F.col(c).cast("string")), 1, 15), 16, 10
        ).cast("long")
        low = h.bitwiseAND(F.lit((1 << w) - 1))
        bitlen = F.when(
            low > 0, F.length(F.conv(low, 10, 2))
        ).otherwise(F.lit(0))
        entries.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(
                    F.lit(str(kind)).alias("kind"),
                    F.shiftright(h, w).alias("idx"),
                    (F.lit(w) - bitlen + 1).cast("int").alias("rho"),
                ),
            )
        )
    staged = df.select(
        *by,
        F.explode(F.array_compact(F.array(*entries))).alias("__e"),
    ).select(
        *by,
        F.col("__e.kind").alias("kind"),
        F.col("__e.idx").alias("idx"),
        F.col("__e.rho").alias("__rho"),
    )
    return staged.groupBy(*by, "kind", "idx").agg(
        F.max("__rho").alias("rho")
    )


def hll_merge(sketches, by=()) -> DataFrame:
    """Merge register tables from :func:`hll_registers` — union +
    grouped max, the HLL merge law (sketch(A U B) == merge(sketch(A),
    sketch(B)), exactly, because max is associative/commutative/
    idempotent).  This is what makes the sketch a saved artifact:
    count yesterday's corpus once, merge today's increment in."""
    from functools import reduce

    by = [by] if isinstance(by, str) else list(by)
    it = list(sketches)
    if not it:
        raise ValueError("hll_merge: need at least one sketch")
    u = reduce(DataFrame.unionByName, it)
    return u.groupBy(*by, "idx").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    by=(),
    *,
    p: int = 8,
    round_places: int = 6,
) -> DataFrame:
    """HyperLogLog estimate per group from a register table:
    ``(by..., registers_hit, n_distinct_hll)``.

    The harmonic sum is computed as the EXACT integer
    ``S = sum(2^(K - rho)) + (m - hit) * 2^K`` (every term a power of
    two <= 2^K, total <= 2^61 — int64-exact on any engine), so the
    only float steps are one division and the small-range ``ln``,
    both deterministic under the repo's 6dp floor canon.  Relative
    error ~= 1.04/sqrt(2^p) (~6.5% at the default p=8; use p=12 for
    ~1.6% at 4096 registers per group).
    """
    if not 4 <= int(p) <= 16:
        raise ValueError(f"hll_estimate: p must be in [4, 16], got {p}")
    by = [by] if isinstance(by, str) else list(by)
    m = 1 << int(p)
    k_exp = 61 - int(p)
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else (
        0.673 if m == 16 else 0.697 if m == 32 else 0.709
    )
    agg = registers.groupBy(*by).agg(
        F.count(F.lit(1)).alias("registers_hit"),
        # 2^(K - rho) as an exact int64 shift (DataFrame shiftleft
        # only takes a python-int shift, so SQL-expression form)
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {k_exp} - rho)")
        ).alias("__s_hit"),
    )
    s = (
        F.col("__s_hit")
        + (F.lit(m) - F.col("registers_hit")) * F.lit(1 << k_exp)
    ).cast("double")
    v = F.lit(m) - F.col("registers_hit")  # empty registers
    e_raw = (
        F.lit(float(alpha) * m * m) * F.lit(float(1 << k_exp)) / s
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    from ..pipeline.text import _round_det

    return agg.select(
        *by,
        F.col("registers_hit").cast("long").alias("registers_hit"),
        _round_det(est, round_places).alias("n_distinct_hll"),
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    by=(),
    *,
    p: int = 8,
    round_places: int = 6,
) -> DataFrame:
    """One-call portable distinct count: :func:`hll_registers` +
    :func:`hll_estimate`.  The engine-reproducible sibling of
    :func:`approx_distinct` — same single-shuffle plan shape, but the
    estimate is bit-identical on any engine that can md5, so it can
    sit under the driver's value hash like an exact query."""
    return hll_estimate(
        hll_registers(df, col, by, p=p),
        by,
        p=p,
        round_places=round_places,
    )
