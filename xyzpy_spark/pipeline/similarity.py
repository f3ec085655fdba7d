"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact, O(n·q), the correctness
oracle).  Scale path: IVF-Flat — coarse-quantize vectors into C
centroid cells; queries probe only the ``nprobe`` nearest cells, so
the scan cost drops by ~C/nprobe.  Everything is array arithmetic in
whole-stage codegen (``zip_with`` + ``aggregate``): no Python, no MLlib
dependency, executor-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .artifacts import delete_marker_first
from ..utils import local_df


def _render_sql_lit(x) -> str:
    """Render a (nested) int/float list as a Spark SQL array literal."""
    if isinstance(x, (list, tuple)):
        return "array(" + ",".join(_render_sql_lit(v) for v in x) + ")"
    if isinstance(x, bool):
        raise TypeError("_render_sql_lit: bool is not a numeric literal")
    if isinstance(x, int):
        return f"{x}L"
    if isinstance(x, float):
        if x != x or x in (float("inf"), float("-inf")):
            raise ValueError("_render_sql_lit: non-finite literal")
        # repr() is the shortest round-tripping decimal form; the SQL
        # parser's Double.parseDouble re-rounds it to the IDENTICAL
        # binary64, so the literal value is bit-equal to F.lit(x)
        return repr(x) + "D"
    raise TypeError(f"_render_sql_lit: {type(x).__name__}")


def _array_lit(data, ddl: str) -> F.Column:
    """ONE-call plan literal for a nested numeric table.

    ``F.array(*[F.lit(x) ...])`` costs a py4j round trip per element —
    the portable centroid/codebook/cross tables paid thousands of
    driver-side calls (measured ~3.5 s of the similarity_ivf_pq gate
    row before any job ran, tools/ivfpq_stages.py).  Rendering the
    same values into one SQL ``array(...)`` string and parsing it with
    ``F.expr`` builds the identical foldable expression in a single
    call; ConstantFolding collapses both forms to the same Literal
    before execution.  ``ddl`` pins the element type exactly as the
    old per-level ``.cast(...)`` did (and keeps empty arrays typed)."""
    return F.expr(f"CAST({_render_sql_lit(data)} AS {ddl})")


def _array_lit_sql(data, ddl: str) -> str:
    """The SQL-fragment form of :func:`_array_lit` — for composing
    larger single-parse expressions (r14, guide §5 driver round
    trips)."""
    return f"CAST({_render_sql_lit(data)} AS {ddl})"


def _int_dot_sql(a: str, b: str) -> str:
    """SQL-fragment twin of ``dedup._int_dot`` (exact int64 dot over
    quantized vectors): same aggregate/zip_with/lambda tree, parsed in
    one ``F.expr`` instead of ~25 py4j calls per use (r14)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(v) -> F.Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast the (small) query set against the corpus scan,
    compute cosine JVM-side, then a per-query ``row_number`` window
    over cosine.  One shuffle (the window partition by query id);
    corpus is never shuffled by vector payload.
    """
    query_id_col = query_id_col or id_col
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    scored = (
        c.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")),
        )
    )
    # rank on a 9-dp rounding so ordering is reproducible across
    # engines/summation orders (raw doubles can differ in the last ulp)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "nbr_id", "rank", F.round("cosine", 6).alias("cosine")
        )
    )


def _nearest_cell(centroids: list, vec_col: str) -> F.Column:
    """0-based argmax-cosine cell id over the (small) centroid list —
    centroids enter the plan as literals, so assignment is pure
    codegen over the corpus scan (no join, no Python)."""
    cent_arr = _array_lit(
        [[float(x) for x in c] for c in centroids],
        "array<array<double>>",
    )
    v = F.col(vec_col).cast("array<double>")
    sims = F.transform(
        cent_arr,
        lambda c: _dot(c, v) / (_norm(c) * _norm(v)),
    )
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def ivf_build(
    corpus: DataFrame,
    *,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_seed: int = 42,
    kmeans_iters: int = 2,
) -> tuple[DataFrame, list]:
    """Assign every vector to its nearest coarse centroid (IVF-Flat).

    Centroids start as a deterministic seeded sample of the corpus and
    are refined by ``kmeans_iters`` rounds of distributed spherical
    Lloyd iteration: assign (codegen argmax over centroid literals) →
    per-(cell, dim) mean via one posexplode + aggregation shuffle →
    driver rebuilds the n_cells x dim literal table (tiny).  Empty
    cells keep their previous centroid.  ``kmeans_iters=0`` restores
    the single-pass sample-only build.  Returns the corpus with a
    ``cell`` column plus the centroid list.
    """
    # hash a string concat, not `id + seed`: arithmetic `+` casts a
    # non-numeric id to double (all-NULL sort key → partition-order
    # dependent sample); concat matches the md5 recipe the portable
    # variants use
    cents = (
        corpus.select(id_col, vec_col)
        .orderBy(
            F.xxhash64(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit(":" + str(sample_seed)),
                )
            )
        )
        .limit(n_cells)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in cents]

    for _ in range(kmeans_iters):
        assigned = corpus.withColumn(
            "cell", _nearest_cell(centroids, vec_col)
        )
        rows = (
            assigned.select(
                "cell",
                F.posexplode(
                    F.col(vec_col).cast("array<double>")
                ).alias("pos", "x"),
            )
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        means: dict[int, dict[int, float]] = {}
        for r in rows:
            means.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        centroids = [
            [means[c][p] for p in range(len(centroids[c]))]
            if c in means
            else centroids[c]
            for c in range(len(centroids))
        ]

    assigned = corpus.withColumn("cell", _nearest_cell(centroids, vec_col))
    return assigned, centroids


def ivf_topk_portable(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    seed: int = 42,
    quantize: int = 1 << 20,
) -> DataFrame:
    """Portable-exact IVF-Flat top-k — deterministic twin of
    ``ivf_build(kmeans_iters=0) + ivf_topk`` that a DuckDB SQL oracle
    can reproduce bit-for-bit.

    Cross-engine exactness recipe (same as the portable MinHash /
    SimHash / embedding-LSH modes):

    - centroids = the ``n_cells`` corpus rows with the smallest
      ``md5(id || ':seed')`` digest — a deterministic seeded sample
      both engines order identically (cell index = rank in that
      order);
    - vectors quantized ``floor(x * quantize)`` -> exact BIGINT dots
      and norms (every sum < 2^53, exact in int64 *and* double);
    - every similarity is ``dot / (sqrt(n2_a) * sqrt(n2_b))`` over
      those exact integers — IEEE correctly-rounded ops on identical
      inputs, so cell argmax, probe ranking and final top-k order
      agree exactly (ties broken by cell index / neighbor id).

    The k-means refinement stays on the production path
    (:func:`ivf_build`): its distributed float means are
    partition-order-sensitive, which no SQL twin can replicate.
    Plan shape matches production: centroid literals -> codegen
    argmax (no join) for assignment, broadcast probe join, one
    window per query for top-k.
    """
    query_id_col = query_id_col or id_col
    from .dedup import _int_dot, _qvec

    md5key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")).cast(
            "binary"
        )
    )
    cents = (
        corpus.select(
            F.col(id_col), _qvec(vec_col, quantize).alias("qv")
        )
        .orderBy(md5key)
        .limit(n_cells)
        .collect()
    )
    cent_q = [[int(x) for x in r["qv"]] for r in cents]
    cent_lit = _array_lit(cent_q, "array<array<bigint>>")
    cn2_lit = _array_lit(
        [sum(x * x for x in c) for c in cent_q], "array<bigint>"
    )

    def _sims(qv: F.Column) -> F.Column:
        vn = F.sqrt(_int_dot(qv, qv).cast("double"))
        return F.zip_with(
            cent_lit,
            cn2_lit,
            lambda c, n2: _int_dot(c, qv)
            / (F.sqrt(n2.cast("double")) * vn),
        )

    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        _qvec(vec_col, quantize).alias("cv"),
    )
    # materialize the similarity array once: Catalyst does not CSE
    # higher-order-function trees, so inlining _sims twice (position +
    # max) would double the most expensive per-row expression
    c = (
        c.withColumn("__sims", _sims(F.col("cv")))
        .withColumn(
            "cell",
            (
                F.array_position(
                    F.col("__sims"), F.array_max(F.col("__sims"))
                )
                - 1
            ).cast("int"),
        )
        .drop("__sims")
        .withColumn(
            "cn", F.sqrt(_int_dot(F.col("cv"), F.col("cv")).cast("double"))
        )
    )

    idx = F.sequence(F.lit(0), F.lit(n_cells - 1))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _qvec(vec_col, quantize).alias("qv"),
    )
    probe_cells = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    _sims(F.col("qv")),
                    idx,
                    lambda s, i: F.struct(
                        (-s).alias("neg"), i.alias("i")
                    ),
                )
            ),
            lambda st: st["i"],
        ),
        1,
        nprobe,
    )
    q = (
        q.withColumn("qn", F.sqrt(_int_dot(F.col("qv"), F.col("qv")).cast("double")))
        .withColumn("cell", F.explode(probe_cells))
        .select("query_id", "qv", "qn", F.col("cell").cast("int").alias("cell"))
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("nbr_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _int_dot(F.col("cv"), F.col("qv"))
            / (F.col("cn") * F.col("qn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "nbr_id", "rank", F.round("cosine", 6).alias("cosine")
        )
    )


def ivf_topk(
    corpus_with_cells: DataFrame,
    centroids: list,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest cells.

    The candidate set shrinks by ~n_cells/nprobe versus brute force;
    the remaining scoring is identical to :func:`cosine_topk`.  At
    cluster scale, partition (or bucket) the corpus by ``cell`` so a
    probe touches only matching partitions.
    """
    query_id_col = query_id_col or id_col
    cent_arr = _array_lit(
        [[float(x) for x in c] for c in centroids],
        "array<array<double>>",
    )
    qv = F.col(vec_col).cast("array<double>")
    sims = F.transform(cent_arr, lambda c: _dot(c, qv) / (_norm(c) * _norm(qv)))
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    ranked_cells = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    sims, idx, lambda s, i: F.struct((-s).alias("neg"), i.alias("i"))
                )
            ),
            lambda s: s["i"],
        ),
        1,
        nprobe,
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        qv.alias("qv"),
        ranked_cells.alias("probe_cells"),
    ).withColumn("qn", _norm(F.col("qv")))
    q = q.select(
        "query_id", "qv", "qn", F.explode("probe_cells").alias("cell")
    )
    c = corpus_with_cells.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.col("cell").cast("int").alias("cell"),
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("nbr_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "nbr_id", "rank", F.round("cosine", 6).alias("cosine")
        )
    )


def _pq_codebook_lit(codebook: list) -> F.Column:
    """One subspace's ksub x dsub codeword table as a nested array
    literal (ksub * dsub doubles — one F.expr parse, not one py4j
    call per element)."""
    return _array_lit(
        [[float(x) for x in c] for c in codebook], "array<array<double>>"
    )


def _pq_encode_expr(codebooks: list, vec_col: str) -> F.Column:
    """``array<int>`` of per-subspace nearest-codeword indices
    (L2 argmin), pure codegen over literal codebooks — encoding never
    joins and never leaves the JVM."""
    v = F.col(vec_col).cast("array<double>")
    parts = []
    dsub = len(codebooks[0][0])

    # NOTE: a two-parameter lambda makes PySpark pass (element, index)
    # to the HOF — closing over the subvector via a default arg would
    # silently bind it to the INDEX.  Use a one-arg closure factory.
    def _cost_fn(sub):
        return lambda c: _dot(c, c) - F.lit(2.0) * _dot(c, sub)

    for j, cb in enumerate(codebooks):
        sub = F.slice(v, j * dsub + 1, dsub)
        # ||x - c||^2 ranks identically to |c|^2 - 2 x.c (x fixed)
        costs = F.transform(_pq_codebook_lit(cb), _cost_fn(sub))
        parts.append(
            (F.array_position(costs, F.array_min(costs)) - 1).cast("int")
        )
    return F.array(*parts)


def pq_build(
    corpus: DataFrame,
    *,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_seed: int = 42,
    kmeans_iters: int = 2,
) -> tuple[DataFrame, list]:
    """Product-quantization codebooks + codes (Jégou et al., PQ for
    nearest neighbor search): the vector is split into ``m``
    subvectors, each quantized to one of ``ksub`` learned codewords,
    so a D-float vector compresses to ``m`` small ints.

    Why this is the ANN scale tier: IVF-Flat's within-cell scan reads
    the full D floats per candidate; with PQ the scan reads ``m``
    bytes of codes and scores against a per-query lookup table, an
    8-16x cut in scanned bytes at 10^9+ vectors, with an EXACT
    re-rank of the shortlist restoring precision
    (:func:`pq_topk`).

    Training mirrors :func:`ivf_build`: codewords start as the
    subvectors of a deterministic seeded corpus sample and are
    refined by ``kmeans_iters`` distributed Lloyd rounds — ONE
    posexplode aggregation per round trains all ``m`` subspaces
    simultaneously (subspace = dim // dsub of the exploded position),
    driver rebuilds the bounded ``m x ksub x dsub`` literal table.
    Empty clusters keep their previous codeword.  Returns the corpus
    with a ``codes`` column plus the codebook list.
    """
    if m < 1 or ksub < 2:
        raise ValueError("pq_build: need m >= 1 and ksub >= 2")
    # string-concat seed key (not `id + seed` — NULL for string ids);
    # same recipe as ivf_build and the md5 portable variants
    sample = (
        corpus.select(id_col, vec_col)
        .orderBy(
            F.xxhash64(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit(":" + str(sample_seed)),
                )
            )
        )
        .limit(ksub)
        .collect()
    )
    if not sample:
        raise ValueError("pq_build: empty corpus")
    # a corpus smaller than ksub yields fewer seed codewords; clamp so
    # the Lloyd rebuild below iterates existing codewords (review
    # catch: range(ksub) indexed past the short sample)
    ksub = min(ksub, len(sample))
    dim = len(sample[0][vec_col])
    if dim % m:
        raise ValueError(f"pq_build: dim {dim} not divisible by m={m}")
    dsub = dim // m
    codebooks = [
        [
            [float(x) for x in r[vec_col][j * dsub : (j + 1) * dsub]]
            for r in sample
        ]
        for j in range(m)
    ]

    for _ in range(kmeans_iters):
        assigned = corpus.withColumn(
            "__codes", _pq_encode_expr(codebooks, vec_col)
        )
        rows = (
            assigned.select(
                "__codes",
                F.posexplode(
                    F.col(vec_col).cast("array<double>")
                ).alias("pos", "x"),
            )
            .select(
                (F.col("pos") / dsub).cast("int").alias("j"),
                F.element_at(
                    "__codes", (F.col("pos") / dsub).cast("int") + 1
                ).alias("code"),
                (F.col("pos") % dsub).alias("p"),
                "x",
            )
            .groupBy("j", "code", "p")
            .agg(F.avg("x").alias("mean"))
            .collect()
        )
        means: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            means.setdefault((r["j"], r["code"]), {})[r["p"]] = r["mean"]
        codebooks = [
            [
                [means[(j, c)][p] for p in range(dsub)]
                if (j, c) in means
                else codebooks[j][c]
                for c in range(ksub)
            ]
            for j in range(m)
        ]

    coded = corpus.withColumn(
        "codes", _pq_encode_expr(codebooks, vec_col)
    ).withMetadata("codes", {"pq_mode": "raw"})
    return coded, codebooks


def _check_pq_mode(corpus: DataFrame, expected: str, caller: str) -> None:
    """Coding-mode guard: :func:`pq_build` stamps ``pq_mode='raw'`` and
    :func:`ivf_pq_build` stamps ``pq_mode='residual'`` in the ``codes``
    column METADATA (rides the schema, survives a parquet save/load of
    the index, costs the scan nothing).  Scoring codes under the wrong
    reconstruction silently degrades the shortlist — so a stamped
    corpus whose mode disagrees with the search raises here;
    pre-stamp corpora pass through unchecked."""
    if "codes" not in corpus.columns:
        return
    stamped = dict(corpus.schema["codes"].metadata or {}).get("pq_mode")
    if stamped is not None and stamped != expected:
        if stamped == "residual":
            fix = (
                "search it with ivf_pq_topk(..., residual=True) — "
                "residual codes need the cell centroids to reconstruct"
            )
        else:
            fix = (
                "search it with residual=False / pq_topk, or rebuild "
                "the index with ivf_pq_build for residual search"
            )
        raise ValueError(
            f"{caller}: corpus codes were built in pq_mode="
            f"'{stamped}' but this search scores them as "
            f"'{expected}' — {fix} (raw codes come from pq_build, "
            "residual codes from ivf_pq_build)"
        )


def _pq_query_lut(codebooks: list, qv: F.Column, dsub: int) -> F.Column:
    """Per-query partial-dot LUT: ``lut[j][c] = dot(q_j,
    codebook[j][c])`` — shared by :func:`pq_topk` and
    :func:`ivf_pq_topk` (one-arg closure factory: two-param HOF
    lambdas bind (element, index))."""

    def _lut_fn(sub):
        return lambda c: _dot(c, sub)

    return F.array(
        *[
            F.transform(
                _pq_codebook_lit(cb),
                _lut_fn(F.slice(qv, j * dsub + 1, dsub)),
            )
            for j, cb in enumerate(codebooks)
        ]
    )


def _pq_n2_lit(codebooks: list) -> F.Column:
    """Query-independent codeword squared norms ``n2[j][c]`` as one
    nested literal."""
    return _array_lit(
        [
            [float(sum(x * x for x in c)) for c in cb]
            for cb in codebooks
        ],
        "array<array<double>>",
    )


def pq_topk(
    corpus_with_codes: DataFrame,
    codebooks: list,
    queries: DataFrame,
    *,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Top-k cosine via PQ asymmetric distance + exact re-rank.

    Stage 1 (compressed scan): every candidate is scored as
    ``sum_j lut[j][code_j] / (|q| * sqrt(sum_j n2[j][code_j]))`` where
    ``lut`` holds the query-subvector x codeword partial dots —
    computed once per query row from the codebook LITERALS, shipped
    with the broadcast query side.  The corpus side references only
    ``id`` and ``codes``: column pruning keeps the D-float vectors
    OUT of the scan entirely (plan-asserted), which is the point at
    scale.  Stage 2: the per-query ``shortlist`` best approximate
    candidates join back to the corpus by id (shortlist-sized seek,
    AQE-broadcast) and are re-ranked by EXACT cosine, so the top-k
    quality depends on PQ only through shortlist recall.

    Compose with IVF by passing a cell-filtered
    ``corpus_with_codes`` — the plan shape is unchanged.
    """
    _check_pq_mode(corpus_with_codes, "raw", "pq_topk")
    query_id_col = query_id_col or id_col
    dsub = len(codebooks[0][0])
    qv = F.col(vec_col).cast("array<double>")
    lut = _pq_query_lut(codebooks, qv, dsub)
    n2_lit = _pq_n2_lit(codebooks)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        qv.alias("qv"),
        _norm(qv).alias("qn"),
        lut.alias("lut"),
    )
    c = corpus_with_codes.select(
        F.col(id_col).alias("nbr_id"), F.col("codes").alias("codes")
    )
    approx_dot = F.aggregate(
        F.zip_with(
            "codes",
            F.col("lut"),
            lambda code, lj: F.element_at(lj, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    approx_n2 = F.aggregate(
        F.zip_with(
            "codes",
            n2_lit,
            lambda code, nj: F.element_at(nj, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        c.crossJoin(F.broadcast(q.drop("qv")))
        .where(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            (
                approx_dot
                / (F.col("qn") * F.sqrt(F.greatest(approx_n2, F.lit(1e-300))))
            ).alias("__approx"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("__approx"), F.asc("nbr_id")
    )
    short = (
        scored.withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= shortlist)
        .select("query_id", "nbr_id")
    )
    # exact re-rank: shortlist joins back to the full vectors
    vecs = corpus_with_codes.select(
        F.col(id_col).alias("nbr_id"),
        qv.alias("cv"),
        _norm(qv).alias("cn"),
    )
    exact = (
        short.join(vecs, "nbr_id")
        .join(
            F.broadcast(q.select("query_id", "qv", "qn")), "query_id"
        )
        .withColumn(
            "cosine",
            _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("nbr_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "nbr_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def ivf_pq_build(
    corpus: DataFrame,
    *,
    n_cells: int = 8,
    m: int = 16,
    ksub: int = 16,
    kmeans_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_seed: int = 42,
) -> tuple[DataFrame, list, list]:
    """RESIDUAL-encoded IVF-PQ index build — the Jegou et al.
    construction: coarse-quantize with :func:`ivf_build`, then train
    the product quantizer on the residuals ``x - centroid(cell)`` and
    encode those, not the raw vectors.  Residuals inside a cell span
    a much smaller volume, so the same ``m x ksub`` code budget buys
    strictly finer quantization — the reason IVF-PQ holds recall at
    10^9 vectors where raw-vector codes degrade.

    Plan shape: the residual is one ``zip_with`` subtract against the
    per-cell centroid literal (map-only, fused into the same scan as
    the PQ encode); training reuses :func:`pq_build` unchanged on the
    staged residual column — ONE posexplode aggregation per Lloyd
    round for all subspaces.  Returns ``(corpus + cell + codes,
    centroids, codebooks)``; search with
    ``ivf_pq_topk(..., residual=True)``.
    """
    assigned, centroids = ivf_build(
        corpus, n_cells=n_cells, kmeans_iters=kmeans_iters,
        id_col=id_col, vec_col=vec_col, sample_seed=sample_seed,
    )
    cent_arr = _array_lit(
        [[float(x) for x in c] for c in centroids],
        "array<array<double>>",
    )
    staged = assigned.withColumn(
        "__resid",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.element_at(cent_arr, F.col("cell").cast("int") + 1),
            lambda x, c: x - c,
        ),
    )
    coded, codebooks = pq_build(
        staged, m=m, ksub=ksub, kmeans_iters=kmeans_iters,
        id_col=id_col, vec_col="__resid", sample_seed=sample_seed,
    )
    return (
        coded.drop("__resid").withMetadata(
            "codes", {"pq_mode": "residual"}
        ),
        centroids,
        codebooks,
    )


def ivf_pq_topk(
    corpus_with_cells_codes: DataFrame,
    centroids: list,
    codebooks: list,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    residual: bool = False,
) -> DataFrame:
    """IVF coarse pruning x PQ compressed scoring — the full
    billion-vector plan shape: the query probes only its ``nprobe``
    nearest cells (an EQUI-join on ``cell``, so a cell-partitioned /
    bucketed corpus layout prunes the scan to matching partitions),
    candidates inside probed cells are scored from their ``m``-byte
    codes against the per-query LUT, and the per-query ``shortlist``
    is re-ranked by exact cosine.  Combines :func:`ivf_build` (for
    ``cell`` + centroids) and :func:`pq_build` (for ``codes`` +
    codebooks) — run both over the corpus first; at scale both are
    one-time index builds saved as a table.

    ``residual=True`` is the standard IVF-PQ construction (Jegou,
    Douze, Schmid, "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011): the codes quantize the RESIDUAL
    ``x - centroid(cell)`` (build with :func:`ivf_pq_build`), which
    keeps PQ precision where it matters — residuals inside a tight
    cell span a far smaller volume than raw vectors, so the same
    ``m x ksub`` budget buys finer quantization and the shortlist can
    shrink.  The compressed score reconstructs
    ``dot(q, x) ~ dot(q, c_cell) + LUT-sum`` and ``|x|^2 ~ |c_cell|^2
    + 2*cross(cell, codes) + |r|^2`` where the query-independent
    cross terms ``dot(c_cell_j, codeword_jc)`` ride the plan as one
    ``n_cells x m x ksub`` literal (fine for the coarse-cell counts
    this composition targets; at 4096 cells x 256 codes the cross
    table becomes a broadcast-joined table instead).

    Scan cost versus the tiers it composes: brute force reads n
    vectors; IVF-Flat reads ~n·nprobe/n_cells vectors; this reads
    ~n·nprobe/n_cells CODE rows (8-16x smaller) and only
    shortlist·n_queries full vectors.
    """
    _check_pq_mode(
        corpus_with_cells_codes,
        "residual" if residual else "raw",
        "ivf_pq_topk",
    )
    query_id_col = query_id_col or id_col
    dsub = len(codebooks[0][0])
    qv = F.col(vec_col).cast("array<double>")

    # rank cells for each query (same expression as ivf_topk)
    cent_arr = _array_lit(
        [[float(x) for x in c] for c in centroids],
        "array<array<double>>",
    )
    sims = F.transform(
        cent_arr, lambda c: _dot(c, qv) / (_norm(c) * _norm(qv))
    )
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    probe_cells = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    sims, idx,
                    lambda s, i: F.struct((-s).alias("neg"), i.alias("i")),
                )
            ),
            lambda st: st["i"],
        ),
        1,
        nprobe,
    )

    lut = _pq_query_lut(codebooks, qv, dsub)
    n2_lit = _pq_n2_lit(codebooks)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        qv.alias("qv"),
        _norm(qv).alias("qn"),
        lut.alias("lut"),
        probe_cells.alias("probe_cells"),
    )
    q_probe = q.select(
        "query_id", "qn", "lut",
        F.explode("probe_cells").alias("cell"),
    )
    if residual:
        # per-(query, probed cell) centroid dot rides the tiny probe
        # side; the query-independent cell constants are literals
        q_probe = q_probe.join(
            F.broadcast(q.select("query_id", "qv")), "query_id"
        ).select(
            "query_id", "qn", "lut", "cell",
            _dot(
                F.element_at(cent_arr, F.col("cell") + 1),
                F.col("qv"),
            ).alias("__q_dot_c"),
        )
        c_n2_lit = _array_lit(
            [float(sum(x * x for x in cvec)) for cvec in centroids],
            "array<double>",
        )
        cross_lit = _array_lit(
            [
                [
                    [
                        float(
                            sum(
                                cvec[j * dsub + p] * cw[p]
                                for p in range(dsub)
                            )
                        )
                        for cw in codebooks[j]
                    ]
                    for j in range(len(codebooks))
                ]
                for cvec in centroids
            ],
            "array<array<array<double>>>",
        )
    c = corpus_with_cells_codes.select(
        F.col(id_col).alias("nbr_id"),
        F.col("codes").alias("codes"),
        F.col("cell").cast("int").alias("cell"),
    )
    approx_dot = F.aggregate(
        F.zip_with(
            "codes", F.col("lut"),
            lambda code, lj: F.element_at(lj, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    approx_n2 = F.aggregate(
        F.zip_with(
            "codes", n2_lit,
            lambda code, nj: F.element_at(nj, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if residual:
        cross_sum = F.aggregate(
            F.zip_with(
                "codes",
                F.element_at(cross_lit, F.col("cell") + 1),
                lambda code, cj: F.element_at(cj, code + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        approx_dot = F.col("__q_dot_c") + approx_dot
        approx_n2 = (
            F.element_at(c_n2_lit, F.col("cell") + 1)
            + 2.0 * cross_sum
            + approx_n2
        )
    scored = (
        c.join(F.broadcast(q_probe), "cell")
        .where(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            (
                approx_dot
                / (
                    F.col("qn")
                    * F.sqrt(F.greatest(approx_n2, F.lit(1e-300)))
                )
            ).alias("__approx"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("__approx"), F.asc("nbr_id")
    )
    short = (
        scored.withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= shortlist)
        .select("query_id", "nbr_id")
    )
    vecs = corpus_with_cells_codes.select(
        F.col(id_col).alias("nbr_id"),
        qv.alias("cv"),
        _norm(qv).alias("cn"),
    )
    exact = (
        short.join(vecs, "nbr_id")
        .join(F.broadcast(q.select("query_id", "qv", "qn")), "query_id")
        .withColumn(
            "cosine",
            _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("nbr_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "nbr_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def pq_topk_portable(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    m: int = 8,
    ksub: int = 8,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    seed: int = 42,
    quantize: int = 1 << 20,
) -> DataFrame:
    """Portable-exact PQ top-k — deterministic twin of
    ``pq_build(kmeans_iters=0) + pq_topk`` that a DuckDB SQL oracle
    reproduces bit-for-bit (the :func:`ivf_topk_portable` recipe
    applied to product quantization):

    - codewords = the ``ksub`` corpus rows with the smallest
      ``md5(id || ':seed')`` digest, split into ``m`` subvectors
      (code index = rank in that order);
    - vectors quantized ``floor(x * quantize)`` -> every dot, squared
      norm, and encode cost (``|c|^2 - 2 x.c``) is EXACT int64;
    - approximate score ``sum_j lut[j][code_j] / (|q| *
      sqrt(sum_j n2[j][code_j]))`` over those exact integers — IEEE
      identical across engines, so the shortlist ranking agrees
      exactly (ties to the smaller neighbor id);
    - the shortlist re-rank is the exact integer cosine.

    The k-means refinement stays on the production path
    (:func:`pq_build`), same split as IVF.  Plan shape matches
    production :func:`pq_topk`: literal codebooks -> codegen encode,
    broadcast LUT cross join over (id, codes), window shortlist,
    equi-join re-rank.
    """
    query_id_col = query_id_col or id_col
    from .dedup import _int_dot, _qvec

    md5key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")).cast(
            "binary"
        )
    )
    cents = (
        corpus.select(F.col(id_col), _qvec(vec_col, quantize).alias("qv"))
        .orderBy(md5key)
        .limit(ksub)
        .collect()
    )
    cw = [[int(x) for x in r["qv"]] for r in cents]
    dim = len(cw[0])
    if dim % m:
        raise ValueError(f"pq_topk_portable: dim {dim} not divisible by m={m}")
    dsub = dim // m
    cb_q = [
        [cw[c][j * dsub : (j + 1) * dsub] for c in range(len(cw))]
        for j in range(m)
    ]
    n2 = [[sum(x * x for x in c) for c in cb_q[j]] for j in range(m)]

    # SQL-fragment construction, one F.expr parse per column (r14 —
    # the ivf_pq_topk_portable rewrite's twin; see the note there).
    # Encode cost |c|^2 - 2 x.c ranks like L2; zip_with pairs each
    # codeword with its precomputed |c|^2.
    def _cb_sql(j: int) -> str:
        return _array_lit_sql(cb_q[j], "array<array<bigint>>")

    def _n2_sql(j: int) -> str:
        return _array_lit_sql(n2[j], "array<bigint>")

    def _enc_sql(v: str) -> str:
        parts = []
        for j in range(m):
            sub = f"slice({v}, {j * dsub + 1}, {dsub})"
            costs = (
                f"zip_with({_cb_sql(j)}, {_n2_sql(j)}, (c, nn) -> "
                f"nn - 2 * {_int_dot_sql('c', sub)})"
            )
            parts.append(
                f"cast(array_position({costs}, array_min({costs}))"
                " - 1 as int)"
            )
        return "array(" + ",".join(parts) + ")"

    c = (
        corpus.select(
            F.col(id_col).alias("nbr_id"),
            _qvec(vec_col, quantize).alias("cv"),
        )
        .withColumn("codes", F.expr(_enc_sql("`cv`")))
        .withColumn(
            "cn",
            F.expr(
                f"sqrt(cast({_int_dot_sql('`cv`', '`cv`')} as double))"
            ),
        )
    )
    lut_sql = "array(" + ",".join(
        f"transform({_cb_sql(j)}, c -> "
        + _int_dot_sql("c", f"slice(`qv`, {j * dsub + 1}, {dsub})")
        + ")"
        for j in range(m)
    ) + ")"
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _qvec(vec_col, quantize).alias("qv"),
        )
        .withColumn(
            "qn",
            F.expr(
                f"sqrt(cast({_int_dot_sql('`qv`', '`qv`')} as double))"
            ),
        )
        .withColumn("lut", F.expr(lut_sql))
    )
    n2_full_sql = _array_lit_sql(n2, "array<array<bigint>>")
    approx_dot = (
        "aggregate(zip_with(`codes`, `lut`, "
        "(code, lj) -> element_at(lj, code + 1)), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )
    approx_n2 = (
        f"aggregate(zip_with(`codes`, {n2_full_sql}, "
        "(code, nj) -> element_at(nj, code + 1)), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )
    scored = (
        c.select("nbr_id", "codes")
        .crossJoin(F.broadcast(q.select("query_id", "qn", "lut")))
        .where(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            # all-zero codewords would divide by zero; n2 >= 1 for any
            # nonzero codeword, so the guard is value-neutral
            # elsewhere (mirrored in the oracle)
            F.expr(
                f"cast({approx_dot} as double) / (`qn` * "
                f"sqrt(cast(greatest({approx_n2}, 1) as double)))"
            ).alias("__a"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("__a"), F.asc("nbr_id")
    )
    short = (
        scored.withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= shortlist)
        .select("query_id", "nbr_id")
    )
    exact = (
        short.join(c.select("nbr_id", "cv", "cn"), "nbr_id")
        .join(F.broadcast(q.select("query_id", "qv", "qn")), "query_id")
        .withColumn(
            "cosine",
            _int_dot(F.col("cv"), F.col("qv"))
            / (F.col("cn") * F.col("qn")),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "nbr_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )




def ivf_pq_topk_portable(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 8,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    seed: int = 42,
    cw_seed: int = 43,
    quantize: int = 1 << 20,
) -> DataFrame:
    """Portable-exact RESIDUAL IVF-PQ top-k — the deterministic twin
    of ``ivf_pq_build + ivf_pq_topk(residual=True)`` (the production
    billion-vector configuration, Jégou et al. TPAMI 2011) that a
    DuckDB SQL oracle reproduces bit-for-bit.  Composition of the
    :func:`ivf_topk_portable` and :func:`pq_topk_portable` recipes
    plus the residual reconstruction's per-cell constants:

    - coarse centroids = the ``n_cells`` corpus rows with the
      smallest ``md5(id || ':seed')`` digest, quantized
      ``floor(x * quantize)`` (exact int64); cell assignment is the
      exact-integer cosine argmax;
    - PQ codewords = the RESIDUALS ``x - centroid(cell(x))`` of the
      ``ksub`` rows with the smallest ``md5(id || ':cw_seed')``
      digest (a different seed, so centroid rows — whose residuals
      are zero — don't dominate the codebook), split into ``m``
      subvectors; residuals of quantized integers are exact int64;
    - the compressed score reconstructs exactly what
      :func:`ivf_pq_topk` ``residual=True`` reconstructs —
      ``dot(q,x) ~ dot(q,c_cell) + LUT-sum`` and ``|x|^2 ~ |c|^2 +
      2*cross(cell, codes) + |r|^2`` — but over exact integers, every
      term accumulated in int64 and cast to double ONCE at the final
      division, so shortlist ranking is IEEE-identical cross-engine
      (``|c|^2 + 2*cross + |r~|^2 = sum((c_d + r~_d)^2) >= 0`` keeps
      the sqrt guard value-neutral);
    - the ``shortlist`` re-rank is the exact integer cosine.

    The k-means-refined float path stays on :func:`ivf_pq_build` /
    :func:`ivf_pq_topk` (its distributed float means are
    partition-order-sensitive — no SQL twin can replicate them);
    pytest pins this twin's recall against brute force and the
    production composition's own recall contract separately.  Plan
    shape matches production: centroid/codebook/cross literals ->
    codegen assign+encode, broadcast probe join on ``cell``,
    window shortlist, equi-join re-rank.
    """
    query_id_col = query_id_col or id_col
    from .dedup import _int_dot, _qvec

    def _md5key(tag: int) -> F.Column:
        return F.md5(
            F.concat(
                F.col(id_col).cast("string"), F.lit(f":{tag}")
            ).cast("binary")
        )

    cents = (
        corpus.select(
            F.col(id_col), _qvec(vec_col, quantize).alias("qv")
        )
        .orderBy(_md5key(seed))
        .limit(n_cells)
        .collect()
    )
    cent_q = [[int(x) for x in r["qv"]] for r in cents]
    if not cent_q:
        raise ValueError("ivf_pq_topk_portable: empty corpus")
    dim = len(cent_q[0])
    if dim % m:
        raise ValueError(
            f"ivf_pq_topk_portable: dim {dim} not divisible by m={m}"
        )
    dsub = dim // m
    # EVERY big expression below is rendered as a SQL fragment and
    # parsed with one F.expr (r14, the minhash/simhash rewrite's twin
    # — guide §5 driver round trips): the Column-API construction of
    # this function cost ~5800 py4j commands / ~2.3 s of pure driver
    # time per call (cProfile receipt in OPTIMIZATION_r14.md), more
    # than the query's own execution at gate SF.  The SQL forms build
    # the identical expression trees (same implicit casts, same
    # lambda bodies), so results are bit-identical.
    cent_sql = _array_lit_sql(cent_q, "array<array<bigint>>")
    cn2_sql = _array_lit_sql(
        [sum(x * x for x in c) for c in cent_q], "array<bigint>"
    )
    cent_lit = F.expr(cent_sql)

    def _sims_sql(qv: str) -> str:
        vn = f"sqrt(cast({_int_dot_sql(qv, qv)} as double))"
        return (
            f"zip_with({cent_sql}, {cn2_sql}, (c, n2) -> "
            f"{_int_dot_sql('c', qv)}"
            f" / (sqrt(cast(n2 as double)) * {vn}))"
        )

    def _with_cell_resid(df: DataFrame) -> DataFrame:
        # materialize the sims array once (Catalyst does not CSE
        # higher-order-function trees — the ivf_topk_portable rule)
        return (
            df.withColumn("__sims", F.expr(_sims_sql("`cv`")))
            .withColumn(
                "cell",
                F.expr(
                    "cast(array_position(`__sims`, array_max(`__sims`))"
                    " - 1 as int)"
                ),
            )
            .drop("__sims")
            .withColumn(
                "rv",
                F.expr(
                    f"zip_with(`cv`, element_at({cent_sql}, `cell` + 1),"
                    " (x, c) -> x - c)"
                ),
            )
        )

    # codewords: residuals of the cw_seed-sampled rows, cells assigned
    # by the SAME exact-integer argmax expression (no python re-derive)
    cwrows = (
        _with_cell_resid(
            corpus.select(
                F.col(id_col).alias("__cwid"),
                _qvec(vec_col, quantize).alias("cv"),
            )
        )
        .orderBy(
            F.md5(
                F.concat(
                    F.col("__cwid").cast("string"), F.lit(f":{cw_seed}")
                ).cast("binary")
            )
        )
        .limit(ksub)
        .collect()
    )
    cw = [[int(x) for x in r["rv"]] for r in cwrows]
    ksub = len(cw)
    if ksub < 2:
        raise ValueError("ivf_pq_topk_portable: need >= 2 codewords")
    cb_q = [
        [cw[c][j * dsub : (j + 1) * dsub] for c in range(ksub)]
        for j in range(m)
    ]
    n2 = [[sum(x * x for x in c) for c in cb_q[j]] for j in range(m)]
    # query-independent residual-reconstruction constants: int |c|^2
    # per cell and the cell x subspace x codeword cross table
    # dot(c_cell_subj, codeword) — n_cells*m*ksub int64 literals (512
    # at the gate defaults; at 4096x256 production scale this becomes
    # a broadcast-joined table, exactly as ivf_pq_topk documents)
    cross = [
        [
            [
                sum(
                    cent_q[L][j * dsub + p] * cb_q[j][c][p]
                    for p in range(dsub)
                )
                for c in range(ksub)
            ]
            for j in range(m)
        ]
        for L in range(len(cent_q))
    ]
    cross_sql = _array_lit_sql(cross, "array<array<array<bigint>>>")

    def _cb_sql(j: int) -> str:
        return _array_lit_sql(cb_q[j], "array<array<bigint>>")

    def _n2_sql(j: int) -> str:
        return _array_lit_sql(n2[j], "array<bigint>")

    def _enc_sql(v: str) -> str:
        parts = []
        for j in range(m):
            sub = f"slice({v}, {j * dsub + 1}, {dsub})"
            costs = (
                f"zip_with({_cb_sql(j)}, {_n2_sql(j)}, (c, nn) -> "
                f"nn - 2 * {_int_dot_sql('c', sub)})"
            )
            parts.append(
                f"cast(array_position({costs}, array_min({costs}))"
                " - 1 as int)"
            )
        return "array(" + ",".join(parts) + ")"

    c = _with_cell_resid(
        corpus.select(
            F.col(id_col).alias("nbr_id"),
            _qvec(vec_col, quantize).alias("cv"),
        )
    ).select(
        "nbr_id",
        "cell",
        F.expr(_enc_sql("`rv`")).alias("codes"),
        "cv",
        F.expr(
            f"sqrt(cast({_int_dot_sql('`cv`', '`cv`')} as double))"
        ).alias("cn"),
    )

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _qvec(vec_col, quantize).alias("qv"),
    )
    probe_cells = (
        "slice(transform(array_sort("
        f"zip_with({_sims_sql('`qv`')}, sequence(0, {len(cent_q) - 1}), "
        "(s, i) -> named_struct('neg', -s, 'i', i))), "
        f"st -> st.i), 1, {nprobe})"
    )
    lut_sql = "array(" + ",".join(
        f"transform({_cb_sql(j)}, cc -> "
        + _int_dot_sql("cc", f"slice(`qv`, {j * dsub + 1}, {dsub})")
        + ")"
        for j in range(m)
    ) + ")"
    q = (
        q.withColumn(
            "qn",
            F.expr(
                f"sqrt(cast({_int_dot_sql('`qv`', '`qv`')} as double))"
            ),
        )
        .withColumn("lut", F.expr(lut_sql))
        .withColumn("cell", F.expr(f"explode({probe_cells})"))
        .select(
            "query_id",
            "qv",
            "qn",
            "lut",
            F.col("cell").cast("int").alias("cell"),
        )
        .withColumn(
            "qdc",
            F.expr(
                _int_dot_sql(
                    f"element_at({cent_sql}, `cell` + 1)", "`qv`"
                )
            ),
        )
    )
    n2_full_sql = _array_lit_sql(n2, "array<array<bigint>>")

    def _agg_sum(zipped: str) -> str:
        return (
            f"aggregate({zipped}, cast(0 as bigint), "
            "(acc, x) -> acc + x)"
        )

    lut_sum = _agg_sum(
        "zip_with(`codes`, `lut`, (code, lj) -> element_at(lj, code + 1))"
    )
    r_n2 = _agg_sum(
        f"zip_with(`codes`, {n2_full_sql}, "
        "(code, nj) -> element_at(nj, code + 1))"
    )
    cross_sum = _agg_sum(
        f"zip_with(`codes`, element_at({cross_sql}, `cell` + 1), "
        "(code, cj) -> element_at(cj, code + 1))"
    )
    approx_dot = f"(`qdc` + {lut_sum})"
    approx_n2 = (
        f"(element_at({cn2_sql}, `cell` + 1)"
        f" + cast(2 as bigint) * {cross_sum} + {r_n2})"
    )
    scored = (
        c.select("nbr_id", "cell", "codes")
        .join(
            F.broadcast(q.select("query_id", "qn", "lut", "cell", "qdc")),
            "cell",
        )
        .where(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            F.expr(
                f"cast({approx_dot} as double) / (`qn` * "
                f"sqrt(cast(greatest({approx_n2}, cast(1 as bigint))"
                " as double)))"
            ).alias("__a"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("__a"), F.asc("nbr_id")
    )
    short = (
        scored.withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= shortlist)
        .select("query_id", "nbr_id")
    )
    exact = (
        short.join(c.select("nbr_id", "cv", "cn"), "nbr_id")
        .join(
            F.broadcast(
                q.select("query_id", "qv", "qn").dropDuplicates(
                    ["query_id"]
                )
            ),
            "query_id",
        )
        .withColumn(
            "cosine",
            _int_dot(F.col("cv"), F.col("qv"))
            / (F.col("cn") * F.col("qn")),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "nbr_id", "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def save_pq(spark: SparkSession, codebooks: list, path: str) -> None:
    """Persist PQ codebooks (train once, encode/serve every snapshot —
    the artifact posture of ``save_lm``/``save_langid``).  Layout: a
    ``codebooks/`` parquet table in long format ``(j, code, p, x)``
    plus a ``meta/`` JSON table ``(m, ksub, dsub)`` that doubles as
    the commit marker (written LAST; ``load_pq`` requires it) —
    parquet doubles round-trip bit-exactly, so a reloaded codebook
    encodes identically."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    delete_marker_first(spark, path, "meta")
    import posixpath

    rows = [
        (j, c, p, float(codebooks[j][c][p]))
        for j in range(m)
        for c in range(ksub)
        for p in range(dsub)
    ]
    local_df(
        spark, rows, "j int, code int, p int, x double"
    ).write.mode("overwrite").parquet(posixpath.join(path, "codebooks"))
    local_df(
        spark, [(m, ksub, dsub)], "m int, ksub int, dsub int"
    ).coalesce(1).write.mode("overwrite").json(
        posixpath.join(path, "meta")
    )


def load_pq(spark: SparkSession, path: str) -> list:
    """Load a :func:`save_pq` codebook set — hand to
    :func:`pq_topk` / :func:`ivf_pq_topk` / the encode expression."""
    import posixpath

    meta = spark.read.json(posixpath.join(path, "meta")).first()
    m, ksub, dsub = int(meta["m"]), int(meta["ksub"]), int(meta["dsub"])
    vals = {
        (r["j"], r["code"], r["p"]): r["x"]
        for r in spark.read.parquet(
            posixpath.join(path, "codebooks")
        ).collect()
    }
    return [
        [
            [vals[(j, c, p)] for p in range(dsub)]
            for c in range(ksub)
        ]
        for j in range(m)
    ]


def save_ivf(spark: SparkSession, centroids: list, path: str) -> None:
    """Persist IVF coarse centroids (``cell, p, x`` long format plus a
    ``meta/`` commit marker — see :func:`save_pq`)."""
    n_cells = len(centroids)
    dim = len(centroids[0])
    delete_marker_first(spark, path, "meta")
    import posixpath

    rows = [
        (c, p, float(centroids[c][p]))
        for c in range(n_cells)
        for p in range(dim)
    ]
    local_df(
        spark, rows, "cell int, p int, x double"
    ).write.mode("overwrite").parquet(posixpath.join(path, "centroids"))
    local_df(
        spark, [(n_cells, dim)], "n_cells int, dim int"
    ).coalesce(1).write.mode("overwrite").json(
        posixpath.join(path, "meta")
    )


def load_ivf(spark: SparkSession, path: str) -> list:
    """Load a :func:`save_ivf` centroid list — hand to
    :func:`ivf_topk` / :func:`ivf_pq_topk`."""
    import posixpath

    meta = spark.read.json(posixpath.join(path, "meta")).first()
    n_cells, dim = int(meta["n_cells"]), int(meta["dim"])
    vals = {
        (r["cell"], r["p"]): r["x"]
        for r in spark.read.parquet(
            posixpath.join(path, "centroids")
        ).collect()
    }
    return [
        [vals[(c, p)] for p in range(dim)] for c in range(n_cells)
    ]


def project_embeddings(
    df: DataFrame,
    out_dim: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    in_dim: int | None = None,
    seed: int = 42,
    round_places: int = 6,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``out_dim``
    components, as a MAP-ONLY column plan (zero shuffles, zero joins).

    The projection matrix is the same md5-derived Rademacher (±1)
    family the embedding-LSH hyperplanes use
    (:func:`~xyzpy_spark.pipeline.dedup.portable_hyperplanes` — sign =
    high bit of ``md5(f"{seed}:{j}:{d}")``'s first hex digit), so any
    engine can reproduce the exact matrix; ±1 entries preserve
    pairwise distances like the Gaussian version (Achlioptas 2003)
    while keeping every product exact in float.

    Plan shape: each output component is a ``zip_with``/``aggregate``
    fold of the vector against a literal sign array — per-row JVM
    arithmetic, no explode (which would inflate rows ``in_dim``×), no
    matrix join, no exchange anywhere.  At 100 TB the projection
    streams at scan speed and composes with downstream ops without
    adding a stage boundary.  Components are rounded with the portable
    6-decimal canon so float sum order (the fold here vs any oracle's
    SUM) can't leak into comparisons.

    Use it in front of :func:`cosine_topk` / IVF to cut the per-vector
    arithmetic by ``in_dim/out_dim`` when recall at reduced dimension
    is acceptable.
    """
    from .dedup import portable_hyperplanes
    from .text import _round_det

    if in_dim is None:
        row = df.select(F.size(vec_col).alias("n")).first()
        if row is None:
            raise ValueError("project_embeddings: empty input dataframe")
        in_dim = int(row["n"])
    planes = portable_hyperplanes(out_dim, in_dim, seed)
    vec = F.col(vec_col).cast("array<double>")
    comps = []
    for j in range(out_dim):
        signs = F.lit([float(planes[j][d]) for d in range(in_dim)])
        comp = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        comps.append(_round_det(comp, round_places))
    return df.select(id_col, F.array(*comps).alias("projection"))


def quantize_embeddings(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization (int8 by default) —
    4x smaller vectors for memory-bandwidth-bound ANN scans.

    Per vector: ``scale = max(|x_i|)``, ``q_i = floor(x_i / scale *
    (2^(bits-1) - 1))`` — floor, not round, because floor semantics
    are identical across Spark / DuckDB / numpy while half-way
    rounding is not (the same convention as the LSH quantizer
    ``pipeline/dedup._qvec``).  Dequantize as ``q_i * scale / qmax``;
    cosine recall loss at int8 is negligible for unit-norm-ish
    embeddings (pytest pins recall ≥ 0.95 vs float top-k).

    Map-only column arithmetic (``transform``/``array_max``): zero
    shuffles, zero Python, composes with downstream scans without a
    stage boundary.  Zero vectors quantize to all-zero with
    ``q_scale = 0``.  Output: ``(id_col, q_scale, qvec)``.

    The scale is STAGED as its own projection before the quantizing
    ``transform`` (r14, the winnow/langid staged-expression lesson):
    a lambda-referenced computed expression re-evaluates per element,
    so the inlined form re-ran ``array_max(transform(abs))`` — an
    O(dim) pass — for every element, twice via the zero-guard CASE
    (plan-audited: O(dim^2) work per row where one O(dim) pass
    suffices; the staged column is referenced twice by the guard, so
    CollapseProject keeps the seam).
    """
    qmax = float((1 << (int(bits) - 1)) - 1)
    staged = df.select(
        id_col,
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).select(
        id_col,
        "__v",
        F.array_max(F.transform(F.col("__v"), F.abs)).alias("q_scale"),
    )
    safe = F.when(F.col("q_scale") > 0, F.col("q_scale")).otherwise(
        F.lit(1.0)
    )
    return staged.select(
        id_col,
        "q_scale",
        F.transform(
            F.col("__v"),
            lambda x: F.floor(x / safe * F.lit(qmax)).cast("int"),
        ).alias("qvec"),
    )
