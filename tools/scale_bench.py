#!/usr/bin/env python
"""Scale-proof bench: run the heaviest queries at 1x and Nx data.

SCALING.md makes linear-scaling claims for the heavy operators (banded
dedup, salted join, windowed agg).  This tool validates them
empirically on one box: it deterministically inflates the sf0.1
testdata by ``--mult`` (default 10x, i.e. roughly sf1 for the tables
the heavy queries touch), runs each heavy query once at 1x and once at
Nx IN THE SAME SESSION (paired samples -- shared-box load hits both
sides alike), and prints per-query wall ratios.  A banded/bucketed op
scaling near-linearly should show ratio ~mult or less (sub-linear for
latency-bound ops like iterative clustering); a quadratic blow-up
shows up as ratio >> mult.

Replica perturbation is chosen so workload DENSITY stays constant:

- documents: every 3rd token of each replica is tagged with the
  replica id, so a replica is NOT a near-dup of its source (3-gram
  shingle survival ~(2/3)^3; Jaccard ~0.12, below every contract
  threshold) while each replica internally keeps the same dup-pair
  density.  Pairs therefore scale ~mult, not mult^2 -- matching how a
  real corpus grows (new content, same dup rate).
- embeddings: per-replica deterministic sinusoidal jitter (amplitude
  0.35) decorrelates replicas below the 0.4 cosine contract threshold
  while keeping within-replica neighborhoods.
- events/customer: ids re-keyed per replica (disjoint user spaces,
  same hot-tail shape per replica), timestamps shifted by replica
  weeks (hourly bucket count scales ~mult).

Writes scratch data under --out (default: a /tmp tempdir, removed on
exit unless --keep).  Usage:

    python tools/scale_bench.py [--mult 10] [--runs 1] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from xyzpy_spark.session import get_spark

# the 8 heaviest / most scale-sensitive queries (r2 verdict item 5):
# every banded-dedup path, the iterative clusterer, the salted join,
# the windowed agg, and the incremental-ingest probe.
HEAVY = [
    "dedup_substrings",
    "strip_substrings",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_clusters",
    "skew_salted_revenue",
    "window_hourly",
    "lm_nll",
    "bloom_contamination",
    "dedup_incremental",
    # round-4 additions (r3 verdict item 8): the curation funnel, both
    # containment/attribution shuffles, and the tokenized-export encode
    "curate_corpus",
    "dedup_containment",
    "contamination_pairs",
    "tokenized_sequences",
    # late round-4 additions: the model-fit scoring pass and the
    # cross-corpus inverted-index join
    "dsir_weights",
    "dedup_against",
    # round-5 additions (r4 verdict item 6): the remaining round-4
    # families — Arrow-batched JPEG decode, the streaming gate stack,
    # map-only chunking, the mixture/coverage aggregations
    # (vocab_coverage post counts-of-counts rewrite: this row is the
    # empirical proof the unpartitioned-window fix holds at 10x)
    "multimodal_jpeg",
    "stream_curate",
    "chunk_documents",
    "mixture_weights",
    "vocab_coverage",
    # round-5 additions: the relational shapes (now that build_scaled
    # replicates the TPC-H tables with consistent foreign keys), the
    # IR trio, and the stateful streaming operator
    "shipping_priority",
    "local_supplier_volume",
    "small_quantity_revenue",
    "returned_item_losses",
    "promo_revenue_share",
    "supplier_part_variety",
    "shipmode_priority",
    "discounted_revenue",
    "pmi_collocations",
    "tfidf_top_terms",
    "bm25_search",
    "stream_stateful_stats",
    # round-6 additions: the winnowed inverted-index join (the whole
    # point is its index-size cut — the scale row proves the capped
    # equi-join stays linear), both partsupp-bridge relational shapes,
    # and the PQ compressed scan + re-rank
    "winnow_fingerprints",
    "cdc_chunks",
    "winnow_dedup_pairs",
    "important_stock",
    "min_cost_supplier",
    "similarity_pq",
    "nation_trade_volume",
    "product_profit",
    "langid_rowwise",
    "excess_stock_suppliers",
    "video_frames",
    # round-7 additions: the winnowed INCREMENTAL probe.  NOTE on what
    # this row measures: build_scaled keeps doc_id % 10 residues, so
    # the doc_id%10==0 probe BATCH grows Nx along with the index —
    # the ratio bounds the whole per-ingest pass (Nx batch
    # fingerprinting + Nx index scan), it does NOT isolate
    # fixed-batch-vs-Nx-index flatness (r7 code-review).  The
    # fixed-probe flatness property is the dedup_incremental
    # baseline-note protocol (probe wall flat from sf0.01 to sf0.1).
    "winnow_against",
    # round-7 semi/anti relational shapes: the scale claim is that the
    # EXISTS/NOT-EXISTS rewrites stay hash semi/anti joins (linear),
    # never per-row correlated probes
    "order_priority_check",
    "customer_distribution",
    "large_volume_customers",
    "waiting_suppliers",
    "idle_customers",
    # late round-7 additions: index-and-serve seams (the claim is the
    # serve side scales with the index scan, not with candidate
    # blow-up), the Q6/Q8/Q15 aggregate shapes, and the
    # event-analytics pair
    "stream_ann_topk",
    "bm25_index_search",
    "forecast_revenue_change",
    "top_supplier",
    "market_share",
    "funnel_steps",
    "cohort_retention",
    "source_caps",
    # round-8 additions: the stream-served LM scorer (claim: streaming
    # fixed cost + linear score scan), the packed-literal 28-language
    # scorer (claim: pure map-only linear scan — the blobs are plan
    # constants), and the sequential funnel (claim: ONE user-keyed
    # collect+fold shuffle, linear in events)
    "lm_stream_score",
    "langid_rowwise_packed",
    "funnel_sequential",
    # late round-8: the sketch family (claim: the HLL shuffle carries
    # <= 2^p rows per group at ANY input size — the data-flat property
    # in person) and weighted sampling (map-only priorities, one
    # top-k shuffle)
    "hll_distinct",
    "weighted_sample",
    # round-9 additions: the portable residual IVF-PQ (claim: the
    # assign+encode pass is map-only linear; the probe join is
    # broadcast + cell-pruned), the two continuous-ingest stream
    # gates (claim: streaming fixed cost + one linear probe pass —
    # like winnow_against, the %10==0 probe batch grows Nx with the
    # corpus, so the ratio bounds the WHOLE per-ingest pass), and the
    # streaming quota gate (claim: map-only rank + group-sized state)
    "similarity_ivf_pq",
    "stream_dedup_index",
    "stream_winnow_index",
    "stream_caps",
    # round-10 additions: the drift-monitoring family (claim: the
    # corpus text is scanned once per side into vocab-bounded count
    # tables — wall grows with the scan, everything downstream is
    # vocab-sized; the streaming twin adds the per-epoch engine fixed
    # cost plus the same linear count pass)
    "corpus_drift",
    "stream_drift",
    "value_drift",
    # round-11 addition: the one-scan multi-column monitor (claim:
    # k monitored columns ride the single scan per side, so the wall
    # ratio tracks the scan — ~the value_drift ratio — not k scans)
    "value_drift_multi",
]

REP = "_rep"


def scale_cfg_embedding_lsh(spark, sf_dir: str):
    """Scale-sized embedding LSH: the contract query's config
    (n_bits=64/bands=16 -> 4 bits/band = 16 buckets) is chosen for the
    bit-exact DuckDB oracle at sf0.01 and is deliberately below the
    op's design point; at 10x data its bucket join measured 26x (see
    BASELINE.md scale table).  This is the configuration a 100-TB
    deployment would run: bits/band sized for the corpus (8 bits ->
    256 buckets/band) plus the max_bucket_size guard that bounds
    candidate work linearly regardless of mass regions."""
    from xyzpy_spark.pipeline.dedup import embedding_lsh_pairs

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_lsh_pairs(
        emb, threshold=0.8, n_bits=128, bands=16, max_bucket_size=128
    )


def scale_cfg_value_drift(spark, sf_dir: str):
    """Scale-sized numeric drift: the gate row splits on a FIXED
    calendar instant, but build_scaled shifts replica timestamps by
    replica weeks — the pre-split side would stay 1x while the
    post-split side grows, measuring an asymmetric artifact instead
    of data scaling.  Split on event_type instead (every replica
    carries every type), so BOTH count aggregations grow ~mult and
    the ratio bounds the real linear work: two scans into 64-bin
    count tables; everything downstream is O(n_bins).  NULL-typed
    events route to side b (coalesced predicate) — a plain ~isin
    evaluates to NULL and would silently drop them from BOTH sides,
    under-measuring the scan."""
    from xyzpy_spark.pipeline.drift import numeric_divergence

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    is_ab = F.col("event_type").isin("view", "click")
    return numeric_divergence(
        ev.where(F.coalesce(is_ab, F.lit(False))),
        ev.where(F.coalesce(~is_ab, F.lit(True))),
        "value",
        lo=0.0,
        hi=512.0,
        n_bins=64,
        top_k=64,
    )


def scale_cfg_value_drift_multi(spark, sf_dir: str):
    """Scale-sized multi-column drift (same event_type split rationale
    as scale_cfg_value_drift): the claim under test is that BOTH
    monitored columns ride the single scan per side, so the wall
    ratio tracks the scan, not 2x the scan."""
    from xyzpy_spark.pipeline.drift import numeric_divergence_multi

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    is_ab = F.col("event_type").isin("view", "click")
    return numeric_divergence_multi(
        ev.where(F.coalesce(is_ab, F.lit(False))),
        ev.where(F.coalesce(~is_ab, F.lit(True))),
        {"value": (0.0, 512.0), "user_id": (0.0, 256.0)},
        n_bins=64,
        top_k=64,
    )


def _replicate(df, mult: int, key_bump: dict):
    """Cross each row with replica ids 0..mult-1 and re-key id columns
    into disjoint per-replica ranges (rep 0 keeps original values)."""
    out = df.withColumn(
        REP, F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
    )
    for col, stride in key_bump.items():
        out = out.withColumn(
            col, F.col(col) + F.col(REP).cast("long") * F.lit(stride)
        )
    return out


def build_scaled(spark, src: str, out: str, mult: int) -> None:
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    docs = _replicate(docs, mult, {"doc_id": 1_000_000_000})
    # tag every 3rd word with the replica id: replicas are no longer
    # near-dups of each other (see module docstring), rep 0 unchanged
    perturbed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w, i: F.when(
                (F.col(REP) > 0) & (i % 3 == 0),
                F.concat(w, F.lit("_"), F.col(REP).cast("string")),
            ).otherwise(w),
        ),
        " ",
    )
    docs = (
        docs.withColumn("text", perturbed)
        .withColumn("n_chars", F.length("text"))
        .drop(REP)
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    emb = _replicate(emb, mult, {"vec_id": 1_000_000_000})
    jitter = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(F.col(REP) > 0, x
            + F.lit(0.35)
            * F.sin(
                (F.col("vec_id") % 997).cast("double") * F.lit(13.0)
                + i.cast("double") * F.lit(7.0)
                + F.col(REP).cast("double") * F.lit(37.0)
            )
        ).otherwise(x).cast("float"),
    )
    emb = emb.withColumn("embedding", jitter).drop(REP)
    emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    ev = _replicate(
        ev, mult, {"event_id": 1_000_000_000, "user_id": 10_000_000}
    )
    ev = ev.withColumn(
        "ts",
        F.col("ts")
        + F.make_dt_interval(days=F.col(REP).cast("int") * F.lit(7)),
    ).drop(REP)
    ev.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )

    cust = spark.read.parquet(os.path.join(src, "customer.parquet"))
    cust = _replicate(cust, mult, {"c_custkey": 10_000_000}).drop(REP)
    cust.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "customer.parquet")
    )

    # TPC-H fact/dim tables for the relational queries: replicas get
    # disjoint key spaces with CONSISTENT foreign keys (an order's
    # replica joins its customer's replica, a lineitem's its part's
    # and supplier's), so join fan-out and group counts scale ~mult
    # while per-key densities stay constant.  Dates/attributes are
    # untouched — filters select the same fraction of every replica.
    orders = spark.read.parquet(os.path.join(src, "orders.parquet"))
    orders = _replicate(
        orders, mult,
        {"o_orderkey": 1_000_000_000, "o_custkey": 10_000_000},
    ).drop(REP)
    orders.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )

    li = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    li = _replicate(
        li, mult,
        {
            "l_orderkey": 1_000_000_000,
            "l_partkey": 10_000_000,
            "l_suppkey": 1_000_000,
        },
    ).drop(REP)
    li.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )

    part = spark.read.parquet(os.path.join(src, "part.parquet"))
    part = _replicate(part, mult, {"p_partkey": 10_000_000}).drop(REP)
    part.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "part.parquet")
    )

    supp = spark.read.parquet(os.path.join(src, "supplier.parquet"))
    supp = _replicate(supp, mult, {"s_suppkey": 1_000_000}).drop(REP)
    supp.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "supplier.parquet")
    )

    # constant-size dims copy through unchanged (replica keys point at
    # the same 25 nations / 5 regions)
    for dim in ("nation", "region"):
        spark.read.parquet(os.path.join(src, f"{dim}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{dim}.parquet"))


def _time_query(spark, fn, sf_dir: str, runs: int) -> float:
    samples = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the HEAVY list to run",
    )
    args = ap.parse_args()
    heavy = HEAVY
    if args.queries:
        want = [q.strip() for q in args.queries.split(",") if q.strip()]
        unknown = sorted(set(want) - set(HEAVY))
        if unknown:
            ap.error(f"not in HEAVY list: {unknown}")
        heavy = want

    out = args.out or tempfile.mkdtemp(prefix="xyzpy_scale_")
    spark = get_spark(app_name="xyzpy_spark_scale_bench")
    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None

    t0 = time.time()
    # the 1x side is REBUILT through the same writer (mult=1 is a
    # byte-identical replica-0 pass) so both sides share file layout:
    # the driver's sf0.1 tables are single-row-group files that Spark
    # scans as ONE partition, while the scaled side gets 32 files —
    # without this, map-heavy queries (Arrow codecs, streaming gates)
    # measure a 1-thread-vs-32-thread artifact instead of data scaling
    # (r5: multimodal_jpeg "ratio 0.58" under the old protocol).
    one_x = os.path.join(out, "_1x")
    n_x = os.path.join(out, f"_{args.mult}x")
    build_scaled(spark, args.src, one_x, 1)
    build_scaled(spark, args.src, n_x, args.mult)
    gen_s = round(time.time() - t0, 2)

    queries = dict(entrymod.queries())
    # pre-stage the incremental index per side so both sides time the
    # production probe (same protocol as bench.py)
    probes = {}
    if "dedup_incremental" in heavy:
        for side, sf_dir in (("1x", one_x), (f"{args.mult}x", n_x)):
            idx = os.path.join(out, f"_idx_{side}")
            entrymod.prestage_dedup_incremental(spark, sf_dir, idx)
            probes[side] = entrymod.make_dedup_incremental_probe(idx)
    wprobes = {}
    if "winnow_against" in heavy:
        for side, sf_dir in (("1x", one_x), (f"{args.mult}x", n_x)):
            idx = os.path.join(out, f"_widx_{side}")
            entrymod.prestage_winnow_against(spark, sf_dir, idx)
            wprobes[side] = entrymod.make_winnow_against_probe(idx)

    # warm-up (bench.py protocol): one JVM/reader query + one Arrow/UDF
    # query so the first timed sample doesn't pay JIT/codegen warm-up
    for wname in ("window_hourly", "dedup_minhash_lsh"):
        queries[wname](spark, args.src).write.format("noop").mode(
            "overwrite"
        ).save()

    queries["dedup_embedding_lsh"] = scale_cfg_embedding_lsh
    queries["value_drift"] = scale_cfg_value_drift
    queries["value_drift_multi"] = scale_cfg_value_drift_multi

    result = {}
    for name in heavy:
        base_fn = queries[name]
        row = {}
        for side, sf_dir in (("1x", one_x), (f"{args.mult}x", n_x)):
            if name == "dedup_incremental":
                fn = probes[side]
            elif name == "winnow_against":
                fn = wprobes[side]
            else:
                fn = base_fn
            row[side] = _time_query(spark, fn, sf_dir, args.runs)
        row["ratio"] = round(row[f"{args.mult}x"] / row["1x"], 2)
        result[name] = row
        print(f"# {name}: {row}", file=sys.stderr)

    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    print(
        json.dumps(
            {
                "metric": "scale_proof_paired_wall",
                "mult": args.mult,
                "runs": args.runs,
                "gen_sec": gen_s,
                "queries": result,
                "load_avg_start": load0,
                "load_avg_end": load1,
            }
        )
    )
    if not args.keep:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
