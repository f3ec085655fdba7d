import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from xyzpy_spark.session import get_spark
from xyzpy_spark.pipeline.dedup import strip_duplicate_spans, duplicate_substring_spans
from xyzpy_spark.pipeline.text import tokenize

spark = get_spark(app_name="span_ab")
docs = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text"))
docs.limit(100).write.format("noop").mode("overwrite").save()

def old_spans(df, k=5, min_repeat=2, keep_first=True):
    id_col, text_col = "doc_id", "text"
    toks = df.select(F.col(id_col).alias("__doc"),
                     F.posexplode(tokenize(F.col(text_col))).alias("__pos", "__t"))
    w = Window.partitionBy("__doc").orderBy("__pos")
    parts = [F.col("__t")] + [F.lead("__t", j).over(w).alias(f"__t{j}") for j in range(1, k)]
    last = f"__t{k-1}"
    gram_text = F.concat_ws(" ", "__t", *[f"__t{j}" for j in range(1, k)])
    occ = (toks.select("__doc", "__pos", *parts).where(F.col(last).isNotNull())
           .select("__doc", "__pos", gram_text.alias("__gram")))
    dup = (occ.groupBy("__gram")
           .agg(F.count(F.lit(1)).alias("__n"), F.min(F.struct("__doc", "__pos")).alias("__w"))
           .where(F.col("__n") >= min_repeat).select("__gram", "__w"))
    marked = occ.join(dup, "__gram")
    if keep_first:
        marked = marked.where((F.col("__doc") != F.col("__w.__doc")) | (F.col("__pos") != F.col("__w.__pos")))
    ivals = marked.select("__doc", F.col("__pos").alias("__start"),
                          (F.col("__pos") + F.lit(k-1)).alias("__end")).distinct()
    iw = Window.partitionBy("__doc").orderBy("__start", "__end")
    run_end = F.max("__end").over(iw.rowsBetween(Window.unboundedPreceding, -1))
    islands = ivals.withColumn("__new", F.when(F.col("__start") > F.coalesce(run_end + 1, F.lit(-1)), 1).otherwise(0)) \
                   .withColumn("__island", F.sum("__new").over(iw))
    return (islands.groupBy("__doc", "__island")
            .agg(F.min("__start").alias("span_start"), F.max("__end").alias("span_end"))
            .select(F.col("__doc").alias(id_col), "span_start", "span_end",
                    (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens")))

ra = sorted(map(tuple, old_spans(docs).collect()))
rb = sorted(map(tuple, duplicate_substring_spans(docs, 5).collect()))
print("identical =", ra == rb, f"({len(ra)} rows)")

times = {"A": [], "B": []}
for i in range(3):
    for kind in ("A", "B"):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = old_spans(docs) if kind == "A" else duplicate_substring_spans(docs, 5)
        df.write.format("noop").mode("overwrite").save()
        sec = time.monotonic() - t0
        times[kind].append(sec)
        print(f"{kind} run {i}: {sec:.2f}s", flush=True)
for kind in ("A", "B"):
    ts = sorted(times[kind])
    print(f"{kind}: median {ts[len(ts)//2]:.2f}s  all " + " ".join(f"{t:.2f}" for t in times[kind]))
