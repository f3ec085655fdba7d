import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from xyzpy_spark.session import get_spark
from xyzpy_spark.pipeline.text import add_repetition, tokenize, _safe_frac, _dup_line_frac

spark = get_spark(app_name="rep_ab")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
docs.limit(100).write.format("noop").mode("overwrite").save()

def old_rep(df, text_col="text", id_col="doc_id"):
    text = F.col(text_col)
    toks = tokenize(text)
    n_tok = F.size(toks)
    n_dist = F.size(F.array_distinct(toks))
    base = (df.withColumn("n_tokens", n_tok)
            .withColumn("dup_token_frac", _safe_frac(n_tok - n_dist, n_tok))
            .withColumn("dup_line_frac", _dup_line_frac(text)))
    tok_rows = df.select(F.col(id_col),
                         F.posexplode(tokenize(F.col(text_col))).alias("__pos", "__t"))
    top_tok = (tok_rows.groupBy(id_col, "__t").count()
               .groupBy(id_col).agg(F.max("count").alias("__top_tok")))
    w = Window.partitionBy(id_col).orderBy("__pos")
    top_bg = (tok_rows.withColumn("__nxt", F.lead("__t").over(w))
              .where(F.col("__nxt").isNotNull())
              .select(id_col, F.concat_ws(" ", "__t", "__nxt").alias("__b"))
              .groupBy(id_col, "__b").count()
              .groupBy(id_col).agg(F.max("count").alias("__top_bg")))
    return (base.join(top_tok, id_col, "left").join(top_bg, id_col, "left")
            .withColumn("top_token_frac", _safe_frac(F.col("__top_tok"), F.col("n_tokens")))
            .withColumn("top_bigram_frac",
                        F.when(F.col("n_tokens") >= 2,
                               _safe_frac(F.col("__top_bg"), F.col("n_tokens") - 1)))
            .drop("__top_tok", "__top_bg"))

cols = ["doc_id", "n_tokens", "dup_token_frac", "top_token_frac", "top_bigram_frac", "dup_line_frac"]
ra = sorted(map(tuple, old_rep(docs).select(*cols).collect()))
rb = sorted(map(tuple, add_repetition(docs).select(*cols).collect()))
print("identical =", ra == rb, f"({len(ra)} rows)")
times = {"A": [], "B": []}
for i in range(3):
    for kind in ("A", "B"):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = old_rep(docs) if kind == "A" else add_repetition(docs)
        df.select(*cols).write.format("noop").mode("overwrite").save()
        sec = time.monotonic() - t0
        times[kind].append(sec)
        print(f"{kind} run {i}: {sec:.2f}s", flush=True)
for kind in ("A", "B"):
    ts = sorted(times[kind])
    print(f"{kind}: median {ts[len(ts)//2]:.2f}s  all " + " ".join(f"{t:.2f}" for t in times[kind]))
