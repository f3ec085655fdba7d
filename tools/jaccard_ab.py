import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from xyzpy_spark.session import get_spark
from xyzpy_spark.pipeline.dedup import ngram_jaccard_pairs, _exploded_shingles_fast

spark = get_spark(app_name="jac_ab")
docs = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text"))
docs.limit(100).write.format("noop").mode("overwrite").save()

def old_pairs(df, n=3, threshold=0.5, max_shingle_freq=1000):
    sh = _exploded_shingles_fast(df, "doc_id", "text", n).dropDuplicates(["_id", "shingle"])
    rare = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
            .where(F.col("f") <= max_shingle_freq).select("shingle"))
    sh = sh.join(rare, "shingle", "left_semi").persist()
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("_id").alias("id_a"), "shingle")
    b = sh.select(F.col("_id").alias("id_b"), "shingle")
    common = (a.join(b, "shingle").where(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (common.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard", F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
            .where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard"))

ra = sorted(map(tuple, old_pairs(docs).collect()))
spark.catalog.clearCache()
rb = sorted(map(tuple, ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()))
print("identical =", ra == rb, f"({len(ra)} rows)")

times = {"A": [], "B": []}
for i in range(3):
    for kind in ("A", "B"):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = old_pairs(docs) if kind == "A" else ngram_jaccard_pairs(docs, n=3, threshold=0.5)
        df.write.format("noop").mode("overwrite").save()
        sec = time.monotonic() - t0
        times[kind].append(sec)
        print(f"{kind} run {i}: {sec:.2f}s", flush=True)
for kind in ("A", "B"):
    ts = sorted(times[kind])
    print(f"{kind}: median {ts[len(ts)//2]:.2f}s  all " + " ".join(f"{t:.2f}" for t in times[kind]))
