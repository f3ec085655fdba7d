import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from xyzpy_spark.session import get_spark
from xyzpy_spark.pipeline.dedup import dedup_against

spark = get_spark(app_name="da_ab")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
ref = docs.where(F.col("doc_id") % 10 == 0)
new = docs.where(F.col("doc_id") % 10 != 0)
docs.limit(100).write.format("noop").mode("overwrite").save()

def run(cache):
    spark.catalog.clearCache()
    t0 = time.monotonic()
    dedup_against(new, ref, method="jaccard", threshold=0.5,
                  max_shingle_freq=None, cache=cache) \
        .select("doc_id", "lang", "source") \
        .write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0

ra = sorted(map(tuple, dedup_against(new, ref, method="jaccard", threshold=0.5, max_shingle_freq=None, cache=False).select("doc_id").collect()))
spark.catalog.clearCache()
rb = sorted(map(tuple, dedup_against(new, ref, method="jaccard", threshold=0.5, max_shingle_freq=None, cache=True).select("doc_id").collect()))
print("identical =", ra == rb, f"({len(ra)} rows)")
times = {"A": [], "B": []}
for i in range(3):
    for kind, c in (("A", False), ("B", True)):
        sec = run(c); times[kind].append(sec)
        print(f"{kind} run {i}: {sec:.2f}s", flush=True)
for kind in ("A", "B"):
    ts = sorted(times[kind])
    print(f"{kind}: median {ts[len(ts)//2]:.2f}s  all " + " ".join(f"{t:.2f}" for t in times[kind]))
