import sys, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from xyzpy_spark.session import get_spark
from xyzpy_spark.pipeline.dedup import (
    build_winnow_index, save_winnow_index, _save_bucket_partitioned)

spark = get_spark(app_name="wsave_ab")
docs = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text").repartition(32))
corpus = docs.where(F.col("doc_id") % 10 != 0)
corpus.limit(100).write.format("noop").mode("overwrite").save()

def seq_save(index, dropped, path, fp_buckets=32):
    stamped = index.withColumn(
        "fp_bucket", F.pmod(F.col("fingerprint"), F.lit(int(fp_buckets)))
    ).withColumn("fp_buckets", F.lit(int(fp_buckets)))
    _save_bucket_partitioned(stamped, path + "/main", "fp_bucket")
    dropped.write.mode("overwrite").parquet(path + "/dropped")

def run(kind):
    spark.catalog.clearCache()
    tmp = tempfile.mkdtemp()
    t0 = time.monotonic()
    index, dropped = build_winnow_index(corpus, k=6, w=5, max_fp_freq=50, hash_fn="md5")
    if kind == "A":
        seq_save(index, dropped, tmp + "/w", fp_buckets=32)
    else:
        save_winnow_index(index, dropped, tmp + "/w", fp_buckets=32)
    sec = time.monotonic() - t0
    ra = sorted(map(tuple, spark.read.parquet(tmp + "/w/main").collect()))
    rd = sorted(map(tuple, spark.read.parquet(tmp + "/w/dropped").collect()))
    shutil.rmtree(tmp, ignore_errors=True)
    return sec, (len(ra), len(rd), hash(tuple(ra)), hash(tuple(rd)))

sa, ha = run("A")
sb, hb = run("B")
print("identical =", ha == hb, ha[:2])
times = {"A": [], "B": []}
for i in range(3):
    for kind in ("A", "B"):
        sec, _ = run(kind)
        times[kind].append(sec)
        print(f"{kind} run {i}: {sec:.2f}s", flush=True)
for kind in ("A", "B"):
    ts = sorted(times[kind])
    print(f"{kind}: median {ts[len(ts)//2]:.2f}s  all " + " ".join(f"{t:.2f}" for t in times[kind]))
