import os, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from xyzpy_spark.session import get_spark
from xyzpy_spark.pipeline.dedup import (
    band_dedup_index, build_dedup_index, save_dedup_index,
)

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="prestage_ab")
docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text"))
corpus = docs.where(F.col("doc_id") % 10 != 0)
corpus.limit(100).write.format("noop").mode("overwrite").save()

def run_a(tmp):  # current prestage: flat_main write + read-back
    index = build_dedup_index(corpus, n=2, hash_fn="md5")
    index.write.mode("overwrite").parquet(tmp + "/flat_main")
    saved = spark.read.parquet(tmp + "/flat_main")
    save_dedup_index(saved, band_dedup_index(saved, n=2, hash_fn="md5"), tmp)

def run_b(tmp):  # localCheckpoint wiring
    index = build_dedup_index(corpus, n=2, hash_fn="md5").localCheckpoint(eager=True)
    save_dedup_index(index, band_dedup_index(index, n=2, hash_fn="md5"), tmp)

# parity: final saved layouts identical
pa, pb = tempfile.mkdtemp(), tempfile.mkdtemp()
run_a(pa); run_b(pb)
for sub in ("main", "bands"):
    ra = sorted(map(tuple, spark.read.parquet(f"{pa}/{sub}").collect()))
    rb = sorted(map(tuple, spark.read.parquet(f"{pb}/{sub}").collect()))
    print(sub, "identical =", ra == rb, f"({len(ra)} rows)")
shutil.rmtree(pa); shutil.rmtree(pb)

times = {"A": [], "B": []}
for i in range(3):
    for kind, fn in (("A", run_a), ("B", run_b)):
        spark.catalog.clearCache()
        tmp = tempfile.mkdtemp()
        t0 = time.monotonic()
        fn(tmp)
        sec = time.monotonic() - t0
        times[kind].append(sec)
        shutil.rmtree(tmp, ignore_errors=True)
        print(f"{kind} run {i}: {sec:.2f}s", flush=True)
for kind in ("A", "B"):
    ts = sorted(times[kind])
    print(f"{kind}: median {ts[len(ts)//2]:.2f}s  all " + " ".join(f"{t:.2f}" for t in times[kind]))
