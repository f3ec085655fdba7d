import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from pyspark.sql import functions as F
from xyzpy_spark.session import get_spark
from xyzpy_spark.pipeline.dedup import (
    embedding_lsh_pairs_portable, portable_hyperplanes, _cap_buckets)

spark = get_spark(app_name="lsh_ab2")
emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
emb.limit(50).write.format("noop").mode("overwrite").save()

def old_portable(df, threshold=0.4, n_bits=64, bands=16, seed=42,
                 quantize=1 << 20, id_col="vec_id", vec_col="embedding"):
    import pandas as pd
    r = n_bits // bands
    dim = df.select(F.size(vec_col).alias("d")).first()["d"]
    hyper = np.array(portable_hyperplanes(n_bits, dim, seed), dtype="int64")
    weights = 1 << np.arange(r, dtype="int64")
    qz, thr = float(quantize), float(threshold)
    def _quant(col):
        x = np.array(col.tolist(), dtype="float64")
        return np.floor(x * qz).astype("int64")
    def buckets_part(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            qx = _quant(pdf[vec_col])
            bits = (qx @ hyper.T) > 0
            out = []
            for b in range(bands):
                bucket = bits[:, b * r:(b + 1) * r].astype("int64") @ weights
                out.append(pd.DataFrame({"id": pdf[id_col].to_numpy(),
                                         "band": np.full(len(pdf), b, dtype="int32"),
                                         "bucket": bucket}))
            yield pd.concat(out, ignore_index=True)
    buckets = df.select(id_col, vec_col).mapInPandas(
        buckets_part, "id long, band int, bucket long")   # NO persist
    cand = (buckets.select("band", "bucket", F.col("id").alias("id_a"))
            .join(buckets.select("band", "bucket", F.col("id").alias("id_b")),
                  ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct())
    v = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec"))
    joined = (cand.join(v.withColumnRenamed("_vid", "id_a"), "id_a")
              .withColumnRenamed("_vec", "va")
              .join(v.withColumnRenamed("_vid", "id_b"), "id_b")
              .withColumnRenamed("_vec", "vb"))
    def refine(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            qa, qb = _quant(pdf.va), _quant(pdf.vb)
            dot = (qa * qb).sum(axis=1)
            na2 = (qa * qa).sum(axis=1).astype("float64")
            nb2 = (qb * qb).sum(axis=1).astype("float64")
            cos = dot.astype("float64") / (np.sqrt(na2) * np.sqrt(nb2))
            keep = cos >= thr
            yield pd.DataFrame({"id_a": pdf.id_a.to_numpy()[keep],
                                "id_b": pdf.id_b.to_numpy()[keep],
                                "cosine": cos[keep]})
    return joined.mapInPandas(refine, "id_a long, id_b long, cosine double")

ra = sorted(map(tuple, old_portable(emb).collect()))
spark.catalog.clearCache()
rb = sorted(map(tuple, embedding_lsh_pairs_portable(emb, threshold=0.4, bands=16).collect()))
print("identical =", ra == rb, f"({len(ra)} vs {len(rb)} rows)")
times = {"A": [], "B": []}
for i in range(3):
    for kind in ("A", "B"):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = old_portable(emb) if kind == "A" else embedding_lsh_pairs_portable(emb, threshold=0.4, bands=16)
        df.write.format("noop").mode("overwrite").save()
        sec = time.monotonic() - t0
        times[kind].append(sec)
        print(f"{kind} run {i}: {sec:.2f}s", flush=True)
for kind in ("A", "B"):
    ts = sorted(times[kind])
    print(f"{kind}: median {ts[len(ts)//2]:.2f}s  all " + " ".join(f"{t:.2f}" for t in times[kind]))
