"""Experiment: residual vs raw IVF-PQ encoding at the shipped bench
point (m=16, k=256, iters=4, nlist=16/nprobe=8), sf0.1."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from odibi_spark.llm import similarity

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
print(f"n={emb.count()}", flush=True)
exact = similarity.cosine_topk(
    emb, "vec_id", "embedding", query_filter="vec_id < 50", k=5
).cache()
exact.count()

for residual in (False, True):
    for m, k in ((16, 256), (32, 256)):
        t0 = time.time()
        cb = None
        approx = similarity.ivf_pq_topk(
            emb, "vec_id", "embedding", nlist=16, nprobe=8, m=m, k=k,
            iters=0, query_filter="vec_id < 50", engine="numpy",
            residual=residual, pq_iters=4,
        )
        # codebooks trained inside at iters default 1... train
        # multi-step externally for the non-residual case only (the
        # residual case trains on the residual frame internally)
        r = (
            similarity.ann_recall(exact, approx)
            .agg(F.avg("recall").alias("r")).first()["r"]
        )
        print(json.dumps({
            "residual": residual, "m": m, "k": k,
            "recall_at_5": round(float(r), 4),
            "sec": round(time.time() - t0, 1),
        }), flush=True)
