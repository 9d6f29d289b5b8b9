"""Experiment: IVF-PQ bench operating point (r15).

recall@5 + timings of ivf_pq_topk at FAISS-convention codebooks
(m=16, k=256 -> 16 B/vector) across coarse-routing points, sf0.1.
Run: python tools/exp_ivfpq_point.py [sf_dir] [m:k ...]
"""
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
# warm the python worker pool (bench gotcha)
spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
n = emb.count()
print(f"n={n}", flush=True)
exact = similarity.cosine_topk(
    emb, "vec_id", "embedding", query_filter="vec_id < 50", k=5
).cache()
exact.count()

m, k = 16, 256
t0 = time.time()
cb = similarity.pq_train(emb, "vec_id", "embedding", m=m, k=k)
print(f"pq_train({m},{k}): {time.time()-t0:.1f}s", flush=True)

for nlist, nprobe in [(16, 4), (16, 6), (16, 8), (8, 4)]:
    t0 = time.time()
    approx = similarity.ivf_pq_topk(
        emb, "vec_id", "embedding", nlist=nlist, nprobe=nprobe,
        m=m, k=k, codebooks=cb, iters=0, query_filter="vec_id < 50",
    )
    r = (
        similarity.ann_recall(exact, approx)
        .agg(F.avg("recall").alias("r"))
        .first()["r"]
    )
    print(json.dumps({
        "m": m, "k": k, "nlist": nlist, "nprobe": nprobe,
        "probe_frac": round(nprobe / nlist, 3),
        "recall_at_5": round(float(r), 4),
        "sec": round(time.time() - t0, 1),
    }), flush=True)

# flat PQ reference at the same codebooks
t0 = time.time()
flat = similarity.pq_adc_topk(
    emb, "vec_id", "embedding", m=m, k=k, codebooks=cb,
    query_filter="vec_id < 50",
)
r = (
    similarity.ann_recall(exact, flat)
    .agg(F.avg("recall").alias("r")).first()["r"]
)
print(json.dumps({
    "m": m, "k": k, "flat": True,
    "recall_at_5": round(float(r), 4), "sec": round(time.time()-t0, 1),
}), flush=True)
