"""Experiment: IVF-PQ bench point round 2 — multi-iteration Lloyd
training + wider codebooks, sf0.1. Finds the recommendation point
(recall@5 >= 0.5 at a documented bytes/vector)."""
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
n = emb.count()
print(f"n={n}", flush=True)
exact = similarity.cosine_topk(
    emb, "vec_id", "embedding", query_filter="vec_id < 50", k=5
).cache()
exact.count()

# (m, k, iters)
train_points = [(16, 256, 4), (32, 256, 1), (32, 256, 4), (16, 64, 4)]
for m, k, iters in train_points:
    t0 = time.time()
    cb = similarity.pq_train(
        emb, "vec_id", "embedding", m=m, k=k, iters=iters, engine="numpy"
    )
    t_train = round(time.time() - t0, 1)
    # flat PQ ceiling at these codebooks
    t0 = time.time()
    flat = similarity.pq_adc_topk(
        emb, "vec_id", "embedding", m=m, k=k, codebooks=cb,
        query_filter="vec_id < 50", engine="numpy",
    )
    rf = (
        similarity.ann_recall(exact, flat)
        .agg(F.avg("recall").alias("r")).first()["r"]
    )
    t_flat = round(time.time() - t0, 1)
    # composed IVF-PQ at the half-probed routing
    t0 = time.time()
    ivfpq = similarity.ivf_pq_topk(
        emb, "vec_id", "embedding", nlist=16, nprobe=8, m=m, k=k,
        codebooks=cb, iters=0, query_filter="vec_id < 50",
        engine="numpy",
    )
    ri = (
        similarity.ann_recall(exact, ivfpq)
        .agg(F.avg("recall").alias("r")).first()["r"]
    )
    t_ivf = round(time.time() - t0, 1)
    print(json.dumps({
        "m": m, "k": k, "iters": iters,
        "bytes_per_vec": m * (1 if k <= 256 else 2),
        "recall_flat": round(float(rf), 4),
        "recall_ivfpq_16_8": round(float(ri), 4),
        "train_s": t_train, "flat_s": t_flat, "ivfpq_s": t_ivf,
    }), flush=True)
