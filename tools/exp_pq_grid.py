"""Experiment: PQ (m, k) operating points (VERDICT r14 task 1).

Measures recall@5 of pq_adc_topk against exact cosine top-5 for a grid
of (subspaces m, codewords-per-subspace k) on the embeddings table,
plus the compression each point buys (code bytes/vector at the FAISS
convention: 1 byte/code for k<=256, vs dim*4 raw float32).

The corpus is unit-normalized (checked: |v| = 1 +- 1e-7), so the L2
ranking PQ-ADC approximates IS the cosine ranking — recall measures
quantization resolution alone.

Run: python tools/exp_pq_grid.py [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from odibi_spark.llm import similarity

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
n = emb.count()
print(f"n={n}")
exact = similarity.cosine_topk(
    emb, "vec_id", "embedding", query_filter="vec_id < 50", k=5
).cache()
exact.count()

grid = [
    # (m, k): m subspaces of 64/m dims, k codewords each.
    # Points are orderable via argv[2:] as "m:k" to split long runs.
    (8, 16),    # r14 shipped point: 8 codes/vec, recall 0.116
    (8, 64),
    (16, 16),
    (16, 64),
    (8, 256),
    (16, 256),
]
if len(sys.argv) > 2:
    grid = [tuple(map(int, a.split(":"))) for a in sys.argv[2:]]

results = []
for m, k in grid:
    if k > n:
        print(f"skip m={m} k={k}: k > n")
        continue
    t0 = time.time()
    cb = similarity.pq_train(emb, "vec_id", "embedding", m=m, k=k)
    t_train = time.time() - t0
    t0 = time.time()
    approx = similarity.pq_adc_topk(
        emb, "vec_id", "embedding", m=m, k=k, topk=5,
        query_filter="vec_id < 50", codebooks=cb,
    )
    r = (
        similarity.ann_recall(exact, approx)
        .agg(F.avg("recall").alias("r"))
        .first()["r"]
    )
    t_probe = time.time() - t0
    bytes_vec = m * (1 if k <= 256 else 2)
    row = {
        "m": m, "k": k, "recall_at_5": round(float(r), 4),
        "code_bytes_per_vec": bytes_vec,
        "compression_x": round(64 * 4 / bytes_vec, 1),
        "train_s": round(t_train, 1), "probe_s": round(t_probe, 1),
    }
    results.append(row)
    print(json.dumps(row))

print("\n# summary (sorted by recall)")
for row in sorted(results, key=lambda r: -r["recall_at_5"]):
    print(json.dumps(row))
