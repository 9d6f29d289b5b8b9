"""Experiment: OR-construction LSH operating points.

Measures recall@5 and probed fraction (distinct candidates per query /
(n-1)) for (num_planes, nprobe, tables) grids on the embeddings table.
Run: python tools/exp_lsh_tables.py [sf_dir]
"""
import sys
import time

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
    emb, "vec_id", "embedding", query_filter="vec_id < 20", k=5
).cache()
exact.count()

grid = [
    # (planes, nprobe, tables)
    (8, 5, 1),    # current workload point
    (8, 1, 8),
    (10, 1, 16),
    (10, 4, 8),
    (11, 4, 12),
    (12, 4, 16),
    (12, 8, 12),
    (10, 8, 6),
    (9, 6, 8),
]
for planes, nprobe, tables in grid:
    t0 = time.time()
    approx = similarity.lsh_ann_topk(
        emb, "vec_id", "embedding", k=5, num_planes=planes,
        nprobe=nprobe, tables=tables,
    ).filter(F.col("query_id") < 20)
    rec = similarity.ann_recall(exact, approx)
    r = rec.agg(F.avg("recall")).collect()[0][0]
    # probed fraction: rebuild candidate set for the 20 queries
    cands = None
    for t in range(tables):
        b = similarity.hyperplane_lsh_buckets(
            emb, "vec_id", "embedding", planes, 64, 42 + t
        )
        if nprobe <= 1:
            c = (
                b.filter(F.col("id") < 20).alias("a")
                .join(b.alias("b"), "bucket")
                .filter(F.col("a.id") != F.col("b.id"))
                .select(F.col("a.id").alias("q"), F.col("b.id").alias("c"))
            )
        else:
            pr = similarity.lsh_probe_buckets(
                emb, "vec_id", "embedding", planes, 64, 42 + t, nprobe
            ).filter(F.col("id") < 20)
            c = (
                pr.withColumnRenamed("id", "q")
                .join(b.select(F.col("id").alias("c"), "bucket"), "bucket")
                .filter(F.col("q") != F.col("c"))
                .select("q", "c")
            )
        cands = c if cands is None else cands.unionByName(c)
    frac = (
        cands.distinct().groupBy("q").count()
        .agg(F.avg(F.col("count") / (n - 1))).collect()[0][0]
    )
    dt = time.time() - t0
    print(
        f"planes={planes:3d} nprobe={nprobe} tables={tables:3d} "
        f"recall@5={r:.3f} probed_frac={frac:.4f} ({dt:.1f}s)"
    )
spark.stop()
