"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline; the query side is tiny and
  broadcast, so the corpus is scanned once with no shuffle of the big
  side — at 100 TB this is the map-side-only pattern you want.
- random-hyperplane LSH buckets: sub-linear scale path; candidates
  share a bucket signature, then exact cosine re-ranks candidates.

Dot products run via ``zip_with`` + ``aggregate`` (codegen'd,
Arrow-free). Double accumulation left-to-right — deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(col: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int] | None = None,
    query_filter: str | None = None,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query rows against the corpus.

    Cosine is rounded before ranking so rank order is stable across
    engines/accumulation orders; ties break on neighbour id.
    """
    from pyspark.sql.window import Window

    corpus = df.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"))
    q = df
    if query_filter:
        q = q.filter(query_filter)
    if query_ids is not None:
        q = q.filter(F.col(id_col).isin(query_ids))
    queries = q.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))

    joined = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col("nbr_id") != F.col("query_id")
    )
    scored = joined.withColumn(
        "cosine",
        F.round(_dot("q_vec", "nbr_vec") / (_norm("q_vec") * _norm("nbr_vec")), round_digits),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane (SRP) LSH: bucket = sign bits of dot(v, plane).

    Planes are generated driver-side with a seeded RNG (tiny: planes ×
    dim floats) and inlined as literals — no broadcast variable needed,
    identical across executors.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    sel = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    bucket: Column = F.lit(0).cast("long")
    for i in range(num_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        d = F.aggregate(
            F.zip_with(F.col("vec"), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sel.withColumn("bucket", bucket)


def lsh_ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN: candidates share an SRP bucket; exact cosine
    re-ranks within the bucket. All-pairs work is confined to buckets
    (expected n/2^planes per bucket)."""
    from pyspark.sql.window import Window

    b = hyperplane_lsh_buckets(df, id_col, vec_col, num_planes, dim, seed)
    pairs = (
        b.alias("a")
        .join(b.alias("b"), "bucket")
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("query_id"),
            F.col("b.id").alias("nbr_id"),
            F.col("a.vec").alias("q_vec"),
            F.col("b.vec").alias("nbr_vec"),
        )
    )
    scored = pairs.withColumn(
        "cosine",
        F.round(_dot("q_vec", "nbr_vec") / (_norm("q_vec") * _norm("nbr_vec")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )
