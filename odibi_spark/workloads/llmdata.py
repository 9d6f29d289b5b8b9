"""LLM-data workloads over documents/embeddings tables, with DuckDB
oracles where SQL-expressible; minhash/simhash/LSH entries are
rows-only checks (hash functions differ across engines by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.io import read_table
from odibi_spark.llm import dedup, similarity, text

DEC = "DECIMAL(18,6)"


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # right-size shuffles when running under an untuned session; AQE
    # (default-on in Spark 4) coalesces further at runtime
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring per document (length/stopword features)."""
    _prep(spark)
    df = text.with_text_stats(read_table(spark, sf_dir, "documents"))
    # round: ln() differs by 1 ulp between JVM and libm
    return df.select(
        "doc_id", "n_chars_obs", "n_words", "avg_word_len",
        "stopword_ratio", F.round("quality_score", 6).alias("quality_score"),
    )


TEXT_QUALITY_SQL = """
WITH w AS (
  SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars_obs,
         CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_words,
         CAST(len(list_filter(string_split(trim(text), ' '),
                         x -> x = 'the' OR x = 'a')) AS INTEGER) AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars_obs, n_words,
       (n_chars_obs - (n_words - 1)) / n_words AS avg_word_len,
       stop_hits / n_words AS stopword_ratio,
       round(ln(1 + n_words) * (1.0 - stop_hits / n_words), 6) AS quality_score
FROM w
"""


def token_counts_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + regex) rolled up per source."""
    _prep(spark)
    df = text.with_token_counts(read_table(spark, sf_dir, "documents"))
    return df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("word_tokens").alias("total_word_tokens"),
    )


TOKEN_COUNTS_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS total_word_tokens
FROM documents GROUP BY source
"""


def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash."""
    _prep(spark)
    return dedup.exact_dedup_groups(read_table(spark, sf_dir, "documents"), "doc_id")


EXACT_DEDUP_SQL = """
SELECT md5(text) AS fingerprint, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
"""


def fingerprint_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized fingerprint uniqueness per source."""
    _prep(spark)
    df = text.with_fingerprint(read_table(spark, sf_dir, "documents"))
    return df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_unique"),
    )


FINGERPRINT_SQL = """
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(trim(regexp_replace(
         regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))))
       AS n_unique
FROM documents GROUP BY source
"""


def lang_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic signal: English stopword presence by the
    labelled language."""
    _prep(spark)
    df = read_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), " ")
    return (
        df.withColumn("has_the", F.array_contains(words, "the").cast("int"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_the").alias("n_docs_with_the"),
            F.sum(F.expr(f"CAST(n_chars AS {DEC})")).cast("double").alias("total_chars"),
        )
    )


LANG_PROFILE_SQL = f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(list_contains(string_split(trim(text), ' '), 'the') AS BIGINT)) AS BIGINT)
         AS n_docs_with_the,
       CAST(SUM(CAST(n_chars AS {DEC})) AS DOUBLE) AS total_chars
FROM documents GROUP BY lang
"""


def ngram_jaccard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard >= 0.2 (shingle-share candidates)."""
    _prep(spark)
    df = read_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.2, max_df=None
    )


NGRAM_JACCARD_SQL = """
WITH sets AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(string_split(trim(text), ' ')) - 1),
           i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' ')
         )) AS sh
  FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 3
),
exploded AS (SELECT doc_id, unnest(sh) AS shingle FROM sets),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM exploded a JOIN exploded b USING (shingle)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       len(list_intersect(sa.sh, sb.sh))
         / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
FROM cands
JOIN sets sa ON sa.doc_id = id_a
JOIN sets sb ON sb.doc_id = id_b
WHERE len(list_intersect(sa.sh, sb.sh))
        / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.2
"""


def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 20."""
    _prep(spark)
    df = read_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(
        df, "vec_id", "embedding", query_filter="vec_id < 20", k=5
    )


EMB_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS nbr_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
scored AS (
  SELECT query_id, nbr_id,
         round(list_dot_product(qv, nv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))),
               6) AS cosine
  FROM q JOIN c ON nbr_id <> query_id
)
SELECT query_id, nbr_id, cosine,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, nbr_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


# ---- rows-only checks (engine-specific hashing; no portable oracle) ----

def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8 bands) near-dup pairs, Jaccard-verified."""
    _prep(spark)
    df = read_table(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(
        df, "doc_id", "text", n=3, num_perm=32, bands=8, threshold=0.2
    )


def simhash_near_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup candidates (hamming <= 10 via 16-bit bands)."""
    _prep(spark)
    df = read_table(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(df, "doc_id", "text", max_hamming=10)


def lsh_ann_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH buckets."""
    _prep(spark)
    df = read_table(spark, sf_dir, "embeddings")
    return similarity.lsh_ann_topk(df, "vec_id", "embedding", k=5, num_planes=8)


def language_guesses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language guess distribution (heuristic op)."""
    _prep(spark)
    df = text.with_language_guess(read_table(spark, sf_dir, "documents"))
    return df.groupBy("lang", "lang_guess").agg(F.count(F.lit(1)).alias("n_docs"))


QUERIES = {
    "text_quality": text_quality,
    "token_counts_by_source": token_counts_by_source,
    "exact_dedup_docs": exact_dedup_docs,
    "fingerprint_by_source": fingerprint_by_source,
    "lang_stopword_profile": lang_stopword_profile,
    "ngram_jaccard_docs": ngram_jaccard_docs,
    "embedding_cosine_topk": embedding_cosine_topk,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash_near_docs": simhash_near_docs,
    "lsh_ann_neighbors": lsh_ann_neighbors,
    "language_guesses": language_guesses,
}

ORACLES = {
    "text_quality": TEXT_QUALITY_SQL,
    "token_counts_by_source": TOKEN_COUNTS_SQL,
    "exact_dedup_docs": EXACT_DEDUP_SQL,
    "fingerprint_by_source": FINGERPRINT_SQL,
    "lang_stopword_profile": LANG_PROFILE_SQL,
    "ngram_jaccard_docs": NGRAM_JACCARD_SQL,
    "embedding_cosine_topk": EMB_TOPK_SQL,
    # minhash_lsh_pairs / simhash_near_docs / lsh_ann_neighbors /
    # language_guesses: rows-only (engine-specific hash functions)
}
