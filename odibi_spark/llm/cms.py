"""Count-min sketch: a fixed-size, mergeable frequency summary
(Cormode & Muthukrishnan 2005) for heavy-hitter / frequency queries
over unbounded key cardinality.

Complements the HLL (distinct count) / KLL (quantiles) / theta (set
overlap) sketches in :mod:`odibi_spark.patterns.aggregation`: CMS
answers "how often did key k occur" in O(depth x width) space with a
one-sided error — estimates never undercount, and overcount by at most
``eps * N`` (eps = e/width) with probability ``1 - delta``
(delta = exp(-depth)).

Unlike the DataSketches family, this CMS is built from the portable
60-bit md5 fold (:func:`odibi_spark.llm.dedup.portable_hash60`), so a
differential oracle (DuckDB) can recompute the identical table
bit-for-bit — a sketch with an EXACT cross-engine oracle, not just
error bounds. The reference engine exposes no sketch surface; this is
beyond-reference scale tooling.

Sketch representation: a long-format DataFrame ``(depth, bucket,
cnt)`` with at most ``depth x width`` rows. Long format (rather than a
single binary blob) keeps build, merge, and probe all inside
whole-stage codegen — build is one map-side-combined groupBy, merge is
a union + the same groupBy, probe is an equi-join + min().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from odibi_spark.llm.dedup import portable_hash60


def _bucket(key: Column, d: int, width: int, seed: int) -> Column:
    """Row hash for depth-row d: portable md5 fold of 'seed:d:key'."""
    return portable_hash60(
        F.concat_ws(":", F.lit(str(seed)), F.lit(str(d)), key.cast("string"))
    ) % F.lit(int(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Build a count-min sketch over ``df[key_col]`` (optionally
    weighted by ``weight_col``). Returns ``(depth, bucket, cnt)``.

    Plan shape: one inline explode of ``depth`` (row, bucket) structs
    per input row, then a single groupBy (depth, bucket) — partial
    aggregation collapses each task's contribution to at most
    ``depth x width`` rows before the shuffle, so the exchange moves
    O(tasks x depth x width) rows regardless of input size. At 100 TB
    the build is scan-bound.
    """
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    key = F.col(key_col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(key, d, width, seed).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db"),
        w.alias("__w"),
    )
    return (
        rows.select("db.depth", "db.bucket", "__w")
        .groupBy("depth", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS tables built with the SAME (width, depth, seed):
    cell-wise sum. The merged sketch answers queries over the union of
    the inputs — the property that makes per-batch sketches foldable
    into a running state (see aggregate_incremental_sketches for the
    HLL/KLL analog)."""
    if not sketches:
        raise ValueError("cms_merge requires at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    seed: int = 42,
    out_col: str = "est_cnt",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: estimate =
    min over the ``depth`` cells the key hashes to. (width, depth,
    seed) must match the build.

    Plan: explode the probe keys to their depth cells, equi-join the
    sketch on (depth, bucket) — the sketch side is at most
    depth x width rows, so AQE broadcasts it — then min() per key.
    Missing cells count 0 (key never seen in that row).
    """
    key = F.col(key_col)
    probes = keys.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(key, d, width, seed).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db"),
    ).select(key_col, "db.depth", "db.bucket")
    return (
        probes.join(sketch, ["depth", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias(out_col))
    )
