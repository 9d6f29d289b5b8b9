"""Distributed global ranking — total-order rank families WITHOUT an
``Exchange SinglePartition``.

Spark's ``ntile/percent_rank/rank/row_number OVER (ORDER BY ...)`` with
no PARTITION BY funnels the whole input through ONE task (a global
window is a global sort). That is fine for bounded dimensions but is
the classic silent scale-killer when the ranked set grows with the
data (VERDICT r5 "what's wrong" #1). This module computes the same
values with the two-pass range-partitioned idiom already proven in
``odibi_spark.llm.chunking._global_cum_before``:

1. ``repartitionByRange`` on the ordering key — partitions hold
   contiguous key ranges AND tie groups never span partitions (equal
   keys compare equal against every range boundary, so the range
   partitioner sends them to the same partition);
2. one O(partitions)-row aggregate collects per-partition row counts
   (plus distinct-key counts for dense_rank, plus any piggybacked
   column totals) to the driver, which prefix-sums them into
   partition start offsets — a few KB even at thousands of
   partitions;
3. the offsets broadcast-join back and PER-PARTITION windows produce
   within-partition ranks; adding the offset yields the exact global
   value:

   - ``row_number``  = offset + row_number()            (order total
     when the key is unique; otherwise ties ordered arbitrarily
     within their partition, same as Spark's global window)
   - ``rank``        = offset + rank()                  (exact: tie
     groups are partition-local, so the within-partition rank of a
     tie group's first row is correct globally)
   - ``dense_rank``  = distinct-key offset + dense_rank()
   - ``percent_rank``= (rank - 1) / (N - 1)             (0.0 if N==1)
   - ``cume_dist``   = (offset + max row_number in tie group) / N
   - ``ntile(k)``    consecutive-head formula: with q = N DIV k and
     r = N mod k, the first r buckets hold q+1 CONSECUTIVE rows and
     the rest hold q (SQL NTILE semantics) — rn <= r*(q+1) maps by
     DIV (q+1), the tail by DIV q. NOT floor((rn-1)*k/N)+1, which
     spreads the extra rows evenly and disagrees whenever k does not
     divide N (hypothesis-caught; see the implementation below).

Output is byte-identical to the plain global window (pinned by
``tests/test_rank.py`` equivalence tests); the plan contains range +
hash exchanges only. Costs one materialization of the input (a lazy
``localCheckpoint`` pins the partition assignment both passes must
share) and one O(partitions) collect.

Crossover note (measured r7 by bench.py's ``rank_scale`` probe,
local[32], warm, 2-col synthetic rows): at 1.2M rows the plain
window still wins (window/two-pass = 0.64x — one task sorts 1.2M
narrow rows faster than the two-pass's fixed costs: range sampling
job, checkpoint, collect, broadcast join); at 12M rows the
single-partition window is 3.5x SLOWER than the two-pass and the
gap grows ~5.5x per decade of input. The crossover sits right
around ``pack_sequences``' 2M-row gate. Use the plain window for
provably bounded inputs; use this whenever the ranked set grows
with the data — the single task that sorts 1.2M rows in a second
does not exist for 15B.

NULL ordering note: Spark sorts NULLs FIRST ascending / LAST
descending, ANSI engines (DuckDB) default NULLS LAST ascending —
rank NULL-free keys (or COALESCE) when hash-matching across engines.

No reference counterpart — the reference's window_calculation
(odibi/transformers/advanced.py:782-819) always emits the plain
window; this is the 100-TB scale path for its unpartitioned case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform

#: Rank-family functions computable by the distributed two-pass path.
RANK_FUNCTIONS = {
    "row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
    "ntile",
}


def global_ranks(
    df: DataFrame,
    *,
    order_by: list[str],
    columns: dict[str, dict],
    descending: bool = False,
    attach_totals: dict[str, str] | None = None,
) -> DataFrame:
    """Add one or more global-rank columns in a single two-pass job.

    ``columns`` maps output column name -> spec dict with ``function``
    (one of :data:`RANK_FUNCTIONS`) and, for ntile, ``buckets``.
    ``attach_totals`` maps output column name -> input column whose
    GRAND TOTAL (sum over all rows) is attached as a literal — the
    per-partition sums ride along in the same O(partitions) collect,
    so share-of-total style queries need no separate 1-row global
    aggregate (and hence no ``Exchange SinglePartition``).

    All requested ranks share one range shuffle, one checkpoint and
    one per-partition window — call once with many columns rather than
    once per column.
    """
    bad = {s["function"] for s in columns.values()} - RANK_FUNCTIONS
    if bad:
        raise ValueError(f"unsupported rank functions: {sorted(bad)}")
    if not order_by:
        raise ValueError("global_ranks requires a non-empty order_by")
    for s in columns.values():
        if s["function"] == "ntile" and int(s.get("buckets", 10)) < 1:
            raise ValueError("ntile buckets must be >= 1")
    totals_spec = attach_totals or {}

    sort_cols = [
        F.col(c).desc() if descending else F.col(c).asc() for c in order_by
    ]
    ranged = (
        df.repartitionByRange(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    need_dense = any(s["function"] == "dense_rank" for s in columns.values())
    aggs = [F.count(F.lit(1)).alias("__n")]
    if need_dense:
        aggs.append(
            F.count_distinct(F.struct(*order_by)).alias("__nd")
        )
    for i, src in enumerate(totals_spec.values()):
        aggs.append(F.sum(F.col(src)).alias(f"__t{i}"))
    agg_df = ranged.groupBy("__pid").agg(*aggs)
    total_types = [agg_df.schema[f"__t{i}"].dataType for i in range(len(totals_spec))]
    stats = {r["__pid"]: r for r in agg_df.collect()}

    offsets: list[tuple[int, int, int]] = []
    acc_n = acc_d = 0
    grand = [None] * len(totals_spec)
    for pid in sorted(stats):
        r = stats[pid]
        offsets.append((pid, acc_n, acc_d))
        acc_n += int(r["__n"])
        if need_dense:
            acc_d += int(r["__nd"])
        for i in range(len(totals_spec)):
            v = r[f"__t{i}"]
            if v is not None:
                grand[i] = v if grand[i] is None else grand[i] + v
    n_total = acc_n

    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets or [(0, 0, 0)], schema="__pid INT, __poff BIGINT, __doff BIGINT"
    )
    w = Window.partitionBy("__pid").orderBy(*sort_cols)
    out = ranged.join(F.broadcast(off_df), "__pid")

    grn = (F.col("__poff") + F.row_number().over(w)).cast("long")
    grk = (F.col("__poff") + F.rank().over(w)).cast("long")
    helper_cols: list[str] = []
    need_cume = any(s["function"] == "cume_dist" for s in columns.values())
    if need_cume:
        # count of rows <= current key = global row_number of the tie
        # group's LAST row: max per (partition, key) — one extra hash
        # exchange on (pid, keys), still never SinglePartition.
        out = out.withColumn("__grn", grn)
        tie_w = Window.partitionBy("__pid", *order_by)
        out = out.withColumn("__tie_max", F.max("__grn").over(tie_w))
        helper_cols += ["__grn", "__tie_max"]

    for out_col, spec in columns.items():
        fn = spec["function"]
        if fn == "row_number":
            expr = grn
        elif fn == "rank":
            expr = grk
        elif fn == "dense_rank":
            expr = (F.col("__doff") + F.dense_rank().over(w)).cast("long")
        elif fn == "percent_rank":
            expr = (
                (grk - F.lit(1)) / F.lit(n_total - 1) if n_total > 1
                else F.lit(0.0)
            ).cast("double")
        elif fn == "cume_dist":
            expr = (F.col("__tie_max") / F.lit(n_total)).cast("double")
        else:  # ntile
            k = int(spec.get("buckets", 10))
            # SQL NTILE gives the first (N mod k) buckets one extra row
            # CONSECUTIVELY — floor((rn-1)*k/N) spreads the extras
            # evenly and disagrees whenever k does not divide N
            # (hypothesis-caught). Integer DIV throughout: exact far
            # beyond double's 2^53 range.
            q_, r_ = divmod(n_total, k) if n_total else (0, 0)
            head = r_ * (q_ + 1)
            out = out.withColumn("__ntx", grn)
            if q_ == 0:  # fewer rows than buckets: bucket = row number
                expr = F.col("__ntx").cast("int")
            else:
                expr = F.expr(
                    f"CAST(CASE WHEN __ntx <= {head} "
                    f"THEN (__ntx - 1) DIV {q_ + 1} + 1 "
                    f"ELSE {r_} + (__ntx - {head} - 1) DIV {q_} + 1 "
                    f"END AS INT)"
                )
        out = out.withColumn(out_col, expr)
        if fn == "ntile":
            out = out.drop("__ntx")

    for (out_col, lit_val), dt in zip(zip(totals_spec, grand), total_types):
        # cast to the aggregate's result type: pins Decimal precision
        # (lit() infers it from the value's digits) and keeps an
        # all-NULL total a typed column instead of VOID
        out = out.withColumn(out_col, F.lit(lit_val).cast(dt))
    return out.drop("__pid", "__poff", "__doff", *helper_cols)


@transform("global_rank")
def global_rank(
    ctx: EngineContext,
    *,
    order_by: list[str],
    columns: dict[str, dict],
    descending: bool = False,
    attach_totals: dict[str, str] | None = None,
) -> EngineContext:
    """YAML-facing wrapper over :func:`global_ranks` — the scale path
    for ``window_calculation`` with no ``partition_by`` and a
    rank-family function (see module docstring)."""
    return ctx.with_df(
        global_ranks(
            ctx.df,
            order_by=order_by,
            columns=columns,
            descending=descending,
            attach_totals=attach_totals,
        )
    )
