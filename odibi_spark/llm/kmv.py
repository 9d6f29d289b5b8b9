"""Portable k-minimum-values (KMV) distinct sketch (Bar-Yossef et al.
2002; Beyer et al. 2007 for the set operations).

The DataSketches estimates (HLL ``approx_count_distinct``, theta
``theta_sketch_agg``) are PATH-dependent — per-partition sketches union
in scheduler order, so no cross-engine oracle can rebuild them. A KMV
sketch is different: its state is the k smallest DISTINCT hash values,
a pure function of the VALUE SET. Built over the portable 60-bit md5
fold (:func:`odibi_spark.llm.dedup.portable_hash60`), DuckDB can
recompute the identical sketch with ``SELECT DISTINCT h ORDER BY h
LIMIT k`` — so the distinct-count / overlap estimates become
deterministic, hash-oracle-checkable numbers (VERDICT r9 task 2; the
same trick that made the count-min sketch exactly-oracle-able in
llm/cms.py).

Estimator (hashes uniform on [0, 2^60)): with d distinct values and
h_k the kth smallest distinct hash,

    est(d, h_k) = d                      if d < k   (sketch is exact)
                = (k-1) * 2^60 / h_k     otherwise  (relative error
                                                     ~ 1/sqrt(k-2))

Every arithmetic step is a single IEEE op over exactly-representable
inputs ((k-1) * 2^60 has <= 8 significant bits; BIGINT -> DOUBLE is the
uniquely-defined IEEE conversion in both engines), so Spark and DuckDB
produce bit-identical doubles — no rounding, no tolerance.

100-TB shape: the naive build (distinct -> sort -> limit k) shuffles
the full value universe. The scale path here prefilters map-side:
an HLL pass estimates the distinct count n, and only hashes below
``2^60 * margin*k/n`` survive (expected ~margin*k survivors). The k
smallest distinct hashes are all below ANY threshold that keeps >= k
distinct survivors, so the prefilter cannot change the result — and a
validation count falls back to the unfiltered build in the
(margin-suppressed, ~never at margin 16) case where it cut too deep.
The exchange then moves O(groups * margin * k) rows regardless of
input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from odibi_spark.llm.dedup import portable_hash60

TWO60 = 2**60  # exactly representable as a double


def _estimate(kept, kth, k: int):
    """est = kept if sketch is exact (kept < k) else (k-1)*2^60/kth.
    Mirror in DuckDB: CASE WHEN kept < k THEN CAST(kept AS DOUBLE)
    ELSE (CAST(k-1 AS DOUBLE) * 2^60) / CAST(kth AS DOUBLE) END."""
    return F.when(kept < k, kept.cast("double")).otherwise(
        F.lit(float((k - 1) * TWO60)) / kth.cast("double")
    )


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: int = 256,
    margin: int = 16,
    out_col: str = "distinct_est",
    prefilter: bool = True,
) -> DataFrame:
    """Per-group distinct-count estimate: (group_col, out_col DOUBLE).

    Plan: one map-side HLL agg for per-group thresholds (broadcast
    back), a pushed-down hash filter, then a distinct + window over the
    ~margin*k survivors per group. The validation collect is
    O(#groups) — a bounded driver aggregate.
    """
    h = df.select(
        F.col(group_col), portable_hash60(F.col(value_col)).alias("__h")
    )
    sd = None
    if prefilter:
        # O(groups) driver collect of the HLL estimates; thresholds
        # computed here so groups small enough to skip filtering
        # (n <= margin*k) cost NOTHING extra — no join, no validation
        est = {
            r[0]: int(r[1])
            for r in h.groupBy(group_col)
            .agg(F.approx_count_distinct("__h").alias("__n"))
            .collect()
        }
        # NULL group keys never enter thr: they route through the
        # unfiltered branch below (isNull in the literal predicate;
        # the broadcast equi-join never matches a null key, leaving
        # __thr null -> kept), and sorted() stays type-homogeneous
        thr = {
            g: int(float(TWO60) * (margin * k) / n)
            for g, n in est.items()
            if g is not None and n > margin * k
        }
        if thr:
            if len(thr) <= 64:  # literal predicate: zero extra plan nodes
                cond = F.lit(False)
                for g, t in sorted(thr.items()):  # filtered groups only
                    cond = cond | (
                        (F.col(group_col) == F.lit(g))
                        & (F.col("__h") < F.lit(t))
                    )
                cond = cond | ~F.col(group_col).isin(list(thr))
                cond = cond | F.col(group_col).isNull()
                filtered = h.filter(cond)
            else:  # many filtered groups: broadcast the threshold table
                # schema inferred from the key values — the group col
                # is not necessarily a string
                tdf = df.sparkSession.createDataFrame(
                    sorted(thr.items()), [group_col, "__thr"]
                )
                filtered = (
                    h.join(F.broadcast(tdf), group_col, "left")
                    .filter(
                        F.col("__thr").isNull()
                        | (F.col("__h") < F.col("__thr"))
                    )
                )
            # pin the survivor set (bounded: filtered groups keep
            # ~margin*k distinct hashes, unfiltered groups had
            # n <= margin*k to begin with) — the validation count and
            # the final window would otherwise both recompute the scan
            sd = (
                filtered.select(group_col, "__h")
                .distinct()
                .localCheckpoint(eager=True)
            )
            # validation: a FILTERED group must keep >= k distinct
            # hashes, else its k-min set may be incomplete -> rebuild
            # those groups unfiltered (margin 16 over a 5%-rsd HLL
            # makes this ~never)
            counts = {
                r[0]: int(r[1])
                for r in sd.filter(F.col(group_col).isin(list(thr)))
                .groupBy(group_col)
                .agg(F.count(F.lit(1)).alias("__d"))
                .collect()
            }
            bad = [g for g in thr if counts.get(g, 0) < k]
            if bad:
                redo = (
                    h.filter(F.col(group_col).isin(bad))
                    .select(group_col, "__h")
                    .distinct()
                )
                sd = sd.filter(  # NOT-IN is NULL for null keys: keep them
                    ~F.col(group_col).isin(bad)
                    | F.col(group_col).isNull()
                ).unionByName(redo)
    if sd is None:
        sd = h.select(group_col, "__h").distinct()
    w = Window.partitionBy(group_col).orderBy("__h")
    ranked = sd.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    summary = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__kept"),
        F.max("__h").alias("__kth"),
    )
    return summary.select(
        group_col,
        _estimate(F.col("__kept"), F.col("__kth"), k).alias(out_col),
    )


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    *,
    col: str,
    k: int = 256,
    margin: int = 16,
    label_a: str = "a",
    label_b: str = "b",
    prefilter: bool = True,
) -> DataFrame:
    """Distinct-set overlap between two corpora's values with the SAME
    output shape as :func:`odibi_spark.llm.curation.corpus_overlap`
    (the theta-sketch version) — but deterministic and cross-engine
    hash-oracle-able.

    Set algebra on one union sketch S = k smallest distinct hashes of
    A ∪ B (flags track per-hash membership): with m = |{h in S : h in
    A and h in B}|, rho = m/|S| estimates the Jaccard similarity and
    rho * union_est the intersection (Beyer et al. 2007). When the
    union has fewer than k distinct values every number is exact.

    One tagged pass builds per-hash membership flags; the prefilter
    threshold is sized from the SMALLER side's HLL estimate so all
    three sketches (A, B, A∪B) fill to k whp; validation falls back to
    the unfiltered build otherwise. Driver collects are two 1-row
    aggregates.
    """
    tagged = df_a.select(
        portable_hash60(F.col(col)).alias("__h"),
        F.lit(1).alias("__a"),
        F.lit(0).alias("__b"),
    ).unionByName(
        df_b.select(
            portable_hash60(F.col(col)).alias("__h"),
            F.lit(0).alias("__a"),
            F.lit(1).alias("__b"),
        )
    )

    def build(threshold: int | None) -> DataFrame:
        src = (
            tagged.filter(F.col("__h") < threshold)
            if threshold is not None
            else tagged
        )
        return src.groupBy("__h").agg(
            F.max("__a").alias("__a"), F.max("__b").alias("__b")
        )

    threshold = None
    if prefilter:
        est = tagged.agg(
            F.approx_count_distinct(
                F.when(F.col("__a") == 1, F.col("__h"))
            ).alias("na"),
            F.approx_count_distinct(
                F.when(F.col("__b") == 1, F.col("__h"))
            ).alias("nb"),
        ).first()
        n_min = max(1, min(int(est["na"]), int(est["nb"])))
        if n_min > margin * k:
            threshold = int(float(TWO60) * (margin * k) / n_min)
    surv = build(threshold)
    if threshold is not None:
        # pin the survivor set (bounded ~margin*k*(n_union/n_min) rows):
        # the three k-min scans + the validation aggregate would
        # otherwise each recompute the full tagged-hash pipeline
        surv = surv.localCheckpoint(eager=True)
        chk = surv.agg(
            F.count(F.lit(1)).alias("du"),
            F.sum("__a").alias("da"),
            F.sum("__b").alias("db"),
        ).first()
        if min(int(chk["du"]), int(chk["da"]), int(chk["db"])) < k:
            surv = build(None)  # threshold cut too deep: exact rebuild

    def kmin(frame: DataFrame, with_flags: bool) -> DataFrame:
        cut = frame.orderBy("__h").limit(k)
        aggs = [F.count(F.lit(1)).alias("kept"), F.max("__h").alias("kth")]
        if with_flags:
            aggs.append(
                F.sum(F.col("__a") * F.col("__b")).alias("m")
            )
        return cut.agg(*aggs)

    s_u = kmin(surv, with_flags=True).select(
        F.col("kept").alias("ku"), F.col("kth").alias("hu"), "m"
    )
    s_a = kmin(surv.filter("__a = 1"), with_flags=False).select(
        F.col("kept").alias("ka"), F.col("kth").alias("ha")
    )
    s_b = kmin(surv.filter("__b = 1"), with_flags=False).select(
        F.col("kept").alias("kb"), F.col("kth").alias("hb")
    )
    joined = s_u.crossJoin(s_a).crossJoin(s_b)  # three 1-row frames
    est_a = _estimate(F.col("ka"), F.col("ha"), k)
    est_b = _estimate(F.col("kb"), F.col("hb"), k)
    est_u = _estimate(F.col("ku"), F.col("hu"), k)
    rho = F.col("m").cast("double") / F.col("ku").cast("double")
    inter = F.least(F.least(est_a, est_b), rho * est_u)
    return joined.select(
        F.lit(label_a).alias("corpus_a"),
        F.lit(label_b).alias("corpus_b"),
        est_a.alias("distinct_a"),
        est_b.alias("distinct_b"),
        est_u.alias("union_est"),
        inter.alias("intersection_est"),
        rho.alias("jaccard_est"),
    )
