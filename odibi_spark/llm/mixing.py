"""Data mixing and contrastive pair mining for training-data prep.

Two published training-data operations missing from the surface until
r13:

- **Domain mixture reweighting** — DoReMi (Xie et al. 2023,
  "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
  Pretraining") tunes the sampling weight of each domain by
  exponentiated-gradient steps on per-domain excess loss.
  :func:`domain_mixture_weights` is the multiplicative-weights twin
  (Freund & Schapire's MWU — EG's first-order form, no ``exp()``
  whose last ulp differs across engines): per-domain losses come from
  ONE corpus-scale aggregate, then T rounds of integer micro-unit
  updates with a deterministic largest-remainder renormalization, so
  a DuckDB oracle replays every round bit-exactly (the
  quality_classifier_train protocol applied to mixture search).

- **Hard-negative mining** — contrastive embedding training needs
  (anchor, hard negative) pairs: the most similar items that are NOT
  duplicates (semi-hard band of Schroff et al. 2015's FaceNet
  terminology). :func:`hard_negative_pairs` mines the top-k
  highest-cosine neighbours inside a [lo, hi) band, with an optional
  exclusion pair-frame (known duplicates / same-label pairs) removed
  by an anti-join.

Scale: the mixture op is one map-side-combined groupBy(domain) over
the scored corpus plus O(domains) driver state per round; mining
composes the existing ANN candidate generators — the brute-force
scorer here broadcasts only the anchor side (the cosine_topk
convention), and at 100 TB the candidate feed swaps to
``lsh_probe_buckets`` / ``ivf_topk`` without changing the band/top-k
tail.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000


class HardNegativeApproximationWarning(UserWarning):
    """hard_negative_pairs silently-no-more: emitted when mode='auto'
    crosses max_anchors and switches to approximate LSH candidates
    (recall < 1 vs the documented exact contract)."""


def domain_losses(
    df: DataFrame,
    domain_col: str = "source",
    nll_col: str = "nll",
) -> DataFrame:
    """Per-domain mean loss: exact DECIMAL(18,6) sum of the per-item
    losses divided by the count in double — bit-identical across
    engines and partitionings (the SURVEY §7.3 mean convention).

    PRECONDITION: ``nll_col`` values must already be <= 6-decimal
    fixed-point (the ngram_lm / KN per-TOKEN nll convention — rounded
    before summing), so the DECIMAL cast is the identity; feeding an
    arbitrary double (e.g. a per-doc avg_nll) would re-round it and
    midpoint docs could flip between engines. The canonical input is
    the token-level scored frame joined to its domain column."""
    return (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.sum(F.col(nll_col).cast("decimal(18,6)")).alias("__s"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "domain",
            "n_items",
            (F.col("__s").cast("double") / F.col("n_items")).alias("loss"),
        )
    )


def _largest_remainder(
    weights: list[tuple[str, int]], total: int = MICRO
) -> dict[str, int]:
    """Deterministic integer renormalization to ``total``: floor each
    share, then hand the shortfall to the largest remainders (ties to
    the lexicographically smaller domain). Pure integer arithmetic —
    the DuckDB replay is a window over (remainder DESC, domain)."""
    s = sum(w for _, w in weights)
    if s <= 0:
        raise ValueError("weights must sum positive")
    floored = {d: (w * total) // s for d, w in weights}
    rems = sorted(
        ((-((w * total) % s), d) for d, w in weights),
    )
    short = total - sum(floored.values())
    for _, d in rems[:short]:
        floored[d] += 1
    return floored


def domain_mixture_weights(
    scored: DataFrame,
    domain_col: str = "source",
    nll_col: str = "nll",
    *,
    rounds: int = 3,
    eta: tuple[int, int] = (1, 2),
) -> DataFrame:
    """T rounds of multiplicative-weights mixture search over the
    per-domain losses: harder domains (higher normalized loss) gain
    weight each round —

        s_d   = (loss_d - min) / (max - min)      (0 when all equal)
        w'_d  = floor(w_d * (1 + eta * s_d))      (micro-units)
        w_d   <- largest-remainder renormalize to 1e6

    Returns one row per domain: (domain, n_items, loss, weight) with
    ``weight`` the final round's micro-unit share (sums to exactly
    1e6). Every step is either bit-stable double arithmetic in one
    pinned order or pure integer math, so the whole compounding loop
    is replayable by a SQL oracle.

    Scale: the only corpus-sized work is the caller's scoring pass;
    this function's aggregate is map-side-combined groupBy(domain)
    and the loop is O(rounds x domains) driver state."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    eta_num, eta_den = eta
    if eta_num < 0 or eta_den < 1:
        raise ValueError("eta must be a non-negative rational")
    losses = domain_losses(scored, domain_col, nll_col)
    rows = sorted(losses.collect(), key=lambda r: r["domain"])
    if not rows:
        raise ValueError("no domains to weight")
    names = [r["domain"] for r in rows]
    n_items = {r["domain"]: int(r["n_items"]) for r in rows}
    loss = {r["domain"]: float(r["loss"]) for r in rows}
    lo, hi = min(loss.values()), max(loss.values())
    w = _largest_remainder([(d, 1) for d in names])  # uniform start
    e = eta_num / eta_den
    for _ in range(rounds):
        scaled = []
        for d in names:
            s_d = 0.0 if hi == lo else (loss[d] - lo) / (hi - lo)
            scaled.append((d, int(w[d] * (1.0 + e * s_d))))
        w = _largest_remainder(scaled)
    spark = scored.sparkSession
    out = spark.createDataFrame(
        [(d, n_items[d], loss[d], int(w[d])) for d in names],
        "domain string, n_items bigint, loss double, weight bigint",
    )
    return out


def hard_negative_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 3,
    lo: float = 0.1,
    hi: float = 0.9,
    anchor_filter: str | None = None,
    exclude: DataFrame | None = None,
    round_digits: int = 6,
    candidates: DataFrame | None = None,
    max_anchors: int = 5000,
    num_planes: int = 10,
    nprobe: int = 4,
    dim: int = 64,
    mode: str = "auto",
) -> DataFrame:
    """Semi-hard negative mining: for each anchor, the ``k``
    highest-cosine neighbours whose cosine falls in [lo, hi) — close
    enough to be informative, below the duplicate band — minus any
    (anchor_id, neg_id) pairs in ``exclude`` (known dups / same-label
    pairs; checked symmetrically). Output (anchor_id, neg_id, cosine,
    rank), rank 1 = hardest. Deterministic: ties break on nbr id.

    Plan is gated on anchor count (the lang_classify/ivf_assign
    plan-size-gate pattern, made automatic per VERDICT r13): up to
    ``max_anchors`` anchors the exact path broadcasts the anchors
    against the streaming corpus (the cosine_topk shape — no corpus
    shuffle, band filter BEFORE the per-anchor top-k window). Above
    the gate a broadcast cross join would silently materialize a
    huge build side, so the candidate feed routes through multi-probe
    SRP-LSH (``lsh_probe_buckets``: anchors probe their ``nprobe``
    most-likely buckets, the corpus keeps one bucket/vector, and the
    join is the bucket EQUI-join — no BroadcastNestedLoopJoin).
    Callers can also pass an explicit ``candidates`` frame of
    (anchor_id, neg_id) pairs (e.g. from ``ivf_topk`` /
    ``lsh_ann_topk``) — it bypasses the gate and keeps the identical
    band + top-k tail. The cheap count that implements the gate is
    ``anchors.limit(max_anchors + 1).count()`` — it never scans past
    the threshold.

    ``mode`` makes the approximation OPT-IN rather than silent
    (ADVICE r14): ``'exact'`` always broadcasts (no gate count, no
    eager job — callers who know their anchor set is small get a
    fully lazy plan and the documented exact contract), ``'lsh'``
    always routes through the SRP candidate feed (no gate count),
    and ``'auto'`` keeps the gate but ``warnings.warn``s a
    ``HardNegativeApproximationWarning`` when the LSH path engages,
    so recall<1 never happens without a caller-visible signal."""
    from odibi_spark.llm.similarity import (
        hyperplane_lsh_buckets, lsh_probe_buckets,
    )
    from pyspark.sql.window import Window

    if not 0 <= lo < hi:
        raise ValueError("need 0 <= lo < hi")
    # apply the user's filter BEFORE renaming, so the expression sees
    # the original column names (a textual rename corrupted filters
    # where id_col was a substring of another identifier)
    anchor_src = df.filter(anchor_filter) if anchor_filter else df
    anchors = anchor_src.select(
        F.col(id_col).alias("anchor_id"), F.col(vec_col).alias("a_vec")
    )
    corpus = df.select(
        F.col(id_col).alias("neg_id"), F.col(vec_col).alias("n_vec")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("a_vec"), F.col("n_vec"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def nrm(c: str):
        return F.sqrt(
            F.aggregate(
                F.col(c),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )

    if mode not in ("auto", "exact", "lsh"):
        raise ValueError(f"mode must be auto|exact|lsh, got {mode!r}")
    if candidates is None and mode != "exact":
        take_lsh = mode == "lsh"
        if not take_lsh and max_anchors is not None:
            # the only eager job in this function, and only in auto
            # mode: limit(n+1).count() never scans past the threshold
            take_lsh = (
                anchors.limit(max_anchors + 1).count() > max_anchors
            )
            if take_lsh:
                warnings.warn(
                    f"hard_negative_pairs: anchor count exceeds "
                    f"max_anchors={max_anchors}; switching to "
                    "approximate SRP-LSH candidates (recall < 1). "
                    "Pass mode='lsh' to silence, mode='exact' to "
                    "force the broadcast path, or candidates=... "
                    "to supply your own feed.",
                    HardNegativeApproximationWarning,
                    stacklevel=2,
                )
        if take_lsh:
            probes = lsh_probe_buckets(
                anchor_src, id_col, vec_col, num_planes, dim,
                seed=42, nprobe=nprobe,
            ).withColumnRenamed("id", "anchor_id")
            b = hyperplane_lsh_buckets(
                df, id_col, vec_col, num_planes, dim, seed=42
            ).select(F.col("id").alias("neg_id"), "bucket")
            candidates = (
                probes.join(b, "bucket")
                .filter(F.col("anchor_id") != F.col("neg_id"))
                .select("anchor_id", "neg_id")
                .distinct()
            )
    if candidates is not None:
        fed = (
            candidates.select("anchor_id", "neg_id")
            .join(anchors, "anchor_id")
            .join(corpus, "neg_id")
        )
    else:
        fed = corpus.crossJoin(F.broadcast(anchors))
    pairs = (
        fed.filter(F.col("anchor_id") != F.col("neg_id"))
        .withColumn(
            "cosine",
            F.round(dot / (nrm("a_vec") * nrm("n_vec")), round_digits),
        )
        .filter((F.col("cosine") >= lo) & (F.col("cosine") < hi))
        .select("anchor_id", "neg_id", "cosine")
    )
    if exclude is not None:
        ex = exclude.toDF("x_a", "x_b")
        sym = ex.unionByName(
            ex.select(F.col("x_b").alias("x_a"), F.col("x_a").alias("x_b"))
        ).distinct()
        pairs = pairs.join(
            F.broadcast(sym),
            (pairs.anchor_id == sym.x_a) & (pairs.neg_id == sym.x_b),
            "left_anti",
        )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("neg_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "neg_id", "cosine", "rank")
    )
