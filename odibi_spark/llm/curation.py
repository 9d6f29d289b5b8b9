"""Training-corpus curation: benchmark decontamination and
deterministic sampling (hash sampling, stratified fractions, per-group
token budgets, mixture weighting).

Decontamination follows the published n-gram-overlap procedure used
for large-LM training sets (GPT-3, Brown et al. 2020, appendix C;
PaLM; Llama): a corpus document is contaminated when it shares enough
distinct word n-grams with any benchmark/eval document.

Sampling is hash-deterministic (md5-folded 60-bit, no RNG state):
re-running the same seed over the same corpus — or over the corpus
re-partitioned any other way — selects the identical subset, which is
the property that matters for reproducible 100-TB curation runs and
for differential oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from odibi_spark.llm import dedup

PH60_MAX = float(1 << 60)


def gram_bloom(
    grams: DataFrame,
    *,
    col: str = "gram",
    bits_per_item: int = 16,
    hashes: int = 3,
) -> tuple[DataFrame, int, int]:
    """Pure-SQL Bloom filter over a column of values: ``m = n_distinct
    * bits_per_item`` bits laid out as Spark bitmap segments
    (``bitmap_construct_agg`` — 32768-bit buckets, 0-based LSB-first
    bit positions), k = ``hashes`` positions per value via seeded
    xxhash64. Returns ``(bloom_df(bucket BIGINT, bm BINARY), m, k)``
    — the whole filter is m/8 bytes total (2 bytes/item at the
    defaults, FPR ~= (1 - e^(-k/bits_per_item))^k ~= 0.5%), an
    order of magnitude smaller than broadcasting the values or their
    64-bit hashes. No JVM-private API: built-in SQL functions only.
    """
    n = grams.select(col).distinct().count()
    m = max(64, int(n) * int(bits_per_item))
    pos = grams.select(
        F.explode(
            F.array(*[_bloom_position(F.col(col), j, m) for j in range(hashes)])
        ).alias("p")
    )
    bloom = pos.groupBy(
        F.expr("bitmap_bucket_number(p)").alias("bucket")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(p))").alias("bm"))
    return bloom, m, int(hashes)


def _bloom_position(col, j: int, m: int):
    """1-based global bit position of hash j — identical expression at
    build and probe time."""
    return F.pmod(F.xxhash64(col, F.lit(int(j))), F.lit(int(m))) + F.lit(1)


def bloom_might_contain(
    df: DataFrame, bloom: DataFrame, m: int, hashes: int, *, col: str,
    negate: bool = False,
) -> DataFrame:
    """Filter ``df`` to rows whose ``col`` the Bloom filter might
    contain (no false negatives; FPs at the filter's rate). k broadcast
    left-joins of the tiny bitmap table — the probed frame never
    shuffles, and the byte-probe (`substr` + bit mask) stays inside
    whole-stage codegen. ``negate=True`` keeps the complement instead:
    rows the filter definitely does NOT contain (exact, because no
    false negatives) — the anti-join prefilter direction."""
    out = df
    conds = []
    for j in range(hashes):
        pcol, bkcol, bmcol = f"__bp{j}", f"__bk{j}", f"__bm{j}"
        out = out.withColumn(pcol, _bloom_position(F.col(col), j, m)).join(
            F.broadcast(
                bloom.select(
                    F.col("bucket").alias(bkcol), F.col("bm").alias(bmcol)
                )
            ),
            F.expr(f"bitmap_bucket_number({pcol})") == F.col(bkcol),
            "left",
        )
        byte = F.expr(
            f"CAST(conv(hex(substr({bmcol}, "
            f"CAST(bitmap_bit_position({pcol}) DIV 8 AS INT) + 1, 1)), "
            "16, 10) AS INT)"
        )
        mask = F.expr(
            f"CAST(shiftleft(1, CAST(bitmap_bit_position({pcol}) % 8 AS INT)) AS INT)"
        )
        conds.append(F.col(bmcol).isNotNull() & (byte.bitwiseAND(mask) != 0))
    member = conds[0]
    for c_ in conds[1:]:
        member = member & c_
    drop = [c for j in range(hashes) for c in (f"__bp{j}", f"__bk{j}", f"__bm{j}")]
    return out.filter(~member if negate else member).drop(*drop)


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
    prefilter: str = "broadcast",
    bloom_bits_per_gram: int = 16,
    bloom_hashes: int = 3,
) -> DataFrame:
    """(id_col, bench_id_col, shared_grams) for every corpus/benchmark
    pair sharing >= ``min_hits`` distinct word ``n``-grams.

    Scale shape: the benchmark side (eval sets — thousands to millions
    of grams, bounded regardless of corpus size) is broadcast, so the
    corpus gram stream joins map-side without shuffling; only MATCHED
    (doc, bench, gram) rows reach the counting shuffle, which is
    bounded by contamination volume, not corpus size.

    ``prefilter="bloom"`` inserts a Bloom-filter pass (built over the
    benchmark grams, ~2 bytes per gram at the defaults) BEFORE the
    exact gram join: the corpus gram stream is cut to true hits plus
    ~0.5% false positives map-side, and the exact join then removes
    the FPs — output is IDENTICAL to the exact path (hash-checked by
    the ``decontamination_bloom_hits`` workload against the same
    oracle). Use it when the benchmark gram set strains the broadcast
    hash relation: the bitmap is ~10-30x smaller than a broadcast
    join relation over the same grams, extending the map-side-only
    plan shape to benchmark suites tens of times larger.
    """
    if id_col == bench_id_col:
        raise ValueError("id_col and bench_id_col must differ (join output keeps both)")
    if prefilter not in ("broadcast", "bloom"):
        raise ValueError(f"unknown prefilter {prefilter!r}")
    c = dedup.explode_nonempty(
        dedup.word_shingles(corpus, id_col, text_col, n),
        "shingles", "gram", F.col("id").alias(id_col),
    )
    b = dedup.explode_nonempty(
        dedup.word_shingles(benchmark, bench_id_col, bench_text_col, n),
        "shingles", "gram", F.col("id").alias(bench_id_col),
    )
    if prefilter == "bloom":
        bloom, m, k = gram_bloom(
            b, col="gram", bits_per_item=bloom_bits_per_gram,
            hashes=bloom_hashes,
        )
        c = bloom_might_contain(c, bloom, m, k, col="gram")
    return (
        # bounded broadcast: b is the BENCHMARK gram set — eval suites
        # are fixed-size regardless of corpus scale
        c.join(F.broadcast(b), "gram")
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_hits)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Corpus minus contaminated documents (left-anti on the hit set).

    No broadcast hint on the anti-join (VERDICT r5 sweep): the hit
    set is usually tiny but is CORPUS-PROPORTIONAL in the worst case
    (a heavily benchmark-contaminated crawl), so the hint is left to
    AQE — it broadcasts at runtime when the set is actually small,
    which keeps the common case two map-side passes."""
    hits = contamination_hits(
        corpus, benchmark,
        id_col=id_col, text_col=text_col,
        bench_id_col=bench_id_col, bench_text_col=bench_text_col,
        n=n, min_hits=min_hits,
    ).select(id_col).distinct()
    return corpus.join(hits, id_col, "left_anti")


def neardup_decontaminate_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hasher: str = "xxhash64",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate benchmark decontamination: MinHash-LSH *across*
    corpora. Exact n-gram decontamination (``contamination_hits``)
    misses lightly-edited eval leakage — paraphrased prompts,
    re-wrapped few-shot examples — which is why published pipelines
    pair the exact pass with a fuzzy one (GPT-3 used 13-gram overlap;
    Llama/Gopher-style cleanups use near-dup matching). A corpus doc
    is flagged when it shares an LSH band with a benchmark doc AND
    exact shingle-set Jaccard reaches ``threshold``. Returns
    (id_col, bench_id_col, jaccard) hit rows.

    Scale shape: the benchmark side is eval-suite-sized, so its band
    keys and shingle sets broadcast — the corpus is scanned map-side
    for banding and never shuffles on content. The candidate set
    (band-collision pairs) is the only corpus-derived relation that
    moves, and the hint on the candidates join is left to AQE because
    its size is corpus-proportional in the worst case (same reasoning
    as ``decontaminate``). Verification re-uses the persisted corpus
    shingle sets rather than re-shingling.
    """
    from pyspark import StorageLevel

    rows_per_band = num_perm // bands
    c_sets = dedup.word_shingles(corpus, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        b_sets = dedup.word_shingles(
            benchmark, bench_id_col, bench_text_col, n
        ).select(F.col("id").alias("bid"), F.col("shingles").alias("bsh"))
        c_bands = dedup.band_keys(
            dedup.signatures_from_sets(c_sets, num_perm, hasher, seed),
            bands, rows_per_band, hasher,
        )
        b_bands = dedup.band_keys(
            dedup.signatures_from_sets(
                b_sets.select(F.col("bid").alias("id"), F.col("bsh").alias("shingles")),
                num_perm, hasher, seed,
            ),
            bands, rows_per_band, hasher,
        ).select(F.col("id").alias("bid"), "band", "bh")
        cands = (
            c_bands.join(F.broadcast(b_bands), ["band", "bh"])
            .select("id", "bid")
            .distinct()
        )
        out = (
            c_sets.join(cands, "id")
            .join(F.broadcast(b_sets), "bid")
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("shingles", "bsh"))
                / F.size(F.array_union("shingles", "bsh")),
            )
            .filter(F.col("jaccard") >= F.lit(float(threshold)))
            .select(
                F.col("id").alias(id_col),
                F.col("bid").alias(bench_id_col),
                "jaccard",
            )
        )
        # materialize while the persisted corpus sets are alive
        return out.localCheckpoint(eager=True)
    finally:
        c_sets.unpersist()


def importance_resample(
    source: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    k: int = 100,
    temperature: float = 1.0,
    seed: int = 42,
    min_count: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169,
    public): score every source document by an importance weight
    between add-one-smoothed unigram LMs of the target and source
    corpora — ``logw = sum_tok ln p_target(tok) - ln p_source(tok)``
    — then draw an exact-k sample with probability proportional to
    ``exp(logw / temperature)`` via the Gumbel top-k trick, using the
    portable hash unit as the Gumbel noise so selection is a pure
    function of (id, seed): reproducible across runs, partitionings,
    and engines. Returns the k selected rows:
    (id, n_tokens, logw, gumbel_key), highest key first.

    Determinism contract (the ngram_lm_scores pattern): each token's
    log-ratio and the Gumbel term are rounded to ``round_digits``
    BEFORE the exact DECIMAL sum / the key addition, so the ranking
    doubles are bit-identical across engines; ties (quantized keys)
    break on the id.

    Scale: two vocabulary aggregates (map-side combined, O(V)), two
    token->vocab joins on the token key (AQE handles Zipf-head skew),
    a per-doc aggregate, and a TakeOrderedAndProject top-k — O(k) per
    partition, never a single-partition global sort. The target corpus
    is a curated sample by construction (DSIR trains its target LM on
    the wanted distribution), so its vocab aggregate is the cheap side.
    """
    target_text_col = target_text_col or text_col

    def _toks(df: DataFrame, col: str, with_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if with_id else []
        return df.select(
            *cols,
            F.explode(F.split(F.trim(F.lower(F.col(col))), " ")).alias("tok"),
        ).filter(F.col("tok") != "")

    def _lm(toks: DataFrame):
        # r15 (guide §3.3/§5): each vocab feeds both its totals scalar
        # and the token join — checkpoint the O(V) table so each
        # corpus is tokenized + aggregated once, not twice
        vocab = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= min_count)
            .localCheckpoint(eager=True)
        )
        totals = vocab.agg(
            F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
        )
        return vocab, totals

    src_toks = _toks(source, text_col, with_id=True)
    sv, st = _lm(src_toks.select("tok"))
    tv, tt = _lm(_toks(target, target_text_col, with_id=False))
    scored = (
        src_toks.join(tv.select("tok", F.col("c").alias("tc")), "tok", "left")
        .join(sv.select("tok", F.col("c").alias("sc")), "tok", "left")
        .crossJoin(F.broadcast(
            tt.select(F.col("n").alias("tn"), F.col("v").alias("tv"))
        ))
        .crossJoin(F.broadcast(
            st.select(F.col("n").alias("sn"), F.col("v").alias("sv"))
        ))
        .withColumn(
            "lr",
            F.round(
                F.log((F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1.0))
                      / (F.col("tn") + F.col("tv")))
                - F.log((F.coalesce(F.col("sc"), F.lit(0)) + F.lit(1.0))
                        / (F.col("sn") + F.col("sv"))),
                round_digits,
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("lr").cast("decimal(18,6)")).cast("double").alias("logw"),
    )
    # strictly-interior uniform (h + 0.5) / 2^60 so -ln(-ln u) is always
    # finite — Spark's log(0) is NULL while DuckDB's is -inf, and the
    # half-step keeps the two engines off that measure-zero edge
    u = (
        dedup.portable_hash60(
            F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
        ).cast("double") + F.lit(0.5)
    ) / F.lit(PH60_MAX)
    keyed = per_doc.withColumn(
        "gumbel_key",
        F.round(F.col("logw") / F.lit(float(temperature)), round_digits)
        + F.round(-F.log(-F.log(u)), round_digits),
    )
    return keyed.orderBy(F.desc("gumbel_key"), F.asc(id_col)).limit(int(k))


def _hash_unit(key, seed: int):
    """Deterministic uniform-ish [0, 1) value per key: portable 60-bit
    md5 fold of 'seed:key' — identical in DuckDB via
    CAST(concat('0x', substring(md5(...), 1, 15)) AS BIGINT) / 2^60."""
    return (
        dedup.portable_hash60(F.concat_ws(":", F.lit(str(seed)), key.cast("string")))
        / F.lit(PH60_MAX)
    )


def hash_sample(
    df: DataFrame, fraction: float, *, key_col: str, seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash unit
    interval value < fraction. Unlike df.sample(), the selection is a
    pure function of (key, seed) — stable across runs, partitionings,
    and engines."""
    return df.filter(_hash_unit(F.col(key_col), seed) < F.lit(float(fraction)))


def split_dataset(
    df: DataFrame,
    *,
    splits: dict[str, float],
    key_col: str,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic, disjoint train/val/test assignment: the portable
    hash unit u(key, seed) is bucketed by cumulative split fractions
    (``{"train": .875, "val": .0625, "test": .0625}``), so membership
    is a pure function of (key, seed) — stable across runs, engines,
    partitionings, and corpus growth (a doc never migrates between
    splits when new data arrives, the property random splits lack).
    Fractions must sum to 1. Pure column expression — no shuffle."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = _hash_unit(F.col(key_col), seed)
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = u < F.lit(cum)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str,
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic fractions (sampleBy's API surface with
    reproducible hash selection). Strata missing from ``fractions``
    get ``default_fraction``."""
    frac = F.lit(float(default_fraction))
    for stratum, p in sorted(fractions.items()):
        frac = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(float(p))
        ).otherwise(frac)
    return df.filter(_hash_unit(F.col(key_col), seed) < frac)


def sample_k_per_group(
    df: DataFrame,
    k: int,
    *,
    group_col: str,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic EXACT-k sample per group: rank each group's rows
    by the portable hash unit (tiebroken by ``key_col``) and keep the
    first ``k``. Groups smaller than k pass through whole.

    The fixed-count complement to :func:`stratified_hash_sample`'s
    fixed-FRACTION sampling — "give me 10k docs per language for the
    eval set" — with the same reproducibility contract: membership is
    a pure function of (key, seed), so reruns, repartitionings, and
    other engines select the identical rows, and a group's sample only
    changes where new keys hash below its current k-th value.

    Scale shape: ONE hash shuffle on ``group_col`` + per-group sort
    (the window carries no frame, so Spark keeps it a streaming rank).
    At extreme group cardinality skew (one group = the whole corpus)
    pre-filter with ``hash_sample`` at a fraction safely above
    k/|group| first, then exact-rank the survivors — two map-side-
    heavy passes instead of one giant sort.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    # rank on the RAW 60-bit integer hash, not the double hash unit:
    # dividing by 2^60 rounds 60 bits into a 53-bit mantissa, so two
    # distinct hashes can collide as doubles and flip the order an
    # integer-ranking oracle sees at the k boundary
    h = dedup.portable_hash60(
        F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .drop("__rn")
    )


def pps_sample(
    df: DataFrame,
    rate: float,
    *,
    weight_col: str,
    key_col: str,
    seed: int = 42,
    prob_col: str | None = None,
) -> DataFrame:
    """Deterministic probability-proportional-to-size (Poisson/PPS)
    sampling: keep a row iff ``u(key, seed) < min(1, rate * weight)``,
    so inclusion probability is proportional to ``weight_col`` (capped
    at 1). The standard curation move for token-weighted corpus
    sampling — "sample documents proportional to their token count" —
    and the PPS first phase of audit/estimation designs (Horvitz-
    Thompson: reweight kept rows by 1/p, exposed via ``prob_col``).

    Like :func:`hash_sample`, selection is a pure function of
    (key, seed): stable across runs, partitionings, engines, and
    corpus growth. Exactly portable to the DuckDB oracle because both
    engines evaluate the SAME IEEE ops (one multiply + compare on the
    60-bit hash unit) — no pow/ln calls whose last-ulp rounding could
    flip membership. Pure filter expression: no shuffle, no state, and
    the expected sampled token mass is rate * total_tokens for
    uncapped rows at any corpus size.
    """
    if rate < 0:
        raise ValueError("rate must be >= 0")
    u = _hash_unit(F.col(key_col), seed)
    p = F.least(F.lit(1.0), F.lit(float(rate)) * F.col(weight_col).cast("double"))
    out = df.filter(u < p)
    if prob_col:
        out = out.withColumn(prob_col, p)
    return out


def token_budget_sample(
    df: DataFrame,
    budget: int,
    *,
    group_col: str,
    token_col: str,
    order_col: str,
    id_col: str,
    descending: bool = True,
) -> DataFrame:
    """Per-group token budgeting: walk each group in (order_col, id_col)
    order and keep documents while the running token total stays within
    ``budget`` (the first document always fits). The classic curation
    move: 'take the best N tokens per source/language'.

    One shuffle (window partition by group); the running sum is a
    frame-bounded window aggregate, no driver involvement.
    """
    ord_cols = (
        [F.desc(order_col), F.asc(id_col)]
        if descending
        else [F.asc(order_col), F.asc(id_col)]
    )
    w = Window.partitionBy(group_col).orderBy(*ord_cols)
    cum = F.sum(F.col(token_col)).over(w)
    return (
        df.withColumn("__cum_tokens", cum)
        .filter(
            (F.col("__cum_tokens") <= F.lit(int(budget)))
            | (F.col("__cum_tokens") - F.col(token_col) == 0)
        )
        .drop("__cum_tokens")
    )


def temperature_mixture_sample(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    target_rows: int,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-based mixture sampling — the multilingual-LM
    convention (mT5/XLM-R style): stratum sampling mass ∝ n_i^alpha,
    so low-resource strata are UP-weighted relative to raw frequency
    (alpha=1 keeps natural proportions, alpha→0 approaches uniform).
    Keep-fraction per stratum: f_i = min(1, (n_i^alpha / Σ n_j^alpha)
    * target_rows / n_i); row selection is the portable hash unit, so
    the sample is a pure function of (key, seed) like every other
    sampler here.

    Cross-engine exactness: at the default alpha=0.5 the weights use
    sqrt (IEEE-correctly-rounded in both engines, unlike pow) and the
    normalizer folds through DECIMAL(38,12) (exact, order-independent)
    before one double division — a DuckDB oracle reproduces every
    fraction bit-for-bit. Other alphas stay deterministic per engine
    but lose the bit-exact oracle guarantee (libm pow differs).

    One O(strata) count collect; the filter is a map-side hash
    compare — no shuffle beyond the count.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if target_rows < 0:
        raise ValueError("target_rows must be >= 0")
    counts = {
        r[0]: int(r[1])
        for r in df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if None in counts:
        # a None key would poison sorted(fractions.items()) downstream
        # and `col == lit(None)` can never match a row anyway
        raise ValueError(
            f"temperature_mixture_sample: {strata_col!r} contains NULLs;"
            " fill or filter null strata before sampling"
        )
    if not counts:
        return df.filter(F.lit(False))
    if alpha == 0.5:
        raw = {s: math.sqrt(float(n)) for s, n in counts.items()}
    else:
        raw = {s: float(n) ** float(alpha) for s, n in counts.items()}
    # normalizer via 12-dp DECIMAL quanta: exact, order-independent sum
    # (mirrors SUM(CAST(x AS DECIMAL(38,12))) in the oracle)
    q = Decimal("0.000000000001")
    norm = float(
        sum(Decimal(v).quantize(q, rounding=ROUND_HALF_UP) for v in raw.values())
    )
    fractions = {
        s: min(1.0, raw[s] / norm * float(target_rows) / counts[s])
        for s in counts
    }
    return stratified_hash_sample(
        df, fractions, strata_col=strata_col, key_col=key_col, seed=seed
    )


def global_shuffle(
    df: DataFrame,
    key_col: str,
    *,
    seed: int = 42,
    out_col: str = "shuffle_idx",
) -> DataFrame:
    """Deterministic global training-order permutation: rank every row
    by the portable md5 fold of (seed, key) — the 'shuffle the corpus
    before sharding' step every training run needs, reproducible
    across engines, partitionings, and reruns (a pure function of the
    key set + seed, NOT of cluster layout like orderBy(rand())).

    The global rank comes from the distributed two-pass row_number
    (operators/rank.py): one range shuffle + O(partitions) offset
    collect — no Exchange SinglePartition, so at 100 TB the sort
    capacity scales with the cluster. Change ``seed`` per epoch for a
    fresh permutation.
    """
    from odibi_spark.operators.rank import global_ranks

    hashed = df.withColumn(
        "__sk",
        dedup.portable_hash60(
            F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string"))
        ),
    )
    out = global_ranks(
        hashed,
        order_by=["__sk", key_col],
        columns={out_col: {"function": "row_number"}},
    )
    return out.drop("__sk")


def winsorize(
    df: DataFrame,
    col: str,
    *,
    lower: float = 0.01,
    upper: float = 0.99,
    group_col: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Percentile-clamp outliers (winsorization) — the standard
    pre-step before any mean/variance-based quality score or length
    normalization: values below the ``lower`` or above the ``upper``
    interpolated percentile (optionally per ``group_col``) are clamped
    to the boundary, never dropped (dropping is a sampling decision;
    clamping is a robustness one).

    Plan: ONE aggregate computes both bounds (per group or globally
    joined back as a broadcast/literal), then a map-side
    least/greatest clamp — no sort of the data itself. Spark
    ``percentile`` == DuckDB ``quantile_cont`` (same interpolation),
    so clamped outputs hash-match cross-engine.
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError("need 0 <= lower < upper <= 1")
    out_col = out_col or col
    bounds_exprs = [
        F.expr(f"percentile({col}, {float(lower)})").alias("__lo"),
        F.expr(f"percentile({col}, {float(upper)})").alias("__hi"),
    ]
    src = F.col(col).cast("double")
    if group_col:
        # null-safe join key: groupBy emits a NULL-group bounds row, and
        # an equi-join would silently drop those source rows — eqNullSafe
        # keeps them clamped against their own group's bounds
        bounds = (
            df.groupBy(group_col)
            .agg(*bounds_exprs)
            .withColumnRenamed(group_col, "__gk")
        )
        joined = df.join(
            F.broadcast(bounds),
            F.col(group_col).eqNullSafe(F.col("__gk")),
        )
        clamped = F.least(F.greatest(src, F.col("__lo")), F.col("__hi"))
        return joined.withColumn(out_col, clamped).drop(
            "__gk", "__lo", "__hi"
        )
    row = df.agg(*bounds_exprs).first()
    if row is None or row["__lo"] is None or row["__hi"] is None:
        raise ValueError(
            f"winsorize: no non-null values in {col!r} to compute "
            "percentile bounds from (empty input?)"
        )
    lo, hi = float(row["__lo"]), float(row["__hi"])
    clamped = F.least(F.greatest(src, F.lit(lo)), F.lit(hi))
    return df.withColumn(out_col, clamped)


def mixture_fractions(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    *,
    strata_col: str,
    token_col: str,
) -> dict[str, float]:
    """Turn target mixture weights (e.g. {'web': .6, 'code': .4}) plus
    a global token budget into per-stratum sampling fractions, capped
    at 1.0, from one aggregate over the corpus. Driver-side output is
    O(strata) — feed it to stratified_hash_sample."""
    totals = {
        r[0]: r[1]
        for r in df.groupBy(strata_col)
        .agg(F.sum(F.col(token_col)).alias("toks"))
        .collect()
    }
    wsum = sum(weights.values()) or 1.0
    out: dict[str, float] = {}
    for stratum, w in weights.items():
        want = total_tokens * (w / wsum)
        have = totals.get(stratum, 0) or 0
        out[stratum] = min(1.0, want / have) if have else 0.0
    return out


def corpus_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    *,
    col: str,
    label_a: str = "a",
    label_b: str = "b",
) -> DataFrame:
    """Estimated distinct-set overlap between two corpora's values
    (typically shingles/grams or content fingerprints): one row with
    per-side distinct counts, the union, the inclusion-exclusion
    intersection, and the Jaccard estimate — the "how much does crawl
    snapshot N overlap snapshot N-1" question, answered WITHOUT
    materializing or joining either value set.

    Theta sketches (Apache DataSketches, built into Spark SQL as
    ``theta_sketch_agg``/``theta_sketch_estimate``) keep this ONE
    map-side pass over the tagged union of both inputs: three sketches
    (A, B, A∪B) accumulate in the same partial aggregate, so the plan
    is a scan + one 1-row final aggregate regardless of corpus size.
    Estimates carry the sketch's relative error (~1-2% at default
    precision); the intersection inherits inclusion-exclusion's
    variance amplification when the true overlap is small — a
    bounded-error pytest pins both. Estimate-based, so no cross-engine
    hash oracle exists by design (declared rows-only, like the HLL
    profile).
    """
    tagged = df_a.select(
        F.col(col).alias("__v"), F.lit("a").alias("__t")
    ).unionByName(
        df_b.select(F.col(col).alias("__v"), F.lit("b").alias("__t"))
    )
    est = tagged.agg(
        F.expr(
            "theta_sketch_estimate(theta_sketch_agg("
            "CASE WHEN __t = 'a' THEN __v END))"
        ).alias("distinct_a"),
        F.expr(
            "theta_sketch_estimate(theta_sketch_agg("
            "CASE WHEN __t = 'b' THEN __v END))"
        ).alias("distinct_b"),
        F.expr(
            "theta_sketch_estimate(theta_sketch_agg(__v))"
        ).alias("union_est"),
    )
    # clamp inclusion-exclusion into its feasible range (ADVICE r6):
    # sketch error can push A+B-U below 0 OR above min(A,B); either
    # would leak an impossible intersection / jaccard_est > 1
    inter = F.least(
        F.least(F.col("distinct_a"), F.col("distinct_b")).cast("double"),
        F.greatest(
            F.lit(0.0),
            (F.col("distinct_a") + F.col("distinct_b") - F.col("union_est"))
            .cast("double"),
        ),
    )
    return est.select(
        F.lit(label_a).alias("corpus_a"),
        F.lit(label_b).alias("corpus_b"),
        F.col("distinct_a").cast("double").alias("distinct_a"),
        F.col("distinct_b").cast("double").alias("distinct_b"),
        F.col("union_est").cast("double").alias("union_est"),
        inter.alias("intersection_est"),
        # union_est == 0 (both corpora empty) is a defined 0.0 overlap,
        # not a NULL from 0/0; the ratio itself is clamped at 1.0 —
        # sketch error can leave union_est BELOW min(A, B) (inter's
        # bound), and inter/union would then exceed 1 (review r7)
        F.when(
            F.col("union_est").cast("double") > 0,
            F.least(
                F.lit(1.0),
                F.round(inter / F.col("union_est").cast("double"), 6),
            ),
        )
        .otherwise(F.lit(0.0)).alias("jaccard_est"),
    )


def epoch_repeat_sample(
    df: DataFrame,
    *,
    factors: dict[str, float],
    strata_col: str,
    key_col: str,
    seed: int = 42,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Fractional per-stratum epoch repetition — the data-constrained
    mixing move (Muennighoff et al. 2023: repeat scarce high-quality
    sources ~2-4 epochs rather than diluting with junk): a stratum
    with factor 2.5 keeps every row twice (epochs 0 and 1) plus a
    deterministic half of the rows a third time (epoch 2).

    Each row is replicated ``ceil(factor)`` times map-side (one
    explode, no shuffle); the final fractional epoch keeps rows whose
    portable hash unit u(key:epoch, seed) < frac(factor), so the
    selection is a pure function of (key, epoch, seed) — stable across
    re-runs, partitionings, engines, and corpus growth, and each
    epoch's fractional subset is INDEPENDENT of the hash-sample used
    elsewhere (the epoch index is folded into the hash input). Strata
    missing from ``factors`` default to factor 1.0 (one epoch);
    factor 0 drops the stratum.

    Output keeps every input column plus ``epoch_col``; downstream
    shard writers treat (key, epoch) as the sample identity.
    """
    import math

    if any(f < 0 for f in factors.values()):
        raise ValueError("epoch factors must be >= 0")
    ceil_expr = F.lit(1)
    frac_expr = F.lit(0.0)
    whole_expr = F.lit(1)
    for name, f in factors.items():
        c = int(math.ceil(f)) if f > 0 else 0
        w = int(math.floor(f))
        cond = F.col(strata_col) == name
        ceil_expr = F.when(cond, F.lit(c)).otherwise(ceil_expr)
        whole_expr = F.when(cond, F.lit(w)).otherwise(whole_expr)
        frac_expr = F.when(cond, F.lit(float(f - w))).otherwise(frac_expr)
    out = df.withColumn(
        epoch_col,
        F.explode(
            F.when(ceil_expr > 0, F.sequence(F.lit(0), ceil_expr - 1))
            .otherwise(F.expr("array()").cast("array<int>"))
        ),
    )
    u = _hash_unit(
        F.concat_ws(
            "#", F.col(key_col).cast("string"), F.col(epoch_col).cast("string")
        ),
        seed,
    )
    return out.filter(
        (F.col(epoch_col) < whole_expr) | (u < frac_expr)
    )


QL_INLINE_LIMIT = 16384  # literal weight-array nodes before broadcast


def quality_classifier_weights(
    buckets: int, *, seed: int = 42
) -> tuple[list[float], float]:
    """Seeded 6-decimal weight vector + bias for the hashed linear
    quality classifier — deterministic stand-in for trained weights
    (tests / workloads); production passes weights exported from a
    fastText / logistic-regression fit. 6-dp values survive
    double<->DECIMAL(18,6) round-trips exactly in both engines."""
    import random as _random

    rng = _random.Random(seed)
    w = [rng.randrange(-1_000_000, 1_000_001) / 1e6 for _ in range(buckets)]
    bias = rng.randrange(-1_000_000, 1_000_001) / 1e6
    return w, bias


def _ql_features(
    df: DataFrame,
    text_col: str,
    *,
    buckets: int,
    bigrams: bool,
    lowercase: bool,
) -> DataFrame:
    """Shared hashed-feature staging for the quality classifier
    (inference AND training): word unigrams (+ bigrams) hashed into
    ``buckets`` via the portable 60-bit md5 fold, projected as the
    ``__ql_feats`` array column. Pure codegen expressions."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    staged = df.withColumn(
        "__ql_toks",
        F.filter(F.split(F.trim(t), " "), lambda x: x != ""),
    )
    h60 = (
        "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"
        f" % {buckets}"
    )
    uni = f"transform(__ql_toks, t -> {h60.format(x='t')})"
    big = (
        "transform(sequence(1, size(__ql_toks) - 1), i -> "
        + h60.format(
            x="concat(element_at(__ql_toks, i), ' ', "
            "element_at(__ql_toks, i + 1))"
        )
        + ")"
    )
    feats = (
        f"concat({uni}, CASE WHEN size(__ql_toks) >= 2 THEN {big} "
        f"ELSE CAST(array() AS array<bigint>) END)"
        if bigrams
        else uni
    )
    return staged.withColumn("__ql_feats", F.expr(feats)).drop(
        "__ql_toks"
    )


def _explode_feats(staged: DataFrame, *keep_cols: str) -> DataFrame:
    """Explode the ``__ql_feats`` array into ``__b`` WITHOUT the
    non-empty predicate a plain ``explode`` makes Catalyst infer:
    InferFiltersFromGenerate adds ``size(__ql_feats) > 0`` and
    predicate pushdown substitutes the WHOLE md5 feature expression
    into the scan filter — every row then hashes its features TWICE,
    the second time through non-CSE interpreted HOF lambdas (r12
    measured: the DSIR ratio pass went 9.4s -> sub-second at sf0.1).
    ``explode_outer`` infers nothing; the one NULL row a featureless
    doc produces is dropped by a cheap attribute filter ABOVE the
    Generate, which cannot be pushed below it."""
    return staged.select(
        *keep_cols, F.explode_outer("__ql_feats").alias("__b")
    ).filter(F.col("__b").isNotNull())


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    *,
    weights: list[float],
    bias: float = 0.0,
    id_col: str = "doc_id",
    bigrams: bool = True,
    lowercase: bool = True,
    out_prefix: str = "ql_",
    inline_limit: int | None = None,
) -> DataFrame:
    """fastText-style linear quality classifier inference (Joulin et
    al. 2016, "Bag of Tricks for Efficient Text Classification" — the
    industry-standard quality gate in GPT-3/LLaMA-family pipelines,
    complementing the rule-based Gopher flags and DSIR importance
    weights): hash word unigrams (+ bigrams) into ``len(weights)``
    buckets, average the bucket weights, add the bias, squash.

    Adds ``{prefix}n_features`` (long), ``{prefix}logit`` (double,
    bit-exact cross-engine: the weight sum folds through
    DECIMAL(38,6) — exact and order-independent — before ONE double
    division and ONE add), and ``{prefix}prob`` (sigmoid, rounded to
    6 dp — a 1-ulp exp() difference cannot move the 6th decimal of an
    irrational value, the ngram_lm_scores convention). Docs with no
    tokens score ``bias``.

    Plan-size gate (the random_projection convention): weight arrays
    up to ``QL_INLINE_LIMIT`` literals inline — the whole score is a
    zero-shuffle codegen map over the token array. Larger
    vocabularies switch to explode + broadcast-joined weight table +
    one groupBy(id) rebuild. Feature hashing is the portable 60-bit
    md5 fold, so a DuckDB oracle rebuilds every bucket id."""
    buckets = len(weights)
    if buckets < 1:
        raise ValueError("weights must be non-empty")
    staged = _ql_features(
        df, text_col, buckets=buckets, bigrams=bigrams,
        lowercase=lowercase,
    )
    n = F.size("__ql_feats").cast("long")
    limit = QL_INLINE_LIMIT if inline_limit is None else inline_limit
    if buckets <= limit:
        wlit = "array(" + ", ".join(
            f"CAST({w:.6f} AS DECIMAL(18,6))" for w in weights
        ) + ")"
        wsum = F.expr(
            f"aggregate(__ql_feats, CAST(0 AS DECIMAL(38,6)), "
            f"(acc, h) -> acc + element_at({wlit}, CAST(h + 1 AS INT)))"
        )
        scored = staged.withColumn("__ql_wsum", wsum)
    else:
        wdf = df.sparkSession.createDataFrame(
            [(i, f"{w:.6f}") for i, w in enumerate(weights)],
            "__b long, __w string",
        ).select("__b", F.col("__w").cast("decimal(18,6)").alias("__w"))
        ex = _explode_feats(staged, id_col)
        sums = (
            ex.join(F.broadcast(wdf), "__b")
            .groupBy(id_col)
            .agg(F.sum("__w").cast("decimal(38,6)").alias("__ql_wsum"))
        )
        scored = staged.join(sums, id_col, "left")
    logit = F.when(
        n > 0,
        F.lit(float(bias)) + F.col("__ql_wsum").cast("double") / n,
    ).otherwise(F.lit(float(bias)))
    out = (
        scored.withColumn(f"{out_prefix}n_features", n)
        .withColumn(f"{out_prefix}logit", logit)
        .withColumn(
            f"{out_prefix}prob",
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-F.col(f"{out_prefix}logit"))),
                6,
            ),
        )
        .drop("__ql_feats", "__ql_wsum")
    )
    return out


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — the semantics BOTH
    Spark's DIV and DuckDB's BIGINT ``//`` implement (Python's ``//``
    floors, which differs on negative gradients)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def quality_classifier_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    *,
    buckets: int = 512,
    epochs: int = 3,
    lr: tuple[int, int] = (1, 4),
    id_col: str = "doc_id",
    bigrams: bool = True,
    lowercase: bool = True,
) -> tuple[list[float], float]:
    """Train the hashed linear quality classifier by full-batch
    gradient descent (Joulin et al. 2016's model, standard logistic-
    regression updates) — the distributed twin of a fastText fit, no
    MLlib dependency. Returns ``(weights, bias)`` ready for
    :func:`quality_classifier`; the learned weights are a
    DETERMINISTIC function of the data (full-batch: no sampling, no
    partition-order dependence), and every epoch is replayable
    bit-exactly by a DuckDB oracle (``quality_classifier_train_docs``).

    The loop is the ``bpe_train`` pattern: the corpus is hashed to
    the per-doc feature-array frame ONCE (localCheckpoint); each
    epoch is (a) one zero-shuffle map computing every doc's margin
    from the current weights as a LITERAL array — no join, and (b)
    ONE map-side-combined groupBy(bucket) gradient aggregate whose
    O(buckets) result is collected. Driver state is O(buckets),
    corpus passes are O(epochs).

    Bit-exact protocol (the cross-engine determinism rules SURVEY
    §7.3 established): weights live in integer MICRO-units, so the
    per-doc weight sum is an exact integer fold; the margin and the
    Elliott fast sigmoid ``0.5 + z/(2*(1+|z|))`` (rational — no
    exp(), whose last-ulp differs between JVM and libm) are computed
    with one pinned IEEE operation order; each doc's residual is
    quantized by an unambiguous FLOOR to integer micro-units before
    the order-independent integer gradient sum; the weight update is
    integer arithmetic with truncating division. Two engines that
    agree on IEEE doubles therefore agree on every epoch's weights
    EXACTLY — compounding rounds cannot drift.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    lr_num, lr_den = lr
    if lr_num < 1 or lr_den < 1:
        raise ValueError("lr must be a positive rational (num, den)")
    # cheap pre-filter replaces the derived-column ``__n > 0`` filter:
    # tokens are non-empty iff the trimmed text is (split-on-space of
    # '' filters to []; NULL fails both forms). The old filter was
    # pushed below the scale_out Exchange, substituting the ENTIRE md5
    # featurization into the single-partition scan filter — the corpus
    # was featurized one-threaded, then again post-shuffle (the
    # _explode_feats lesson in filter-pushdown form).
    src = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    feats = (
        _ql_features(
            src, text_col, buckets=buckets, bigrams=bigrams,
            lowercase=lowercase,
        )
        .select(
            F.col(id_col),
            F.col(label_col).cast("int").alias("__y"),
            "__ql_feats",
            F.size("__ql_feats").cast("long").alias("__n"),
        )
        .localCheckpoint(eager=True)
    )
    n_docs = feats.count()
    if n_docs == 0:
        raise ValueError("no documents with features to train on")
    w_mu = [0] * buckets
    for _ in range(epochs):
        wlit = "array(" + ", ".join(
            f"{w}L" for w in w_mu
        ) + ")"
        # exact integer fold of the doc's micro-unit weight sum, then
        # margin + Elliott sigmoid + FLOOR-quantized residual — one
        # pinned IEEE operation order shared with the DuckDB replay
        q_expr = (
            "CAST(floor((((0.5 + (CAST(aggregate(__ql_feats, 0L, "
            f"(acc, h) -> acc + element_at({wlit}, CAST(h + 1 AS INT))"
            ") AS DOUBLE) / (1000000.0 * __n)) / (2.0 * (1.0 + "
            "abs(CAST(aggregate(__ql_feats, 0L, (acc, h) -> acc + "
            f"element_at({wlit}, CAST(h + 1 AS INT))) AS DOUBLE) "
            "/ (1000000.0 * __n))))) - CAST(__y AS DOUBLE)) "
            "* 1000000.0) / __n) AS BIGINT)"
        )
        grad = (
            feats.withColumn("__q", F.expr(q_expr))
            .select(F.explode("__ql_feats").alias("__b"), "__q")
            .groupBy("__b")
            .agg(F.sum("__q").alias("__g"))
            .collect()
        )
        for row in grad:
            w_mu[int(row["__b"])] -= _trunc_div(
                lr_num * int(row["__g"]), lr_den * n_docs
            )
    feats.unpersist()
    return [w / 1e6 for w in w_mu], 0.0


def dsir_log_ratios(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    *,
    buckets: int = 512,
    bigrams: bool = True,
    lowercase: bool = True,
    round_digits: int = 6,
) -> DataFrame:
    """Per-bucket DSIR log importance ratios (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling" — the
    paper's actual feature space: HASHED n-grams into a fixed bucket
    count, which bounds the model at O(buckets) where the token-level
    :func:`importance_resample` twin grows O(vocabulary)): hashed
    word unigram (+ bigram) features of a small TARGET corpus vs the
    big RAW corpus, add-one smoothed,

        log_ratio(b) = ln( (c_t(b) + 1) / (N_t + B)
                         / ((c_r(b) + 1) / (N_r + B)) )

    rounded to ``round_digits`` and returned as DECIMAL so per-doc
    sums fold exactly. Only buckets PRESENT in the raw corpus are
    emitted — a bucket no raw doc hits can never contribute to a raw
    doc's weight, so the frame stays O(min(buckets, distinct raw
    features)).

    Scale: two explode + map-side-combined groupBy(bucket) counts
    (the target side is small by design); totals are 1-row
    broadcasts; output is O(buckets) — the model, not the data.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")

    def bucket_counts(df: DataFrame) -> DataFrame:
        staged = _ql_features(
            df, text_col, buckets=buckets, bigrams=bigrams,
            lowercase=lowercase,
        )
        # r15 (guide §3.3/§5): each count table feeds both its totals
        # scalar and the ratio join — checkpoint the O(buckets) frame
        # so each corpus is featurized + aggregated once, not twice
        return (
            _explode_feats(staged)
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("__c"))
            .localCheckpoint(eager=True)
        )

    raw_c = bucket_counts(raw_df)
    tgt_c = bucket_counts(target_df).withColumnRenamed("__c", "__ct")
    raw_tot = raw_c.agg(F.sum("__c").alias("__nr"))
    tgt_tot = tgt_c.agg(F.sum("__ct").alias("__nt"))
    b = F.lit(float(buckets))
    p_t = (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1.0)) / (
        F.coalesce(F.col("__nt"), F.lit(0)) + b
    )
    p_r = (F.col("__c") + F.lit(1.0)) / (F.col("__nr") + b)
    return (
        raw_c.join(tgt_c, "__b", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            F.col("__b"),
            F.round(F.log(p_t / p_r), round_digits)
            .cast("decimal(18,6)")
            .alias("__lr"),
        )
    )


def dsir_importance(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    buckets: int = 512,
    bigrams: bool = True,
    lowercase: bool = True,
    round_digits: int = 6,
    inline_limit: int | None = None,
    out_col: str = "dsir_logw",
) -> DataFrame:
    """Per-document DSIR log importance weight: the sum of
    :func:`dsir_log_ratios` over the doc's hashed n-gram feature
    OCCURRENCES — high when the doc's feature distribution looks like
    the target corpus, low when it doesn't. Adds ``{out_col}``
    (double, exact: 6-dp DECIMAL ratios summed exactly, ONE cast) and
    ``{out_col}_n`` (feature count); docs with no tokens get NULL
    weight (flag, don't guess).

    Plan-size gate (the quality_classifier convention): up to
    ``QL_INLINE_LIMIT`` buckets the ratio table is collected
    (O(buckets) driver state, the trainer's budget) and inlined as a
    literal DECIMAL array — scoring is a zero-shuffle codegen fold
    over the feature array. Above the gate, scoring is explode +
    broadcast ratio join + one groupBy(id) — the corpus shuffles
    once on the id key, never on content.
    """
    ratios = dsir_log_ratios(
        raw_df, target_df, text_col, buckets=buckets, bigrams=bigrams,
        lowercase=lowercase, round_digits=round_digits,
    )
    staged = _ql_features(
        raw_df, text_col, buckets=buckets, bigrams=bigrams,
        lowercase=lowercase,
    )
    n = F.size("__ql_feats").cast("long")
    limit = QL_INLINE_LIMIT if inline_limit is None else inline_limit
    if buckets <= limit:
        by_bucket = {int(r["__b"]): r["__lr"] for r in ratios.collect()}
        rlit = "array(" + ", ".join(
            f"CAST({by_bucket.get(i, 0):.6f} AS DECIMAL(18,6))"
            for i in range(buckets)
        ) + ")"
        lsum = F.expr(
            f"aggregate(__ql_feats, CAST(0 AS DECIMAL(38,6)), "
            f"(acc, h) -> acc + element_at({rlit}, CAST(h + 1 AS INT)))"
        )
        scored = staged.withColumn("__lw", lsum)
    else:
        ex = _explode_feats(staged, id_col)
        sums = (
            ex.join(F.broadcast(ratios), "__b")
            .groupBy(id_col)
            .agg(F.sum("__lr").cast("decimal(38,6)").alias("__lw"))
        )
        scored = staged.join(sums, id_col, "left")
    return (
        scored.withColumn(f"{out_col}_n", n)
        .withColumn(
            out_col,
            F.when(n > 0, F.col("__lw").cast("double")),
        )
        .drop("__ql_feats", "__lw")
    )


def dsir_gumbel_topk(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "dsir_logw",
    seed: int = 42,
    key_col: str = "dsir_key",
) -> DataFrame:
    """Gumbel-top-k importance RESAMPLING over DSIR log weights (the
    exponential-clocks / Gumbel-max trick: adding i.i.d. Gumbel noise
    to log weights and taking the top k draws a weighted sample
    WITHOUT replacement): key = logw + Gumbel(0,1), noise derived
    deterministically from (id, seed) via the portable hash unit —
    a pure function of (data, seed), replayable by any engine.

    NULL-weight rows (no features) are excluded — an unweighted doc
    has no place in a weighted draw. The top-k is orderBy + limit
    (TakeOrderedAndProject: per-partition heaps, no global sort).

    Plan note: the NULL exclusion is NULLS-LAST ordering + a filter
    ABOVE the limit, not a pre-filter — a filter on the (derived)
    weight column would be substituted back through the projection by
    predicate pushdown, re-evaluating the whole importance fold per
    row (the r12 _explode_feats lesson; measured 6s of the sf0.1
    workload). NULLs sort behind every real key, so the k survivors
    are identical.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # strictly-interior uniform (h + 0.5) / 2^60: -ln(-ln u) stays
    # finite and both engines stay off the log(0) edge (the
    # importance_resample convention)
    u = (
        dedup.portable_hash60(
            F.concat_ws(
                ":", F.lit(str(seed)), F.col(id_col).cast("string")
            )
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(PH60_MAX)
    gumbel = F.round(-F.log(-F.log(u)), 6)
    return (
        df.withColumn(key_col, F.col(weight_col) + gumbel)
        .orderBy(F.desc_nulls_last(key_col), F.col(id_col))
        .limit(k)
        .filter(F.col(key_col).isNotNull())
    )
