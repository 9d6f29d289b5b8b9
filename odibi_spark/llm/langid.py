"""fastText-style multiclass language-ID classifier (trainable).

The real CCNet pipeline gates on a fastText language classifier
(Wenzek et al. 2019 §3.1; Joulin et al. 2016's linear bag-of-features
model), not on stopword profiles — this module is that classifier as
pure Spark dataflow: hashed CHARACTER n-gram features (language
identity lives in character statistics, which also covers scripts
with no word boundaries, e.g. zh), one-vs-rest logistic regression
trained by full-batch gradient descent, and argmax inference.

Cross-engine bit-exactness (the SURVEY §7.3 protocol shared with
``curation.quality_classifier_train``): features are the portable
60-bit md5 fold mod ``buckets``; weights live in integer MICRO-units
so per-doc weight sums are exact integer folds; the margin uses the
rational Elliott sigmoid ``0.5 + z/(2*(1+|z|))`` (no exp(), whose
last ulp differs between JVM and libm); residuals are FLOOR-quantized
to micro-units before the order-independent integer gradient sum; the
weight update is truncating integer division. A DuckDB oracle
replays every epoch — and therefore every argmax prediction —
EXACTLY (workloads ``lang_classifier_train_docs`` /
``lang_classify_docs`` / ``ccnet_lid_pipeline_docs``).

Scale design (100 TB): the corpus is featurized ONCE per training run
(localCheckpoint); each epoch is one zero-shuffle margin map (weights
inlined as literal micro-unit arrays) plus ONE map-side-combined
groupBy(bucket) aggregate carrying all K class gradients as K sum
columns — driver state is O(K x buckets), corpus passes are
O(epochs). Inference is a zero-shuffle codegen map for inline-sized
models and an explode + broadcast-join + groupBy(id) rebuild above
``LID_INLINE_LIMIT`` (the ``quality_classifier`` plan-size gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# literal weight-array expression nodes tolerated in one plan before
# the broadcast-join path takes over (buckets x classes)
LID_INLINE_LIMIT = 16384

#: default char n-gram orders and per-doc character cap. fastText's
#: lid model uses char n-grams; the cap bounds per-doc feature cost
#: (and the oracle's) — 120 chars of running text identify a language
#: with plenty of margin.
LID_NGRAMS = (2, 3)
LID_MAX_CHARS = 120


def _lid_features(
    df: DataFrame,
    text_col: str,
    *,
    buckets: int,
    ns: tuple[int, ...] = LID_NGRAMS,
    max_chars: int = LID_MAX_CHARS,
    lowercase: bool = True,
    nonempty: bool = False,
) -> DataFrame:
    """Stage hashed char-n-gram features as the ``__lid_feats``
    array<bigint> column: for each order n, every n-char window of
    the (lowercased, trimmed, ``max_chars``-capped) text hashes
    through the portable 60-bit md5 fold mod ``buckets``. Pure
    codegen/HOF expressions; the capped text is projected into its
    own ``__lid_t`` column first so the lambdas never re-derive it
    (the word_shingles lesson). CASE guards keep short texts at
    array() — sequence(1, 0) DESCENDS in Spark.

    ``nonempty=True`` drops featureless rows with the CHEAP
    equivalent predicate ``length(__lid_t) >= min(ns)`` (feats are a
    concat of per-order CASE arrays, each non-empty iff the capped
    text has at least n chars, so the concat is non-empty iff length
    >= min(ns); NULL text fails both forms). A caller-side
    ``filter(size(__lid_feats) > 0)`` is pushed below the scale_out
    Exchange by Catalyst, substituting the ENTIRE md5 n-gram
    featurization into the single-partition scan filter — the whole
    corpus was featurized one-threaded, then again post-shuffle
    (r15 optimization: the guide §4.4 duplicated-evaluation trap in
    filter-pushdown form)."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if not ns or any(n < 1 for n in ns):
        raise ValueError("ns must be positive n-gram orders")
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    staged = df.withColumn("__lid_t", F.substring(t, 1, max_chars))
    if nonempty:
        staged = staged.filter(F.length("__lid_t") >= min(ns))
    parts = []
    for n in ns:
        parts.append(
            f"CASE WHEN length(__lid_t) >= {n} THEN "
            f"transform(sequence(1, length(__lid_t) - {n - 1}), i -> "
            f"CAST(conv(substring(md5(substring(__lid_t, i, {n})), "
            f"1, 15), 16, 10) AS BIGINT) % {buckets}) "
            f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
        )
    feats = (
        "concat(" + ", ".join(parts) + ")" if len(parts) > 1 else parts[0]
    )
    return staged.withColumn("__lid_feats", F.expr(feats)).drop("__lid_t")


def _lid_sig(m: str) -> str:
    """Elliott fast sigmoid of a margin SQL fragment — rational (no
    exp(), whose last ulp differs between JVM and libm), one pinned
    IEEE operation order shared with the DuckDB replay."""
    return f"(0.5 + ({m}) / (2.0 * (1.0 + abs({m}))))"


#: feature-instance gate for the single-task training kernel (guide
#: §4.2 — the BPE/PQ routing pattern): at or below this many exploded
#: (doc, bucket) feature rows the whole epoch loop runs in ONE
#: executor task over the coalesced feature table instead of paying
#: 2 joins + 2 shuffles + a K-column gradient collect PER EPOCH. The
#: training protocol makes the kernel provably bit-identical with no
#: float-summation-order hazard: per-doc weight sums and per-bucket
#: gradient sums are INTEGER folds (order-free), and the
#: margin->Elliott->softmax->floor-quantize chain is elementwise
#: scalar double math in the same pinned IEEE order. Above the gate
#: the distributed per-epoch aggregates are the right plan (100-TB
#: corpora) and are unchanged.
LID_KERNEL_MAX_FEATS = 4_000_000


def _use_lid_kernel(n_feats: int, engine: str) -> bool:
    if engine not in ("auto", "spark", "kernel"):
        raise ValueError(
            f"langid engine must be auto|spark|kernel, got {engine!r}"
        )
    if engine != "auto":
        return engine == "kernel"
    return n_feats <= LID_KERNEL_MAX_FEATS


def _lid_train_kernel(
    base: DataFrame,
    *,
    kk: int,
    buckets: int,
    epochs: int,
    lr_num: int,
    lr_den: int,
    n_docs: int,
) -> dict[int, list[int]]:
    """Run every training epoch in one executor task over the
    coalesced featurized table (narrow Coalesce — no shuffle);
    returns {class_index: micro-unit weight list}. numpy replays the
    exact epoch algebra: np.add.at int64 segment sums for the weight
    and gradient folds (integer addition commutes, so order is
    irrelevant), elementwise float64 for the pinned-order residual
    chain, and curation._trunc_div for the weight update."""
    import pandas as pd

    from odibi_spark.llm.curation import _trunc_div

    wcols = [f"__w{k}" for k in range(kk)]

    def run(batches):
        import numpy as np

        ys, ns, feats, counts = [], [], [], []
        for pdf in batches:
            for k in range(kk):
                ys.append(pdf[f"__y{k}"].to_numpy(np.int64))
            ns.append(pdf["__n"].to_numpy(np.int64))
            for f in pdf["__lid_feats"]:
                arr = np.asarray(f, dtype=np.int64)
                feats.append(arr)
                counts.append(len(arr))
        if not ns:
            return
        y = [
            np.concatenate(ys[k::kk]) for k in range(kk)
        ]  # per-class label vectors across batches
        n_arr = np.concatenate(ns)
        n_rows = len(n_arr)
        all_feats = (
            np.concatenate(feats) if feats else np.empty(0, np.int64)
        )
        doc_idx = np.repeat(
            np.arange(n_rows, dtype=np.int64),
            np.asarray(counts, dtype=np.int64),
        )
        nf = n_arr.astype(np.float64)
        w = np.zeros((kk, buckets), dtype=np.int64)
        for _ in range(epochs):
            ws = np.zeros((kk, n_rows), dtype=np.int64)
            for k in range(kk):
                np.add.at(ws[k], doc_idx, w[k][all_feats])
            # margin -> Elliott -> coupled softmax -> floor-quantized
            # residual: the same pinned scalar-double order as the SQL
            m = ws.astype(np.float64) / (1000000.0 * nf)
            s = 0.5 + m / (2.0 * (1.0 + np.abs(m)))
            ssum = s[0].copy()
            for k in range(1, kk):
                ssum = ssum + s[k]
            g = np.zeros((kk, buckets), dtype=np.int64)
            for k in range(kk):
                q = np.floor(
                    (((s[k] / ssum) - y[k].astype(np.float64))
                     * 1000000.0) / nf
                ).astype(np.int64)
                np.add.at(g[k], all_feats, q[doc_idx])
            for k in range(kk):
                gk = g[k]
                wk = w[k]
                for b in np.nonzero(gk)[0]:
                    wk[b] -= _trunc_div(
                        lr_num * int(gk[b]), lr_den * n_docs
                    )
        yield pd.DataFrame(
            {
                "__b": np.arange(buckets, dtype=np.int64),
                **{wcols[k]: w[k] for k in range(kk)},
            }
        )

    schema = ", ".join(["__b long"] + [f"{c} long" for c in wcols])
    rows = (
        base.select(
            *[f"__y{k}" for k in range(kk)], "__n", "__lid_feats"
        )
        .coalesce(1)
        .mapInPandas(run, schema)
        .collect()
    )
    out: dict[int, list[int]] = {k: [0] * buckets for k in range(kk)}
    for r in rows:
        b = int(r["__b"])
        for k in range(kk):
            out[k][b] = int(r[f"__w{k}"])
    return out


def lang_classifier_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    *,
    classes: list[str],
    buckets: int = 2048,
    epochs: int = 3,
    lr: tuple[int, int] = (1, 1),
    ns: tuple[int, ...] = LID_NGRAMS,
    max_chars: int = LID_MAX_CHARS,
    id_col: str = "doc_id",
    engine: str = "auto",
) -> dict[str, list[float]]:
    """Train the multiclass hashed linear language classifier by
    full-batch gradient descent with a COUPLED rational-softmax
    residual; returns ``{class: weights}`` ready for
    :func:`lang_classify`. Deterministic in the data (full batch, no
    sampling, order-independent integer gradient sums) and bit-exactly
    replayable per epoch by a DuckDB oracle — the
    ``curation.quality_classifier_train`` integer/Elliott protocol
    with the per-class probability normalized across classes:

        s_k = Elliott(margin_k)            (rational sigmoid)
        p_k = s_k / (s_1 + ... + s_K)      (pinned class-order sum)
        q_k = floor((p_k - y_k) * 1e6 / n) (micro-unit residual)

    so the K problems are trained against each other (the softmax
    coupling fastText uses — an independent one-vs-rest argmax lets
    the majority class's prior direction swamp minority logits).
    ``buckets`` must be generous for char n-grams: at 128 buckets
    every doc hits every bucket and the signal drowns in collisions
    (measured: majority-class collapse); 2048+ separates cleanly.

    Per epoch, three doc-or-bucket-keyed hash aggregates, no driver
    data motion beyond the O(K x buckets) gradient: (1) the exploded
    feature table joins the broadcast (bucket -> K micro-weights)
    table and rebuilds per-doc exact integer weight sums with one
    groupBy(id); (2) a docs-sized projection computes the K
    quantized residuals; (3) the feature table joins the residuals
    and one map-side-combined groupBy(bucket) reduces to K gradient
    sums. The corpus is featurized and exploded ONCE
    (localCheckpoint), not per epoch.
    """
    from odibi_spark.llm.curation import _trunc_div

    if not classes:
        raise ValueError("classes must be non-empty")
    if len(set(classes)) != len(classes):
        raise ValueError("classes must be distinct")
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    lr_num, lr_den = lr
    if lr_num < 1 or lr_den < 1:
        raise ValueError("lr must be a positive rational (num, den)")
    kk = len(classes)
    spark = df.sparkSession
    # featurize ONCE: one checkpoint holds ids, labels and the feature
    # arrays; meta/exf are cheap views of it (previously meta and exf
    # were independent checkpoints, each re-running the md5
    # featurization — and the caller-side size() filter pushed the
    # whole featurization below the scale_out Exchange on top)
    base = _lid_features(
        df, text_col, buckets=buckets, ns=ns, max_chars=max_chars,
        nonempty=True,
    ).select(
        F.col(id_col).alias("__id"),
        *[
            # NULL-safe y: a NULL label is y=0 for every class (the
            # DuckDB oracle's CASE WHEN ... ELSE 0), not NULL — a bare
            # equality would NULL the residual and silently drop the
            # doc from the gradient, diverging cross-engine.
            F.when(F.col(label_col) == c, 1).otherwise(0).alias(f"__y{k}")
            for k, c in enumerate(classes)
        ],
        F.size("__lid_feats").cast("long").alias("__n"),
        "__lid_feats",
    ).localCheckpoint(eager=True)
    meta = base.drop("__lid_feats")
    # one job yields BOTH the doc count and the feature-instance count
    # (the kernel gate's input) from the checkpointed base
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("__n").alias("f")
    ).collect()[0]
    n_docs = int(stats["n"])
    if n_docs == 0:
        base.unpersist()
        raise ValueError("no documents with features to train on")
    if _use_lid_kernel(int(stats["f"] or 0), engine):
        w_int = _lid_train_kernel(
            base, kk=kk, buckets=buckets, epochs=epochs,
            lr_num=lr_num, lr_den=lr_den, n_docs=n_docs,
        )
        base.unpersist()
        return {
            c: [w / 1e6 for w in w_int[k]]
            for k, c in enumerate(classes)
        }
    exf = base.select(
        "__id", F.explode("__lid_feats").alias("__b")
    ).localCheckpoint(eager=True)
    w_mu: dict[str, list[int]] = {c: [0] * buckets for c in classes}
    wcols = [f"__w{k}" for k in range(kk)]
    for _ in range(epochs):
        wdf = spark.createDataFrame(
            [
                (b, *[w_mu[c][b] for c in classes])
                for b in range(buckets)
            ],
            ", ".join(["__b long"] + [f"{w} long" for w in wcols]),
        )
        wsums = (
            exf.join(F.broadcast(wdf), "__b")
            .groupBy("__id")
            .agg(*[F.sum(w).alias(f"__ws{k}") for k, w in enumerate(wcols)])
        )
        # margins -> Elliott -> coupled softmax -> FLOOR-quantized
        # residual, all scalar double math over the exact integer
        # sums, in the one pinned order the DuckDB replay shares
        sigs = [
            _lid_sig(f"(CAST(__ws{k} AS DOUBLE) / (1000000.0 * __n))")
            for k in range(kk)
        ]
        ssum = "(" + " + ".join(sigs) + ")"
        q = meta.join(wsums, "__id").select(
            "__id",
            *[
                F.expr(
                    f"CAST(floor(((({sigs[k]} / {ssum}) - "
                    f"CAST(__y{k} AS DOUBLE)) * 1000000.0) / __n) "
                    "AS BIGINT)"
                ).alias(f"__q{k}")
                for k in range(kk)
            ],
        )
        grad = (
            exf.join(q, "__id")
            .groupBy("__b")
            .agg(*[F.sum(f"__q{k}").alias(f"__g{k}") for k in range(kk)])
            .collect()
        )
        for row in grad:
            b = int(row["__b"])
            for k, c in enumerate(classes):
                w_mu[c][b] -= _trunc_div(
                    lr_num * int(row[f"__g{k}"]), lr_den * n_docs
                )
    base.unpersist()
    exf.unpersist()
    return {c: [w / 1e6 for w in ws] for c, ws in w_mu.items()}


def lang_classify(
    df: DataFrame,
    text_col: str = "text",
    *,
    weights: dict[str, list[float]],
    id_col: str = "doc_id",
    ns: tuple[int, ...] = LID_NGRAMS,
    max_chars: int = LID_MAX_CHARS,
    out_col: str = "lang_pred",
    unknown: str = "und",
    n_col: str = "lid_n_features",
    inline_limit: int | None = None,
) -> DataFrame:
    """Argmax language prediction from per-class trained weights:
    each class scores ``sum(bucket weights) / n_features`` (exact
    DECIMAL fold, ONE double division — bit-identical cross-engine),
    the prediction is the class with the greatest logit, ties broken
    toward the lexicographically smallest class name (a deterministic
    CASE chain both engines evaluate on identical doubles). Docs with
    no features (empty text) predict ``unknown``.

    Adds ``out_col`` and ``n_col``; all staging columns are dropped.
    Plan-size gate: up to ``LID_INLINE_LIMIT`` literal weight nodes
    (buckets x classes) the score is a zero-shuffle codegen map;
    larger models explode features once against a broadcast
    (bucket -> K weights) table and rebuild per doc with one
    groupBy(id)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    classes = sorted(weights)
    buckets = len(weights[classes[0]])
    if buckets < 1 or any(len(weights[c]) != buckets for c in classes):
        raise ValueError("all classes need one equal-length weight vector")
    staged = _lid_features(
        df, text_col, buckets=buckets, ns=ns, max_chars=max_chars
    )
    n = F.size("__lid_feats").cast("long")
    limit = LID_INLINE_LIMIT if inline_limit is None else inline_limit
    lcols = [f"__lid_l{k}" for k in range(len(classes))]
    if buckets * len(classes) <= limit:
        for k, c in enumerate(classes):
            wlit = "array(" + ", ".join(
                f"CAST({w:.6f} AS DECIMAL(18,6))" for w in weights[c]
            ) + ")"
            staged = staged.withColumn(
                lcols[k],
                # the n = 0 branch never reaches a division (ANSI
                # mode raises on /0); its NULL logit is shadowed by
                # the unknown-label WHEN below
                F.when(
                    n > 0,
                    F.expr(
                        f"aggregate(__lid_feats, CAST(0 AS DECIMAL(38,6)), "
                        f"(acc, h) -> acc + element_at({wlit}, "
                        f"CAST(h + 1 AS INT)))"
                    ).cast("double") / n,
                ),
            )
    else:
        wdf = df.sparkSession.createDataFrame(
            [
                (b, *[f"{weights[c][b]:.6f}" for c in classes])
                for b in range(buckets)
            ],
            ["__b"] + [f"__w{k}" for k in range(len(classes))],
        ).select(
            "__b",
            *[
                F.col(f"__w{k}").cast("decimal(18,6)").alias(f"__w{k}")
                for k in range(len(classes))
            ],
        )
        ex = staged.select(
            id_col, F.explode_outer("__lid_feats").alias("__b")
        ).filter(F.col("__b").isNotNull())
        sums = (
            ex.join(F.broadcast(wdf), "__b")
            .groupBy(id_col)
            .agg(
                *[
                    F.sum(f"__w{k}")
                    .cast("decimal(38,6)")
                    .alias(f"__ws{k}")
                    for k in range(len(classes))
                ]
            )
        )
        staged = staged.join(sums, id_col, "left")
        for k in range(len(classes)):
            staged = staged.withColumn(
                lcols[k],
                F.when(n > 0, F.col(f"__ws{k}").cast("double") / n),
            )
    best = (
        F.greatest(*[F.col(c) for c in lcols])
        if len(lcols) > 1
        else F.col(lcols[0])
    )
    pred = F.when(n == 0, F.lit(unknown))
    for k, c in enumerate(classes):
        pred = pred.when(F.col(lcols[k]) == best, F.lit(c))
    out = staged.withColumn(n_col, n).withColumn(out_col, pred)
    drop = ["__lid_feats"] + lcols + [
        f"__ws{k}" for k in range(len(classes))
    ]
    return out.drop(*drop)
