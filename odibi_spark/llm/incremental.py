"""Incremental (HWM-driven) near-duplicate detection: the daily-run
shape of a 100-TB curation pipeline.

A full-corpus MinHash pass every day re-shuffles everything ever
ingested. The incremental form keeps an **append-only signature
store** (one row of ``num_perm`` longs per document ever seen — tiny
next to the corpus) and, per batch, only:

1. filters the source down to rows past the stored high-water mark
   (``state.hwm.incremental_filter`` — the reference's stateful
   incremental read, odibi/node.py:1075-1108);
2. computes signatures for the DELTA only (one shuffle over new docs);
3. LSH-bands the delta and equi-joins it against the banded store +
   itself — the join is keyed on (band, band_hash), so cost scales
   with delta size x bucket density, never with corpus size;
4. flags a new doc as duplicate when its estimated Jaccard (fraction
   of agreeing signature rows — the textbook MinHash estimator)
   against ANY earlier doc reaches the threshold. "Earlier" = smaller
   ``id_col``: ids are assumed monotone with arrival, which makes the
   two-batch replay provably equal to a one-shot pass (the declared
   ``dedup_incremental_docs`` workload hash-checks exactly that
   against a one-shot DuckDB oracle);
5. appends the delta's signatures to the store partitioned by
   batch id with dynamic partition overwrite, so a crashed-and-
   replayed batch overwrites its own partition instead of duplicating
   signatures (exactly-once store maintenance, at-least-once safe);
6. commits the new HWM only AFTER the store append succeeds
   (reference pipeline.py:1537-1543 commit discipline).

Duplicates-of-duplicates: dropped docs still append their signatures,
so a later doc matching only a dropped one is still caught — the drop
rule is "similar to any EARLIER doc", not "to any kept doc", which is
what makes replay order-insensitive.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.llm import dedup
from odibi_spark.state.hwm import StateBackend, capture_hwm, incremental_filter


class SignatureStore:
    """Append-only MinHash signature table on parquet (a Delta table
    with the same layout on a real cluster). One partition directory
    per ingestion batch — replaying a batch dynamically overwrites its
    own partition, so the store never double-counts a crashed run."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        return self.spark.read.parquet(self.path).drop("batch_id")

    def append(self, signatures: DataFrame, batch_id: str) -> None:
        (
            signatures.withColumn("batch_id", F.lit(str(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.path)
        )


def flag_incremental_dups(
    new_docs: DataFrame,
    store: SignatureStore,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hasher: str = "xxhash64",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Check a delta batch against the signature store and itself.

    Returns ``(flagged, new_signatures)``: ``flagged`` is ``new_docs``
    plus an ``is_dup`` column (true when the estimated Jaccard against
    some earlier doc >= threshold); ``new_signatures`` is the delta's
    signature rows for the caller to ``store.append`` after its
    downstream write succeeds.

    Scale shape: the store side never recomputes signatures (read back
    as plain columns), the delta side is one explode+groupBy, and the
    candidate join is an equi-join on band keys in which the delta is
    the small side — broadcastable when the daily batch is small.
    """
    rows_per_band = num_perm // bands
    sigs_new = dedup.minhash_signatures(
        new_docs, id_col, text_col, n=n, num_perm=num_perm,
        hasher=hasher, seed=seed,
    ).localCheckpoint(eager=True)

    stored = store.read()
    all_sigs = sigs_new if stored is None else stored.unionByName(sigs_new)
    banded_all = dedup.band_keys(all_sigs, bands, rows_per_band, hasher)
    banded_new = dedup.band_keys(sigs_new, bands, rows_per_band, hasher)

    # candidate (a=earlier, b=new) pairs; the new side is the probe
    cands = (
        banded_all.alias("a")
        .join(banded_new.alias("b"), ["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # MinHash Jaccard estimate: fraction of agreeing signature rows
    agree = sum(
        F.when(F.col(f"sa.h{i}") == F.col(f"sb.h{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    # eagerly pin the (tiny) dup id set, NOT the wide flagged frame:
    # everything upstream of here re-reads the store parquet on
    # re-execution, which after store.append would double-count the
    # batch's own signatures — and checkpointing O(dups) ids is free
    # next to materializing the delta's document bodies
    dups = (
        cands.join(all_sigs.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(sigs_new.alias("sb"), F.col("id_b") == F.col("sb.id"))
        .filter(agree / F.lit(float(num_perm)) >= F.lit(threshold))
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .localCheckpoint(eager=True)
    )
    flagged = new_docs.join(
        F.broadcast(dups.withColumn("is_dup", F.lit(True))), id_col, "left"
    ).withColumn("is_dup", F.coalesce("is_dup", F.lit(False)))
    return flagged, sigs_new


def run_incremental_dedup(
    source: DataFrame,
    store: SignatureStore,
    state: StateBackend,
    *,
    state_key: str = "dedup_hwm",
    batch_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hasher: str = "xxhash64",
    seed: int = 42,
) -> DataFrame:
    """One incremental run: HWM filter -> delta dedup -> store append
    -> HWM commit. Returns the flagged delta; the dup id set inside it
    is eagerly pinned (flag_incremental_dups checkpoints it), so the
    caller's downstream write sees a stable result without this
    function materializing the delta's document bodies.

    Crash between store append and HWM commit replays the batch:
    the dynamic partition overwrite makes the append idempotent and
    the flags are recomputed identically, so at-least-once execution
    converges to the exactly-once result.
    """
    delta = incremental_filter(
        source, column=id_col, state=state, state_key=state_key,
        target_exists=store.exists(),
    )
    flagged, sigs_new = flag_incremental_dups(
        delta, store, id_col=id_col, text_col=text_col, n=n,
        num_perm=num_perm, bands=bands, threshold=threshold,
        hasher=hasher, seed=seed,
    )
    # the HWM must come from the DELTA, not the signature frame:
    # minhash_signatures drops docs shorter than n words, so a
    # signature-derived mark can regress below the delta's true max id
    # and re-admit (or permanently reprocess) the short docs
    new_hwm = capture_hwm(delta, id_col)
    store.append(sigs_new, batch_id)
    if new_hwm is not None:
        state.set(state_key, new_hwm)
    return flagged
