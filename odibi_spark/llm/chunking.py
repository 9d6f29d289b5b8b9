"""Sequence preparation for LM training: document chunking into
overlapping windows and concat-and-split packing into fixed context
windows.

Both are pure column expressions / window arithmetic — whole-stage
codegen, one explode or one window shuffle, no Python in the row
path. At 100 TB chunking is map-side (explode only), and packing is
one total-order window over the chosen ordering key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 256,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into word-window chunks of ``chunk_words``
    with ``overlap`` words shared between consecutive chunks (stride =
    chunk_words - overlap). Output: (id_col, chunk_idx, chunk_text,
    chunk_n_words); a doc shorter than one chunk yields one chunk.

    Map-side only — the explode produces chunks colocated with their
    source partition; no shuffle at any corpus size.
    """
    if overlap >= chunk_words:
        raise ValueError("overlap must be smaller than chunk_words")
    stride = chunk_words - overlap
    w = f"split(trim({text_col}), ' ')"
    # number of chunks: 1 + ceil(max(size - chunk, 0) / stride)
    n_chunks = (
        f"1 + CAST(ceil(greatest(size({w}) - {chunk_words}, 0) / {stride}.0) AS INT)"
    )
    chunks = F.expr(
        f"transform(sequence(0, {n_chunks} - 1), "
        f"i -> concat_ws(' ', slice({w}, i * {stride} + 1, {chunk_words})))"
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .withColumn("chunk_n_words", F.size(F.split(F.col("chunk_text"), " ")))
    )


def _global_cum_before(
    df: DataFrame, *, token_col: str, order_col: str, id_col: str
) -> DataFrame:
    """Total-order exclusive cumsum of ``token_col`` in (order_col,
    id_col) order WITHOUT a single-partition global window.

    Two-pass distributed cumsum:

    1. range-repartition on the ordering key so partitions hold
       contiguous, totally-ordered key ranges, then pin the partition
       assignment with a lazy ``localCheckpoint`` (both passes must see
       identical ``spark_partition_id`` values);
    2. one O(partitions)-row aggregate collects per-partition token
       subtotals to the driver, which prefix-sums them into partition
       start offsets (a few KB for thousands of partitions);
    3. the offsets broadcast-join back and a PER-PARTITION window adds
       the within-partition cumsum — no ``Exchange SinglePartition``
       anywhere in the plan.

    Output column ``__cum_before`` is byte-identical to
    ``sum(token) OVER (ORDER BY order_col, id_col) - token`` when
    ``id_col`` is unique (which makes the order total). Costs one
    materialization of the input (the checkpoint), the price of
    running two jobs over the same partition assignment.
    """
    ranged = (
        df.repartitionByRange(F.asc(order_col), F.asc(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    subtotals = {
        r["__pid"]: r["__t"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(F.col(token_col)).alias("__t"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(subtotals):
        offsets.append((pid, acc))
        acc += int(subtotals[pid] or 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, schema="__pid INT, __poff BIGINT")
    w = Window.partitionBy("__pid").orderBy(F.asc(order_col), F.asc(id_col))
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(
            "__cum_before",
            F.col("__poff") + F.sum(F.col(token_col)).over(w) - F.col(token_col),
        )
        .drop("__pid", "__poff")
    )


#: Below this many input rows the ungrouped cumsum takes one ordinary
#: global window: a single WindowExec partition over ~2M narrow rows is
#: comfortably one task, and the two-pass path's fixed costs (range
#: sampling job, shuffle, checkpoint, O(partitions) collect, broadcast
#: join — measured ~4 s at sf0.1 vs 0.15 s for the window) dwarf it.
#: Above it the distributed two-pass prefix sum takes over. The gate's
#: df.count() is one column-free parquet scan ONLY when df is a (near-)
#: raw scan; with expensive upstream transforms it executes the full
#: lineage once before the real job — such callers should pass
#: small_input_rows=0 (skip the count, go straight to the two-pass
#: path) or persist() the input first (ADVICE r5).
SMALL_INPUT_ROWS = 2_000_000


def pack_sequences(
    df: DataFrame,
    context_len: int,
    *,
    token_col: str,
    order_col: str,
    id_col: str,
    group_col: str | None = None,
    small_input_rows: int = SMALL_INPUT_ROWS,
) -> DataFrame:
    """Concat-and-split packing (the standard LM pretraining layout):
    documents are laid out in (order_col, id_col) order and the token
    stream is cut every ``context_len`` tokens, so a document may
    straddle a boundary. Adds:

    - ``pack_id``: window index where the document starts
    - ``pack_offset``: token offset of the document inside that window
    - ``n_packs_spanned``: how many windows the document touches

    With ``group_col`` the cumsum is one window shuffle partitioned by
    group, and ``pack_id``/``pack_offset`` restart at 0 PER GROUP —
    ``pack_id`` is only unique within a group; downstream consumers
    must key by ``(group_col, pack_id)``. Without a group the cumsum
    is still fully distributed above ``small_input_rows``: a two-pass
    range-partitioned prefix sum (see ``_global_cum_before``) rather
    than a single-partition global window, so the ungrouped path
    survives 100-TB corpora too — while small inputs keep the plain
    window, which is strictly faster at that size (identical output
    either way). The gate runs ``df.count()`` — callers whose input
    has expensive upstream lineage should pass ``small_input_rows=0``
    or persist first (see SMALL_INPUT_ROWS note). Within-(group-)order
    must be total, which (order_col, id_col) guarantees when id_col is
    unique.
    """
    if group_col:
        w = Window.partitionBy(group_col).orderBy(
            F.asc(order_col), F.asc(id_col)
        )
        cum = df.withColumn(
            "__cum_before",
            F.sum(F.col(token_col)).over(w) - F.col(token_col),
        )
    elif small_input_rows > 0 and df.count() <= small_input_rows:
        w = Window.orderBy(F.asc(order_col), F.asc(id_col))
        cum = df.withColumn(
            "__cum_before",
            F.sum(F.col(token_col)).over(w) - F.col(token_col),
        )
    else:
        cum = _global_cum_before(
            df, token_col=token_col, order_col=order_col, id_col=id_col
        )
    ctx = int(context_len)
    # integer DIV, not double division: token cumsums at 100 TB exceed
    # double's exact-integer range long before they overflow a long
    return (
        cum.withColumn("pack_id", F.expr(f"__cum_before DIV {ctx}"))
        .withColumn("pack_offset", F.col("__cum_before") % F.lit(ctx))
        .withColumn(
            "n_packs_spanned",
            F.expr(f"(__cum_before + {token_col} - 1) DIV {ctx}")
            - F.expr(f"__cum_before DIV {ctx}")
            + F.lit(1),
        )
        .drop("__cum_before")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    token_col: str,
    tokens_per_shard: int,
    order_col: str,
    id_col: str,
    format: str = "json",
    mode: str = "overwrite",
    small_input_rows: int = SMALL_INPUT_ROWS,
) -> int:
    """Write the corpus as token-balanced shards: documents laid out in
    (order_col, id_col) order, cut into files of ~tokens_per_shard via
    the pack arithmetic, one output file per shard id (jsonl by
    default — the standard training-data layout). Returns the shard
    count.

    One aggregate for the total, one (distributed two-pass) cumsum for
    shard assignment, and a repartition keyed BY the shard id so each
    task writes exactly one shard file (partitionBy would shuffle to
    hash buckets and split shards across files), with a
    sortWithinPartitions so each shard file really is laid out in
    (order_col, id_col) order — repartition alone leaves shuffle
    arrival order, which is nondeterministic. Shard count is
    data-derived, not a hand-tuned partition number.
    """
    packed = pack_sequences(
        df, int(tokens_per_shard),
        token_col=token_col, order_col=order_col, id_col=id_col,
        small_input_rows=small_input_rows,
    ).withColumnRenamed("pack_id", "shard_id")
    # a doc belongs to the shard where it STARTS, so the shard count is
    # max assigned id + 1 (not ceil(total/tps), which counts windows the
    # tail merely spills into) — O(1) aggregate
    n_shards = int(
        packed.select(F.max("shard_id").alias("m")).collect()[0].m or 0
    ) + 1
    (
        packed.drop("pack_offset", "n_packs_spanned")
        .repartition(n_shards, "shard_id")
        .sortWithinPartitions(F.asc(order_col), F.asc(id_col))
        .write.mode(mode)
        .partitionBy("shard_id")
        .format(format)
        .save(path)
    )
    return n_shards
