"""Structured Streaming surface.

Reference parity (odibi/engine/spark_engine.py:1751-2049, config
odibi/config.py:4023-4161): streaming writes with output modes
append/update/complete, triggers once / availableNow / processingTime /
continuous, checkpoint location, await-termination; foreachBatch merge
(merge_transformer.py:455).

Beyond the reference (SURVEY §2.14 notes it has NO watermark/window
API): ``windowed_aggregate`` (tumbling/sliding windows with
watermarked late-data handling) and ``streaming_sessionize``
(``session_window``) — the streaming twin of the batch sessionize
operator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def start_stream_write(
    df: DataFrame,
    *,
    path: str | None = None,
    format: str = "parquet",
    output_mode: str = "append",
    checkpoint: str | None = None,
    trigger: dict | None = None,
    query_name: str | None = None,
    foreach_batch: Callable[[DataFrame, int], None] | None = None,
    await_termination: bool = False,
    options: dict[str, str] | None = None,
) -> StreamingQuery:
    """Declarative streaming write (reference :1751-2049).

    ``trigger``: {"once": True} | {"availableNow": True} |
    {"processingTime": "5 seconds"} | {"continuous": "1 second"}.
    """
    writer = df.writeStream.outputMode(output_mode)
    if query_name:
        writer = writer.queryName(query_name)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if trigger:
        writer = writer.trigger(**trigger)
    if foreach_batch is not None:
        query = writer.foreachBatch(foreach_batch).start()
    elif format == "memory":
        query = writer.format("memory").start()
    else:
        query = writer.format(format).start(path)
    if await_termination:
        query.awaitTermination()
    return query


def foreach_batch_merge(
    df: DataFrame,
    *,
    target_path: str,
    keys: list[str],
    checkpoint: str,
    strategy: str = "upsert",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Exactly-once-style merge sink: each micro-batch is MERGEd into
    the target (reference merge_transformer.py:455 ``merge_batch``).
    Idempotent per-batch merge + checkpointed offsets = effectively-once
    row semantics even under reprocessing."""
    from odibi_spark.patterns.merge import merge_apply

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        merge_apply(
            batch.sparkSession, batch, target_path=target_path, keys=keys,
            strategy=strategy,
        )

    return start_stream_write(
        df, checkpoint=checkpoint, foreach_batch=merge_batch,
        trigger=trigger or {"availableNow": True},
    )


def windowed_aggregate(
    stream: DataFrame,
    *,
    ts_col: str,
    window: str,
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: list[str] = (),
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Tumbling/sliding windowed aggregation with late-data watermark."""
    w = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    agg_exprs = [F.expr(e).alias(n) for n, e in (aggs or {"n": "count(*)"}).items()]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("window"), *group_cols)
        .agg(*agg_exprs)
    )


def streaming_sessionize(
    stream: DataFrame,
    *,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    group_cols: list[str] = (),
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Session-window aggregation — the streaming form of the batch
    ``sessionize`` operator (dynamic-gap session_window)."""
    agg_exprs = [F.expr(e).alias(n) for n, e in (aggs or {"n": "count(*)"}).items()]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), *group_cols)
        .agg(*agg_exprs)
    )
