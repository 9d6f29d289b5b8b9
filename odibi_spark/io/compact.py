"""Small-file compaction for plain-parquet tables.

The reference gets this from Delta's ``OPTIMIZE`` / ``auto_optimize``
(spark_engine.py:2446-2636, config auto_optimize); on open formats the
same operational problem — streaming/incremental writers leaving
thousands of KB-sized files that crush scan planning and NameNode/
object-store listing — needs an explicit bin-packing rewrite. This is
that tool: size-driven (target bytes per output file, not a guessed
partition count), layout-preserving optional sort, and a
write-then-swap protocol.

NOT transactional: between the swap's delete and rename a concurrent
reader can see a partial table (Delta's OPTIMIZE exists precisely to
make this atomic). Run it in a maintenance window, or on Delta use
``delta_ops.maintain`` instead.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) of every data file directly under ``path``
    (Hadoop FS API — works on local paths, HDFS, and object stores)."""
    fs, jpath, _ = _fs_for(spark, path)
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith((".", "_")):
            out.append((st.getPath().toString(), int(st.getLen())))
    return out


def compact_small_files(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    format: str = "parquet",
    sort_within_by: list[str] | None = None,
    min_files_to_compact: int = 2,
) -> dict:
    """Bin-pack a directory of small data files into
    ``ceil(total_bytes / target_file_bytes)`` files.

    Size-driven like Delta OPTIMIZE (files sized for scan efficiency,
    not a hand-tuned partition count); ``sort_within_by`` optionally
    re-establishes a clustering order inside each output file so
    row-group min/max pruning survives the rewrite. No-op (returns
    stats, touches nothing) when the directory already has fewer
    output-sized files than ``min_files_to_compact``.

    Protocol: write compacted files to ``<path>__compact_tmp``, delete
    the old data files, move the new ones in, remove the temp dir. See
    the module docstring for the (non-)atomicity contract.
    """
    files = list_data_files(spark, path)
    total = sum(sz for _, sz in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    stats = {
        "files_before": len(files),
        "bytes_total": total,
        "target_file_bytes": int(target_file_bytes),
        "files_after": len(files),
        "compacted": False,
    }
    if len(files) < max(min_files_to_compact, n_out + 1):
        return stats

    df = spark.read.format(format).load(path)
    df = df.repartition(n_out)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + "__compact_tmp"
    df.write.mode("overwrite").format(format).save(tmp)

    fs, jpath, jvm = _fs_for(spark, path)
    for f, _ in files:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
    moved = 0
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(tmp)):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith((".", "_")):
            fs.rename(
                st.getPath(), jvm.org.apache.hadoop.fs.Path(path, name)
            )
            moved += 1
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    stats.update({"files_after": moved, "compacted": True})
    return stats
