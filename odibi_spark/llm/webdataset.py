"""WebDataset-style tar shard sink for multimodal training data.

Public format (github.com/webdataset/webdataset, also used by
img2dataset / NVIDIA DALI readers): a shard is a plain POSIX tar whose
members are named ``{key}.{ext}``; all members sharing a key form one
sample and must be contiguous; shards are named ``{prefix}-{idx:06d}.tar``
so readers can brace-expand them. Sequential tar reads are the point —
at training time a 100 TB corpus streams shard-per-worker with zero
random IO, which is why the layout matters more than the bytes.

This sink pairs with the multimodal binary columns (llm/multimodal.py):
binary columns write their raw bytes (e.g. ``jpg``/``wav`` members),
strings write UTF-8 (``txt``), anything else JSON (``json``).

Scale shape: the global sample order comes from the distributed
two-pass rank (operators/rank.py — no ``Exchange SinglePartition``),
shard assignment is integer arithmetic on the rank, and the frame is
hash-repartitioned BY shard id so one task writes each tar start to
finish. Nothing rides through the driver. Tar member metadata (mtime,
uid, gid) is zeroed, so re-running the same input produces
byte-identical shards — the reproducibility contract the rest of the
curation family keeps.

Filesystem note: executors open the shard files directly, so ``path``
must be writable from every executor as a plain filesystem path
(local, NFS, or a fuse-mounted object store). A Hadoop-FS-only target
would need the JVM filesystem API — out of scope here, documented.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, StringType


def _encode(value, dtype) -> bytes:
    if value is None:
        return b""
    if isinstance(dtype, BinaryType):
        return bytes(value)
    if isinstance(dtype, StringType):
        return str(value).encode("utf-8")
    return json.dumps(value, default=str, sort_keys=True).encode("utf-8")


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    members: dict[str, str],
    samples_per_shard: int = 1000,
    order_by: list[str] | None = None,
    prefix: str = "shard",
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as WebDataset tar shards; returns the manifest dict.

    ``members`` maps member extension -> source column, e.g.
    ``{"txt": "text", "png": "image_bytes", "json": "meta"}``.
    ``order_by`` fixes the global sample order (default: the key) —
    determinism across runs and partitionings comes from ranking on it.
    """
    if not members:
        raise ValueError("members mapping must not be empty")
    if samples_per_shard < 1:
        raise ValueError("samples_per_shard must be >= 1")
    missing = [c for c in {key_col, *members.values()} if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    if mode not in ("overwrite", "error"):
        raise ValueError(f"unsupported mode '{mode}'")

    os.makedirs(path, exist_ok=True)
    existing = sorted(
        f for f in os.listdir(path)
        if f.startswith(f"{prefix}-") and f.endswith(".tar")
    )
    if existing and mode == "error":
        raise FileExistsError(f"{len(existing)} shard files already in {path}")
    for f in existing:
        os.remove(os.path.join(path, f))

    from odibi_spark.operators.rank import global_ranks

    order_by = order_by or [key_col]
    ranked = global_ranks(
        df, order_by=order_by,
        columns={"__rn": {"function": "row_number"}},
    ).withColumn(
        "__shard",
        ((F.col("__rn") - 1) / F.lit(int(samples_per_shard))).cast("int"),
    )
    n_samples = df.count()
    n_shards = -(-n_samples // samples_per_shard)  # ceil; 0 when empty

    dtypes = {ext: df.schema[col].dataType for ext, col in members.items()}
    member_items = sorted(members.items())  # stable member order per sample
    spec = (path, prefix, key_col, member_items, dtypes)

    def _write_partition(rows):
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r["__shard"], []).append(r)
        out_dir, pfx, kcol, mitems, dts = spec
        for shard, srows in by_shard.items():
            srows.sort(key=lambda r: r["__rn"])
            final = os.path.join(out_dir, f"{pfx}-{shard:06d}.tar")
            tmp = final + f".tmp.{os.getpid()}"
            with tarfile.open(tmp, "w") as tar:
                for r in srows:
                    key = str(r[kcol])
                    for ext, col in mitems:
                        data = _encode(r[col], dts[ext])
                        info = tarfile.TarInfo(name=f"{key}.{ext}")
                        info.size = len(data)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        tar.addfile(info, io.BytesIO(data))
            os.replace(tmp, final)  # atomic: never a torn shard
        return iter(())

    if n_shards:
        (
            ranked.repartition(n_shards, "__shard")
            .rdd.mapPartitions(_write_partition)
            .count()  # force execution; the iterator is empty
        )

    manifest = {
        "format": "webdataset",
        "prefix": prefix,
        "n_shards": n_shards,
        "n_samples": n_samples,
        "samples_per_shard": samples_per_shard,
        "members": dict(member_items),
        "order_by": order_by,
        "shards": [f"{prefix}-{i:06d}.tar" for i in range(n_shards)],
    }
    tmp = os.path.join(path, f"._manifest.json.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(path, "_manifest.json"))
    return manifest


def read_webdataset(
    spark,
    path: str,
    *,
    members: dict[str, str] | None = None,
    key_type: str = "string",
) -> DataFrame:
    """Read WebDataset tar shards back as one row per sample.

    Columns: ``key`` plus one BINARY column per member extension —
    pass ``members`` (ext -> output column) to select/rename, or None
    to take the extensions recorded in ``_manifest.json`` (written by
    :func:`write_webdataset_shards`; required when members is None).
    Decode/parse downstream (utf-8 cast, from_json, the multimodal
    decoders) — this reader stays payload-agnostic on purpose.

    Scale shape: ``binaryFile`` hands each tar to one task whole (a
    shard is the unit of sequential IO by design), and the un-tar is a
    mapInPandas over the file column — samples never ride through the
    driver. Shards must fit executor memory (they are sized by
    ``samples_per_shard`` at write time; the usual 100-1000 MB shard
    is far under an executor's heap).
    """
    import pandas as pd

    if members is None:
        with open(os.path.join(path, "_manifest.json")) as fh:
            manifest = json.load(fh)
        members = {ext: ext for ext in manifest["members"]}
    exts = dict(sorted(members.items()))

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    ).select("path", "content")

    out_cols = ["key"] + list(exts.values())

    def _untar(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    samples: dict[str, dict] = {}
                    order: list[str] = []
                    for m in tar.getmembers():
                        key, _, ext = m.name.rpartition(".")
                        if ext not in exts:
                            continue
                        if key not in samples:
                            samples[key] = {}
                            order.append(key)
                        samples[key][exts[ext]] = tar.extractfile(m).read()
                    for key in order:
                        rows.append(
                            [key] + [samples[key].get(c) for c in exts.values()]
                        )
            yield pd.DataFrame(rows, columns=out_cols)

    schema = ", ".join(
        [f"key {key_type}"] + [f"`{c}` binary" for c in exts.values()]
    )
    return files.mapInPandas(_untar, schema=schema)
