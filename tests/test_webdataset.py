"""WebDataset tar shard sink (llm/webdataset.py).

Format contract: POSIX tars, members {key}.{ext}, same-key members
contiguous, shards {prefix}-{idx:06d}.tar, zeroed metadata for
byte-identical re-runs.
"""

import hashlib
import json
import tarfile
from pathlib import Path

import pytest
from pyspark.sql import Row, functions as F

from odibi_spark.llm.webdataset import write_webdataset_shards


def _df(spark, n=25):
    rows = [
        Row(
            doc_id=i,
            text=f"document number {i}",
            img=bytes([i % 256, 0x89, 0x50]) * 4,
            meta={"lang": "en" if i % 2 == 0 else "fr"},
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


MEMBERS = {"txt": "text", "png": "img", "json": "meta"}


def _read_shard(p):
    out = []
    with tarfile.open(p) as tar:
        for m in tar.getmembers():
            out.append((m.name, tar.extractfile(m).read(), m.mtime, m.uid))
    return out


class TestWebdatasetShards:
    def test_layout_grouping_and_content(self, spark, tmp_path):
        man = write_webdataset_shards(
            _df(spark), str(tmp_path), key_col="doc_id",
            members=MEMBERS, samples_per_shard=10,
        )
        assert man["n_shards"] == 3 and man["n_samples"] == 25
        files = sorted(f.name for f in tmp_path.glob("*.tar"))
        assert files == ["shard-000000.tar", "shard-000001.tar", "shard-000002.tar"]
        entries = _read_shard(tmp_path / "shard-000000.tar")
        # 10 samples x 3 members, same-key members contiguous, keys in order
        assert len(entries) == 30
        keys = [n.rsplit(".", 1)[0] for n, *_ in entries]
        assert keys == [str(k) for k in range(10) for _ in range(3)]
        by_name = {n: d for n, d, *_ in entries}
        assert by_name["3.txt"] == b"document number 3"
        assert by_name["3.png"] == bytes([3, 0x89, 0x50]) * 4
        assert json.loads(by_name["3.json"]) == {"lang": "fr"}
        # zeroed metadata
        assert all(mtime == 0 and uid == 0 for _, _, mtime, uid in entries)
        # manifest on disk matches the return
        assert json.loads((tmp_path / "_manifest.json").read_text()) == man

    def test_byte_identical_across_runs_and_partitionings(self, spark, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        write_webdataset_shards(
            _df(spark), str(a), key_col="doc_id",
            members=MEMBERS, samples_per_shard=7,
        )
        write_webdataset_shards(
            _df(spark).repartition(13), str(b), key_col="doc_id",
            members=MEMBERS, samples_per_shard=7,
        )
        ha = [hashlib.sha256(p.read_bytes()).hexdigest() for p in sorted(a.glob("*.tar"))]
        hb = [hashlib.sha256(p.read_bytes()).hexdigest() for p in sorted(b.glob("*.tar"))]
        assert ha == hb and len(ha) == 4

    def test_overwrite_clears_stale_shards(self, spark, tmp_path):
        write_webdataset_shards(
            _df(spark, 25), str(tmp_path), key_col="doc_id",
            members={"txt": "text"}, samples_per_shard=5,
        )
        assert len(list(tmp_path.glob("*.tar"))) == 5
        write_webdataset_shards(
            _df(spark, 6), str(tmp_path), key_col="doc_id",
            members={"txt": "text"}, samples_per_shard=5,
        )
        assert len(list(tmp_path.glob("*.tar"))) == 2  # stale 5 gone

    def test_error_mode_refuses_existing(self, spark, tmp_path):
        write_webdataset_shards(
            _df(spark, 3), str(tmp_path), key_col="doc_id",
            members={"txt": "text"}, samples_per_shard=5,
        )
        with pytest.raises(FileExistsError):
            write_webdataset_shards(
                _df(spark, 3), str(tmp_path), key_col="doc_id",
                members={"txt": "text"}, samples_per_shard=5, mode="error",
            )

    def test_empty_frame_writes_manifest_only(self, spark, tmp_path):
        man = write_webdataset_shards(
            _df(spark).filter("doc_id < 0"), str(tmp_path),
            key_col="doc_id", members={"txt": "text"},
        )
        assert man["n_shards"] == 0 and man["shards"] == []
        assert not list(tmp_path.glob("*.tar"))
        assert (tmp_path / "_manifest.json").exists()

    def test_custom_order_by(self, spark, tmp_path):
        df = _df(spark, 8).withColumn("neg", -F.col("doc_id"))
        write_webdataset_shards(
            df, str(tmp_path), key_col="doc_id",
            members={"txt": "text"}, samples_per_shard=8, order_by=["neg"],
        )
        entries = _read_shard(tmp_path / "shard-000000.tar")
        keys = [int(n.rsplit(".", 1)[0]) for n, *_ in entries]
        assert keys == list(range(7, -1, -1))

    def test_validation_errors(self, spark, tmp_path):
        with pytest.raises(ValueError, match="members"):
            write_webdataset_shards(
                _df(spark, 2), str(tmp_path), key_col="doc_id", members={},
            )
        with pytest.raises(ValueError, match="not in frame"):
            write_webdataset_shards(
                _df(spark, 2), str(tmp_path), key_col="doc_id",
                members={"txt": "nope"},
            )


class TestWriteSinkIntegration:
    def test_yaml_pipeline_writes_webdataset(self, spark, tmp_path):
        """The sink is reachable from the declarative surface: a node
        whose write.format is webdataset produces shards + manifest."""
        from odibi_spark.plans.config import load_pipeline_yaml
        from odibi_spark.plans.pipeline import Pipeline

        src = tmp_path / "in.parquet"
        _df(spark, 12).select("doc_id", "text").write.parquet(str(src))
        out = tmp_path / "wds"
        y = f"""
name: wds_demo
nodes:
  - name: shards
    read: {{format: parquet, path: {src}}}
    write:
      format: webdataset
      path: {out}
      options:
        key_col: doc_id
        members: {{txt: text}}
        samples_per_shard: 5
"""
        results = Pipeline(load_pipeline_yaml(y), spark).run()
        assert results["shards"].status == "success"
        assert len(list(out.glob("*.tar"))) == 3
        assert json.loads((out / "_manifest.json").read_text())["n_samples"] == 12

    def test_layout_directives_conflict(self, spark, tmp_path):
        from odibi_spark.io import write_sink

        with pytest.raises(ValueError, match="layout"):
            write_sink(
                _df(spark, 2), path=str(tmp_path), format="webdataset",
                partition_by=["doc_id"],
                options={"key_col": "doc_id", "members": {"txt": "text"}},
            )

    def test_unknown_option_rejected(self, spark, tmp_path):
        from odibi_spark.io import write_sink

        with pytest.raises(ValueError, match="unknown webdataset"):
            write_sink(
                _df(spark, 2), path=str(tmp_path), format="webdataset",
                options={"key_col": "doc_id", "members": {"txt": "text"},
                         "bogus": 1},
            )


class TestReadWebdataset:
    def test_roundtrip_through_sink_and_source(self, spark, tmp_path):
        from odibi_spark.llm.webdataset import read_webdataset

        write_webdataset_shards(
            _df(spark), str(tmp_path), key_col="doc_id",
            members=MEMBERS, samples_per_shard=10,
        )
        back = read_webdataset(spark, str(tmp_path))  # members from manifest
        assert back.count() == 25
        row = back.filter("key = '3'").first()
        assert bytes(row.txt) == b"document number 3"
        assert bytes(row.png) == bytes([3, 0x89, 0x50]) * 4
        assert json.loads(bytes(row.json)) == {"lang": "fr"}

    def test_read_via_declarative_format(self, spark, tmp_path):
        from odibi_spark.io import read_source

        write_webdataset_shards(
            _df(spark, 8), str(tmp_path), key_col="doc_id",
            members={"txt": "text"}, samples_per_shard=4,
        )
        df = read_source(
            spark, format="webdataset", path=str(tmp_path),
            options={"members": {"txt": "text_bytes"}},
        )
        assert sorted(df.columns) == ["key", "text_bytes"]
        got = {r.key: bytes(r.text_bytes).decode() for r in df.collect()}
        assert got["5"] == "document number 5" and len(got) == 8


class TestStreamingWebdataset:
    def test_per_epoch_shards_and_incremental_pickup(self, spark, tmp_path):
        import time

        from odibi_spark.streaming.core import streaming_webdataset_writer

        src = tmp_path / "src"
        src.mkdir()
        out, ckpt = str(tmp_path / "wds"), str(tmp_path / "ckpt")

        def put(name, ids):
            spark.createDataFrame(
                [(i, f"doc {i}") for i in ids], "doc_id long, text string"
            ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

        put("f1", range(0, 6))
        put("f2", range(6, 10))
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(src) + "/*")
        q = streaming_webdataset_writer(
            stream, path=out, checkpoint=ckpt, key_col="doc_id",
            members={"txt": "text"}, samples_per_shard=4,
        )
        q.awaitTermination(120)
        epochs = sorted(p.name for p in Path(out).glob("batch_id=*"))
        assert len(epochs) == 2  # one dir per micro-batch
        tars = sorted(Path(out).glob("batch_id=*/*.tar"))
        # 6 docs @4/shard = 2 tars + 4 docs = 1 tar
        assert len(tars) == 3
        names = []
        for t in tars:
            with tarfile.open(t) as tf:
                names += tf.getnames()
        assert sorted(names) == [f"{i}.txt" for i in range(10)]

        # restart with a NEW file: only the new epoch is added
        before = {p: p.stat().st_mtime for p in tars}
        put("f3", range(10, 12))
        q2 = streaming_webdataset_writer(
            spark.readStream.schema("doc_id long, text string").option(
                "maxFilesPerTrigger", "1"
            ).parquet(str(src) + "/*"),
            path=out, checkpoint=ckpt, key_col="doc_id",
            members={"txt": "text"}, samples_per_shard=4,
        )
        q2.awaitTermination(120)
        assert len(sorted(Path(out).glob("batch_id=*"))) == 3
        for p, m in before.items():
            assert p.stat().st_mtime == m  # old epochs untouched
