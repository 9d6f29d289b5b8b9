"""Simulation source + multimodal plumbing tests."""

from pyspark.sql import Row, functions as F

from odibi_spark.llm.multimodal import (
    attach_media_metadata,
    extract_image_features,
    sample_video_frames,
)
from odibi_spark.sources.simulation import generate


class TestSimulation:
    SPEC = {
        "id": {"type": "sequential", "start": 100},
        "temp": {"type": "range", "min": 20.0, "max": 30.0},
        "status": {"type": "categorical", "values": ["ok", "warn", "fail"],
                   "weights": [8, 1, 1]},
        "active": {"type": "boolean", "p_true": 0.9},
        "label": {"type": "constant", "value": "sensor-{entity_id}"},
        "temp_f": {"type": "derived", "expr": "temp * 9 / 5 + 32"},
    }

    def test_deterministic_with_seed(self, spark):
        a = generate(spark, rows=50, columns=self.SPEC, seed=7).collect()
        b = generate(spark, rows=50, columns=self.SPEC, seed=7).collect()
        assert a == b
        c = generate(spark, rows=50, columns=self.SPEC, seed=8).collect()
        assert a != c

    def test_generator_semantics(self, spark):
        df = generate(spark, rows=200, columns=self.SPEC, seed=42)
        rows = df.collect()
        assert [r.id for r in rows[:3]] == [100, 101, 102]
        assert all(20.0 <= r.temp <= 30.0 for r in rows)
        assert {r.status for r in rows} <= {"ok", "warn", "fail"}
        assert rows[0].label == "sensor-0"
        assert rows[0].temp_f == rows[0].temp * 9 / 5 + 32

    def test_random_walk_bounds(self, spark):
        df = generate(
            spark, rows=500,
            columns={"x": {"type": "random_walk", "start": 50.0, "min": 0.0,
                           "max": 100.0, "volatility": 5.0, "mean_reversion": 0.05}},
            seed=1,
        )
        stats = df.agg(F.min("x"), F.max("x")).collect()[0]
        assert stats[0] >= 0.0 and stats[1] <= 100.0

    def test_distributed_generation(self, spark):
        df = generate(
            spark, rows=1000,
            columns={
                "id2": {"type": "sequential"},
                "u": {"type": "range", "min": 0.0, "max": 1.0},
                "cat": {"type": "categorical", "values": ["a", "b"]},
                "twice": {"type": "derived", "expr": "u * 2"},
            },
            seed=42, distributed=True,
        )
        assert df.count() == 1000
        assert df.filter("u < 0 OR u >= 1").count() == 0
        assert df.select("cat").distinct().count() == 2


class TestMultimodal:
    def test_metadata_and_features(self, spark):
        df = spark.createDataFrame(
            [Row(media_id=1, payload=b"AAAA"), Row(media_id=2, payload=b"BBBB" * 100)]
        )
        meta = attach_media_metadata(df, "payload", "image")
        m = {r.media_id: r for r in meta.collect()}
        assert m[1].payload_bytes == 4 and m[2].payload_bytes == 400
        assert m[1].media_type == "image"

        feats = extract_image_features(df, "payload", "media_id")
        got = {r.media_id: r for r in feats.collect()}
        assert set(feats.columns) == {"media_id", "width", "height", "channels", "content_hash"}
        assert 64 <= got[1].width < 256
        # deterministic decode stub
        again = {r.media_id: r for r in extract_image_features(df, "payload", "media_id").collect()}
        assert got[1].content_hash == again[1].content_hash

    def test_video_frame_sampling(self, spark):
        df = spark.createDataFrame([Row(media_id=1, duration_s=5.0)])
        frames = sample_video_frames(df, fps=2.0)
        rows = frames.collect()
        assert len(rows) == 10
        assert rows[0].frame_ts_s == 0.0 and rows[-1].frame_ts_s == 4.5


class TestAudio:
    def test_extract_audio_features(self, spark):
        from odibi_spark.llm.multimodal import (
            extract_audio_features,
            fake_audio_decoder,
        )

        rows = [(1, b"\x00\x01" * 50), (2, b"\x7f\x80\x81" * 40)]
        df = spark.createDataFrame(rows, ["media_id", "payload"])
        got = {r.media_id: r for r in extract_audio_features(df).collect()}
        # matches the driver-side decoder exactly (same bytes in, same out)
        exp1 = fake_audio_decoder(rows[0][1])
        assert got[1].sample_rate == exp1["sample_rate"]
        assert got[1].n_samples == exp1["n_samples"] == 50
        assert got[1].rms == exp1["rms"]
        assert set(got[1].asDict()) == {
            "media_id", "sample_rate", "duration_s", "n_samples", "rms", "content_hash",
        }

    def test_register_decoder_override(self, spark):
        from odibi_spark.llm import multimodal

        orig = multimodal._DECODERS["audio"]
        try:
            multimodal.register_decoder(
                "audio",
                lambda p: {
                    "sample_rate": 1, "duration_s": 0.0, "n_samples": 0,
                    "rms": 0.0, "content_hash": "x",
                },
            )
            df = spark.createDataFrame([(1, b"abc")], ["media_id", "payload"])
            r = multimodal.extract_audio_features(df).collect()[0]
            assert r.sample_rate == 1 and r.content_hash == "x"
        finally:
            multimodal.register_decoder("audio", orig)
