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


class TestRealDecoders:
    """Golden tests on REAL container bytes (VERDICT r6 task 9): the
    stdlib WAV parser and the PNG/BMP header parser, plus the
    magic-byte dispatch falling back to the deterministic fakes."""

    def test_wav_decoder_exact_features(self):
        import math

        from odibi_spark.llm import multimodal

        samples = [0, 1000, -1000, 500, -500, 32767, -32768, 0]
        payload = multimodal.synth_wav_pcm16(samples, sample_rate=8000)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        r = multimodal.wav_audio_decoder(payload)
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == 8
        assert r["duration_s"] == 8 / 8000
        acc = sum(s * s for s in samples)
        assert r["rms"] == math.sqrt(acc / 8)
        # dispatcher routes RIFF/WAVE to the real parser
        assert multimodal.default_audio_decoder(payload) == r

    def test_wav_decoder_8bit_and_stereo(self):
        import io
        import math
        import wave

        from odibi_spark.llm import multimodal

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(1)  # 8-bit unsigned PCM
            w.setframerate(22050)
            w.writeframes(bytes([128, 128, 0, 255, 200, 60]))  # 3 frames
        r = multimodal.wav_audio_decoder(buf.getvalue())
        assert r["sample_rate"] == 22050
        assert r["n_samples"] == 6  # frames x channels
        assert r["duration_s"] == 3 / 22050
        centered = [0, 0, -128, 127, 72, -68]
        assert r["rms"] == math.sqrt(sum(s * s for s in centered) / 6)

    def test_audio_fallback_on_non_wav(self):
        from odibi_spark.llm import multimodal

        blob = b"definitely not a wav file"
        assert (
            multimodal.default_audio_decoder(blob)
            == multimodal.fake_audio_decoder(blob)
        )

    def test_png_header_parse(self):
        import struct

        from odibi_spark.llm import multimodal

        # minimal real PNG prefix: signature + IHDR (640x480 RGBA)
        ihdr = struct.pack(">IIBBBBB", 640, 480, 8, 6, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\0\0\0\0"
        )
        r = multimodal.png_bmp_image_decoder(payload)
        assert (r["width"], r["height"], r["channels"]) == (640, 480, 4)
        assert multimodal.default_image_decoder(payload) == r

    def test_bmp_header_parse_including_topdown(self):
        import struct

        from odibi_spark.llm import multimodal

        def bmp(width, height, bpp):
            header = b"BM" + struct.pack("<IHHI", 122, 0, 0, 122)
            info = struct.pack("<IiiHH", 40, width, height, 1, bpp)
            return header + info + b"\0" * 40

        r = multimodal.png_bmp_image_decoder(bmp(320, 200, 24))
        assert (r["width"], r["height"], r["channels"]) == (320, 200, 3)
        # negative height = top-down row order, dimensions still positive
        r2 = multimodal.png_bmp_image_decoder(bmp(64, -32, 32))
        assert (r2["width"], r2["height"], r2["channels"]) == (64, 32, 4)

    def test_image_fallback_on_unknown_magic(self):
        from odibi_spark.llm import multimodal

        blob = b"just some text bytes"
        assert (
            multimodal.default_image_decoder(blob)
            == multimodal.fake_image_decoder(blob)
        )

    def test_real_wav_through_spark_plumbing(self, spark):
        """End-to-end: real WAV payloads through the Arrow-batched
        mapInPandas extractor — the de-stubbed decode path exercised
        against real bytes inside Spark, not just unit-called."""
        import math

        from odibi_spark.llm import multimodal

        rows = [
            (i, multimodal.synth_wav_pcm16([j * 100 - 300 for j in range(7)]))
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, ["media_id", "payload"])
        out = {
            r.media_id: r
            for r in multimodal.extract_audio_features(df).collect()
        }
        assert len(out) == 20
        expect_rms = math.sqrt(
            sum((j * 100 - 300) ** 2 for j in range(7)) / 7
        )
        for r in out.values():
            assert r.sample_rate == 16000 and r.n_samples == 7
            assert r.rms == expect_rms

    def test_audio_fallback_on_undecodable_riff(self):
        """Review r7: a RIFF/WAVE payload the stdlib parser cannot
        handle (24-bit PCM, truncated header) must fall back to the
        fake decoder, not kill the whole mapInPandas job."""
        import struct

        from odibi_spark.llm import multimodal

        # 24-bit PCM WAV: valid container, unsupported sample width
        def wav24(n_frames=4, sr=8000):
            data = b"\x00\x01\x02" * n_frames
            fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 3, 3, 24)
            chunks = (
                b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
            )
            return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

        p24 = wav24()
        r = multimodal.default_audio_decoder(p24)
        assert r == multimodal.fake_audio_decoder(p24)
        # truncated/garbage RIFF
        junk = b"RIFF\x10\x00\x00\x00WAVEgarbage"
        assert (
            multimodal.default_audio_decoder(junk)
            == multimodal.fake_audio_decoder(junk)
        )

    def test_bmp_core_header_and_unknown_size(self):
        """Review r7: OS/2 BITMAPCOREHEADER (12-byte, u16 dims) parses
        correctly instead of fusing fields; unknown header sizes fall
        back to the fake."""
        import struct

        from odibi_spark.llm import multimodal

        core = (
            b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
            + struct.pack("<IHHHH", 12, 320, 200, 1, 24)
        )
        r = multimodal.png_bmp_image_decoder(core)
        assert (r["width"], r["height"], r["channels"]) == (320, 200, 3)

        weird = (
            b"BM" + struct.pack("<IHHI", 122, 0, 0, 122)
            + struct.pack("<IiiHH", 99, 64, 64, 1, 24) + b"\0" * 40
        )
        assert (
            multimodal.default_image_decoder(weird)
            == multimodal.fake_image_decoder(weird)
        )


class TestVideoDecoders:
    """Real GIF/AVI structure walks (VERDICT r7 task 5 — the last
    fake-decoder media type de-stubbed): golden bytes, synth round
    trips, truncation handling, and Spark plumbing."""

    def test_golden_1x1_gif(self):
        from odibi_spark.llm import multimodal

        # the canonical minimal GIF89a: 1x1, one frame, 2-color table
        golden = (
            b"GIF89a" + b"\x01\x00\x01\x00" + b"\x80\x00\x00"
            + b"\x00\x00\x00\xff\xff\xff"
            + b"\x21\xf9\x04\x01\x00\x00\x00\x00"
            + b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00"
            + b"\x02\x02\x44\x01\x00" + b"\x3b"
        )
        got = multimodal.gif_video_decoder(golden)
        assert (got["width"], got["height"], got["n_frames"]) == (1, 1, 1)

    def test_gif_synth_round_trip_multiframe(self):
        from odibi_spark.llm import multimodal

        payload = multimodal.synth_gif(12, 7, [4, 10, 25])
        got = multimodal.gif_video_decoder(payload)
        assert got["width"] == 12 and got["height"] == 7
        assert got["n_frames"] == 3
        assert got["duration_s"] == (4 + 10 + 25) / 100.0

    def test_avi_synth_round_trip(self):
        from odibi_spark.llm import multimodal

        payload = multimodal.synth_avi(320, 240, 50, fps=25.0)
        got = multimodal.avi_video_decoder(payload)
        assert (got["width"], got["height"], got["n_frames"]) == (320, 240, 50)
        assert got["duration_s"] == 2.0

    def test_dispatch_and_fallback(self):
        from odibi_spark.llm import multimodal

        gif = multimodal.synth_gif(2, 2, [1])
        assert multimodal.default_video_decoder(gif)["n_frames"] == 1
        # truncated GIF -> fake, not an exception
        got = multimodal.default_video_decoder(gif[:15])
        assert got == multimodal.fake_video_decoder(gif[:15])
        # arbitrary bytes -> fake
        blob = b"\x00\x01mystery-codec"
        assert (
            multimodal.default_video_decoder(blob)
            == multimodal.fake_video_decoder(blob)
        )

    def test_truncated_payloads_raise_not_hang(self):
        import pytest as _pytest

        from odibi_spark.llm import multimodal

        gif = multimodal.synth_gif(4, 4, [2, 2])
        avi = multimodal.synth_avi(64, 48, 10)
        for cut in (8, 12, 20, len(gif) - 2):
            with _pytest.raises(ValueError):
                multimodal.gif_video_decoder(gif[:cut])
        with _pytest.raises(ValueError):
            # RIFF/AVI magic intact but avih unreachable
            multimodal.avi_video_decoder(avi[:16])

    def test_real_video_through_spark_plumbing(self, spark):
        from odibi_spark.llm import multimodal

        rows = [
            (i, multimodal.synth_gif(8 + i, 6, [5] * (1 + i % 3)))
            for i in range(12)
        ] + [
            (100 + i, multimodal.synth_avi(160, 120, 25 * (i + 1), fps=25.0))
            for i in range(4)
        ]
        df = spark.createDataFrame(rows, ["media_id", "payload"])
        out = {
            r.media_id: r
            for r in multimodal.extract_video_features(df).collect()
        }
        assert len(out) == 16
        for i in range(12):
            r = out[i]
            assert (r.width, r.height) == (8 + i, 6)
            assert r.n_frames == 1 + i % 3
            assert r.duration_s == (1 + i % 3) * 5 / 100.0
        for i in range(4):
            r = out[100 + i]
            assert r.n_frames == 25 * (i + 1)
            assert r.duration_s == float(i + 1)


class TestImageDhash:
    """Perceptual image hashing (r12): real BMP pixel round-trip,
    dHash invariants, hamming-band near-dup pairs."""

    def _grid(self, w=18, h=16, f=lambda x, y: (x * 11 + y * 23) % 256):
        return [[f(x, y) for x in range(w)] for y in range(h)]

    def test_bmp24_round_trip(self):
        from odibi_spark.llm import multimodal

        g = self._grid()
        assert multimodal.decode_bmp24_gray(multimodal.synth_bmp24(g)) == g

    def test_bmp24_row_padding(self):
        # 5-wide rows need 1 pad byte (5*3=15 -> 16)
        from odibi_spark.llm import multimodal

        g = self._grid(w=5, h=4)
        assert multimodal.decode_bmp24_gray(multimodal.synth_bmp24(g)) == g

    def test_decode_rejects_non_bmp(self):
        import pytest as _pytest

        from odibi_spark.llm import multimodal

        with _pytest.raises(ValueError):
            multimodal.decode_bmp24_gray(b"\x89PNG not a bmp" + b"\x00" * 60)

    def test_dhash_brightness_invariant(self):
        # dHash compares neighbors: a uniform brightness shift that
        # doesn't wrap must not change the hash (the property that
        # makes it a perceptual hash)
        from odibi_spark.llm.multimodal import dhash64_from_grid

        g = self._grid(f=lambda x, y: (x * 5 + y * 7) % 100)
        shifted = [[v + 50 for v in row] for row in g]
        assert dhash64_from_grid(g) == dhash64_from_grid(shifted)

    def test_dhash_single_pixel_small_hamming(self):
        from odibi_spark.llm.multimodal import dhash64_from_grid

        g = self._grid()
        p = [row[:] for row in g]
        p[5][7] = (p[5][7] + 128) % 256
        d = dhash64_from_grid(g) ^ dhash64_from_grid(p)
        assert 0 <= bin(d & (2**64 - 1)).count("1") <= 2

    def test_dhash_signed_64bit_range(self):
        from odibi_spark.llm.multimodal import dhash64_from_grid

        # descending gradient sets high bits -> exercises the sign bit
        g = self._grid(f=lambda x, y: 255 - x * 14)
        h = dhash64_from_grid(g)
        assert -(2**63) <= h < 2**63

    def test_grid_too_small_raises(self):
        import pytest as _pytest

        from odibi_spark.llm.multimodal import dhash64_from_grid

        with _pytest.raises(ValueError, match="smaller"):
            dhash64_from_grid(self._grid(w=8, h=8))

    def test_image_dhash_and_near_pairs(self, spark):
        from odibi_spark.llm import multimodal
        from odibi_spark.llm.dedup import hash64_near_pairs

        base = self._grid()
        neardup = [row[:] for row in base]
        neardup[3][4] = (neardup[3][4] + 128) % 256
        distinct = self._grid(f=lambda x, y: (x * x * 3 + y * y * 5) % 256)
        rows = [
            (1, multimodal.synth_bmp24(base)),
            (2, multimodal.synth_bmp24(neardup)),
            (3, multimodal.synth_bmp24(distinct)),
            (4, b"not an image"),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        hashes = multimodal.image_dhash(df)
        got = {r.media_id: r for r in hashes.collect()}
        assert got[1].dhash == multimodal.dhash64_from_grid(base)
        assert got[4].dhash is None  # flag, don't guess
        assert (got[1].width, got[1].height) == (18, 16)
        pairs = hash64_near_pairs(
            hashes, "media_id", "dhash", max_hamming=3
        ).collect()
        assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
        assert all(p.hamming <= 3 for p in pairs)


class TestMultimodalBatchKernels:
    """r15: the batched decode+hash kernels must agree bit-exactly
    with the scalar reference functions — including batches that mix
    decodable and junk payloads (the scalar-era code let pandas infer
    float64 for a None-bearing hash column, silently rounding 64-bit
    hashes past 2^53; the batch kernels emit nullable Int64)."""

    def test_image_batch_matches_scalar_with_nulls(self, spark):
        from odibi_spark.llm import multimodal as mm

        rows = []
        for i in range(40):
            kind = i % 5
            if kind == 0:
                g = [[(i * 37 + x * x + y) % 256 for x in range(18)]
                     for y in range(16)]
                rows.append((i, mm.synth_bmp24(g)))
            elif kind == 1:  # non-divisible geometry -> nearest path
                g = [[(i * 5 + x * y) % 256 for x in range(10)]
                     for y in range(9)]
                rows.append((i, mm.synth_bmp24(g)))
            elif kind == 2:  # junk payload -> NULL row
                rows.append((i, b"JUNK" + bytes(80)))
            elif kind == 3:  # smaller than dhash target -> NULL row
                g = [[i % 256 for x in range(4)] for y in range(4)]
                rows.append((i, mm.synth_bmp24(g)))
            else:  # second geometry group in the same batch
                g = [[(i * 11 + 3 * x + y) % 256 for x in range(27)]
                     for y in range(24)]
                rows.append((i, mm.synth_bmp24(g)))
        df = spark.createDataFrame(
            rows, "media_id long, payload binary"
        ).coalesce(1)  # one batch mixes every case
        got = {
            r.media_id: (r.width, r.height, r.dhash)
            for r in mm.image_dhash(df, "payload", "media_id").collect()
        }
        for i, p in rows:
            try:
                grid = mm._bmp_gray_np(bytes(p))
                exp = (
                    grid.shape[1], grid.shape[0],
                    mm.dhash64_from_grid(grid),
                )
            except ValueError:
                exp = (None, None, None)
            assert got[i] == exp, f"media {i}: {got[i]} != {exp}"

    def test_audio_batch_matches_scalar_with_nulls(self, spark):
        import struct
        import wave

        from odibi_spark.llm import multimodal as mm

        rows = []
        for i in range(30):
            kind = i % 4
            if kind == 0:
                s = [((i * 31 + t * t) % 4000) - 2000 for t in range(200)]
                rows.append((i, mm.synth_wav_pcm16(s)))
            elif kind == 1:  # second length group
                s = [((i * 7 + t) % 9000) - 4500 for t in range(333)]
                rows.append((i, mm.synth_wav_pcm16(s)))
            elif kind == 2:  # junk -> NULL
                rows.append((i, b"nope" + bytes(50)))
            else:  # too short for 65 buckets -> NULL
                rows.append((i, mm.synth_wav_pcm16([5] * 10)))
        df = spark.createDataFrame(
            rows, "media_id long, payload binary"
        ).coalesce(1)
        got = {
            r.media_id: (r.n_samples, r.ahash)
            for r in mm.audio_ahash(df, "payload", "media_id").collect()
        }
        for i, p in rows:
            try:
                s = mm.decode_wav_pcm16_mono(bytes(p))
                exp = (len(s), mm.ahash64_from_samples(s))
            except (ValueError, wave.Error, struct.error, EOFError):
                exp = (None, None)
            assert got[i] == exp, f"media {i}: {got[i]} != {exp}"

    def test_video_batch_matches_scalar_with_nulls(self, spark):
        import struct

        from odibi_spark.llm import multimodal as mm

        rows = []
        for i in range(24):
            kind = i % 4
            if kind == 0:
                frames = [
                    [[(i * 13 + f * 7 + x * x + y) % 256
                      for x in range(18)] for y in range(16)]
                    for f in range(3)
                ]
                rows.append((i, mm.synth_avi_dib(frames)))
            elif kind == 1:
                frames = [
                    [[(i * 5 + f + x * y) % 256 for x in range(27)]
                     for y in range(24)]
                    for f in range(2)
                ]
                rows.append((i, mm.synth_avi_dib(frames)))
            elif kind == 2:  # junk -> single NULL row
                rows.append((i, b"RIFFJUNKJUNK" + bytes(60)))
            else:  # geometry below dhash target -> single NULL row
                rows.append((i, mm.synth_avi_dib(
                    [[[i % 256 for x in range(4)] for y in range(4)]]
                )))
        df = spark.createDataFrame(
            rows, "media_id long, payload binary"
        ).coalesce(1)
        key = lambda t: (t[0], -1 if t[1] is None else t[1])  # noqa: E731
        got = sorted(
            [
                (r.media_id, r.frame_idx, r.dhash)
                for r in mm.video_frame_dhashes(
                    df, "payload", "media_id"
                ).collect()
            ],
            key=key,
        )
        exp = []
        for i, p in rows:
            try:
                for fi, g in enumerate(mm._avi_frames_np(bytes(p))):
                    exp.append((i, fi, mm.dhash64_from_grid(g)))
            except (ValueError, struct.error):
                exp.append((i, None, None))
        assert got == sorted(exp, key=key)
