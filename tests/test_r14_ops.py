"""Round-14 operators: OR-construction SRP ANN (many tables +
hamming-sketch prefilter), diversity k-center coreset, and the
hard_negative_pairs anchor-count gate."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from odibi_spark.llm import mixing, similarity


def _vec_df(spark, vecs, start_id=0):
    rows = [
        (i + start_id, [float(x) for x in v]) for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _clustered(n_clusters=4, per=6, dim=64, noise=0.05, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    out = []
    for c in centers:
        for _ in range(per):
            v = c + noise * rng.standard_normal(dim)
            out.append(v / np.linalg.norm(v))
    return np.array(out), centers


class TestSrpRademacher:
    def test_sign_matrix_deterministic_and_hash_derived(self):
        import hashlib

        S = similarity.rademacher_signs(4, 8, "srp")
        S2 = similarity.rademacher_signs(4, 8, "srp")
        assert S is S2  # cached
        h = hashlib.md5(b"srp:2:3").hexdigest()
        want = 1 if int(h[:15], 16) % 2 == 0 else -1
        assert S[2, 3] == want
        assert set(np.unique(S)) <= {-1, 1}

    def test_table_keys_match_numpy_replay(self, spark):
        rng = np.random.default_rng(3)
        V = rng.standard_normal((20, 64))
        df = _vec_df(spark, V)
        got = {
            (r["id"], r["tbl"]): r["bucket"]
            for r in similarity.srp_table_keys(
                df, "vec_id", "embedding", num_planes=6, tables=3
            ).collect()
        }
        # float32 storage: replay from the values Spark actually read
        Vf = np.array(
            [r["embedding"] for r in df.orderBy("vec_id").collect()],
            dtype=np.float64,
        )
        S = similarity.rademacher_signs(18, 64, "srp").astype(np.int64)
        Q = np.floor(Vf * 1e6).astype(np.int64)
        bits = (Q @ S.T) > 0
        w = 1 << np.arange(6, dtype=np.int64)
        keys = bits.reshape(20, 3, 6).astype(np.int64) @ w
        for i in range(20):
            for t in range(3):
                assert got[(i, t)] == keys[i, t]

    def test_sketch_words_bit_layout(self, spark):
        rng = np.random.default_rng(4)
        V = rng.standard_normal((5, 64))
        df = _vec_df(spark, V)
        rows = similarity.srp_sketch_words(
            df, "vec_id", "embedding", bits=120
        ).collect()
        assert len(rows) == 5
        for r in rows:
            assert 0 <= r["sig0"] < (1 << 60)
            assert 0 <= r["sig1"] < (1 << 60)

    def test_planted_neardups_found_with_high_recall(self, spark):
        # planted near-duplicates: each base vector gets a tiny-noise
        # twin — the OR-construction must put the twin in the top-1
        rng = np.random.default_rng(5)
        base = rng.standard_normal((30, 64))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        twins = base + 0.02 * rng.standard_normal((30, 64))
        df = _vec_df(spark, np.vstack([base, twins]))
        top = similarity.srp_or_ann_topk(
            df, "vec_id", "embedding", k=1,
            num_planes=8, tables=24, max_hamming=40,
        )
        got = {r["query_id"]: r["nbr_id"] for r in top.collect()}
        hits = sum(1 for i in range(30) if got.get(i) == i + 30)
        assert hits >= 27, f"planted twin recall {hits}/30"

    def test_or_tables_beat_single_table(self, spark):
        V, _ = _clustered(per=10, noise=0.4, seed=11)
        df = _vec_df(spark, V)
        exact = similarity.cosine_topk(
            df, "vec_id", "embedding", query_filter="vec_id < 10", k=5
        )

        def recall(approx):
            r = similarity.ann_recall(
                exact, approx.filter(F.col("query_id") < 10)
            )
            return r.agg(F.avg("recall")).first()[0]

        one = recall(similarity.lsh_ann_topk(
            df, "vec_id", "embedding", k=5, num_planes=8
        ))
        many = recall(similarity.srp_or_ann_topk(
            df, "vec_id", "embedding", k=5, num_planes=8, tables=16,
            max_hamming=60,
        ))
        assert many > one

    def test_lsh_ann_topk_tables_param(self, spark):
        V, _ = _clustered(per=5, seed=13)
        df = _vec_df(spark, V)
        out = similarity.lsh_ann_topk(
            df, "vec_id", "embedding", k=3, num_planes=6, tables=4
        )
        pdf = out.toPandas()
        assert set(pdf.columns) == {"query_id", "nbr_id", "cosine", "rank"}
        # dedup across tables: at most one row per (query, nbr)
        assert not pdf.duplicated(["query_id", "nbr_id"]).any()
        with pytest.raises(ValueError):
            similarity.lsh_ann_topk(
                df, "vec_id", "embedding", tables=0
            )


class TestKcenterCoreset:
    def test_picks_span_clusters(self, spark):
        V, _ = _clustered(n_clusters=4, per=6, noise=0.03, seed=9)
        df = _vec_df(spark, V)
        out = similarity.kcenter_coreset(df, "vec_id", "embedding", k=4)
        rows = sorted(out.collect(), key=lambda r: r["center_rank"])
        assert [r["center_rank"] for r in rows] == [1, 2, 3, 4]
        assert rows[0]["min_dist"] is None
        clusters = {r["vec_id"] // 6 for r in rows}
        assert len(clusters) == 4, f"centers collapsed: {clusters}"
        # coverage radius is non-increasing after the first pick
        dists = [r["min_dist"] for r in rows[1:]]
        assert dists == sorted(dists, reverse=True)

    def test_deterministic_and_seeded_at_smallest_id(self, spark):
        V, _ = _clustered(seed=21)
        df = _vec_df(spark, V, start_id=100)
        a = similarity.kcenter_coreset(df, "vec_id", "embedding", k=5)
        b = similarity.kcenter_coreset(df, "vec_id", "embedding", k=5)
        assert a.collect() == b.collect()
        first = a.filter("center_rank = 1").first()
        assert first["vec_id"] == 100

    def test_k_larger_than_corpus_stops_early(self, spark):
        V = np.eye(4, 64)
        df = _vec_df(spark, V)
        out = similarity.kcenter_coreset(df, "vec_id", "embedding", k=10)
        assert out.count() == 4

    def test_transform_registered(self, spark, make_ec):
        from odibi_spark.registry import get_registry

        V, _ = _clustered(seed=2)
        out = get_registry().apply(
            "kcenter_coreset", make_ec(_vec_df(spark, V)), {"k": 3}
        )
        assert out.df.count() == 3


class TestHardNegativeGate:
    def _df(self, spark, n=40):
        V, _ = _clustered(n_clusters=4, per=n // 4, noise=0.3, seed=17)
        return _vec_df(spark, V)

    def test_below_gate_plan_broadcasts_exactly_as_before(self, spark):
        df = self._df(spark)
        out = mixing.hard_negative_pairs(
            df, "vec_id", "embedding", k=2, anchor_filter="vec_id < 5"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan  # the documented shape
        assert out.count() > 0

    def test_above_gate_routes_to_bucket_equijoin(self, spark):
        df = self._df(spark)
        out = mixing.hard_negative_pairs(
            df, "vec_id", "embedding", k=2, max_anchors=8,
            num_planes=4, nprobe=3,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert out.count() > 0

    def test_explicit_candidates_bypass(self, spark):
        df = self._df(spark)
        cands = spark.createDataFrame(
            [(0, 1), (0, 2), (1, 3)], "anchor_id long, neg_id long"
        )
        out = mixing.hard_negative_pairs(
            df, "vec_id", "embedding", k=2, lo=0.0, hi=0.9999,
            candidates=cands, max_anchors=0,
        )
        got = {(r["anchor_id"], r["neg_id"]) for r in out.collect()}
        assert got <= {(0, 1), (0, 2), (1, 3)}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan

    def test_anchor_filter_substring_safe(self, spark):
        # id_col 'id' is a substring of 'doc_id' — the old textual
        # rename corrupted 'doc_id < 25' into 'doc_anchor_id < 25'
        df = self._df(spark).select(
            F.col("vec_id").alias("id"),
            (F.col("vec_id") + 1000).alias("doc_id"),
            "embedding",
        )
        out = mixing.hard_negative_pairs(
            df, "id", "embedding", k=1, lo=0.0, hi=0.9999,
            anchor_filter="doc_id < 1003",
        )
        assert {r["anchor_id"] for r in out.collect()} <= {0, 1, 2}


class TestLangidNullLabels:
    def test_null_label_counts_as_negative_not_dropped(self, spark):
        from odibi_spark.llm import langid

        rows = [
            (0, "the quick brown fox jumps over the lazy dog", "en"),
            (1, "der schnelle braune fuchs springt ueber den hund", "de"),
            (2, "the cat sat on the mat and purred softly", "en"),
            (3, "die katze sass auf der matte und schnurrte", "de"),
            (4, "wholly unlabeled text that still shapes the prior", None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        w_null = langid.lang_classifier_train(
            df, classes=["de", "en"], buckets=64, epochs=1
        )
        # a NULL label must behave exactly like a label outside the
        # class set (y=0 everywhere), not like a dropped row
        df_other = df.withColumn("lang", F.coalesce("lang", F.lit("zz")))
        w_other = langid.lang_classifier_train(
            df_other, classes=["de", "en"], buckets=64, epochs=1
        )
        assert w_null == w_other
        df_dropped = df.filter(F.col("lang").isNotNull())
        w_dropped = langid.lang_classifier_train(
            df_dropped, classes=["de", "en"], buckets=64, epochs=1
        )
        assert w_null != w_dropped


class TestBpeEncode:
    """Tokenizer deployment: apply trained merges to unseen text."""

    def _corpus(self, spark, texts, start=0):
        return spark.createDataFrame(
            [(i + start, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )

    def test_unseen_words_segment_with_trained_merges(self, spark):
        from odibi_spark.llm import text as T

        train = self._corpus(spark, ["low low low low", "lower lower"])
        merges = T.bpe_train(train, num_merges=3)
        got = {
            (r["left"], r["right"]) for r in merges.collect()
        }
        assert ("l", "o") in got  # 'lo' is the dominant pair
        # 'lowest' never appeared in training; its prefix still
        # segments with the trained merges
        out = T.bpe_encode(
            self._corpus(spark, ["lowest slow"], start=100),
            merges=merges,
        ).collect()
        assert len(out) == 1
        row = out[0]
        assert row["n_words"] == 2
        toks = row["bpe_tokens"].split(" ")
        assert row["n_tokens"] == len(toks)
        # the trained 'low' merge applies inside the unseen word
        joined = row["bpe_tokens"]
        assert "low" in joined and "</w>" in joined

    def test_matches_segmented_vocab_on_training_corpus(self, spark):
        # encoding the TRAINING corpus must reproduce exactly the
        # segmentation training itself induced (bpe_segmented_vocab)
        from odibi_spark.llm import text as T

        train = self._corpus(
            spark, ["the cat sat", "the bat the mat", "cat cat mat"]
        )
        merges = T.bpe_train(train, num_merges=5)
        seg = {
            r["word"]: list(r["syms"])
            for r in T.bpe_segmented_vocab(
                train, num_merges=5
            ).collect()
        }
        applied = {
            r["word"]: list(r["syms"])
            for r in T.bpe_apply_merges(
                train, merges=merges
            ).collect()
        }
        assert applied == seg

    def test_empty_and_multispace_docs(self, spark):
        from odibi_spark.llm import text as T

        merges = [("a", "b")]
        out = T.bpe_encode(
            self._corpus(spark, ["", "   ", "ab  ab"]), merges=merges
        ).collect()
        # only the doc with words is encoded
        assert len(out) == 1 and out[0]["doc_id"] == 2
        assert out[0]["n_words"] == 2
        assert out[0]["bpe_tokens"] == "ab </w> ab </w>"

    def test_transform_registered(self, spark, make_ec):
        from odibi_spark.registry import get_registry

        df = self._corpus(spark, ["aa aa aa bb", "aa bb bb"])
        out = get_registry().apply(
            "bpe_encode", make_ec(df), {"num_merges": 2}
        )
        assert out.df.count() == 2


class TestProductQuantization:
    """PQ train/encode/ADC (Jégou et al. 2011)."""

    def test_seed_vectors_encode_to_own_cells(self, spark):
        # the k lowest-id vectors ARE the seeds, so (with one refine
        # step pulling means toward cluster members) each seed's
        # nearest codeword chain stays consistent and codes are valid
        V, _ = _clustered(n_clusters=4, per=8, noise=0.1, seed=31)
        df = _vec_df(spark, V)
        cb = similarity.pq_train(df, "vec_id", "embedding", m=8, k=16)
        assert len(cb) == 8 and len(cb[0]) == 16 and len(cb[0][0]) == 8
        enc = similarity.pq_encode(df, "vec_id", "embedding", cb)
        rows = enc.collect()
        assert len(rows) == 32
        for r in rows:
            assert len(r["pq_codes"]) == 8
            assert all(0 <= c < 16 for c in r["pq_codes"])

    def test_adc_prefers_same_cluster(self, spark):
        V, _ = _clustered(n_clusters=4, per=8, noise=0.05, seed=33)
        df = _vec_df(spark, V)
        top = similarity.pq_adc_topk(
            df, "vec_id", "embedding", topk=3,
            query_filter="vec_id < 4",
        )
        got = top.collect()
        assert {r["query_id"] for r in got} == {0, 1, 2, 3}
        # cluster 0 is ids 0..7: top-3 neighbours of a cluster-0
        # query should be dominated by cluster-0 members
        same = [
            r for r in got
            if r["query_id"] // 8 == r["nbr_id"] // 8
        ]
        assert len(same) >= 9, got  # >= 75% same-cluster

    def test_encode_deterministic_and_compression_shape(self, spark):
        V, _ = _clustered(seed=35)
        df = _vec_df(spark, V)
        cb = similarity.pq_train(df, "vec_id", "embedding")
        a = similarity.pq_encode(df, "vec_id", "embedding", cb).collect()
        b = similarity.pq_encode(df, "vec_id", "embedding", cb).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))

    def test_dim_must_divide(self, spark):
        V, _ = _clustered(seed=37)
        df = _vec_df(spark, V)
        with pytest.raises(ValueError):
            similarity.pq_train(df, "vec_id", "embedding", m=7)

    def test_transform_registered(self, spark, make_ec):
        from odibi_spark.registry import get_registry

        V, _ = _clustered(seed=39)
        out = get_registry().apply(
            "pq_encode", make_ec(_vec_df(spark, V)), {"k": 8}
        )
        assert "pq_codes" in out.df.columns
