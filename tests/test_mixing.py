"""Domain mixture reweighting + hard-negative mining (r13)."""

import pytest
from pyspark.sql import Row, functions as F

from odibi_spark.llm.mixing import (
    MICRO,
    _largest_remainder,
    domain_losses,
    domain_mixture_weights,
    hard_negative_pairs,
)


class TestLargestRemainder:
    def test_sums_exactly_and_deterministic_ties(self):
        w = _largest_remainder([("a", 1), ("b", 1), ("c", 1)])
        assert sum(w.values()) == MICRO
        # 1/3 shares: two domains get the +1; ties go to smaller name
        assert w["a"] >= w["c"] and w["b"] >= w["c"]
        assert _largest_remainder([("a", 1), ("b", 1), ("c", 1)]) == w

    def test_proportionality(self):
        w = _largest_remainder([("x", 3), ("y", 1)])
        assert w["x"] == 750_000 and w["y"] == 250_000

    def test_zero_total_rejected(self):
        with pytest.raises(ValueError):
            _largest_remainder([("a", 0)])


class TestDomainMixture:
    def _scored(self, spark):
        rows = []
        # domain losses: hard > medium > easy
        for d, nll, n in (("hard", 4.0, 3), ("mid", 3.0, 3), ("easy", 2.0, 3)):
            rows += [Row(source=d, nll=nll + 0.1 * i) for i in range(n)]
        return spark.createDataFrame(rows)

    def test_losses_exact_mean(self, spark):
        out = {
            r.domain: r for r in domain_losses(self._scored(spark)).collect()
        }
        assert out["easy"].n_items == 3
        assert out["easy"].loss == pytest.approx(2.1, abs=1e-9)

    def test_harder_domains_gain_weight(self, spark):
        out = {
            r.domain: r.weight
            for r in domain_mixture_weights(
                self._scored(spark), rounds=3, eta=(1, 2)
            ).collect()
        }
        assert sum(out.values()) == MICRO
        assert out["hard"] > out["mid"] > out["easy"]

    def test_equal_losses_stay_uniform(self, spark):
        df = spark.createDataFrame(
            [Row(source=d, nll=3.0) for d in ("a", "b", "c")]
        )
        out = {
            r.domain: r.weight
            for r in domain_mixture_weights(df, rounds=4).collect()
        }
        assert sum(out.values()) == MICRO
        assert max(out.values()) - min(out.values()) <= 1

    def test_python_differential_replay(self, spark):
        """The weight loop replayed from scratch (the same arithmetic
        a SQL oracle performs) matches the operator bit-for-bit."""
        df = self._scored(spark)
        got = {
            r.domain: r.weight
            for r in domain_mixture_weights(
                df, rounds=3, eta=(1, 2)
            ).collect()
        }
        loss = {
            r.domain: r.loss for r in domain_losses(df).collect()
        }
        names = sorted(loss)
        lo, hi = min(loss.values()), max(loss.values())

        def renorm(pairs):
            s = sum(w for _, w in pairs)
            fl = {d: (w * MICRO) // s for d, w in pairs}
            rems = sorted(((-((w * MICRO) % s), d) for d, w in pairs))
            for _, d in rems[: MICRO - sum(fl.values())]:
                fl[d] += 1
            return fl

        w = renorm([(d, 1) for d in names])
        for _ in range(3):
            w = renorm([
                (d, int(w[d] * (1.0 + 0.5 * (
                    0.0 if hi == lo else (loss[d] - lo) / (hi - lo)
                ))))
                for d in names
            ])
        assert got == w

    def test_validation(self, spark):
        df = self._scored(spark)
        with pytest.raises(ValueError):
            domain_mixture_weights(df, rounds=0)
        with pytest.raises(ValueError):
            domain_mixture_weights(df, eta=(1, 0))


class TestHardNegatives:
    def _emb(self, spark):
        rows = [
            Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.999, 0.04, 0.0]),   # near-dup of 1
            Row(vec_id=3, embedding=[0.8, 0.6, 0.0]),      # semi-hard for 1
            Row(vec_id=4, embedding=[0.5, 0.86, 0.0]),     # mid for 1
            Row(vec_id=5, embedding=[0.0, 0.0, 1.0]),      # orthogonal
        ]
        return spark.createDataFrame(rows)

    def test_band_and_ranking(self, spark):
        out = hard_negative_pairs(
            self._emb(spark), "vec_id", "embedding",
            k=2, lo=0.1, hi=0.95, anchor_filter="vec_id = 1",
        ).collect()
        got = [(r.neg_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
        # 2 is excluded by the hi band (cos ~0.9992); 5 by the lo band
        assert got == [(3, 1), (4, 2)]

    def test_exclusion_pairs_removed_symmetrically(self, spark):
        ex = self._emb(spark).sparkSession.createDataFrame(
            [(3, 1)], "a bigint, b bigint"
        )  # reversed order on purpose
        out = hard_negative_pairs(
            self._emb(spark), "vec_id", "embedding",
            k=3, lo=0.1, hi=0.95, anchor_filter="vec_id = 1", exclude=ex,
        ).collect()
        assert [r.neg_id for r in out] == [4]

    def test_no_corpus_shuffle_before_band(self, spark):
        out = hard_negative_pairs(
            self._emb(spark), "vec_id", "embedding", k=2,
            anchor_filter="vec_id = 1",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan  # anchors broadcast
        with pytest.raises(ValueError):
            hard_negative_pairs(
                self._emb(spark), "vec_id", "embedding", lo=0.9, hi=0.5
            )
