"""Round-15 optimization regression tests: the rebuild operators were
restructured so unit/token TEXT never crosses an exchange (removed
positions travel as collect_set ints; the rewrite is a pure projection
via array_except + element_at) and remove_junk_lines became a
zero-shuffle higher-order-function projection. These tests pin the
edge semantics the old explode/collect_list shape defined."""

import pytest
from pyspark.sql import functions as F

from odibi_spark.llm.dedup import (
    remove_boilerplate_lines,
    remove_duplicate_spans,
)
from odibi_spark.llm.text import ngram_lm_scores, remove_junk_lines


def _rows(df, *cols):
    return {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in df.collect()
    }


class TestJunkLinesProjectionRewrite:
    def test_matches_old_shape_on_edge_docs(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "Good opening line here.\n17 likes\nab\nAnother fine line."),
                (2, "1234 5678\n#### ----"),          # every line junk
                (3, ""),                                # one empty line, junk
                (4, None),                              # NULL text
                (5, "Single decent line only."),
            ],
            "doc_id long, text string",
        )
        out = _rows(
            remove_junk_lines(docs, "doc_id", "text", out_col="clean"),
            "clean", "n_kept_lines", "n_junk_lines",
        )
        assert out[1] == (
            "Good opening line here.\nAnother fine line.", 2, 2
        )
        assert out[2] == ("", 0, 2)
        assert out[3] == ("", 0, 1)
        # NULL text: 0 kept, NULL junk count (size(split(NULL)) is NULL)
        assert out[4] == ("", 0, None)
        assert out[5] == ("Single decent line only.", 1, 0)

    def test_zero_exchanges(self, spark):
        docs = spark.createDataFrame(
            [(1, "A good line.\nab")], "doc_id long, text string"
        )
        plan = remove_junk_lines(docs, "doc_id", "text")._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan

    def test_order_preserved(self, spark):
        # survivors must re-join in original order
        body = "\n".join(f"Line number {i} is long enough." for i in range(20))
        docs = spark.createDataFrame(
            [(1, body + "\nab")], "doc_id long, text string"
        )
        row = remove_junk_lines(docs, "doc_id", "text").collect()[0]
        assert row["text"] == body
        assert row["n_kept_lines"] == 20 and row["n_junk_lines"] == 1


class TestBoilerplateNarrowRebuild:
    def test_edge_docs(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "keep me one\nFOOTER\nkeep me two", "a"),
                (2, "FOOTER\nunique body line", "a"),
                (3, "FOOTER", "a"),          # every unit boilerplate
                (4, None, "a"),              # NULL text
            ],
            "doc_id long, text string, source string",
        )
        out = _rows(
            remove_boilerplate_lines(docs, min_docs=2, out_col="clean"),
            "clean", "n_kept_lines", "n_boilerplate_lines",
        )
        assert out[1] == ("keep me one\nkeep me two", 2, 1)
        assert out[2] == ("unique body line", 1, 1)
        assert out[3] == ("", 0, 1)
        assert out[4] == ("", 0, None)

    def test_repeated_unit_within_doc_all_occurrences_drop(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "FOOTER\nbody line alpha\nFOOTER"),
                (2, "FOOTER\nbody line beta"),
            ],
            "doc_id long, text string",
        )
        out = _rows(
            remove_boilerplate_lines(docs, min_docs=2),
            "text", "n_kept_lines",
        )
        assert out[1] == ("body line alpha", 1)
        assert out[2] == ("body line beta", 1)

    def test_no_unit_text_through_exchange(self, spark):
        docs = spark.createDataFrame(
            [(1, "a\nb", "s")], "doc_id long, text string, source string"
        )
        plan = remove_boilerplate_lines(
            docs, min_docs=2
        )._jdf.queryExecution().optimizedPlan().toString()
        # the rebuild aggregates positions, never line text
        assert "collect_set(pos" in plan
        assert "collect_list(struct(pos" not in plan


class TestRemoveDupSpansNarrowRebuild:
    def test_keeper_and_rewrite(self, spark):
        shared = "one two three four five six seven eight"
        docs = spark.createDataFrame(
            [
                (1, shared + " tail1a tail1b"),
                (2, "head2 " + shared + " tail2"),
                (3, "totally unique words in this doc only here"),
                (4, None),
            ],
            "doc_id long, text string",
        )
        out = _rows(
            remove_duplicate_spans(docs, ngram=8, min_docs=2),
            "text", "n_kept_tokens", "n_removed_tokens",
        )
        # doc 1 owns the global first occurrence (lowest id, pos)
        assert out[1] == (shared + " tail1a tail1b", 10, 0)
        # doc 2 loses the shared 8-gram's tokens, keeps the rest
        assert out[2] == ("head2 tail2", 2, 8)
        assert out[3][1] == 8 and out[3][2] == 0
        assert out[4] == ("", 0, None)

    def test_overlapping_spans_dedup_positions(self, spark):
        # 9 shared words = two overlapping duplicated 8-grams in doc 2;
        # covered positions overlap and must be counted once
        shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
        docs = spark.createDataFrame(
            [(1, shared), (2, "pre " + shared)],
            "doc_id long, text string",
        )
        out = _rows(
            remove_duplicate_spans(docs, ngram=8, min_docs=2),
            "text", "n_kept_tokens", "n_removed_tokens",
        )
        assert out[1] == (shared, 9, 0)
        assert out[2] == ("pre", 1, 9)

    def test_whitespace_runs_roundtrip(self, spark):
        # double spaces produce empty tokens; the rewrite must keep them
        docs = spark.createDataFrame(
            [(1, "a  b c"), (2, "unrelated words entirely")],
            "doc_id long, text string",
        )
        out = _rows(remove_duplicate_spans(docs, ngram=8, min_docs=2), "text")
        assert out[1] == ("a  b c",)


class TestNgramLmVocabCheckpoint:
    def test_scores_unchanged(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "the dog sat"),
                (3, ""),
            ],
            "doc_id long, text string",
        )
        out = _rows(
            ngram_lm_scores(docs, min_count=2), "n_tokens", "avg_nll"
        )
        # vocab with min_count=2: {the: 3, sat: 2}; N=5, V=2
        import math

        p_seen_the = (3 + 1.0) / 7.0
        p_seen_sat = (2 + 1.0) / 7.0
        p_unseen = 1.0 / 7.0
        nll = lambda p: round(-math.log(p), 6)
        exp1 = (
            2 * nll(p_seen_the) + nll(p_seen_sat) + 3 * nll(p_unseen)
        ) / 6
        assert out[1][0] == 6
        assert out[1][1] == pytest.approx(exp1, abs=1e-9)
        # docs with no tokens never enter the scored stream (the
        # oracle's GROUP BY has the same absence semantics)
        assert 3 not in out
