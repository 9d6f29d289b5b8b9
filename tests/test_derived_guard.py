"""Exactly-once derived-table claim lifecycle (r13, reference
odibi/derived_updater.py guard-table protocol)."""

import multiprocessing
import os
import time

import pytest

from odibi_spark.patterns.derived_guard import (
    Claim,
    ClaimConflictError,
    DerivedGuard,
)


class TestClaimLifecycle:
    def test_first_claim_wins_then_none(self, tmp_path):
        g = DerivedGuard(str(tmp_path))
        t1 = g.try_claim("meta_daily_stats", "run-1")
        assert t1
        assert g.try_claim("meta_daily_stats", "run-1") is None
        # different run / table are independent keys
        assert g.try_claim("meta_daily_stats", "run-2")
        assert g.try_claim("meta_sla_status", "run-1")

    def test_applied_is_terminal_and_token_verified(self, tmp_path):
        g = DerivedGuard(str(tmp_path))
        tok = g.try_claim("t", "r")
        g.mark_applied("t", "r", tok)
        assert g.status("t", "r").status == "APPLIED"
        # double-apply, wrong token, apply-after-terminal: all fail fast
        with pytest.raises(ClaimConflictError):
            g.mark_applied("t", "r", tok)
        tok2 = "not-the-token"
        with pytest.raises(ClaimConflictError):
            g.mark_failed("t", "r", tok2)
        # no row at all
        with pytest.raises(ClaimConflictError):
            g.mark_applied("t", "missing", tok)

    def test_mark_failed_records_error(self, tmp_path):
        g = DerivedGuard(str(tmp_path))
        tok = g.try_claim("t", "r")
        g.mark_failed("t", "r", tok, error_message="boom")
        c = g.status("t", "r")
        assert c.status == "FAILED" and c.error_message == "boom"

    def test_key_validation(self, tmp_path):
        g = DerivedGuard(str(tmp_path))
        with pytest.raises(ValueError):
            g.try_claim("../escape", "r")
        with pytest.raises(ValueError):
            g.try_claim("t", "a/b")


class TestReclaim:
    def test_failed_claim_is_reclaimable(self, tmp_path):
        g = DerivedGuard(str(tmp_path))
        tok = g.try_claim("t", "r")
        g.mark_failed("t", "r", tok)
        tok2 = g.reclaim_for_rebuild("t", "r")
        assert tok2 and tok2 != tok
        # the zombie's old token can no longer transition
        with pytest.raises(ClaimConflictError):
            g.mark_applied("t", "r", tok)
        g.mark_applied("t", "r", tok2)

    def test_applied_never_reclaimed(self, tmp_path):
        g = DerivedGuard(str(tmp_path))
        tok = g.try_claim("t", "r")
        g.mark_applied("t", "r", tok)
        assert g.reclaim_for_rebuild("t", "r") is None

    def test_live_claim_not_reclaimed_stale_is(self, tmp_path):
        g = DerivedGuard(str(tmp_path))
        tok = g.try_claim("t", "r")
        assert g.reclaim_for_rebuild("t", "r") is None  # fresh owner
        # age the claim artificially past the threshold
        c = g.status("t", "r")
        c.claimed_at = time.time() - 3600 * 2
        g._write_replace(g._path("t", "r"), c)
        tok2 = g.reclaim_for_rebuild("t", "r", max_age_minutes=60)
        assert tok2 and tok2 != tok

    def test_missing_row_falls_back_to_claim(self, tmp_path):
        g = DerivedGuard(str(tmp_path))
        assert g.reclaim_for_rebuild("t", "never-run") is not None


def _worker(args):
    root, key = args
    g = DerivedGuard(root)
    return g.try_claim("meta_daily_stats", key)


class TestConcurrency:
    def test_exactly_one_process_wins(self, tmp_path):
        """8 processes claim the same (table, run) concurrently —
        exactly one token is issued (the O_EXCL invariant the
        reference gets from Delta MERGE)."""
        g = DerivedGuard(str(tmp_path))  # pre-create dirs
        with multiprocessing.Pool(8) as pool:
            tokens = pool.map(_worker, [(str(tmp_path), "run-x")] * 8)
        winners = [t for t in tokens if t is not None]
        assert len(winners) == 1
        assert g.status("meta_daily_stats", "run-x").claim_token == winners[0]


class TestApplyOnce:
    def test_replay_runs_fn_exactly_once(self, tmp_path):
        g = DerivedGuard(str(tmp_path))
        calls = []
        for _ in range(3):
            g.apply_once("t", "r", lambda: calls.append(1))
        assert len(calls) == 1
        assert g.status("t", "r").status == "APPLIED"

    def test_failure_marks_failed_and_reraises(self, tmp_path):
        g = DerivedGuard(str(tmp_path))

        def boom():
            raise RuntimeError("kaput")

        with pytest.raises(RuntimeError):
            g.apply_once("t", "r", boom)
        assert g.status("t", "r").status == "FAILED"
        # rebuild path: reclaim then apply succeeds
        tok = g.reclaim_for_rebuild("t", "r")
        g.mark_applied("t", "r", tok)

    def test_ran_flag_and_result(self, tmp_path):
        g = DerivedGuard(str(tmp_path))
        ran, res = g.apply_once("t", "r", lambda: 42)
        assert ran is True and res == 42
        ran2, res2 = g.apply_once("t", "r", lambda: 43)
        assert ran2 is False and res2 is None


class TestCatalogIntegration:
    def test_claims_frame_and_guarded_daily_stats(self, spark, tmp_path):
        """A replayed run_id must fold into meta_daily_stats ONCE —
        the reference behavior the guard exists for."""
        from odibi_spark.catalog import Catalog

        cat = Catalog(spark, str(tmp_path / "cat"))
        batchfold = []

        for _ in range(2):  # same run replayed
            cat.derived_guard.apply_once(
                "meta_daily_stats", "run-77",
                lambda: batchfold.append(1),
            )
        assert len(batchfold) == 1
        rows = cat.derived_guard.claims(spark).collect()
        assert len(rows) == 1
        assert rows[0].status == "APPLIED"
        assert rows[0].derived_table == "meta_daily_stats"


class TestLinkBackConflictRestoresTerminalRow:
    """ADVICE r13 (medium): when a transition to APPLIED races the
    reclaim's rename-aside AND a try_claim slips into the window, the
    terminal APPLIED row must WIN — restored over the usurper's fresh
    CLAIMED row — never deleted. The usurper's later token-verified
    transition then fails fast, preserving exactly-once."""

    def test_applied_row_survives_usurper(self, tmp_path):
        import os

        from odibi_spark.patterns.derived_guard import (
            ClaimConflictError, DerivedGuard,
        )

        g = DerivedGuard(str(tmp_path))
        tok = g.try_claim("t", "r1")
        g.mark_applied("t", "r1", tok)
        path = g._path("t", "r1")
        aside = f"{path}.reclaim.test"
        # simulate the race window: the reclaim renamed the row aside,
        # a concurrent try_claim then created a fresh CLAIMED row
        os.rename(path, aside)
        usurper_tok = g.try_claim("t", "r1")
        assert usurper_tok is not None
        cur = g.status("t", "r1")
        # _link_back must restore the terminal row over the usurper
        g._link_back(aside, path, cur)
        restored = g.status("t", "r1")
        assert restored.status == "APPLIED"
        assert restored.claim_token == tok
        assert not os.path.exists(aside)  # consumed, not leaked
        # the usurper's transition fails fast on its stale token
        import pytest as _pytest

        with _pytest.raises(ClaimConflictError):
            g.mark_applied("t", "r1", usurper_tok)

    def test_reclaim_race_full_path(self, tmp_path):
        """End-to-end: FAILED row reclaimed while a transition landed
        between the pre-check and the rename — reclaim yields None and
        the transitioned row survives untouched."""
        from odibi_spark.patterns.derived_guard import DerivedGuard

        g = DerivedGuard(str(tmp_path))
        tok = g.try_claim("t", "r2")
        g.mark_applied("t", "r2", tok)  # terminal before reclaim runs
        assert g.reclaim_for_rebuild("t", "r2") is None
        assert g.status("t", "r2").status == "APPLIED"

    def test_double_underscore_key_encoded_not_rejected(self, tmp_path):
        # r15 (ADVICE): '__'-bearing components are percent-encoded
        # (collision-free) instead of rejected — rejection made their
        # pre-existing history unreadable on status()/mark_applied()
        from odibi_spark.patterns.derived_guard import DerivedGuard

        g = DerivedGuard(str(tmp_path))
        assert g.try_claim("a__b", "c") is not None
        assert g.try_claim("a", "b__c") is not None  # distinct key
        # single underscores stay legal and keep the legacy filename
        assert g.try_claim("a_b", "c_d") is not None
