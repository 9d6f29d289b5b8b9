"""Exactly-once claim lifecycle for derived-table updates.

Open-format twin of the reference's DerivedUpdater guard table
(reference: odibi/derived_updater.py:155-430 — a Delta
``meta_derived_applied_runs`` table driven by MERGE-insert-only +
claim-token verify, with the invariants: try_claim / mark_applied /
mark_failed are FAIL-FAST and never swallow exceptions; APPLIED is
terminal). A derived rollup like ``meta_daily_stats`` folds each run
exactly once even when a pipeline is retried, replayed, or raced by a
concurrent scheduler: the FIRST claimant of (derived_table, run_id)
wins, everyone else sees None and skips.

Storage here is one JSON file per claim under ``{root}/claims/`` on
any POSIX-rename filesystem, with the atomicity carried by the two
primitives distributed stores also reduce to:

- CLAIM  = ``open(..., O_CREAT | O_EXCL)`` — exactly one creator wins
  (the MERGE WHEN NOT MATCHED INSERT twin).
- TRANSITION = read -> token verify -> ``os.replace`` — the
  UPDATE ... WHERE claim_token = ? twin; a zombie whose claim was
  reclaimed fails the token check and raises (fail-fast, never a
  silent double apply).

On a real deployment the same API runs against Delta MERGE (the
reference's SQL is reproduced in the docstrings of each method); this
module keeps the LIFECYCLE — states CLAIMED -> APPLIED | FAILED,
token ownership, stale-claim reclaim — testable without the Delta jar
(sandbox-blocked, COVERAGE.md item 9).
"""

from __future__ import annotations

import json
import os
import time
import uuid
import warnings
from dataclasses import dataclass

VALID_STATUSES = ("CLAIMED", "APPLIED", "FAILED")

#: default stale-claim threshold for reclaim eligibility
#: (reference: derived_updater.py MAX_CLAIM_AGE_MINUTES = 60)
MAX_CLAIM_AGE_MINUTES = 60


@dataclass
class Claim:
    derived_table: str
    run_id: str
    claim_token: str
    status: str
    claimed_at: float
    applied_at: float | None = None
    error_message: str | None = None


class ClaimConflictError(RuntimeError):
    """A token-verified transition found the claim owned by someone
    else (reclaimed, or never ours). Fail-fast by contract."""


class DerivedGuard:
    """Guard table for exactly-once derived-table updates."""

    def __init__(self, root: str):
        self.root = root
        self._dir = os.path.join(root, "claims")
        os.makedirs(self._dir, exist_ok=True)

    # -- storage helpers ---------------------------------------------------

    def _path(self, derived_table: str, run_id: str) -> str:
        # "__" is the key separator — a raw component containing it
        # would collide ('a__b','c') with ('a','b__c') and make
        # apply_once silently skip a genuinely different run. Instead
        # of rejecting such keys outright (r14 — which also made
        # their PRE-EXISTING history unreadable via status()/
        # mark_applied(), ADVICE r15), percent-encode the separator:
        # components without '%' or '__' keep their exact legacy
        # filename, and '__'-bearing keys become representable and
        # collision-free on both read and write paths.
        # MIGRATION NOTE: claims written by a pre-encoding build whose
        # components contained '__' used the ambiguous raw filename;
        # those files stay on disk but are addressed under the new
        # encoded name — rename '<a>__<b>.json' by hand if that
        # history must remain queryable.
        parts = []
        for part in (derived_table, run_id):
            if "/" in part or part.startswith("."):
                raise ValueError(f"invalid claim key component {part!r}")
            parts.append(
                part.replace("%", "%25").replace("__", "%5F%5F")
            )
        return os.path.join(self._dir, f"{parts[0]}__{parts[1]}.json")

    @staticmethod
    def _read(path: str) -> Claim:
        with open(path, encoding="utf-8") as f:
            return Claim(**json.load(f))

    def _write_replace(self, path: str, claim: Claim) -> None:
        tmp = f"{path}.tmp.{claim.claim_token}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(claim.__dict__, f)
        os.replace(tmp, path)

    # -- lifecycle ----------------------------------------------------------

    def try_claim(self, derived_table: str, run_id: str) -> str | None:
        """Claim (derived_table, run_id); returns the claim token, or
        None when the key is already claimed/applied/failed by anyone
        (reference _try_claim_spark: MERGE WHEN NOT MATCHED INSERT,
        then verify our token won). O_CREAT|O_EXCL guarantees exactly
        one creator across processes on one filesystem."""
        path = self._path(derived_table, run_id)
        token = str(uuid.uuid4())
        claim = Claim(
            derived_table, run_id, token, "CLAIMED", time.time()
        )
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return None
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(claim.__dict__, f)
        return token

    def _transition(
        self,
        derived_table: str,
        run_id: str,
        claim_token: str,
        status: str,
        error_message: str | None,
    ) -> None:
        path = self._path(derived_table, run_id)
        try:
            cur = self._read(path)
        except FileNotFoundError:
            raise ClaimConflictError(
                f"no claim row for {derived_table}/{run_id} "
                "(reclaimed or never claimed)"
            ) from None
        if cur.claim_token != claim_token or cur.status != "CLAIMED":
            raise ClaimConflictError(
                f"claim {derived_table}/{run_id} is {cur.status} under "
                f"token {cur.claim_token[:8]}…, not ours"
            )
        cur.status = status
        cur.applied_at = time.time()
        cur.error_message = error_message
        self._write_replace(path, cur)

    def mark_applied(
        self, derived_table: str, run_id: str, claim_token: str
    ) -> None:
        """CLAIMED -> APPLIED, token-verified (reference
        _mark_applied_spark: UPDATE ... WHERE claim_token = ? AND
        status = 'CLAIMED'). Raises ClaimConflictError when the row is
        missing, terminal, or owned by another token — fail-fast."""
        self._transition(derived_table, run_id, claim_token, "APPLIED", None)

    def mark_failed(
        self,
        derived_table: str,
        run_id: str,
        claim_token: str,
        error_message: str | None = None,
    ) -> None:
        """CLAIMED -> FAILED, token-verified; the key becomes eligible
        for :meth:`reclaim_for_rebuild`."""
        self._transition(
            derived_table, run_id, claim_token, "FAILED", error_message
        )

    def status(self, derived_table: str, run_id: str) -> Claim | None:
        try:
            return self._read(self._path(derived_table, run_id))
        except FileNotFoundError:
            return None

    def reclaim_for_rebuild(
        self,
        derived_table: str,
        run_id: str,
        max_age_minutes: int = MAX_CLAIM_AGE_MINUTES,
    ) -> str | None:
        """Re-claim a FAILED or stale-CLAIMED key for a rebuild
        (reference _reclaim_for_rebuild_spark: CAS UPDATE, falling
        back to try_claim when no row exists). APPLIED is terminal —
        never reclaimed. Returns a fresh token or None.

        Atomicity: the claim file is renamed aside (one renamer wins;
        losers see FileNotFoundError and return None), the DECISION is
        made on the renamed content (so a transition that landed just
        before the rename is honored), and the replacement row links
        back under O_EXCL semantics — a try_claim that slipped into
        the window keeps its win and the reclaim yields."""
        path = self._path(derived_table, run_id)
        cur = self.status(derived_table, run_id)
        if cur is None:
            return self.try_claim(derived_table, run_id)
        if cur.status == "APPLIED":
            return None  # terminal
        age_min = (time.time() - cur.claimed_at) / 60.0
        if cur.status == "CLAIMED" and age_min < max_age_minutes:
            return None  # live owner
        token = str(uuid.uuid4())
        aside = f"{path}.reclaim.{token}"
        try:
            os.rename(path, aside)  # atomic take: one winner
        except FileNotFoundError:
            return None
        try:
            cur = self._read(aside)  # authoritative post-rename state
            age_min = (time.time() - cur.claimed_at) / 60.0
            if cur.status == "APPLIED" or (
                cur.status == "CLAIMED" and age_min < max_age_minutes
            ):
                # a transition raced us between pre-check and rename:
                # put the row back untouched and yield. _link_back
                # restores via os.replace on conflict (terminal/live
                # row wins; a usurper that slipped into the rename
                # window fails its later token check fail-fast), so
                # the aside file is consumed — nothing left to clean.
                self._link_back(aside, path, cur)
                return None
            fresh = Claim(
                derived_table, run_id, token, "CLAIMED", time.time()
            )
            tmp = f"{path}.tmp.{token}"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(fresh.__dict__, f)
            try:
                os.link(tmp, path)  # no-clobber: a racing try_claim wins
            except FileExistsError:
                os.unlink(tmp)
                return None
            os.unlink(tmp)
            return token
        finally:
            if os.path.exists(aside):
                os.unlink(aside)

    @staticmethod
    def _link_back(aside: str, path: str, cur: Claim) -> None:
        """Restore the renamed-aside row to ``path``.

        RESIDUAL WINDOW (documented per ADVICE r15): if a usurping
        try_claim ran its ENTIRE apply_once (fn + mark_applied)
        inside the rename-aside window, the fn side effects have
        already executed — exactly-once holds for the AUDIT RECORD
        (the pre-existing terminal/live row below always wins), not
        retroactively for fn execution. The window is the few
        syscalls between reclaim's rename-aside and this restore;
        callers needing a hard fn-execution guarantee must make fn
        itself idempotent (the reference's MERGE folds are)."""
        try:
            os.link(aside, path)
            os.unlink(aside)
        except FileExistsError:
            # A try_claim slipped into the rename window and created a
            # fresh row. The aside row predates it and is terminal
            # (APPLIED) or live-CLAIMED — it must win, or the derived
            # fold could run twice and the audit record would be lost.
            # Before clobbering, re-read what the usurper wrote: if it
            # already completed its whole apply_once (status APPLIED),
            # fn ran twice — surface that and preserve the usurper's
            # transition record in a sidecar instead of silently
            # destroying it.
            try:
                usurper = DerivedGuard._read(path)
            except (OSError, ValueError, TypeError, KeyError):
                usurper = None
            if usurper is not None and usurper.status != "CLAIMED":
                sidecar = f"{path}.usurped.{usurper.claim_token}.json"
                with open(sidecar, "w", encoding="utf-8") as f:
                    json.dump(usurper.__dict__, f)
                warnings.warn(
                    "DerivedGuard: a racing claimant completed "
                    f"status={usurper.status!r} for {path} inside the "
                    "reclaim rename window — fn may have executed "
                    f"twice; its record is preserved at {sidecar}",
                    RuntimeWarning,
                    stacklevel=3,
                )
            # Restore the authoritative row: the usurper's later
            # token-checked transition (if still pending) fails
            # fail-fast, the documented invariant.
            os.replace(aside, path)

    # -- composition ---------------------------------------------------------

    def apply_once(self, derived_table: str, run_id: str, fn):
        """Run ``fn()`` exactly once per (derived_table, run_id):
        claim -> fn -> APPLIED, marking FAILED (and re-raising) when
        fn throws. Returns (ran: bool, result | None). The idiom the
        reference wraps around every derived-table fold."""
        token = self.try_claim(derived_table, run_id)
        if token is None:
            return False, None
        try:
            result = fn()
        except BaseException as e:
            self.mark_failed(
                derived_table, run_id, token, error_message=str(e)[:500]
            )
            raise
        self.mark_applied(derived_table, run_id, token)
        return True, result

    def claims(self, spark):
        """All guard rows as a DataFrame (catalog surface:
        the reference exposes meta_derived_applied_runs as a
        queryable meta table)."""
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("derived_table", T.StringType()),
            T.StructField("run_id", T.StringType()),
            T.StructField("claim_token", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("claimed_at", T.DoubleType()),
            T.StructField("applied_at", T.DoubleType()),
            T.StructField("error_message", T.StringType()),
        ])
        rows = []
        for name in sorted(os.listdir(self._dir)):
            if name.endswith(".json"):
                c = self._read(os.path.join(self._dir, name))
                rows.append((
                    c.derived_table, c.run_id, c.claim_token, c.status,
                    float(c.claimed_at),
                    float(c.applied_at) if c.applied_at else None,
                    c.error_message,
                ))
        return spark.createDataFrame(rows, schema)
