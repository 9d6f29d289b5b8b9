"""Contention canary tests (VERDICT r11 task 2).

bench.py's Calibration probe exists so a contended host can never
masquerade as a code regression again (r11: 11 false >=2x headline
"regressions" from one contended driver run needed a judge re-run to
clear). These tests pin the flag logic and DEMONSTRATE that a
deliberately loaded run flags itself.
"""

import json
import multiprocessing
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from bench import Calibration, compare_prev, warm_inputs  # noqa: E402


def _calib_with(samples, tmpdir):
    """Build a Calibration without running probes (logic-only tests)."""
    import shutil

    c = object.__new__(Calibration)
    c.samples = dict(samples)
    c._shutil = shutil
    c.tmp = str(tmpdir)
    return c


class TestCalibrationFlagLogic:
    def test_clean_run_not_contended(self, tmp_path):
        c = _calib_with({"start": 1.00, "mid": 1.05, "end": 0.98}, tmp_path)
        r = c.result(frozen=1.0)
        assert r["contended"] is False
        assert r["intra_run_drift"] == pytest.approx(1.05 / 0.98, abs=1e-3)
        assert r["worst_vs_frozen"] == pytest.approx(1.05, abs=1e-3)

    def test_intra_run_drift_flags(self, tmp_path):
        # mid-run load spike: start/end fine, middle inflated
        c = _calib_with({"start": 1.0, "mid": 1.6, "end": 1.0}, tmp_path)
        r = c.result(frozen=1.0)
        assert r["contended"] is True
        assert r["intra_run_drift"] > 1.3

    def test_uniform_inflation_vs_frozen_flags(self, tmp_path):
        # whole run slow (background load for the full duration):
        # drift alone would miss it; the frozen-board ratio catches it
        c = _calib_with({"start": 2.0, "mid": 2.1, "end": 2.0}, tmp_path)
        r = c.result(frozen=1.0)
        assert r["intra_run_drift"] < 1.3
        assert r["worst_vs_frozen"] > 1.3
        assert r["contended"] is True

    def test_no_frozen_only_extreme_drift_flags(self, tmp_path):
        # session-age drift up to ~1.5x is intrinsic (r12 finding):
        # without a reference, only drift beyond anything an idle
        # session shows (> 2x) may flag
        c = _calib_with({"start": 1.0, "end": 1.5}, tmp_path)
        r = c.result(frozen=None)
        assert r["worst_vs_frozen"] is None
        assert r["contended"] is False
        c2 = _calib_with({"start": 1.0, "end": 2.3}, tmp_path)
        assert c2.result(frozen=None)["contended"] is True

    def test_unmatched_label_falls_back_to_worst_frozen(self, tmp_path):
        # ADVICE r12: a renamed/new probe position must not silently
        # contribute no ratio (uniform contention at that position
        # would then pass under the 1.8x drift gate alone). It falls
        # back to the slowest frozen position and is reported.
        frozen = {"start": 1.0, "mid": 1.3, "end": 1.5}
        c = _calib_with({"start": 1.0, "mid2": 2.5, "end": 1.5}, tmp_path)
        r = c.result(frozen=frozen)
        assert r["unmatched_labels"] == ["mid2"]
        # 2.5 / max(frozen)=1.5 -> 1.667 > 1.3: flags
        assert r["worst_vs_frozen"] == pytest.approx(2.5 / 1.5, abs=1e-3)
        assert r["contended"] is True
        # matched clean run carries no unmatched_labels key
        c2 = _calib_with({"start": 1.0, "mid": 1.3, "end": 1.5}, tmp_path)
        assert "unmatched_labels" not in c2.result(frozen=frozen)

    def test_per_position_frozen_ignores_intrinsic_drift(self, tmp_path):
        # an idle full bench: end sample 1.5x start from JVM aging —
        # per-position references must NOT flag it...
        frozen = {"start": 1.0, "mid": 1.3, "end": 1.5}
        c = _calib_with(
            {"start": 1.05, "mid": 1.35, "end": 1.55}, tmp_path
        )
        r = c.result(frozen=frozen)
        assert r["contended"] is False
        assert r["intra_run_drift"] > 1.3  # reported, not gating
        # ...while a genuinely loaded position still flags
        c2 = _calib_with(
            {"start": 1.05, "mid": 1.9, "end": 1.55}, tmp_path
        )
        r2 = c2.result(frozen=frozen)
        assert r2["contended"] is True
        assert r2["worst_vs_frozen"] == pytest.approx(1.9 / 1.3, abs=1e-3)

    def test_extreme_drift_gates_despite_references(self, tmp_path):
        """A host whose speed swings > 1.8x WITHIN the run produces
        incomparable per-query numbers even when every position sits
        under its own reference (r12: a drift-2.3 run slipped through
        on per-position ratios alone — the references had been frozen
        in a slow window)."""
        frozen = {"start": 2.1, "mid": 2.0, "end": 2.7}
        c = _calib_with(
            {"start": 1.0, "mid": 1.8, "end": 2.3}, tmp_path
        )
        r = c.result(frozen=frozen)
        assert r["worst_vs_frozen"] < 1.3
        assert r["intra_run_drift"] > 1.8
        assert r["contended"] is True

    def test_result_shape_matches_bench_json_contract(self, tmp_path):
        c = _calib_with({"start": 1.0}, tmp_path)
        r = c.result(frozen=None)
        assert set(r) == {
            "samples", "frozen_sec", "worst_vs_frozen",
            "intra_run_drift", "contended",
        }


class TestNoiseBandGating:
    """r14 (VERDICT r13 task 1): a reading a query itself produced in
    an idle freeze window is dispersion, not regression — vs_prev only
    flags when the value exceeds BOTH 1.15x the median AND the query's
    own idle ceiling x1.05."""

    def _prev(self, tmp_path, bands=None):
        prev = {
            "queries": {"q_a": 1.0, "q_b": 1.0},
            "curation_queries": {},
            "analytics_queries": {},
        }
        if bands is not None:
            prev["query_bands"] = bands
        p = tmp_path / "prev.json"
        p.write_text(json.dumps(prev))
        return str(p)

    def _out(self, a, b):
        return {
            "queries": {"q_a": a, "q_b": b},
            "curation_queries": {},
            "analytics_queries": {},
        }

    def test_within_band_absolved(self, tmp_path):
        # q_a at 1.4x median but under its own idle max (1.5) -> band
        prev = self._prev(
            tmp_path, bands={"q_a": [0.8, 1.5], "q_b": [0.9, 1.1]}
        )
        r = compare_prev(self._out(1.4, 1.0), prev)
        assert r["regressions"] == {}
        assert r["within_band"] == {"q_a": 1.4}

    def test_above_band_still_flags(self, tmp_path):
        prev = self._prev(
            tmp_path, bands={"q_a": [0.8, 1.5], "q_b": [0.9, 1.1]}
        )
        r = compare_prev(self._out(1.7, 1.3), prev)
        # q_a 1.7 > 1.5*1.05; q_b 1.3 > 1.1*1.05 — both genuine
        assert set(r["regressions"]) == {"q_a", "q_b"}

    def test_no_bands_preserves_ratio_rule(self, tmp_path):
        prev = self._prev(tmp_path)  # legacy artifact without bands
        r = compare_prev(self._out(1.2, 1.0), prev)
        assert r["regressions"] == {"q_a": 1.2}
        assert "within_band" not in r


def test_warm_inputs_reads_every_table(spark):
    """io_warmup must cover every bench input with a positive timed
    full-column scan — the r13 blind spot was a warmup that read
    footers only, leaving data pages cold for the first query."""
    w = warm_inputs(spark, "/root/testdata/sf0.001")
    expect = {
        "lineitem", "orders", "customer", "supplier", "part",
        "nation", "region", "events", "documents", "embeddings",
        "total",
    }
    assert set(w) == expect
    assert all(v > 0 for v in w.values())
    assert w["total"] == pytest.approx(
        sum(v for k, v in w.items() if k != "total"), abs=0.01
    )


def test_calibration_real_input_leg_runs(spark):
    """With sf_dir the probe includes the real-input lineitem leg —
    the sample must still complete and report a positive time."""
    c = Calibration(spark, "/root/testdata/sf0.001")
    c.sample("start")
    assert c.samples["start"] > 0
    r = c.result(frozen=None)
    assert r["contended"] is False


def _busy(stop_ts):
    x = 1.0
    while time.time() < stop_ts:
        x = x * 1.0000001 + 1.0


def _io_storm(stop_ts, path):
    """Deliberate IO pressure: loop-write and fsync 32MB files."""
    blob = os.urandom(1 << 20) * 32
    i = 0
    while time.time() < stop_ts:
        p = f"{path}/io_{os.getpid()}_{i % 2}.bin"
        with open(p, "wb") as fh:
            fh.write(blob)
            fh.flush()
            os.fsync(fh.fileno())
        i += 1


@pytest.mark.slow
def test_loaded_run_flags_itself(spark, tmp_path):
    """End-to-end demonstration: the same pinned probe, idle then
    under a deliberate CPU + IO storm, must flag the loaded sample.

    The CPU storm doubles the runnable-thread count, so the probe's
    CPU leg (32-way hash-agg over range(8M)) slows well past the 1.3x
    drift threshold; the IO writers pressure the page cache and disk
    queue the REAL-INPUT leg reads through (r14 — the leg the r13
    blind spot lacked). The assertion is on the CONTENDED bit —
    exactly the signal the driver's BENCH JSON now carries.
    """
    calib = Calibration(spark, "/root/testdata/sf0.001")
    calib.sample("idle")
    idle = calib.samples["idle"]

    ncpu = os.cpu_count() or 8
    stop_ts = time.time() + 120  # generous upper bound; killed below
    procs = [
        multiprocessing.Process(target=_busy, args=(stop_ts,), daemon=True)
        for _ in range(ncpu * 2)
    ] + [
        multiprocessing.Process(
            target=_io_storm, args=(stop_ts, str(tmp_path)), daemon=True
        )
        for _ in range(4)
    ]
    for p in procs:
        p.start()
    try:
        time.sleep(1.0)  # let the storm reach full occupancy
        calib.sample("loaded")
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join(timeout=10)

    r = calib.result(frozen=idle)
    assert r["samples"]["loaded"] > idle, r
    assert r["contended"] is True, (
        f"loaded probe did not flag: idle={idle:.2f}s "
        f"loaded={r['samples']['loaded']:.2f}s result={r}"
    )
