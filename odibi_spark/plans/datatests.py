"""YAML-defined data tests for transforms and SQL steps.

Parity target (reference: odibi/cli/test.py:1-286 — the ``odibi test``
verb): a test YAML declares named cases, each with inline ``inputs``
(lists of row dicts or CSV file references), a ``transform`` (registry
operator + params) or a ``sql`` query, and either inline ``expected``
rows or a CSV snapshot under ``__snapshots__/<file-stem>/<slug>.csv``
(``--snapshot`` creates/updates them).

Documented deviation: the reference's runner executes on pandas and
shells SQL out to DuckDB (test.py:124-140); here both paths run on the
SAME Spark engine the production pipeline uses — inputs are registered
as temp views via ``Context``, transforms go through the operator
registry, and ``sql`` runs as Spark SQL — so a passing data test
exercises the exact runtime semantics (timezone, null ordering, ANSI
casts) the pipeline will see.

Test file shape::

    tests:
      - name: dedup keeps latest
        transform: deduplicate
        params: {keys: [id], order_by: [ts]}
        input: events            # optional; defaults to first input
        inputs:
          events:
            - {id: 1, ts: "2024-01-01"}
            - {id: 1, ts: "2024-02-01"}
        expected:
          - {id: 1, ts: "2024-02-01"}
      - name: sql join
        sql: SELECT a.id, b.v FROM a JOIN b USING (id)
        inputs: {a: [...], b: [...]}
        # no expected => compared against (or written to) the snapshot

Comparison ignores column order and row order (both sides are sorted)
and is dtype-lax, matching the reference's
``assert_frame_equal(check_dtype=False, check_like=True)``.

YAML 1.1 gotcha: a bare ``on`` key (e.g. join params) parses as the
boolean ``true`` — quote it (``"on": [k]``) in test YAMLs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import pandas as pd

__all__ = ["find_test_files", "run_test_case", "run_data_tests", "slugify"]


def slugify(value: str) -> str:
    value = str(value).lower().strip()
    return re.sub(r"[-\s]+", "-", re.sub(r"[^\w\s-]", "", value))


def find_test_files(path: str | Path) -> list[Path]:
    """A file is taken as-is; a directory is scanned for the
    reference's naming conventions (test.py:20-24)."""
    p = Path(path)
    if p.is_file():
        return [p]
    return sorted(set(p.glob("**/*test*.yaml")) | set(p.glob("**/test_*.yml")))


def _load_cases(test_file: Path) -> list[dict[str, Any]]:
    import yaml

    doc = yaml.safe_load(test_file.read_text())
    if isinstance(doc, dict) and isinstance(doc.get("tests"), list):
        return doc["tests"]
    if isinstance(doc, list):
        return doc
    raise ValueError(
        f"{test_file}: expected a top-level list or a 'tests:' list"
    )


def _input_frames(
    spark, inputs: dict[str, Any], test_file: Path
) -> dict[str, pd.DataFrame]:
    frames: dict[str, pd.DataFrame] = {}
    for name, data in (inputs or {}).items():
        if isinstance(data, list):
            frames[name] = pd.DataFrame(data)
        elif isinstance(data, str) and data.endswith(".csv"):
            csv_path = test_file.parent / data
            if not csv_path.exists():
                raise FileNotFoundError(f"input '{name}': {csv_path} not found")
            frames[name] = pd.read_csv(csv_path)
        else:
            raise ValueError(
                f"input '{name}' must be a list of row dicts or a .csv path"
            )
    return frames


def _normalize(df: pd.DataFrame, stringly: bool) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if stringly:
        # CSV snapshots lose types; compare non-numeric columns as text.
        # Missing values first: Spark NULLs arrive as None ('None' under
        # astype(str)) while pandas.read_csv yields NaN ('nan') — map
        # both to '' so a null-bearing snapshot case can ever pass.
        for c in df.columns:
            if not pd.api.types.is_numeric_dtype(df[c]):
                df[c] = df[c].where(df[c].notna(), "").astype(str)
    try:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    except Exception:
        df = df.reset_index(drop=True)
    return df


@dataclass
class CaseResult:
    file: str
    name: str
    ok: bool
    message: str = ""


@dataclass
class TestSummary:
    passed: int = 0
    failed: int = 0
    cases: list[CaseResult] = field(default_factory=list)

    def record(self, result: CaseResult) -> None:
        self.cases.append(result)
        if result.ok:
            self.passed += 1
        else:
            self.failed += 1


def run_test_case(
    spark,
    case: dict[str, Any],
    test_file: Path,
    update_snapshots: bool = False,
) -> CaseResult:
    import odibi_spark.operators  # noqa: F401 — registers named operators
    from odibi_spark.context import Context, EngineContext
    from odibi_spark.registry import get_registry

    name = case.get("name", "<unnamed>")
    transform = case.get("transform")
    sql = case.get("sql")
    if bool(transform) == bool(sql):
        return CaseResult(
            str(test_file), name, False,
            "a case needs exactly one of 'transform' or 'sql'",
        )

    snapshot_file = (
        test_file.parent / "__snapshots__" / test_file.stem / f"{slugify(name)}.csv"
    )
    registered: list[str] = []
    ctx = Context(spark)
    try:
        frames = _input_frames(spark, case.get("inputs") or {}, test_file)
        if not frames:
            return CaseResult(str(test_file), name, False, "no inputs given")
        for input_name, pdf in frames.items():
            ctx.register(input_name, spark.createDataFrame(pdf))
            registered.append(input_name)

        if transform:
            primary = case.get("input") or next(iter(frames))
            if primary not in frames:
                return CaseResult(
                    str(test_file), name, False,
                    f"input: '{primary}' is not one of {sorted(frames)}",
                )
            reg = get_registry()
            if not reg.has(transform):
                return CaseResult(
                    str(test_file), name, False,
                    f"unknown transform '{transform}'",
                )
            ec = EngineContext(ctx, ctx.get(primary))
            out = reg.apply(transform, ec, case.get("params") or {}).df
        else:
            out = spark.sql(sql)
        got = out.toPandas()

        if update_snapshots:
            snapshot_file.parent.mkdir(parents=True, exist_ok=True)
            _normalize(got, stringly=False).to_csv(snapshot_file, index=False)
            return CaseResult(
                str(test_file), name, True, f"snapshot written: {snapshot_file}"
            )

        expected_rows = case.get("expected")
        if expected_rows is not None:
            expected = pd.DataFrame(expected_rows)
            stringly = False
        elif snapshot_file.exists():
            expected = pd.read_csv(snapshot_file)
            stringly = True
        else:
            return CaseResult(
                str(test_file), name, False,
                "no 'expected' rows and no snapshot — run with --snapshot "
                "to record one",
            )

        got_n = _normalize(got, stringly)
        exp_n = _normalize(expected, stringly)
        try:
            pd.testing.assert_frame_equal(
                got_n, exp_n, check_dtype=False, check_like=True
            )
        except AssertionError as exc:
            return CaseResult(
                str(test_file), name, False,
                f"result differs from expected: {exc}",
            )
        return CaseResult(str(test_file), name, True)
    except Exception as exc:  # config/engine errors are test failures
        return CaseResult(str(test_file), name, False, f"{type(exc).__name__}: {exc}")
    finally:
        for input_name in registered:
            ctx.unregister(input_name)


def run_data_tests(
    spark, path: str | Path, update_snapshots: bool = False
) -> TestSummary:
    summary = TestSummary()
    files = find_test_files(path)
    if not files:
        summary.record(
            CaseResult(str(path), "<discovery>", False, "no test YAML files found")
        )
        return summary
    for test_file in files:
        try:
            cases = _load_cases(test_file)
        except Exception as exc:
            summary.record(
                CaseResult(str(test_file), "<load>", False, str(exc))
            )
            continue
        for case in cases:
            summary.record(
                run_test_case(spark, case, test_file, update_snapshots)
            )
    return summary
