"""Batch-level gates (reference: odibi/validation/gate.py:31-243,
config odibi/config.py:3400-3510): driver-side decisions on aggregate
validation results — abort the node instead of writing bad data.

- require_pass_rate: minimum fraction of rows passing all tests
- max_row_drop_percent: abort if this run's row count dropped too far
  vs the previous run's
"""

from __future__ import annotations

from odibi_spark.validation.engine import ValidationOutcome


class GateFailure(Exception):
    pass


def apply_gate(
    outcome: ValidationOutcome,
    *,
    require_pass_rate: float | None = None,
    row_count: int | None = None,
    previous_row_count: int | None = None,
    max_row_drop_percent: float | None = None,
    mode: str = "fail",
) -> list[str]:
    """Returns warnings (mode='warn') or raises GateFailure."""
    problems: list[str] = []
    if require_pass_rate is not None and outcome.pass_rate < require_pass_rate:
        problems.append(
            f"pass rate {outcome.pass_rate:.4f} < required {require_pass_rate}"
        )
    if (
        max_row_drop_percent is not None
        and row_count is not None
        and previous_row_count
    ):
        drop = 100.0 * (previous_row_count - row_count) / previous_row_count
        if drop > max_row_drop_percent:
            problems.append(
                f"row count dropped {drop:.1f}% (> {max_row_drop_percent}%) "
                f"vs previous run ({previous_row_count} -> {row_count})"
            )
    if problems and mode == "fail":
        raise GateFailure("; ".join(problems))
    return problems
